"""Interop with the reference implementation's on-disk formats.

Currently: importing reference TensorFlow ``tf.train.Checkpoint`` files
(decomposition stage) into this framework's param pytrees, so users
switching from the reference can bring their pretrained weights.
"""

from .tf_import import (import_nfr_unit, import_ref_nfr, import_vq_nfr,
                        infer_decomp_config, as_train_state)

__all__ = [
    "import_nfr_unit", "import_vq_nfr", "import_ref_nfr",
    "infer_decomp_config", "as_train_state",
]
