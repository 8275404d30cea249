"""Interop with the reference implementation's on-disk formats.

Importers for both stages' pretrained reference checkpoints, so users
switching from the reference can bring their weights:
  * stage 1 (NeuS geometry, torch .pth): ``import_neus``
  * stage 2 (decomposition, tf.train.Checkpoint): ``import_nfr_unit`` /
    ``import_vq_nfr`` / ``import_ref_nfr``
"""

from .tf_import import (import_nfr_unit, import_ref_nfr, import_vq_nfr,
                        infer_decomp_config, as_train_state)
from .torch_import import import_neus

__all__ = [
    "import_neus",
    "import_nfr_unit", "import_vq_nfr", "import_ref_nfr",
    "infer_decomp_config", "as_train_state",
]
