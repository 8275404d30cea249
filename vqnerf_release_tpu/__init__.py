"""vqnerf_release_tpu: a TPU-native JAX rebuild of VQ-NeRF.

A single JAX/XLA/Pallas/pjit framework covering both stages of the VQ-NeRF
pipeline (reference: JiuTongBro/vqnerf_release):

  * geometry  — NeuS-style SDF surface reconstruction with hierarchical ray
    up-sampling and per-view geometry-buffer extraction (xyz/normal/alpha/
    lvis), replacing the reference's PyTorch fork of NeuS
    (``geo/NeuS-ours2``).
  * decomp    — microfacet BRDF decomposition, EMA vector-quantized material
    segmentation, relighting, and editing, replacing the reference's
    TensorFlow fork of NeRFactor (``decomp/nerfvq_nfr3``).

Everything is built TPU-first: functional models (params as pytrees), static
shapes with mask-weighted reductions instead of boolean_mask, ``pjit`` over a
ray-sharded device mesh instead of MirroredStrategy, and Pallas kernels for
the hot ray-march / render-equation / VQ paths.
"""

__version__ = "0.1.0"
