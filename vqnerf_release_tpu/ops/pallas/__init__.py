"""Pallas TPU kernels for the hot compute paths.

The BASELINE.json kernel targets and their status:
  * fused microfacet-BRDF + render-equation (render_kernel.py): computes
    surface->light directions, GGX BRDF, visibility masking, and the light
    integral for a ray block entirely in VMEM — the jnp path materializes
    several [N, 512, 3] intermediates in HBM.
  * fused VQ (vq_kernel.py): the full VectorQuantizerEMA training step —
    distances, dropout masking, argmin, quantized rows, masked EMA
    statistics, and the Sonnet EMA codebook update — in ONE pallas_call
    (the r1 note here argued the 15x256 distance matmul alone never
    warranted a kernel; the r3 kernel fuses the whole step instead).
    Equivalence-tested vs the jnp path incl. gradients
    (tests/test_pallas_vq.py) and exact-agreement-checked on the real
    TPU; scan-timed performance-NEUTRAL there (320 us/step both paths at
    the production shape — XLA already emits these tiny matmuls
    optimally, the r1 argument now measured), so it stays opt-in via
    DecompConfig.use_fused_vq (BASELINE.md r3).
  * fused SDF MLP forward+gradient (sdf_kernel.py): weights resident in
    VMEM, analytic positional-encoding derivatives, forward-mode tangent
    channels. 4.1x the standalone jnp fwd+grad microbenchmark; inside the
    full occlusion pipeline (where up-sampling rounds and sorting
    dominate and XLA already amortizes weights across the lax.scan) the
    end-to-end gain is ~2%, so it remains opt-in
    (GeoExtractor(use_pallas=True)).
"""

from .render_kernel import fused_brdf_render, fused_available

__all__ = ["fused_brdf_render", "fused_available"]
