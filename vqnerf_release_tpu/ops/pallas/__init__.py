"""Pallas TPU kernels for the hot compute paths.

The BASELINE.json kernel targets and their status:
  * fused microfacet-BRDF + render-equation (render_kernel.py): computes
    surface->light directions, GGX BRDF, visibility masking, and the light
    integral for a ray block entirely in VMEM — the jnp path materializes
    several [N, 512, 3] intermediates in HBM.
  * fused VQ distance+argmin: the codebook is 15x256 — the distance matmul
    is a single tiny MXU op that XLA already emits optimally, so no custom
    kernel is warranted (documented decision, SURVEY.md §7).
  * fused ray-march (stage 1): tracked for a later round; the dominant
    stage-1 cost is the SDF MLP matmul chain, which XLA maps to the MXU
    already.
"""

from .render_kernel import fused_brdf_render, fused_available

__all__ = ["fused_brdf_render", "fused_available"]
