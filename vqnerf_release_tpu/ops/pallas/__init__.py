"""Pallas TPU kernels for the hot compute paths.

The BASELINE.json kernel targets and their status:
  * fused microfacet-BRDF + render-equation (render_kernel.py): computes
    surface->light directions, GGX BRDF, visibility masking, and the light
    integral for a ray block entirely in VMEM — the jnp path materializes
    several [N, 512, 3] intermediates in HBM.
  * fused VQ distance+argmin: the codebook is 15x256 — the distance matmul
    is a single tiny MXU op that XLA already emits optimally, so no custom
    kernel is warranted (documented decision, SURVEY.md §7).
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
