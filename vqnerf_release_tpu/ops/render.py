"""The decomposition-stage rendering equation.

Parity target: decomp/nerfvq_nfr3/nerfactor/models/vq_nfr.py:694-733 and
nfr_unit.py:273-306 (_render/integrate): for each surface point,
  rgb = sum_L brdf * (lvis * light) * cos * d_omega
with a front-lit mask, optional learned gamma for real (non-'nerf') data, and
clip-preserve-gradient tonemapping to [0, 1].

``light`` may be a single [Lh, Lw, 3] (or [L, 3]) map or a stacked batch
[E, L, 3] of envmaps to render simultaneously (used for the 16-probe + OLAT
relighting passes — one fused einsum instead of a per-probe Python loop).
"""

import jax
import jax.numpy as jnp

from .math import clip_preserve_gradient

__all__ = ["render_equation", "fused_render_equation"]


def render_equation(brdf, surf2l, normal, lareas, light, light_vis=None,
                    gamma=None, probe_batch=False):
    """Integrate the rendering equation over the light sphere.

    Args:
      brdf:    [N, L, 3]
      surf2l:  [N, L, 3] unit directions surface->light
      normal:  [N, 3] unit normals
      lareas:  [L] solid angles
      light:   [..., 3] reshaped to [L, 3]; or, with probe_batch=True,
               [E, L, 3] — E stacked envmaps rendered simultaneously
      light_vis: optional [N, L] visibility in [0, 1]
      gamma:   optional (bias, index) pair for real-data tone correction
               rgb = (rgb * bias) ** index  (vq_nfr.py:715-716)
      probe_batch: treat ``light`` as a stacked [E, L, 3] batch
    Returns [N, 3] (single light) or [N, E, 3] (probe batch).
    """
    cos = jnp.einsum("nlk,nk->nl", surf2l, normal)  # NxL
    front_lit = (cos > 0).astype(brdf.dtype)
    lvis = front_lit if light_vis is None else front_lit * light_vis
    areas = lareas.reshape(1, -1, 1)  # 1xLx1

    # weight shared by every envmap: lvis * brdf * cos * areas  [N,L,3]
    contrib_w = brdf * (lvis * cos)[:, :, None] * areas

    def finish(rgb):
        if gamma is not None:
            g_bias, g_index = gamma
            # eps floor keeps d/dx x**g finite at 0 (primal shift < 1e-12)
            rgb = jnp.maximum(rgb * g_bias, 1e-12) ** g_index
        return clip_preserve_gradient(rgb, 0.0, 1.0)

    if probe_batch:
        # Probe batch [E, L, 3] (E stacked envmaps flattened over L).
        rgb = jnp.einsum("nlc,elc->nec", contrib_w, light)
        return finish(rgb)
    light_flat = light.reshape(-1, 3)  # Lx3
    rgb = jnp.einsum("nlc,lc->nc", contrib_w, light_flat)
    return finish(rgb)


def fused_render_equation(xyz, normal, surf2c, albedo, rough, f0, lvis,
                          lareas, lxyz, light, gamma=None):
    """Single-envmap render through the fused Pallas BRDF+integration
    kernel (ops/pallas/render_kernel.py) instead of materializing the
    [N, L, 3] brdf/contribution tensors in HBM. Numerically matches
    microfacet_brdf + render_equation (agreement-tested); used by the
    inference fast_render paths when DecompConfig.use_fused_render is on.

    Handles ray padding to the kernel block size and lvis=None; applies
    the same gamma/tonemap tail as render_equation."""
    from .pallas.render_kernel import (BLOCK_RAYS, fused_brdf_render,
                                       pack_lights)

    n = xyz.shape[0]
    l = lxyz.shape[0]
    if lvis is None:
        lvis = jnp.ones((n, l), jnp.float32)
    pad = (-n) % BLOCK_RAYS
    if pad:
        def p(a):
            return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
        xyz, normal, surf2c, albedo, rough, f0, lvis = map(
            p, (xyz, normal, surf2c, albedo, rough, f0, lvis))
    packed = pack_lights(lxyz, lareas, light.reshape(-1, 3))
    rgb = fused_brdf_render(
        xyz, normal, surf2c, albedo, rough, f0, lvis, packed,
        interpret=jax.default_backend() != "tpu")
    rgb = rgb[:n]
    if gamma is not None:
        g_bias, g_index = gamma
        rgb = jnp.maximum(rgb * g_bias, 1e-12) ** g_index
    return clip_preserve_gradient(rgb, 0.0, 1.0)
