"""Microfacet (GGX) BRDF.

Parity target: decomp/nerfvq_nfr3/nerfactor/util/microfacet.py:9-90.
  D: GGX / Trowbridge-Reitz with alpha = rough**2
  G: product of two Schlick-GGX-style terms, 2cos/(cos + sqrt(a^2+(1-a^2)cos^2))
  F: Schlick with f0 = spec (per-channel!)
  glossy = F G D / (4 |l.n| |v.n|)   (divide_no_nan)
  diffuse = albedo / pi
  brdf = glossy + diffuse

Shapes: pts2l [N,L,3], pts2c [N,3], normal [N,3], albedo [N,3],
rough [N,1], f0 [N,3] -> (brdf, glossy, diffuse) each [N,L,3].

All cos clamps use clip-preserve-gradient as in the reference.
"""

import jax.numpy as jnp
import numpy as np

from .math import clip_preserve_gradient, divide_no_nan, safe_l2_normalize

__all__ = ["microfacet_brdf"]


def _gsub(cos_theta, alpha):
    """2cos / (cos + sqrt(a^2 + (1 - a^2) cos^2)) (microfacet.py:49-69)."""
    cos_theta = clip_preserve_gradient(cos_theta, 0.0, 1.0)
    denom_a = jnp.abs(alpha**2 + (1.0 - alpha**2) * jnp.square(cos_theta))
    denom = cos_theta + jnp.sqrt(denom_a)
    return divide_no_nan(2.0 * cos_theta, denom)


def microfacet_brdf(pts2l, pts2c, normal, albedo=None, rough=None, f0=None):
    n = pts2c.shape[0]
    if albedo is None:
        albedo = jnp.ones((n, 3), jnp.float32)
    if f0 is None:
        f0 = 0.91 * jnp.ones((n, 3), jnp.float32)
    if rough is None:
        rough = jnp.ones((n, 1), jnp.float32)

    pts2l = safe_l2_normalize(pts2l, axis=2)
    pts2c = safe_l2_normalize(pts2c, axis=1)
    normal = safe_l2_normalize(normal, axis=1)

    # Half vector
    h = safe_l2_normalize(pts2l + pts2c[:, None, :], axis=2)  # NxLx3

    # Fresnel (Schlick), f0 per channel (microfacet.py:82-89)
    cos_vh = clip_preserve_gradient(
        jnp.einsum("nlk,nk->nl", h, pts2c)[:, :, None], 0.0, 1.0)
    f = f0[:, None, :] + (1.0 - f0[:, None, :]) * (1.0 - cos_vh) ** 5  # NxLx3

    alpha = (rough**2)[:, None, :]  # Nx1x1

    # D: GGX NDF (microfacet.py:71-80)
    cos_nh = clip_preserve_gradient(
        jnp.einsum("nlk,nk->nl", h, normal), 0.0, 1.0)
    denom_d = np.pi * jnp.square(
        jnp.square(cos_nh)[:, :, None] * (alpha**2 - 1.0) + 1.0)
    d = divide_no_nan(alpha**2, denom_d)  # NxLx1

    # G: product of light and view terms (microfacet.py:41-69)
    cos_ln = jnp.einsum("nlk,nk->nl", pts2l, normal)[:, :, None]  # NxLx1
    cos_vn = jnp.einsum("nk,nk->n", normal, pts2c)[:, None, None]  # Nx1x1
    g = _gsub(cos_ln, alpha) * _gsub(cos_vn, alpha)  # NxLx1

    denom = 4.0 * jnp.abs(cos_ln) * jnp.abs(cos_vn)
    glossy = divide_no_nan(f * g * d, denom)  # NxLx3

    diffuse = jnp.broadcast_to(
        (albedo / np.pi)[:, None, :], glossy.shape)  # NxLx3
    return glossy + diffuse, glossy, diffuse
