"""Fused Pallas render kernel vs the reference jnp path (interpret mode on
CPU; the same kernel compiles on TPU)."""

import jax.numpy as jnp
import numpy as np

from vqnerf_release_tpu.ops.light import gen_light_xyz
from vqnerf_release_tpu.ops.math import safe_l2_normalize
from vqnerf_release_tpu.ops.microfacet import microfacet_brdf
from vqnerf_release_tpu.ops.pallas.render_kernel import (fused_brdf_render,
                                                         pack_lights)
from vqnerf_release_tpu.ops.render import render_equation


def test_fused_matches_jnp_path():
    rs = np.random.RandomState(0)
    n, lh, lw = 128, 4, 16  # L = 64 lanes-friendly
    l = lh * lw
    lxyz_np, lareas_np = gen_light_xyz(lh, lw)
    lxyz = jnp.asarray(lxyz_np.reshape(-1, 3), jnp.float32)
    lareas = jnp.asarray(lareas_np.reshape(-1), jnp.float32)

    xyz = jnp.asarray(rs.rand(n, 3) - 0.5, jnp.float32)
    normal = jnp.asarray(rs.randn(n, 3), jnp.float32)
    normal = safe_l2_normalize(normal, axis=1)
    surf2c = safe_l2_normalize(
        jnp.asarray(rs.randn(n, 3), jnp.float32), axis=1)
    albedo = jnp.asarray(rs.rand(n, 3), jnp.float32)
    rough = jnp.asarray(rs.rand(n, 1) * 0.9 + 0.05, jnp.float32)
    f0 = jnp.asarray(rs.rand(n, 3), jnp.float32)
    lvis = jnp.asarray(rs.rand(n, l), jnp.float32)
    light = jnp.asarray(rs.rand(l, 3) * 2.0, jnp.float32)

    # Reference jnp path (no gamma, no clip: compare pre-tonemap integral)
    surf2l = safe_l2_normalize(
        lxyz[None, :, :] - xyz[:, None, :], axis=2)
    brdf, _, _ = microfacet_brdf(
        surf2l, surf2c, normal, albedo=albedo, rough=rough, f0=f0)
    cos = jnp.einsum("nlk,nk->nl", surf2l, normal)
    front = (cos > 0).astype(jnp.float32)
    contrib = brdf * ((front * lvis * cos)[:, :, None]
                      * lareas[None, :, None] * light[None, :, :])
    expected = np.asarray(jnp.sum(contrib, axis=1))

    got = np.asarray(fused_brdf_render(
        xyz, normal, surf2c, albedo, rough, f0, lvis,
        pack_lights(lxyz, lareas, light), interpret=True))

    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=1e-5)


def test_fused_matches_full_render_equation():
    """Through render_equation (with clip) on small values."""
    rs = np.random.RandomState(1)
    n, lh, lw = 128, 4, 16
    l = lh * lw
    lxyz_np, lareas_np = gen_light_xyz(lh, lw)
    lxyz = jnp.asarray(lxyz_np.reshape(-1, 3), jnp.float32)
    lareas = jnp.asarray(lareas_np.reshape(-1), jnp.float32)

    xyz = jnp.asarray(rs.rand(n, 3) - 0.5, jnp.float32)
    normal = safe_l2_normalize(
        jnp.asarray(rs.randn(n, 3), jnp.float32), axis=1)
    surf2c = safe_l2_normalize(
        jnp.asarray(rs.randn(n, 3), jnp.float32), axis=1)
    albedo = jnp.asarray(rs.rand(n, 3) * 0.1, jnp.float32)
    rough = jnp.asarray(rs.rand(n, 1) * 0.5 + 0.3, jnp.float32)
    f0 = jnp.asarray(rs.rand(n, 3) * 0.1, jnp.float32)
    lvis = jnp.asarray(rs.rand(n, l), jnp.float32)
    light = jnp.asarray(rs.rand(l, 3) * 0.3, jnp.float32)

    surf2l = safe_l2_normalize(lxyz[None] - xyz[:, None], axis=2)
    brdf, _, _ = microfacet_brdf(
        surf2l, surf2c, normal, albedo=albedo, rough=rough, f0=f0)
    expected = np.asarray(render_equation(
        brdf, surf2l, normal, lareas, light, light_vis=lvis))

    raw = fused_brdf_render(
        xyz, normal, surf2c, albedo, rough, f0, lvis,
        pack_lights(lxyz, lareas, light), interpret=True)
    got = np.asarray(jnp.clip(raw, 0.0, 1.0))
    np.testing.assert_allclose(got, expected, rtol=3e-4, atol=2e-5)
