"""Golden tests for the microfacet BRDF and the rendering equation against
independent numpy oracles implementing the reference formulas
(decomp/nerfvq_nfr3/nerfactor/util/microfacet.py, models/vq_nfr.py:694-733).
"""

import jax
import jax.numpy as jnp
import numpy as np

from vqnerf_release_tpu.ops import light as lightops
from vqnerf_release_tpu.ops.microfacet import microfacet_brdf
from vqnerf_release_tpu.ops.render import render_equation


def _np_normalize(x, axis, eps=1e-6):
    sq = (x**2).sum(axis=axis, keepdims=True)
    return x / np.sqrt(np.maximum(sq, eps))


def _np_brdf_oracle(pts2l, pts2c, normal, albedo, rough, f0):
    """Independent numpy implementation of the GGX microfacet model."""
    pts2l = _np_normalize(pts2l, 2)
    pts2c = _np_normalize(pts2c, 1)
    normal = _np_normalize(normal, 1)
    h = _np_normalize(pts2l + pts2c[:, None, :], 2)

    cos_vh = np.clip(np.einsum("nlk,nk->nl", h, pts2c), 0, 1)[..., None]
    f = f0[:, None, :] + (1 - f0[:, None, :]) * (1 - cos_vh) ** 5

    alpha = (rough**2)[:, None, :]
    cos_nh = np.clip(np.einsum("nlk,nk->nl", h, normal), 0, 1)
    denom_d = np.pi * ((cos_nh**2)[..., None] * (alpha**2 - 1) + 1) ** 2
    d = np.where(denom_d == 0, 0.0, alpha**2 / np.where(denom_d == 0, 1, denom_d))

    def gsub(cos_t):
        cos_t = np.clip(cos_t, 0, 1)
        den = cos_t + np.sqrt(np.abs(alpha**2 + (1 - alpha**2) * cos_t**2))
        return np.where(den == 0, 0.0, 2 * cos_t / np.where(den == 0, 1, den))

    cos_ln = np.einsum("nlk,nk->nl", pts2l, normal)[..., None]
    cos_vn = np.einsum("nk,nk->n", normal, pts2c)[:, None, None]
    g = gsub(cos_ln) * gsub(cos_vn)

    den = 4 * np.abs(cos_ln) * np.abs(cos_vn)
    glossy = np.where(den == 0, 0.0, f * g * d / np.where(den == 0, 1, den))
    diffuse = np.broadcast_to((albedo / np.pi)[:, None, :], glossy.shape)
    return glossy + diffuse, glossy, diffuse


def _random_inputs(n=64, l=24, seed=0):
    rs = np.random.RandomState(seed)
    pts2l = rs.randn(n, l, 3).astype(np.float32)
    pts2c = rs.randn(n, 3).astype(np.float32)
    normal = rs.randn(n, 3).astype(np.float32)
    albedo = rs.rand(n, 3).astype(np.float32)
    rough = (rs.rand(n, 1).astype(np.float32) * 0.9 + 0.05)
    f0 = rs.rand(n, 3).astype(np.float32)
    return pts2l, pts2c, normal, albedo, rough, f0


def test_microfacet_matches_oracle():
    args = _random_inputs()
    brdf, glossy, diffuse = microfacet_brdf(
        *[jnp.asarray(a) for a in args[:3]],
        albedo=jnp.asarray(args[3]), rough=jnp.asarray(args[4]),
        f0=jnp.asarray(args[5]))
    e_brdf, e_glossy, e_diffuse = _np_brdf_oracle(*args)
    np.testing.assert_allclose(np.asarray(brdf), e_brdf, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(glossy), e_glossy, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(diffuse), e_diffuse, rtol=1e-5)


def test_microfacet_grads_finite():
    args = [jnp.asarray(a) for a in _random_inputs(n=8, l=4)]

    def loss(albedo, rough, f0):
        b, _, _ = microfacet_brdf(
            args[0], args[1], args[2], albedo=albedo, rough=rough, f0=f0)
        return jnp.sum(b)

    grads = jax.grad(loss, argnums=(0, 1, 2))(args[3], args[4], args[5])
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()


def test_render_equation_oracle():
    rs = np.random.RandomState(3)
    n, lh, lw = 32, 4, 8
    l = lh * lw
    lxyz, lareas = lightops.gen_light_xyz(lh, lw)
    xyz = rs.rand(n, 3).astype(np.float32) - 0.5
    surf2l = _np_normalize(
        lxyz.reshape(1, -1, 3) - xyz[:, None, :], 2).astype(np.float32)
    normal = _np_normalize(rs.randn(n, 3), 1).astype(np.float32)
    brdf = rs.rand(n, l, 3).astype(np.float32)
    lvis = rs.rand(n, l).astype(np.float32)
    lightmap = rs.rand(lh, lw, 3).astype(np.float32) * 2.0

    got = render_equation(
        jnp.asarray(brdf), jnp.asarray(surf2l), jnp.asarray(normal),
        jnp.asarray(lareas.reshape(-1), dtype=jnp.float32),
        jnp.asarray(lightmap), light_vis=jnp.asarray(lvis))

    cos = np.einsum("nlk,nk->nl", surf2l, normal)
    front = (cos > 0).astype(np.float32)
    lv = front * lvis
    contrib = (brdf * (lv[..., None] * lightmap.reshape(1, -1, 3))
               * cos[..., None] * lareas.reshape(1, -1, 1))
    expected = np.clip(contrib.sum(1), 0, 1)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-5)


def test_render_equation_probe_batch_matches_loop():
    rs = np.random.RandomState(4)
    n, lh, lw, e = 16, 4, 8, 5
    l = lh * lw
    lxyz, lareas = lightops.gen_light_xyz(lh, lw)
    xyz = rs.rand(n, 3).astype(np.float32) - 0.5
    surf2l = jnp.asarray(_np_normalize(
        lxyz.reshape(1, -1, 3) - xyz[:, None, :], 2).astype(np.float32))
    normal = jnp.asarray(_np_normalize(rs.randn(n, 3), 1).astype(np.float32))
    brdf = jnp.asarray(rs.rand(n, l, 3).astype(np.float32))
    lareas_j = jnp.asarray(lareas.reshape(-1), dtype=jnp.float32)
    probes = jnp.asarray(rs.rand(e, l, 3).astype(np.float32))

    batched = render_equation(
        brdf, surf2l, normal, lareas_j, probes, probe_batch=True)
    assert batched.shape == (n, e, 3)
    for i in range(e):
        single = render_equation(brdf, surf2l, normal, lareas_j, probes[i])
        # f32 accumulation order differs between the fused einsum and the
        # per-probe contraction; allow that slack.
        np.testing.assert_allclose(
            np.asarray(batched[:, i]), np.asarray(single), rtol=5e-3,
            atol=5e-4)


def test_render_equation_gamma():
    rs = np.random.RandomState(5)
    n, l = 8, 32
    # Keep the integral well below 1 so the pre-gamma clip never engages and
    # the oracle can reuse the clipped base render.
    brdf = jnp.asarray(rs.rand(n, l, 3).astype(np.float32)) * 0.02
    surf2l = jnp.asarray(_np_normalize(rs.randn(n, l, 3), 2).astype(np.float32))
    normal = jnp.asarray(_np_normalize(rs.randn(n, 3), 1).astype(np.float32))
    lareas = jnp.ones((l,), jnp.float32) * (4 * np.pi / l)
    lightmap = jnp.ones((l, 3), jnp.float32)

    base = render_equation(brdf, surf2l, normal, lareas, lightmap)
    gammad = render_equation(
        brdf, surf2l, normal, lareas, lightmap,
        gamma=(jnp.asarray(2.0), jnp.asarray(0.5)))
    expected = np.clip(np.sqrt(np.maximum(np.asarray(base) * 2.0, 0)), 0, 1)
    np.testing.assert_allclose(np.asarray(gammad), expected, rtol=1e-4, atol=1e-5)
