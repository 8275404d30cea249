"""NeuS render golden test: the full render (uniform sampling, no
importance) re-derived in numpy — weight-norm MLPs, softplus(100),
skip/sqrt2, logistic-CDF alpha, compositing, Eikonal — with shared
weights (renderer.py:193-297 semantics)."""

import jax.numpy as jnp
import numpy as np

from vqnerf_release_tpu.models import fields
from vqnerf_release_tpu.models.neus import NeuSConfig, init_neus, neus_render


def _np_wn_dense(p, x):
    v = np.asarray(p["v"])
    g = np.asarray(p["g"])
    b = np.asarray(p["b"])
    w = g[None, :] * v / np.maximum(
        np.linalg.norm(v, axis=0, keepdims=True), 1e-12)
    return x @ w + b


def _np_softplus100(x):
    z = 100.0 * x
    return (np.maximum(z, 0) + np.log1p(np.exp(-np.abs(z)))) / 100.0


def _np_posenc(x, n):
    feats = [x]
    for k in range(n):
        feats.append(np.sin(x * 2.0**k))
        feats.append(np.cos(x * 2.0**k))
    return np.concatenate(feats, axis=-1)


def _np_sdf_apply(params, x, cfg):
    inputs = _np_posenc(x * cfg.scale, cfg.multires)
    h = inputs
    n = len(params)
    for l, p in enumerate(params):
        if l in cfg.skip_in:
            h = np.concatenate([h, inputs], axis=-1) / np.sqrt(2.0)
        h = _np_wn_dense(p, h)
        if l < n - 1:
            h = _np_softplus100(h)
    return np.concatenate([h[:, :1] / cfg.scale, h[:, 1:]], axis=-1)


def _np_sdf_grad(params, x, cfg, eps=5e-4):
    g = np.zeros_like(x)
    for k in range(3):
        d = np.zeros((1, 3))
        d[0, k] = eps
        g[:, k] = (_np_sdf_apply(params, x + d, cfg)[:, 0]
                   - _np_sdf_apply(params, x - d, cfg)[:, 0]) / (2 * eps)
    return g


def _np_color(params, pts, normals, dirs, feat, cfg):
    view_e = _np_posenc(dirs, cfg.multires_view)
    h = np.concatenate([pts, view_e, normals, feat], axis=-1)
    n = len(params)
    for l, p in enumerate(params):
        h = _np_wn_dense(p, h)
        if l < n - 1:
            h = np.maximum(h, 0)
    return 1 / (1 + np.exp(-h))


def test_neus_render_full_golden():
    cfg = NeuSConfig(n_samples=12, n_importance=0, up_sample_steps=0,
                     perturb=0.0)
    params = init_neus(0, cfg)
    rs = np.random.RandomState(0)
    r = 6
    rays_o = np.tile([[0.0, 0.0, 2.0]], (r, 1)).astype(np.float32)
    dirs = rs.randn(r, 3) * 0.1 + np.array([0, 0, -1.0])
    dirs = (dirs / np.linalg.norm(dirs, axis=1, keepdims=True)).astype(
        np.float32)
    near = np.full((r, 1), 0.8, np.float32)
    far = np.full((r, 1), 3.2, np.float32)
    radius = 1.0

    out = neus_render(params, cfg, jnp.asarray(rays_o), jnp.asarray(dirs),
                      jnp.asarray(near), jnp.asarray(far), radius,
                      cos_anneal_ratio=1.0,
                      background_rgb=jnp.ones((1, 3)))

    # ---- numpy re-derivation
    n_s = cfg.n_samples
    z = near + (far - near) * np.linspace(0, 1, n_s)[None, :]
    sample_dist = 2.0 * radius / n_s
    dists = np.concatenate(
        [z[:, 1:] - z[:, :-1], np.full((r, 1), sample_dist)], axis=1)
    mid_z = z + dists * 0.5
    pts = rays_o[:, None, :] + dirs[:, None, :] * mid_z[..., None]
    pts_f = pts.reshape(-1, 3)
    dirs_f = np.repeat(dirs, n_s, axis=0)

    sdf_out = _np_sdf_apply(params["sdf"], pts_f, cfg.sdf)
    sdf = sdf_out[:, :1]
    feat = sdf_out[:, 1:]
    grad = _np_sdf_grad(params["sdf"], pts_f, cfg.sdf)
    color_s = _np_color(params["color"], pts_f, grad, dirs_f, feat,
                        cfg.color).reshape(r, n_s, 3)

    inv_s = np.exp(10.0 * float(params["variance"]["variance"]))
    true_cos = np.sum(dirs_f * grad, -1, keepdims=True)
    iter_cos = -np.maximum(-true_cos, 0)  # anneal ratio 1
    d_f = dists.reshape(-1, 1)
    prev_cdf = 1 / (1 + np.exp(-(sdf - iter_cos * d_f / 2) * inv_s))
    next_cdf = 1 / (1 + np.exp(-(sdf + iter_cos * d_f / 2) * inv_s))
    alpha = np.clip(((prev_cdf - next_cdf + 1e-5)
                     / (prev_cdf + 1e-5)).reshape(r, n_s), 0, 1)
    trans = np.cumprod(
        np.concatenate([np.ones((r, 1)), 1 - alpha + 1e-7], axis=1),
        axis=1)[:, :-1]
    w = alpha * trans
    color = (color_s * w[..., None]).sum(1) \
        + 1.0 * (1 - w.sum(1, keepdims=True))
    surf = (pts * w[..., None]).sum(1)

    relax = (np.linalg.norm(pts, axis=-1) < radius * 1.1).astype(float)
    ge = (np.linalg.norm(grad.reshape(r, n_s, 3), axis=-1) - 1) ** 2
    eik = (relax * ge).sum() / (relax.sum() + 1e-5)

    np.testing.assert_allclose(
        np.asarray(out["weights"]), w, rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(out["color_fine"]), color, rtol=5e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(out["surf"]), surf, rtol=5e-3, atol=2e-3)
    np.testing.assert_allclose(
        float(out["gradient_error"]), eik, rtol=5e-2, atol=2e-3)
