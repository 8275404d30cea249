"""Golden tests for EMA-VQ (vs an eager numpy oracle with Sonnet EMA
semantics) and for sample_pdf (vs the torch reference algorithm re-derived
in numpy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqnerf_release_tpu.ops import vq as vqops
from vqnerf_release_tpu.ops.kmeans import kmeans, kmeans_predict
from vqnerf_release_tpu.ops.sampling import sample_pdf


class _NpEma:
    """Sonnet ExponentialMovingAverage: zero-debiased."""

    def __init__(self, shape, decay):
        self.hidden = np.zeros(shape, np.float64)
        self.counter = 0
        self.decay = decay

    def __call__(self, value):
        self.counter += 1
        self.hidden = self.hidden - (self.hidden - value) * (1 - self.decay)
        return self.hidden / (1 - self.decay**self.counter)


def _np_vq_oracle(codebook, inputs, ema_cs, ema_dw, beta, decay, eps=1e-5):
    d = ((inputs**2).sum(1, keepdims=True) - 2 * inputs @ codebook
         + (codebook**2).sum(0, keepdims=True))
    idx = d.argmin(1)
    onehot = np.eye(codebook.shape[1])[idx]
    quant = codebook.T[idx]
    e_latent = ((quant - inputs) ** 2).mean()
    cs = ema_cs(onehot.sum(0))
    dw = ema_dw(inputs.T @ onehot)
    n = cs.sum()
    cs_s = (cs + eps) / (n + codebook.shape[1] * eps) * n
    norm_w = dw / cs_s[None, :]
    used = (onehot.sum(0) > 0).astype(np.float64)
    update = norm_w * used[None, :] + codebook * (1 - used[None, :])
    return {
        "idx": idx, "loss": beta * e_latent, "update": update,
        "perplexity": np.exp(-np.sum(
            onehot.mean(0) * np.log(onehot.mean(0) + 1e-10))),
    }


def test_vq_ema_matches_oracle_over_steps():
    rs = np.random.RandomState(0)
    z_dim, k, n = 16, 5, 200
    codebook = rs.rand(z_dim, k)
    state = vqops.init_vq_ema_state(z_dim, k)
    ema_cs, ema_dw = _NpEma((k,), 0.999), _NpEma((z_dim, k), 0.999)
    cb = codebook.copy()
    cb_j = jnp.asarray(codebook, jnp.float32)

    for step in range(3):
        inputs = rs.rand(n, z_dim)
        expected = _np_vq_oracle(cb, inputs, ema_cs, ema_dw, 0.1, 0.999)
        outs, state = vqops.vq_ema_apply(
            cb_j, jnp.asarray(inputs, jnp.float32), state,
            commitment_cost=0.1, decay=0.999, is_training=True)
        np.testing.assert_array_equal(
            np.asarray(outs["encoding_indices"]), expected["idx"])
        np.testing.assert_allclose(
            float(outs["loss"]), expected["loss"], rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(outs["update"]), expected["update"], rtol=1e-4,
            atol=1e-6)
        np.testing.assert_allclose(
            float(outs["perplexity"]), expected["perplexity"], rtol=1e-5)
        cb = np.asarray(expected["update"])
        cb_j = outs["update"]


def test_vq_mask_excludes_rows():
    rs = np.random.RandomState(1)
    z_dim, k = 8, 4
    codebook = jnp.asarray(rs.rand(z_dim, k), jnp.float32)
    fg = rs.rand(10, z_dim).astype(np.float32)
    bg = 100.0 * np.ones((6, z_dim), np.float32)  # poison rows
    full = np.concatenate([fg, bg])
    mask = np.concatenate([np.ones(10), np.zeros(6)]).astype(np.float32)

    state = vqops.init_vq_ema_state(z_dim, k)
    outs_m, state_m = vqops.vq_ema_apply(
        codebook, jnp.asarray(full), state, commitment_cost=0.1,
        is_training=True, mask=jnp.asarray(mask))
    outs_f, state_f = vqops.vq_ema_apply(
        codebook, jnp.asarray(fg), vqops.init_vq_ema_state(z_dim, k),
        commitment_cost=0.1, is_training=True)
    np.testing.assert_allclose(
        float(outs_m["loss"]), float(outs_f["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(outs_m["update"]), np.asarray(outs_f["update"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(state_m.hidden_cluster_size),
        np.asarray(state_f.hidden_cluster_size), rtol=1e-6)


def test_vq_straight_through_gradient():
    rs = np.random.RandomState(2)
    codebook = jnp.asarray(rs.rand(4, 3), jnp.float32)
    x = jnp.asarray(rs.rand(5, 4), jnp.float32)

    def f(x):
        outs, _ = vqops.vq_ema_apply(
            codebook, x, vqops.init_vq_ema_state(4, 3),
            commitment_cost=0.0, is_training=False)
        return jnp.sum(outs["quantize"] * 2.0)

    g = jax.grad(f)(x)
    # straight-through: grad flows as if quantize == identity
    np.testing.assert_allclose(np.asarray(g), 2.0 * np.ones((5, 4)), rtol=1e-6)


def test_vq_dropout_thresholds():
    rs = np.random.RandomState(3)
    codebook = jnp.asarray(rs.rand(4, 6), jnp.float32)
    x = jnp.asarray(rs.rand(50, 4), jnp.float32)
    # thres=1.0 for all but code 2 -> every assignment must be code 2
    thres = np.ones((1, 6), np.float32)
    thres[0, 2] = 0.0
    outs = vqops.vq_lookup(
        codebook, x, thres=jnp.asarray(thres), rng=jax.random.PRNGKey(0))
    np.testing.assert_array_equal(
        np.asarray(outs["encoding_indices"]), np.full(50, 2))


def test_sample_pdf_deterministic_matches_oracle():
    rs = np.random.RandomState(4)
    r, b, n = 7, 12, 16
    bins = np.sort(rs.rand(r, b), axis=1).astype(np.float32)
    weights = rs.rand(r, b - 1).astype(np.float32)

    got = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(weights), n))

    # Oracle: NeRF inverse-CDF with det midpoints (renderer.py:39-69)
    w = weights + 1e-5
    pdf = w / w.sum(1, keepdims=True)
    cdf = np.concatenate([np.zeros((r, 1)), np.cumsum(pdf, 1)], 1)
    u = np.broadcast_to(
        np.linspace(0.5 / n, 1 - 0.5 / n, n), (r, n))
    expected = np.empty((r, n))
    for i in range(r):
        inds = np.searchsorted(cdf[i], u[i], side="right")
        below = np.maximum(inds - 1, 0)
        above = np.minimum(inds, b - 1)
        denom = cdf[i][above] - cdf[i][below]
        denom = np.where(denom < 1e-5, 1.0, denom)
        t = (u[i] - cdf[i][below]) / denom
        expected[i] = bins[i][below] + t * (bins[i][above] - bins[i][below])
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_sample_pdf_random_in_range():
    rs = np.random.RandomState(5)
    bins = np.sort(rs.rand(4, 9), axis=1).astype(np.float32)
    weights = rs.rand(4, 8).astype(np.float32)
    got = np.asarray(sample_pdf(
        jnp.asarray(bins), jnp.asarray(weights), 32,
        key=jax.random.PRNGKey(0)))
    assert (got >= bins[:, :1] - 1e-6).all()
    assert (got <= bins[:, -1:] + 1e-6).all()


def test_kmeans_recovers_clusters():
    rs = np.random.RandomState(6)
    true_centers = np.array([[0.0, 0.0], [5.0, 5.0], [0.0, 5.0]])
    pts = np.concatenate(
        [c + 0.1 * rs.randn(100, 2) for c in true_centers]).astype(np.float32)
    assign, centers = kmeans(pts, 3, seed=1)
    centers = np.asarray(centers)
    # each true center matched by some learned center
    for c in true_centers:
        assert np.min(np.linalg.norm(centers - c, axis=1)) < 0.1
    # predict assigns consistently
    pred = np.asarray(kmeans_predict(pts, jnp.asarray(centers)))
    np.testing.assert_array_equal(pred, np.asarray(assign))


def test_sample_pdf_matches_torch_reference_ops():
    """Cross-check against the actual torch ops the reference uses
    (renderer.py:39-69) — searchsorted/gather semantics, not a numpy
    re-derivation."""
    torch = pytest.importorskip("torch")
    rs = np.random.RandomState(7)
    r, b, n = 5, 10, 12
    bins_np = np.sort(rs.rand(r, b), axis=1).astype(np.float32)
    w_np = rs.rand(r, b - 1).astype(np.float32)

    got = np.asarray(sample_pdf(jnp.asarray(bins_np), jnp.asarray(w_np), n))

    bins = torch.from_numpy(bins_np)
    weights = torch.from_numpy(w_np) + 1e-5
    pdf = weights / torch.sum(weights, -1, keepdim=True)
    cdf = torch.cumsum(pdf, -1)
    cdf = torch.cat([torch.zeros_like(cdf[..., :1]), cdf], -1)
    u = torch.linspace(0.5 / n, 1.0 - 0.5 / n, steps=n)
    u = u.expand(list(cdf.shape[:-1]) + [n]).contiguous()
    inds = torch.searchsorted(cdf, u, right=True)
    below = torch.max(torch.zeros_like(inds - 1), inds - 1)
    above = torch.min((cdf.shape[-1] - 1) * torch.ones_like(inds), inds)
    inds_g = torch.stack([below, above], -1)
    matched = [inds_g.shape[0], inds_g.shape[1], cdf.shape[-1]]
    cdf_g = torch.gather(cdf.unsqueeze(1).expand(matched), 2, inds_g)
    bins_g = torch.gather(bins.unsqueeze(1).expand(matched), 2, inds_g)
    denom = cdf_g[..., 1] - cdf_g[..., 0]
    denom = torch.where(denom < 1e-5, torch.ones_like(denom), denom)
    t = (u - cdf_g[..., 0]) / denom
    expected = (bins_g[..., 0] + t * (bins_g[..., 1] - bins_g[..., 0])
                ).numpy()
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)
