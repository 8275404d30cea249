"""Fused Pallas VQ-EMA kernel vs the jnp path (interpret mode on CPU; the
same kernel compiles on TPU — agreement + timing recorded in BASELINE.md).

The fused kernel covers the full training-mode VectorQuantizerEMA step
(reference vq_layers.py:174-349): distances, dropout masking, argmin,
quantized rows, masked EMA statistics, and the Sonnet EMA codebook update
(debias / Laplace smoothing / unused-code freeze) in one pallas_call.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqnerf_release_tpu.ops.vq import (VqEmaState, init_vq_ema_state,
                                       vq_ema_apply)


def _setup(n, k=15, d=256, seed=0, warm=True):
    rs = np.random.RandomState(seed)
    x = rs.randn(n, d).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    cb = rs.rand(d, k).astype(np.float32)
    mask = (rs.rand(n) > 0.3).astype(np.float32)
    thres = np.concatenate(
        [np.zeros(k - 5), 0.5 * np.ones(5)]).astype(np.float32)
    roll = rs.rand(1, k).astype(np.float32)
    state = init_vq_ema_state(d, k)
    if warm:
        state = VqEmaState(state.hidden_cluster_size + 0.5,
                           state.hidden_dw + 0.01,
                           jnp.asarray(3, jnp.int32))
    return (jnp.asarray(x), jnp.asarray(cb), jnp.asarray(mask),
            jnp.asarray(thres), jnp.asarray(roll), state)


@pytest.mark.parametrize("n", [512, 700, 2048])
def test_fused_vq_matches_jnp(n):
    x, cb, mask, thres, roll, state = _setup(n)
    kw = dict(commitment_cost=0.1, decay=0.999, epsilon=1e-5,
              is_training=True, thres=thres, roll=roll, mask=mask)
    o1, s1 = vq_ema_apply(cb, x, state, **kw)
    o2, s2 = vq_ema_apply(cb, x, state, use_pallas=True, interpret=True,
                          **kw)

    np.testing.assert_array_equal(np.asarray(o1["encoding_indices"]),
                                  np.asarray(o2["encoding_indices"]))
    # fused mode returns masked per-code counts instead of the [N, K]
    # one-hot (rebuilding it would re-materialize what the kernel fuses
    # away); they must equal the jnp path's summed masked encodings
    np.testing.assert_array_equal(
        np.asarray(jnp.sum(o1["encodings"], axis=0)),
        np.asarray(o2["counts"]))
    assert "encodings" not in o2
    for key in ("quantize", "loss", "perplexity", "update"):
        np.testing.assert_allclose(np.asarray(o1[key]),
                                   np.asarray(o2[key]), atol=1e-5,
                                   err_msg=key)
    np.testing.assert_allclose(np.asarray(s1.hidden_cluster_size),
                               np.asarray(s2.hidden_cluster_size),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1.hidden_dw),
                               np.asarray(s2.hidden_dw), atol=1e-6)
    assert int(s1.counter) == int(s2.counter)
    assert "distances" not in o2  # documented fused-mode omission


def test_fused_vq_gradients_match():
    x, cb, mask, thres, roll, state = _setup(512)
    kw = dict(commitment_cost=0.1, decay=0.999, epsilon=1e-5,
              is_training=True, thres=thres, roll=roll, mask=mask)

    def loss_fn(xx, cbv, use):
        o, _ = vq_ema_apply(cbv, xx, state, use_pallas=use, interpret=use,
                            **kw)
        # commitment + something flowing through the straight-through path
        return o["loss"] + jnp.sum(o["quantize"] * 0.003)

    g1 = jax.grad(lambda a, b: loss_fn(a, b, False), argnums=(0, 1))(x, cb)
    g2 = jax.grad(lambda a, b: loss_fn(a, b, True), argnums=(0, 1))(x, cb)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               atol=1e-6)
    # the codebook receives no gradient through the VQ op in either path
    # (EMA update bypasses autodiff, reference vq_nfr.py:580-583)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               atol=0)
    assert float(jnp.max(jnp.abs(g2[1]))) == 0.0


def test_fused_vq_no_dropout_and_all_dropped():
    x, cb, mask, _, _, state = _setup(512, k=8)
    kw = dict(commitment_cost=0.1, decay=0.999, epsilon=1e-5,
              is_training=True, mask=mask)
    o1, _ = vq_ema_apply(cb, x, state, **kw)
    o2, _ = vq_ema_apply(cb, x, state, use_pallas=True, interpret=True,
                         **kw)
    np.testing.assert_array_equal(np.asarray(o1["encoding_indices"]),
                                  np.asarray(o2["encoding_indices"]))

    # every code dropped: both paths fall back to argmin of a constant
    # row = index 0
    thres = jnp.ones((8,), jnp.float32) * 2.0
    roll = jnp.zeros((1, 8), jnp.float32)
    o3, _ = vq_ema_apply(cb, x, state, thres=thres, roll=roll,
                         use_pallas=True, interpret=True, **kw)
    assert int(jnp.max(o3["encoding_indices"])) == 0


def test_fused_vq_disabled_under_multidevice_mesh():
    """use_fused_vq is single-device-only: the un-annotated pallas_call
    cannot partition over the ray mesh, so fused_vq_enabled must fall
    back to the jnp path under the 8-virtual-device conftest mesh
    (advisor finding r3: enabling it sharded was untested/unlowered)."""
    from vqnerf_release_tpu.models import decomp_common as dc
    assert jax.device_count() > 1  # conftest forces 8 virtual devices
    cfg = dc.DecompConfig(use_fused_vq=True)
    assert dc.fused_vq_enabled(cfg) is False
    assert dc.fused_vq_enabled(dc.DecompConfig(use_fused_vq=None)) is False
