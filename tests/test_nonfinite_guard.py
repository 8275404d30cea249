"""Skip-nonfinite-update guard: one poisoned batch must not corrupt the
parameters (observed in r2: a single NaN gradient step during a long
vq_nfr run poisoned every param through adam; the reference, which ships
clipping disabled, is equally exposed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqnerf_release_tpu.models import decomp_common as dc
from vqnerf_release_tpu.models.nfr_unit import init_nfr_unit
from vqnerf_release_tpu.models.vq_nfr import init_vq_nfr
from vqnerf_release_tpu.train import decomp_trainer as dt


def _cfg(**kw):
    return dc.DecompConfig(
        light_h=2, num_embed=4, num_drop=2, z_dim=16, mlp_width=8,
        thres_str="0.1;0.2", **kw)


def _batch(cfg, n=16, poison=False):
    rs = np.random.RandomState(0)
    nrm = rs.randn(n, 3)
    b = {
        "rayo": jnp.asarray(np.tile([[0, 0, 3.0]], (n, 1)), jnp.float32),
        "rayd": jnp.asarray(rs.randn(n, 3), jnp.float32),
        "rgb": jnp.asarray(rs.rand(n, 3), jnp.float32),
        "alpha": jnp.ones((n, 1), jnp.float32),
        "pred_alpha": jnp.ones((n, 1), jnp.float32),
        "xyz": jnp.asarray(rs.rand(n, 3) - 0.5, jnp.float32),
        "normal": jnp.asarray(
            nrm / np.linalg.norm(nrm, axis=1, keepdims=True),
            jnp.float32),
        "lvis": jnp.asarray(rs.rand(n, cfg.n_lights), jnp.float32),
    }
    if poison:
        b["rgb"] = b["rgb"].at[0, 0].set(jnp.nan)
    return b


def _leaves_equal(a, b):
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(jax.tree_util.tree_leaves(a),
                               jax.tree_util.tree_leaves(b)))


def test_vq_step_skips_poisoned_batch():
    cfg = _cfg()
    lxyz, lareas = dc.light_constants(cfg)
    nfr = init_nfr_unit(0, cfg)
    centers = np.random.RandomState(0).rand(
        cfg.num_embed, cfg.z_dim).astype(np.float32)
    params, ema = init_vq_nfr(0, cfg, nfr, centers)
    tx, step = dt.make_vq_nfr_step(cfg, lxyz, lareas)
    opt = tx.init(params)
    thres = jnp.asarray(cfg.train_thres())
    key = jax.random.PRNGKey(0)

    # donation invalidates inputs -> keep host copies for comparison
    params0 = jax.tree_util.tree_map(np.asarray, params)
    ema0 = jax.tree_util.tree_map(np.asarray, ema)
    opt0 = jax.tree_util.tree_map(np.asarray, opt)

    p1, e1, o1, ld = step(params, ema, opt, _batch(cfg, poison=True),
                          thres, key, jnp.asarray(1.0))
    assert float(ld["nonfinite_grads"]) == 1.0
    assert _leaves_equal(p1, params0)
    assert _leaves_equal(e1, ema0)
    assert _leaves_equal(o1, opt0)

    # a clean step from the preserved state trains normally
    p2, e2, o2, ld2 = step(p1, e1, o1, _batch(cfg), thres, key,
                           jnp.asarray(1.0))
    assert float(ld2["nonfinite_grads"]) == 0.0
    assert np.isfinite(float(ld2["loss"]))
    assert not _leaves_equal(p2, params0)


def test_nfr_unit_step_skips_poisoned_batch():
    cfg = _cfg()
    lxyz, lareas = dc.light_constants(cfg)
    params = init_nfr_unit(0, cfg)
    tx, step = dt.make_nfr_unit_step(cfg, lxyz, lareas)
    opt = tx.init(params)
    params0 = jax.tree_util.tree_map(np.asarray, params)

    p1, o1, ld = step(params, opt, _batch(cfg, poison=True),
                      jnp.asarray(1.0))
    assert float(ld["nonfinite_grads"]) == 1.0
    assert _leaves_equal(p1, params0)


def test_clipnorm_parity_and_exclusivity():
    cfg = _cfg(clipnorm=1e-6)  # absurdly tight: updates must shrink
    lxyz, lareas = dc.light_constants(cfg)
    params = init_nfr_unit(0, cfg)
    tx, step = dt.make_nfr_unit_step(cfg, lxyz, lareas)
    opt = tx.init(params)
    params0 = jax.tree_util.tree_map(np.asarray, params)
    p1, o1, ld = step(params, opt, _batch(cfg), jnp.asarray(1.0))
    # with amsgrad the normalized step size is ~lr regardless of grad
    # scale, but the clip must at least parse + run finite
    assert np.isfinite(float(ld["loss"]))
    with pytest.raises(AssertionError, match="turn one off"):
        dt._amsgrad(_cfg(clipnorm=1.0, clipvalue=1.0))


def test_neus_step_skips_poisoned_batch():
    from vqnerf_release_tpu.models.neus import NeuSConfig, init_neus
    from vqnerf_release_tpu.train.neus_trainer import (
        NeuSTrainConfig, init_neus_opt_state, make_neus_train_step)

    cfg = NeuSConfig(n_samples=8, n_importance=8, up_sample_steps=2,
                     perturb=0.0)
    tcfg = NeuSTrainConfig(batch_size=8, end_iter=100, warm_up_end=2)
    params = init_neus(0, cfg)
    opt = init_neus_opt_state(params)
    step = jax.jit(make_neus_train_step(cfg, tcfg, radius=1.0))
    rs = np.random.RandomState(0)
    d = rs.randn(8, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    batch = {
        "rays_o": jnp.asarray(np.tile([[0, 0, -2.0]], (8, 1)),
                              jnp.float32),
        "rays_d": jnp.asarray(d),
        "rgb": jnp.full((8, 3), jnp.nan),  # poisoned
        "mask": jnp.ones((8, 1)),
        "near": jnp.full((8, 1), 1.0), "far": jnp.full((8, 1), 3.0),
        "valid": jnp.ones((8, 1)),
    }
    params0 = jax.tree_util.tree_map(np.asarray, params)
    p1, o1, m = step(params, opt, batch, jax.random.PRNGKey(0),
                     jnp.asarray(1.0))
    assert float(m["nonfinite_grads"]) == 1.0
    assert _leaves_equal(p1, params0)


def test_loop_survives_poisoned_view(tmp_path):
    """An epoch containing a poisoned view completes: the bad step is
    skipped (logged as skipped_steps), the epoch loss averages the
    healthy steps, and training continues finite."""
    import json
    import os
    from os.path import join

    from tests.test_data_layer import _make_synth_scene
    from vqnerf_release_tpu.data.shape_dataset import ShapeDataset
    from vqnerf_release_tpu.train.loop import train_nfr_unit

    cfg = dc.DecompConfig(light_h=2, num_embed=4, num_drop=2, z_dim=16,
                          mlp_width=8, imh=16, thres_str="0.1;0.2",
                          n_rays_per_step=32, epochs=2,
                          total_sample_vq=100)
    root = str(tmp_path)
    data_root, surf_root = _make_synth_scene(root, h=16, w=16,
                                             light_h=cfg.light_h)
    ds = ShapeDataset(data_root, surf_root, imh=16, mode="train")
    views = [ds.load_view(f) for f in ds.files]
    views[0].rgb[:] = np.nan  # poison one whole view

    out = join(root, "out", "scene_nfr_unit", "lr5e-4")
    params, hist = train_nfr_unit(cfg, views, views[1:2], out)
    assert len(hist) == 2 and np.isfinite(hist).all()
    logs = [json.loads(l) for l in open(join(out, "train_log.jsonl"))]
    assert all(l["skipped_steps"] >= 1 for l in logs)
