"""Round-trip tests for the reference-TF-checkpoint importer.

The fixtures rebuild the reference's checkpoint object graph with plain
tf.Module objects: only the `net_<name>_layer<i>` Dense aliases reach the
checkpoint in the reference (its net dict holds non-trackable plain-Python
Networks, networks/base.py:21-26), plus the direct tf.Variables and the
sonnet EMA modules — so a tf.Module mimic with the same attribute names
produces identical checkpoint keys."""

import os

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax.numpy as jnp  # noqa: E402

from vqnerf_release_tpu.interop import tf_import as ti  # noqa: E402
from vqnerf_release_tpu.models import decomp_common as dc  # noqa: E402
from vqnerf_release_tpu.models.nfr_unit import init_nfr_unit  # noqa: E402
from vqnerf_release_tpu.models.ref_nfr import init_ref_nfr  # noqa: E402
from vqnerf_release_tpu.models.vq_nfr import (init_vq_nfr,  # noqa: E402
                                              vq_nfr_forward)

CFG = dc.DecompConfig(data_type="hw", light_h=4, num_embed=6, num_drop=5,
                      z_dim=32, mlp_width=16,
                      thres_str="0.1;0.2;0.3;0.4;0.5")


def _rand_mlp_like(mlp, rs):
    """[(w, b)] numpy arrays shaped like one of our mlp param lists."""
    return [(rs.rand(*np.shape(l["w"])).astype(np.float32),
             rs.rand(*np.shape(l["b"])).astype(np.float32)) for l in mlp]


def _save_reference_style_ckpt(outdir, nets, variables, ema=None):
    """nets: {name: [(w, b), ...]}; variables: {attr: np}; ema:
    {'cluster_size'|'dw': (hidden, average, counter)}."""
    root = tf.Module()
    for name, layers in nets.items():
        for i, (w, b) in enumerate(layers):
            lay = tf.Module()
            lay.kernel = tf.Variable(w)
            lay.bias = tf.Variable(b)
            setattr(root, "net_%s_layer%d" % (name, i), lay)
    for attr, v in variables.items():
        setattr(root, attr, tf.Variable(v))
    if ema is not None:
        vq_layer = tf.Module()
        for which, (hidden, average, counter) in ema.items():
            m = tf.Module()
            m._counter = tf.Variable(int(counter), dtype=tf.int64)
            m._hidden = tf.Variable(hidden)
            m.average = tf.Variable(average)
            setattr(vq_layer, "ema_%s" % which, m)
        root.vq_layer = vq_layer
    ckpt = tf.train.Checkpoint(step=tf.Variable(3, dtype=tf.int64), net=root)
    mgr = tf.train.CheckpointManager(ckpt, str(outdir), max_to_keep=1)
    return mgr.save()


def _assert_mlp_equal(got, want):
    assert len(got) == len(want)
    for g, (w, b) in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g["w"]), w)
        np.testing.assert_array_equal(np.asarray(g["b"]), b)


def _nfr_fixture(tmp_path, rs):
    expected = init_nfr_unit(0, CFG)
    nets = {name: _rand_mlp_like(expected[name], rs)
            for name in ("fine_enc", "bottleneck", "diff_out", "spec_out",
                         "rough_out")}
    variables = {
        "_light": rs.rand(*np.shape(expected["light"])).astype(np.float32),
        "_gamma_bias": rs.rand(1).astype(np.float32),
        "_gamma_index": rs.rand(1).astype(np.float32),
    }
    d = tmp_path / "nfr_unit"
    _save_reference_style_ckpt(d, nets, variables)
    return d, nets, variables


def _vq_fixture(tmp_path, rs):
    nfr = init_nfr_unit(0, CFG)
    expected, _ = init_vq_nfr(
        0, CFG, nfr, np.zeros((CFG.num_embed, CFG.z_dim), np.float32))
    nets = {name: _rand_mlp_like(expected[name], rs)
            for name in ("fine_enc", "bottleneck", "diff_main", "spec_main",
                         "rough_main", "diff_vq", "spec_vq", "rough_vq")}
    variables = {
        "_light": rs.rand(*np.shape(expected["light"])).astype(np.float32),
        "_codebook": rs.rand(CFG.z_dim, CFG.num_embed).astype(np.float32),
        "_gamma_bias": rs.rand(1).astype(np.float32),
        "_gamma_index": rs.rand(1).astype(np.float32),
    }
    ema = {
        "cluster_size": (rs.rand(CFG.num_embed).astype(np.float32),
                         rs.rand(CFG.num_embed).astype(np.float32), 7),
        "dw": (rs.rand(CFG.z_dim, CFG.num_embed).astype(np.float32),
               rs.rand(CFG.z_dim, CFG.num_embed).astype(np.float32), 7),
    }
    d = tmp_path / "vq_nfr"
    _save_reference_style_ckpt(d, nets, variables, ema=ema)
    return d, nets, variables, ema


def test_import_nfr_unit_roundtrip(tmp_path):
    rs = np.random.RandomState(0)
    d, nets, variables = _nfr_fixture(tmp_path, rs)

    params, cfg = ti.import_nfr_unit(str(d))  # cfg inferred from shapes
    assert (cfg.mlp_width, cfg.z_dim, cfg.light_h) == (16, 32, 4)
    assert cfg.data_type == "hw"  # gamma variables present
    for name in nets:
        _assert_mlp_equal(params[name], nets[name])
    np.testing.assert_array_equal(np.asarray(params["light"]),
                                  variables["_light"])
    np.testing.assert_array_equal(np.asarray(params["gamma_bias"]),
                                  variables["_gamma_bias"])
    np.testing.assert_array_equal(np.asarray(params["gamma_index"]),
                                  variables["_gamma_index"])


def test_import_vq_nfr_roundtrip_and_forward(tmp_path):
    rs = np.random.RandomState(1)
    d, nets, variables, ema = _vq_fixture(tmp_path, rs)

    params, ema_state, cfg = ti.import_vq_nfr(str(d))
    assert cfg.num_embed == 6 and cfg.num_drop == 5
    assert len(cfg.train_thres()) == 6  # inferred thres_str stays valid
    for name in nets:
        _assert_mlp_equal(params[name], nets[name])
    np.testing.assert_array_equal(np.asarray(params["codebook"]),
                                  variables["_codebook"])
    np.testing.assert_array_equal(
        np.asarray(ema_state.hidden_cluster_size), ema["cluster_size"][0])
    np.testing.assert_array_equal(np.asarray(ema_state.hidden_dw),
                                  ema["dw"][0])
    assert int(ema_state.counter) == 7

    # imported params drive the real forward pass
    lxyz, lareas = dc.light_constants(cfg)
    n = 16
    batch = {
        "rayo": jnp.tile(jnp.asarray([[0, 0, 3.0]], jnp.float32), (n, 1)),
        "rgb": jnp.asarray(rs.rand(n, 3), jnp.float32),
        "alpha": jnp.ones((n, 1)),
        "pred_alpha": jnp.ones((n, 1)),
        "xyz": jnp.asarray(rs.rand(n, 3) - 0.5, jnp.float32),
        "normal": jnp.asarray(
            rs.randn(n, 3) / np.linalg.norm(rs.randn(n, 3), axis=1,
                                            keepdims=True), jnp.float32),
        "lvis": jnp.asarray(rs.rand(n, cfg.n_lights), jnp.float32),
    }
    pred, aux, _ = vq_nfr_forward(params, ema_state, batch, cfg, lxyz,
                                  lareas, mode="vali")
    assert np.isfinite(np.asarray(pred["rgb"])).all()

    state = ti.as_train_state("vq_nfr", cfg, params, ema_state=ema_state,
                              epoch=3)
    assert set(state) == {"params", "ema", "opt_state", "epoch"}


def test_import_ref_nfr_merges_vq_frozen_subtree(tmp_path):
    rs = np.random.RandomState(2)
    vq_dir, vq_nets, vq_vars, _ = _vq_fixture(tmp_path, rs)

    vq_params_np = init_vq_nfr(
        0, CFG, init_nfr_unit(0, CFG),
        np.zeros((CFG.num_embed, CFG.z_dim), np.float32))[0]
    expected = init_ref_nfr(0, CFG, vq_params_np,
                            np.zeros(CFG.light_res + (3,), np.float32))
    ref_nets = {name: _rand_mlp_like(expected["train"][name], rs)
                for name in ("rgb_enc", "diff_out", "rough_out")}
    ref_vars = {
        "_light": rs.rand(*CFG.light_res, 3).astype(np.float32),
        "_gamma_bias": rs.rand(1).astype(np.float32),
        "_gamma_index": rs.rand(1).astype(np.float32),
    }
    ref_dir = tmp_path / "ref_nfr"
    _save_reference_style_ckpt(ref_dir, ref_nets, ref_vars)

    params, cfg = ti.import_ref_nfr(str(ref_dir), str(vq_dir))
    assert cfg.z_dim == 32 and cfg.data_type == "hw"
    for name in ref_nets:
        _assert_mlp_equal(params["train"][name], ref_nets[name])
    # frozen subtree comes from the vq checkpoint (spec_out := vq spec_main)
    _assert_mlp_equal(params["frozen"]["fine_enc"], vq_nets["fine_enc"])
    _assert_mlp_equal(params["frozen"]["spec_out"], vq_nets["spec_main"])
    # the refined light comes from the ref checkpoint, not the vq one
    np.testing.assert_array_equal(np.asarray(params["frozen"]["light"]),
                                  ref_vars["_light"])


def test_import_wrong_phase_raises(tmp_path):
    rs = np.random.RandomState(3)
    d, _, _ = _nfr_fixture(tmp_path, rs)
    with pytest.raises(KeyError, match="diff_main|_codebook"):
        ti.import_vq_nfr(str(d), CFG)


def test_ema_average_fallback(tmp_path):
    """A checkpoint whose sonnet internals only expose the debiased
    average still imports (hidden reconstructed via decay^counter)."""
    rs = np.random.RandomState(4)
    nfr = init_nfr_unit(0, CFG)
    expected, _ = init_vq_nfr(
        0, CFG, nfr, np.zeros((CFG.num_embed, CFG.z_dim), np.float32))
    nets = {name: _rand_mlp_like(expected[name], rs)
            for name in ("fine_enc", "bottleneck", "diff_main", "spec_main",
                         "rough_main", "diff_vq", "spec_vq", "rough_vq")}
    variables = {
        "_light": rs.rand(*CFG.light_res, 3).astype(np.float32),
        "_codebook": rs.rand(CFG.z_dim, CFG.num_embed).astype(np.float32),
        "_gamma_bias": rs.rand(1).astype(np.float32),
        "_gamma_index": rs.rand(1).astype(np.float32),
    }
    avg_cs = rs.rand(CFG.num_embed).astype(np.float32)
    avg_dw = rs.rand(CFG.z_dim, CFG.num_embed).astype(np.float32)
    counter = 1000

    root = tf.Module()
    for name, layers in nets.items():
        for i, (w, b) in enumerate(layers):
            lay = tf.Module()
            lay.kernel = tf.Variable(w)
            lay.bias = tf.Variable(b)
            setattr(root, "net_%s_layer%d" % (name, i), lay)
    for attr, v in variables.items():
        setattr(root, attr, tf.Variable(v))
    vq_layer = tf.Module()
    for which, avg in (("cluster_size", avg_cs), ("dw", avg_dw)):
        m = tf.Module()
        m._counter = tf.Variable(counter, dtype=tf.int64)
        m.average = tf.Variable(avg)
        setattr(vq_layer, "ema_%s" % which, m)
    root.vq_layer = vq_layer
    ckpt = tf.train.Checkpoint(step=tf.Variable(1, dtype=tf.int64), net=root)
    d = tmp_path / "vq_avg_only"
    tf.train.CheckpointManager(ckpt, str(d), max_to_keep=1).save()

    _, ema_state, cfg = ti.import_vq_nfr(str(d))
    scale = 1.0 - cfg.vq_decay ** counter
    np.testing.assert_allclose(np.asarray(ema_state.hidden_cluster_size),
                               avg_cs * scale, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ema_state.hidden_dw),
                               avg_dw * scale, rtol=1e-6)
    assert int(ema_state.counter) == counter


def test_cli_script_writes_our_layout(tmp_path):
    rs = np.random.RandomState(5)
    d, _, variables, _ = _vq_fixture(tmp_path, rs)
    out = tmp_path / "imported"

    import subprocess
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts",
                                      "import_tf_checkpoint.py"),
         "--phase", "vq_nfr", "--ckpt", str(d), "--out", str(out),
         "--main-k", "4"],
        capture_output=True, text=True, env={**os.environ,
                                             "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr

    from vqnerf_release_tpu.utils import ckpt as ckpt_util
    state = ckpt_util.load_ckpt(ckpt_util.latest_ckpt(str(out)))
    assert set(state) == {"params", "ema", "opt_state", "epoch"}
    np.testing.assert_array_equal(np.asarray(state["params"]["codebook"]),
                                  variables["_codebook"])
    light = np.load(out / "vis_vali" / "np_light.npy")
    np.testing.assert_array_equal(light, variables["_light"])
    from vqnerf_release_tpu.pipelines.test_driver import find_vq
    epoch_dirs = sorted(
        p for p in os.listdir(out / "vis_vali") if p.startswith("epoch"))
    assert find_vq(str(out / "vis_vali" / epoch_dirs[-1])) == 4


def test_as_train_state_all_phases(tmp_path):
    """Each phase's imported params wrap into the exact state dict the
    corresponding training loop checkpoints (train/loop.py), with a fresh
    optimizer sized to the trainable subtree."""
    rs = np.random.RandomState(9)
    nfr_dir, _, _ = _nfr_fixture(tmp_path, rs)
    nfr_params, cfg = ti.import_nfr_unit(str(nfr_dir))
    st = ti.as_train_state("nfr_unit", cfg, nfr_params, epoch=7)
    assert set(st) == {"params", "opt_state", "epoch"} and st["epoch"] == 7

    vq_dir, vq_nets, _, _ = _vq_fixture(tmp_path, rs)
    vq_params, ema, vq_cfg = ti.import_vq_nfr(str(vq_dir))

    ref_expected = init_ref_nfr(
        0, vq_cfg, vq_params, np.zeros(vq_cfg.light_res + (3,), np.float32))
    ref_nets = {name: _rand_mlp_like(ref_expected["train"][name], rs)
                for name in ("rgb_enc", "diff_out", "rough_out")}
    ref_dir = tmp_path / "ref2"
    _save_reference_style_ckpt(ref_dir, ref_nets, {
        "_light": rs.rand(*vq_cfg.light_res, 3).astype(np.float32),
        "_gamma_bias": rs.rand(1).astype(np.float32),
        "_gamma_index": rs.rand(1).astype(np.float32)})
    ref_params, ref_cfg = ti.import_ref_nfr(str(ref_dir), str(vq_dir))
    st = ti.as_train_state("ref_nfr", ref_cfg, ref_params, epoch=3)
    assert set(st) == {"params", "opt_state", "epoch"}
    # the optimizer state covers exactly the trainable subtree
    import jax
    opt_leaves = len(jax.tree_util.tree_leaves(st["opt_state"]))
    assert opt_leaves > 0
    with pytest.raises(ValueError, match="ema_state"):
        ti.as_train_state("vq_nfr", vq_cfg, vq_params)
    with pytest.raises(ValueError, match="unknown phase"):
        ti.as_train_state("bogus", vq_cfg, vq_params)
