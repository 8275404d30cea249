"""Trainer integration tests: losses decrease on synthetic data; the
vq_nfr step runs sharded over the 8 virtual CPU devices."""

import jax
import jax.numpy as jnp
import numpy as np

from vqnerf_release_tpu.models import decomp_common as dc
from vqnerf_release_tpu.models.neus import NeuSConfig, init_neus
from vqnerf_release_tpu.models.nfr_unit import init_nfr_unit
from vqnerf_release_tpu.models.ref_nfr import init_ref_nfr
from vqnerf_release_tpu.models.vq_nfr import init_vq_nfr
from vqnerf_release_tpu.ops.vq import init_vq_ema_state
from vqnerf_release_tpu.parallel import get_mesh, replicate, shard_batch
from vqnerf_release_tpu.train.decomp_trainer import (
    decomp_lr, make_nfr_unit_step, make_ref_nfr_step, make_vq_nfr_step)
from vqnerf_release_tpu.train.neus_trainer import (
    NeuSTrainConfig, init_neus_opt_state, make_neus_train_step,
    neus_lr_factor)

CFG = dc.DecompConfig(light_h=4, num_embed=6, num_drop=4, z_dim=32,
                      mlp_width=16, thres_str="0.1;0.2;0.3;0.4",
                      lambert_weight=1e-3)


def _decomp_batch(cfg, n=64, seed=0, with_ref=False):
    rs = np.random.RandomState(seed)
    b = {
        "rayo": np.tile(np.array([[0, 0, 3.0]], np.float32), (n, 1)),
        "rayd": rs.randn(n, 3).astype(np.float32),
        "rgb": rs.rand(n, 3).astype(np.float32),
        "alpha": np.ones((n, 1), np.float32),
        "pred_alpha": np.ones((n, 1), np.float32),
        "xyz": (rs.rand(n, 3).astype(np.float32) - 0.5),
        "normal": rs.randn(n, 3).astype(np.float32),
        "lvis": rs.rand(n, cfg.n_lights).astype(np.float32),
    }
    b["normal"] /= np.linalg.norm(b["normal"], axis=1, keepdims=True)
    if with_ref:
        b["ref"] = rs.rand(n, 3).astype(np.float32)
    return {k: jnp.asarray(v) for k, v in b.items()}


def test_lr_schedules():
    tcfg = NeuSTrainConfig(end_iter=1000, warm_up_end=100)
    assert float(neus_lr_factor(50, tcfg)) == 0.5
    assert abs(float(neus_lr_factor(100, tcfg)) - 1.0) < 1e-6
    assert abs(float(neus_lr_factor(1000, tcfg)) - 0.05) < 1e-6

    assert abs(decomp_lr(0, CFG) - CFG.lr) < 1e-12
    assert abs(decomp_lr(CFG.lr_decay_steps, CFG)
               - CFG.lr * CFG.lr_decay_rate) < 1e-10


def test_nfr_unit_training_reduces_loss():
    lxyz, lareas = dc.light_constants(CFG)
    params = init_nfr_unit(0, CFG)
    tx, step_fn = make_nfr_unit_step(CFG, lxyz, lareas)
    opt_state = tx.init(params)
    batch = _decomp_batch(CFG)
    losses = []
    for step in range(30):
        params, opt_state, ld = step_fn(params, opt_state, batch,
                                        jnp.asarray(step, jnp.float32))
        losses.append(float(ld["loss"]))
    assert losses[-1] < losses[0] * 0.9
    assert np.isfinite(losses).all()


def test_vq_nfr_training_step_sharded():
    lxyz, lareas = dc.light_constants(CFG)
    nfr_params = init_nfr_unit(0, CFG)
    centers = np.random.RandomState(0).rand(
        CFG.num_embed, CFG.z_dim).astype(np.float32)
    params, ema_state = init_vq_nfr(0, CFG, nfr_params, centers)
    tx, step_fn = make_vq_nfr_step(CFG, lxyz, lareas)
    opt_state = tx.init(params)

    mesh = get_mesh()
    assert mesh.devices.size == 8, "conftest must expose 8 virtual devices"
    batch_np = {k: np.asarray(v)
                for k, v in _decomp_batch(CFG, n=64).items()}
    batch, n_orig = shard_batch(batch_np, mesh)
    assert n_orig == 64

    rep = replicate(mesh)
    params = jax.device_put(params, rep)
    opt_state = jax.device_put(opt_state, rep)
    thres = jnp.asarray(CFG.train_thres())

    losses = []
    ema = ema_state
    for step in range(15):
        rng = jax.random.PRNGKey(step)
        params, ema, opt_state, ld = step_fn(
            params, ema, opt_state, batch, thres, rng,
            jnp.asarray(step, jnp.float32))
        losses.append(float(ld["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert int(ema.counter) == 15
    # the codebook moved (EMA) but stayed finite
    assert np.isfinite(np.asarray(params["codebook"])).all()


def test_ref_nfr_training_updates_only_train_subtree():
    lxyz, lareas = dc.light_constants(CFG)
    nfr_params = init_nfr_unit(0, CFG)
    centers = np.random.RandomState(0).rand(
        CFG.num_embed, CFG.z_dim).astype(np.float32)
    vq_params, _ = init_vq_nfr(0, CFG, nfr_params, centers)
    light = np.ones((*CFG.light_res, 3), np.float32) * 0.5
    params = init_ref_nfr(0, CFG, vq_params, light)
    frozen_before = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), params["frozen"])

    tx, step_fn = make_ref_nfr_step(CFG, lxyz, lareas)
    opt_state = tx.init(params["train"])
    batch = _decomp_batch(CFG, with_ref=True)
    losses = []
    for step in range(20):
        params, opt_state, ld = step_fn(params, opt_state, batch,
                                        jnp.asarray(step, jnp.float32))
        losses.append(float(ld["loss"]))
    assert losses[-1] < losses[0]
    # frozen subtree bit-identical
    for a, b in zip(jax.tree_util.tree_leaves(frozen_before),
                    jax.tree_util.tree_leaves(params["frozen"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_neus_train_step_runs_and_improves():
    cfg = NeuSConfig(n_samples=12, n_importance=12, up_sample_steps=2,
                     perturb=1.0)
    tcfg = NeuSTrainConfig(end_iter=100, warm_up_end=10, batch_size=32,
                           use_white_bkgd=False)
    params = init_neus(0, cfg)
    opt_state = init_neus_opt_state(params)
    step_fn = jax.jit(make_neus_train_step(cfg, tcfg, radius=1.0))

    rs = np.random.RandomState(0)
    n = 32
    # rays through the init sphere; target color mid-gray, mask 1
    dirs = rs.randn(n, 3)
    dirs[:, 2] = -np.abs(dirs[:, 2]) - 1.0
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    batch = {
        "rays_o": jnp.asarray(
            np.tile([[0, 0, 2.0]], (n, 1)), jnp.float32),
        "rays_d": jnp.asarray(dirs, jnp.float32),
        "rgb": jnp.full((n, 3), 0.6),
        "mask": jnp.ones((n, 1)),
        "near": jnp.full((n, 1), 0.5),
        "far": jnp.full((n, 1), 3.5),
        "valid": jnp.ones((n, 1)),
    }
    losses = []
    for step in range(12):
        key = jax.random.PRNGKey(step)
        params, opt_state, metrics = step_fn(
            params, opt_state, batch, key, jnp.asarray(step, jnp.float32))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_ckpt_retention(tmp_path):
    from vqnerf_release_tpu.utils import ckpt as cu
    for step in (1, 2, 3, 4):
        cu.save_ckpt(str(tmp_path), step, {"x": jnp.ones((2,)) * step},
                     keep=2)
    ckpts = cu.list_ckpts(str(tmp_path))
    assert [c.split("-")[-1] for c in ckpts] == ["3", "4"]
    latest = cu.latest_ckpt(str(tmp_path))
    restored = cu.load_ckpt(latest)
    np.testing.assert_allclose(np.asarray(restored["x"]), 4.0)


def test_neus_train_step_pallas_upsample_matches():
    """use_pallas routes the (stop-gradiented) up-sample SDF evals through
    the fused kernel; the training step must stay numerically equivalent
    (verified on TPU to 1e-6; interpret mode here exercises the wiring +
    autodiff safety on CPU)."""
    cfg = NeuSConfig(n_samples=16, n_importance=16, up_sample_steps=2,
                     perturb=1.0)
    n = 32  # 32*16=512 and 32*8=256: BLOCK(=256)-aligned
    rs = np.random.RandomState(0)
    dirs = rs.randn(n, 3)
    dirs[:, 2] = -np.abs(dirs[:, 2]) - 1.0
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    batch = {
        "rays_o": jnp.asarray(np.tile([[0, 0, 2.0]], (n, 1)), jnp.float32),
        "rays_d": jnp.asarray(dirs, jnp.float32),
        "rgb": jnp.full((n, 3), 0.6),
        "mask": jnp.ones((n, 1)),
        "near": jnp.full((n, 1), 0.5),
        "far": jnp.full((n, 1), 3.5),
        "valid": jnp.ones((n, 1)),
    }

    finals = []
    for use_pallas in (False, "interpret"):
        tcfg = NeuSTrainConfig(end_iter=100, warm_up_end=10, batch_size=n,
                               use_white_bkgd=False, use_pallas=use_pallas)
        params = init_neus(0, cfg)
        opt_state = init_neus_opt_state(params)
        step_fn = jax.jit(make_neus_train_step(cfg, tcfg, radius=1.0))
        losses = []
        for step in range(3):
            params, opt_state, m = step_fn(
                params, opt_state, batch, jax.random.PRNGKey(step),
                jnp.asarray(step, jnp.float32))
            losses.append(float(m["loss"]))
        finals.append((losses, params))

    (l_ref, p_ref), (l_pal, p_pal) = finals
    np.testing.assert_allclose(l_pal, l_ref, rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_pal)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)


def test_neus_train_step_sharded():
    """Stage-1 step over the 8-device ray mesh: params replicated, batch
    sharded, loss finite and equal to the single-device step."""
    cfg = NeuSConfig(n_samples=12, n_importance=12, up_sample_steps=2,
                     perturb=0.0)
    tcfg = NeuSTrainConfig(end_iter=100, warm_up_end=10, batch_size=64,
                           use_white_bkgd=False)
    params = init_neus(0, cfg)
    opt_state = init_neus_opt_state(params)
    step_fn = jax.jit(make_neus_train_step(cfg, tcfg, radius=1.0))

    rs = np.random.RandomState(0)
    n = 64
    dirs = rs.randn(n, 3)
    dirs[:, 2] = -np.abs(dirs[:, 2]) - 1.0
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    batch_np = {
        "rays_o": np.tile([[0, 0, 2.0]], (n, 1)).astype(np.float32),
        "rays_d": dirs.astype(np.float32),
        "rgb": np.full((n, 3), 0.6, np.float32),
        "mask": np.ones((n, 1), np.float32),
        "near": np.full((n, 1), 0.5, np.float32),
        "far": np.full((n, 1), 3.5, np.float32),
        "valid": np.ones((n, 1), np.float32),
    }
    key = jax.random.PRNGKey(0)
    step = jnp.asarray(0.0)

    # single-device reference
    _, _, m_ref = step_fn(params, opt_state,
                          {k: jnp.asarray(v) for k, v in batch_np.items()},
                          key, step)

    mesh = get_mesh()
    batch, n_orig = shard_batch(batch_np, mesh)
    assert n_orig == n
    rep = replicate(mesh)
    p = jax.device_put(params, rep)
    o = jax.device_put(opt_state, rep)
    p, o, m = step_fn(p, o, batch, key, step)
    assert np.isfinite(float(m["loss"]))
    np.testing.assert_allclose(float(m["loss"]), float(m_ref["loss"]),
                               rtol=1e-4)


def test_vq_nfr_sharded_trajectory_matches_single_device():
    """Multi-chip correctness (not just liveness): 3 chained vq_nfr
    optimizer steps over the 8-device ray mesh reproduce the 1-device
    param/EMA/codebook trajectory bit-for-bit up to reduction order
    (r2 VERDICT #7)."""
    lxyz, lareas = dc.light_constants(CFG)
    nfr_params = init_nfr_unit(0, CFG)
    centers = np.random.RandomState(0).rand(
        CFG.num_embed, CFG.z_dim).astype(np.float32)
    params0, ema0 = init_vq_nfr(0, CFG, nfr_params, centers)
    tx, step_fn = make_vq_nfr_step(CFG, lxyz, lareas)
    thres = jnp.asarray(CFG.train_thres())
    batches = [
        {k: np.asarray(v) for k, v in _decomp_batch(
            CFG, n=64, seed=s).items()} for s in range(3)]

    def run(sharded):
        # fresh copies: step_fn donates params/ema/opt_state buffers
        params = jax.tree_util.tree_map(jnp.array, params0)
        ema = jax.tree_util.tree_map(jnp.array, ema0)
        opt_state = tx.init(params)
        if sharded:
            mesh = get_mesh()
            rep = replicate(mesh)
            params = jax.device_put(params, rep)
            opt_state = jax.device_put(opt_state, rep)
        traj = []
        for step, b in enumerate(batches):
            if sharded:
                batch, _ = shard_batch(dict(b), get_mesh())
            else:
                batch = {k: jnp.asarray(v) for k, v in b.items()}
            params, ema, opt_state, _ = step_fn(
                params, ema, opt_state, batch, thres,
                jax.random.PRNGKey(step),
                jnp.asarray(step, jnp.float32))
            traj.append((jax.tree_util.tree_map(np.asarray, params),
                         jax.tree_util.tree_map(np.asarray, ema)))
        return traj

    single = run(sharded=False)
    multi = run(sharded=True)
    for step, ((p1, e1), (p8, e8)) in enumerate(zip(single, multi)):
        for (path, a), (_, b) in zip(
                jax.tree_util.tree_flatten_with_path(p1)[0],
                jax.tree_util.tree_flatten_with_path(p8)[0]):
            np.testing.assert_allclose(
                a, b, rtol=2e-4, atol=1e-5,
                err_msg=f"step {step} {jax.tree_util.keystr(path)}")
        np.testing.assert_allclose(
            e1.hidden_cluster_size, e8.hidden_cluster_size, rtol=1e-4,
            atol=1e-5, err_msg=f"step {step} ema cluster size")
        np.testing.assert_allclose(
            e1.hidden_dw, e8.hidden_dw, rtol=1e-4, atol=1e-5,
            err_msg=f"step {step} ema dw")
