"""NeuS runner (epoch driver) + marching-tetrahedra mesh extraction."""

import os

import numpy as np

from vqnerf_release_tpu.data.neus_dataset import NerfSceneDataset
from vqnerf_release_tpu.models.neus import NeuSConfig
from vqnerf_release_tpu.ops.marching_cubes import marching_cubes
from vqnerf_release_tpu.train.neus_loop import NeuSRunner
from vqnerf_release_tpu.train.neus_trainer import NeuSTrainConfig

from tests.test_gen_geo import _make_stage1_scene


def test_marching_cubes_sphere():
    n = 24
    lin = np.linspace(-1, 1, n)
    xs, ys, zs = np.meshgrid(lin, lin, lin, indexing="ij")
    r = 0.6
    u = r - np.sqrt(xs**2 + ys**2 + zs**2)  # inside (u>0) is the ball
    verts, tris = marching_cubes(u, 0.0)
    assert len(verts) > 100
    assert len(tris) > 100
    assert tris.max() < len(verts)
    # index space -> world
    world = verts / (n - 1) * 2.0 - 1.0
    radii = np.linalg.norm(world, axis=1)
    np.testing.assert_allclose(radii.mean(), r, atol=0.05)
    assert radii.std() < 0.05
    # triangle areas nonzero
    a = world[tris[:, 1]] - world[tris[:, 0]]
    b = world[tris[:, 2]] - world[tris[:, 0]]
    areas = 0.5 * np.linalg.norm(np.cross(a, b), axis=1)
    assert (areas > 0).all()


def test_marching_cubes_empty():
    u = -np.ones((8, 8, 8))
    verts, tris = marching_cubes(u, 0.0)
    assert len(verts) == 0 and len(tris) == 0


def test_neus_runner_train_ckpt_resume(tmp_path):
    root = str(tmp_path / "scene")
    os.makedirs(root)
    _make_stage1_scene(root)
    ds = NerfSceneDataset(root, is_train=True, near=0.5, far=3.5)
    cfg = NeuSConfig(n_samples=8, n_importance=8, up_sample_steps=2)
    tcfg = NeuSTrainConfig(end_iter=6, warm_up_end=2, batch_size=64,
                           save_freq=3, val_freq=1000,
                           use_white_bkgd=True)
    exp_dir = str(tmp_path / "exp")
    runner = NeuSRunner(cfg, tcfg, ds, exp_dir, seed=0)
    hist = runner.train(log_every=1)
    assert runner.iter_step == 6
    assert all(np.isfinite(h["loss"]) for h in hist)
    assert os.path.isdir(os.path.join(exp_dir, "checkpoints", "ckpt-6"))

    # resume picks up the saved step
    runner2 = NeuSRunner(cfg, tcfg, ds, exp_dir, seed=0)
    assert runner2.try_resume() == 6
    # params actually restored (differ from fresh init)
    fresh = NeuSRunner(cfg, tcfg, ds, str(tmp_path / "exp2"), seed=0)
    v_trained = float(runner2.params["variance"]["variance"])
    v_fresh = float(fresh.params["variance"]["variance"])
    assert v_trained != v_fresh

    # validation render writes a PNG
    img, wsum = runner.validate_image(0)
    assert img.shape[2] == 3
    files = os.listdir(os.path.join(exp_dir, "validations_fine"))
    assert any(f.endswith(".png") for f in files)

    # mesh extraction on the (roughly spherical) SDF
    verts, tris = runner.validate_mesh(resolution=24)
    assert len(verts) > 50
    files = os.listdir(os.path.join(exp_dir, "meshes"))
    assert any(f.endswith(".ply") for f in files)


def test_multi_step_dispatch_matches_schedule(tmp_path):
    """steps_per_dispatch=4: the scanned multi-step path consumes the
    same per-step LR/anneal schedule (indices base..base+3), trains to
    a finite loss, hits exactly end_iter, and fires save/val cadences
    that are not multiples of K."""
    import jax
    import numpy as np

    from tests.test_gen_geo import _make_stage1_scene
    from vqnerf_release_tpu.data.neus_dataset import NerfSceneDataset
    from vqnerf_release_tpu.models.neus import NeuSConfig
    from vqnerf_release_tpu.train.neus_loop import NeuSRunner
    from vqnerf_release_tpu.train.neus_trainer import NeuSTrainConfig

    import os
    root = str(tmp_path / "scene")
    os.makedirs(root)
    _make_stage1_scene(root, n_train=2, n_val=1)
    ds = NerfSceneDataset(root, is_train=True, near=0.5, far=3.5)
    cfg = NeuSConfig(n_samples=8, n_importance=8, up_sample_steps=2)
    tcfg = NeuSTrainConfig(batch_size=8, end_iter=10, warm_up_end=2,
                           save_freq=6, val_freq=10**9,
                           steps_per_dispatch=4)
    runner = NeuSRunner(cfg, tcfg, ds, str(tmp_path / "exp"))
    hist = runner.train(log_every=2)
    assert runner.iter_step == 10  # 4 + 4 + 1 + 1 (tail single steps)
    assert hist and all(np.isfinite(h["loss"]) for h in hist)
    # save_freq=6 crossed inside the second 4-step dispatch
    from vqnerf_release_tpu.utils import ckpt as ckpt_util
    assert ckpt_util.latest_ckpt(str(tmp_path / "exp")) is not None
    # LR schedule advanced past warm-up (factor > 0 after step 2)
    assert hist[-1]["lr"] > 0


def test_sampler_schedule_tail_phase(tmp_path):
    """Two-phase sampler schedule (NeuSTrainConfig.tail_frac): the tail
    trains under tail_sampler with occ guidance off, dispatches never
    straddle the boundary, and the tagged parity validation render
    writes its own PNG."""
    import os

    import numpy as np

    from tests.test_gen_geo import _make_stage1_scene
    from vqnerf_release_tpu.data.neus_dataset import NerfSceneDataset
    from vqnerf_release_tpu.models.neus import NeuSConfig
    from vqnerf_release_tpu.train.neus_loop import NeuSRunner
    from vqnerf_release_tpu.train.neus_trainer import NeuSTrainConfig

    root = str(tmp_path / "scene")
    os.makedirs(root)
    _make_stage1_scene(root, n_train=2, n_val=1)
    ds = NerfSceneDataset(root, is_train=True, near=0.5, far=3.5)
    cfg = NeuSConfig(n_samples=8, n_importance=8, up_sample_steps=2)
    tcfg = NeuSTrainConfig(batch_size=8, end_iter=10, warm_up_end=2,
                           save_freq=10**9, val_freq=10**9,
                           occ_res=8, occ_update_freq=2,
                           steps_per_dispatch=4,
                           tail_frac=0.4, tail_sampler="12+4r1")
    runner = NeuSRunner(cfg, tcfg, ds, str(tmp_path / "exp"))
    assert runner._tail_cfg.n_samples == 12
    assert runner._tail_cfg.n_importance == 4
    assert runner._tail_cfg.up_sample_steps == 1

    hist = runner.train(log_every=1)
    assert runner.iter_step == 10
    assert hist and all(np.isfinite(h["loss"]) for h in hist)
    # tail_start = 10 - 4 = 6: one k=4 main dispatch, two single steps
    # up to the boundary, one k=4 tail dispatch — both phases compiled
    tails = {tail for (_, _, tail, _) in runner._fn_cache}
    assert tails == {False, True}
    # occ grid rebuilds stop at the boundary (tail runs without occ)
    assert runner._occ_built_at < 6

    # explicit-render-config validation writes a tagged PNG
    img, _ = runner.validate_image(0, render_cfg=runner._tail_cfg,
                                   tag="_parity")
    assert img.shape[2] == 3
    files = os.listdir(os.path.join(str(tmp_path / "exp"),
                                    "validations_fine"))
    assert any(f.endswith("_parity.png") for f in files)


def test_sampler_schedule_tail_occ(tmp_path):
    """tail_occ=True keeps occupancy guidance in the tail phase: the
    grid continues rebuilding past the boundary and the tail step fn is
    compiled with the occ-grid argument (dense occ-placed tail, r5)."""
    import os

    import numpy as np

    from tests.test_gen_geo import _make_stage1_scene
    from vqnerf_release_tpu.data.neus_dataset import NerfSceneDataset
    from vqnerf_release_tpu.models.neus import NeuSConfig
    from vqnerf_release_tpu.train.neus_loop import NeuSRunner
    from vqnerf_release_tpu.train.neus_trainer import NeuSTrainConfig

    root = str(tmp_path / "scene")
    os.makedirs(root)
    _make_stage1_scene(root, n_train=2, n_val=1)
    ds = NerfSceneDataset(root, is_train=True, near=0.5, far=3.5)
    cfg = NeuSConfig(n_samples=8, n_importance=8, up_sample_steps=2)
    tcfg = NeuSTrainConfig(batch_size=8, end_iter=10, warm_up_end=2,
                           save_freq=10**9, val_freq=10**9,
                           occ_res=8, occ_update_freq=2,
                           steps_per_dispatch=4,
                           tail_frac=0.4, tail_sampler="12+4r1",
                           tail_occ=True)
    runner = NeuSRunner(cfg, tcfg, ds, str(tmp_path / "exp"))
    hist = runner.train(log_every=1)
    assert runner.iter_step == 10
    assert hist and all(np.isfinite(h["loss"]) for h in hist)
    tails = {tail for (_, _, tail, _) in runner._fn_cache}
    assert tails == {False, True}
    # the grid KEPT rebuilding inside the tail (boundary at step 6,
    # occ_update_freq=2 -> a rebuild at >= 6)
    assert runner._occ_built_at >= 6


def test_carve_auto_switch_and_bit_identity(tmp_path):
    """carve_auto (r5): the interior-fraction probe fires at the first
    occ rebuild past warm_up_end; the geometric-init SDF is a fat
    sphere, so a low threshold switches the carve tier (alt step fns
    compiled) while a high threshold decides no-switch and the run is
    BIT-IDENTICAL to carve_auto=False (the probe consumes no RNG)."""
    import jax
    import os

    from tests.test_gen_geo import _make_stage1_scene
    from vqnerf_release_tpu.data.neus_dataset import NerfSceneDataset
    from vqnerf_release_tpu.models.neus import NeuSConfig
    from vqnerf_release_tpu.train.neus_loop import NeuSRunner
    from vqnerf_release_tpu.train.neus_trainer import NeuSTrainConfig

    root = str(tmp_path / "scene")
    os.makedirs(root)
    _make_stage1_scene(root, n_train=2, n_val=1)
    ds = NerfSceneDataset(root, is_train=True, near=0.5, far=3.5)
    cfg = NeuSConfig(n_samples=8, n_importance=4, up_sample_steps=1)
    base = dict(batch_size=8, end_iter=8, warm_up_end=2,
                save_freq=10**9, val_freq=10**9,
                occ_res=8, occ_update_freq=2, steps_per_dispatch=2)

    # low threshold: the init sphere's interior fraction clears it
    tcfg = NeuSTrainConfig(**base, carve_auto=True,
                           carve_alt_sampler="12+6r2",
                           carve_auto_thresh=0.05,
                           carve_probe_res=48)
    r_sw = NeuSRunner(cfg, tcfg, ds, str(tmp_path / "sw"))
    r_sw.train(log_every=1)
    assert r_sw._carve_alt is True
    alts = {alt for (_, _, _, alt) in r_sw._fn_cache}
    assert alts == {False, True}
    assert r_sw._alt_cfg.n_samples == 12
    assert r_sw._alt_cfg.n_importance == 6

    # impossible threshold: no switch, and the trajectory equals the
    # carve_auto=False run exactly
    tcfg_no = NeuSTrainConfig(**base, carve_auto=True,
                              carve_auto_thresh=1.1)
    r_no = NeuSRunner(cfg, tcfg_no, ds, str(tmp_path / "no"))
    r_no.train(log_every=1)
    assert r_no._carve_alt is False
    tcfg_off = NeuSTrainConfig(**base)
    r_off = NeuSRunner(cfg, tcfg_off, ds, str(tmp_path / "off"))
    r_off.train(log_every=1)
    a = jax.tree_util.tree_leaves(r_no.params)
    b = jax.tree_util.tree_leaves(r_off.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_multi_step_equals_single_steps():
    """With a FIXED batch and per-step keys folded the same way, K
    scanned steps produce the same params as K eager steps."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vqnerf_release_tpu.models.neus import NeuSConfig, init_neus
    from vqnerf_release_tpu.train.neus_trainer import (
        NeuSTrainConfig, init_neus_opt_state, make_neus_multi_step,
        make_neus_train_step)

    cfg = NeuSConfig(n_samples=8, n_importance=8, up_sample_steps=2,
                     perturb=0.0)
    tcfg = NeuSTrainConfig(batch_size=8, end_iter=100, warm_up_end=5)
    params = init_neus(0, cfg)
    opt = init_neus_opt_state(params)
    rs = np.random.RandomState(0)
    d = rs.randn(8, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    batch = {
        "rays_o": jnp.asarray(np.tile([[0, 0, -2.0]], (8, 1)),
                              jnp.float32),
        "rays_d": jnp.asarray(d),
        "rgb": jnp.full((8, 3), 0.5), "mask": jnp.ones((8, 1)),
        "near": jnp.full((8, 1), 1.0), "far": jnp.full((8, 1), 3.0),
        "valid": jnp.ones((8, 1)),
    }
    key = jax.random.PRNGKey(7)
    k = 3

    step = jax.jit(make_neus_train_step(cfg, tcfg, radius=1.0))
    p1, o1 = params, opt
    for i in range(k):
        p1, o1, m1 = step(p1, o1, batch, jax.random.fold_in(key, i),
                          jnp.asarray(float(2 + i)))

    multi = jax.jit(make_neus_multi_step(cfg, tcfg, radius=1.0, k=k))
    batches = {kk: jnp.stack([v] * k) for kk, v in batch.items()}
    p2, o2, m2 = multi(params, opt, batches, key, jnp.asarray(2.0))

    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
    # multi-step metrics reduce across the block (finite-mean for loss,
    # SUM for nonfinite_grads) — compare against the eager-step means
    eager_losses = []
    p, o = params, opt
    for i in range(k):
        p, o, m = step(p, o, batch, jax.random.fold_in(key, i),
                       jnp.asarray(float(2 + i)))
        eager_losses.append(float(m["loss"]))
    np.testing.assert_allclose(
        float(m2["loss"]), np.mean(eager_losses), rtol=1e-5)
    assert float(m2["nonfinite_grads"]) == 0.0
