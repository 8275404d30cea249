"""Two-tier adaptive NeuS training step (NeuSTrainConfig.adaptive_empty):
rays with a provably-empty occupancy span render with the cheap tier;
loss semantics must match the full-budget step closely, every ray must
keep gradient flow, and the runner must pick/refresh the active cap.

Reference contrast: geo/NeuS-ours2/models/renderer.py:311-355 spends the
full sample budget on every ray.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqnerf_release_tpu.models.neus import NeuSConfig, init_neus
from vqnerf_release_tpu.ops.occupancy import build_occ_grid
from vqnerf_release_tpu.train.neus_trainer import (NeuSTrainConfig,
                                                   init_neus_opt_state,
                                                   make_neus_train_step)

CFG = NeuSConfig(n_samples=8, n_importance=8, up_sample_steps=2,
                 perturb=0.0)
TCFG = NeuSTrainConfig(batch_size=32, occ_res=32, adaptive_empty=True,
                       empty_n_samples=4, use_white_bkgd=True,
                       skip_nonfinite_updates=False)
RADIUS = 1.0


def _mixed_batch(n=32, frac_active=0.5, seed=0):
    """Half the rays aim at the init sphere (active), half miss it."""
    rs = np.random.RandomState(seed)
    n_act = int(n * frac_active)
    rays_o = np.tile(np.array([[2.0, 0.1, 0.0]], np.float32), (n, 1))
    to_center = -rays_o[0] / np.linalg.norm(rays_o[0])
    d_act = to_center[None] + 0.05 * rs.randn(n_act, 3)
    d_miss = np.array([[0.0, 1.0, 0.0]], np.float32) \
        + 0.05 * rs.randn(n - n_act, 3)
    rays_d = np.concatenate([d_act, d_miss]).astype(np.float32)
    rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)
    perm = rs.permutation(n)  # interleave tiers like a real batch
    rays_o, rays_d = rays_o[perm], rays_d[perm]
    return {
        "rays_o": jnp.asarray(rays_o), "rays_d": jnp.asarray(rays_d),
        "rgb": jnp.asarray(rs.rand(n, 3).astype(np.float32)),
        "mask": jnp.asarray(
            (rays_d[:, 0] < -0.5).astype(np.float32)[:, None]),
        "near": jnp.full((n, 1), 0.5, jnp.float32),
        "far": jnp.full((n, 1), 3.5, jnp.float32),
        "valid": jnp.ones((n, 1), jnp.float32),
    }


@pytest.fixture(scope="module")
def setup():
    params = init_neus(0, CFG)
    grid = build_occ_grid(params["sdf"], CFG.sdf, radius=RADIUS, res=32)
    batch = _mixed_batch()
    return params, grid, batch


def test_adaptive_matches_full_step_loss(setup):
    params, grid, batch = setup
    opt = init_neus_opt_state(params)
    step = jnp.asarray(100.0)
    key = jax.random.PRNGKey(0)

    full = jax.jit(make_neus_train_step(CFG, TCFG, RADIUS, with_occ=True))
    cap = 24  # > n_active (16): every active ray gets the full tier
    two = jax.jit(make_neus_train_step(CFG, TCFG, RADIUS, with_occ=True,
                                       active_cap=cap))
    _, _, m_full = full(params, opt, batch, key, step, grid)
    p2, o2, m_two = two(params, opt, batch, key, step, grid)

    assert 0.0 < float(m_two["active_frac"]) < 1.0
    assert float(m_two["overflow_frac"]) == 0.0
    # empty rays contribute ~identical losses from either tier (their
    # weight_sum is ~0 and color ~bg under both samplers)
    for k in ("loss", "color_loss", "mask_loss"):
        assert np.isfinite(float(m_two[k]))
        np.testing.assert_allclose(float(m_two[k]), float(m_full[k]),
                                   atol=0.05, err_msg=k)
    # params actually moved (gradient flow through both tiers)
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), params, p2)
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_adaptive_overflow_graceful(setup):
    params, grid, batch = setup
    opt = init_neus_opt_state(params)
    two = jax.jit(make_neus_train_step(CFG, TCFG, RADIUS, with_occ=True,
                                       active_cap=8))  # < n_active
    _, _, m = two(params, opt, batch, jax.random.PRNGKey(0),
                  jnp.asarray(0.0), grid)
    assert float(m["overflow_frac"]) > 0.0
    assert np.isfinite(float(m["loss"]))


def test_active_cap_requires_occ():
    with pytest.raises(ValueError, match="active_cap"):
        make_neus_train_step(CFG, TCFG, RADIUS, with_occ=False,
                             active_cap=8)


def test_adaptive_sharded_over_mesh(setup):
    """The argsort/two-tier split must compile and run with the ray axis
    sharded over the 8-device mesh (a global sort inserts collectives)."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from vqnerf_release_tpu.parallel import get_mesh
    from vqnerf_release_tpu.parallel.mesh import RAY_AXIS

    params, grid, batch = setup
    mesh = get_mesh()
    assert mesh.devices.size == 8
    sh = NamedSharding(mesh, P(RAY_AXIS))
    batch_sh = {k: jax.device_put(v, sh) for k, v in batch.items()}
    opt = init_neus_opt_state(params)
    two = jax.jit(make_neus_train_step(CFG, TCFG, RADIUS, with_occ=True,
                                       active_cap=24))
    _, _, m = two(params, opt, batch_sh, jax.random.PRNGKey(0),
                  jnp.asarray(0.0), grid)
    assert np.isfinite(float(m["loss"]))


def test_runner_picks_cap(tmp_path):
    """NeuSRunner(adaptive_empty): after the first grid rebuild the cap
    is either None (all-active) or a multiple of batch/8, and training
    proceeds with finite losses either way."""
    from tests.test_gen_geo import _make_stage1_scene
    from vqnerf_release_tpu.data.neus_dataset import NerfSceneDataset
    from vqnerf_release_tpu.train.neus_loop import NeuSRunner

    root = str(tmp_path)
    _make_stage1_scene(root)
    ds = NerfSceneDataset(root, is_train=True, near=0.5, far=3.5)
    tcfg = NeuSTrainConfig(
        batch_size=32, occ_res=16, occ_update_freq=4, adaptive_empty=True,
        empty_n_samples=4, warm_up_end=2, end_iter=8, val_freq=0,
        save_freq=0, mesh_freq=0, anneal_end=0)
    runner = NeuSRunner(CFG, tcfg, ds, str(tmp_path / "exp"))
    hist = runner.train(n_iters=6, log_every=2)
    assert runner.iter_step == 6
    assert all(np.isfinite(h["loss"]) for h in hist)
    cap = runner._active_cap
    assert cap is None or (0 < cap < 32 and cap % 4 == 0)
