"""Occupancy-grid-guided sampling (ops/occupancy.py) — the stage-1
training throughput lever (r1 VERDICT item 2: algorithmic levers)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqnerf_release_tpu.models import fields
from vqnerf_release_tpu.models.neus import NeuSConfig, init_neus, neus_render
from vqnerf_release_tpu.ops.occupancy import (build_occ_grid,
                                              ray_bin_occupancy,
                                              sample_z_occ)


@pytest.fixture(scope="module")
def sphere_sdf():
    """Geometric-init SDF is approximately a sphere of radius `bias`
    (0.5) — an analytic ground truth for the grid."""
    cfg = NeuSConfig(n_samples=16, n_importance=8, up_sample_steps=2,
                     perturb=1.0)
    params = init_neus(0, cfg)
    return params, cfg


def _zero_crossing_radius(params, cfg):
    """Where the init SDF crosses zero along +x (measured, not assumed —
    the geometric init lands near but not at `bias`)."""
    r = np.linspace(0.0, 1.2, 241).astype(np.float32)
    pts = np.stack([r, np.zeros_like(r), np.zeros_like(r)], -1)
    sdf = np.asarray(fields.sdf_only(params["sdf"], jnp.asarray(pts),
                                     cfg.sdf))
    return float(r[np.argmin(np.abs(sdf))])


def test_build_occ_grid_matches_dense_sdf(sphere_sdf):
    """The grid is exactly |SDF(cell center)| < margin, and on the
    sphere-init SDF it is a sparse shell around the zero crossing."""
    params, cfg = sphere_sdf
    res = 32
    grid = np.asarray(build_occ_grid(params["sdf"], cfg.sdf, radius=1.0,
                                     res=res, margin_factor=1.0))
    assert grid.shape == (res, res, res)

    centers = (np.arange(res, dtype=np.float32) + 0.5) / res * 2 - 1
    x, y, z = np.meshgrid(centers, centers, centers, indexing="ij")
    pts = np.stack([x, y, z], -1).reshape(-1, 3)
    sdf = np.asarray(fields.sdf_only(params["sdf"], jnp.asarray(pts),
                                     cfg.sdf))
    margin = (2.0 / res) * np.sqrt(3.0) / 2.0
    expect = (np.abs(sdf) < margin).astype(np.float32).reshape(grid.shape)
    np.testing.assert_array_equal(grid, expect)

    r0 = _zero_crossing_radius(params, cfg)
    r = np.sqrt(x**2 + y**2 + z**2)
    assert 0.0 < grid.mean() < 0.3  # sparse
    # shell mostly occupied (the init SDF is only approximately
    # spherical, so the +x crossing radius is approximate elsewhere)
    assert grid[np.abs(r - r0) < 0.03].mean() > 0.5
    assert grid[r > r0 + 0.4].sum() == 0  # far field empty


def test_build_occ_grid_chunked_matches_flat(sphere_sdf, monkeypatch):
    """res >= _CHUNKED_BUILD_RES sweeps in z-slabs (the flat sweep's
    peak temp would exceed HBM at 256^3); values must be identical."""
    from vqnerf_release_tpu.ops import occupancy as occ
    params, cfg = sphere_sdf
    flat = np.asarray(build_occ_grid(params["sdf"], cfg.sdf, radius=1.0,
                                     res=32))
    monkeypatch.setattr(occ, "_CHUNKED_BUILD_RES", 32)
    chunked = np.asarray(occ.build_occ_grid(
        params["sdf"], cfg.sdf, radius=1.0, res=32))
    np.testing.assert_array_equal(flat, chunked)


def test_ray_bin_occupancy_hits_shell(sphere_sdf):
    params, cfg = sphere_sdf
    grid = build_occ_grid(params["sdf"], cfg.sdf, radius=1.0, res=32,
                          margin_factor=1.5)
    r0 = _zero_crossing_radius(params, cfg)
    # ray through the center crosses the shell twice
    o = jnp.asarray([[0.0, 0.0, -2.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    near = jnp.asarray([[1.0]])
    far = jnp.asarray([[3.0]])
    occ = np.asarray(ray_bin_occupancy(o, d, near, far, grid, 1.0, 64))[0]
    z = 1.0 + 2.0 * (np.arange(64) + 0.5) / 64  # bin-midpoint depth
    occupied_z = z[occ > 0]
    assert occupied_z.size >= 4
    # all occupied bins sit near the crossing shell, on BOTH crossings
    dist = np.abs(occupied_z - 2.0)
    assert (dist > r0 - 0.25).all() and (dist < r0 + 0.25).all()
    assert (occupied_z < 2.0).any() and (occupied_z > 2.0).any()
    # far outside the sphere stays empty
    assert occ[z > 2.0 + r0 + 0.4].sum() == 0
    # a ray that misses the sphere entirely sees zero occupancy
    o2 = jnp.asarray([[0.0, 1.8, -2.0]])
    occ2 = np.asarray(ray_bin_occupancy(o2, d, near, far, grid, 1.0, 64))
    assert occ2.sum() == 0


def test_sample_z_occ_concentrates(sphere_sdf):
    params, cfg = sphere_sdf
    grid = build_occ_grid(params["sdf"], cfg.sdf, radius=1.0, res=32,
                          margin_factor=1.5)
    r0 = _zero_crossing_radius(params, cfg)
    o = jnp.tile(jnp.asarray([[0.0, 0.0, -2.0]]), (4, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (4, 1))
    near = jnp.full((4, 1), 1.0)
    far = jnp.full((4, 1), 3.0)
    for key in (None, jax.random.PRNGKey(0)):
        z = np.asarray(sample_z_occ(o, d, near, far, grid, 1.0, 32,
                                    key=key, floor=0.05))
        assert z.shape == (4, 32)
        assert (np.diff(z, axis=-1) >= 0).all()  # sorted
        assert (z >= 1.0).all() and (z <= 3.0).all()
        # most samples land in the two shell-crossing bands
        shell = np.abs(np.abs(z - 2.0) - r0) < 0.25
        assert shell.mean() > 0.6
    # all-empty ray degrades to ~uniform coverage via the floor
    o2 = jnp.asarray([[0.0, 1.8, -2.0]])
    z2 = np.asarray(sample_z_occ(o2, d[:1], near[:1], far[:1], grid, 1.0,
                                 32, key=None, floor=0.05))[0]
    assert z2.min() < 1.2 and z2.max() > 2.8


def test_render_with_occ_grid_close_to_uniform(sphere_sdf):
    """Deterministic render with the occupancy sampler matches the
    uniform-init render closely on a well-resolved sphere (both
    converge to the same surface through the up-sample rounds)."""
    params, cfg = sphere_sdf
    grid = build_occ_grid(params["sdf"], cfg.sdf, radius=1.0, res=32)
    rs = np.random.RandomState(0)
    n = 16
    o = np.tile([[0.0, 0.0, -2.0]], (n, 1)).astype(np.float32)
    dxy = rs.rand(n, 2) * 0.4 - 0.2
    d = np.concatenate([dxy, np.ones((n, 1))], axis=1).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    args = (params, cfg, jnp.asarray(o), jnp.asarray(d),
            jnp.full((n, 1), 1.0), jnp.full((n, 1), 3.0), 1.0)
    kw = dict(key=None, background_rgb=jnp.ones((1, 3)),
              cos_anneal_ratio=1.0)
    ref = neus_render(*args, **kw)
    occ = neus_render(*args, **kw, occ_grid=grid)
    # silhouette rays can straddle a bin edge at this tiny test sample
    # count, so compare in bulk (the production quality guardrail is the
    # e2e smoke PSNR at real sample counts)
    dc = np.abs(np.asarray(occ["color_fine"])
                - np.asarray(ref["color_fine"])).max(axis=-1)
    dw = np.abs(np.asarray(occ["weight_sum"])
                - np.asarray(ref["weight_sum"]))[:, 0]
    assert np.median(dc) < 0.02 and np.median(dw) < 0.02
    assert dc.max() < 0.06 and dw.max() < 0.08


def test_train_step_with_occ(sphere_sdf):
    from vqnerf_release_tpu.train.neus_trainer import (
        NeuSTrainConfig, init_neus_opt_state, make_neus_train_step)
    params, cfg = sphere_sdf
    tcfg = NeuSTrainConfig(batch_size=8, end_iter=100, warm_up_end=10,
                           occ_res=16)
    grid = build_occ_grid(params["sdf"], cfg.sdf, radius=1.0, res=16)
    step = jax.jit(make_neus_train_step(cfg, tcfg, radius=1.0,
                                        with_occ=True))
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
    # step 1 not 0: the warm-up LR factor is zero at step 0
    p2, o2, m = step(params, opt, batch, jax.random.PRNGKey(0),
                     jnp.asarray(1.0), grid)
    assert np.isfinite(float(m["loss"]))
    # params actually moved
    before = jax.tree_util.tree_leaves(params["variance"])
    after = jax.tree_util.tree_leaves(p2["variance"])
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(after, before))


def test_runner_rebuilds_grid(tmp_path):
    """NeuSRunner with occ_res trains and rebuilds the grid on the
    configured cadence."""
    from tests.test_gen_geo import _make_stage1_scene
    from vqnerf_release_tpu.data.neus_dataset import NerfSceneDataset
    from vqnerf_release_tpu.train.neus_loop import NeuSRunner
    from vqnerf_release_tpu.train.neus_trainer import NeuSTrainConfig

    root = str(tmp_path / "scene")
    import os
    os.makedirs(root)
    _make_stage1_scene(root, n_train=1, n_val=1)
    ds = NerfSceneDataset(root, is_train=True, near=0.5, far=3.5)
    cfg = NeuSConfig(n_samples=8, n_importance=8, up_sample_steps=2)
    tcfg = NeuSTrainConfig(batch_size=8, end_iter=5, warm_up_end=2,
                           save_freq=100, val_freq=100,
                           occ_res=8, occ_update_freq=2)
    runner = NeuSRunner(cfg, tcfg, ds, str(tmp_path / "exp"))
    runner.train(n_iters=5, log_every=1)
    assert runner._occ_grid is not None
    assert runner._occ_built_at == 4  # rebuilt at 0, 2, 4


def test_geo_override_routes_both_configs():
    """--geo-override keys reach NeuSConfig (sampling) and
    NeuSTrainConfig (occ_*), and unknown keys fail loudly."""
    from types import SimpleNamespace

    from vqnerf_release_tpu.cli import _geo_cfgs

    args = SimpleNamespace(
        scene="lego_3072", n_samples=0,
        geo_override="batch_size=64,occ_res=32,n_samples=16,"
                     "n_importance=8,up_sample_steps=2")
    cfg, tcfg, _ = _geo_cfgs(args)
    assert (cfg.n_samples, cfg.n_importance, cfg.up_sample_steps) \
        == (16, 8, 2)
    assert (tcfg.batch_size, tcfg.occ_res) == (64, 32)
    with pytest.raises(SystemExit, match="unknown key"):
        _geo_cfgs(SimpleNamespace(scene="lego_3072", n_samples=0,
                                  geo_override="nope=1"))


def test_preset_defaults_fast_training_parity_extraction(tmp_path,
                                                         monkeypatch):
    """Family presets default TRAINING to the occupancy 24+8 r2 sampler
    over a 128^3 grid (76-81k rays/s; beats the reference sampler on
    EVERY r3 guardrail scene) while gen-geo EXTRACTION keeps the
    reference-parity 64+64 r4 renderer; both stay one override away."""
    from types import SimpleNamespace

    from vqnerf_release_tpu import config as vcfg
    from vqnerf_release_tpu.cli import _geo_cfgs

    cfg, tcfg, _ = vcfg.neus_configs_for_scene("lego_3072")
    assert (cfg.n_samples, cfg.n_importance, cfg.up_sample_steps,
            tcfg.occ_res) == (24, 8, 2, 128)

    args = SimpleNamespace(scene="lego_3072", geo_override="",
                           n_samples=0)
    cfg_x, tcfg_x, _ = _geo_cfgs(args, extraction=True)
    assert (cfg_x.n_samples, cfg_x.n_importance, cfg_x.up_sample_steps,
            tcfg_x.occ_res) == (64, 64, 4, 0)
    # --geo-override wins over the extraction parity base
    args.geo_override = "n_samples=32"
    cfg_y, _, _ = _geo_cfgs(args, extraction=True)
    assert cfg_y.n_samples == 32 and cfg_y.n_importance == 64


def test_ray_occupied_span(sphere_sdf):
    """Span tightening brackets the crossing shell, pads by pad_bins,
    and flags empty rays as provably free."""
    from vqnerf_release_tpu.ops.occupancy import ray_occupied_span
    params, cfg = sphere_sdf
    grid = build_occ_grid(params["sdf"], cfg.sdf, radius=1.0, res=32,
                          margin_factor=2.0)
    r0 = _zero_crossing_radius(params, cfg)
    o = jnp.asarray([[0.0, 0.0, -2.0], [0.0, 1.8, -2.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    near = jnp.full((2, 1), 1.0)
    far = jnp.full((2, 1), 3.0)
    n2, f2, any_occ = ray_occupied_span(o, d, near, far, grid, 1.0,
                                        n_bins=32)
    n2, f2, any_occ = map(np.asarray, (n2, f2, any_occ))
    # center ray: span brackets both crossings (2 -/+ r0) and shrinks
    assert any_occ[0, 0] == 1.0
    assert n2[0, 0] > 1.0 and f2[0, 0] < 3.0
    assert n2[0, 0] < 2.0 - r0 + 0.1 and f2[0, 0] > 2.0 + r0 - 0.1
    # miss ray: provably free, span unchanged
    assert any_occ[1, 0] == 0.0
    assert n2[1, 0] == 1.0 and f2[1, 0] == 3.0


def test_occ_guided_occlusion_matches(extracted=None, tmp_path=None):
    """GeoExtractor(occ_vis=True) lvis matches the uniform-init
    occlusion on the sphere at EQUAL sampler, and a reduced sampler
    with occupancy-guided samples stays near parity."""
    import os

    from tests.test_gen_geo import _make_stage1_scene
    from vqnerf_release_tpu.data.neus_dataset import NerfSceneDataset
    from vqnerf_release_tpu.pipelines.gen_geo import GeoExtractor
    import tempfile
    root = tempfile.mkdtemp()
    _make_stage1_scene(root, n_train=1, n_val=1)
    ds = NerfSceneDataset(root, is_train=True, near=0.5, far=3.5)
    cfg = NeuSConfig(n_samples=16, n_importance=16, up_sample_steps=2,
                     perturb=0.0)
    params = init_neus(0, cfg)
    mk = lambda **kw: GeoExtractor(params, cfg, ds, root, batch_size=64,
                                   light_h=2, vis_point_batch=16, **kw)
    rs = np.random.RandomState(0)
    surf = (rs.rand(16, 3).astype(np.float32) - 0.5) * 0.5
    normal = rs.randn(16, 3).astype(np.float32)
    normal /= np.linalg.norm(normal, axis=1, keepdims=True)

    lv_ref = mk()._lvis_full(surf, normal)
    lv_occ = mk(occ_vis=True, occ_vis_res=32)._lvis_full(surf, normal)
    # untrained SDF, 16-sample sampler: occupancy guidance
    # re-discretizes sample placement, so individual soft-silhouette
    # rays can shift ~0.1 while the bulk is identical (the production
    # gate is validate_fastvis on a TRAINED scene)
    assert np.abs(lv_ref - lv_occ).max() < 0.15
    assert np.abs(lv_ref - lv_occ).mean() < 0.01

    # a reduced sampler + occupancy guidance stays near parity (thin
    # occluders, where guidance matters most, need the trained-scene
    # TPU validation — this is the plumbing check)
    lv_red_occ = mk(vis_sampler="8+8r1", occ_vis=True,
                    occ_vis_res=32)._lvis_full(surf, normal)
    assert np.abs(lv_ref - lv_red_occ).mean() < 0.02


def test_span_vis_occlusion_matches():
    """GeoExtractor(span_vis=True) — occlusion over the grid-tightened
    [near, far] span — matches the full-span occlusion on the
    geometric-init sphere SDF, and composes with a reduced sampler
    (plumbing check; the production gate is validate_fastvis on a
    trained scene)."""
    import tempfile

    from tests.test_gen_geo import _make_stage1_scene
    from vqnerf_release_tpu.data.neus_dataset import NerfSceneDataset
    from vqnerf_release_tpu.pipelines.gen_geo import GeoExtractor
    root = tempfile.mkdtemp()
    _make_stage1_scene(root, n_train=1, n_val=1)
    ds = NerfSceneDataset(root, is_train=True, near=0.5, far=3.5)
    cfg = NeuSConfig(n_samples=16, n_importance=16, up_sample_steps=2,
                     perturb=0.0)
    params = init_neus(0, cfg)
    mk = lambda **kw: GeoExtractor(params, cfg, ds, root, batch_size=64,
                                   light_h=2, vis_point_batch=16, **kw)
    rs = np.random.RandomState(1)
    surf = (rs.rand(16, 3).astype(np.float32) - 0.5) * 0.5
    normal = rs.randn(16, 3).astype(np.float32)
    normal /= np.linalg.norm(normal, axis=1, keepdims=True)

    lv_ref = mk()._lvis_full(surf, normal)
    lv_span = mk(span_vis=True, occ_vis_res=32)._lvis_full(surf, normal)
    # the span packs the SAME sample count into a shorter interval —
    # sample positions shift, so soft-silhouette rays move a little
    assert np.abs(lv_ref - lv_span).max() < 0.15
    assert np.abs(lv_ref - lv_span).mean() < 0.01

    # reduced sampler inside the tightened span stays near parity
    lv_red = mk(vis_sampler="8+8r1", span_vis=True,
                occ_vis_res=32)._lvis_full(surf, normal)
    assert np.abs(lv_ref - lv_red).mean() < 0.02

    # and the fast-vis two-pass path accepts span tightening
    lv_fast = mk(fast_vis=True, span_vis=True,
                 occ_vis_res=32)._lvis_fast(surf, normal)
    assert np.abs(lv_ref - lv_fast).mean() < 0.01
