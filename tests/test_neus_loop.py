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
