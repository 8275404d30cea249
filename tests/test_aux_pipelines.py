"""Edit server, video rendering, material export, main re-selection,
meanshift baseline, sphere renderer, MERL loader."""

import json
import os
import struct
from os.path import join

import numpy as np
import pytest

from vqnerf_release_tpu.models import decomp_common as dc
from vqnerf_release_tpu.models.nfr_unit import init_nfr_unit
from vqnerf_release_tpu.models.ref_nfr import init_ref_nfr
from vqnerf_release_tpu.models.vq_nfr import init_vq_nfr

from tests.test_data_layer import _make_synth_scene

CFG = dc.DecompConfig(light_h=2, num_embed=4, num_drop=2, z_dim=16,
                      mlp_width=8, imh=16, thres_str="0.1;0.2")


def _models(cfg=CFG, seed=0):
    rs = np.random.RandomState(seed)
    nfr = init_nfr_unit(seed, cfg)
    vq, _ = init_vq_nfr(
        seed, cfg, nfr, rs.rand(cfg.num_embed, cfg.z_dim).astype(np.float32))
    light = np.ones((*cfg.light_res, 3), np.float32) * 0.5
    ref = init_ref_nfr(seed, cfg, vq, light)
    return nfr, vq, ref


def _views(tmp_path, with_ref=True):
    from vqnerf_release_tpu.data.shape_dataset import ShapeDataset
    data_root, surf_root = _make_synth_scene(
        str(tmp_path), light_h=CFG.light_h)
    ds = ShapeDataset(data_root, surf_root, imh=16, mode="test",
                      with_ref=with_ref)
    return [ds.load_view(f) for f in ds.files]


def test_edit_server_round(tmp_path):
    from vqnerf_release_tpu.pipelines.edit import edit_server_loop
    nfr, vq, ref = _models()
    views = _views(tmp_path / "scene")

    root = str(tmp_path / "editroot")
    os.makedirs(join(root, "status"))
    os.makedirs(join(root, "edited"))
    with open(join(root, "edited", "dst.json"), "w") as f:
        json.dump({"diff": [1.0, 0.0, 0.0], "spec": [-1.0, 0, 0],
                   "rough": [-1.0]}, f)
    with open(join(root, "edited", "illum.json"), "w") as f:
        json.dump({"env": "original"}, f)
    for i, v in enumerate(views):
        mask = np.zeros((v.h, v.w, 3), bool)
        mask[: v.h // 2] = True
        np.save(join(root, "edited", "batch%09d.npy" % i), mask)
    with open(join(root, "status", "status.json"), "w") as f:
        json.dump({"status": "uploaded"}, f)

    rounds = edit_server_loop(ref, vq, CFG, views, root,
                              poll_interval=0.01, max_rounds=1)
    assert rounds == 1
    with open(join(root, "status", "status.json")) as f:
        assert json.load(f)["status"] == "finished"
    for i in range(len(views)):
        d = join(root, "pd_edited", "batch%09d" % i)
        assert os.path.exists(join(d, "pred_rgb.png"))
        assert os.path.exists(join(d, "pred_albedo.png"))


def test_video_dataset_and_render(tmp_path):
    import cv2

    from vqnerf_release_tpu.data.shape_dataset import VideoDataset
    from vqnerf_release_tpu.pipelines.gen_video import (compose_video,
                                                        render_video)
    # build a video trajectory dir
    h = w = 16
    rs = np.random.RandomState(0)
    vroot = str(tmp_path / "video")
    c2w = np.eye(4)
    c2w[:3, 3] = [0, 0, 3.0]
    for i in range(3):
        d = join(vroot, "test_%03d" % i)
        os.makedirs(d)
        with open(join(d, "metadata.json"), "w") as f:
            json.dump({"imh": h, "imw": w, "cam_angle_x": 0.7,
                       "cam_transform_mat": ",".join(
                           str(x) for x in c2w.reshape(-1))}, f)
        np.save(join(d, "xyz.npy"),
                rs.rand(h, w, 3).astype(np.float32) - 0.5)
        np.save(join(d, "normal.npy"), rs.randn(h, w, 3).astype(np.float32))
        cv2.imwrite(join(d, "alpha.png"),
                    np.full((h, w), 255, np.uint8))
        cv2.imwrite(join(d, "rgb.png"),
                    (rs.rand(h, w, 3) * 255).astype(np.uint8))
        np.save(join(d, "lvis.npy"),
                rs.rand(h, w, CFG.n_lights).astype(np.float32))

    ds = VideoDataset(vroot, data_type="nerf", imh=h)
    assert len(ds.files) == 3
    views = [ds.load_view(f) for f in ds.files]
    assert views[0].ref is not None

    nfr, vq, ref = _models()
    outroot = str(tmp_path / "vis_video")
    dirs = render_video("gen_comps", CFG, views, outroot,
                        ref_params=ref, vq_params=vq, n_vq=3)
    assert len(dirs) == 3
    assert os.path.exists(join(dirs[0], "pred_rgb.png"))
    assert os.path.exists(join(dirs[0], "embed_map.png"))

    n = compose_video(dirs, "pred_rgb.png",
                      str(tmp_path / "out.avi"), fps=4)
    assert n == 3
    assert os.path.getsize(tmp_path / "out.avi") > 0

    # vq_dcomps mode
    dirs2 = render_video("vq_dcomps", CFG, views,
                         str(tmp_path / "decomps"), vq_params=vq, n_vq=3)
    assert os.path.exists(join(dirs2[0], "embed_map.png"))


def test_gen_z_export(tmp_path):
    from vqnerf_release_tpu.pipelines.gen_z import export_materials
    nfr, _, _ = _models()
    views = _views(tmp_path, with_ref=False)
    dirs = export_materials(nfr, CFG, views, str(tmp_path / "comps"),
                            gen_z=True)
    for d in dirs:
        assert os.path.exists(join(d, "albedo.npy"))
        assert os.path.exists(join(d, "rough.png"))
        z = np.load(join(d, "z_bias.npy"))
        assert z.shape == (16, 16, CFG.z_dim)


def test_gen_main_reselect(tmp_path):
    from vqnerf_release_tpu.pipelines.gen_main import reselect_main
    ep = str(tmp_path / "epoch000000150")
    os.makedirs(join(ep, "main_2"))
    os.makedirs(join(ep, "3"))
    os.makedirs(join(ep, "4"))
    with open(join(ep, "vq_test_loss.json"), "w") as f:
        json.dump({"vqrgb": [1.0, 0.5, 0.49],
                   "chromaticity": [1.0, 0.5, 0.49]}, f)
    # elbow at i=1 => k = 4 - 2 + 1 = 3
    k = reselect_main(ep, num_embed=4, num_drop=2, best_thres=0.1)
    assert k == 3
    assert os.path.isdir(join(ep, "main_3"))
    assert os.path.isdir(join(ep, "2"))
    assert not os.path.isdir(join(ep, "main_2"))


def test_meanshift_baseline(tmp_path):
    from vqnerf_release_tpu.eval.meanshift import meanshift_segmentation
    rs = np.random.RandomState(0)
    h = w = 12
    dirs = []
    for i in range(2):
        d = str(tmp_path / ("val_%03d" % i))
        os.makedirs(d)
        # two clearly separated materials
        albedo = np.zeros((h, w, 3), np.float32)
        albedo[:, : w // 2] = [0.9, 0.1, 0.1]
        albedo[:, w // 2 :] = [0.1, 0.1, 0.9]
        np.save(join(d, "albedo.npy"), albedo)
        np.save(join(d, "spec.npy"), np.zeros((h, w, 3), np.float32))
        np.save(join(d, "rough.npy"),
                np.full((h, w, 1), 0.5, np.float32))
        dirs.append(d)
    out_dirs = [str(tmp_path / ("out_%d" % i)) for i in range(2)]
    n_clusters, outs = meanshift_segmentation(dirs, out_dirs,
                                              bandwidth=0.3)
    assert n_clusters >= 2
    lab = np.load(join(outs[0], "labels.npy"))
    assert lab[0, 0] != lab[0, -1]


def test_sphere_render():
    from vqnerf_release_tpu.ops.sphere_render import (render_brdf_sphere,
                                                      sphere_normals)
    normals, mask = sphere_normals(32)
    assert mask[16, 16]
    assert not mask[0, 0]
    np.testing.assert_allclose(
        np.linalg.norm(normals, axis=1), 1.0, atol=1e-5)
    env = np.ones((4, 8, 3), np.float32)
    img = render_brdf_sphere([0.5, 0.2, 0.2], 0.4, [0.1, 0.1, 0.1], env,
                             imh=32, light_h=4)
    assert img.shape == (32, 32, 3)
    # center lit, corner black
    assert img[16, 16].sum() > 0
    assert img[0, 0].sum() == 0


def test_merl_roundtrip(tmp_path):
    from vqnerf_release_tpu.data.merl import (MERL_DIMS, MERL_SCALES,
                                              merl_lookup, read_merl,
                                              rusink_angles)
    rs = np.random.RandomState(0)
    raw = rs.rand(3, *MERL_DIMS)
    p = str(tmp_path / "brdf.binary")
    with open(p, "wb") as f:
        f.write(struct.pack("3i", *MERL_DIMS))
        f.write(raw.astype(np.float64).tobytes())
    cube = read_merl(p)
    np.testing.assert_allclose(
        cube, raw * MERL_SCALES[:, None, None, None], rtol=1e-12)

    # rusink angles: mirror reflection about n has theta_d == theta_h
    n = np.array([[0.0, 0.0, 1.0]])
    wi = np.array([[1.0, 0.0, 1.0]]) / np.sqrt(2)
    wo = np.array([[-1.0, 0.0, 1.0]]) / np.sqrt(2)
    th, td, pd = rusink_angles(wi, wo, n)
    np.testing.assert_allclose(th, 0.0, atol=1e-6)  # h == n
    np.testing.assert_allclose(td, np.pi / 4, atol=1e-6)
    vals = merl_lookup(cube, th, td, pd)
    assert vals.shape == (1, 3)


def test_make_frame(tmp_path):
    import cv2
    from vqnerf_release_tpu.utils.vis import make_frame
    d = str(tmp_path / "batch000000000")
    os.makedirs(d)
    rs = np.random.RandomState(0)
    for name in ("pred_rgb", "pred_albedo", "pred_normal"):
        cv2.imwrite(join(d, name + ".png"),
                    (rs.rand(12, 12, 3) * 255).astype(np.uint8))
    light = (rs.rand(4, 8, 3) * 255).astype(np.uint8)
    frame = make_frame(d, (("normal", "nn"), ("albedo", "rgb")),
                       rgb_embed_light=light)
    assert frame is not None
    assert frame.shape[0] > 24 and frame.shape[1] > 24
    assert make_frame(str(tmp_path / "empty"),
                      (("rgb",),)) is None


def test_profiling_trace_and_steptimer(tmp_path):
    import jax
    import jax.numpy as jnp

    from vqnerf_release_tpu.utils.profiling import StepTimer, trace

    logdir = str(tmp_path / "trace")
    f = jax.jit(lambda x: jnp.sum(x * x))
    with trace(logdir):
        _ = float(f(jnp.arange(8.0)))
    # the profiler writes a plugins/profile/<ts>/ tree
    found = []
    for root, _dirs, files in os.walk(logdir):
        found += files
    assert found, "trace produced no files"

    st = StepTimer(path=str(tmp_path / "steps.json"))
    for i in range(5):
        st.start()
        st.stop(sync=f(jnp.arange(8.0) + i))
    s = st.summary()
    assert s["steps"] == 5 and s["best_ms"] > 0
    assert os.path.exists(tmp_path / "steps.json")

    with trace(None):  # no-op path
        pass
