"""Data-layer tests: ray conventions vs oracles, IO round-trips, and a
synthetic on-disk dataset in the reference's exact layout."""

import json
import os

import numpy as np
import pytest

from vqnerf_release_tpu.data import io as vio
from vqnerf_release_tpu.data import rays as vrays
from vqnerf_release_tpu.data.sampler import build_vq_eval_set, outer_sample
from vqnerf_release_tpu.data.shape_dataset import ShapeDataset


def test_nerf_rays_oracle():
    """Directions ((x-cx)/f, -(y-cy)/f, -1) @ R^T (shape_unit.py:286-291)."""
    rs = np.random.RandomState(0)
    # a c2w with a proper rotation
    q = np.linalg.qr(rs.randn(3, 3))[0]
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    c2w = np.eye(4)
    c2w[:3, :3] = q
    c2w[:3, 3] = [1.0, -2.0, 3.0]
    h, w, fov = 8, 12, 0.7

    rayo, rayd = vrays.nerf_rays(c2w, fov, h, w)
    assert rayo.shape == (h, w, 3) and rayd.shape == (h, w, 3)
    np.testing.assert_allclose(rayo[3, 4], [1.0, -2.0, 3.0], atol=1e-6)

    fl = 0.5 * w / np.tan(0.5 * fov)
    x, y = 7, 2
    local = np.array([(x - 0.5 * w) / fl, -(y - 0.5 * h) / fl, -1.0])
    expected = q @ local
    np.testing.assert_allclose(rayd[y, x], expected, atol=1e-5)

    # normalized variant (stage 1, nerfset.py:105)
    _, rayd_n = vrays.nerf_rays(c2w, fov, h, w, normalize=True)
    np.testing.assert_allclose(
        np.linalg.norm(rayd_n, axis=-1), 1.0, atol=1e-5)


def test_decompose_projection_roundtrip():
    """K [R|t] recomposition recovers P up to scale."""
    rs = np.random.RandomState(1)
    K = np.array([[500.0, 0, 320], [0, 510.0, 240], [0, 0, 1]])
    q = np.linalg.qr(rs.randn(3, 3))[0]
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    R = q
    c = np.array([0.5, -1.0, 2.0])
    t = -R @ c
    P = K @ np.concatenate([R, t[:, None]], axis=1)

    intr, pose = vrays.decompose_projection(P)
    np.testing.assert_allclose(intr[:3, :3], K, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(pose[:3, :3], R.T, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(pose[:3, 3], c, rtol=1e-6, atol=1e-8)


def test_dtu_rays_geometry():
    """DTU rays originate at the camera center and pass through pixels."""
    rs = np.random.RandomState(2)
    K = np.array([[400.0, 0, 64], [0, 400.0, 48], [0, 0, 1]])
    q = np.linalg.qr(rs.randn(3, 3))[0]
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    c = np.array([1.0, 2.0, -3.0])
    t = -q @ c
    P = np.eye(4)
    P[:3, :4] = K @ np.concatenate([q, t[:, None]], axis=1)
    world_mat, scale_mat = P, np.eye(4)

    h_meta, w_meta = 96, 128
    rayo, rayd = vrays.dtu_rays(world_mat, scale_mat, h_meta, w_meta, h_meta)
    np.testing.assert_allclose(rayo[0, 0], c, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(rayd, axis=-1), 1.0, atol=1e-5)
    # Pixel (x, y): camera-space dir ~ K^-1 [x, y, 1]
    x, y = 100, 30
    d_cam = np.linalg.inv(K) @ np.array([x, y, 1.0])
    d_cam /= np.linalg.norm(d_cam)
    d_world = q.T @ d_cam
    np.testing.assert_allclose(rayd[y, x], d_world, atol=1e-5)


def test_near_far_sphere():
    rays_o = np.array([[0.0, 0.0, 3.0]])
    rays_d = np.array([[0.0, 0.0, -1.0]])
    near, far = vrays.near_far_sphere(rays_o, rays_d)
    np.testing.assert_allclose(near, [[2.0]])
    np.testing.assert_allclose(far, [[4.0]])


def test_img_io_roundtrip(tmp_path):
    rs = np.random.RandomState(3)
    img = rs.rand(8, 10, 3).astype(np.float32)
    p = tmp_path / "x.png"
    written = vio.write_img(img, p)
    back = vio.load_img_f32(p)
    np.testing.assert_allclose(back, written.astype(np.float32) / 255.0,
                               atol=1e-6)
    np.testing.assert_allclose(back, img, atol=1.0 / 255.0)


def test_read_rgba16(tmp_path):
    import cv2
    rgba16 = (np.random.RandomState(4).rand(6, 6, 4) * 65535).astype(
        np.uint16)
    p = str(tmp_path / "rgba.png")
    cv2.imwrite(p, rgba16[..., [2, 1, 0, 3]])  # store as BGRA
    out = vio.read_rgba16(p)
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, (rgba16 // 256).astype(np.uint8))


def _make_synth_scene(root, n_train=3, n_val=2, h=16, w=16, light_h=2,
                      with_ref=True):
    """Write a synthetic scene in the reference layout (SURVEY.md §0):
    data_root/{train,val}_NNN/{metadata.json, rgba.png} and
    surf_root/<view>/{xyz,normal,alpha,lvis,rgb}."""
    import cv2
    rs = np.random.RandomState(0)
    data_root = os.path.join(root, "scene")
    surf_root = os.path.join(root, "surf")
    for mode, n in (("train", n_train), ("val", n_val)):
        for i in range(n):
            vid = "%s_%03d" % (mode, i)
            vdir = os.path.join(data_root, vid)
            sdir = os.path.join(surf_root, vid)
            os.makedirs(vdir, exist_ok=True)
            os.makedirs(sdir, exist_ok=True)
            c2w = np.eye(4)
            c2w[:3, 3] = [0, 0, 3.0 + 0.1 * i]
            meta = {
                "imh": h, "imw": w, "cam_angle_x": 0.7,
                "cam_transform_mat": ",".join(
                    str(x) for x in c2w.reshape(-1)),
            }
            with open(os.path.join(vdir, "metadata.json"), "w") as f:
                json.dump(meta, f)
            rgba = (rs.rand(h, w, 4) * 255).astype(np.uint8)
            rgba[..., 3] = 255
            rgba[:2, :, 3] = 0  # some background
            cv2.imwrite(os.path.join(vdir, "rgba.png"),
                        rgba[..., [2, 1, 0, 3]])
            np.save(os.path.join(sdir, "xyz.npy"),
                    rs.rand(h, w, 3).astype(np.float32) - 0.5)
            np.save(os.path.join(sdir, "normal.npy"),
                    rs.randn(h, w, 3).astype(np.float32))
            alpha = (rgba[..., 3:].repeat(3, axis=2))
            cv2.imwrite(os.path.join(sdir, "alpha.png"), alpha)
            np.save(os.path.join(sdir, "lvis.npy"),
                    rs.rand(h, w, light_h * 2 * light_h).astype(np.float32))
            if with_ref:
                cv2.imwrite(os.path.join(sdir, "rgb.png"),
                            (rs.rand(h, w, 3) * 255).astype(np.uint8))
    return data_root, surf_root


def test_shape_dataset_and_sampler(tmp_path):
    data_root, surf_root = _make_synth_scene(str(tmp_path))
    ds = ShapeDataset(data_root, surf_root, data_type="nerf", imh=16,
                      mode="train", with_ref=True)
    assert len(ds) == 3
    view = ds.load_view(ds.files[0])
    n = 16 * 16
    assert view.rayo.shape == (n, 3)
    assert view.lvis.shape == (n, 8)
    assert view.ref.shape == (n, 3)
    # normals unit, no NaN anywhere
    np.testing.assert_allclose(
        np.linalg.norm(view.normal, axis=1), 1.0, atol=1e-5)
    for arr in (view.rgb, view.xyz, view.alpha):
        assert np.isfinite(arr).all()
    # background rows exist (first two image rows have alpha 0)
    assert (view.alpha == 0).any() and (view.alpha > 0).any()

    rng = np.random.RandomState(0)
    batch = outer_sample(view, 64, rng, jitter_mode="random")
    assert batch["rgb"].shape == (128, 3)
    # all sampled rays are foreground, pairs are 8-neighbors
    assert (batch["alpha"] > 0.9).all()
    xyz_img = view.xyz.reshape(16, 16, 3)
    batch_c = outer_sample(view, 64, rng, jitter_mode="contrast")
    assert batch_c["rgb"].shape == (128, 3)

    vq_set = build_vq_eval_set(
        [ds.load_view(f) for f in ds.files], per_view_n=50, n_rays=64,
        rng=np.random.RandomState(1))
    assert vq_set["rgb"].shape == (150, 3)
    assert (vq_set["alpha"] > 0).all()


def test_shape_dataset_val_and_test_modes(tmp_path):
    data_root, surf_root = _make_synth_scene(str(tmp_path))
    ds_val = ShapeDataset(data_root, surf_root, imh=16, mode="vali")
    assert len(ds_val) == 2
    v = ds_val.load_view(ds_val.files[0])
    assert v.id.startswith("val_")
    # test mode: gt alpha := pred alpha (shape_unit.py:202)
    ds_test = ShapeDataset(data_root, surf_root, imh=16, mode="test")
    t = ds_test.load_view(ds_test.files[0])
    np.testing.assert_allclose(t.alpha, t.pred_alpha)


def test_ndc_rays_properties():
    # rays through the image center stay at the NDC origin axis; all
    # warped rays have z-components mapping [near, inf) -> [-1, 1)
    h, w, focal = 8, 8, 10.0
    rays_o = np.tile([[0.0, 0.0, 0.0]], (4, 1))
    rays_d = np.array([
        [0.0, 0.0, -1.0],
        [0.1, 0.0, -1.0],
        [0.0, 0.1, -1.0],
        [0.05, -0.05, -1.0]])
    o_ndc, d_ndc = vrays.ndc_rays(h, w, focal, 1.0, rays_o, rays_d)
    # center ray: origin x/y = 0
    np.testing.assert_allclose(o_ndc[0, :2], 0.0, atol=1e-6)
    # at t=0 (near plane) o2 = -1; at t->inf o2 + d2 -> 1
    np.testing.assert_allclose(o_ndc[:, 2], -1.0, atol=1e-6)
    np.testing.assert_allclose(o_ndc[:, 2] + d_ndc[:, 2], 1.0, atol=1e-6)


def test_nerf_rays_dataset(tmp_path):
    from vqnerf_release_tpu.data.nerf_rays_dataset import NerfRaysDataset
    data_root, _ = _make_synth_scene(str(tmp_path))
    ds = NerfRaysDataset(data_root, mode="train", imh=16)
    assert len(ds) == 3
    v = ds.load_view(ds.files[0])
    assert v["rayo"].shape == (256, 3)
    assert v["rgb"].shape == (256, 3)
    assert np.isfinite(v["rayd"]).all()
