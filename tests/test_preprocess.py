"""Preprocessing: COLMAP binary model parsing + pose conversion, ArUco
camera conversion, real-capture dataset assembly, HTML writer, edit
client."""

import json
import os
import struct
from os.path import join

import numpy as np

from vqnerf_release_tpu.preprocess import colmap_model as cm
from vqnerf_release_tpu.preprocess.aruco_cameras import (convert_cameras,
                                                         rodrigues)


def _write_colmap_model(d, n_images=3):
    rs = np.random.RandomState(0)
    os.makedirs(d, exist_ok=True)
    # cameras.bin: one SIMPLE_PINHOLE camera
    with open(join(d, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 0, 640, 480))
        f.write(struct.pack("<3d", 600.0, 320.0, 240.0))
    # points3D.bin
    pts = rs.rand(20, 3) * 2 - 1
    with open(join(d, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(pts)))
        for i, p in enumerate(pts):
            f.write(struct.pack("<Q", i + 1))
            f.write(struct.pack("<3d", *p))
            f.write(struct.pack("<3B", 100, 110, 120))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<2i", 1, 0))
    # images.bin
    qs, ts = [], []
    with open(join(d, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_images))
        for i in range(n_images):
            q = rs.randn(4)
            q /= np.linalg.norm(q)
            t = np.array([0.1 * i, 0.0, 4.0])
            qs.append(q)
            ts.append(t)
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<4d", *q))
            f.write(struct.pack("<3d", *t))
            f.write(struct.pack("<i", 1))
            f.write(b"img%03d.png" % i + b"\x00")
            f.write(struct.pack("<Q", 2))
            f.write(struct.pack("<3d", 10.0, 12.0, 1.0))
            f.write(struct.pack("<3d", 50.0, 60.0, 2.0))
    return qs, ts, pts


def test_colmap_binary_roundtrip(tmp_path):
    d = str(tmp_path / "sparse")
    qs, ts, pts = _write_colmap_model(d)
    cams = cm.read_cameras_binary(join(d, "cameras.bin"))
    imgs = cm.read_images_binary(join(d, "images.bin"))
    p3d = cm.read_points3d_binary(join(d, "points3D.bin"))
    assert cams[1].model == "SIMPLE_PINHOLE"
    assert cams[1].width == 640
    np.testing.assert_allclose(cams[1].params, [600, 320, 240])
    assert len(imgs) == 3
    np.testing.assert_allclose(imgs[1].qvec, qs[0])
    np.testing.assert_allclose(imgs[1].tvec, ts[0])
    assert imgs[1].name == "img000.png"
    np.testing.assert_array_equal(imgs[1].point3d_ids, [1, 2])
    assert len(p3d) == 20
    np.testing.assert_allclose(p3d[1].xyz, pts[0])


def test_qvec2rotmat_orthonormal():
    q = np.array([0.9, 0.1, 0.2, -0.3])
    q /= np.linalg.norm(q)
    R = cm.qvec2rotmat(q)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-10)


def test_poses_bounds_and_neus_cameras(tmp_path):
    d = str(tmp_path / "sparse")
    _write_colmap_model(d)
    cams = cm.read_cameras_binary(join(d, "cameras.bin"))
    imgs = cm.read_images_binary(join(d, "images.bin"))
    p3d = cm.read_points3d_binary(join(d, "points3D.bin"))
    pb = cm.compute_poses_bounds(cams, imgs, p3d)
    assert pb.shape == (3, 17)
    assert (pb[:, 15] < pb[:, 16]).all()  # near < far

    npz_path = str(tmp_path / "cameras_sphere.npz")
    cam_dict = cm.neus_cameras_from_colmap(cams, imgs, p3d,
                                           out_npz=npz_path)
    assert "world_mat_0" in cam_dict and "scale_mat_0" in cam_dict
    loaded = np.load(npz_path)
    np.testing.assert_allclose(
        loaded["world_mat_1"], cam_dict["world_mat_1"])
    # world_mat decomposes back to K with focal 600
    from vqnerf_release_tpu.data.rays import decompose_projection
    intr, pose = decompose_projection(cam_dict["world_mat_0"][:3, :4])
    np.testing.assert_allclose(intr[0, 0], 600.0, rtol=1e-5)


def test_rodrigues_matches_cv2():
    import cv2
    rvec = np.array([0.3, -0.2, 0.5])
    R_ours = rodrigues(rvec)
    R_cv, _ = cv2.Rodrigues(rvec)
    np.testing.assert_allclose(R_ours, R_cv, atol=1e-12)


def test_aruco_convert_cameras(tmp_path):
    import cv2
    work = str(tmp_path)
    os.makedirs(join(work, "tmp", "image_undistort"))
    poses = np.zeros((2, 2, 3))
    poses[0, 0] = [0.1, 0.2, 0.3]
    poses[0, 1] = [1.0, 2.0, 3.0]
    np.save(join(work, "tmp", "poses.npy"), poses)
    np.save(join(work, "tmp", "intrinsic.npy"),
            np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]]))
    for i in range(2):
        cv2.imwrite(join(work, "tmp", "image_undistort", "%03d.png" % i),
                    np.zeros((48, 64, 3), np.uint8))
    out = convert_cameras(work)
    npz = np.load(join(out, "cameras_sphere.npz"))
    assert npz["world_mat_0"].shape == (4, 4)
    # world_mat = K @ [R|t]
    K = np.eye(4)
    K[:3, :3] = [[500, 0, 320], [0, 500, 240], [0, 0, 1]]
    P = np.eye(4)
    P[:3, :3] = rodrigues(poses[0, 0])
    P[:3, 3] = poses[0, 1]
    np.testing.assert_allclose(npz["world_mat_0"], (K @ P), rtol=1e-5)
    assert os.path.exists(join(out, "image", "000.png"))
    assert os.path.exists(join(out, "mask", "001.png"))


def test_make_real_dataset(tmp_path):
    import cv2
    from vqnerf_release_tpu.preprocess.data_gen import make_real_dataset
    rs = np.random.RandomState(0)
    paths = []
    for i in range(5):
        p = str(tmp_path / ("f%d.png" % i))
        cv2.imwrite(p, (rs.rand(20, 24, 3) * 255).astype(np.uint8))
        paths.append(p)
    c2ws = [np.eye(4) for _ in range(5)]
    out = str(tmp_path / "ds")
    counters = make_real_dataset(paths, c2ws, 0.7, out, val_every=3)
    assert counters["train"] + counters["val"] == 5
    assert counters["val"] == 1
    tj = json.load(open(join(out, "transforms_train.json")))
    assert len(tj["frames"]) == counters["train"]
    # loadable by the stage-1 dataset
    from vqnerf_release_tpu.data.neus_dataset import NerfSceneDataset
    ds = NerfSceneDataset(out, is_train=True, near=0.5, far=3.0)
    assert ds.n_images == counters["train"]


def test_html_writer(tmp_path):
    import cv2
    from vqnerf_release_tpu.utils.html import compile_batch_vis
    dirs = []
    for i in range(2):
        d = str(tmp_path / ("batch%09d" % i))
        os.makedirs(d)
        cv2.imwrite(join(d, "pred_rgb.png"),
                    np.zeros((8, 8, 3), np.uint8))
        with open(join(d, "metadata.json"), "w") as f:
            json.dump({"id": "val_%03d" % i, "psnr": 30.0 + i}, f)
        dirs.append(d)
    out = compile_batch_vis(dirs, str(tmp_path / "vali.html"))
    html = open(out).read()
    assert "pred_rgb.png" in html
    assert "val_000" in html


def test_vali_index_embeds_log_and_elbow(tmp_path):
    """write_vali_index (r5, VERDICT r4 #8): the vis_vali/index.html
    rollup embeds train_log.jsonl scalars, per-epoch PSNR, the vq_num
    elbow thumbnail, and links to per-epoch pages that inline loss.json
    and the vq_nfr per-threshold batch dirs."""
    import cv2
    from vqnerf_release_tpu.utils.html import write_vali_index
    outdir = str(tmp_path / "run")
    e1 = join(outdir, "vis_vali", "epoch%09d" % 30)
    # vq-style layout: per-threshold subdir + elbow + loss jsons
    d = join(e1, "main_5", "batch%09d" % 0)
    os.makedirs(d)
    cv2.imwrite(join(d, "pred_rgb.png"), np.zeros((8, 8, 3), np.uint8))
    json.dump({"id": "val_000", "psnr": 31.5},
              open(join(d, "metadata.json"), "w"))
    cv2.imwrite(join(e1, "vq_num.png"), np.zeros((8, 8, 3), np.uint8))
    json.dump({"rgb": 0.01, "vq": 0.002},
              open(join(e1, "loss.json"), "w"))
    with open(join(outdir, "train_log.jsonl"), "w") as f:
        f.write(json.dumps({"epoch": 30, "loss": 0.0123,
                            "wall_s": 4.2, "skipped_steps": 0}) + "\n")

    index = write_vali_index(outdir)
    assert index == join(outdir, "vis_vali", "index.html")
    html = open(index).read()
    assert "loss=0.0123" in html and "skipped_steps=0" in html
    assert "31.50 dB" in html
    assert "vq_num.png" in html  # elbow thumbnail
    epoch_page = join(e1, "index.html")
    assert os.path.exists(epoch_page)
    ehtml = open(epoch_page).read()
    assert "main_5" in ehtml and "loss.json" in ehtml
    assert "pred_rgb.png" in ehtml

    # empty tree -> no page, no crash
    assert write_vali_index(str(tmp_path / "none")) is None


def test_edit_client_protocol(tmp_path):
    from vqnerf_release_tpu.pipelines.edit_client import (MATERIAL_DB,
                                                          auto_select_mask,
                                                          submit_edit)
    embed = np.zeros((6, 6), np.int32)
    embed[2:4, 2:4] = 3
    mask = auto_select_mask(embed, 3)
    assert mask.sum() == 4
    assert len(MATERIAL_DB) == 19

    root = str(tmp_path)
    submit_edit(root, "gold", [mask], env="city")
    assert json.load(open(join(root, "status", "status.json")))[
        "status"] == "uploaded"
    dst = json.load(open(join(root, "edited", "dst.json")))
    assert dst["spec"][0] == 1.0
    illum = json.load(open(join(root, "edited", "illum.json")))
    assert illum["env"] == "city"
    assert os.path.exists(join(root, "edited", "batch000000000.npy"))
