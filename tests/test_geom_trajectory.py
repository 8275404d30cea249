import json
import os

import numpy as np

from vqnerf_release_tpu.ops.geom import (interpolate_pose, slerp_rotations,
                                         world2local)


def test_world2local_frames():
    rs = np.random.RandomState(0)
    n = rs.randn(16, 3)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    frames = world2local(n)
    assert frames.shape == (16, 3, 3)
    for i in range(16):
        F = frames[i]
        # the reference construction nudges the up axis by eps=1e-6
        # (geom.py:71), so frames are orthonormal only to ~eps
        np.testing.assert_allclose(F @ F.T, np.eye(3), atol=5e-6)
        np.testing.assert_allclose(F[2], n[i], atol=1e-6)
    # degenerate: normal colinear with +Z. The reference keeps this finite
    # via the eps nudge but the tangent collapses toward zero under
    # tf.l2_normalize's epsilon floor (geom.py:71-78 + math.py:63) — we
    # reproduce that exactly rather than inventing a fallback.
    f = world2local(np.array([[0.0, 0.0, 1.0]]))
    assert np.isfinite(f).all()
    np.testing.assert_allclose(f[0, 2], [0.0, 0.0, 1.0], atol=1e-6)


def test_slerp_endpoints_and_midpoint():
    from scipy.spatial.transform import Rotation
    R0 = np.eye(3)
    R1 = Rotation.from_euler("z", 90, degrees=True).as_matrix()
    out = slerp_rotations(R0, R1, [0.0, 0.5, 1.0])
    np.testing.assert_allclose(out[0], R0, atol=1e-12)
    np.testing.assert_allclose(out[2], R1, atol=1e-12)
    mid = Rotation.from_euler("z", 45, degrees=True).as_matrix()
    np.testing.assert_allclose(out[1], mid, atol=1e-12)

    p0, p1 = np.eye(4), np.eye(4)
    p1[:3, 3] = [2, 0, 0]
    p1[:3, :3] = R1
    mid_pose = interpolate_pose(p0, p1, 0.5)
    np.testing.assert_allclose(mid_pose[:3, 3], [1, 0, 0], atol=1e-12)


def test_trajectory_dataset_and_extraction(tmp_path):
    from vqnerf_release_tpu.data.neus_dataset import TrajectoryDataset
    from vqnerf_release_tpu.models.neus import NeuSConfig, init_neus
    from vqnerf_release_tpu.pipelines.gen_geo import GeoExtractor
    from vqnerf_release_tpu.pipelines.gen_video import extract_trajectory

    from tests.test_gen_geo import _lookat_c2w

    frames = []
    for i in range(2):
        ang = 0.5 * i
        c2w = _lookat_c2w([2 * np.sin(ang), 0.2, 2 * np.cos(ang)])
        frames.append({"transform_matrix": c2w.tolist()})
    with open(tmp_path / "transforms_test.json", "w") as f:
        json.dump({"camera_angle_x": 0.8, "frames": frames}, f)

    ds = TrajectoryDataset(str(tmp_path), imh=10, imw=10, near=0.5,
                           far=3.5)
    assert ds.n_images == 2
    rayo, rayd = ds.gen_rays_at(0)
    assert rayo.shape == (10, 10, 3)
    np.testing.assert_allclose(
        np.linalg.norm(rayd, axis=-1), 1.0, atol=1e-5)

    cfg = NeuSConfig(n_samples=8, n_importance=8, up_sample_steps=2,
                     perturb=0.0)
    params = init_neus(0, cfg)
    ex = GeoExtractor(params, cfg, ds, str(tmp_path / "video"),
                      batch_size=64, light_h=2, vis_point_batch=16)
    dirs = extract_trajectory(ex, ds, str(tmp_path / "video"),
                              no_vis=True)
    assert len(dirs) == 2
    for d in dirs:
        assert os.path.exists(os.path.join(d, "xyz.npy"))
        assert os.path.exists(os.path.join(d, "metadata.json"))
        meta = json.load(open(os.path.join(d, "metadata.json")))
        assert "cam_transform_mat" in meta


def test_dtu_trajectory_extraction_and_video_rays(tmp_path):
    """DTU-convention video path (dtuvideo.py / dtu_video.py parity):
    test.json poses + shared intrinsic -> DtuTrajectoryDataset ->
    extract_trajectory writes the reference metadata format ->
    VideoDataset regenerates the SAME rays from that metadata."""
    import json
    import os

    import numpy as np

    from tests.test_dtu_pipeline import _make_dtu_scene
    from vqnerf_release_tpu.data.neus_dataset import (DtuSceneDataset,
                                                      DtuTrajectoryDataset)
    from vqnerf_release_tpu.data.shape_dataset import VideoDataset
    from vqnerf_release_tpu.models.neus import NeuSConfig, init_neus
    from vqnerf_release_tpu.pipelines.gen_geo import GeoExtractor
    from vqnerf_release_tpu.pipelines.gen_video import extract_trajectory

    root = str(tmp_path / "scene")
    os.makedirs(root)
    _make_dtu_scene(root)
    train_ds = DtuSceneDataset(root, is_train=True)

    # trajectory: two c2w poses + the intrinsic (original resolution)
    K = np.eye(4)
    K[:3, :3] = np.array([[14.0, 0, 6.0], [0, 14.0, 6.0], [0, 0, 1.0]])
    poses = []
    for ang in (0.3, 0.7):
        eye = np.array([2.0 * np.sin(ang), 0.4, 2.0 * np.cos(ang)])
        fwd = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        true_up = np.cross(fwd, right)
        c2w = np.eye(4)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = (
            right, true_up, fwd, eye)
        poses.append(c2w.tolist())
    with open(os.path.join(root, "test.json"), "w") as f:
        json.dump({"poses": poses, "intrinsic": K.tolist()}, f)

    traj = DtuTrajectoryDataset(root, train_ds)
    assert traj.n_images == 2

    cfg = NeuSConfig(n_samples=8, n_importance=8, up_sample_steps=1,
                     perturb=0.0)
    params = init_neus(0, cfg)
    out_root = str(tmp_path / "video")
    ex = GeoExtractor(params, cfg, traj, out_root, batch_size=64,
                      light_h=2, use_white_bkgd=False)
    dirs = extract_trajectory(ex, traj, out_root, no_vis=True)
    assert len(dirs) == 2
    meta = json.load(open(os.path.join(out_root, "test_000",
                                       "metadata.json")))
    assert "intrinsic" in meta  # dtu_video.py:159-162 format

    vds = VideoDataset(out_root, data_type="dtu", imh=traj.H,
                       white_bg=False, with_ref=True)
    assert len(vds.files) == 2
    view = vds.load_view(vds.files[0])
    rayo_direct, rayd_direct = traj.gen_rays_at(0)
    np.testing.assert_allclose(
        view.rayo.reshape(traj.H, traj.W, 3), rayo_direct, atol=1e-5)
    np.testing.assert_allclose(
        view.rayd.reshape(traj.H, traj.W, 3), rayd_direct, atol=1e-5)
