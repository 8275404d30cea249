"""Native fastloader (ctypes) and ArUco calibration tool tests."""

import os
import subprocess

import numpy as np
import pytest

from vqnerf_release_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="libfastloader.so not built")


def _view(h=20, w=20, light_h=2, seed=0):
    from vqnerf_release_tpu.data.shape_dataset import ShapeView
    rs = np.random.RandomState(seed)
    alpha = np.ones((h, w, 1), np.float32)
    alpha[:3] = 0.0
    n = h * w
    return ShapeView(
        id="v", h=h, w=w,
        rayo=rs.rand(n, 3).astype(np.float32),
        rayd=rs.rand(n, 3).astype(np.float32),
        rgb=rs.rand(n, 3).astype(np.float32),
        alpha=alpha.reshape(n, 1),
        pred_alpha=alpha.reshape(n, 1).copy(),
        xyz=rs.rand(n, 3).astype(np.float32),
        normal=rs.rand(n, 3).astype(np.float32),
        lvis=rs.rand(n, 2 * light_h * light_h).astype(np.float32))


def test_select_pairs_contract():
    v = _view()
    coords = native.select_pairs(
        v.alpha.reshape(v.h, v.w), v.rgb.reshape(v.h, v.w, 3), 64,
        jitter_mode="random", seed=7)
    assert coords.shape == (128, 2)
    alpha = v.alpha.reshape(v.h, v.w)
    # all selected pixels (and jitters) are foreground
    assert (alpha[coords[:, 0], coords[:, 1]] > 0.9).all()
    # pairs are 8-neighbors
    d = np.abs(coords[0::2] - coords[1::2]).max(axis=1)
    assert (d == 1).all()
    # deterministic per seed
    coords2 = native.select_pairs(
        v.alpha.reshape(v.h, v.w), v.rgb.reshape(v.h, v.w, 3), 64,
        jitter_mode="random", seed=7)
    np.testing.assert_array_equal(coords, coords2)


def test_select_pairs_contrast_picks_max_neighbor():
    v = _view()
    rgb = v.rgb.reshape(v.h, v.w, 3)
    coords = native.select_pairs(
        v.alpha.reshape(v.h, v.w), rgb, 200, jitter_mode="contrast",
        seed=3)
    # the jitter must be the argmax-contrast neighbor of its pixel
    for i in range(0, 40, 2):
        y, x = coords[i]
        jy, jx = coords[i + 1]
        center = rgb[y, x]
        best = None
        best_d = -1
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                d = np.max(np.abs(rgb[y + dy, x + dx] - center))
                if d > best_d:
                    best_d, best = d, (y + dy, x + dx)
        assert (jy, jx) == best


def test_gather_rows_matches_numpy():
    rs = np.random.RandomState(0)
    src = rs.rand(400, 8).astype(np.float32)
    idx = rs.randint(0, 400, 100).astype(np.int64)
    out = native.gather_rows(src, idx)
    np.testing.assert_array_equal(out, src[idx])


def test_load_npy_f32(tmp_path):
    rs = np.random.RandomState(1)
    a32 = rs.rand(7, 5, 3).astype(np.float32)
    a64 = rs.rand(11, 2)
    p32, p64 = str(tmp_path / "a.npy"), str(tmp_path / "b.npy")
    np.save(p32, a32)
    np.save(p64, a64)
    np.testing.assert_array_equal(native.load_npy_f32(p32), a32)
    np.testing.assert_allclose(
        native.load_npy_f32(p64), a64.astype(np.float32), rtol=1e-6)


def test_outer_sample_native_contract():
    v = _view()
    batch = native.outer_sample_native(v, 64, seed=5)
    assert batch["rgb"].shape == (128, 3)
    assert batch["lvis"].shape == (128, 8)
    assert (batch["alpha"] > 0.9).all()
    # values actually come from the view buffers
    rgb_img = v.rgb.reshape(v.h, v.w, 3)
    coords = native.select_pairs(
        v.alpha.reshape(v.h, v.w), rgb_img, 64, seed=5)
    np.testing.assert_array_equal(
        batch["rgb"], rgb_img[coords[:, 0], coords[:, 1]])


ARUCO_BIN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "native", "calibration", "build", "aruco_calibrate")


@pytest.mark.skipif(not os.path.exists(ARUCO_BIN),
                    reason="aruco_calibrate not built")
def test_aruco_calibration_end_to_end(tmp_path):
    import cv2
    import cv2.aruco as aruco

    # Draw the 20x20 DICT_5X5_1000 board (8-unit pitch, 7-unit markers)
    dictionary = aruco.getPredefinedDictionary(aruco.DICT_5X5_1000)
    px = 8  # pixels per unit
    canvas = np.full((20 * 8 * px, 20 * 8 * px), 255, np.uint8)
    for x in range(20):
        for y in range(20):
            mid = x * 20 + y
            m = aruco.generateImageMarker(dictionary, mid, 7 * px) \
                if hasattr(aruco, "generateImageMarker") \
                else aruco.drawMarker(dictionary, mid, 7 * px)
            canvas[x * 8 * px : x * 8 * px + 7 * px,
                   y * 8 * px : y * 8 * px + 7 * px] = m

    work = str(tmp_path)
    os.makedirs(os.path.join(work, "images"))
    h_img, w_img = 480, 640
    K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
    n_images = 6
    rs = np.random.RandomState(0)
    board_size = canvas.shape[0]
    # strong, varied tilts — planar calibration is ill-conditioned from
    # fronto-parallel views (focal/depth ambiguity)
    tilts = [(0.5, 0.0), (-0.5, 0.1), (0.0, 0.5), (0.1, -0.5),
             (0.35, 0.35), (-0.3, -0.4)]
    for i in range(n_images):
        rvec = np.array([tilts[i][0], tilts[i][1], 0.1 * rs.randn()])
        tvec = np.array([0.05 * rs.randn(), 0.05 * rs.randn(),
                         2.0 + 0.15 * i])
        R, _ = cv2.Rodrigues(rvec)
        # board spans [-1, 1] in world units
        src_pts = np.array([[0, 0], [board_size, 0],
                            [board_size, board_size], [0, board_size]],
                           np.float32)
        world = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]],
                         np.float64)
        cam = (R @ world.T + tvec[:, None]).T
        proj = (K @ cam.T).T
        dst_pts = (proj[:, :2] / proj[:, 2:]).astype(np.float32)
        H_mat = cv2.getPerspectiveTransform(src_pts, dst_pts)
        warped = cv2.warpPerspective(
            canvas, H_mat, (w_img, h_img), flags=cv2.INTER_AREA,
            borderValue=255)
        # encode for the tool's green-inversion preprocessing:
        # G = 255 - board_gray so the tool recovers board_gray
        img = np.zeros((h_img, w_img, 3), np.uint8)
        img[..., 1] = 255 - warped
        cv2.imwrite(os.path.join(work, "images", "%03d.png" % i), img)

    out = subprocess.run(
        [ARUCO_BIN, work, str(n_images), "2.0"], capture_output=True,
        text=True, timeout=300)
    assert out.returncode == 0, out.stderr + out.stdout

    poses = np.load(os.path.join(work, "tmp", "poses.npy"))
    intr = np.load(os.path.join(work, "tmp", "intrinsic.npy"))
    assert poses.shape == (n_images, 2, 3)
    assert intr.shape == (3, 3)
    # focal length recovered within 5%
    assert abs(intr[0, 0] - 600) / 600 < 0.05
    assert abs(intr[1, 1] - 600) / 600 < 0.05
    # many markers detected per frame
    assert "markers" in out.stdout
    for i in range(n_images):
        assert os.path.exists(
            os.path.join(work, "tmp", "image_undistort", "%03d.png" % i))
