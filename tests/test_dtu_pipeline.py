"""DTU-convention end-to-end slice: synthetic scene with projection
matrices -> DtuSceneDataset -> brief NeuS training -> extraction (no lvis)
-> decomposition with data_type='dtu' (learned-gamma path)."""

import json
import os
from os.path import join

import numpy as np
import pytest

from vqnerf_release_tpu.data.neus_dataset import DtuSceneDataset
from vqnerf_release_tpu.data.shape_dataset import ShapeDataset
from vqnerf_release_tpu.models import decomp_common as dc
from vqnerf_release_tpu.models.neus import NeuSConfig
from vqnerf_release_tpu.pipelines.gen_geo import GeoExtractor
from vqnerf_release_tpu.train.loop import train_nfr_unit, train_vq_nfr
from vqnerf_release_tpu.train.neus_loop import NeuSRunner
from vqnerf_release_tpu.train.neus_trainer import NeuSTrainConfig

H = W = 12


def _make_dtu_scene(root, n_train=2, n_val=1):
    import cv2
    rs = np.random.RandomState(0)
    K = np.array([[14.0, 0, W / 2], [0, 14.0, H / 2], [0, 0, 1.0]])
    for mode, n in (("train", n_train), ("val", n_val)):
        world_mats, scale_mats = [], []
        for i in range(n):
            ang = 2 * np.pi * i / max(n, 1) + (0.4 if mode == "val" else 0)
            eye = np.array(
                [2.0 * np.sin(ang), 0.4, 2.0 * np.cos(ang)])
            fwd = -eye / np.linalg.norm(eye)
            up = np.array([0.0, 1.0, 0.0])
            right = np.cross(fwd, up)
            right /= np.linalg.norm(right)
            true_up = np.cross(fwd, right)
            # w2c rows; camera z forward = +fwd (DTU looks down +z)
            R = np.stack([right, true_up, fwd])
            t = -R @ eye
            P = np.eye(4)
            P[:3, :4] = K @ np.concatenate([R, t[:, None]], axis=1)
            world_mats.append(P.tolist())
            scale_mats.append(np.eye(4).tolist())

            d = join(root, "%s_%03d" % (mode, i))
            os.makedirs(d, exist_ok=True)
            rgba = (rs.rand(H, W, 4) * 65535).astype(np.uint16)
            rgba[..., 3] = 65535
            cv2.imwrite(join(d, "rgba.png"), rgba[..., [2, 1, 0, 3]])
            # stage-2 metadata (shape_unit dtu branch wants world/scale)
            with open(join(d, "metadata.json"), "w") as f:
                json.dump({"imh": H, "imw": W,
                           "world_mat": P.tolist(),
                           "scale_mat": np.eye(4).tolist()}, f)
        with open(join(root, "train.json" if mode == "train"
                       else "val.json"), "w") as f:
            json.dump({"world_mat": world_mats,
                       "scale_mat": scale_mats}, f)
    return root


@pytest.mark.slow
def test_dtu_end_to_end(tmp_path):
    root = str(tmp_path / "scene")
    os.makedirs(root)
    _make_dtu_scene(root)

    ds = DtuSceneDataset(root, is_train=True)
    assert ds.n_images == 2
    assert ds.max_radius == 1.0
    # rays look roughly toward the origin
    rayo, rayd = ds.gen_rays_at(0)
    center_dir = rayd[H // 2, W // 2]
    to_origin = -rayo[0, 0] / np.linalg.norm(rayo[0, 0])
    assert np.dot(center_dir, to_origin) > 0.9

    cfg = NeuSConfig(n_samples=8, n_importance=8, up_sample_steps=2)
    tcfg = NeuSTrainConfig(end_iter=4, warm_up_end=2, batch_size=32,
                           save_freq=10**9, val_freq=10**9,
                           use_white_bkgd=False, lr_end_iter=8)
    runner = NeuSRunner(cfg, tcfg, ds, str(tmp_path / "exp"), seed=0)
    runner.train()
    assert runner.iter_step == 4

    surf_root = str(tmp_path / "surf")
    for is_train in (True, False):
        d = DtuSceneDataset(root, is_train=is_train)
        ex = GeoExtractor(runner.params, cfg, d, surf_root,
                          use_white_bkgd=False, batch_size=48, light_h=2)
        ex.extract_views(is_train=is_train, no_vis=True)
    assert os.path.exists(join(surf_root, "train_000", "xyz.npy"))
    assert not os.path.exists(join(surf_root, "train_000", "lvis.npy"))

    # decomposition on the dtu buffers (gamma path, no lvis)
    cfg2 = dc.DecompConfig(
        data_type="dtu", light_h=2, imh=H, white_bg=False,
        num_embed=4, num_drop=2, thres_str="0.1;0.2", z_dim=16,
        mlp_width=8, n_rays_per_step=16, epochs=2, total_sample_vq=50)
    tr_ds = ShapeDataset(root, surf_root, data_type="dtu", imh=H,
                         white_bg=False, mode="train")
    va_ds = ShapeDataset(root, surf_root, data_type="dtu", imh=H,
                         white_bg=False, mode="vali")
    assert len(tr_ds) == 2 and len(va_ds) == 1
    train_views = [tr_ds.load_view(f) for f in tr_ds.files]
    vali_views = [va_ds.load_view(f) for f in va_ds.files]
    assert train_views[0].lvis is None

    nfr_out = str(tmp_path / "out" / "dtu_nfr_unit" / "lr5e-4")
    nfr_params, hist = train_nfr_unit(cfg2, train_views, vali_views,
                                      nfr_out)
    assert np.isfinite(hist).all()
    assert "gamma_bias" in nfr_params  # the real-data gamma is trained

    vq_out = str(tmp_path / "out" / "dtu_vq_nfr" / "lr5e-4")
    vq_params, _, hist2 = train_vq_nfr(
        cfg2, nfr_params, train_views, vali_views, vq_out)
    assert np.isfinite(hist2).all()
    assert "gamma_bias" in vq_params
