"""End-to-end CLI workflow: geo-train -> gen-geo -> decomp-train -> test,
all through the argparse surface (catches arg-wiring regressions)."""

import json
import os
from os.path import join

import numpy as np
import pytest

from tests.test_gen_geo import _make_stage1_scene


@pytest.mark.slow
def test_cli_full_workflow(tmp_path):
    import cv2

    from vqnerf_release_tpu.cli import main

    scene = "lego_3072"  # nerf-family preset
    data_root = str(tmp_path / "data")
    out_root = str(tmp_path / "output")
    os.makedirs(data_root)
    _make_stage1_scene(data_root)
    # stage-2 metadata next to the rgba files
    tj = json.load(open(join(data_root, "transforms_train.json")))
    for mode in ("train", "val"):
        tjm = json.load(
            open(join(data_root, "transforms_%s.json" % mode)))
        for i, fr in enumerate(tjm["frames"]):
            vdir = join(data_root, "%s_%03d" % (mode, i))
            c2w = np.asarray(fr["transform_matrix"])
            with open(join(vdir, "metadata.json"), "w") as f:
                json.dump({
                    "imh": 12, "imw": 12,
                    "cam_angle_x": tjm["camera_angle_x"],
                    "cam_transform_mat": ",".join(
                        str(x) for x in c2w.reshape(-1))}, f)

    # occ_res=16: the production 128^3 grid is an ~87 s CPU build
    # (forward SDF on 2M points); the occupancy path itself is covered
    # at small res by tests/test_occupancy.py
    # tail_frac=0: keep the tiny 8-sample step for all 3 iters (the r4
    # default schedule would compile a 64+64 r4 tail step for iter 3)
    geo_small = ("batch_size=32,warm_up_end=2,save_freq=1000000000,"
                 "val_freq=1000000000,occ_res=16,tail_frac=0")
    main(["geo-train", scene, "--data-root", data_root,
          "--output-root", out_root, "--end-iter", "3",
          "--geo-override", geo_small, "--n-samples", "8"])
    exp_dir = join(out_root, "exp", scene, "nerf")
    assert os.path.isdir(join(exp_dir, "checkpoints"))

    main(["gen-geo", scene, "--data-root", data_root,
          "--output-root", out_root, "--no-vis", "--n-samples", "8"])
    surf = join(out_root, "surf", "nerf_surf", scene)
    assert os.path.exists(join(surf, "train_000", "xyz.npy"))
    assert os.path.exists(join(surf, "val_000", "xyz.npy"))

    small = ("imh=12,light_h=2,num_embed=4,num_drop=2,thres_str=0.1;0.2,"
             "z_dim=16,mlp_width=8,n_rays_per_step=16,epochs=1,"
             "total_sample_vq=40,data_type=hw,white_bg=True")
    # data_type=hw: NeRF-convention cameras without lvis (we extracted
    # with --no-vis)
    main(["decomp-train", scene, "--data-root", data_root,
          "--output-root", out_root, "--preset-override", small])
    ref_out = join(out_root, "train", scene + "_ref_nfr", "lr5e-4")
    assert os.path.isdir(join(ref_out, "checkpoints"))

    # reference --debug parity (trainvali.py:60-61, 233-236): eager
    # step, one epoch, single train view — must complete all 3 phases
    dbg_root = out_root + "_dbg"
    main(["decomp-train", scene, "--data-root", data_root,
          "--output-root", dbg_root, "--surf-root", surf,
          "--preset-override", small, "--debug"])
    assert os.path.isdir(join(dbg_root, "train", scene + "_ref_nfr",
                              "lr5e-4", "checkpoints"))

    env_dir = str(tmp_path / "envs")
    os.makedirs(env_dir)
    cv2.imwrite(join(env_dir, "city.hdr"),
                np.random.rand(2, 4, 3).astype(np.float32))
    main(["test", scene, "--data-root", data_root,
          "--output-root", out_root, "--test-envmap-dir", env_dir,
          "--preset-override", small])
    outroot = join(ref_out, "vis_test", "latest")
    assert os.path.exists(join(
        outroot, "pd_vq", "batch000000000", "embed_map.png"))
    assert os.path.exists(join(
        outroot, "raw_test", "batch000000000", "pred_rgb.png"))

    # geo-video: stage-1 trajectory extraction (reference gen_video.py)
    frames = []
    for i in range(2):
        ang = 0.3 + 0.2 * i
        c2w = np.eye(4)
        c2w[:3, 3] = [2.0 * np.sin(ang), 0.3, 2.0 * np.cos(ang)]
        fwd = -c2w[:3, 3] / np.linalg.norm(c2w[:3, 3])
        right = np.cross([0.0, 1.0, 0.0], -fwd)
        right /= np.linalg.norm(right)
        up = np.cross(-fwd, right)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2] = right, up, -fwd
        frames.append({"transform_matrix": c2w.tolist()})
    with open(join(data_root, "transforms_test.json"), "w") as f:
        json.dump({"camera_angle_x": 0.8, "frames": frames}, f)
    main(["geo-video", scene, "--data-root", data_root,
          "--output-root", out_root, "--no-vis", "--n-samples", "8"])
    video_root = join(surf, "video")
    assert os.path.exists(join(video_root, "test_000", "xyz.npy"))
    meta = json.load(open(join(video_root, "test_000", "metadata.json")))
    assert "focal" in meta and len(meta["cam_transform_mat"]) == 4

    # gen-video --mode edit: edit workspace -> edited trajectory render
    edit_root = str(tmp_path / "edited")
    os.makedirs(edit_root)
    with open(join(edit_root, "dst.json"), "w") as f:
        json.dump({"diff": [0.8, 0.1, 0.1], "spec": [-1.0, 0.0, 0.0],
                   "rough": [0.3]}, f)
    emask = np.zeros((12, 12, 3), np.float32)
    emask[4:8, 4:8] = 1.0
    for i in range(2):
        np.save(join(edit_root, "test_%03d.npy" % i), emask)
    main(["gen-video", scene, "--data-root", data_root,
          "--output-root", out_root, "--video-root", video_root,
          "--mode", "edit", "--edit-root", edit_root,
          "--preset-override", small])
    edit_out = join(ref_out, "vis_video", "edit")
    assert os.path.exists(join(edit_out, "batch000000000", "pred_rgb.png"))
