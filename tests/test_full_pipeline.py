"""Full three-phase decomposition pipeline on a synthetic scene:
nfr_unit -> vq_nfr (k-means init + dropout sweep + main_<k>) -> ref_nfr,
then the 4-phase test driver — end to end with tiny shapes."""

import json
import os
from os.path import join

import numpy as np
import pytest

from vqnerf_release_tpu.data.shape_dataset import ShapeDataset
from vqnerf_release_tpu.models import decomp_common as dc
from vqnerf_release_tpu.train.loop import (elbow_select, save_metas,
                                           train_nfr_unit, train_ref_nfr,
                                           train_vq_nfr)

from tests.test_data_layer import _make_synth_scene

CFG = dc.DecompConfig(light_h=2, num_embed=4, num_drop=2, z_dim=16,
                      mlp_width=8, imh=16, thres_str="0.1;0.2",
                      n_rays_per_step=32, epochs=2, total_sample_vq=100)


def test_elbow_select():
    # clear elbow at i=1: improves then plateaus within thres
    assert elbow_select([1.0, 0.5, 0.49, 0.48], best_thres=0.1) == 1
    # monotone decreasing fast -> falls through to the last
    assert elbow_select([1.0, 0.8, 0.3, 0.1], best_thres=0.01) == 3
    # first point already best
    assert elbow_select([0.1, 0.5, 0.6, 0.7], best_thres=0.1) == 3


@pytest.mark.slow
def test_three_phase_pipeline(tmp_path):
    root = str(tmp_path)
    data_root, surf_root = _make_synth_scene(
        root, h=16, w=16, light_h=CFG.light_h)
    train_ds = ShapeDataset(data_root, surf_root, imh=16, mode="train")
    vali_ds = ShapeDataset(data_root, surf_root, imh=16, mode="vali")
    train_views = [train_ds.load_view(f) for f in train_ds.files]
    vali_views = [vali_ds.load_view(f) for f in vali_ds.files][:1]

    # Phase 1
    nfr_out = join(root, "out", "scene_nfr_unit", "lr5e-4")
    nfr_params, hist1 = train_nfr_unit(
        CFG, train_views, vali_views, nfr_out)
    assert len(hist1) == 2 and np.isfinite(hist1).all()
    assert os.path.isdir(join(nfr_out, "checkpoints", "ckpt-2"))
    assert os.path.exists(join(nfr_out, "vis_vali", "np_light.npy"))
    ep = join(nfr_out, "vis_vali", "epoch%09d" % 2)
    assert os.path.exists(join(ep, "batch000000000", "pred_rgb.png"))
    meta = json.load(
        open(join(ep, "batch000000000", "metadata.json")))
    assert "psnr" in meta

    # Resume is a no-op when already done
    nfr_params2, hist_resume = train_nfr_unit(
        CFG, train_views, vali_views, nfr_out)
    assert hist_resume == []

    # Phase 2
    vq_out = join(root, "out", "scene_vq_nfr", "lr5e-4")
    vq_params, ema, hist2 = train_vq_nfr(
        CFG, nfr_params, train_views, vali_views, vq_out)
    assert np.isfinite(hist2).all()
    assert os.path.exists(join(vq_out, "cluster_centers.npy"))
    centers = np.load(join(vq_out, "cluster_centers.npy"))
    assert centers.shape == (CFG.num_embed, CFG.z_dim)
    ep2 = join(vq_out, "vis_vali", "epoch%09d" % 2)
    assert os.path.exists(join(ep2, "loss.json"))
    assert os.path.exists(join(ep2, "vq_test_loss.json"))
    scores = json.load(open(join(ep2, "vq_test_loss.json")))
    assert len(scores["vqrgb"]) == CFG.num_drop + 1
    # exactly one main_<k> dir
    mains = [d for d in os.listdir(ep2) if d.startswith("main_")]
    assert len(mains) == 1
    assert os.path.exists(join(vq_out, "vis_vali", "np_light.npy"))

    # Phase 3
    light = np.load(join(vq_out, "vis_vali", "np_light.npy"))
    train_ds_ref = ShapeDataset(data_root, surf_root, imh=16,
                                mode="train", with_ref=True)
    vali_ds_ref = ShapeDataset(data_root, surf_root, imh=16,
                               mode="vali", with_ref=True)
    train_views_ref = [train_ds_ref.load_view(f)
                       for f in train_ds_ref.files]
    vali_views_ref = [vali_ds_ref.load_view(f)
                      for f in vali_ds_ref.files][:1]
    ref_out = join(root, "out", "scene_ref_nfr", "lr5e-4")
    ref_params, hist3 = train_ref_nfr(
        CFG, vq_params, light, train_views_ref, vali_views_ref, ref_out)
    assert np.isfinite(hist3).all()

    # 4-phase inference on the trained chain
    import cv2

    from vqnerf_release_tpu.pipelines.test_driver import run_test
    env_dir = join(root, "test_envs")
    os.makedirs(env_dir, exist_ok=True)
    rs = np.random.RandomState(0)
    for name in ("courtyard", "night"):
        cv2.imwrite(join(env_dir, name + ".hdr"),
                    rs.rand(CFG.light_h, 2 * CFG.light_h, 3).astype(
                        np.float32)[..., ::-1])
    test_ds = ShapeDataset(data_root, surf_root, imh=16, mode="test",
                           with_ref=True)
    outroot = join(ref_out, "vis_test", "ckpt-2")
    info = run_test(ref_params, vq_params, CFG, test_ds, outroot,
                    env_dir, vali_epoch_dir=ep2)
    assert 2 <= info["n_vq"] <= CFG.num_embed
    assert os.path.exists(join(
        outroot, "pd_vq", "batch000000000", "embed_map.png"))
    assert os.path.exists(join(
        outroot, "pd_relit", "batch000000000",
        "pred_rgb_probes_courtyard.png"))

    metas = save_metas(nfr_out)
    assert len(metas["psnr"]) >= 1


def test_native_sampler_training_path(tmp_path, monkeypatch):
    """One epoch of nfr_unit with the native C++ sampler enabled."""
    from vqnerf_release_tpu.data import native
    if not native.native_available():
        pytest.skip("libfastloader.so not built")
    monkeypatch.setenv("VQNERF_NATIVE_SAMPLER", "1")
    data_root, surf_root = _make_synth_scene(
        str(tmp_path), h=16, w=16, light_h=CFG.light_h)
    tr = ShapeDataset(data_root, surf_root, imh=16, mode="train")
    va = ShapeDataset(data_root, surf_root, imh=16, mode="vali")
    train_views = [tr.load_view(f) for f in tr.files]
    vali_views = [va.load_view(f) for f in va.files][:1]
    from dataclasses import replace
    cfg = replace(CFG, epochs=1)
    out = join(str(tmp_path), "out", "native_nfr", "lr5e-4")
    params, hist = train_nfr_unit(cfg, train_views, vali_views, out)
    assert len(hist) == 1 and np.isfinite(hist).all()
