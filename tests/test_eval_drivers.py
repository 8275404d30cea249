"""cluster_eval / metric_eval driver tests on synthetic outputs."""

import json
import os
from os.path import join

import numpy as np
import pytest

from vqnerf_release_tpu.eval.cluster_eval import (EMBED_C, SEL_COLORS,
                                                  correspond,
                                                  eval_scene_segmentation,
                                                  img_embed, purity, resort)


def test_palettes_match_reference():
    # first 18 entries of sel_colors (cluster_eval.py:21-27)
    expected_sel = [
        [255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0],
        [255, 0, 255], [0, 255, 255], [127, 0, 0], [0, 127, 0],
        [0, 0, 127], [127, 127, 0], [127, 0, 127], [0, 127, 127],
        [255, 127, 127], [127, 255, 127], [127, 127, 255],
        [255, 255, 127], [255, 127, 255], [127, 255, 255],
        [255, 127, 0], [255, 0, 127], [0, 255, 127]]
    for got, exp in zip(SEL_COLORS, expected_sel):
        np.testing.assert_array_equal(got, exp)
    expected_embed_6 = [128, 0, 0]
    np.testing.assert_array_equal(EMBED_C[6], expected_embed_6)
    assert len(SEL_COLORS) == 21 and len(EMBED_C) == 21


def test_purity_and_correspond():
    # gt labels 0/1, pd labels 10/20 matching perfectly
    gt = np.array([0, 0, 0, 1, 1, 1])
    pd = np.array([10, 10, 10, 20, 20, 20])
    coo, label_map, gt_r, pd_r = correspond(gt, pd)
    assert purity(coo) == 1.0
    np.testing.assert_array_equal(gt_r, pd_r)
    # imperfect: one pixel flipped
    pd2 = np.array([10, 10, 20, 20, 20, 20])
    coo2, _, gt2, pd2r = correspond(gt, pd2)
    np.testing.assert_allclose(purity(coo2), 5 / 6)


def test_img_embed_and_resort():
    arr = np.array([[255, 0, 0], [0, 255, 0], [1, 2, 3]])
    ids = img_embed(arr, SEL_COLORS)
    np.testing.assert_array_equal(ids, [1, 2, 0])
    np.testing.assert_array_equal(resort(np.array([5, 9, 5])), [0, 1, 0])


def test_eval_scene_segmentation(tmp_path):
    import cv2
    h = w = 8
    rgba_scene = tmp_path / "rgba"
    gt_scene = tmp_path / "gt"
    pd_scene = tmp_path / "pd"
    for i in range(2):
        vdir = rgba_scene / ("val_%03d" % i)
        gdir = gt_scene / ("val_%03d" % i)
        pdir = pd_scene / ("batch%09d" % i)
        for d in (vdir, gdir, pdir):
            os.makedirs(d)
        rgba = np.zeros((h, w, 4), np.uint8)
        rgba[..., 3] = 255
        cv2.imwrite(str(vdir / "rgba.png"), rgba)
        # GT: left half label color 1, right half color 2
        gt = np.zeros((h, w, 3), np.uint8)
        gt[:, : w // 2] = SEL_COLORS[0][::-1]  # BGR
        gt[:, w // 2 :] = SEL_COLORS[1][::-1]
        cv2.imwrite(str(gdir / "idx.png"), gt)
        # Pred: same split using embed palette colors 3/4 -> perfect after
        # majority matching
        pd = np.zeros((h, w, 3), np.uint8)
        pd[:, : w // 2] = EMBED_C[2][::-1]
        pd[:, w // 2 :] = EMBED_C[3][::-1]
        cv2.imwrite(str(pdir / "embed_map.png"), pd)
    m = eval_scene_segmentation(
        str(rgba_scene), str(gt_scene), str(pd_scene), n_vals=2)
    assert m["purity"] == 1.0
    assert m["f1-micro"] == 1.0
    assert m["f1-macro"] == 1.0


def test_metric_eval_scene(tmp_path):
    import cv2

    from vqnerf_release_tpu.eval.metric_eval import eval_scene
    h = w = 16
    rs = np.random.RandomState(0)
    gt_scene = tmp_path / "gt" / "lego_3072"
    pd_scene = tmp_path / "pd_test"
    relight_dir = tmp_path / "pd_relit"
    for i in range(2):
        gdir = gt_scene / ("val_%03d" % i)
        pdir = pd_scene / ("batch%09d" % i)
        rdir = relight_dir / ("batch%09d" % i)
        for d in (gdir, pdir, rdir):
            os.makedirs(d)
        rgb = (rs.rand(h, w, 3) * 255).astype(np.uint8)
        rgba = np.dstack([rgb, np.full((h, w), 255, np.uint8)])
        cv2.imwrite(str(gdir / "rgba.png"), rgba[..., [2, 1, 0, 3]])
        for name in ("albedo", "metal", "rough"):
            cv2.imwrite(str(gdir / f"{name}.png"),
                        (rs.rand(h, w, 3) * 255).astype(np.uint8))
        cv2.imwrite(str(gdir / "rgba_city.png"),
                    rgba[..., [2, 1, 0, 3]])
        # predictions: reuse gt rgb (perfect recon)
        cv2.imwrite(str(pdir / "pred_rgb.png"), rgb[..., ::-1])
        for name in ("pred_basecolor", "pred_albedo", "pred_spec",
                     "pred_rough"):
            cv2.imwrite(str(pdir / f"{name}.png"),
                        (rs.rand(h, w, 3) * 255).astype(np.uint8))
        cv2.imwrite(str(pdir / "pred_alpha.png"),
                    np.full((h, w), 255, np.uint8))
        cv2.imwrite(str(rdir / "pred_rgb_probes_city.png"),
                    rgb[..., ::-1])
    m = eval_scene("lego_3072", "nerf", str(pd_scene), str(gt_scene),
                   relight_dir=str(relight_dir), env_lights=["city"])
    # perfect recon -> very high PSNR
    assert min(m["rgb"]["psnr"]) > 40
    assert min(m["env"]["psnr"]) > 40
    assert len(m["kd"]["psnr"]) == 2
    # nerf family has no ks/rough GT (reference metric_eval.py:78)
    assert "ks" not in m and "rough" not in m
    assert all(np.isfinite(v) for v in m["kd"]["lpips"])
    # mat family evaluates ks/rough but has no relight GT (:85-86)
    m2 = eval_scene("lego_3072", "mat", str(pd_scene), str(gt_scene),
                    relight_dir=str(relight_dir), env_lights=["city"])
    assert len(m2["ks"]["psnr"]) == 2
    assert len(m2["rough"]["psnr"]) == 2
    assert "env" not in m2


def _load_reference_cluster_eval():
    """Exec the function portion of the reference cluster_eval.py
    (/root/reference/decomp/nerfvq_nfr3/cluster_eval.py:1-125) under
    import shims: the pre-0.23 sklearn module paths it star-imports,
    a minimal xiuminglib stub (only img.normalize_uint is used), and
    the removed np.int alias. The module-level driver loop (:127-146)
    is cut; everything above — palettes, norm_read, img_embed, purity,
    resort, correspond, process_scene — is the reference's own code."""
    import sys
    import types

    from sklearn.metrics import cluster as skcluster

    path = "/root/reference/decomp/nerfvq_nfr3/cluster_eval.py"
    src = open(path).read()
    src = src[: src.index("avg_score = init_dict()")]

    shims = {}
    for old, new in (("sklearn.metrics.cluster.supervised",
                      skcluster._supervised),
                     ("sklearn.metrics.cluster.unsupervised",
                      skcluster._unsupervised)):
        mod = types.ModuleType(old)
        mod.__dict__.update(
            {k: v for k, v in new.__dict__.items()
             if not k.startswith("_")})
        shims[old] = mod
    xm = types.SimpleNamespace(img=types.SimpleNamespace(
        normalize_uint=lambda a: a.astype(float) / np.iinfo(a.dtype).max))
    tp_x = types.ModuleType("third_party.xiuminglib")
    tp_x.xiuminglib = xm
    tp = types.ModuleType("third_party")
    tp.xiuminglib = tp_x
    shims["third_party"] = tp
    shims["third_party.xiuminglib"] = tp_x

    saved = {k: sys.modules.get(k) for k in shims}
    sys.modules.update(shims)
    try:
        ns = {}
        exec(compile(src, path, "exec"), ns)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return ns


def test_cluster_eval_reference_parity(tmp_path, monkeypatch):
    """Run the REAL reference process_scene (and its helpers) on a
    synthetic imperfect segmentation tree vs our
    eval_scene_segmentation on the same files: all five scores must
    match exactly (cluster_eval.py:86-124)."""
    import cv2

    # the removed np.int alias, used by the reference's img_embed;
    # scoped to this test so nothing else sees it
    monkeypatch.setattr(np, "int", int, raising=False)
    ref = _load_reference_cluster_eval()
    rs = np.random.RandomState(7)

    # function-level parity on random label vectors
    for _ in range(20):
        gt = rs.randint(0, 4, 200) * 3 + 1  # non-contiguous labels
        pd = rs.randint(0, 5, 200) * 7
        coo_r, map_r, gt_r, pd_r = ref["correspond"](gt, pd)
        coo_o, map_o, gt_o, pd_o = correspond(gt, pd)
        np.testing.assert_array_equal(coo_r, coo_o)
        np.testing.assert_array_equal(map_r, map_o)
        np.testing.assert_array_equal(pd_r, pd_o)
        assert ref["purity"](coo_r) == purity(coo_o)
    arr = np.array(SEL_COLORS)[rs.randint(0, 21, 300)]
    arr[rs.rand(300) < 0.2] = 13  # unlabeled pixels -> id 0
    np.testing.assert_array_equal(
        ref["img_embed"](arr, ref["sel_colors"]), img_embed(arr, SEL_COLORS))

    # scene-level parity: the reference path conventions
    # (pred_root/<scene>_ref_nfr/lr5e-4/pd_vq/ckpt-5/batchNNNNNNNNN)
    scene, n_vals, h, w = "lego_3072", 2, 12, 12
    rgba_scene = tmp_path / "vis_comps" / scene
    gt_scene = tmp_path / "nerf_seg1" / scene
    pd_scene = (tmp_path / "train" / (scene + "_ref_nfr") / "lr5e-4"
                / "pd_vq" / "ckpt-5")
    for i in range(n_vals):
        vdir = rgba_scene / ("val_%03d" % i)
        gdir = gt_scene / ("val_%03d" % i)
        pdir = pd_scene / ("batch%09d" % i)
        for d in (vdir, gdir, pdir):
            os.makedirs(d)
        rgba = np.zeros((h, w, 4), np.uint8)
        rgba[..., 3] = np.where(rs.rand(h, w) < 0.8, 255, 0)
        cv2.imwrite(str(vdir / "rgba.png"), rgba)
        gt = np.array(SEL_COLORS, np.uint8)[rs.randint(0, 3, (h, w))]
        cv2.imwrite(str(gdir / "idx.png"), gt[..., ::-1])
        # imperfect prediction: mostly follows gt, 20% scrambled
        ids = img_embed(gt.reshape(-1, 3), SEL_COLORS).reshape(h, w)
        flip = rs.rand(h, w) < 0.2
        ids = np.where(flip, rs.randint(1, 5, (h, w)), ids + 1)
        pd_img = np.array(EMBED_C, np.uint8)[ids % len(EMBED_C)]
        cv2.imwrite(str(pdir / "embed_map.png"), pd_img[..., ::-1])

    ref["data_root"] = str(tmp_path / "vis_comps")
    ref["label_root"] = str(tmp_path / "nerf_seg1")
    ref["pred_root"] = str(tmp_path / "train")
    ref["n_vals"] = n_vals
    theirs = ref["process_scene"](scene)
    ours = eval_scene_segmentation(
        str(rgba_scene), str(gt_scene), str(pd_scene), n_vals=n_vals)
    for k in ("purity", "f1-micro", "f1-macro", "p-macro", "r-macro"):
        assert np.isclose(theirs[k], ours[k], rtol=0, atol=0), (
            k, theirs[k], ours[k])
    assert 0.5 < ours["purity"] < 1.0  # genuinely imperfect fixture


def test_csv_exporters(tmp_path):
    from vqnerf_release_tpu.eval.vis_csv import (cluster_json_to_csv,
                                                 metric_json_to_csv)
    scores = {"lego_3072": {"rgb": {"psnr": [30.0, 32.0], "ssim": [0.9],
                                    "lpips": [0.1]}}}
    jp = tmp_path / "ref_nfr.json"
    with open(jp, "w") as f:
        json.dump(scores, f)
    df = metric_json_to_csv(str(jp), str(tmp_path / "m.csv"))
    assert df.loc[0, "rgb_psnr"] == 31.0
    cl = {"vq": {"purity": [0.9, 0.8], "f1-micro": [0.7]}}
    with open(tmp_path / "cluster.json", "w") as f:
        json.dump(cl, f)
    df2 = cluster_json_to_csv(str(tmp_path / "cluster.json"),
                              str(tmp_path / "c.csv"))
    assert abs(df2.loc[0, "purity"] - 0.85) < 1e-9
