"""Round-trip tests for every metric_eval baseline-model adapter on
synthetic directory trees in each model's reference layout
(metric_eval.py get_scene :210-257 + load_* :264-501), so a dead adapter
flag fails loudly (r1 ADVICE)."""

import json
import os
from os.path import join

import cv2
import numpy as np
import pytest

from vqnerf_release_tpu.eval.metric_eval import (MODEL_ADAPTERS,
                                                 _load_pd_mask, _read3,
                                                 eval_dataset,
                                                 resolve_scene_dirs)

H = W = 16
SCENE = "lego_3072"


def _write_png(path, img, gray=False):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    if not gray and arr.ndim == 3 and arr.shape[-1] >= 3:
        arr = arr[..., [2, 1, 0] + ([3] if arr.shape[-1] == 4 else [])]
    cv2.imwrite(path, arr)


def _make_gt(data_root, rs, envs=("city",)):
    gdir = join(data_root, SCENE, "val_000")
    rgb = rs.rand(H, W, 3)
    rgba = np.dstack([rgb, np.ones((H, W))])
    _write_png(join(gdir, "rgba.png"), rgba)
    for name in ("albedo", "metal", "rough"):
        _write_png(join(gdir, f"{name}.png"), rs.rand(H, W, 3))
    for env in envs:
        _write_png(join(gdir, f"rgba_{env}.png"), rgba)
    return rgb


def _fill_view(view_dir, adapter, rs, jpg=False):
    """Write every buffer an adapter reads into one view dir."""
    names = {adapter["rgb"], adapter["albedo"], adapter["albedo_add"],
             adapter["spec"], adapter["spec_mul"], adapter["rough"]}
    names |= set(adapter["kd_scale"])
    for name in names - {None}:
        _write_png(join(view_dir, name), rs.rand(H, W, 3))
    alpha = adapter["alpha"]
    if alpha is None:
        return
    if alpha.endswith(".npy"):
        os.makedirs(view_dir, exist_ok=True)
        np.save(join(view_dir, alpha), np.full((H, W, 1), 2.5, np.float32))
    elif adapter.get("alpha_invert"):
        _write_png(join(view_dir, alpha), np.zeros((H, W, 3)))  # black=fg
    else:
        _write_png(join(view_dir, alpha), np.ones((H, W)), gray=True)


# (model, family, view_dir_name, pd_layout, relit_layout)
CASES = [
    ("ref_nfr", "nerf", "batch000000000",
     "{scene}_ref_nfr/lr5e-4/pd_test/ckpt-5",
     "{scene}_ref_nfr/lr5e-4/pd_relit/ckpt-5"),
    ("base_nfr", "mat", "val_000",
     "{scene}_nfr_unit/lr5e-4/vis_z/ckpt-10", None),
    ("nfr", "nerf", "batch000000000",
     "{scene}_nerfactor/lr5e-3/vis_vali/epoch000000100",
     "{scene}_nerfactor/lr5e-3/vis_test/ckpt-10"),
    ("nv", "nerf", "batch000000000", "{scene}/validate",
     "relight/{scene}"),
    ("nv", "mat", "batch000000000", "{scene}/validate", None),
    ("neilf", "mat", "batch000000000", "{scene}/run0/plots/30000", None),
    ("pil", "mat", "val_000", "{scene}/test_400000", None),
    ("nero", "mat", "0", "lego_material-val/100000", None),
]


@pytest.mark.parametrize("model,family,view,pd_layout,relit_layout",
                         CASES, ids=lambda v: str(v))
def test_adapter_roundtrip(tmp_path, model, family, view, pd_layout,
                           relit_layout):
    rs = np.random.RandomState(0)
    data_root = str(tmp_path / "gt")
    pred_root = str(tmp_path / "pred")
    _make_gt(data_root, rs)
    adapter = MODEL_ADAPTERS[model]

    pd_scene = join(pred_root, pd_layout.format(scene=SCENE))
    _fill_view(join(pd_scene, view), adapter, rs,
               jpg=model == "nero")
    if relit_layout and adapter["relit"]:
        rdir = join(pred_root, relit_layout.format(scene=SCENE))
        rview = "val_000" if adapter["relit_own_alpha"] else view
        img = rs.rand(H, W, 4) if adapter["relit_own_alpha"] \
            else rs.rand(H, W, 3)
        _write_png(join(rdir, rview, adapter["relit"].format(env="city")),
                   img)

    # resolve_scene_dirs must find exactly the tree we built
    got_pd, got_relit = resolve_scene_dirs(pred_root, SCENE, family, model)
    assert os.path.realpath(got_pd) == os.path.realpath(pd_scene), \
        (got_pd, pd_scene)

    out_json = str(tmp_path / "scores.json")
    scores = eval_dataset([SCENE], family, pred_root, data_root,
                          out_json=out_json, model_name=model)
    m = scores[SCENE]
    assert scores["_lpips_impl"] in ("proxy", "alexnet")
    flags_kd = family in ("nerf", "mat")
    if adapter["eval_rgb"]:
        assert len(m["rgb"]["psnr"]) == 1
        assert np.isfinite(m["rgb"]["psnr"][0])
    else:
        assert "rgb" not in m
    if flags_kd:
        assert len(m["kd"]["psnr"]) == 1
    if family == "mat" and adapter["eval_kskr"] and adapter["spec"]:
        assert len(m["ks"]["psnr"]) == 1
        assert len(m["rough"]["psnr"]) == 1
    else:
        assert "ks" not in m
    if family == "nerf" and relit_layout and adapter["eval_relight"]:
        assert len(m["env"]["psnr"]) == 1
    with open(out_json) as f:
        assert json.load(f)["_lpips_impl"] == scores["_lpips_impl"]


def test_alpha_invert_semantics(tmp_path):
    """nv/neilf estimate fg from a white-bg buffer: black pixels are
    foreground after inversion (metric_eval.py:478)."""
    view = str(tmp_path / "v")
    img = np.ones((H, W, 3))
    img[:8] = 0.0  # top half foreground
    _write_png(join(view, "pred_ks.png"), img)
    mask = _load_pd_mask(view, MODEL_ADAPTERS["nv"], H, W)
    assert mask.shape == (H, W, 1)
    assert mask[:8].all() and not mask[8:].any()


def test_nero_depth_mask(tmp_path):
    """nero: mask = 0 < depth < 10 from depth.npy (metric_eval.py:473-497)."""
    view = str(tmp_path / "v")
    os.makedirs(view)
    depth = np.zeros((H, W, 1), np.float32)
    depth[:4] = 3.0    # fg
    depth[4:8] = 50.0  # beyond threshold -> bg
    np.save(join(view, "depth.npy"), depth)
    mask = _load_pd_mask(view, MODEL_ADAPTERS["nero"], H, W)
    assert mask[:4].all() and not mask[4:].any()


def test_srgb_pred_linearizes(tmp_path):
    """pil buffers are sRGB; _read3(srgb_pred=True) linearizes on read
    (metric_eval.py:296)."""
    from vqnerf_release_tpu.ops.colorspace import srgb2linear
    p = str(tmp_path / "img.png")
    val = 0.5
    _write_png(p, np.full((H, W, 3), val))
    plain = _read3(p)
    lin = _read3(p, srgb_pred=True)
    expect = float(np.asarray(srgb2linear(np.float32(plain[0, 0, 0]))))
    assert abs(lin[0, 0, 0] - expect) < 1e-5
    assert abs(plain[0, 0, 0] - val) < 0.01
