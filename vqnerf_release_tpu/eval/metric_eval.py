"""Reconstruction / decomposition / relighting metric evaluation.

Parity target: decomp/nerfvq_nfr3/metric_eval.py (816 LoC): per
dataset-family flags for which GT exists, per-model path adapters, albedo
scale matching, sRGB conversions, white-bg alignment blending, and
PSNR/SSIM/LPIPS per buffer.

The per-family evaluation matrix (metric_eval.py:60-121):
  nerf: rgb + kd + ks + rough + relight(8 envs), scaled albedo
  mat:  rgb + kd + ks + rough (no relight GT)
  dtu/ours/hw: rgb only, no scale, no sRGB re-encode
"""

import json
import os
from os.path import join

import numpy as np

from ..data import io as vio
from ..ops.colorspace import linear2srgb as _l2s_jnp
from . import metrics

__all__ = ["FAMILY_FLAGS", "ENV_LIGHTS_CG", "ENV_LIGHTS_REAL",
           "MODEL_ADAPTERS", "eval_scene", "eval_dataset"]

SPEC_SCENES = ("drums", "lego", "materials", "chair0", "machine1",
               "kitchen6")
ENV_LIGHTS_CG = ["city", "courtyard", "forest", "sunrise", "night",
                 "interior", "studio", "sunset"]
ENV_LIGHTS_REAL = ENV_LIGHTS_CG + [str(i) for i in range(1, 9)]

FAMILY_FLAGS = {
    "nerf": dict(with_kd=True, with_kskr=True, with_relight=True,
                 new_h=512, use_scale=True, k_to_srgb=True,
                 alpha_strict=0.8),
    "mat": dict(with_kd=True, with_kskr=True, with_relight=False,
                new_h=420, use_scale=True, k_to_srgb=True,
                alpha_strict=0.8),
    "dtu": dict(with_kd=False, with_kskr=False, with_relight=False,
                new_h=512, use_scale=False, k_to_srgb=False,
                alpha_strict=0.95),
    "ours": dict(with_kd=False, with_kskr=False, with_relight=False,
                 new_h=420, use_scale=False, k_to_srgb=False,
                 alpha_strict=0.95),
    "hw": dict(with_kd=False, with_kskr=False, with_relight=False,
               new_h=420, use_scale=False, k_to_srgb=False,
               alpha_strict=0.95),
}

# Per-model buffer filenames (metric_eval.py get_scene/load_* adapters).
MODEL_ADAPTERS = {
    "ref_nfr": dict(rgb="pred_rgb.png", albedo="pred_basecolor.png",
                    albedo_spec=None, kd_scale=("pred_albedo.png",
                                                "pred_spec.png"),
                    spec="pred_spec.png", rough="pred_rough.png",
                    alpha="pred_alpha.png",
                    relit="pred_rgb_probes_{env}.png",
                    use_scale=False, k_to_srgb=False),
    "base_nfr": dict(rgb="pred_rgb.png", albedo="albedo.png",
                     albedo_spec="spec.png",
                     kd_scale=("albedo.png", "spec.png"),
                     spec="spec.png", rough="rough.png",
                     alpha="pred_alpha.png", relit=None,
                     use_scale=False, k_to_srgb=False),
    "nfr": dict(rgb="pred_rgb.png", albedo="pred_albedo.png",
                albedo_spec=None, kd_scale=("pred_albedo.png", None),
                spec=None, rough=None, alpha="gt_alpha.png",
                relit="pred_rgb_probes_{env}.png"),
    "nv": dict(rgb="pred_opt.png", albedo="pred_kd.png",
               albedo_spec=None, kd_scale=("pred_kd.png", None),
               spec="pred_kd.png", rough="pred_ks.png",
               alpha="pred_ks.png", relit="rgba_{env}.png",
               alpha_invert=True),
    "neilf": dict(rgb="pred_rgb.png", albedo="pred_albedo.png",
                  albedo_spec=None, kd_scale=("pred_albedo.png", None),
                  spec="pred_albedo.png", rough="pred_rough.png",
                  alpha="pred_albedo.png", relit=None, alpha_invert=True),
    "pil": dict(rgb="fine_rgb.png", albedo="fine_diffuse.png",
                albedo_spec="fine_specular.png",
                kd_scale=("fine_diffuse.png", "fine_specular.png"),
                spec="fine_specular.png", rough="fine_roughness.png",
                alpha="fine_acc_alpha.png", relit=None, srgb_pred=True),
    "nero": dict(rgb="rgb_pr.jpg", albedo="albedo.jpg",
                 albedo_spec=None, kd_scale=("albedo.jpg", None),
                 spec="albedo.jpg", rough="roughness.jpg",
                 alpha="depth.npy", relit=None),
}


def _l2s(x):
    return np.asarray(_l2s_jnp(np.clip(np.asarray(x, np.float32), 0, 1)))


def _read3(path):
    img = vio.load_img_f32(path)
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    elif img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)
    return img[..., :3]


def _resize_to(img, new_h, new_w):
    if img.shape[0] != new_h:
        img = vio.resize(img, new_h=new_h, new_w=new_w)
    return img


def _align(img, raw_mask, alpha_strict):
    """White-bg alignment blending (metric_eval.py alpha_blend)."""
    mask = np.where(raw_mask > alpha_strict, 1.0, 0.0)
    img = np.clip(img * mask + (1.0 - mask), 0, 1)
    return (img * 255).astype(np.uint8)


def _score(metric, key, gt_img, pd_img):
    metric[key]["psnr"].append(metrics.psnr(gt_img, pd_img))
    metric[key]["ssim"].append(metrics.ssim(gt_img, pd_img))
    metric[key]["lpips"].append(metrics.lpips(gt_img, pd_img))


def compute_scene_scales(pd_scene, gt_scene, scene, flags,
                         adapter):
    """Albedo+spec scale matching (compute_rgb_scales)."""
    opt_scale = [[], [], []]
    for view in sorted(os.listdir(pd_scene)):
        if not view.startswith("batch"):
            continue
        gt_dir = join(gt_scene, "val_" + view[-3:])
        kd_path, spec_path = adapter["kd_scale"]
        pd = _read3(join(pd_scene, view, kd_path))
        if spec_path:
            pd = pd + _read3(join(pd_scene, view, spec_path))
        gt = _read3(join(gt_dir, "albedo.png"))
        if scene.split("_")[0] in SPEC_SCENES:
            gt = gt + _read3(join(gt_dir, "metal.png"))
        rgba = vio.load_img_f32(join(gt_dir, "rgba.png"))
        new_h = flags["new_h"]
        new_w = int(new_h * rgba.shape[1] / rgba.shape[0])
        gt = _resize_to(gt, new_h, new_w)
        pd = _resize_to(pd, new_h, new_w)
        rgba = _resize_to(rgba, new_h, new_w)
        alpha = rgba[..., 3]
        pd, gt = _l2s(pd), _l2s(gt)
        for i in range(3):
            p = np.sum(pd[..., i] * alpha) / np.sum(alpha)
            g = np.sum(gt[..., i] * alpha) / np.sum(alpha)
            opt_scale[i].append(g / max(p, 1e-8))
    return np.mean(np.array(opt_scale), axis=-1)


def eval_scene(scene, family, pd_scene, gt_scene, relight_dir=None,
               model_name="ref_nfr", env_lights=None):
    """Per-scene metric dict (metric_eval.process_scene for ref_nfr)."""
    flags = FAMILY_FLAGS[family]
    adapter = MODEL_ADAPTERS[model_name]
    use_scale = flags["use_scale"] and adapter.get("use_scale", True)
    k_to_srgb = flags["k_to_srgb"] and adapter.get("k_to_srgb", True)
    if env_lights is None:
        env_lights = (ENV_LIGHTS_CG if family in ("nerf", "mat")
                      else ENV_LIGHTS_REAL)

    metric = {"rgb": {"psnr": [], "ssim": [], "lpips": []}}
    if flags["with_kd"]:
        metric["kd"] = {"psnr": [], "ssim": [], "lpips": []}
    if flags["with_kskr"]:
        metric["ks"] = {"psnr": [], "ssim": [], "lpips": []}
        metric["rough"] = {"psnr": [], "ssim": [], "lpips": []}
    if flags["with_relight"] and relight_dir:
        metric["env"] = {"psnr": [], "ssim": [], "lpips": []}

    opt_scale = None
    if use_scale and flags["with_kd"]:
        opt_scale = compute_scene_scales(
            pd_scene, gt_scene, scene, flags, adapter)

    for view in sorted(os.listdir(pd_scene)):
        if not view.startswith("batch"):
            continue
        pd_dir = join(pd_scene, view)
        gt_dir = join(gt_scene, "val_" + view[-3:])
        rgba = vio.load_img_f32(join(gt_dir, "rgba.png"))
        new_h = flags["new_h"]
        new_w = int(new_h * rgba.shape[1] / rgba.shape[0])
        rgba = _resize_to(rgba, new_h, new_w)
        raw_mask = rgba[..., 3:]
        thres = 0.1 if family in ("nerf", "mat") else 0.95
        gt_mask = np.where(raw_mask > thres, 1.0, 0.0)
        pd_alpha = _read3(join(pd_dir, adapter["alpha"])) \
            if adapter["alpha"].endswith(".png") else None
        if pd_alpha is not None:
            pd_alpha = _resize_to(pd_alpha, new_h, new_w)
            pd_mask = np.where(
                np.mean(pd_alpha, axis=-1, keepdims=True) > 0, 1.0, 0.0)
        else:
            pd_mask = gt_mask
        strict = flags["alpha_strict"]

        # RGB
        pd = _resize_to(_read3(join(pd_dir, adapter["rgb"])), new_h, new_w)
        pd = np.clip(pd * pd_mask + (1 - pd_mask), 0, 1)
        gt = np.clip(rgba[..., :3] * gt_mask + (1 - gt_mask), 0, 1)
        _score(metric, "rgb", _align(gt, raw_mask, strict),
               _align(pd, raw_mask, strict))

        # kd
        if flags["with_kd"]:
            pd = _resize_to(
                _read3(join(pd_dir, adapter["albedo"])), new_h, new_w)
            if adapter["albedo_spec"]:
                pd = pd + _resize_to(
                    _read3(join(pd_dir, adapter["albedo_spec"])),
                    new_h, new_w)
            gt = _read3(join(gt_dir, "albedo.png"))
            if scene.split("_")[0] in SPEC_SCENES:
                gt = gt + _read3(join(gt_dir, "metal.png"))
            gt = _resize_to(gt, new_h, new_w)
            gt = _l2s(gt)
            if k_to_srgb:
                pd = _l2s(pd)
            if opt_scale is not None:
                pd = pd * opt_scale[None, None, :]
            pd = np.clip(pd * pd_mask + (1 - pd_mask), 0, 1)
            gt = np.clip(gt * gt_mask + (1 - gt_mask), 0, 1)
            _score(metric, "kd", _align(gt, raw_mask, strict),
                   _align(pd, raw_mask, strict))

        # ks + rough
        if flags["with_kskr"]:
            pd = _resize_to(
                _read3(join(pd_dir, adapter["spec"])), new_h, new_w)
            gt = _read3(join(gt_dir, "metal.png")) \
                if scene.split("_")[0] in SPEC_SCENES else np.zeros_like(pd)
            gt = _resize_to(gt, new_h, new_w)
            gt = _l2s(gt)
            if k_to_srgb:
                pd = _l2s(pd)
            if opt_scale is not None:
                pd = pd * opt_scale[None, None, :]
            pd = np.clip(pd * pd_mask + (1 - pd_mask), 0, 1)
            gt = np.clip(gt * gt_mask + (1 - gt_mask), 0, 1)
            _score(metric, "ks", _align(gt, raw_mask, strict),
                   _align(pd, raw_mask, strict))

            pd = _resize_to(
                _read3(join(pd_dir, adapter["rough"])), new_h, new_w)
            gt = _resize_to(
                _read3(join(gt_dir, "rough.png")), new_h, new_w)
            pd = np.clip(pd * pd_mask, 0, 1)  # black bg for rough
            gt = np.clip(gt * gt_mask, 0, 1)
            _score(metric, "rough", _align(gt, raw_mask, strict),
                   _align(pd, raw_mask, strict))

        # Relighting
        if flags["with_relight"] and relight_dir:
            for env in env_lights:
                pd_path = join(relight_dir, view,
                               adapter["relit"].format(env=env))
                gt_path = join(gt_dir, "rgba_%s.png" % env)
                if not (os.path.exists(pd_path)
                        and os.path.exists(gt_path)):
                    continue
                pd = _resize_to(_read3(pd_path), new_h, new_w)
                pd = np.clip(pd * pd_mask + (1 - pd_mask), 0, 1)
                gt_rgba = _resize_to(
                    vio.load_img_f32(gt_path), new_h, new_w)
                gt = np.clip(
                    gt_rgba[..., :3] * gt_mask + (1 - gt_mask), 0, 1)
                _score(metric, "env", _align(gt, raw_mask, strict),
                       _align(pd, raw_mask, strict))
    return metric


def eval_dataset(scenes, family, pred_root, data_root, out_json=None,
                 model_name="ref_nfr"):
    """Evaluate several scenes and write the per-scene score JSON
    (metric_eval.py main loop)."""
    model_score = {}
    for scene in scenes:
        pd_scene = join(pred_root,
                        "%s_%s" % (scene, model_name), "lr5e-4",
                        "pd_test", "ckpt-5")
        if not os.path.isdir(pd_scene):
            # our layout: latest instead of ckpt-5
            base = join(pred_root, "%s_%s" % (scene, model_name),
                        "lr5e-4", "pd_test")
            subs = sorted(os.listdir(base)) if os.path.isdir(base) else []
            pd_scene = join(base, subs[-1]) if subs else pd_scene
        relight_dir = pd_scene.replace("pd_test", "pd_relit")
        model_score[scene] = eval_scene(
            scene, family, pd_scene, join(data_root, scene),
            relight_dir=relight_dir, model_name=model_name)
    if out_json:
        os.makedirs(os.path.dirname(out_json) or ".", exist_ok=True)
        with open(out_json, "w") as f:
            json.dump(model_score, f)
    return model_score
