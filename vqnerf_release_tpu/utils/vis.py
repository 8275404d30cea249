"""Per-view output writers — the reference's model.vis_batch
(vq_nfr.py:988-1133, nfr_unit.py:450-617) rebuilt as a standalone function.

Writes, per view directory:
  * pred_rgb.png / gt_rgb.png — alpha-blended onto white/black
  * pred_{albedo,spec,rough,ks,basecolor}.{png,npy} — raw maps
  * pred_normal.png — (n+1)/2, blended
  * pred_rgb_probes_<name>.png, pred_rgb_olat_<name>.png — relit renders
  * embed_map.png — 18-color segmentation map (vq_nfr.py:1139-1150)
  * metadata.json — id (+ psnr vs gt when available)
"""

import os
from os.path import join

import numpy as np

from ..data import io as vio
from ..eval.metrics import psnr as psnr_fn
from ..eval.metrics import psnr_luma as psnr_luma_fn

__all__ = ["EMBED_COLORS", "vis_embed_map", "vis_view", "make_anim",
           "make_frame"]


def make_anim(frames, outpath, duration=1000):
    """Animated PNG flipbook (xiuminglib vis/anim.py make_anim): the
    pred-vs-gt .apng comparisons of the validation writers."""
    from PIL import Image
    imgs = [Image.fromarray(np.asarray(f)) for f in frames]
    os.makedirs(os.path.dirname(str(outpath)) or ".", exist_ok=True)
    imgs[0].save(str(outpath), save_all=True, append_images=imgs[1:],
                 duration=duration, loop=0, default_image=False)
    return str(outpath)

EMBED_COLORS = np.array([
    [255, 0, 0], [0, 255, 0], [0, 0, 255],
    [255, 255, 0], [255, 0, 255], [0, 255, 255],
    [128, 0, 0], [0, 128, 0], [0, 0, 128],
    [128, 128, 0], [128, 0, 128], [0, 128, 128],
    [255, 128, 128], [128, 255, 128], [128, 128, 255],
    [255, 255, 128], [255, 128, 255], [128, 255, 255],
], np.uint8)


def vis_embed_map(embed, outpath):
    """embed: [H, W] int ids (0 = background, 1..18 = codes)."""
    embed = np.asarray(embed)
    out = np.zeros(embed.shape + (3,), np.uint8)
    for i in range(1, 19):
        out[embed == i] = EMBED_COLORS[i - 1]
    import cv2
    os.makedirs(os.path.dirname(str(outpath)) or ".", exist_ok=True)
    cv2.imwrite(str(outpath), out[..., ::-1])
    return out


def _blend(v, alpha, white_bg):
    bg = np.ones_like(v) if white_bg else np.zeros_like(v)
    return vio.alpha_blend(v, alpha, bg)


def vis_view(to_vis, hw, outdir, view_id, white_bg=True, mode="test",
             probe_names=None, olat_names=None, alpha_thres=0.8):
    """to_vis: dict of [N, ...] ray arrays keyed pred_*/gt_* (the model
    outputs). Returns the img dict (uint8) for downstream metric use."""
    h, w = hw
    os.makedirs(outdir, exist_ok=True)
    data = {}
    for k, v in to_vis.items():
        v = np.asarray(v)
        if k.endswith(("rgb_olat", "rgb_probes")):
            data[k] = v.reshape(h, w, v.shape[1], 3)
        elif v.ndim == 2 and v.shape[1] == 3:
            data[k] = v.reshape(h, w, 3)
        elif v.ndim == 1 or v.shape[-1] == 1:
            data[k] = v.reshape(h, w)
        else:
            data[k] = v.reshape((h, w) + v.shape[1:])

    alpha = np.array(data.get("gt_alpha", data.get("pred_alpha")))
    alpha[alpha < alpha_thres] = 0  # stricter compositing (vq_nfr.py:1041)

    img_dict = {}
    for k, v in data.items():
        if k == "pred_rgb_probes" and probe_names is not None:
            for i, name in enumerate(probe_names):
                img = _blend(v[:, :, i], alpha, white_bg)
                img_dict[k + "_" + name] = vio.write_img(
                    img, join(outdir, f"{k}_{name}.png"))
        elif k == "pred_rgb_olat" and olat_names is not None:
            for i, name in enumerate(olat_names):
                img = _blend(v[:, :, i], alpha, white_bg)
                img_dict[k + "_" + name] = vio.write_img(
                    img, join(outdir, f"{k}_{name}.png"))
        elif k.endswith("rgb"):
            img = _blend(v, alpha, white_bg)
            img_dict[k] = vio.write_img(img, join(outdir, k + ".png"))
        elif k.endswith(("albedo", "spec", "rough", "ks", "basecolor")):
            np.save(join(outdir, k + ".npy"), v)
            img_dict[k] = vio.write_img(v, join(outdir, k + ".png"))
        elif k.endswith("normal"):
            img = _blend((v + 1.0) / 2.0, alpha, white_bg)
            img_dict[k] = vio.write_img(img, join(outdir, k + ".png"))
        elif k.endswith("embed"):
            # raw int map alongside the palette PNG: pixel-click segment
            # selection (edit_web / ui4.py auto_select) needs the ids
            np.save(join(outdir, k + ".npy"),
                    np.asarray(v).astype(np.int16))
            img_dict[k] = vis_embed_map(v, join(outdir, "embed_map.png"))
        elif k.endswith(("rgb_diff", "rgb_spec")):
            np.save(join(outdir, k + ".npy"), v)
            img = _blend(v, alpha, white_bg)
            img_dict[k] = vio.write_img(img, join(outdir, k + ".png"))
        elif k.endswith("xyz"):
            np.save(join(outdir, k + ".npy"), v)
        elif k.endswith(("alpha",)):
            img_dict[k] = vio.write_img(v, join(outdir, k + ".png"))
        elif k.endswith("lvis"):
            mean = np.mean(v, axis=2)
            img = _blend(mean, alpha, white_bg)
            img_dict[k] = vio.write_img(img, join(outdir, k + ".png"))

    metadata = {"id": str(view_id)}
    if mode not in ("test", "render") and "gt_rgb" in img_dict \
            and "pred_rgb" in img_dict:
        metadata["psnr"] = psnr_fn(img_dict["gt_rgb"], img_dict["pred_rgb"])
        metadata["psnr_luma"] = psnr_luma_fn(
            img_dict["gt_rgb"], img_dict["pred_rgb"])
        # pred-vs-gt flipbook (nfr_unit vis_batch writes .apng comparisons)
        make_anim([img_dict["gt_rgb"], img_dict["pred_rgb"]],
                  join(outdir, "pred-vs-gt_rgb.apng"))
    vio.write_json(metadata, join(outdir, "metadata.json"))
    return img_dict


def make_frame(batch_dir, layout, rgb_embed_light=None, pad=2):
    """Compose one video frame from a batch dir's buffer PNGs arranged in a
    (rows x cols) layout of buffer names (util/vis.py make_frame): cells
    name files '<name>.png' or 'pred_<name>.png'; 'nn' leaves a blank cell;
    the tonemapped light thumbnail is embedded into the rgb cell corner.
    Returns an HxWx3 uint8 frame or None if every cell is missing."""
    import cv2
    cells = []
    size = None
    found_any = False
    for row in layout:
        r = []
        for name in row:
            img = None
            if name != "nn":
                for cand in (name + ".png", "pred_" + name + ".png"):
                    path = os.path.join(batch_dir, cand)
                    if os.path.exists(path):
                        img = cv2.imread(path)[..., ::-1]
                        break
            if img is not None:
                found_any = True
                size = img.shape[:2]
            r.append((name, img))
        cells.append(r)
    if not found_any:
        return None
    h, w = size
    rows_img = []
    for r in cells:
        row_imgs = []
        for name, img in r:
            if img is None:
                img = np.zeros((h, w, 3), np.uint8)
            elif img.shape[:2] != (h, w):
                img = cv2.resize(img, (w, h))
            if name.startswith("rgb") and rgb_embed_light is not None:
                light = np.asarray(rgb_embed_light)
                lh, lw = light.shape[:2]
                if lh < h and lw < w:
                    img = img.copy()
                    img[-lh:, :lw] = light[..., :3]
            row_imgs.append(img)
            row_imgs.append(np.full((h, pad, 3), 255, np.uint8))
        rows_img.append(np.concatenate(row_imgs[:-1], axis=1))
        rows_img.append(
            np.full((pad, rows_img[-1].shape[1], 3), 255, np.uint8))
    return np.concatenate(rows_img[:-1], axis=0)
