"""Video rendering over test trajectories.

Parity targets:
  * decomp/nerfvq_nfr3/nerfactor/gen_video.py:129-299 — modes: recon /
    relight / edit / vq_dcomps / gen_comps over the video_nfr trajectory
    dataset, reusing fast_render / fast_embed
  * geo/NeuS-ours2/gen_video.py (G9) — per-frame geometry-buffer
    extraction along transforms_test.json (handled by
    GeoExtractor.extract_trajectory below)
  * cv2_render.py (G13) — stitching per-frame PNGs into an .avi with
    alpha-on-white compositing
"""

import glob
import json
import os
from os.path import join

import jax.numpy as jnp
import numpy as np

from ..data import io as vio
from ..models import decomp_common as dc
from ..models.ref_nfr import ref_fast_render
from ..models.vq_nfr import vq_fast_embed, vq_fast_render
from ..utils.vis import vis_view

__all__ = ["render_video", "compose_video", "extract_trajectory"]


def render_video(mode, cfg: dc.DecompConfig, views, outroot,
                 ref_params=None, vq_params=None, n_vq=None,
                 novel_probes=None, probe_names=None, novel_olat=None,
                 olat_names=None, opt_scale=None, edit_material=None,
                 edit_masks=None, dst_env_name=None):
    """Render a trajectory in one of the reference's modes."""
    assert mode in ("recon", "relight", "edit", "vq_dcomps", "gen_comps")
    lxyz, lareas = dc.light_constants(cfg)

    thres = None
    if n_vq is not None:
        thres = jnp.asarray(np.array(
            [0.0] * n_vq + [1.0] * (cfg.num_embed - n_vq), np.float32))

    import jax
    rng = jax.random.PRNGKey(0)
    outdirs = []
    for i, view in enumerate(views):
        b = {k: jnp.asarray(v) for k, v in view.as_batch().items()}
        b_vq = {k: v for k, v in b.items() if k != "ref"}
        outdir = join(outroot, "batch%09d" % i)

        if mode == "recon":
            pred = ref_fast_render(ref_params, b, cfg, lxyz, lareas)
            vis_view({"pred_rgb": pred["rgb"], "gt_alpha": b["alpha"],
                      "pred_alpha": pred["alpha"]},
                     (view.h, view.w), outdir, view.id,
                     white_bg=cfg.white_bg, mode="render")
        elif mode == "relight":
            pred = vq_fast_render(
                vq_params, b_vq, cfg, lxyz, lareas,
                novel_probes=novel_probes, novel_olat=novel_olat,
                opt_scale=opt_scale)
            vis_view({"pred_rgb_probes": pred["rgb_probes"],
                      "gt_alpha": b["alpha"],
                      "pred_alpha": pred["alpha"]},
                     (view.h, view.w), outdir, view.id,
                     white_bg=cfg.white_bg, mode="render",
                     probe_names=probe_names, olat_names=olat_names)
        elif mode == "edit":
            dst_env = None
            if dst_env_name not in (None, "original"):
                dst_env = novel_probes[probe_names.index(dst_env_name)]
            pred = vq_fast_render(
                vq_params, b_vq, cfg, lxyz, lareas, opt_scale=opt_scale,
                edit_mask=jnp.asarray(edit_masks[i]),
                edit_material=edit_material, dst_env=dst_env)
            vis_view({"pred_" + k: v for k, v in pred.items()}
                     | {"gt_alpha": b["alpha"]},
                     (view.h, view.w), outdir, view.id,
                     white_bg=cfg.white_bg, mode="render")
        elif mode == "vq_dcomps":
            pred = vq_fast_render(
                vq_params, b_vq, cfg, lxyz, lareas, gen_embed=True,
                thres=thres, rng=rng)
            vis_view({"pred_" + k: v for k, v in pred.items()}
                     | {"gt_alpha": b["alpha"]},
                     (view.h, view.w), outdir, view.id,
                     white_bg=cfg.white_bg, mode="render")
        elif mode == "gen_comps":
            pred = ref_fast_render(ref_params, b, cfg, lxyz, lareas)
            vis_view({"pred_rgb": pred["rgb"], "gt_alpha": b["alpha"],
                      "pred_alpha": pred["alpha"]},
                     (view.h, view.w), outdir, view.id,
                     white_bg=cfg.white_bg, mode="render")
            emb = vq_fast_embed(vq_params, b_vq, cfg, thres=thres, rng=rng)
            vis_view({"pred_embed": emb["embed"],
                      "gt_alpha": b["alpha"],
                      "pred_alpha": emb["alpha"]},
                     (view.h, view.w), outdir, view.id,
                     white_bg=cfg.white_bg, mode="render")
        outdirs.append(outdir)
    return outdirs


def compose_video(frame_dirs, img_name, out_path, fps=24,
                  alpha_name=None, white_bg=True):
    """Stitch per-frame PNGs into a video (cv2_render.py): optionally
    composite onto white via the alpha frame."""
    import cv2
    frames = []
    for d in frame_dirs:
        img_path = join(d, img_name)
        if not os.path.exists(img_path):
            continue
        img = vio.load_img_f32(img_path)[..., :3]
        if alpha_name is not None:
            ap = join(d, alpha_name)
            if os.path.exists(ap):
                a = vio.load_img_f32(ap)
                if a.ndim == 3:
                    a = a[..., 0]
                bg = np.ones_like(img) if white_bg else np.zeros_like(img)
                img = vio.alpha_blend(img, a, bg)
        frames.append((np.clip(img, 0, 1) * 255).astype(np.uint8))
    if not frames:
        raise FileNotFoundError(f"no {img_name} frames in {frame_dirs}")
    h, w = frames[0].shape[:2]
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    writer = cv2.VideoWriter(
        str(out_path), cv2.VideoWriter_fourcc(*"MJPG"), fps, (w, h))
    for fimg in frames:
        writer.write(fimg[..., ::-1])
    writer.release()
    return len(frames)


def extract_trajectory(extractor, traj_dataset, out_root, no_vis=False,
                       resume=True):
    """Stage-1 video-geometry extraction (geo gen_video.py:120-180):
    render geometry buffers for every trajectory frame into
    <out_root>/test_NNN/ with per-frame metadata.json."""
    from .gen_geo import check_finished
    done = []
    for idx in range(traj_dataset.n_images):
        view_dir = join(out_root, "test_%03d" % idx)
        if resume and check_finished(view_dir, with_lvis=not no_vis):
            done.append(view_dir)
            continue
        surf, normal, mask = extractor.compute_geo(
            idx, view_dir, alpha_thres=0.5)
        if not no_vis:
            extractor.compute_vis(view_dir, surf, normal, mask)
        meta = traj_dataset.frame_metadata(idx) \
            if hasattr(traj_dataset, "frame_metadata") else {}
        vio.write_json(meta, join(view_dir, "metadata.json"))
        done.append(view_dir)
    return done
