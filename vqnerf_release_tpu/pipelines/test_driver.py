"""4-phase decomposition inference driver.

Parity target: decomp/nerfvq_nfr3/nerfactor/test.py:129-302:
  PASS 1 raw_test: ref_nfr.fast_render (residual recon) + vq_nfr BRDF maps
  PASS 2 pd_test:  albedo-scale-corrected decomposition (compute_rgb_scales
                   against GT albedo(+metal) for CG scenes, test.py:52-120)
  PASS 3 pd_relit: 16 light probes + 4 OLATs, scale-corrected
  PASS 4 pd_vq:    segmentation maps with the main_<k>-pruned codebook
                   (find_vq, test.py:285-289)

Outputs land in <outroot>/{raw_test,pd_test,pd_relit,pd_vq}/batch%09d/
exactly as the reference writes them, so metric_eval/cluster_eval
interoperate.
"""

import os
import re
from os.path import basename, join

import jax.numpy as jnp
import numpy as np

from ..data import io as vio
from ..models import decomp_common as dc
from ..models.ref_nfr import ref_fast_render
from ..models.vq_nfr import vq_fast_embed, vq_fast_render
from ..ops.colorspace import linear2srgb
from ..train.loop import _forward_chunked

# Ray-chunk size for the full-view fast renders: the reference's
# brdf_chunk operating point (models/vq_nfr.py:62-63, 50,000 rays) —
# a full 512px view with 16 probes + 4 OLATs OOMed the v5e in one call
# (r5 showcase); per-ray pointwise renders chunk exactly.
_RAY_CHUNK = 49152
from ..ops.light import olat_envmaps
from ..utils.vis import vis_view

__all__ = ["load_novel_lights", "find_vq", "compute_rgb_scales",
           "run_test"]

SPEC_SCALE_SCENES = ("drums", "lego", "materials", "chair0", "kitchen6",
                     "machine1")


def load_novel_lights(test_envmap_dir, light_h, olat_inten=200.0,
                      ambient_inten=0.0, white_bg=True):
    """(probe_names, probes [E,L,3], olat_names, olats [O,L,3]) — the
    reference's novel_probes/novel_olat (vq_nfr.py:85-116)."""
    probe_names, probes = [], []
    for path in vio.sortglob(test_envmap_dir, ext=("hdr", "exr")):
        name = basename(path)[: -len(".hdr")]
        envmap = vio.read_envmap(path, new_h=light_h)
        probe_names.append(name)
        probes.append(envmap.reshape(-1, 3))
    olat = olat_envmaps(
        light_h, olat_inten, ambient_inten if white_bg else 0.0)
    olat_names = list(olat.keys())
    olats = np.stack([v.reshape(-1, 3) for v in olat.values()])
    probes_arr = np.stack(probes) if probes else None
    return probe_names, probes_arr, olat_names, olats


def find_vq(vali_epoch_dir):
    """Read the selected code count from the main_<k> dir name
    (test.py:121-126)."""
    for f in os.listdir(vali_epoch_dir):
        m = re.fullmatch(r"main_(\d+)", f)
        if m:
            return int(m.group(1))
    raise FileNotFoundError(f"no main_<k> dir under {vali_epoch_dir}")


def compute_rgb_scales(raw_test_dir, data_root, vis_root=None,
                       scene_name=""):
    """Per-channel albedo scale matching predictions to GT
    (test.py:52-120). Uses all val batches under raw_test_dir; GT albedo
    (+ metal for the listed scenes) lives in the vis_comps mirror of
    data_root."""
    if vis_root is None:
        vis_root = data_root.replace("nfr_blender", "vis_comps")
    opt_scale = [[], [], []]
    batch_dirs = sorted(
        d for d in os.listdir(raw_test_dir) if d.startswith("batch"))
    for bd in batch_dirs:
        batch_dir = join(raw_test_dir, bd)
        view_id = int(bd[-9:])
        view = "val_%03d" % view_id

        pred = vio.load_img_f32(join(batch_dir, "pred_albedo.png"))[..., :3]
        pred_spec = vio.load_img_f32(
            join(batch_dir, "pred_spec.png"))[..., :3]
        pred = pred + pred_spec

        gt = vio.load_img_f32(join(vis_root, view, "albedo.png"))[..., :3]
        if scene_name.split("_")[0] in SPEC_SCALE_SCENES:
            gt_spec = vio.load_img_f32(
                join(vis_root, view, "metal.png"))[..., :3]
            gt = gt + gt_spec
        if gt.shape[0] != pred.shape[0]:
            gt = vio.resize(gt, new_h=pred.shape[0])

        rgba = vio.load_img_f32(join(data_root, view, "rgba.png"))
        if rgba.shape[0] != pred.shape[0]:
            rgba = vio.resize(rgba, new_h=pred.shape[0])
        alpha = rgba[:, :, 3]

        gt = np.asarray(linear2srgb(jnp.asarray(gt)))
        pred = np.asarray(linear2srgb(jnp.asarray(np.clip(pred, 0, 1))))
        for i in range(3):
            pred_inten = np.sum(pred[:, :, i] * alpha) / np.sum(alpha)
            gt_inten = np.sum(gt[:, :, i] * alpha) / np.sum(alpha)
            opt_scale[i].append(gt_inten / max(pred_inten, 1e-8))
    return np.mean(np.array(opt_scale), axis=-1)


def run_test(ref_params, vq_params, cfg: dc.DecompConfig, dataset, outroot,
             test_envmap_dir, vali_epoch_dir=None, data_root=None,
             scene_name="", rng=None):
    """Run all four passes over the test dataset.

    ref_params: trained ref_nfr params ({'frozen','train'}); vq_params:
    trained vq_nfr params; dataset: ShapeDataset(mode='test', with_ref=True
    views also usable for vq via dropping 'ref').
    """
    import jax

    lxyz, lareas = dc.light_constants(cfg)
    probe_names, probes, olat_names, olats = load_novel_lights(
        test_envmap_dir, cfg.light_h, white_bg=cfg.white_bg)
    probes_j = jnp.asarray(probes) if probes is not None else None
    olats_j = jnp.asarray(olats)

    views = [dataset.load_view(f) for f in dataset.files]

    def batches():
        for i, v in enumerate(views):
            b = {k: jnp.asarray(x) for k, x in v.as_batch().items()}
            yield i, v, b

    # ---- PASS 1: raw_test -------------------------------------------------
    raw_dir = join(outroot, "raw_test")
    for i, v, b in batches():
        outdir = join(raw_dir, "batch%09d" % i)
        pred_ref = _forward_chunked(
            lambda bb: ref_fast_render(ref_params, bb, cfg, lxyz,
                                       lareas), b, chunk=_RAY_CHUNK)
        vis_view({"pred_" + k: x for k, x in pred_ref.items()}
                 | {"gt_rgb": b["rgb"], "gt_alpha": b["alpha"]},
                 (v.h, v.w), outdir, v.id, white_bg=cfg.white_bg,
                 mode="test")
        b_vq = {k: x for k, x in b.items() if k != "ref"}
        pred_vq = _forward_chunked(
            lambda bb: vq_fast_render(vq_params, bb, cfg, lxyz, lareas),
            b_vq, chunk=_RAY_CHUNK)
        vis_view({"pred_" + k: x for k, x in pred_vq.items()
                  if k != "rgb"},
                 (v.h, v.w), outdir, v.id, white_bg=cfg.white_bg,
                 mode="test")

    # ---- PASS 2: pd_test (scale-corrected decomposition) ------------------
    if cfg.is_nerf and data_root is not None:
        opt_scale = compute_rgb_scales(
            raw_dir, data_root, scene_name=scene_name)
        opt_scale_j = jnp.asarray(opt_scale, jnp.float32)
    else:
        opt_scale, opt_scale_j = None, None
    pd_dir = join(outroot, "pd_test")
    for i, v, b in batches():
        outdir = join(pd_dir, "batch%09d" % i)
        pred_ref = _forward_chunked(
            lambda bb: ref_fast_render(ref_params, bb, cfg, lxyz,
                                       lareas), b, chunk=_RAY_CHUNK)
        vis_view({"pred_rgb": pred_ref["rgb"], "gt_rgb": b["rgb"],
                  "gt_alpha": b["alpha"], "pred_alpha": pred_ref["alpha"]},
                 (v.h, v.w), outdir, v.id, white_bg=cfg.white_bg,
                 mode="test")
        b_vq = {k: x for k, x in b.items() if k != "ref"}
        # vis_scale=True (test.py:232): render unscaled, emit
        # sRGB-then-scaled decomposition maps
        pred_vq = _forward_chunked(
            lambda bb: vq_fast_render(
                vq_params, bb, cfg, lxyz, lareas,
                opt_scale=opt_scale_j, vis_scale=True),
            b_vq, chunk=_RAY_CHUNK)
        vis_view({"pred_" + k: x for k, x in pred_vq.items()
                  if k != "rgb"},
                 (v.h, v.w), outdir, v.id, white_bg=cfg.white_bg,
                 mode="test")

    # ---- PASS 3: pd_relit --------------------------------------------------
    relit_dir = join(outroot, "pd_relit")
    for i, v, b in batches():
        outdir = join(relit_dir, "batch%09d" % i)
        b_vq = {k: x for k, x in b.items() if k != "ref"}
        pred = _forward_chunked(
            lambda bb: vq_fast_render(
                vq_params, bb, cfg, lxyz, lareas,
                novel_probes=probes_j, novel_olat=olats_j,
                opt_scale=opt_scale_j),
            b_vq, chunk=_RAY_CHUNK)
        vis_view({"pred_rgb_probes": pred["rgb_probes"],
                  "pred_rgb_olat": pred["rgb_olat"],
                  "gt_alpha": b["alpha"], "pred_alpha": pred["alpha"]},
                 (v.h, v.w), outdir, v.id, white_bg=cfg.white_bg,
                 mode="test", probe_names=probe_names,
                 olat_names=olat_names)

    # ---- PASS 4: pd_vq (segmentation) --------------------------------------
    vq_dir = join(outroot, "pd_vq")
    if vali_epoch_dir is not None:
        n_vq = find_vq(vali_epoch_dir)
    else:
        n_vq = cfg.num_embed
    thres = jnp.asarray(
        np.array([0.0] * n_vq + [1.0] * (cfg.num_embed - n_vq), np.float32))
    for i, v, b in batches():
        outdir = join(vq_dir, "batch%09d" % i)
        b_vq = {k: x for k, x in b.items() if k != "ref"}
        out = _forward_chunked(
            lambda bb: vq_fast_embed(
                vq_params, bb, cfg, thres=thres,
                rng=jax.random.PRNGKey(0) if rng is None else rng),
            b_vq, chunk=_RAY_CHUNK)
        vis_view({"pred_embed": out["embed"], "gt_alpha": b["alpha"],
                  "pred_alpha": out["alpha"]},
                 (v.h, v.w), outdir, v.id, white_bg=cfg.white_bg,
                 mode="test")
    return {"opt_scale": None if opt_scale is None else list(opt_scale),
            "n_vq": n_vq}
