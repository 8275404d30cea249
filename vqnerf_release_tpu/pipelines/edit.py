"""Material-editing server and headless edit API.

Parity target: decomp/nerfvq_nfr3/nerfactor/edit.py:180-236 — poll
<root>/status/status.json; on status=='uploaded' read
edited/dst.json (material: diff/spec/rough lists, negative = keep),
edited/illum.json ({'env': 'original' | probe name}), and per-view mask
npys edited/batch%09d.npy; re-render through fast_render with the edit and
write pd_edited/batch%09d/, flipping status uploaded -> running ->
finished. (ui4.py's PyQt client drives this protocol over SCP; the
server-side contract here is identical, so that client or any headless
driver interoperates.)
"""

import json
import os
import time
from os.path import join

import jax.numpy as jnp
import numpy as np

from ..data import io as vio
from ..models import decomp_common as dc
from ..models.ref_nfr import ref_fast_render
from ..models.vq_nfr import vq_fast_render
from ..utils.vis import vis_view

__all__ = ["apply_edit", "edit_server_loop"]


def _load_edit_mask(path, n_rays):
    m = np.load(path)
    m = np.where(m, 1.0, 0.0).astype(np.float32)
    if m.ndim == 3:
        m = m.reshape(-1, m.shape[-1])[:, :1]
    else:
        m = m.reshape(-1, 1)
    assert m.shape[0] == n_rays, (m.shape, n_rays)
    return m


def apply_edit(ref_params, vq_params, cfg: dc.DecompConfig, views,
               edit_material, edit_masks, outroot, dst_env_name=None,
               novel_probes=None, probe_names=None, opt_scale=None):
    """Headless edit render (one 'uploaded' round of the server loop).

    edit_material: {'diff': [3], 'spec': [3], 'rough': [1]}, negative first
    element = keep (edit.py:216-229). edit_masks: list of [N, 1] arrays.
    dst_env_name: None/'original' keeps the train light; else the probe of
    that name relights the edited scene.
    """
    lxyz, lareas = dc.light_constants(cfg)
    dst_env = None
    if dst_env_name not in (None, "original"):
        idx = probe_names.index(dst_env_name)
        dst_env = jnp.asarray(novel_probes[idx])

    outs = []
    for i, view in enumerate(views):
        b = {k: jnp.asarray(v) for k, v in view.as_batch().items()}
        em = jnp.asarray(edit_masks[i])
        outdir = join(outroot, "batch%09d" % i)
        if dst_env is None:
            pred_ref = ref_fast_render(
                ref_params, b, cfg, lxyz, lareas, opt_scale=opt_scale,
                edit_mask=em, edit_material=edit_material)
            vis_view({"pred_rgb": pred_ref["rgb"],
                      "gt_alpha": b["alpha"],
                      "pred_alpha": pred_ref["alpha"]},
                     (view.h, view.w), outdir, view.id,
                     white_bg=cfg.white_bg, mode="test")
            b_vq = {k: x for k, x in b.items() if k != "ref"}
            pred_vq = vq_fast_render(
                vq_params, b_vq, cfg, lxyz, lareas, opt_scale=opt_scale,
                edit_mask=em, edit_material=edit_material)
            vis_view({"pred_" + k: x for k, x in pred_vq.items()
                      if k != "rgb"},
                     (view.h, view.w), outdir, view.id,
                     white_bg=cfg.white_bg, mode="test")
        else:
            b_vq = {k: x for k, x in b.items() if k != "ref"}
            pred_vq = vq_fast_render(
                vq_params, b_vq, cfg, lxyz, lareas, opt_scale=opt_scale,
                edit_mask=em, edit_material=edit_material,
                dst_env=dst_env)
            vis_view({"pred_" + k: x for k, x in pred_vq.items()},
                     (view.h, view.w), outdir, view.id,
                     white_bg=cfg.white_bg, mode="test")
        outs.append(outdir)
    return outs


def edit_server_loop(ref_params, vq_params, cfg, views, root,
                     novel_probes=None, probe_names=None, opt_scale=None,
                     poll_interval=1.0, max_rounds=None):
    """The status-file polling server (edit.py:180-236)."""
    status_path = join(root, "status", "status.json")
    update_dir = join(root, "edited")
    outroot = join(root, "pd_edited")
    rounds = 0
    while max_rounds is None or rounds < max_rounds:
        time.sleep(poll_interval)
        if not os.path.exists(status_path):
            continue
        with open(status_path) as f:
            status = json.load(f)
        if status.get("status") != "uploaded":
            continue
        status["status"] = "running"
        vio.write_json(status, status_path)

        with open(join(update_dir, "dst.json")) as f:
            dst = json.load(f)
        with open(join(update_dir, "illum.json")) as f:
            illum = json.load(f)

        masks = [
            _load_edit_mask(
                join(update_dir, "batch%09d.npy" % i), v.h * v.w)
            for i, v in enumerate(views)
        ]
        apply_edit(ref_params, vq_params, cfg, views, dst, masks,
                   outroot, dst_env_name=illum.get("env"),
                   novel_probes=novel_probes, probe_names=probe_names,
                   opt_scale=opt_scale)

        status["status"] = "finished"
        vio.write_json(status, status_path)
        rounds += 1
    return rounds
