"""Exercise editing + video rendering on trained smoke artifacts
(post-training integration check; see scripts/smoke_e2e.py)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import os, json, numpy as np, glob
from os.path import join
root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vqnerf_smoke2"
from vqnerf_release_tpu.models import decomp_common as dc
from vqnerf_release_tpu.utils import ckpt as ckpt_util
from vqnerf_release_tpu.data.shape_dataset import ShapeDataset

cfg = dc.DecompConfig(light_h=4, imh=64, num_embed=6, num_drop=4,
    thres_str="0.1;0.2;0.3;0.4", z_dim=64, mlp_width=64,
    n_rays_per_step=512, epochs=24, total_sample_vq=20000)

vq_out = join(root, "out", "sphere_vq_nfr", "lr5e-4")
ref_out = join(root, "out", "sphere_ref_nfr", "lr5e-4")
vq_state = ckpt_util.load_ckpt(ckpt_util.latest_ckpt(vq_out))
ref_state = ckpt_util.load_ckpt(ckpt_util.latest_ckpt(ref_out))
print("ckpts loaded", flush=True)

test_ds = ShapeDataset(join(root,"scene"), join(root,"surf"), imh=64,
                       mode="test", with_ref=True)
views = [test_ds.load_view(f) for f in test_ds.files]

from vqnerf_release_tpu.pipelines.edit_client import submit_edit, auto_select_mask
from vqnerf_release_tpu.pipelines.edit import edit_server_loop
import cv2
edit_root = join(root, "edit")
embed_png = join(ref_out, "vis_test", "latest", "pd_vq", "batch000000000", "embed_map.png")
emb_img = cv2.imread(embed_png)[..., ::-1]
from vqnerf_release_tpu.eval.cluster_eval import img_embed, EMBED_C
ids = img_embed(emb_img.reshape(-1,3), EMBED_C).reshape(64,64)
seg_id = np.bincount(ids.ravel())[1:].argmax()+1
masks = [np.repeat(auto_select_mask(ids, seg_id)[:,:,None], 3, axis=2)
         for _ in views]
submit_edit(edit_root, "gold", masks, env="original")
rounds = edit_server_loop(ref_state["params"], vq_state["params"], cfg, views,
                          edit_root, poll_interval=0.05, max_rounds=1)
print("edit rounds:", rounds,
      "outputs:", sorted(os.listdir(join(edit_root, "pd_edited", "batch000000000"))), flush=True)

from vqnerf_release_tpu.pipelines.gen_video import render_video, compose_video
dirs = render_video("gen_comps", cfg, views, join(root, "video_comps"),
                    ref_params=ref_state["params"], vq_params=vq_state["params"], n_vq=4)
n = compose_video(dirs, "pred_rgb.png", join(root, "recon.avi"), fps=4)
print("video frames:", n, "size:", os.path.getsize(join(root,"recon.avi")))
print("VALIDATION OK")
