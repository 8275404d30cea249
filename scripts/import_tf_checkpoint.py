#!/usr/bin/env python
"""Convert a reference TensorFlow checkpoint into this framework's layout.

The reference trains with tf.train.Checkpoint/CheckpointManager
(decomp/nerfvq_nfr3/nerfactor/trainvali.py:157-174); this tool reads such a
checkpoint (a ckpt-N prefix, or a directory containing `checkpoints/`) and
writes an equivalent orbax checkpoint in the structure our training loops
and drivers expect, so pretrained reference weights can be used directly
for testing/relighting/editing or resumed training.

Examples:
  # vq_nfr: also writes vis_vali/np_light.npy (+ optional main_<k> marker)
  python scripts/import_tf_checkpoint.py --phase vq_nfr \
      --ckpt /path/to/train/lego_vq_nfr --out out/train/lego_vq/lego_vq_nfr \
      --main-k 5

  # ref_nfr needs the vq checkpoint too (its frozen nets are not saved by
  # the reference ref phase; see interop/tf_import.py docstring)
  python scripts/import_tf_checkpoint.py --phase ref_nfr \
      --ckpt .../lego_ref_nfr --vq-ckpt .../lego_vq_nfr --out .../ref_out
"""

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--phase", required=True,
                    choices=["nfr_unit", "vq_nfr", "ref_nfr"])
    ap.add_argument("--ckpt", required=True,
                    help="TF ckpt prefix or directory")
    ap.add_argument("--vq-ckpt", default=None,
                    help="vq_nfr TF ckpt (required for --phase ref_nfr)")
    ap.add_argument("--out", required=True, help="output train dir")
    ap.add_argument("--data-type", default=None,
                    choices=["nerf", "dtu", "hw"],
                    help="override the inferred data type (dtu and hw are "
                         "indistinguishable from checkpoint contents)")
    ap.add_argument("--epoch", type=int, default=None,
                    help="epoch number for the written checkpoint "
                         "(default: the reference ckpt-N counter)")
    ap.add_argument("--main-k", type=int, default=None,
                    help="vq_nfr only: also create vis_vali/epoch<N>/"
                         "main_<k> so the test driver can prune codes")
    args = ap.parse_args()

    # Host-side conversion tool: never needs an accelerator, and a CPU
    # backend keeps the written checkpoint free of device-specific sharding
    # metadata. (Under the axon tunnel JAX_PLATFORMS=cpu in the env is
    # ignored, so set it via config before backend init.)
    import jax
    jax.config.update("jax_platforms", "cpu")

    from vqnerf_release_tpu.interop import tf_import as ti
    from vqnerf_release_tpu.utils import ckpt as ckpt_util
    import numpy as np

    _, prefix = ti._reader(args.ckpt)
    if args.epoch is not None:
        epoch = args.epoch
    else:
        m = re.search(r"-(\d+)$", os.path.basename(prefix))
        epoch = int(m.group(1)) if m else 1

    ema = None
    if args.phase == "nfr_unit":
        cfg = (ti.infer_decomp_config(args.ckpt, "nfr_unit", args.data_type)
               if args.data_type else None)
        params, cfg = ti.import_nfr_unit(args.ckpt, cfg)
    elif args.phase == "vq_nfr":
        cfg = (ti.infer_decomp_config(args.ckpt, "vq_nfr", args.data_type)
               if args.data_type else None)
        params, ema, cfg = ti.import_vq_nfr(args.ckpt, cfg)
    else:
        if not args.vq_ckpt:
            ap.error("--phase ref_nfr requires --vq-ckpt")
        params, cfg = ti.import_ref_nfr(args.ckpt, args.vq_ckpt)
        if args.data_type:
            from dataclasses import replace
            cfg = replace(cfg, data_type=args.data_type)

    state = ti.as_train_state(args.phase, cfg, params, ema_state=ema,
                              epoch=epoch)
    path = ckpt_util.save_ckpt(args.out, epoch, state)

    if args.phase == "vq_nfr":
        vali = os.path.join(args.out, "vis_vali")
        os.makedirs(vali, exist_ok=True)
        np.save(os.path.join(vali, "np_light.npy"),
                np.asarray(params["light"]))
        if args.main_k is not None:
            os.makedirs(os.path.join(vali, "epoch%09d" % epoch,
                                     "main_%d" % args.main_k),
                        exist_ok=True)

    print(json.dumps({
        "phase": args.phase, "source": prefix, "written": path,
        "epoch": epoch,
        "config": {"data_type": cfg.data_type, "light_h": cfg.light_h,
                   "mlp_width": cfg.mlp_width, "z_dim": cfg.z_dim,
                   "num_embed": cfg.num_embed},
    }))


if __name__ == "__main__":
    main()
