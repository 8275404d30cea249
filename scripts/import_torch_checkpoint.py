#!/usr/bin/env python
"""Convert a reference NeuS (stage-1, torch .pth) checkpoint into this
framework's layout.

The reference saves geometry training via torch.save
(geo/NeuS-ours2/nerf_runner.py:221-233); this reads such a checkpoint (a
.pth file, or an experiment dir containing checkpoints/) and writes the
orbax checkpoint our NeuSRunner resumes from, so pretrained reference
geometry can drive buffer extraction (gen-geo) or continued training here.

Example:
  python scripts/import_torch_checkpoint.py \
      --ckpt /ref/exp/lego/.../checkpoints/ckpt_300000.pth \
      --out output/geo/lego_3072 [--scene lego_3072 | --no-bg]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True,
                    help=".pth file or NeuS experiment dir")
    ap.add_argument("--out", required=True,
                    help="output base_exp_dir for NeuSRunner")
    ap.add_argument("--scene", default=None,
                    help="scene name: take the NeuS config from its "
                         "family preset (default: NeuSConfig())")
    ap.add_argument("--no-bg", action="store_true",
                    help="checkpoint trained without the background NeRF")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")  # host-side conversion tool

    from vqnerf_release_tpu.interop.torch_import import import_neus
    from vqnerf_release_tpu.models.neus import NeuSConfig
    from vqnerf_release_tpu.train.neus_trainer import init_neus_opt_state
    from vqnerf_release_tpu.utils import ckpt as ckpt_util

    if args.scene:
        from vqnerf_release_tpu import config as vcfg
        cfg, _, _ = vcfg.neus_configs_for_scene(args.scene)
    else:
        cfg = NeuSConfig()
    if args.no_bg:
        from dataclasses import replace
        cfg = replace(cfg, n_outside=0)

    params, iter_step = import_neus(args.ckpt, cfg)
    state = {"params": params, "opt_state": init_neus_opt_state(params),
             "iter_step": iter_step}
    path = ckpt_util.save_ckpt(args.out, iter_step, state)
    print(json.dumps({"source": args.ckpt, "written": path,
                      "iter_step": iter_step,
                      "has_bg": "bg" in params}))


if __name__ == "__main__":
    main()
