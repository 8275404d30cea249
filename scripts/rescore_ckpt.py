"""Re-score a saved stage-1 checkpoint under any render sampler.

Guardrail cells trained with `--save-ckpt` keep their final NeuS state
(smoke_e2e.py), so quality questions that only concern RENDERING — e.g.
"what would this trained SDF score under the production parity sampler,
averaged over every view?" — can be answered post-hoc without repeating
the 40k-iter training. Complements the in-run `val-view PSNR(parity)`
line, which scores train view 0 only.

Usage:
  python scripts/rescore_ckpt.py --root /tmp/r4/guard_parity/torus/occ_248r2g128 \
      [--sampler 64+64r4] [--views val] [--cpu]

--root must contain scene/ (the synthetic scene) and exp/ (with a
checkpoint saved by --save-ckpt). Prints per-view PSNR and the mean,
plus one JSON line for scripting.
"""

import argparse
import json
import os
import sys
from os.path import join

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True,
                    help="guardrail cell dir containing scene/ and exp/")
    ap.add_argument("--sampler", default="64+64r4",
                    help="render sampler, e.g. 64+64r4 (the production "
                    "parity config) or 24+8r2")
    ap.add_argument("--views", default="val", choices=["val", "train"])
    ap.add_argument("--step", type=int, default=0,
                    help="score the checkpoint saved at this iter "
                    "(cells trained with --geo-save-freq keep the whole "
                    "trajectory); 0 = latest")
    ap.add_argument("--cpu", action="store_true",
                    help="render on host CPU (leave the TPU tunnel free)")
    ap.add_argument("--out-json", default=None)
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_enable_async_dispatch", False)  # 1-core rendezvous guard (conftest.py)

    import numpy as np

    from vqnerf_release_tpu.data.neus_dataset import NerfSceneDataset
    from vqnerf_release_tpu.eval.metrics import psnr
    from vqnerf_release_tpu.models.neus import NeuSConfig
    from vqnerf_release_tpu.train.neus_loop import NeuSRunner
    from vqnerf_release_tpu.train.neus_trainer import NeuSTrainConfig

    from vqnerf_release_tpu.config import parse_sampler_spec
    cfg = NeuSConfig(**parse_sampler_spec(args.sampler,
                                          what="--sampler"))

    scene = join(args.root, "scene")
    ds = NerfSceneDataset(scene, is_train=(args.views == "train"),
                          near=1.2, far=3.5)
    tcfg = NeuSTrainConfig(use_white_bkgd=True)
    runner = NeuSRunner(cfg, tcfg, ds, join(args.root, "exp"), seed=0)
    if args.step:
        from vqnerf_release_tpu.utils import ckpt as ckpt_util
        path = join(args.root, "exp", "checkpoints",
                    "ckpt-%d" % args.step)
        state = ckpt_util.load_ckpt(path, {
            "params": runner.params, "opt_state": runner.opt_state,
            "iter_step": 0})
        runner.params = state["params"]
        runner.iter_step = int(state["iter_step"])
        step = runner.iter_step
    else:
        step = runner.try_resume()
    if step == 0:
        raise SystemExit(f"no checkpoint under {args.root}/exp — "
                         "train the cell with --save-ckpt first")

    per_view = []
    for idx in range(ds.n_images):
        img, _ = runner.validate_image(idx, tag=f"_rescore{idx}")
        p = psnr((np.clip(img, 0, 1) * 255).astype(np.uint8),
                 (ds.images[idx] * 255).astype(np.uint8))
        per_view.append(p)
        print(f"view {idx}: {p:.2f} dB", flush=True)
    result = {"root": args.root, "sampler": args.sampler,
              "views": args.views, "iter_step": step,
              "per_view": [round(p, 3) for p in per_view],
              "mean_psnr": round(float(np.mean(per_view)), 3)}
    print(f"mean over {len(per_view)} {args.views} views: "
          f"{result['mean_psnr']:.2f} dB")
    print(json.dumps(result))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
