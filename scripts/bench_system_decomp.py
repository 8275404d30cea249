"""System-level decomp training throughput: the REAL train_vq_nfr loop
(host sampling, batch staging, jitted steps, EMA codebook, epoch log
sync) timed end-to-end at the production step shape, host-gather vs
device-resident data paths.

The compute bench (bench.py) times the bare step inside one lax.scan;
this script answers the system question the r2 geo measurement answered
for stage 1: does the full epoch loop — including the per-step
host->device batch (~4.3 MB with a 512-light lvis, ~300 ms through the
axon tunnel at 14 MB/s) — keep the chip busy? The device_views path
(data/device_store.py) stages views once and ships 8 KB of ray indices
per step instead.

Run on TPU:  python scripts/bench_system_decomp.py
"""

import argparse
import json
import os
import shutil
import sys
import time
from os.path import join

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def synth_views(n_views, imh, n_lights, seed=0):
    """Production-shaped ShapeViews with random but well-conditioned
    content (throughput does not depend on the pixel values)."""
    from vqnerf_release_tpu.data.shape_dataset import ShapeView
    views = []
    for v in range(n_views):
        rs = np.random.RandomState(seed + v)
        n = imh * imh
        normal = rs.randn(n, 3).astype(np.float32)
        normal /= np.linalg.norm(normal, axis=1, keepdims=True)
        alpha = np.zeros((imh, imh), np.float32)
        alpha[2:-2, 2:-2] = 1.0  # big interior fg region
        views.append(ShapeView(
            id="train_%03d" % v, h=imh, w=imh,
            rayo=np.tile(np.array([[0, 0, 3.0]], np.float32), (n, 1)),
            rayd=normal.copy(),
            rgb=rs.rand(n, 3).astype(np.float32),
            alpha=alpha.reshape(n, 1),
            pred_alpha=alpha.reshape(n, 1).copy(),
            xyz=(rs.rand(n, 3).astype(np.float32) - 0.5),
            normal=normal,
            lvis=rs.rand(n, n_lights).astype(np.float32),
        ))
    return views


def run_mode(mode, views, args, root):
    from vqnerf_release_tpu.models import decomp_common as dc
    from vqnerf_release_tpu.models.nfr_unit import init_nfr_unit
    from vqnerf_release_tpu.train import loop

    # off = host-gather path; on = resident views, per-step gather;
    # scan = resident views + one lax.scan dispatch per epoch;
    # chunk = scan dispatching --chunk epochs at a time;
    # u8 = scan with uint8-quantized lvis (~4x smaller store);
    # shard = scan with the store row-sharded over the mesh
    dv, scan = {"off": ("off", False), "on": ("on", False),
                "scan": ("on", True), "chunk": ("on", True),
                "u8": ("u8", True), "shard": ("shard", True)}[mode]
    # production step shape (DecompConfig defaults: z 256, 15 codes,
    # 512 lights, 1024 jitter pairs); epochs < 30 so cfg.epochs keeps
    # the 30-epoch vali period out of the timed window
    cfg = dc.DecompConfig(
        light_h=args.light_h, imh=args.imh,
        total_sample_vq=2000, device_views=dv, epoch_scan=scan,
        epoch_scan_chunk=args.chunk if mode == "chunk" else 1,
        # mirror loop._resolve_device_sampling's fallback (sharded
        # stores keep the host stream) so the reported flag labels what
        # actually ran, not what was requested
        device_sampling=bool(getattr(args, "device_sampling", False)
                             and scan and dv != "shard"))
    nfr_params = init_nfr_unit(0, cfg)
    out = join(root, mode)
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    loop.train_vq_nfr(cfg, nfr_params, views, [], out,
                      epochs=args.epochs, resume=False)
    total = time.time() - t0
    logs = [json.loads(l) for l in open(join(out, "train_log.jsonl"))]
    # epoch 1 pays compile + store staging; the last epoch pays the
    # final ckpt+vq_test sweep — time the steady middle. For chunked
    # dispatches the whole FIRST chunk shares the compile wall, and a
    # trailing REMAINDER chunk (epochs % chunk != 0) recompiles for its
    # new scan length — production runs (150 epochs, period 30, chunk
    # dividing the period) never hit one, so exclude it from steady too
    is_steady = True
    if mode == "chunk":
        full_end = (args.epochs // args.chunk) * args.chunk
        steady = [l["wall_s"] for l in logs[args.chunk:full_end]]
        steady = steady[:-1] if full_end == args.epochs else steady
        if not steady:  # epochs < 2*chunk: no post-compile full chunk
            print(f"[chunk] epochs={args.epochs} < 2*chunk="
                  f"{2 * args.chunk}: steady window empty, falling back "
                  "to all post-first-chunk epochs (compile-polluted)")
            steady = [l["wall_s"] for l in logs[args.chunk:-1]] \
                or [l["wall_s"] for l in logs[1:-1]]
            is_steady = False  # compile-polluted: don't quote as steady
    else:
        steady = [l["wall_s"] for l in logs[1:-1]]
    rays_per_epoch = 2 * cfg.n_rays_per_step * len(views)
    rays_s = rays_per_epoch / float(np.mean(steady))
    return {"mode": mode, "device_sampling": cfg.device_sampling,
            "total_s": round(total, 1),
            "steady_epoch_s": round(float(np.mean(steady)), 3),
            "steady": is_steady,
            "epoch_s_all": [l["wall_s"] for l in logs],
            "rays_per_sec": round(rays_s, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/bench_system_decomp")
    ap.add_argument("--views", type=int, default=20)
    ap.add_argument("--imh", type=int, default=256)
    ap.add_argument("--light-h", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=6,
                    help="epochs per dispatch for the 'chunk' mode")
    ap.add_argument("--device-sampling", action="store_true",
                    help="sample ray indices on device inside the scan "
                         "(DecompConfig.device_sampling; scan/chunk/u8 "
                         "modes only)")
    ap.add_argument("--modes", default="off,on,scan",
                    help="comma list of off|on|scan|chunk|u8|shard "
                         "(host-gather / resident per-step / resident "
                         "scanned-epoch / multi-epoch dispatches / "
                         "+ u8 lvis / + row-sharded)")
    args = ap.parse_args()

    cfg_lights = 2 * args.light_h * args.light_h
    print(f"== {args.views} views @ {args.imh}^2, {cfg_lights} lights, "
          f"2048 rays/step, {args.epochs} epochs/mode")
    views = synth_views(args.views, args.imh, cfg_lights)
    os.makedirs(args.root, exist_ok=True)
    results = []
    for mode in args.modes.split(","):
        r = run_mode(mode, views, args, args.root)
        results.append(r)
        print(json.dumps(r))
    for r in results[1:]:
        print(f"== {r['mode']} vs {results[0]['mode']}: "
              f"{results[0]['steady_epoch_s']/r['steady_epoch_s']:.2f}x")


if __name__ == "__main__":
    main()
