"""Stage-1 sampler-default guardrail over hostile geometries.

Runs the equal-step stage-1 quality comparison (reference-exact 64+64 r4
uniform sampler vs the occupancy-guided 16+16 r2 fast default,
config.py:_GEO_FAST_SAMPLER) on four analytic scenes: the original smoke
sphere plus the r2-VERDICT-#2 hostile cases — thin torus, thin plate,
two disjoint blobs. The fast default ships only while it matches or
beats the reference sampler on EVERY scene at equal steps; the table is
recorded in BASELINE.md.

Run on TPU:  python scripts/guardrail_scenes.py [--geo-iters 1500]
Each cell trains stage 1 from scratch and reports the val-view PSNR.
"""

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SMOKE = os.path.join(HERE, "smoke_e2e.py")

SHAPES = ["sphere", "torus", "plate", "blobs"]
CONFIGS = [
    ("ref 64+64r4", ["--geo-sampler", "64+64r4"]),
    ("occ 16+16r2", ["--geo-sampler", "16+16r2", "--occ-res", "64"]),
    # fallback candidate: more initial samples, still occupancy-guided
    ("occ 32+16r2", ["--geo-sampler", "32+16r2", "--occ-res", "64"]),
    # fewer initial samples made safe on thin geometry by a finer 128^3
    # grid (the plate is ~2.6 cells thick there vs ~1.3 at 64^3;
    # BASELINE.md r3 occ128 row)
    ("occ 24+16r2/128", ["--geo-sampler", "24+16r2", "--occ-res", "128"]),
    # the shipped r3 default after the second retune: halving the
    # importance samples keeps all four scenes above the reference bar
    # (plate margin +0.2 dB, confirmed over two runs) at 75.9k rays/s
    ("occ 24+8r2/128", ["--geo-sampler", "24+8r2", "--occ-res", "128"]),
    # r4 candidate: same sampler + per-ray-adaptive work — rays with a
    # provably-empty occupancy span render with the cheap 8-sample tier
    ("adpt 24+8r2/128", ["--geo-sampler", "24+8r2", "--occ-res", "128",
                         "--adaptive-empty"]),
    # the >=10x-throughput tiers (BASELINE.md r2/r3 sweep): candidates
    # only if they hold quality at production budget under the
    # production-faithful parity render
    ("occ 16+8r2/128", ["--geo-sampler", "16+8r2", "--occ-res", "128"]),
    ("occ 16+16r2/128", ["--geo-sampler", "16+16r2", "--occ-res", "128"]),
    # two-phase schedules: cheap occ-guided carving for 90% of the
    # steps, then a parity-sampler tail trains the final 10% under the
    # exact quadrature production renders with (tail throughput
    # 1/(0.9/fast + 0.1/20.4k))
    ("sch 24+8t10/128", ["--geo-sampler", "24+8r2", "--occ-res", "128",
                         "--geo-tail-frac", "0.1"]),
    ("sch 16+8t10/128", ["--geo-sampler", "16+8r2", "--occ-res", "128",
                         "--geo-tail-frac", "0.1"]),
    # longer tail, in case 10% of parity-quadrature refinement is not
    # enough to match the reference's full-trajectory fine sampling
    ("sch 24+8t25/128", ["--geo-sampler", "24+8r2", "--occ-res", "128",
                         "--geo-tail-frac", "0.25"]),
    # r4 production-budget follow-ups: plate at t25 lands 1.0 dB below
    # the ref bar (34.42 vs 35.43) — test whether a longer tail closes
    # it, and whether the roomier 24+16 carve tier + tail does
    ("sch 24+8t40/128", ["--geo-sampler", "24+8r2", "--occ-res", "128",
                         "--geo-tail-frac", "0.4"]),
    ("sch 24+16t25/128", ["--geo-sampler", "24+16r2", "--occ-res", "128",
                          "--geo-tail-frac", "0.25"]),
    # r5 (VERDICT #1): occupancy-guided DENSE tails — near-full sample
    # count placed by the occ grid instead of the uniform parity
    # quadrature. The r4 schedule result says carve quality + dense
    # refinement compose; these measure whether occ placement lets a
    # 48-96-sample tail match the 64+64r4 parity tail at ~2-3x its
    # step rate (tail throughput rows: bench_geo_sweep --cells).
    ("sch 24+8t25d64+32/128",
     ["--geo-sampler", "24+8r2", "--occ-res", "128",
      "--geo-tail-frac", "0.25", "--geo-tail-sampler", "64+32r2",
      "--geo-tail-occ"]),
    ("sch 24+8t25d48+32/128",
     ["--geo-sampler", "24+8r2", "--occ-res", "128",
      "--geo-tail-frac", "0.25", "--geo-tail-sampler", "48+32r2",
      "--geo-tail-occ"]),
    ("sch 24+8t25d64+16/128",
     ["--geo-sampler", "24+8r2", "--occ-res", "128",
      "--geo-tail-frac", "0.25", "--geo-tail-sampler", "64+16r2",
      "--geo-tail-occ"]),
    # tail_frac ladder at the best dense tail (if t25 passes, shorter
    # tails raise the weighted throughput further)
    ("sch 24+8t15d64+32/128",
     ["--geo-sampler", "24+8r2", "--occ-res", "128",
      "--geo-tail-frac", "0.15", "--geo-tail-sampler", "64+32r2",
      "--geo-tail-occ"]),
    # r5 (VERDICT #3): auto carve-tier — interior-fraction probe
    # switches fat scenes (sphere) to the 24+16 carve; thin scenes
    # train bit-identically to the fixed 24+8 cell
    ("sch autoT25/128",
     ["--geo-sampler", "24+8r2", "--occ-res", "128",
      "--geo-tail-frac", "0.25", "--carve-auto"]),
    ("sch autoT25d64+32/128",
     ["--geo-sampler", "24+8r2", "--occ-res", "128",
      "--geo-tail-frac", "0.25", "--geo-tail-sampler", "64+32r2",
      "--geo-tail-occ", "--carve-auto"]),
]


def run_cell(shape, extra, root, geo_iters, imh, save_ckpt=False,
             seed=0):
    out = subprocess.run(
        [sys.executable, SMOKE, "--root", root, "--shape", shape,
         "--stage1-only", "--geo-iters", str(geo_iters),
         "--imh", str(imh), "--seed", str(seed)]
        + (["--save-ckpt"] if save_ckpt else []) + extra,
        capture_output=True, text=True)
    if out.returncode != 0:
        print(out.stdout[-2000:])
        print(out.stderr[-2000:])
        raise RuntimeError(f"guardrail cell failed: {shape} {extra}")
    import re as _re
    m_train = _re.search(r"val-view PSNR ([\d.]+) dB", out.stdout)
    m_par = _re.search(r"val-view PSNR\(parity\) ([\d.]+) dB", out.stdout)
    if not m_train:
        raise RuntimeError(f"no PSNR line in output for {shape} {extra}")
    # parity = quality of the trained SDF rendered the way production
    # extracts it (cli._geo_cfgs: always 64+64r4); this is the decision
    # metric. train_render kept for continuity with r2/r3 tables.
    return {"train_render": float(m_train.group(1)),
            "parity": (float(m_par.group(1)) if m_par
                       else float(m_train.group(1)))}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/vqnerf_guardrail")
    ap.add_argument("--geo-iters", type=int, default=1500)
    ap.add_argument("--imh", type=int, default=64)
    ap.add_argument("--out-json", default=None)
    ap.add_argument("--shapes", default=None,
                    help="comma-separated subset of scenes "
                    f"(default: all of {SHAPES})")
    ap.add_argument("--save-ckpt", action="store_true",
                    help="keep each cell's final stage-1 checkpoint so "
                    "any render config can be re-scored post-hoc")
    ap.add_argument("--seed", type=int, default=0,
                    help="stage-1 training seed (cells are seeded and "
                    "deterministic; vary this to measure run spread)")
    ap.add_argument("--configs", default=None,
                    help="comma-separated subset of config names to run "
                    "(default: all); e.g. 'ref 64+64r4,occ 24+8r2/128'")
    args = ap.parse_args()

    global CONFIGS
    if args.configs:
        wanted = [c.strip() for c in args.configs.split(",")]
        by_name = dict(CONFIGS)
        missing = [w for w in wanted if w not in by_name]
        if missing:
            raise SystemExit(f"unknown configs: {missing}; "
                             f"known: {[n for n, _ in CONFIGS]}")
        CONFIGS = [(w, by_name[w]) for w in wanted]

    shapes = SHAPES
    if args.shapes:
        shapes = [s.strip() for s in args.shapes.split(",")]
        unknown = [s for s in shapes if s not in SHAPES]
        if unknown:
            raise SystemExit(f"unknown shapes: {unknown}")

    table = {}
    for shape in shapes:
        table[shape] = {}
        for name, extra in CONFIGS:
            root = os.path.join(args.root, shape,
                                name.replace(" ", "_").replace("+", "")
                                .replace("/", "g")
                                + ("_s%d" % args.seed if args.seed
                                   else ""))
            p = run_cell(shape, extra, root, args.geo_iters, args.imh,
                         save_ckpt=args.save_ckpt, seed=args.seed)
            table[shape][name] = p
            print(f"{shape:8s} {name:12s} parity {p['parity']:6.2f} dB"
                  f"  (train-render {p['train_render']:6.2f})",
                  flush=True)

    names = [n for n, _ in CONFIGS]
    print("\nparity-render PSNR (the production decision metric):")
    print("| scene | " + " | ".join(names)
          + " | worst Δ vs " + names[0] + " |")
    print("|---|" + "---|" * (len(names) + 1))
    worst = {n: 0.0 for n in names[1:]}
    for shape in shapes:
        vals = [table[shape][n]["parity"] for n in names]
        deltas = [v - vals[0] for v in vals[1:]]
        for n, d in zip(names[1:], deltas):
            worst[n] = min(worst[n], d)
        print("| " + shape + " | "
              + " | ".join(f"{v:.2f}" for v in vals)
              + " | " + " / ".join(f"{d:+.2f}" for d in deltas) + " |")
    for n, w in worst.items():
        print(f"{n}: worst delta {w:+.2f} dB "
              f"({'OK' if w > -0.3 else 'REGRESSION'})")
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(table, f, indent=1)


if __name__ == "__main__":
    main()
