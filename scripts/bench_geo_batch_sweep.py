"""Batch-size sweep for the stage-1 training step at the production
occ 24+8 r2 @128^3 default (and optionally the parity sampler).

The r1 sweep found the parity 64+64 r4 step flat from b512 to b4096
(compute-bound at the MLP FLOP floor). The occupancy default samples
4x fewer points per ray, so per-step fixed costs (up-sample sorts, occ
lookups, dispatch) weigh more and batch scaling may buy the last notch
toward the 10x north star. Run from the repo root on the TPU (no
PYTHONPATH — see CLAUDE.md).
"""
import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="2560,4096,5120,8192,10240")
    ap.add_argument("--parity", action="store_true",
                    help="also sweep the reference-exact 64+64 r4 sampler")
    args = ap.parse_args()

    from bench import _bench_geo

    for b in [int(x) for x in args.batches.split(",")]:
        row = _bench_geo(f"geo_train_b{b}", batch_size=b)
        print(json.dumps(row), flush=True)
        if args.parity:
            row = _bench_geo(f"geo_train_parity_b{b}", batch_size=b,
                             n_samples=64, n_importance=64,
                             up_sample_steps=4, occ_res=0)
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
