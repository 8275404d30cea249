"""Sweep NeuS training-step throughput over sampling configs (TPU).

r1 closed the production config (64+64 samples, 4 up-sample rounds) as
compute-bound at ~21.9k rays/s; the remaining headroom is algorithmic —
fewer samples / fewer rounds / occupancy-guided placement (VERDICT r1
item 2). This sweeps the candidate configs and prints rays/s for each;
quality at the chosen config is then guarded by scripts/smoke_e2e.py.

Usage: python scripts/bench_geo_sweep.py [--batch 2560] [--iters 10]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def time_config(label, ncfg, tcfg, n_rays, n_iters=10, n_windows=3,
                occ_res=0):
    import jax
    import jax.numpy as jnp

    from vqnerf_release_tpu.models.neus import init_neus
    from vqnerf_release_tpu.train.neus_trainer import (
        init_neus_opt_state, make_neus_train_step)

    params = init_neus(0, ncfg)
    opt = init_neus_opt_state(params)
    kw = {}
    occ_grid = None
    if occ_res:
        from vqnerf_release_tpu.ops.occupancy import build_occ_grid
        occ_grid = build_occ_grid(params["sdf"], ncfg.sdf, radius=1.0,
                                  res=occ_res)
        kw["with_occ"] = True
    step_fn = jax.jit(make_neus_train_step(ncfg, tcfg, radius=1.0, **kw))

    rs = np.random.RandomState(1)
    d = rs.randn(n_rays, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    batch = {
        "rays_o": jnp.asarray(
            np.tile(np.array([[0, 0, 3.0]], np.float32), (n_rays, 1))),
        "rays_d": jnp.asarray(d),
        "rgb": jnp.full((n_rays, 3), 0.6, jnp.float32),
        "mask": jnp.ones((n_rays, 1), jnp.float32),
        "near": jnp.full((n_rays, 1), 2.0, jnp.float32),
        "far": jnp.full((n_rays, 1), 6.0, jnp.float32),
        "valid": jnp.ones((n_rays, 1), jnp.float32),
    }

    state = {"p": params, "o": opt, "m": None, "i": 0}

    def run():
        args = [state["p"], state["o"], batch,
                jax.random.PRNGKey(state["i"]),
                jnp.asarray(float(state["i"]))]
        if occ_grid is not None:
            args.append(occ_grid)
        state["p"], state["o"], state["m"] = step_fn(*args)
        state["i"] += 1

    run()
    float(state["m"]["loss"])  # compile+sync (tunnel: block_until_ready
    # is not a barrier; close over a chain-dependent host transfer)
    best = float("inf")
    for _ in range(n_windows):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            run()
        float(state["m"]["loss"])
        best = min(best, time.perf_counter() - t0)
    v = n_rays * n_iters / best
    print(f"{label:40s} {v:10.0f} rays/s  "
          f"({1e3 * best / n_iters:.1f} ms/step)", flush=True)
    return v


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2560)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--occ", action="store_true",
                    help="include occupancy-sampler configs")
    ap.add_argument("--occ-res", type=int, default=64,
                    help="occupancy grid resolution for the --occ rows "
                         "(128 recovers thin-geometry quality at 24+16, "
                         "see the r3 guardrail)")
    ap.add_argument("--cells", type=str, default="",
                    help="comma-separated ad-hoc occ cells 'S+IrR', e.g. "
                         "'24+8r2,24+12r2' — timed with the occupancy "
                         "sampler at --occ-res, skipping the fixed grid")
    args = ap.parse_args()

    from vqnerf_release_tpu.models.neus import NeuSConfig
    from vqnerf_release_tpu.train.neus_trainer import NeuSTrainConfig

    b = args.batch
    tcfg = NeuSTrainConfig(batch_size=b)

    if args.cells:
        from vqnerf_release_tpu.config import parse_sampler_spec
        for cell in args.cells.split(","):
            # "ref:64+64r4" times the plain (non-occ) sampler; bare
            # specs time the occupancy-guided one at --occ-res
            ref = cell.startswith("ref:")
            if ref:
                cell = cell[len("ref:"):]
            try:
                spec = parse_sampler_spec(cell)
            except ValueError as e:
                raise SystemExit(str(e))
            s, i, r = (spec["n_samples"], spec["n_importance"],
                       spec["up_sample_steps"])
            ncfg = NeuSConfig(**spec)
            if ref:
                time_config(f"ref {s}+{i} r{r} b{b}", ncfg, tcfg, b,
                            n_iters=args.iters)
            else:
                time_config(f"occ {s}+{i} r{r} b{b} res{args.occ_res}",
                            ncfg, tcfg, b, n_iters=args.iters,
                            occ_res=args.occ_res)
        return

    grid = [
        ("prod 64+64 r4", NeuSConfig()),
        ("64+48 r3", NeuSConfig(n_importance=48, up_sample_steps=3)),
        ("48+48 r3", NeuSConfig(n_samples=48, n_importance=48,
                                up_sample_steps=3)),
        ("32+32 r2", NeuSConfig(n_samples=32, n_importance=32,
                                up_sample_steps=2)),
        ("32+16 r2", NeuSConfig(n_samples=32, n_importance=16,
                                up_sample_steps=2)),
    ]
    for label, ncfg in grid:
        time_config(f"{label} b{b}", ncfg, tcfg, b, n_iters=args.iters)

    if args.occ:
        occ_grid = [
            ("occ 32+32 r2", NeuSConfig(n_samples=32, n_importance=32,
                                        up_sample_steps=2)),
            ("occ 32+16 r2", NeuSConfig(n_samples=32, n_importance=16,
                                        up_sample_steps=2)),
            ("occ 16+16 r2", NeuSConfig(n_samples=16, n_importance=16,
                                        up_sample_steps=2)),
            # r3 candidates for the last 7% to the 10x north star
            ("occ 24+16 r2", NeuSConfig(n_samples=24, n_importance=16,
                                        up_sample_steps=2)),
            ("occ 16+16 r1", NeuSConfig(n_samples=16, n_importance=16,
                                        up_sample_steps=1)),
            ("occ 16+8 r2", NeuSConfig(n_samples=16, n_importance=8,
                                       up_sample_steps=2)),
            ("occ 12+12 r2", NeuSConfig(n_samples=12, n_importance=12,
                                        up_sample_steps=2)),
        ]
        for label, ncfg in occ_grid:
            time_config(f"{label} b{b}", ncfg, tcfg, b,
                        n_iters=args.iters, occ_res=args.occ_res)


if __name__ == "__main__":
    main()
