"""Measure the two-tier adaptive stage-1 step (adaptive_empty) against
the plain occ 24+8r2/128 default at controlled active-ray fractions.

The synthetic batch aims `frac` of its rays at the init sphere (active)
and the rest past it (empty span) — production scenes sit around
0.4-0.7 active depending on framing. Run on TPU:
  python scripts/bench_adaptive.py [--fracs 0.5,0.625,0.75]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def mixed_batch(n, frac_active, seed=1):
    import jax.numpy as jnp
    rs = np.random.RandomState(seed)
    n_act = int(n * frac_active)
    rays_o = np.tile(np.array([[0.0, 0.0, 3.0]], np.float32), (n, 1))
    d_act = np.array([[0.0, 0.0, -1.0]]) + 0.12 * rs.randn(n_act, 3)
    d_miss = np.array([[0.0, 1.0, 0.0]]) + 0.12 * rs.randn(n - n_act, 3)
    d = np.concatenate([d_act, d_miss]).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    perm = rs.permutation(n)
    return {
        "rays_o": jnp.asarray(rays_o),
        "rays_d": jnp.asarray(d[perm]),
        "rgb": jnp.full((n, 3), 0.6, jnp.float32),
        "mask": jnp.asarray((d[perm][:, 2] < -0.5)
                            .astype(np.float32)[:, None]),
        "near": jnp.full((n, 1), 2.0, jnp.float32),
        "far": jnp.full((n, 1), 6.0, jnp.float32),
        "valid": jnp.ones((n, 1), jnp.float32),
    }


def bench(step_fn, params, opt, batch, occ_grid, n_iters=30, windows=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run_n(params, opt, base_key):
        def body(carry, i):
            params, opt = carry
            b = {k: jnp.roll(v, i, axis=0) for k, v in batch.items()}
            params, opt, m = step_fn(
                params, opt, b, jax.random.fold_in(base_key, i),
                i.astype(jnp.float32), occ_grid)
            return (params, opt), m["loss"]
        carry, losses = jax.lax.scan(body, (params, opt),
                                     jnp.arange(n_iters))
        return carry, losses[-1]

    state = {"c": (params, opt), "l": None}

    def run():
        state["c"], state["l"] = run_n(*state["c"], jax.random.PRNGKey(0))

    run()
    float(state["l"])  # compile + sync
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        run()
        float(state["l"])
        best = min(best, time.perf_counter() - t0)
    return best / n_iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fracs", default="0.5,0.625,0.75")
    ap.add_argument("--batch", type=int, default=2560)
    ap.add_argument("--empty-n", type=int, default=8)
    args = ap.parse_args()

    import jax

    from vqnerf_release_tpu.config import neus_configs_for_scene
    from vqnerf_release_tpu.models.neus import init_neus
    from vqnerf_release_tpu.ops.occupancy import build_occ_grid
    from vqnerf_release_tpu.train.neus_trainer import (
        init_neus_opt_state, make_neus_train_step)
    from dataclasses import replace

    ncfg, tcfg, _ = neus_configs_for_scene("lego")
    tcfg = replace(tcfg, adaptive_empty=True, empty_n_samples=args.empty_n)
    n = args.batch
    params = init_neus(0, ncfg)
    opt = init_neus_opt_state(params)
    occ_grid = build_occ_grid(params["sdf"], ncfg.sdf, radius=1.0,
                              res=tcfg.occ_res,
                              margin_factor=tcfg.occ_margin)

    plain = make_neus_train_step(ncfg, tcfg, 1.0, with_occ=True)
    rows = []
    for frac in [float(f) for f in args.fracs.split(",")]:
        batch = mixed_batch(n, frac)
        dt0 = bench(plain, params, opt, batch, occ_grid)
        # cap per the runner's policy: frac*1.15+0.05 quantized up to 1/8
        import math
        cap_frac = min(1.0, frac * 1.15 + 0.05)
        cap = int(math.ceil(cap_frac * 8) / 8.0 * n)
        two = make_neus_train_step(ncfg, tcfg, 1.0, with_occ=True,
                                   active_cap=cap)
        dt1 = bench(two, params, opt, batch, occ_grid)
        rows.append({"frac_active": frac, "cap": cap,
                     "plain_rays_s": round(n / dt0, 1),
                     "adaptive_rays_s": round(n / dt1, 1),
                     "speedup": round(dt0 / dt1, 3)})
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"batch": n, "empty_n": args.empty_n, "rows": rows}))


if __name__ == "__main__":
    main()
