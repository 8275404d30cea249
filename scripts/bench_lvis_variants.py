"""Micro-bench of the lvis occlusion-render gradient strategies on TPU.

Times, at the production extraction shape (8192 shadow rays, parity
64+64 r4 sampler), the two shipped paths of `neus_occlusion`:
  vjp:    full sdf_gradient + dot with the ray direction (default)
  pallas: the fused fwd+grad kernel path (use_pallas=True)

A third strategy — a single jvp along the ray direction, computing only
the directional derivative grad.dir the shadow pass consumes — was
prototyped in r3 and measured 45.2k rays/s vs 46.4k (vjp) and 46.8k
(pallas): a 3% LOSS, not a win. For this 8x256 MLP the tangent
propagation costs the same matmul FLOPs as the transposed backward, and
the workload is at the MLP FLOP floor (all three strategies within 3%).
The jvp's memory advantage (no [N,256] residuals) also bought nothing:
dispatches of 16384 rays ran at the same rate and 32768+ still failed
to compile, so the production vis_point_batch x light_tile stays.
Honest negative, recorded in BASELINE.md; the vjp default stays.

Run on TPU: python scripts/bench_lvis_variants.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from vqnerf_release_tpu.config import neus_configs_for_scene
    from vqnerf_release_tpu.models.neus import init_neus, neus_occlusion
    from vqnerf_release_tpu.pipelines.gen_geo import intersect_sphere_far

    ncfg, _, _ = neus_configs_for_scene(
        "lego", n_samples=64, n_importance=64, up_sample_steps=4,
        occ_res=0)
    params = init_neus(0, ncfg)
    radius = 1.0
    n = 8192

    rs = np.random.RandomState(2)
    o = jnp.asarray(rs.rand(n, 3).astype(np.float32) * 0.8 - 0.4)
    d = rs.randn(n, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))

    def make(use_pallas):
        @jax.jit
        def occ(params, o, d):
            far = intersect_sphere_far(o, d, radius)
            near = jnp.minimum(jnp.full_like(far, 0.1), far / 2.0)
            return neus_occlusion(params, ncfg, o, d, near, far, radius,
                                  cos_anneal_ratio=1.0,
                                  use_pallas=use_pallas)
        return occ

    results = {}
    for name, fn in [("vjp", make(False)), ("pallas", make(True))]:
        try:
            out = {"v": fn(params, o, d)}
            float(out["v"].ravel()[0])  # warm/compile + barrier
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                for _ in range(12):
                    out["v"] = fn(params, o, d)
                float(out["v"].ravel()[0])
                best = min(best, time.time() - t0)
            v = n * 12 / best
            results[name] = v
            print(f"{name:7s}: {v/1e3:8.1f}k shadow rays/s "
                  f"({best*1000/12:.2f} ms / {n} rays)")
        except Exception as e:
            print(f"{name:7s}: FAILED {type(e).__name__}: {e}")

    if "vjp" in results and "pallas" in results:
        print("pallas speedup over vjp: "
              f"{results['pallas']/results['vjp']:.2f}x")


if __name__ == "__main__":
    main()
