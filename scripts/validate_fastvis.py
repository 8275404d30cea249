"""Fast-vis validation at production light count (512) on a trained
smoke scene — the r1 VERDICT item 7 promotion gate.

Trains a short NeuS on the synthetic sphere scene (reusing the smoke
harness' scene generator), extracts one view's geometry, then computes
the 16x32=512-direction light visibility through BOTH paths:
  full: the hierarchical occlusion render on every front-lit shadow ray
  fast: coarse SDF certification sweep + full render on uncertain rays
and reports agreement stats, the uncertain fraction, and wall-clock for
each. Run on TPU: python scripts/validate_fastvis.py
"""

import argparse
import os
import sys
import time
from os.path import join

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/vqnerf_fastvis")
    ap.add_argument("--geo-iters", type=int, default=3000)
    ap.add_argument("--imh", type=int, default=64)
    ap.add_argument("--light-h", type=int, default=16)  # 512 lights
    ap.add_argument("--factor", type=float, default=2.0)
    ap.add_argument("--vis-sampler", default=None,
                    help="also validate a reduced occlusion sampler "
                         "(e.g. 32+16r2) against the parity full path")
    ap.add_argument("--occluded", action="store_true",
                    help="also validate the occluded-ray certificate "
                         "(--fast-vis-occluded) against the full path")
    ap.add_argument("--shape", default="sphere",
                    help="smoke scene geometry (sphere/torus/plate/"
                         "blobs); concave/multi-body shapes exercise "
                         "the occluded certificate, a sphere cannot")
    ap.add_argument("--refine", type=int, default=64,
                    help="second-stage certification sample count "
                         "(fast_vis_refine); validates refine=0 vs "
                         "refine=N agreement and wall. 0 skips the "
                         "refined variant")
    args = ap.parse_args()
    if args.shape != "sphere" and args.root == "/tmp/vqnerf_fastvis":
        args.root = "/tmp/vqnerf_fastvis_" + args.shape

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "smoke_e2e", join(os.path.dirname(os.path.abspath(__file__)),
                          "smoke_e2e.py"))
    smoke = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(smoke)
    make_scene = smoke.make_scene
    from vqnerf_release_tpu.data.neus_dataset import NerfSceneDataset
    from vqnerf_release_tpu.models.neus import NeuSConfig
    from vqnerf_release_tpu.pipelines.gen_geo import GeoExtractor
    from vqnerf_release_tpu.train.neus_loop import NeuSRunner
    from vqnerf_release_tpu.train.neus_trainer import NeuSTrainConfig

    scene_dir = join(args.root, "scene")
    os.makedirs(scene_dir, exist_ok=True)
    make_scene(scene_dir, h=args.imh, w=args.imh, shape=args.shape)

    ds = NerfSceneDataset(scene_dir, is_train=True, near=1.2, far=3.5)
    cfg = NeuSConfig(n_samples=32, n_importance=16, up_sample_steps=2)
    tcfg = NeuSTrainConfig(end_iter=args.geo_iters,
                           warm_up_end=max(args.geo_iters // 10, 1),
                           batch_size=1024, save_freq=10**9,
                           val_freq=10**9, use_white_bkgd=True,
                           occ_res=64)
    runner = NeuSRunner(cfg, tcfg, ds, join(args.root, "exp"), seed=0)
    t0 = time.time()
    runner.train(log_every=max(args.geo_iters // 4, 1))
    print(f"trained {args.geo_iters} iters in {time.time()-t0:.0f}s")

    # occlusion at the reference-parity sampler regardless of the
    # (fast) training cfg — this is the production extraction setup
    ex = GeoExtractor(runner.params, cfg, ds, join(args.root, "surf"),
                      use_white_bkgd=True, batch_size=4096,
                      light_h=args.light_h, vis_point_batch=64,
                      fast_vis=True, fast_vis_factor=args.factor,
                      fast_vis_refine=0,
                      vis_sampler="64+64r4")
    view_dir = join(args.root, "surf", "train_000")
    os.makedirs(view_dir, exist_ok=True)
    surf, normal, mask = ex.compute_geo(0, view_dir)
    fg = mask[..., 0] > 0
    surf_fg = surf[fg].astype(np.float32)
    normal_fg = normal[fg].astype(np.float32)
    n_fg = surf_fg.shape[0]
    print(f"view 0: {n_fg} fg points x {ex.n_lights} lights "
          f"= {n_fg * ex.n_lights} shadow rays")

    # warm both paths' kernels, then time
    _ = ex._lvis_full(surf_fg[:64], normal_fg[:64])
    _ = ex._lvis_fast(surf_fg[:64], normal_fg[:64])

    t0 = time.time()
    lv_full = ex._lvis_full(surf_fg, normal_fg)
    t_full = time.time() - t0
    t0 = time.time()
    lv_fast = ex._lvis_fast(surf_fg, normal_fg)
    t_fast = time.time() - t0

    diff = np.abs(lv_full - lv_fast)
    # uncertain fraction (recompute the certification masks — decided
    # on device and bit-packed since r4 — for the stat)
    from vqnerf_release_tpu.pipelines.gen_geo import _unpack_bits
    L = ex.n_lights
    frontlit = np.zeros((n_fg, L), bool)
    uncertain = np.zeros((n_fg, L), bool)
    bs = ex.vis_point_batch
    import jax.numpy as jnp
    for i in range(0, n_fg, bs):
        s = surf_fg[i:i + bs]
        nn = normal_fg[i:i + bs]
        pad = bs - s.shape[0]
        if pad:
            s = np.pad(s, ((0, pad), (0, 0)), constant_values=0.5)
            nn = np.pad(nn, ((0, pad), (0, 0)), constant_values=1.0)
        fp, up, _ = ex._coarse_batch(ex.params, jnp.asarray(s),
                                     jnp.asarray(nn))
        end = min(i + bs, n_fg) - i
        frontlit[i:i + end] = _unpack_bits(fp, L)[:end]
        uncertain[i:i + end] = _unpack_bits(up, L)[:end]

    print(f"uncertain fraction (of front-lit rays): "
          f"{uncertain.sum() / max(frontlit.sum(), 1):.3f}")
    print(f"agreement: max |dlvis| {diff.max():.4f}, "
          f"mean {diff.mean():.6f}, "
          f"frac > 0.01: {(diff > 0.01).mean():.5f}, "
          f"frac > 0.05: {(diff > 0.05).mean():.6f}")
    print(f"wall: full {t_full:.1f}s, fast {t_fast:.1f}s "
          f"-> speedup {t_full / t_fast:.2f}x")
    # certified-ray check: every certified (skipped) front-lit ray must
    # be fully visible under the full path too
    cert = frontlit & ~uncertain
    if cert.any():
        v = lv_full[cert]
        print(f"certified rays: {cert.sum()} "
              f"(full-path vis on them: min {v.min():.4f}, "
              f"frac < 0.99: {(v < 0.99).mean():.6f})")

    if args.refine:
        # second-stage certification (fast_vis_refine, r5): the finer
        # sweep must keep exactness (certified rays fully visible under
        # the full path) while cutting the uncertain fraction and wall
        ex_r = GeoExtractor(runner.params, cfg, ds,
                            join(args.root, "surf_r"),
                            use_white_bkgd=True, batch_size=4096,
                            light_h=args.light_h, vis_point_batch=64,
                            fast_vis=True, fast_vis_factor=args.factor,
                            fast_vis_refine=args.refine,
                            vis_sampler="64+64r4")
        _ = ex_r._lvis_fast(surf_fg[:64], normal_fg[:64])  # warm
        t0 = time.time()
        lv_ref = ex_r._lvis_fast(surf_fg, normal_fg)
        t_ref = time.time() - t0
        st = ex_r.last_fast_vis_stats
        dr = np.abs(lv_full - lv_ref)
        print(f"fast+refine{args.refine}: coarse-uncertain "
              f"{st['coarse_uncertain_rays']}, refine-certified "
              f"{st['refine_certified_rays']} "
              f"({st['refine_certified_rays']/max(st['coarse_uncertain_rays'],1):.3f}"
              f" of them), still-uncertain {st['uncertain_rays']} "
              f"-> certified_frac {st['certified_frac']:.3f}")
        print(f"fast+refine vs parity: max |dlvis| {dr.max():.4f}, "
              f"mean {dr.mean():.6f}, "
              f"frac > 0.01: {(dr > 0.01).mean():.5f}, "
              f"frac > 0.05: {(dr > 0.05).mean():.6f}; "
              f"wall {t_ref:.1f}s -> {t_full / t_ref:.2f}x "
              f"(fast-only was {t_full / t_fast:.2f}x)")

    if args.occluded:
        # occluded-certificate validation: fast-vis with BOTH
        # certificates (free + provably-occluded interior chords) vs
        # the parity full path — the occluded rays must read ~0 under
        # the full render too
        ex3 = GeoExtractor(runner.params, cfg, ds,
                           join(args.root, "surf3"),
                           use_white_bkgd=True, batch_size=4096,
                           light_h=args.light_h, vis_point_batch=64,
                           fast_vis=True, fast_vis_factor=args.factor,
                           fast_vis_occluded=True, fast_vis_refine=0,
                           vis_sampler="64+64r4")
        _ = ex3._lvis_fast(surf_fg[:64], normal_fg[:64])  # warm
        t0 = time.time()
        lv_occl = ex3._lvis_fast(surf_fg, normal_fg)
        t_occl = time.time() - t0
        st = ex3.last_fast_vis_stats
        d3 = np.abs(lv_full - lv_occl)
        print(f"fast+occluded: occluded-certified "
              f"{st['occluded_certified_rays']} rays "
              f"({st['occluded_certified_rays']/max(st['front_lit_rays'],1):.3f} "
              f"of front-lit), uncertain {st['uncertain_rays']} "
              f"(was {int(uncertain.sum())} without)")
        print(f"fast+occluded vs parity: max |dlvis| {d3.max():.4f}, "
              f"mean {d3.mean():.6f}, "
              f"frac > 0.01: {(d3 > 0.01).mean():.5f}, "
              f"frac > 0.05: {(d3 > 0.05).mean():.6f}; "
              f"wall {t_occl:.1f}s -> {t_full / t_occl:.2f}x "
              f"(fast-only was {t_full / t_fast:.2f}x)")

    if args.vis_sampler:
        # reduced occlusion sampler vs the parity full path: plain,
        # occupancy-PDF-guided samples (+occ), span-tightened [near,far]
        # (+span), both, and span composed with the fast-vis two-pass
        for occ_vis, span_vis, fast in ((False, False, False),
                                        (True, False, False),
                                        (False, True, False),
                                        (True, True, False),
                                        (False, True, True)):
            ex2 = GeoExtractor(runner.params, cfg, ds,
                               join(args.root, "surf2"),
                               use_white_bkgd=True, batch_size=4096,
                               light_h=args.light_h, vis_point_batch=64,
                               vis_sampler=args.vis_sampler,
                               occ_vis=occ_vis, span_vis=span_vis,
                               fast_vis=fast, fast_vis_refine=0,
                               fast_vis_factor=args.factor)
            fn = ex2._lvis_fast if fast else ex2._lvis_full
            _ = fn(surf_fg[:64], normal_fg[:64])  # warm
            t0 = time.time()
            lv_red = fn(surf_fg, normal_fg)
            t_red = time.time() - t0
            d2 = np.abs(lv_full - lv_red)
            label = args.vis_sampler + ("+occ" if occ_vis else "") \
                + ("+span" if span_vis else "") + ("+fast" if fast else "")
            print(f"vis-sampler {label} vs parity: "
                  f"max |dlvis| {d2.max():.4f}, mean {d2.mean():.6f}, "
                  f"frac > 0.01: {(d2 > 0.01).mean():.5f}, "
                  f"frac > 0.05: {(d2 > 0.05).mean():.6f}; "
                  f"wall {t_red:.1f}s -> {t_full / t_red:.2f}x vs parity")


if __name__ == "__main__":
    main()
