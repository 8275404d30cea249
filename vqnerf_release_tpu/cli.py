"""Command-line entry points.

Preserves the reference's workflow surface:
  * geo-train   <scene>                 == nerf_runner/dtu_runner train
  * gen-geo     <scene> [--num-p/--p-i] == gen_geo/dtu_geo extraction
  * decomp-train <scene> [--phase ...]  == scripts/train.sh (all 3 phases)
  * test        <scene>                 == scripts/test.sh (4 passes)
  * bench                               == bench.py

Paths: --data-root (scene data), --output-root (defaults ./output),
mirroring output/train/<scene>_<model>/lr<lr> and surf/<family>_surf.
"""

import argparse
import os
import sys
from typing import Optional

import numpy as np

from . import config as vcfg


def _add_common(p):
    p.add_argument("scene")
    p.add_argument("--data-root", required=True)
    p.add_argument("--output-root", default="./output")
    p.add_argument("--seed", type=int, default=None)


def _geo_cfgs(args, extraction=False):
    from .models.neus import NeuSConfig

    # Extraction renders use the reference-parity sampler (64+64 r4,
    # confs/nerf.conf:83-86): the fast occupancy-guided TRAINING default
    # is not wired into GeoExtractor, and the extracted buffers feed
    # stage 2. --geo-override still wins.
    base = dict(n_samples=64, n_importance=64, up_sample_steps=4,
                occ_res=0) if extraction else {}
    cfg, tcfg, meta = vcfg.neus_configs_for_scene(args.scene, **base)
    # --geo-override keys route to whichever config owns them:
    # NeuSTrainConfig (lr, occ_res, ...) or NeuSConfig (n_samples,
    # n_importance, up_sample_steps, ...)
    override = getattr(args, "geo_override", "")
    if override:
        t_kvs, m_kvs = [], []
        for kv in override.split(","):
            k = kv.split("=", 1)[0]
            if k in type(tcfg).__dataclass_fields__:
                t_kvs.append(kv)
            elif k in type(cfg).__dataclass_fields__:
                m_kvs.append(kv)
            else:
                raise SystemExit(
                    f"--geo-override: unknown key {k!r} (not a "
                    "NeuSTrainConfig or NeuSConfig field)")
        tcfg = _apply_preset_overrides(tcfg, ",".join(t_kvs))
        cfg = _apply_preset_overrides(cfg, ",".join(m_kvs))
    if getattr(args, "n_samples", 0):
        cfg = NeuSConfig(
            sdf=cfg.sdf, color=cfg.color,
            n_samples=args.n_samples, n_importance=args.n_samples,
            up_sample_steps=min(cfg.up_sample_steps, 2),
            perturb=cfg.perturb)
    return cfg, tcfg, meta


def cmd_geo_train(args):
    from .data.neus_dataset import DtuSceneDataset, NerfSceneDataset
    from .train.neus_loop import NeuSRunner

    cfg, tcfg, meta = _geo_cfgs(args)
    if args.end_iter:
        from dataclasses import replace
        tcfg = replace(tcfg, end_iter=args.end_iter)
    if meta["family"] in ("dtu", "ours"):
        ds = DtuSceneDataset(args.data_root, is_train=True,
                             new_h=meta["new_h"])
    else:
        ds = NerfSceneDataset(args.data_root, is_train=True,
                              near=meta["near"], far=meta["far"],
                              new_h=meta["new_h"])
    exp_dir = os.path.join(
        args.output_root, "exp", args.scene, meta["family"])
    runner = NeuSRunner(cfg, tcfg, ds, exp_dir, seed=args.seed or 0)
    runner.try_resume()
    from .utils.profiling import trace
    with trace(getattr(args, "profile_dir", None)):
        runner.train()
    runner.save_checkpoint()


def _gen_geo_mesh(devices_arg):
    """Resolve the gen-geo --devices flag to a ray mesh (or None for the
    unsharded single-device path)."""
    import jax

    from .parallel.mesh import get_mesh

    if devices_arg == "all":
        n = len(jax.devices())
    else:
        try:
            n = int(devices_arg)
        except ValueError:
            raise SystemExit(
                f"--devices must be 'all' or an integer, got "
                f"{devices_arg!r}")
    if n <= 1:
        return None
    avail = jax.devices()
    if n > len(avail):
        raise SystemExit(
            f"--devices {n} but only {len(avail)} JAX devices visible")
    return get_mesh(avail[:n])


def cmd_gen_geo(args):
    from .data.neus_dataset import DtuSceneDataset, NerfSceneDataset
    from .parallel.distributed import compose_view_shard, init_distributed
    from .pipelines.gen_geo import GeoExtractor
    from .models.neus import init_neus
    from .utils import ckpt as ckpt_util

    # Multi-host: join the process group BEFORE any backend use, then
    # fold the host grid into the view shard (reference: N independent
    # --num_p/--p_i processes, gen_geo.py:141-146).
    proc_i, proc_n = init_distributed(
        coordinator=getattr(args, "coordinator", None),
        num_hosts=getattr(args, "num_hosts", None),
        host_id=getattr(args, "host_id", None))
    num_p, p_i = compose_view_shard(args.num_p, args.p_i, proc_i, proc_n)

    cfg, tcfg, meta = _geo_cfgs(args, extraction=True)
    mk = DtuSceneDataset if meta["family"] in ("dtu", "ours") \
        else NerfSceneDataset
    kwargs = {} if meta["family"] in ("dtu", "ours") else {
        "near": meta["near"], "far": meta["far"]}
    exp_dir = os.path.join(
        args.output_root, "exp", args.scene, meta["family"])
    params = init_neus(args.seed or 0, cfg)
    latest = ckpt_util.latest_ckpt(exp_dir)
    if latest:
        from .train.neus_trainer import init_neus_opt_state
        state = ckpt_util.load_ckpt(latest, {
            "params": params,
            "opt_state": init_neus_opt_state(params), "iter_step": 0})
        params = state["params"]
    no_vis = args.no_vis or args.scene not in vcfg.CG_SCENES
    out_dir = vcfg.surf_dir(
        os.path.join(args.output_root, "surf"), args.scene)
    devices_arg = getattr(args, "devices", None)
    if proc_n > 1:
        from .parallel.distributed import local_mesh
        mesh = local_mesh(devices_arg or "all")
    else:
        mesh = _gen_geo_mesh(devices_arg or "1")
    # fast-vis default-on for CG lvis extraction: agreement validated on
    # a trained scene at 512 lights (max |dlvis| 0.004, zero rays off by
    # >0.01, every certified ray confirmed fully visible by the full
    # path — BASELINE.md r2); --no-fast-vis is the escape hatch
    if args.fast_vis and args.no_fast_vis:
        raise SystemExit("--fast-vis and --no-fast-vis are mutually "
                         "exclusive")
    fast_vis = (args.fast_vis
                or (not no_vis and not args.no_fast_vis))
    for is_train in (True, False):
        ds = mk(args.data_root, is_train=is_train,
                new_h=meta["new_h"], **kwargs)
        ex = GeoExtractor(params, cfg, ds, out_dir,
                          use_white_bkgd=tcfg.use_white_bkgd,
                          fast_vis=fast_vis,
                          fast_vis_factor=args.fast_vis_factor,
                          fast_vis_occluded=getattr(
                              args, "fast_vis_occluded", False),
                          fast_vis_refine=getattr(
                              args, "fast_vis_refine", 64),
                          use_pallas=getattr(args, "pallas", False),
                          mesh=mesh,
                          vis_sampler=getattr(args, "vis_sampler", None),
                          occ_vis=getattr(args, "occ_vis", False),
                          span_vis=getattr(args, "span_vis", False))
        ex.extract_views(is_train=is_train, num_p=num_p,
                         p_i=p_i, no_vis=no_vis)


def cmd_geo_video(args):
    """Stage-1 trajectory geometry extraction (geo/NeuS-ours2
    gen_video.py:120-180 and dtu_video.py): render the geometry buffers
    for every frame of the scene's test trajectory into
    surf/<family>_surf/<scene>/video/test_NNN/ (the tree `gen-video
    --video-root` consumes)."""
    from .data.neus_dataset import (DtuSceneDataset, DtuTrajectoryDataset,
                                    NerfSceneDataset, TrajectoryDataset)
    from .models.neus import init_neus
    from .pipelines.gen_geo import GeoExtractor
    from .pipelines.gen_video import extract_trajectory
    from .utils import ckpt as ckpt_util

    cfg, tcfg, meta = _geo_cfgs(args, extraction=True)
    exp_dir = os.path.join(
        args.output_root, "exp", args.scene, meta["family"])
    params = init_neus(args.seed or 0, cfg)
    latest = ckpt_util.latest_ckpt(exp_dir)
    if latest:
        from .train.neus_trainer import init_neus_opt_state
        state = ckpt_util.load_ckpt(latest, {
            "params": params,
            "opt_state": init_neus_opt_state(params), "iter_step": 0})
        params = state["params"]
    if meta["family"] in ("dtu", "ours"):
        train_ds = DtuSceneDataset(args.data_root, is_train=True,
                                   new_h=meta["new_h"])
        traj = DtuTrajectoryDataset(args.data_root, train_ds)
    else:
        train_ds = NerfSceneDataset(args.data_root, is_train=True,
                                    near=meta["near"], far=meta["far"],
                                    new_h=meta["new_h"])
        traj = TrajectoryDataset(args.data_root, imh=train_ds.H,
                                 imw=train_ds.W, near=meta["near"],
                                 far=meta["far"])
    out_root = os.path.join(vcfg.surf_dir(
        os.path.join(args.output_root, "surf"), args.scene), "video")
    no_vis = args.no_vis or args.scene not in vcfg.CG_SCENES
    ex = GeoExtractor(params, cfg, traj, out_root,
                      use_white_bkgd=tcfg.use_white_bkgd,
                      fast_vis=not no_vis and not args.no_fast_vis,
                      use_pallas=getattr(args, "pallas", False))
    dirs = extract_trajectory(ex, traj, out_root, no_vis=no_vis)
    print(f"geo-video: {len(dirs)} frames under {out_root}")


def _apply_preset_overrides(cfg, override_str):
    """k=v,... overrides onto a frozen config dataclass (typed by field)."""
    if not override_str:
        return cfg
    from dataclasses import fields, replace
    types = {f.name: f.type for f in fields(cfg)}
    kw = {}
    for kv in override_str.split(","):
        k, v = kv.split("=", 1)
        t = types[k]
        if t in (int, "int", Optional[int], "Optional[int]"):
            kw[k] = int(v)
        elif t in (float, "float"):
            kw[k] = float(v)
        elif t in (bool, "bool", Optional[bool], "Optional[bool]"):
            kw[k] = v.lower() == "true"
        else:
            kw[k] = v
    return replace(cfg, **kw)


def cmd_decomp_train(args):
    from .utils.profiling import trace
    with trace(getattr(args, "profile_dir", None)):
        _run_decomp_train(args)


def _run_decomp_train(args):
    from .data.shape_dataset import ShapeDataset
    from .train import loop

    cfg, light_init = vcfg.decomp_config_for_scene(args.scene)
    cfg = _apply_preset_overrides(cfg, getattr(args, "preset_override", ""))
    if args.seed is not None:
        from dataclasses import replace
        cfg = replace(cfg, random_seed=args.seed)
    if args.epochs:
        from dataclasses import replace
        cfg = replace(cfg, epochs=args.epochs)
    debug = bool(getattr(args, "debug", False))
    if debug:
        # reference --debug semantics (trainvali.py:60-61, 233-236;
        # datasets/shape_unit.py:59-61): eager step instead of the
        # compiled one, stop after one batch, train on a single view
        from dataclasses import replace
        cfg = replace(cfg, epochs=1, device_views="off",
                      epoch_scan=False, device_sampling=False)
        print("[vqnerf-tpu] --debug: eager (jax.disable_jit), 1 epoch, "
              "single train view", file=sys.stderr)
    surf_root = args.surf_root or vcfg.surf_dir(
        os.path.join(args.output_root, "surf"), args.scene)

    def views(mode, with_ref=False):
        ds = ShapeDataset(args.data_root, surf_root,
                          data_type=cfg.data_type, imh=cfg.imh,
                          white_bg=cfg.white_bg, mode=mode,
                          with_ref=with_ref)
        if not ds.files:
            raise SystemExit(
                f"no {mode} views: expected {args.data_root}/"
                f"{'train' if mode in ('train', 'render') else 'val'}_NNN/"
                f"metadata.json (stage-2 interface) with buffers under "
                f"{surf_root} — training on an empty dataset diverges "
                "silently")
        return [ds.load_view(f) for f in ds.files]

    train_views = views("train")
    vali_views = views("vali")[:8]
    if debug:
        train_views, vali_views = train_views[:1], vali_views[:1]

    phases = (["nfr_unit", "vq_nfr", "ref_nfr"]
              if args.phase == "all" else [args.phase])

    nfr_out = vcfg.train_outdir(args.output_root, args.scene, "nfr_unit")
    vq_out = vcfg.train_outdir(args.output_root, args.scene, "vq_nfr")
    ref_out = vcfg.train_outdir(args.output_root, args.scene, "ref_nfr")

    import contextlib
    import jax
    eager = jax.disable_jit() if debug else contextlib.nullcontext()
    with eager:
        nfr_params = None
        if "nfr_unit" in phases:
            nfr_params, _ = loop.train_nfr_unit(
                cfg, train_views, vali_views, nfr_out)
        vq_params = None
        if "vq_nfr" in phases:
            if nfr_params is None:
                nfr_params = _load_phase_params(nfr_out, cfg, "nfr_unit")
            vq_params, _, _ = loop.train_vq_nfr(
                cfg, nfr_params, train_views, vali_views, vq_out)
        if "ref_nfr" in phases:
            if vq_params is None:
                vq_params = _load_phase_params(vq_out, cfg, "vq_nfr")
            light = np.load(
                os.path.join(vq_out, "vis_vali", "np_light.npy"))
            t_views = views("train", with_ref=True)
            v_views = views("vali", with_ref=True)[:8]
            if debug:
                t_views, v_views = t_views[:1], v_views[:1]
            loop.train_ref_nfr(cfg, vq_params, light, t_views, v_views,
                               ref_out)


def _load_phase_params(outdir, cfg, phase):
    from .utils import ckpt as ckpt_util

    latest = ckpt_util.latest_ckpt(outdir)
    if latest is None:
        raise FileNotFoundError(f"no checkpoint under {outdir}")
    raw = ckpt_util.load_ckpt(latest)
    return raw["params"]


def cmd_test(args):
    from .data.shape_dataset import ShapeDataset
    from .pipelines.test_driver import run_test
    from .utils import ckpt as ckpt_util

    cfg, _ = vcfg.decomp_config_for_scene(args.scene)
    cfg = _apply_preset_overrides(cfg, getattr(args, "preset_override", ""))
    surf_root = args.surf_root or vcfg.surf_dir(
        os.path.join(args.output_root, "surf"), args.scene)
    vq_out = vcfg.train_outdir(args.output_root, args.scene, "vq_nfr")
    ref_out = vcfg.train_outdir(args.output_root, args.scene, "ref_nfr")
    ref_state = ckpt_util.load_ckpt(ckpt_util.latest_ckpt(ref_out))
    vq_state = ckpt_util.load_ckpt(ckpt_util.latest_ckpt(vq_out))

    import glob
    epoch_dirs = sorted(
        glob.glob(os.path.join(vq_out, "vis_vali", "epoch*")))
    ds = ShapeDataset(args.data_root, surf_root, data_type=cfg.data_type,
                      imh=cfg.imh, white_bg=cfg.white_bg, mode="test",
                      with_ref=True)
    if not ds.files:
        raise SystemExit(
            f"no test views: expected {args.data_root}/val_NNN/"
            f"metadata.json with buffers under {surf_root}")
    outroot = os.path.join(ref_out, "vis_test", "latest")
    run_test(ref_state["params"], vq_state["params"], cfg, ds, outroot,
             args.test_envmap_dir,
             vali_epoch_dir=epoch_dirs[-1] if epoch_dirs else None,
             data_root=args.data_root, scene_name=args.scene)


def cmd_ini_train(args):
    """INI-driven training entry mirroring the reference's
    `trainvali.py --config=<model>.ini --config_override=k=v,...`
    (trainvali.py:54-90): model/dataset/paths all come from the INI."""
    import numpy as _np

    from .data.shape_dataset import ShapeDataset
    from .train import loop

    cfg, raw = vcfg.decomp_config_from_ini(args.config,
                                           args.config_override)
    model = raw.get("model", "nfr_unit")
    data_root = raw["data_root"]
    surf_root = raw["data_nerf_root"]
    outroot = raw.get("outroot", "./output/train/run")
    xname = raw.get("xname", "lr{lr}").format(**raw)
    outdir = os.path.join(outroot, xname)
    debug = bool(getattr(args, "debug", False))
    if debug:  # trainvali.py:60-61, 233-236 --debug semantics
        from dataclasses import replace
        cfg = replace(cfg, epochs=1, device_views="off",
                      epoch_scan=False, device_sampling=False)
        print("[vqnerf-tpu] --debug: eager (jax.disable_jit), 1 epoch, "
              "single train view", file=sys.stderr)

    def views(mode, with_ref=False):
        ds = ShapeDataset(data_root, surf_root, data_type=cfg.data_type,
                          imh=cfg.imh, white_bg=cfg.white_bg, mode=mode,
                          with_ref=with_ref)
        vs = [ds.load_view(f) for f in ds.files]
        return vs[:1] if debug else vs

    import contextlib

    import jax
    with jax.disable_jit() if debug else contextlib.nullcontext():
        if model == "nfr_unit":
            loop.train_nfr_unit(cfg, views("train"), views("vali")[:8],
                                outdir)
        elif model == "vq_nfr":
            nfr_params = _load_phase_params(
                os.path.dirname(os.path.dirname(raw["nfr_model_ckpt"])),
                cfg, "nfr_unit")
            loop.train_vq_nfr(cfg, nfr_params, views("train"),
                              views("vali")[:8], outdir,
                              cluster_path=raw.get("cluster_center_path"))
        elif model == "ref_nfr":
            vq_dir = os.path.dirname(
                os.path.dirname(raw["nfr_model_ckpt"]))
            vq_params = _load_phase_params(vq_dir, cfg, "vq_nfr")
            light = _np.load(
                os.path.join(vq_dir, "vis_vali", "np_light.npy"))
            loop.train_ref_nfr(cfg, vq_params, light,
                               views("train", with_ref=True),
                               views("vali", with_ref=True)[:8], outdir)
        else:
            raise NotImplementedError(model)


def cmd_edit_server(args):
    """Run the material-editing server over a trained scene
    (scripts/edit.sh equivalent): polls <root>/status/status.json."""
    from .data.shape_dataset import ShapeDataset
    from .pipelines.edit import edit_server_loop
    from .pipelines.test_driver import load_novel_lights
    from .utils import ckpt as ckpt_util

    cfg, _ = vcfg.decomp_config_for_scene(args.scene)
    surf_root = args.surf_root or vcfg.surf_dir(
        os.path.join(args.output_root, "surf"), args.scene)
    vq_out = vcfg.train_outdir(args.output_root, args.scene, "vq_nfr")
    ref_out = vcfg.train_outdir(args.output_root, args.scene, "ref_nfr")
    ref_state = ckpt_util.load_ckpt(ckpt_util.latest_ckpt(ref_out))
    vq_state = ckpt_util.load_ckpt(ckpt_util.latest_ckpt(vq_out))
    ds = ShapeDataset(args.data_root, surf_root, data_type=cfg.data_type,
                      imh=cfg.imh, white_bg=cfg.white_bg, mode="test",
                      with_ref=True)
    views = [ds.load_view(f) for f in ds.files]
    probes = probe_names = None
    if args.test_envmap_dir:
        import jax.numpy as jnp
        probe_names, probes_np, _, _ = load_novel_lights(
            args.test_envmap_dir, cfg.light_h, white_bg=cfg.white_bg)
        probes = jnp.asarray(probes_np)
    print("edit server: polling", os.path.join(args.root, "status"))
    edit_server_loop(ref_state["params"], vq_state["params"], cfg, views,
                     args.root, novel_probes=probes,
                     probe_names=probe_names)


def cmd_gen_z(args):
    """Export per-view albedo/spec/rough (+ latents) from a trained
    nfr_unit (reference gen_z.py driver)."""
    from .data.shape_dataset import ShapeDataset
    from .pipelines.gen_z import export_materials

    cfg, _ = vcfg.decomp_config_for_scene(args.scene)
    surf_root = args.surf_root or vcfg.surf_dir(
        os.path.join(args.output_root, "surf"), args.scene)
    nfr_out = vcfg.train_outdir(args.output_root, args.scene, "nfr_unit")
    nfr_params = _load_phase_params(nfr_out, cfg, "nfr_unit")
    ds = ShapeDataset(args.data_root, surf_root, data_type=cfg.data_type,
                      imh=cfg.imh, white_bg=cfg.white_bg, mode=args.mode)
    views = [ds.load_view(f) for f in ds.files]
    outroot = args.outdir or os.path.join(nfr_out, "gen_z")
    dirs = export_materials(nfr_params, cfg, views, outroot,
                            gen_z=args.gen_z)
    print(f"gen-z: wrote {len(dirs)} views under {outroot}")


def cmd_reselect_main(args):
    """Re-run the elbow selection over a finished vq_nfr validation epoch
    and move the main_<k> marker (reference gen_main.py driver)."""
    from .pipelines.gen_main import reselect_main

    cfg, _ = vcfg.decomp_config_for_scene(args.scene)
    if args.vali_epoch_dir:
        epoch_dir = args.vali_epoch_dir
    else:
        vq_out = vcfg.train_outdir(args.output_root, args.scene, "vq_nfr")
        vali = os.path.join(vq_out, "vis_vali")
        epochs = sorted(d for d in os.listdir(vali)
                        if d.startswith("epoch"))
        if not epochs:
            raise FileNotFoundError(f"no epoch dirs under {vali}")
        epoch_dir = os.path.join(vali, epochs[-1])
    best_thres = (args.best_thres if args.best_thres is not None
                  else cfg.best_thres)
    k = reselect_main(epoch_dir, cfg.num_embed, cfg.num_drop, best_thres,
                      apply=not args.dry_run)
    print(f"reselect-main: k={k} ({'dry run' if args.dry_run else 'applied'})"
          f" in {epoch_dir}")


def cmd_edit_ui(args):
    """Serve the browser editing frontend (ui4.py counterpart) against a
    running edit-server's workspace."""
    from .pipelines.edit_web import serve_edit_ui

    serve_edit_ui(args.root, args.views_dir, port=args.port,
                  envs=[e.strip() for e in args.envs.split(",") if e],
                  host=args.host)


def cmd_gen_video(args):
    """Render a video trajectory (nerfactor/gen_video.py equivalent)."""
    import numpy as _np

    from .data.shape_dataset import VideoDataset
    from .pipelines.gen_video import compose_video, render_video
    from .pipelines.test_driver import load_novel_lights
    from .utils import ckpt as ckpt_util

    cfg, _ = vcfg.decomp_config_for_scene(args.scene)
    cfg = _apply_preset_overrides(cfg, getattr(args, "preset_override", ""))
    vq_out = vcfg.train_outdir(args.output_root, args.scene, "vq_nfr")
    ref_out = vcfg.train_outdir(args.output_root, args.scene, "ref_nfr")
    ref_state = ckpt_util.load_ckpt(ckpt_util.latest_ckpt(ref_out))
    vq_state = ckpt_util.load_ckpt(ckpt_util.latest_ckpt(vq_out))
    ds = VideoDataset(args.video_root, data_type=cfg.data_type,
                      imh=cfg.imh, white_bg=cfg.white_bg)
    views = [ds.load_view(f) for f in ds.files]
    probes = probe_names = olats = olat_names = None
    if args.test_envmap_dir:
        import jax.numpy as jnp
        probe_names, probes_np, olat_names, olats_np = load_novel_lights(
            args.test_envmap_dir, cfg.light_h, white_bg=cfg.white_bg)
        probes, olats = jnp.asarray(probes_np), jnp.asarray(olats_np)
    edit_material = edit_masks = None
    if args.mode == "edit":
        # edit workspace layout (reference gen_video.py:218-256): the
        # edit server's dst.json material + per-frame mask npys
        import json as _json
        edit_root = args.edit_root
        if edit_root is None:
            raise SystemExit("--mode edit requires --edit-root "
                             "(the workspace holding dst.json + "
                             "test_NNN.npy masks)")
        with open(os.path.join(edit_root, "dst.json")) as f:
            edit_material = _json.load(f)
        edit_masks = []
        for i in range(len(views)):
            mp = os.path.join(edit_root, "test_%03d.npy" % i)
            if not os.path.exists(mp):
                raise SystemExit(f"--mode edit: missing mask {mp}")
            edit_masks.append(
                np.load(mp).reshape(-1, 3).astype(np.float32))
        if args.dst_env and args.dst_env != "original" \
                and probe_names is None:
            raise SystemExit("--dst-env needs --test-envmap-dir")
    opt_scale = None
    if args.opt_scale:
        import jax.numpy as jnp
        opt_scale = jnp.asarray(
            [float(x) for x in args.opt_scale.split(",")], jnp.float32)
    outroot = os.path.join(ref_out, "vis_video", args.mode)
    dirs = render_video(
        args.mode, cfg, views, outroot, ref_params=ref_state["params"],
        vq_params=vq_state["params"], n_vq=args.n_vq,
        novel_probes=probes, probe_names=probe_names,
        novel_olat=olats, olat_names=olat_names, opt_scale=opt_scale,
        edit_material=edit_material, edit_masks=edit_masks,
        dst_env_name=args.dst_env)
    if args.mode in ("recon", "gen_comps"):
        compose_video(dirs, "pred_rgb.png",
                      os.path.join(outroot, "video.avi"), fps=args.fps)


def cmd_metric_eval(args):
    from .eval.metric_eval import eval_dataset
    scores = eval_dataset(
        args.scenes.split(","), args.family, args.pred_root,
        args.gt_root, out_json=args.out_json, model_name=args.model)
    import numpy as _np
    print("lpips_impl:", scores.get("_lpips_impl", "proxy"))
    for scene, bufs in scores.items():
        if scene.startswith("_"):
            continue
        for buf, ms in bufs.items():
            if ms["psnr"]:
                print(scene, buf,
                      "psnr %.2f" % _np.mean(ms["psnr"]),
                      "ssim %.4f" % _np.mean(ms["ssim"]),
                      "lpips %.4f" % _np.mean(ms["lpips"]))


def cmd_cluster_eval(args):
    import json as _json

    from .eval.cluster_eval import eval_scene_segmentation
    out = {}
    for scene in args.scenes.split(","):
        m = eval_scene_segmentation(
            os.path.join(args.rgba_root, scene),
            os.path.join(args.label_root, scene),
            os.path.join(args.pred_root, scene))
        out[scene] = m
        print(scene, m)
    os.makedirs(os.path.dirname(args.out_json) or ".", exist_ok=True)
    with open(args.out_json, "w") as f:
        _json.dump({"vq": out}, f)


def main(argv=None):
    ap = argparse.ArgumentParser("vqnerf-tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("geo-train")
    _add_common(p)
    p.add_argument("--end-iter", type=int, default=0)
    p.add_argument("--geo-override", default="",
                   help="k=v,... overrides onto NeuSTrainConfig")
    p.add_argument("--n-samples", type=int, default=0,
                   help="shrink the sampler for smoke runs")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax profiler trace (TensorBoard)")
    p.set_defaults(fn=cmd_geo_train)

    p = sub.add_parser("gen-geo")
    _add_common(p)
    p.add_argument("--num-p", type=int, default=None)
    p.add_argument("--p-i", type=int, default=None)
    p.add_argument("--no-vis", action="store_true")
    p.add_argument("--geo-override", default="")
    p.add_argument("--n-samples", type=int, default=0)
    p.add_argument("--fast-vis", action="store_true",
                   help="two-pass lvis: coarse SDF sweep certifies free "
                        "shadow rays; full render only on the rest "
                        "(DEFAULT for CG lvis extraction)")
    p.add_argument("--no-fast-vis", action="store_true",
                   help="force the full occlusion render on every "
                        "front-lit shadow ray")
    p.add_argument("--vis-sampler", default=None,
                   help="occlusion-render sampler for lvis, e.g. "
                        "'32+16r2' (default: the geometry render's "
                        "parity config; validate alternatives with "
                        "scripts/validate_fastvis.py --vis-sampler)")
    p.add_argument("--occ-vis", action="store_true",
                   help="draw the occlusion render's initial samples "
                        "from the SDF-occupancy PDF (multi-interval), "
                        "keeping reduced --vis-sampler configs dense "
                        "wherever the surface can be")
    p.add_argument("--span-vis", action="store_true",
                   help="tighten each shadow ray's [near,far] to its "
                        "occupancy-grid span and zero rays crossing no "
                        "occupied cell (the lever that makes a reduced "
                        "--vis-sampler safe; validate with "
                        "scripts/validate_fastvis.py)")
    p.add_argument("--fast-vis-factor", type=float, default=2.0,
                   help="safety factor on the coarse certification "
                        "margin (>= 1; higher = more conservative)")
    p.add_argument("--fast-vis-occluded", action="store_true",
                   help="also certify provably-OCCLUDED shadow rays "
                        "from the coarse sweep (an interior chord of "
                        "two consecutive samples <= -max(margin, 10/s) "
                        "forces transmittance < 5e-5): lvis=0 without "
                        "the fine render; validate with "
                        "scripts/validate_fastvis.py --occluded")
    p.add_argument("--fast-vis-refine", type=int, default=64,
                   help="second-stage certification: sample count of "
                        "the finer sweep run on rays the coarse pass "
                        "leaves uncertain (same exact-by-construction "
                        "margin rule at 1/4 the spacing); 0 disables")
    p.add_argument("--devices", default=None,
                   help="'all' or a device count: shard the ray axis of "
                        "each view's render over a device mesh (replaces "
                        "the reference's per-process GPU split within one "
                        "host; compose with --num-p/--p-i across hosts). "
                        "Default: 1 single-host, 'all' with --num-hosts")
    p.add_argument("--pallas", action="store_true",
                   help="use the fused pallas SDF kernel for the forward "
                        "(no-grad) render passes")
    p.add_argument("--num-hosts", type=int, default=None,
                   help="join a jax.distributed process group of this "
                        "many hosts; views shard across hosts, rays "
                        "across each host's local devices (auto-detected "
                        "on Cloud TPU pods when --coordinator is given "
                        "alone)")
    p.add_argument("--coordinator", default=None,
                   help="host:port of the jax.distributed coordinator "
                        "(process 0)")
    p.add_argument("--host-id", type=int, default=None,
                   help="this host's process index in the group")
    p.set_defaults(fn=cmd_gen_geo)

    p = sub.add_parser("decomp-train")
    _add_common(p)
    p.add_argument("--phase", default="all",
                   choices=["all", "nfr_unit", "vq_nfr", "ref_nfr"])
    p.add_argument("--surf-root", default=None)
    p.add_argument("--epochs", type=int, default=0)
    p.add_argument("--preset-override", default="",
                   help="k=v,... overrides onto the family preset")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax profiler trace (TensorBoard)")
    p.add_argument("--debug", action="store_true",
                   help="eager step (jax.disable_jit), 1 epoch, single "
                   "train view — the reference's trainvali.py --debug")
    p.set_defaults(fn=cmd_decomp_train)

    p = sub.add_parser("test")
    _add_common(p)
    p.add_argument("--surf-root", default=None)
    p.add_argument("--test-envmap-dir", required=True)
    p.add_argument("--preset-override", default="")
    p.set_defaults(fn=cmd_test)

    p = sub.add_parser("ini-train")
    p.add_argument("--config", required=True)
    p.add_argument("--config-override", default="")
    p.add_argument("--debug", action="store_true",
                   help="eager step, 1 epoch, single train view "
                   "(trainvali.py --debug)")
    p.set_defaults(fn=cmd_ini_train)

    p = sub.add_parser("edit-server")
    _add_common(p)
    p.add_argument("--surf-root", default=None)
    p.add_argument("--root", required=True,
                   help="edit workspace (status/ + edited/)")
    p.add_argument("--test-envmap-dir", default=None)
    p.set_defaults(fn=cmd_edit_server)

    p = sub.add_parser("gen-z", help="export nfr_unit materials/latents")
    _add_common(p)
    p.add_argument("--surf-root", default=None)
    p.add_argument("--mode", default="train",
                   choices=["train", "vali", "test"])
    p.add_argument("--outdir", default=None)
    p.add_argument("--gen-z", action="store_true",
                   help="also dump the z_bias latents")
    p.set_defaults(fn=cmd_gen_z)

    p = sub.add_parser("reselect-main",
                       help="re-run elbow selection on a vq vali epoch")
    p.add_argument("scene")
    p.add_argument("--output-root", default="./output")
    p.add_argument("--vali-epoch-dir", default=None,
                   help="explicit epoch dir (default: latest)")
    p.add_argument("--best-thres", type=float, default=None)
    p.add_argument("--dry-run", action="store_true")
    p.set_defaults(fn=cmd_reselect_main)

    p = sub.add_parser("edit-ui", help="browser frontend for edit-server")
    p.add_argument("--root", required=True,
                   help="edit workspace shared with edit-server")
    p.add_argument("--views-dir", required=True,
                   help="test pass with batch%%09d/pred_rgb.png + "
                        "pred_embed.npy (e.g. .../pd_vq)")
    p.add_argument("--port", type=int, default=8008)
    p.add_argument("--host", default="127.0.0.1",
                   help="bind address; submits trigger server-side compute, "
                        "so non-loopback exposure must be explicit")
    p.add_argument("--envs", default="original",
                   help="comma-separated illumination names the server "
                        "was started with")
    p.set_defaults(fn=cmd_edit_ui)

    p = sub.add_parser("gen-video")
    _add_common(p)
    p.add_argument("--video-root", required=True)
    p.add_argument("--mode", default="gen_comps",
                   choices=["recon", "relight", "edit", "vq_dcomps",
                            "gen_comps"])
    p.add_argument("--n-vq", type=int, default=None)
    p.add_argument("--fps", type=int, default=24)
    p.add_argument("--test-envmap-dir", default=None)
    p.add_argument("--edit-root", default=None,
                   help="edit workspace with dst.json + test_NNN.npy "
                        "masks (required for --mode edit)")
    p.add_argument("--dst-env", default=None,
                   help="envmap name to relight the edit under "
                        "('original' = trained light)")
    p.add_argument("--opt-scale", default=None,
                   help="r,g,b albedo scale (test driver's "
                        "compute_rgb_scales output)")
    p.add_argument("--preset-override", default="")
    p.set_defaults(fn=cmd_gen_video)

    p = sub.add_parser("geo-video",
                       help="stage-1 trajectory geometry extraction "
                            "(geo gen_video.py / dtu_video.py)")
    _add_common(p)
    p.add_argument("--no-vis", action="store_true")
    p.add_argument("--no-fast-vis", action="store_true")
    p.add_argument("--geo-override", default="")
    p.add_argument("--n-samples", type=int, default=0)
    p.add_argument("--pallas", action="store_true")
    p.set_defaults(fn=cmd_geo_video)

    p = sub.add_parser("metric-eval")
    p.add_argument("--family", required=True,
                   choices=["nerf", "mat", "dtu", "ours", "hw"])
    p.add_argument("--scenes", required=True,
                   help="comma-separated scene names")
    p.add_argument("--pred-root", required=True)
    p.add_argument("--gt-root", required=True)
    p.add_argument("--out-json", default="scores/ref_nfr.json")
    p.add_argument("--model", default="ref_nfr")
    p.set_defaults(fn=cmd_metric_eval)

    p = sub.add_parser("cluster-eval")
    p.add_argument("--scenes", required=True)
    p.add_argument("--rgba-root", required=True)
    p.add_argument("--label-root", required=True)
    p.add_argument("--pred-root", required=True)
    p.add_argument("--out-json", default="cluster.json")
    p.set_defaults(fn=cmd_cluster_eval)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
