"""Stage-1 NeuS training driver.

Parity target: geo/NeuS-ours2/nerf_runner.py (Runner): random-ray batches
cycling a view permutation, warm-up+cosine LR, checkpoint every save_freq,
validate_image every val_freq (full-view render of rgb/normal writing
validations_fine/ and normals/), resume from latest ckpt (--is_continue).

TPU-native: the jitted train step consumes host-sampled ray batches; the
image validation reuses the GeoExtractor's batched renderer.
"""

import os
from os.path import join

import jax
import jax.numpy as jnp
import numpy as np

from ..models.neus import NeuSConfig, neus_render
from ..utils import ckpt as ckpt_util
from .neus_trainer import (NeuSTrainConfig, init_neus_opt_state,
                           make_neus_train_step)

__all__ = ["NeuSRunner"]


class NeuSRunner:
    def __init__(self, cfg: NeuSConfig, tcfg: NeuSTrainConfig, dataset,
                 base_exp_dir, val_dataset=None, seed=0):
        from ..models.neus import init_neus

        self.cfg = cfg
        self.tcfg = tcfg
        self.dataset = dataset
        self.val_dataset = val_dataset
        self.base_exp_dir = base_exp_dir
        self.rng = np.random.RandomState(seed)
        self.key = jax.random.PRNGKey(seed)
        self.params = init_neus(seed, cfg)
        self.opt_state = init_neus_opt_state(self.params)
        self.iter_step = 0
        self.radius = float(dataset.max_radius)
        self._with_occ = tcfg.occ_res > 0
        self._adaptive = tcfg.adaptive_empty and self._with_occ
        self._active_cap = None
        self._fn_cache = {}

        # two-phase sampler schedule (NeuSTrainConfig.tail_frac): the
        # tail trains under tail_sampler, with occ guidance off unless
        # tcfg.tail_occ keeps it on (dense occupancy-placed tail)
        self._tail_cfg = None
        if tcfg.tail_frac > 0.0 and tcfg.tail_sampler:
            import dataclasses

            from ..config import parse_sampler_spec
            self._tail_cfg = dataclasses.replace(
                cfg, **parse_sampler_spec(tcfg.tail_sampler,
                                          what="tail_sampler"))

        # auto carve-tier (NeuSTrainConfig.carve_auto): None = probe
        # pending at the first grid rebuild past warm_up_end; the probe
        # is RNG-free so a no-switch decision leaves the run
        # bit-identical to carve_auto=False
        self._carve_alt = None if (tcfg.carve_auto
                                   and self._with_occ) else False
        self._alt_cfg = None
        if tcfg.carve_auto and self._with_occ:
            import dataclasses

            from ..config import parse_sampler_spec
            from ..ops.occupancy import interior_fraction
            self._alt_cfg = dataclasses.replace(
                cfg, **parse_sampler_spec(tcfg.carve_alt_sampler,
                                          what="carve_alt_sampler"))
            probe_res = tcfg.carve_probe_res or tcfg.occ_res
            self._int_frac = jax.jit(lambda p: interior_fraction(
                p, cfg.sdf, self.radius, res=probe_res,
                margin_factor=tcfg.occ_margin))

        def _step_fns(k, cap=None, tail=False):
            alt = bool(self._carve_alt) and not tail
            ck = (k, cap, tail, alt)
            if ck not in self._fn_cache:
                from .neus_trainer import make_neus_multi_step
                c = (self._tail_cfg if tail
                     else self._alt_cfg if alt else cfg)
                occ = self._with_occ and (not tail or tcfg.tail_occ)
                if k == 1:
                    fn = make_neus_train_step(
                        c, tcfg, self.radius, with_occ=occ,
                        active_cap=cap)
                else:
                    fn = make_neus_multi_step(
                        c, tcfg, self.radius, k,
                        with_occ=occ, active_cap=cap)
                self._fn_cache[ck] = jax.jit(fn)
            return self._fn_cache[ck]

        self._step_fns = _step_fns
        self._step_fn = _step_fns(1)  # jit is lazy; kept for direct use
        self._occ_grid = None
        self._occ_built_at = -1
        if self._with_occ:
            from ..ops.occupancy import build_occ_grid
            self._build_occ = jax.jit(lambda p: build_occ_grid(
                p, cfg.sdf, radius=self.radius, res=tcfg.occ_res,
                margin_factor=tcfg.occ_margin))
        if self._adaptive:
            from ..ops.occupancy import ray_occupied_span
            self._probe_rng = np.random.RandomState(seed + 17)

            @jax.jit
            def _probe_frac(grid, ro, rd, near, far):
                _, _, any_occ = ray_occupied_span(
                    ro, rd, near, far, grid, self.radius)
                return jnp.mean(any_occ)

            self._probe_frac = _probe_frac

        self._val_fns = {}

        def _render_val_for(rcfg):
            """Jitted full-config validation render, cached per render
            config. Training may use a cheap occupancy-guided sampler,
            but downstream consumers (GeoExtractor, cli.py::_geo_cfgs)
            render with the reference-parity sampler — validating with
            an explicit render_cfg measures the trained SDF the way
            production will actually render it."""
            key_ = rcfg
            if key_ not in self._val_fns:
                @jax.jit
                def _render_val(params, rays_o, rays_d, near, far):
                    bg = jnp.ones((1, 3)) if tcfg.use_white_bkgd else None
                    out = neus_render(params, rcfg, rays_o, rays_d, near,
                                      far, self.radius, key=None,
                                      cos_anneal_ratio=1.0,
                                      background_rgb=bg)
                    return {"color": out["color_fine"],
                            "weight_sum": out["weight_sum"]}
                self._val_fns[key_] = _render_val
            return self._val_fns[key_]

        self._render_val_for = _render_val_for
        self._render_val = _render_val_for(cfg)

    def _pick_cap(self):
        """Active capacity for the two-tier adaptive step
        (NeuSTrainConfig.adaptive_empty): probe the active-ray fraction
        on a few random views against the FRESH occupancy grid, take the
        max, add margin, and quantize UP to batch/8 — at most 8 compiled
        step variants per K, and active rays beyond a stale cap degrade
        gracefully into the cheap tier (observable as overflow_frac).
        Returns None (plain full-budget step) when everything is active,
        e.g. early training when the grid is still a fat sphere band."""
        import math

        ds = self.dataset
        fracs = []
        for _ in range(4):
            img = int(self._probe_rng.randint(ds.n_images))
            data = ds.gen_random_rays(
                img, self.tcfg.batch_size, self._probe_rng)
            near, far = ds.near_far(data["rays_o"], data["rays_d"])
            fracs.append(float(self._probe_frac(
                self._occ_grid, jnp.asarray(data["rays_o"]),
                jnp.asarray(data["rays_d"]), jnp.asarray(near),
                jnp.asarray(far))))
        cap_frac = min(1.0, max(fracs) * 1.15 + 0.05)
        cap = math.ceil(cap_frac * 8) / 8.0
        if cap >= 1.0:
            return None
        return int(cap * self.tcfg.batch_size)

    # -- checkpointing (nerf_runner.py:210-232) ----------------------------
    def save_checkpoint(self, subdir=None):
        outdir = (os.path.join(self.base_exp_dir, subdir)
                  if subdir else self.base_exp_dir)
        return ckpt_util.save_ckpt(outdir, self.iter_step, {
            "params": self.params, "opt_state": self.opt_state,
            "iter_step": self.iter_step})

    def try_resume(self):
        latest = ckpt_util.latest_ckpt(self.base_exp_dir)
        if latest:
            state = ckpt_util.load_ckpt(latest, {
                "params": self.params, "opt_state": self.opt_state,
                "iter_step": 0})
            self.params = state["params"]
            self.opt_state = state["opt_state"]
            self.iter_step = int(state["iter_step"])
        return self.iter_step

    # -- training loop (nerf_runner.py:99-175) -----------------------------
    def train(self, n_iters=None, log_every=0, backup_sources=False):
        if backup_sources:
            from ..utils.backup import file_backup
            file_backup(self.base_exp_dir)
        end = n_iters if n_iters is not None else self.tcfg.end_iter
        image_perm = self.rng.permutation(self.dataset.n_images)
        perm_i = self.iter_step % max(len(image_perm), 1)
        history = []
        k_cfg = max(1, self.tcfg.steps_per_dispatch)

        def crossed(freq, n):
            """Did [iter_step-n, iter_step] cross a multiple of freq?"""
            return freq and (self.iter_step // freq
                             > (self.iter_step - n) // freq)

        def host_batch():
            nonlocal perm_i
            img_idx = int(image_perm[perm_i % len(image_perm)])
            data = self.dataset.gen_random_rays(
                img_idx, self.tcfg.batch_size, self.rng)
            near, far = self.dataset.near_far(
                data["rays_o"], data["rays_d"])
            perm_i += 1
            if perm_i % len(image_perm) == 0:
                image_perm[:] = self.rng.permutation(
                    self.dataset.n_images)
            return {**data, "near": near, "far": far,
                    "valid": np.ones((self.tcfg.batch_size, 1),
                                     np.float32)}

        # sampler-schedule boundary (tail phase trains under
        # tcfg.tail_sampler; fraction of the CONFIGURED end_iter so a
        # shorter n_iters debug run stays single-phase)
        tail_start = end
        if self._tail_cfg is not None:
            tail_start = self.tcfg.end_iter - int(
                round(self.tcfg.tail_frac * self.tcfg.end_iter))

        while self.iter_step < end:
            in_tail = self.iter_step >= tail_start
            # a dispatch never straddles end or the schedule boundary;
            # shorter remainders run as single steps (reuses the
            # already-compiled per-step fn instead of compiling a
            # one-off shorter scan)
            phase_end = end if in_tail else min(end, tail_start)
            k = k_cfg if phase_end - self.iter_step >= k_cfg else 1
            use_occ = self._with_occ and (
                not in_tail or self.tcfg.tail_occ)
            if use_occ and (
                    self._occ_grid is None or self.iter_step
                    - self._occ_built_at >= self.tcfg.occ_update_freq):
                self._occ_grid = self._build_occ(self.params["sdf"])
                self._occ_built_at = self.iter_step
                if (self._carve_alt is None
                        and self.iter_step >= self.tcfg.warm_up_end):
                    frac = float(self._int_frac(self.params["sdf"]))
                    self._carve_alt = frac >= self.tcfg.carve_auto_thresh
                    import sys
                    print(
                        "[vqnerf-tpu] auto carve tier: interior "
                        "fraction %.3f at iter %d -> %s" % (
                            frac, self.iter_step,
                            ("switching carve to %s"
                             % self.tcfg.carve_alt_sampler)
                            if self._carve_alt else
                            "keeping the configured carve sampler"),
                        file=sys.stderr)
                if self._adaptive:
                    self._active_cap = self._pick_cap()
            cap = self._active_cap if not in_tail else None
            self.key, sub = jax.random.split(self.key)
            if k > 1:
                batches = [host_batch() for _ in range(k)]
                stacked = {
                    key_: jnp.asarray(np.stack([b[key_] for b in batches]))
                    for key_ in batches[0]}
                args = (self.params, self.opt_state, stacked, sub,
                        jnp.asarray(self.iter_step, jnp.float32))
                if use_occ:
                    args = args + (self._occ_grid,)
                self.params, self.opt_state, metrics = \
                    self._step_fns(k, cap, tail=in_tail)(*args)
            else:
                batch = {key_: jnp.asarray(v)
                         for key_, v in host_batch().items()}
                step_args = (self.params, self.opt_state, batch, sub,
                             jnp.asarray(self.iter_step, jnp.float32))
                if use_occ:
                    step_args = step_args + (self._occ_grid,)
                self.params, self.opt_state, metrics = self._step_fns(
                    1, cap, tail=in_tail)(*step_args)
            self.iter_step += k
            if log_every and crossed(log_every, k):
                from .loop import _sync_scalar_dicts
                # one host transfer for the whole metrics dict (a float()
                # per scalar costs a tunnel round-trip each)
                history.append(_sync_scalar_dicts([metrics])[0])
                # a NaN loss WITH the skip marker means the step guard
                # dropped a poisoned batch and params are intact — only
                # an unguarded non-finite loss is a real divergence
                guarded = history[-1].get("nonfinite_grads", 0.0) > 0.5
                if not guarded and not np.isfinite(history[-1]["loss"]):
                    # divergence guard: keep the failing state for triage
                    # and stop instead of silently corrupting later iters
                    self.save_checkpoint(
                        subdir="debug_failure")
                    raise RuntimeError(
                        f"NeuS: non-finite loss at iter {self.iter_step}: "
                        f"{history[-1]} — failing state saved under "
                        f"debug_failure/; resume from the last good "
                        "checkpoint")
            if crossed(self.tcfg.save_freq, k):
                self.save_checkpoint()
            if self.val_dataset is not None and \
                    crossed(self.tcfg.val_freq, k):
                self.validate_image(0)
            if crossed(self.tcfg.mesh_freq, k):
                self.validate_mesh()
        return history

    # -- validation (nerf_runner.py:234-379, simplified outputs) -----------
    def validate_image(self, idx=0, batch_size=4096, render_cfg=None,
                       tag=""):
        """Full-view validation render.

        render_cfg: optional NeuSConfig overriding the sampler used for
        the render (not for training). Production consumers (GeoExtractor
        via cli._geo_cfgs) always render with the reference-parity
        64+64r4 sampler regardless of the training sampler, so quality
        comparisons between training-sampler defaults must pass the
        parity config here — otherwise they measure val-render
        quadrature, not trained-SDF quality.
        """
        render = (self._render_val if render_cfg is None
                  else self._render_val_for(render_cfg))
        ds = self.val_dataset or self.dataset
        rays_o, rays_d = ds.gen_rays_at(idx)
        h, w = rays_o.shape[:2]
        ro = rays_o.reshape(-1, 3)
        rd = rays_d.reshape(-1, 3)
        colors, wsums = [], []
        for i in range(0, ro.shape[0], batch_size):
            o = ro[i : i + batch_size]
            d = rd[i : i + batch_size]
            pad = batch_size - o.shape[0]
            if pad:
                o = np.pad(o, ((0, pad), (0, 0)))
                d = np.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
            near, far = ds.near_far(o, d)
            out = render(
                self.params, jnp.asarray(o), jnp.asarray(d),
                jnp.asarray(near), jnp.asarray(far))
            c = np.asarray(out["color"])
            s = np.asarray(out["weight_sum"])
            if pad:
                c, s = c[:-pad], s[:-pad]
            colors.append(c)
            wsums.append(s)
        img = np.concatenate(colors).reshape(h, w, 3)
        wsum = np.concatenate(wsums).reshape(h, w)
        outdir = join(self.base_exp_dir, "validations_fine")
        os.makedirs(outdir, exist_ok=True)
        import cv2
        cv2.imwrite(
            join(outdir, "%08d_%d%s.png" % (self.iter_step, idx, tag)),
            (img[..., ::-1] * 256).clip(0, 255).astype(np.uint8))
        return img, wsum

    def validate_mesh(self, resolution=64, threshold=0.0,
                      bound=1.1):
        """Marching-cubes surface extraction (renderer.py:403-408)."""
        from ..ops.marching_cubes import marching_cubes
        from ..models import fields as f

        n = resolution

        @jax.jit
        def sdf_grid(sdf_params, pts):
            return f.sdf_only(sdf_params, pts, self.cfg.sdf)

        lin = np.linspace(-bound * self.radius, bound * self.radius, n)
        xs, ys, zs = np.meshgrid(lin, lin, lin, indexing="ij")
        pts = np.stack([xs, ys, zs], axis=-1).reshape(-1, 3).astype(
            np.float32)
        vals = []
        bs = 65536
        for i in range(0, pts.shape[0], bs):
            chunk = pts[i : i + bs]
            pad = bs - chunk.shape[0]
            if pad:
                chunk = np.pad(chunk, ((0, pad), (0, 0)))
            v = np.asarray(sdf_grid(self.params["sdf"], jnp.asarray(chunk)))
            vals.append(v[: bs - pad] if pad else v)
        u = -np.concatenate(vals).reshape(n, n, n)  # mcubes of -sdf
        verts, tris = marching_cubes(u, threshold)
        # index space -> world
        verts = verts / (n - 1.0) * (2 * bound * self.radius) \
            - bound * self.radius
        outdir = join(self.base_exp_dir, "meshes")
        os.makedirs(outdir, exist_ok=True)
        path = join(outdir, "%08d.ply" % self.iter_step)
        _write_ply(path, verts, tris)
        return verts, tris


def _write_ply(path, verts, tris):
    with open(path, "wb") as fh:
        header = (
            "ply\nformat ascii 1.0\n"
            f"element vertex {len(verts)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            f"element face {len(tris)}\n"
            "property list uchar int vertex_indices\nend_header\n")
        fh.write(header.encode())
        for v in verts:
            fh.write(f"{v[0]} {v[1]} {v[2]}\n".encode())
        for t in tris:
            fh.write(f"3 {t[0]} {t[1]} {t[2]}\n".encode())
