"""Geometry-buffer extraction: render every view's surface buffers and the
512-direction light-visibility map from a trained NeuS model.

Parity target: geo/NeuS-ours2/gen_geo.py:126-380 (and dtu_geo.py for real
scenes, which skip lvis):
  * per view writes rgb.png, xyz.npy/png, normal.npy/png, alpha.png
    (+ lvis.npy/png for CG scenes) into
    surf/<ds>_surf/<scene>/{train,val}_NNN/
  * alpha = weight_sum > thres (0.5 train / cfg val), normals =
    sum(weights * gradients * inside_sphere) normalized + camera-facing
    correction, normal.npy blended onto a normalized-ones background
  * visibility: per fg pixel, a ray is marched from the surface point
    toward each of the 16x32 light directions; lvis = front_lit *
    (1 - weight_sum); far from the bounding-sphere intersection, near =
    min(0.1, far/2) (gen_geo.py:182-257)
  * resumable: views whose 8 outputs exist are skipped
    (check_finished, gen_geo.py:371-380); --num_p/--p_i view sharding

TPU-native: the reference marches ONE light direction per chunk
(lpix_chunk=1, i.e. 512 sequential tiny renders per pixel batch); here all
L lights of a surf-point block render as one [B*L]-ray batch in a single
jitted program — the ray axis shards over the device mesh.
"""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data import io as vio
from ..models.neus import NeuSConfig, neus_render
from ..ops.light import gen_light_xyz

__all__ = ["GeoExtractor", "intersect_sphere_far", "check_finished"]

VIEW_FILES_CG = ["lvis.npy", "lvis.png", "alpha.png", "normal.npy",
                 "normal.png", "rgb.png", "xyz.npy", "xyz.png"]
VIEW_FILES_REAL = ["alpha.png", "normal.npy", "normal.png", "rgb.png",
                   "xyz.npy", "xyz.png"]


def intersect_sphere_far(x, d, r, eps=1e-7):
    """Far intersection distance of ray (x, d) with the radius-r sphere
    (gen_geo.py:346-357)."""
    b = 2.0 * jnp.sum(x * d, axis=-1)
    a = jnp.sum(d * d, axis=-1)
    c = jnp.sum(x * x, axis=-1) - r**2
    denom = jnp.maximum(2 * a, eps)
    disc = jnp.sqrt(jnp.maximum(jnp.square(b) - 4.0 * a * c, 0.0))
    t1 = (-b + disc) / denom
    t2 = (-b - disc) / denom
    return jnp.maximum(t1, t2)[:, None]


def check_finished(view_dir, with_lvis=True):
    files = VIEW_FILES_CG if with_lvis else VIEW_FILES_REAL
    return all(os.path.exists(os.path.join(view_dir, f)) for f in files)


def _pack_bits(m):
    """[B, L] bool -> [B, ceil(L/8)] uint8, MSB-first (np.unpackbits
    order). Shrinks the device->host mask transfer 8x on top of the
    bool-vs-fp32 4x — the axon tunnel runs at ~14-25 MB/s (CLAUDE.md),
    so mask bytes are wall-clock."""
    b, l = m.shape
    pad = (-l) % 8
    if pad:
        m = jnp.pad(m, ((0, 0), (0, pad)))
    w = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    # products/sums stay <= 255, so a uint8 accumulator cannot overflow
    return jnp.sum(m.reshape(b, -1, 8).astype(jnp.uint8) * w, axis=-1,
                   dtype=jnp.uint8)


def _unpack_bits(p, n_bits):
    """Inverse of _pack_bits on host: [B, ceil(L/8)] uint8 -> [B, L]
    bool."""
    return np.unpackbits(np.asarray(p), axis=1)[:, :n_bits].astype(bool)


class GeoExtractor:
    def __init__(self, params, cfg: NeuSConfig, dataset, scene_out_dir,
                 use_white_bkgd=True, batch_size=4096, light_h=16,
                 vis_point_batch=64, alpha_thres_val=0.5,
                 light_tile=None, use_pallas=False, mesh=None,
                 fast_vis=False, fast_vis_factor=2.0, n_coarse=16,
                 fast_vis_occluded=False, fast_vis_refine=64,
                 vis_sampler=None, occ_vis=False,
                 occ_vis_res=64, occ_vis_margin=2.0,
                 span_vis=False, span_bins=32, span_pad=1):
        self.mesh = mesh
        if mesh is not None:
            # replicate params, shard ray batches over the mesh
            from ..parallel import replicate
            params = jax.device_put(params, replicate(mesh))
        self.params = params
        self.cfg = cfg
        self.dataset = dataset
        self.out_dir = scene_out_dir
        self.use_white_bkgd = use_white_bkgd
        self.batch_size = batch_size
        self.vis_point_batch = vis_point_batch
        # max in-flight dispatched batches in the lvis loops: enough to
        # keep host pulls overlapped with device renders, while bounding
        # resident outputs to window*[bs, L] f32 (dispatching ALL
        # batches first scales peak HBM with view pixels)
        self.dispatch_window = 8
        self.alpha_thres_val = alpha_thres_val
        self.fast_vis = fast_vis
        self.fast_vis_factor = fast_vis_factor
        self.n_coarse = n_coarse
        # opt-in second certificate: rays whose coarse sweep finds a
        # provably-interior chord (two consecutive samples <= -c,
        # c = max(margin, 10/s)) are set lvis=0 without the fine render
        self.fast_vis_occluded = fast_vis_occluded
        # Second-stage certification (r5, VERDICT r4 Weak #4): rays the
        # n_coarse sweep leaves uncertain get a finer fast_vis_refine-
        # sample sweep before the full occlusion render. Same
        # exact-by-construction margin rule at 1/4 the spacing — it
        # certifies the grazing-but-clear rays whose min SDF sits
        # between the coarse and fine margins, at ~n_refine/n_coarse
        # the coarse sweep's cost on the uncertain subset only
        # (~7% of a full render vs the ray it may save). 0 = off.
        self.fast_vis_refine = fast_vis_refine
        # Occlusion-render sampler for the lvis shadow pass. The default
        # is the geometry render's own config (reference parity,
        # gen_geo.py:231-238); a reduced sampler like "32+16r2" is a
        # validated ~2.5x lever (scripts/validate_fastvis.py gates it).
        if vis_sampler:
            from dataclasses import replace as _replace

            from ..config import parse_sampler_spec
            vis_cfg = _replace(cfg, **parse_sampler_spec(
                vis_sampler, what="vis_sampler"))
        else:
            vis_cfg = cfg
        self.vis_cfg = vis_cfg
        # occ-guided occlusion: initial shadow-ray samples draw from the
        # SDF-occupancy PDF (ops/occupancy.sample_z_occ — multi-interval,
        # so every occupied band along the ray gets samples), which is
        # what keeps a reduced vis_sampler exact; the uniform floor is
        # the safety net for anything the grid missed
        # span_vis: tighten each shadow ray's [near, far] to its
        # grid-occupied span (ops/occupancy.ray_occupied_span) and zero
        # rays crossing no occupied cell — packs the occlusion render's
        # fixed sample budget into the band where the surface can be,
        # which is what makes a REDUCED vis_sampler dense where it
        # matters. Composes with fast_vis (span applies to the
        # uncertain-ray renders) and occ_vis (PDF-guided samples within
        # the tightened span).
        self.occ_vis = occ_vis
        self.span_vis = span_vis
        vis_grid = None
        if occ_vis or span_vis:
            from ..ops.occupancy import build_occ_grid
            vis_grid = build_occ_grid(
                self.params["sdf"], cfg.sdf,
                radius=float(dataset.max_radius),
                res=occ_vis_res, margin_factor=occ_vis_margin)
        self._vis_grid = vis_grid
        if span_vis:
            from ..ops.occupancy import ray_occupied_span

            def _span(o, d, near, far):
                return ray_occupied_span(
                    o, d, near, far, vis_grid, self.radius,
                    n_bins=span_bins, pad_bins=span_pad)
        else:
            _span = None
        occ_sample_grid = vis_grid if occ_vis else None
        lxyz, _ = gen_light_xyz(light_h, 2 * light_h)
        self.lxyz = jnp.asarray(lxyz.reshape(-1, 3), jnp.float32)
        self.n_lights = self.lxyz.shape[0]
        # tile the light axis so each scan step is a bounded ray batch
        if light_tile is None:
            light_tile = min(self.n_lights, max(
                1, 8192 // max(vis_point_batch, 1)))
        while self.n_lights % light_tile:
            light_tile -= 1
        self.light_tile = light_tile
        self.radius = float(dataset.max_radius)

        bg = jnp.ones((1, 3)) if use_white_bkgd else None

        @jax.jit
        def _render(params, rays_o, rays_d, near, far):
            out = neus_render(
                params, cfg, rays_o, rays_d, near, far, self.radius,
                key=None, cos_anneal_ratio=1.0, background_rgb=bg)
            n_core = cfg.n_samples + cfg.n_importance
            normals = (out["gradients"]
                       * out["weights"][:, :n_core, None]
                       * out["inside_sphere"][..., None])
            normals = jnp.sum(normals, axis=1)
            return {
                "color": out["color_fine"],
                "weight_sum": out["weight_sum"],
                "surf": out["surf"],
                "normal": normals,
            }

        self._render = _render

        @jax.jit
        def _vis_batch(params, surf, normal):
            """[B] surface points x all L lights -> [B, L] visibility.

            Occlusion-only render (no color net / feature), with a
            lax.scan over light tiles so HBM peak is one tile's
            activations regardless of B — one dispatch instead of the
            reference's 512 sequential lpix_chunk=1 renders.
            """
            from ..models.neus import neus_occlusion
            b = surf.shape[0]
            surf2l = self.lxyz[None, :, :] - surf[:, None, :]  # [B, L, 3]
            surf2l = surf2l / jnp.linalg.norm(
                surf2l, axis=-1, keepdims=True)
            lcos = jnp.einsum("blk,bk->bl", surf2l, normal)
            front_lit = (lcos > 0).astype(jnp.float32)

            tile = self.light_tile
            n_tiles = self.n_lights // tile
            # [T, B*tile, 3] light-tile chunks
            d_tiles = surf2l.reshape(b, n_tiles, tile, 3).transpose(
                1, 0, 2, 3).reshape(n_tiles, b * tile, 3)
            o_rep = jnp.repeat(surf, tile, axis=0)  # [B*tile, 3]

            def body(_, d_chunk):
                far = intersect_sphere_far(o_rep, d_chunk, self.radius)
                near = jnp.minimum(
                    jnp.full_like(far, 0.1), far / 2.0)
                if _span is not None:
                    near, far, any_occ = _span(o_rep, d_chunk, near, far)
                occ = neus_occlusion(
                    params, vis_cfg, o_rep, d_chunk, near, far,
                    self.radius, cos_anneal_ratio=1.0,
                    use_pallas=use_pallas, occ_grid=occ_sample_grid)
                if _span is not None:
                    occ = occ * any_occ.reshape(occ.shape)
                return None, occ.reshape(b, tile)

            _, occ_tiles = jax.lax.scan(body, None, d_tiles)
            occu = occ_tiles.transpose(1, 0, 2).reshape(b, self.n_lights)
            return front_lit * (1.0 - occu)

        self._vis_batch = _vis_batch

        # -- fast-vis two-pass kernels (opt-in) ---------------------------
        # A cheap coarse sweep (n_coarse uniform SDF samples per shadow
        # ray, ~20x cheaper than the hierarchical occlusion render)
        # certifies rays that cannot cross the surface: with ~unit-gradient
        # (Eikonal-trained) SDFs, a zero crossing between samples of
        # spacing D requires a sampled value below D/2, so
        # min_sdf >= D/2 * fast_vis_factor (factor >= 1, default 2 for
        # learned-SDF slack) implies fully visible. The expensive
        # occlusion render then runs only on the uncertain rays.
        from ..models import fields as _fields
        n_coarse = self.n_coarse
        fast_vis_occluded = self.fast_vis_occluded

        @jax.jit
        def _coarse_batch(params, surf, normal):
            """[B] points x all L lights -> bit-packed (front_lit,
            uncertain, occluded_certified) masks, each [B, ceil(L/8)]
            uint8 in np.unpackbits order.

            The margin/certificate decisions run ON DEVICE so only 3
            bits per ray-light cross the host link (previously 16 fp32
            bytes: min_sdf/spacing/front/deep — a ~40x transfer cut,
            which matters at the ~14-25 MB/s tunnel this chip sits
            behind; see CLAUDE.md)."""
            b = surf.shape[0]
            surf2l = self.lxyz[None, :, :] - surf[:, None, :]
            surf2l = surf2l / jnp.linalg.norm(surf2l, axis=-1,
                                              keepdims=True)
            lcos = jnp.einsum("blk,bk->bl", surf2l, normal)
            front_lit = lcos > 0

            tile = self.light_tile
            n_tiles = self.n_lights // tile
            d_tiles = surf2l.reshape(b, n_tiles, tile, 3).transpose(
                1, 0, 2, 3).reshape(n_tiles, b * tile, 3)
            o_rep = jnp.repeat(surf, tile, axis=0)

            inv_s = _fields.inv_s_from(params["variance"])

            def body(_, d_chunk):
                far = intersect_sphere_far(o_rep, d_chunk, self.radius)
                near = jnp.minimum(jnp.full_like(far, 0.1), far / 2.0)
                z = near + (far - near) * jnp.linspace(
                    0.0, 1.0, n_coarse)[None, :]
                pts = o_rep[:, None, :] + d_chunk[:, None, :] * z[..., None]
                sdf = _fields.sdf_only(
                    params["sdf"], pts.reshape(-1, 3), cfg.sdf
                ).reshape(o_rep.shape[0], n_coarse)
                spac = (far - near)[:, 0] / (n_coarse - 1)
                # free certificate: min sampled SDF above the
                # spacing/2 * slack margin -> no crossing possible
                margin = 0.5 * self.fast_vis_factor * spac
                lt = jnp.min(sdf, axis=1) < margin
                # occluded certificate: TWO consecutive samples at or
                # below -c mean (unit-gradient x factor slack) the whole
                # interval between them is interior, and c >= 10/s makes
                # the full render's transmittance through it < 5e-5 —
                # such rays are provably lvis ~ 0 (see _lvis_fast)
                c = jnp.maximum(margin, 10.0 / inv_s)[:, None]
                below = sdf <= -c
                deep = jnp.any(below[:, :-1] & below[:, 1:], axis=1)
                return None, (lt.reshape(b, tile), deep.reshape(b, tile))

            _, (lt, dp) = jax.lax.scan(body, None, d_tiles)
            lt = lt.transpose(1, 0, 2).reshape(b, self.n_lights)
            dp = dp.transpose(1, 0, 2).reshape(b, self.n_lights)
            if fast_vis_occluded:
                occluded = front_lit & dp
            else:
                occluded = jnp.zeros_like(front_lit)
            uncertain = front_lit & lt & ~occluded
            return (_pack_bits(front_lit), _pack_bits(uncertain),
                    _pack_bits(occluded))

        from ..models.neus import neus_occlusion

        @jax.jit
        def _occ_chunk(params, o, d):
            """Flat [K] shadow rays -> occlusion [K] (same math as the
            _vis_batch scan body)."""
            far = intersect_sphere_far(o, d, self.radius)
            near = jnp.minimum(jnp.full_like(far, 0.1), far / 2.0)
            if _span is not None:
                near, far, any_occ = _span(o, d, near, far)
            occ = neus_occlusion(
                params, vis_cfg, o, d, near, far, self.radius,
                cos_anneal_ratio=1.0, use_pallas=use_pallas,
                occ_grid=occ_sample_grid)
            if _span is not None:
                occ = occ * any_occ.reshape(occ.shape)
            return occ

        n_refine = self.fast_vis_refine

        @jax.jit
        def _refine_chunk(params, o, d):
            """Flat [K] uncertain shadow rays -> bit-packed (free,
            occluded) certificates from an n_refine-sample sweep.

            Identical margin construction to _coarse_batch at 1/4 the
            spacing: a zero crossing between samples of spacing D needs
            a sampled value below D/2 for a ~unit-gradient SDF, so
            min_sdf >= D/2 * fast_vis_factor certifies fully visible;
            two consecutive samples <= -max(margin, 10/s) certify an
            interior chord whose transmittance the full render would
            put below 5e-5 (lvis ~ 0). Decisions stay on device: 2 bits
            per ray cross the tunnel."""
            far = intersect_sphere_far(o, d, self.radius)
            near = jnp.minimum(jnp.full_like(far, 0.1), far / 2.0)
            if _span is not None:
                near, far, _ = _span(o, d, near, far)
            z = near + (far - near) * jnp.linspace(
                0.0, 1.0, n_refine)[None, :]
            pts = o[:, None, :] + d[:, None, :] * z[..., None]
            sdf = _fields.sdf_only(
                params["sdf"], pts.reshape(-1, 3), cfg.sdf
            ).reshape(o.shape[0], n_refine)
            spac = (far - near)[:, 0] / (n_refine - 1)
            margin = 0.5 * self.fast_vis_factor * spac
            free = jnp.min(sdf, axis=1) >= margin
            inv_s = _fields.inv_s_from(params["variance"])
            c = jnp.maximum(margin, 10.0 / inv_s)[:, None]
            below = sdf <= -c
            deep = jnp.any(below[:, :-1] & below[:, 1:], axis=1)
            return (_pack_bits(free[None, :]),
                    _pack_bits(deep[None, :]))

        self._coarse_batch = _coarse_batch
        self._occ_chunk = _occ_chunk
        self._refine_chunk = _refine_chunk

    # -- geometry ----------------------------------------------------------
    def _render_dispatch(self, rays_o, rays_d):
        """Enqueue every render batch of a view; returns the device
        outputs WITHOUT blocking. Pulling later (while further device
        work is queued behind) overlaps the ~14 MB/s tunnel transfer
        with compute."""
        n = rays_o.shape[0]
        bs = self.batch_size
        device_outs = []
        for i in range(0, n, bs):
            ro = rays_o[i : i + bs]
            rd = rays_d[i : i + bs]
            pad = bs - ro.shape[0]
            if pad:
                ro = np.pad(ro, ((0, pad), (0, 0)))
                rd = np.pad(rd, ((0, pad), (0, 0)), constant_values=1.0)
            near, far = self.dataset.near_far(ro, rd)
            ro_j, rd_j = jnp.asarray(ro), jnp.asarray(rd)
            near_j, far_j = jnp.asarray(near), jnp.asarray(far)
            if self.mesh is not None:
                from ..parallel import batch_sharding
                sh = batch_sharding(self.mesh)
                ro_j, rd_j, near_j, far_j = (
                    jax.device_put(x, sh)
                    for x in (ro_j, rd_j, near_j, far_j))
            out = self._render(self.params, ro_j, rd_j, near_j, far_j)
            device_outs.append((out, pad))
        return device_outs

    @staticmethod
    def _render_pull(device_outs):
        outs = {"color": [], "weight_sum": [], "surf": [], "normal": []}
        for out, pad in device_outs:
            for k in outs:
                v = np.asarray(out[k])
                outs[k].append(v[: v.shape[0] - pad] if pad else v)
        return {k: np.concatenate(v, axis=0) for k, v in outs.items()}

    def _render_full(self, rays_o, rays_d):
        return self._render_pull(self._render_dispatch(rays_o, rays_d))

    def _submit_write(self, job):
        """Run the host encode/IO job on the background writer thread
        when extract_views has one open (the device renders the next
        view meanwhile), synchronously otherwise."""
        writer = getattr(self, "_writer", None)
        if writer is None:
            job()
        else:
            self._pending_writes.append(writer.submit(job))

    def compute_geo(self, idx, view_dir, alpha_thres=0.5, _rendered=None):
        """Render + write the per-view geometry buffers
        (gen_geo.py:259-344)."""
        rays_o, rays_d = self.dataset.gen_rays_at(idx)
        h, w = rays_o.shape[:2]
        if _rendered is None:
            _rendered = self._render_dispatch(
                rays_o.reshape(-1, 3), rays_d.reshape(-1, 3))
        out = self._render_pull(_rendered)

        img_rgb = (out["color"].reshape(h, w, 3) * 256).clip(0, 255)
        mask = np.where(out["weight_sum"] > alpha_thres, 1.0, 0.0)
        img_mask = (mask.reshape(h, w, 1) * 256).clip(0, 255)
        surf = out["surf"].reshape(h, w, 3)

        normal = out["normal"]
        # zero-norm guard: fill with 1/sqrt(3) like dtu_geo's _np_norm
        # (dtu_runner.py:402) instead of NaN-ing on empty rays
        r = np.sqrt(np.sum(normal**2, axis=-1, keepdims=True))
        normal = np.where(r == 0, np.sqrt(1.0 / 3.0), normal / np.maximum(
            r, 1e-12))
        # camera-facing correction (gen_geo.py:359-365)
        surf2c = rays_o.reshape(-1, 3) - out["surf"]
        surf2c = surf2c / np.maximum(
            np.linalg.norm(surf2c, axis=-1, keepdims=True), 1e-12)
        cos = np.sum(surf2c * normal, axis=-1, keepdims=True)
        normal = np.where(cos >= 0, normal, -normal).reshape(h, w, 3)
        # blend onto the normalized-ones background (gen_geo.py:324-327)
        ones = np.ones_like(normal) / math.sqrt(3.0)
        m = img_mask / 255.0
        rot_normal = normal * m + ones * (1.0 - m)
        normal_img = (rot_normal * 128 + 128).clip(0, 255)

        os.makedirs(view_dir, exist_ok=True)

        def _write():
            import cv2
            cv2.imwrite(os.path.join(view_dir, "rgb.png"),
                        img_rgb[..., ::-1].astype(np.uint8))
            cv2.imwrite(os.path.join(view_dir, "xyz.png"),
                        surf[..., ::-1].clip(0, 255).astype(np.uint8))
            np.save(os.path.join(view_dir, "xyz.npy"),
                    surf.astype(np.float32))
            cv2.imwrite(os.path.join(view_dir, "alpha.png"),
                        img_mask[..., 0].astype(np.uint8))
            cv2.imwrite(os.path.join(view_dir, "normal.png"),
                        normal_img[..., ::-1].astype(np.uint8))
            np.save(os.path.join(view_dir, "normal.npy"),
                    rot_normal.astype(np.float32))

        self._submit_write(_write)
        return surf, rot_normal, img_mask / 256.0

    # -- visibility --------------------------------------------------------
    def compute_vis(self, view_dir, surf, normal, mask):
        """512-direction light visibility for fg pixels
        (gen_geo.py:182-257)."""
        h, w = surf.shape[:2]
        alpha = mask[..., 0] > 0
        surf_fg = surf[alpha].astype(np.float32)
        normal_fg = normal[alpha].astype(np.float32)

        if self.fast_vis:
            lvis_hit = self._lvis_fast(surf_fg, normal_fg)
            st = self.last_fast_vis_stats
            import sys
            print("[gen-geo] %s: fast-vis certified %.1f%% of %d "
                  "front-lit shadow rays" % (
                      os.path.basename(view_dir),
                      100.0 * st["certified_frac"],
                      st["front_lit_rays"]), file=sys.stderr)
        else:
            lvis_hit = self._lvis_full(surf_fg, normal_fg)

        lvis = np.zeros((h, w, self.n_lights), np.float32)
        lvis[alpha] = lvis_hit

        def _write():
            import cv2
            lvis_img = (np.mean(lvis, axis=-1, keepdims=True)
                        * 256).clip(0, 255)
            cv2.imwrite(os.path.join(view_dir, "lvis.png"),
                        lvis_img.astype(np.uint8))
            # the big one: h*w*L fp32 (0.5 GB/view at 512px, 512
            # lights) — off the critical path on the writer thread
            np.save(os.path.join(view_dir, "lvis.npy"), lvis)

        os.makedirs(view_dir, exist_ok=True)
        self._submit_write(_write)
        return lvis

    def _lvis_full(self, surf_fg, normal_fg):
        n_fg = surf_fg.shape[0]
        lvis_hit = np.zeros((n_fg, self.n_lights), np.float32)
        bs = self.vis_point_batch
        # dispatch ahead within a bounded window, pulling the oldest as
        # new batches enqueue: transfers overlap the still-running
        # device renders, but at most dispatch_window [bs, L] f32
        # outputs are resident at once (dispatch-ALL-then-pull grows
        # peak HBM by n_fg*L*4 bytes per view — multi-GB at 1024px)
        from collections import deque
        inflight = deque()

        def _pull():
            i, lv_dev = inflight.popleft()
            lv = np.asarray(lv_dev)
            end = min(i + bs, n_fg) - i
            lvis_hit[i : i + end] = lv[:end]

        for i in range(0, n_fg, bs):
            s = surf_fg[i : i + bs]
            nn = normal_fg[i : i + bs]
            pad = bs - s.shape[0]
            if pad:
                s = np.pad(s, ((0, pad), (0, 0)), constant_values=0.5)
                nn = np.pad(nn, ((0, pad), (0, 0)), constant_values=1.0)
            inflight.append((i, self._vis_batch(
                self.params, jnp.asarray(s), jnp.asarray(nn))))
            if len(inflight) >= self.dispatch_window:
                _pull()
        while inflight:
            _pull()
        return lvis_hit

    def _lvis_fast(self, surf_fg, normal_fg):
        """Two-pass visibility: coarse SDF sweep certifies free rays, the
        full occlusion render runs only on the uncertain ones (see the
        kernel comment in __init__). Exact-by-construction on the
        uncertain subset; certified rays get vis = 1."""
        n_fg = surf_fg.shape[0]
        L = self.n_lights
        bs = self.vis_point_batch

        # pass 1: dispatch the coarse sweeps within a bounded window,
        # pulling the bit-packed certificate masks (3 bits/ray-light
        # over the tunnel) as new sweeps enqueue
        from collections import deque
        front = np.zeros((n_fg, L), bool)
        uncertain = np.zeros((n_fg, L), bool)
        occluded = np.zeros((n_fg, L), bool)
        inflight = deque()

        def _pull_packed():
            i, (fp, up, op) = inflight.popleft()
            end = min(i + bs, n_fg) - i
            front[i : i + end] = _unpack_bits(fp, L)[:end]
            uncertain[i : i + end] = _unpack_bits(up, L)[:end]
            occluded[i : i + end] = _unpack_bits(op, L)[:end]

        for i in range(0, n_fg, bs):
            s = surf_fg[i : i + bs]
            nn = normal_fg[i : i + bs]
            pad = bs - s.shape[0]
            if pad:
                s = np.pad(s, ((0, pad), (0, 0)), constant_values=0.5)
                nn = np.pad(nn, ((0, pad), (0, 0)), constant_values=1.0)
            inflight.append((i, self._coarse_batch(
                self.params, jnp.asarray(s), jnp.asarray(nn))))
            if len(inflight) >= self.dispatch_window:
                _pull_packed()
        while inflight:
            _pull_packed()

        occu = np.zeros(n_fg * L, np.float32)
        occu[occluded.ravel()] = 1.0  # provably-occluded: lvis = 0
        u_idx = np.nonzero(uncertain.ravel())[0]
        n_coarse_uncertain = int(u_idx.shape[0])

        lxyz_np = np.asarray(self.lxyz)
        chunk = bs * self.light_tile

        # pass 1.5 (r5): finer certification sweep over the uncertain
        # rays — same margin rule at fast_vis_refine samples (1/4 the
        # coarse spacing), exact by construction; whatever it certifies
        # skips the full render below. The sweep is ~20x cheaper per
        # ray than the occlusion render, so it dispatches in 8x larger
        # chunks — at the occ chunk size a 512px view would need ~2k
        # dispatches whose per-call tunnel latency dwarfs the compute.
        n_refined = 0
        if self.fast_vis_refine and u_idx.shape[0]:
            rchunk = 8 * chunk
            keep = np.ones(u_idx.shape[0], bool)
            inflight = deque()

            def _pull_refine():
                pos, k, (fp, dp) = inflight.popleft()
                free = _unpack_bits(fp, rchunk)[0][:k]
                if self.fast_vis_occluded:
                    deep = _unpack_bits(dp, rchunk)[0][:k]
                    occu[u_idx[pos : pos + k][deep]] = 1.0
                    free = free | deep
                keep[pos : pos + k] = ~free

            for i in range(0, u_idx.shape[0], rchunk):
                idx = u_idx[i : i + rchunk]
                o = surf_fg[idx // L]
                d = lxyz_np[idx % L] - o
                d = d / np.maximum(
                    np.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
                pad = rchunk - idx.shape[0]
                if pad:
                    o = np.pad(o, ((0, pad), (0, 0)),
                               constant_values=0.5)
                    d = np.pad(d, ((0, pad), (0, 0)),
                               constant_values=1.0)
                    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
                inflight.append((i, idx.shape[0], self._refine_chunk(
                    self.params, jnp.asarray(o), jnp.asarray(d))))
                if len(inflight) >= self.dispatch_window:
                    _pull_refine()
            while inflight:
                _pull_refine()
            n_refined = int((~keep).sum())
            u_idx = u_idx[keep]

        # Certification-rate observability: the coarse certificate trusts
        # the Eikonal unit-gradient property, which an under-trained SDF
        # can violate — a near-100% certified fraction on a scene with
        # visible shadows is the red flag to look for in logs.
        n_front = int(front.sum())
        self.last_fast_vis_stats = {
            "front_lit_rays": n_front,
            "uncertain_rays": int(u_idx.shape[0]),
            "coarse_uncertain_rays": n_coarse_uncertain,
            "refine_certified_rays": n_refined,
            "occluded_certified_rays": int(occluded.sum()),
            "certified_frac": 1.0 - u_idx.shape[0] / max(n_front, 1),
        }

        inflight = deque()

        def _pull_occ():
            idx, oc_dev = inflight.popleft()
            oc = np.asarray(oc_dev).reshape(-1)
            occu[idx] = oc[: idx.shape[0]]

        for i in range(0, u_idx.shape[0], chunk):
            idx = u_idx[i : i + chunk]
            o = surf_fg[idx // L]
            d = lxyz_np[idx % L] - o
            d = d / np.maximum(
                np.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
            pad = chunk - idx.shape[0]
            if pad:
                o = np.pad(o, ((0, pad), (0, 0)), constant_values=0.5)
                d = np.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
                d = d / np.linalg.norm(d, axis=-1, keepdims=True)
            inflight.append((idx, self._occ_chunk(
                self.params, jnp.asarray(o), jnp.asarray(d))))
            if len(inflight) >= self.dispatch_window:
                _pull_occ()
        while inflight:
            _pull_occ()
        return front.astype(np.float32) * (1.0 - occu.reshape(n_fg, L))

    # -- driver ------------------------------------------------------------
    def extract_views(self, is_train=True, num_p=None, p_i=None,
                      no_vis=False, resume=True):
        """Extract all views (or this process's shard) — gen_geo.py:126-180.

        Pipelined across views: view N+1's render batches are enqueued
        on the device before view N's host work (mask unpack, numpy
        post-process) runs, and all PNG/npy encode+IO goes through a
        single background writer thread, so the device never idles on
        host encode/write and writes land in submission order (the
        check_finished resume contract is preserved: a view's files
        appear in the same order as the serial path, lvis last).
        Buffers are bit-identical to the serial path — only scheduling
        changes.
        """
        from concurrent.futures import ThreadPoolExecutor

        n_imgs = self.dataset.n_images
        prefix = "train_" if is_train else "val_"
        if num_p is None:
            frame_range = range(n_imgs)
        else:
            p_step = math.ceil(n_imgs / num_p)
            frame_range = range(p_i * p_step, (p_i + 1) * p_step)

        done = []
        todo = []
        for idx in frame_range:
            if idx >= n_imgs:
                break
            view_dir = os.path.join(self.out_dir, "%s%03d" % (prefix, idx))
            if resume and check_finished(view_dir, with_lvis=not no_vis):
                done.append(view_dir)
                continue
            todo.append((idx, view_dir))

        self._writer = ThreadPoolExecutor(max_workers=1,
                                          thread_name_prefix="geo-write")
        self._pending_writes = []
        alpha_thres = 0.5 if is_train else self.alpha_thres_val
        try:
            lookahead = None  # pre-dispatched render of todo[j]
            for j, (idx, view_dir) in enumerate(todo):
                rendered = lookahead
                if rendered is None:
                    ro, rd = self.dataset.gen_rays_at(idx)
                    rendered = self._render_dispatch(
                        ro.reshape(-1, 3), rd.reshape(-1, 3))
                if j + 1 < len(todo):
                    ro, rd = self.dataset.gen_rays_at(todo[j + 1][0])
                    lookahead = self._render_dispatch(
                        ro.reshape(-1, 3), rd.reshape(-1, 3))
                else:
                    lookahead = None
                surf, normal, mask = self.compute_geo(
                    idx, view_dir, alpha_thres=alpha_thres,
                    _rendered=rendered)
                if not no_vis:
                    if is_train:
                        # GT mask for train views (gen_geo.py:175-179)
                        gt_mask = self.dataset.masks[idx][..., :1]
                        self.compute_vis(view_dir, surf, normal, gt_mask)
                    else:
                        self.compute_vis(view_dir, surf, normal, mask)
                done.append(view_dir)
        finally:
            writer = self._writer
            pending = self._pending_writes
            self._writer = None
            self._pending_writes = []
            try:
                for f in pending:
                    f.result()  # surface the first write failure
            finally:
                writer.shutdown(wait=True)
        # frame order (skipped views were collected before processed ones)
        return sorted(done)
