"""NeuS volume renderer: hierarchical SDF up-sampling + logistic-CDF alpha
compositing + Eikonal regularization.

Parity target: geo/NeuS-ours2/models/renderer.py:72-401 (NeuSRenderer).
Key semantics reproduced:
  * uniform n_samples then up_sample_steps rounds of importance sampling
    with inv_s = 64 * 2**i, min-of-adjacent-cos section estimation, and
    deterministic inverse-CDF midpoints (renderer.py:131-175), all under
    stop_gradient (the reference wraps them in no_grad, renderer.py:336)
  * section alpha = clip((sig(prev) - sig(next) + 1e-5)/(sig(prev)+1e-5))
    with cos annealing (renderer.py:236-249)
  * inside-sphere masking, optional background NeRF blending, composited
    color / surf / depth, Eikonal error over relaxed sphere
    (renderer.py:251-282)

TPU-native: the up-sample loop is a static Python loop (static shapes per
round: 64 -> 80 -> 96 -> 112 -> 128 samples); sorting uses jnp.sort /
take_along_axis; everything jits into one program.
"""

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sampling import sample_pdf
from . import fields

__all__ = ["NeuSConfig", "init_neus", "neus_render"]


@dataclass(frozen=True)
class NeuSConfig:
    sdf: fields.SDFConfig = fields.SDFConfig()
    color: fields.ColorConfig = fields.ColorConfig()
    bg: Optional[fields.BgNeRFConfig] = None
    n_samples: int = 64
    n_importance: int = 64
    n_outside: int = 0
    up_sample_steps: int = 4
    perturb: float = 1.0
    variance_init: float = 0.3


def init_neus(seed, cfg: NeuSConfig):
    key = jax.random.PRNGKey(seed)
    k_color, k_bg = jax.random.split(key)
    params = {
        "sdf": fields.init_sdf(seed, cfg.sdf),
        "color": fields.init_color(k_color, cfg.color),
        "variance": fields.init_variance(cfg.variance_init),
    }
    if cfg.n_outside > 0:
        params["bg"] = fields.init_bg_nerf(k_bg, cfg.bg or fields.BgNeRFConfig())
    return params


def _up_sample(rays_o, rays_d, z_vals, sdf, r_limit, n_importance, inv_s):
    """One importance-sampling round (renderer.py:131-175)."""
    batch_size, n_samples = z_vals.shape
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    radius = jnp.linalg.norm(pts, axis=-1)
    inside_sphere = jnp.logical_or(
        radius[:, :-1] < r_limit, radius[:, 1:] < r_limit
    ).astype(z_vals.dtype)
    prev_sdf, next_sdf = sdf[:, :-1], sdf[:, 1:]
    prev_z, next_z = z_vals[:, :-1], z_vals[:, 1:]
    mid_sdf = (prev_sdf + next_sdf) * 0.5
    cos_val = (next_sdf - prev_sdf) / (next_z - prev_z + 1e-5)

    # min(cos, prev_cos): robust section slope (renderer.py:145-163)
    prev_cos = jnp.concatenate(
        [jnp.zeros((batch_size, 1), cos_val.dtype), cos_val[:, :-1]], axis=-1)
    cos_val = jnp.minimum(prev_cos, cos_val)
    cos_val = jnp.clip(cos_val, -1e3, 0.0) * inside_sphere

    dist = next_z - prev_z
    prev_esti = mid_sdf - cos_val * dist * 0.5
    next_esti = mid_sdf + cos_val * dist * 0.5
    prev_cdf = jax.nn.sigmoid(prev_esti * inv_s)
    next_cdf = jax.nn.sigmoid(next_esti * inv_s)
    alpha = (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)
    trans = jnp.cumprod(
        jnp.concatenate(
            [jnp.ones((batch_size, 1), alpha.dtype), 1.0 - alpha + 1e-7],
            axis=-1),
        axis=-1)[:, :-1]
    weights = alpha * trans
    return jax.lax.stop_gradient(
        sample_pdf(z_vals, weights, n_importance))


def _cat_z_vals(params, cfg, rays_o, rays_d, z_vals, new_z_vals, sdf,
                last=False, sdf_fn=None):
    """Merge-and-sort new samples, carrying SDF values (renderer.py:177-191)."""
    if sdf_fn is None:
        sdf_fn = lambda pts: fields.sdf_only(params["sdf"], pts, cfg.sdf)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * new_z_vals[..., None]
    z_all = jnp.concatenate([z_vals, new_z_vals], axis=-1)
    order = jnp.argsort(z_all, axis=-1)
    z_sorted = jnp.take_along_axis(z_all, order, axis=-1)
    if last:
        return z_sorted, None
    new_sdf = sdf_fn(pts.reshape(-1, 3)).reshape(new_z_vals.shape)
    sdf_all = jnp.concatenate([sdf, new_sdf], axis=-1)
    sdf_sorted = jnp.take_along_axis(sdf_all, order, axis=-1)
    return z_sorted, sdf_sorted


def _render_core(params, cfg: NeuSConfig, rays_o, rays_d, z_vals, sample_dist,
                 radius, background_alpha=None, background_color=None,
                 background_rgb=None, cos_anneal_ratio=1.0, to_light=False):
    batch_size, n_samples = z_vals.shape

    dists = z_vals[..., 1:] - z_vals[..., :-1]
    if to_light:
        last = sample_dist  # per-ray [R, 1]
    else:
        last = jnp.full_like(dists[..., :1], sample_dist)
    dists = jnp.concatenate([dists, last], axis=-1)
    mid_z_vals = z_vals + dists * 0.5

    pts = rays_o[:, None, :] + rays_d[:, None, :] * mid_z_vals[..., None]
    dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape)
    pts_flat = pts.reshape(-1, 3)
    dirs_flat = dirs.reshape(-1, 3)

    sdf, feature, gradients = fields.sdf_value_feature_gradient(
        params["sdf"], pts_flat, cfg.sdf)
    sampled_color = fields.color_apply(
        params["color"], pts_flat, gradients, dirs_flat, feature, cfg.color
    ).reshape(batch_size, n_samples, 3)

    inv_s = fields.inv_s_from(params["variance"])

    true_cos = jnp.sum(dirs_flat * gradients, axis=-1, keepdims=True)
    # cos annealing (renderer.py:234-237); always non-positive
    iter_cos = -(
        jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - cos_anneal_ratio)
        + jax.nn.relu(-true_cos) * cos_anneal_ratio
    )

    d_flat = dists.reshape(-1, 1)
    est_next = sdf + iter_cos * d_flat * 0.5
    est_prev = sdf - iter_cos * d_flat * 0.5
    prev_cdf = jax.nn.sigmoid(est_prev * inv_s)
    next_cdf = jax.nn.sigmoid(est_next * inv_s)
    p = prev_cdf - next_cdf
    c = prev_cdf
    alpha = jnp.clip(
        ((p + 1e-5) / (c + 1e-5)).reshape(batch_size, n_samples), 0.0, 1.0)

    pts_radius = jnp.linalg.norm(pts, axis=-1)  # [R, S]
    inside_sphere = jax.lax.stop_gradient(
        (pts_radius < radius).astype(alpha.dtype))
    relax_inside = jax.lax.stop_gradient(
        (pts_radius < radius * 1.1).astype(alpha.dtype))

    if background_alpha is not None:
        alpha = alpha * inside_sphere + background_alpha[:, :n_samples] * (
            1.0 - inside_sphere)
        alpha = jnp.concatenate(
            [alpha, background_alpha[:, n_samples:]], axis=-1)
        sampled_color = sampled_color * inside_sphere[:, :, None] + \
            background_color[:, :n_samples] * (1.0 - inside_sphere)[:, :, None]
        sampled_color = jnp.concatenate(
            [sampled_color, background_color[:, n_samples:]], axis=1)

    trans = jnp.cumprod(
        jnp.concatenate(
            [jnp.ones((batch_size, 1), alpha.dtype), 1.0 - alpha + 1e-7],
            axis=-1),
        axis=-1)[:, :-1]
    weights = alpha * trans
    weights_sum = jnp.sum(weights, axis=-1, keepdims=True)

    color = jnp.sum(sampled_color * weights[:, :, None], axis=1)
    surf = jnp.sum(pts * weights[:, :n_samples, None], axis=1)
    depth = jnp.linalg.norm(surf - rays_o, axis=-1, keepdims=True)

    if background_rgb is not None:
        color = color + background_rgb * (1.0 - weights_sum)

    grad_img = gradients.reshape(batch_size, n_samples, 3)
    gradient_error = (jnp.linalg.norm(grad_img, axis=-1) - 1.0) ** 2
    # un-normalized sum/count too, so a caller rendering a batch in
    # several tiers (adaptive empty-ray skip, neus_trainer) can combine
    # them into the reference's single all-points mean
    grad_err_sum = jnp.sum(relax_inside * gradient_error)
    grad_err_cnt = jnp.sum(relax_inside)
    gradient_error = grad_err_sum / (grad_err_cnt + 1e-5)

    return {
        "color": color,
        "grad_err_sum": grad_err_sum,
        "grad_err_cnt": grad_err_cnt,
        "sdf": sdf,
        "dists": dists,
        "gradients": grad_img,
        "s_val": 1.0 / inv_s,
        "mid_z_vals": mid_z_vals,
        "weights": weights,
        "cdf": c.reshape(batch_size, n_samples),
        "gradient_error": gradient_error,
        "inside_sphere": inside_sphere,
        "surf": surf,
        "depth": depth,
    }


def neus_render(params, cfg: NeuSConfig, rays_o, rays_d, near, far, radius,
                key=None, perturb_overwrite=-1.0, background_rgb=None,
                cos_anneal_ratio=0.0, to_light=False, use_pallas=False,
                occ_grid=None, occ_floor=0.05):
    """Full hierarchical render (renderer.py:299-401).

    near/far: [R, 1]. Returns the reference's output dict. ``key=None``
    disables perturbation regardless of cfg.perturb.

    use_pallas: run the hierarchical up-sampling SDF evaluations through
    the fused Pallas forward kernel. The chain is entirely under
    stop_gradient (renderer.py:336 no_grad), so it is safe inside a
    training grad — all kernel inputs carry zero tangents and JAX never
    asks for the (undefined) kernel VJP. Gated on point counts being
    BLOCK-aligned, like neus_occlusion.

    occ_grid: optional [res,res,res] occupancy grid (ops.occupancy) — the
    initial n_samples are drawn from the grid's per-ray PDF instead of
    uniformly, which lets small n_samples/n_importance configs match the
    64+64 reference quality (the training-throughput lever; grid rebuilt
    periodically by the train loop).
    """
    batch_size = rays_o.shape[0]
    if to_light:
        sample_dist = (far - near) / cfg.n_samples  # [R, 1]
    else:
        sample_dist = 2.0 * radius / cfg.n_samples

    perturb = cfg.perturb if perturb_overwrite < 0 else perturb_overwrite
    z_vals_outside = None
    if cfg.n_outside > 0:
        z_vals_outside = jnp.linspace(
            1e-3, 1.0 - 1.0 / (cfg.n_outside + 1.0), cfg.n_outside)

    if occ_grid is not None:
        from ..ops.occupancy import sample_z_occ
        sub = None
        if perturb > 0 and key is not None:
            key, sub = jax.random.split(key)
        z_vals = sample_z_occ(rays_o, rays_d, near, far, occ_grid, radius,
                              cfg.n_samples, key=sub, floor=occ_floor)
    else:
        z_lin = jnp.linspace(0.0, 1.0, cfg.n_samples)
        z_vals = near + (far - near) * z_lin[None, :]
        if perturb > 0 and key is not None:
            key, sub = jax.random.split(key)
            t_rand = jax.random.uniform(sub, (batch_size, 1)) - 0.5
            z_vals = z_vals + t_rand * 2.0 * radius / cfg.n_samples

    if perturb > 0 and key is not None:
        if cfg.n_outside > 0:
            key, sub = jax.random.split(key)
            mids = 0.5 * (z_vals_outside[1:] + z_vals_outside[:-1])
            upper = jnp.concatenate([mids, z_vals_outside[-1:]])
            lower = jnp.concatenate([z_vals_outside[:1], mids])
            t_rand = jax.random.uniform(sub, (batch_size, cfg.n_outside))
            z_vals_outside = lower[None, :] + (upper - lower)[None, :] * t_rand

    if cfg.n_outside > 0:
        z_vals_outside = far / jnp.flip(z_vals_outside, axis=-1) + \
            1.0 / cfg.n_samples

    n_samples = cfg.n_samples
    background_alpha = None
    background_color = None

    if cfg.n_importance > 0:
        # All under stop_gradient (renderer.py:336 no_grad)
        sdf_fn = None
        if use_pallas:
            from ..ops.pallas.sdf_kernel import BLOCK, sdf_fwd_pallas
            per_step = cfg.n_importance // max(cfg.up_sample_steps, 1)
            if (batch_size * cfg.n_samples) % BLOCK == 0 and \
                    (batch_size * per_step) % BLOCK == 0:
                # stop_gradient on every input: the kernel has no VJP, but
                # zero tangents mean autodiff never requests one
                sdf_params = jax.tree_util.tree_map(
                    jax.lax.stop_gradient, params["sdf"])
                interp = use_pallas == "interpret"  # CPU tests
                sdf_fn = lambda pts: sdf_fwd_pallas(
                    sdf_params, jax.lax.stop_gradient(pts), cfg.sdf,
                    interpret=interp)
        _sdf_eval = sdf_fn or (
            lambda p: fields.sdf_only(params["sdf"], p, cfg.sdf))
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
        sdf = jax.lax.stop_gradient(
            _sdf_eval(pts.reshape(-1, 3))
        ).reshape(batch_size, cfg.n_samples)
        z_cur = z_vals
        for i in range(cfg.up_sample_steps):
            new_z = _up_sample(
                rays_o, rays_d, z_cur, sdf, radius,
                cfg.n_importance // cfg.up_sample_steps, 64 * 2**i)
            z_cur, sdf = _cat_z_vals(
                params, cfg, rays_o, rays_d, z_cur, new_z, sdf,
                last=(i + 1 == cfg.up_sample_steps), sdf_fn=sdf_fn)
            if sdf is not None:
                sdf = jax.lax.stop_gradient(sdf)
        z_vals = jax.lax.stop_gradient(z_cur)
        n_samples = cfg.n_samples + cfg.n_importance

    if cfg.n_outside > 0:
        z_feed = jnp.sort(
            jnp.concatenate([z_vals, z_vals_outside], axis=-1), axis=-1)
        bg = _render_bg(params, cfg, rays_o, rays_d, z_feed,
                        2.0 * radius / cfg.n_samples)
        background_color = bg["sampled_color"]
        background_alpha = bg["alpha"]

    ret = _render_core(
        params, cfg, rays_o, rays_d, z_vals,
        sample_dist, radius,
        background_alpha=background_alpha,
        background_color=background_color,
        background_rgb=background_rgb,
        cos_anneal_ratio=cos_anneal_ratio,
        to_light=to_light)

    weights = ret["weights"]
    weights_sum = jnp.sum(weights, axis=-1, keepdims=True)
    return {
        "color_fine": ret["color"],
        "grad_err_sum": ret["grad_err_sum"],
        "grad_err_cnt": ret["grad_err_cnt"],
        "s_val": jnp.full((batch_size, 1), ret["s_val"]),
        "cdf_fine": ret["cdf"],
        "weight_sum": weights_sum,
        "weight_max": jnp.max(weights, axis=-1, keepdims=True),
        "gradients": ret["gradients"],
        "weights": weights,
        "gradient_error": ret["gradient_error"],
        "inside_sphere": ret["inside_sphere"],
        "surf": ret["surf"],
        "depth": ret["depth"],
    }


def neus_occlusion(params, cfg: NeuSConfig, rays_o, rays_d, near, far,
                   radius, cos_anneal_ratio=1.0, use_pallas=False,
                   occ_grid=None, occ_floor=0.05):
    """weight_sum only — the light-visibility shadow pass (gen_geo
    compute_vis) needs neither the color network nor the feature vector,
    which cuts both FLOPs and the vjp HBM temporaries that cap the
    point batch. Sampling/alpha math identical to neus_render.

    occ_grid: optional occupancy grid — initial samples draw from the
    per-ray occupancy PDF (multi-interval: they land on every occupied
    band the shadow ray crosses, not just the first-to-last span), which
    is what lets a reduced sampler stay exact; the floor keeps uniform
    coverage as a safety net."""
    batch_size = rays_o.shape[0]
    # constant section length — compute_vis calls render() WITHOUT
    # to_light (gen_geo.py:231-238), so sample_dist = 2 r / n
    sample_dist = 2.0 * radius / cfg.n_samples

    # fused Pallas SDF kernels (4x the jnp fwd+grad path); requires every
    # flattened point count to be a multiple of the kernel block
    sdf_fn = None
    fused_fwdgrad = None
    if use_pallas:
        from ..ops.pallas.sdf_kernel import (BLOCK, sdf_fwd_pallas,
                                             sdf_fwdgrad_pallas)
        if (batch_size * cfg.n_samples) % BLOCK == 0 and \
                (batch_size * (cfg.n_importance
                               // max(cfg.up_sample_steps, 1))) % BLOCK \
                == 0:
            interp = use_pallas == "interpret"  # CPU tests
            sdf_fn = lambda pts: sdf_fwd_pallas(
                params["sdf"], pts, cfg.sdf, interpret=interp)
            fused_fwdgrad = lambda pts: sdf_fwdgrad_pallas(
                params["sdf"], pts, cfg.sdf, interpret=interp)

    if occ_grid is not None:
        from ..ops.occupancy import sample_z_occ
        z_vals = sample_z_occ(rays_o, rays_d, near, far, occ_grid,
                              radius, cfg.n_samples, key=None,
                              floor=occ_floor)
    else:
        z_lin = jnp.linspace(0.0, 1.0, cfg.n_samples)
        z_vals = near + (far - near) * z_lin[None, :]

    n_samples = cfg.n_samples
    if cfg.n_importance > 0:
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
        _sdf_eval = sdf_fn or (
            lambda p: fields.sdf_only(params["sdf"], p, cfg.sdf))
        sdf = _sdf_eval(pts.reshape(-1, 3)).reshape(
            batch_size, cfg.n_samples)
        z_cur = z_vals
        for i in range(cfg.up_sample_steps):
            new_z = _up_sample(
                rays_o, rays_d, z_cur, sdf, radius,
                cfg.n_importance // cfg.up_sample_steps, 64 * 2**i)
            z_cur, sdf = _cat_z_vals(
                params, cfg, rays_o, rays_d, z_cur, new_z, sdf,
                last=(i + 1 == cfg.up_sample_steps), sdf_fn=sdf_fn)
        z_vals = z_cur
        n_samples = cfg.n_samples + cfg.n_importance

    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full((batch_size, 1), sample_dist)], axis=-1)
    mid_z_vals = z_vals + dists * 0.5
    pts = rays_o[:, None, :] + rays_d[:, None, :] * mid_z_vals[..., None]
    dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape)
    pts_flat = pts.reshape(-1, 3)

    if fused_fwdgrad is not None:
        sdf_v, gradients = fused_fwdgrad(pts_flat)
        sdf = sdf_v[:, None]
    else:
        sdf = fields.sdf_only(params["sdf"], pts_flat, cfg.sdf)[:, None]
        gradients = fields.sdf_gradient(params["sdf"], pts_flat, cfg.sdf)
    inv_s = fields.inv_s_from(params["variance"])

    true_cos = jnp.sum(
        dirs.reshape(-1, 3) * gradients, axis=-1, keepdims=True)
    iter_cos = -(
        jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - cos_anneal_ratio)
        + jax.nn.relu(-true_cos) * cos_anneal_ratio)
    d_flat = dists.reshape(-1, 1)
    prev_cdf = jax.nn.sigmoid((sdf - iter_cos * d_flat * 0.5) * inv_s)
    next_cdf = jax.nn.sigmoid((sdf + iter_cos * d_flat * 0.5) * inv_s)
    alpha = jnp.clip(
        ((prev_cdf - next_cdf + 1e-5)
         / (prev_cdf + 1e-5)).reshape(batch_size, n_samples), 0.0, 1.0)
    # NOTE: no inside-sphere masking here — _render_core only masks alpha
    # when a background model is present (renderer.py:256-261), and the
    # reference's compute_vis renders without one.
    trans = jnp.cumprod(
        jnp.concatenate(
            [jnp.ones((batch_size, 1), alpha.dtype),
             1.0 - alpha + 1e-7], axis=-1), axis=-1)[:, :-1]
    return jnp.sum(alpha * trans, axis=-1, keepdims=True)


def _render_bg(params, cfg: NeuSConfig, rays_o, rays_d, z_vals, sample_dist):
    """Background NeRF rendering (renderer.py:93-129)."""
    batch_size, n_samples = z_vals.shape
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], sample_dist)], axis=-1)
    mid_z_vals = z_vals + dists * 0.5
    pts = rays_o[:, None, :] + rays_d[:, None, :] * mid_z_vals[..., None]
    dis_to_center = jnp.clip(
        jnp.linalg.norm(pts, axis=-1, keepdims=True), 1.0, 1e10)
    pts4 = jnp.concatenate([pts / dis_to_center, 1.0 / dis_to_center], axis=-1)
    dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape)
    density, color = fields.bg_nerf_apply(
        params["bg"], pts4.reshape(-1, 4), dirs.reshape(-1, 3),
        cfg.bg or fields.BgNeRFConfig())
    alpha = 1.0 - jnp.exp(
        -jax.nn.softplus(density.reshape(batch_size, n_samples)) * dists)
    trans = jnp.cumprod(
        jnp.concatenate(
            [jnp.ones((batch_size, 1), alpha.dtype), 1.0 - alpha + 1e-7],
            axis=-1),
        axis=-1)[:, :-1]
    weights = alpha * trans
    color = color.reshape(batch_size, n_samples, 3)
    return {
        "sampled_color": color,
        "alpha": alpha,
        "weights": weights,
        "color": jnp.sum(weights[:, :, None] * color, axis=1),
    }
