"""nfr_unit: the continuous BRDF-decomposition warm-up model.

Parity target: decomp/nerfvq_nfr3/nerfactor/models/nfr_unit.py.
Forward (nfr_unit.py:179-271): mask fg -> view/light dirs -> normal correct
-> encoder z -> heads (basecolor, ks, rough) -> spec = ks*basecolor,
albedo = (1-ks)*basecolor -> GGX BRDF -> rendering equation with trainable
light (+ learned gamma for real data) -> MSE loss in linear space
(srgb2linear GT for CG data, nfr_unit.py:393-429).
"""

import jax
import jax.numpy as jnp

from ..ops.colorspace import linear2srgb, srgb2linear
from ..ops.microfacet import microfacet_brdf
from ..ops.render import render_equation
from . import decomp_common as dc

__all__ = ["init_nfr_unit", "nfr_unit_forward", "nfr_unit_loss"]


def init_nfr_unit(seed, cfg: dc.DecompConfig):
    key = jax.random.PRNGKey(seed)
    k_enc, k_d, k_s, k_r = jax.random.split(key, 4)
    params = {
        **dc.init_encoder(k_enc, cfg),
        "diff_out": dc.init_head(k_d, cfg.z_dim, 3),
        "spec_out": dc.init_head(k_s, cfg.z_dim, 1),
        "rough_out": dc.init_head(k_r, cfg.z_dim, 1),
        "light": jnp.full(
            cfg.light_res + (3,), cfg.light_init_val, jnp.float32),
    }
    if not cfg.is_nerf:
        params["gamma_bias"] = jnp.ones((1,), jnp.float32)
        params["gamma_index"] = jnp.ones((1,), jnp.float32)
    return params


def _decode_brdf(params, z, cfg):
    basecolor = cfg.albedo_slope * dc.apply_head(
        params["diff_out"], z) + cfg.albedo_bias
    ks = dc.apply_head(params["spec_out"], z)
    rough = dc.apply_head(params["rough_out"], z)
    spec = ks * basecolor
    albedo = (1.0 - ks) * basecolor
    return basecolor, ks, rough, spec, albedo


def nfr_unit_forward(params, batch, cfg: dc.DecompConfig, lxyz, lareas,
                     mode="train", light_override=None):
    """batch: dict with rayo, rgb, alpha, xyz, normal, (lvis) — all [N, ...].

    Returns (pred, aux) where pred holds full-batch outputs (background rows
    zeroed, mirroring the reference's scatter_nd) and aux carries the masked
    loss ingredients.
    """
    alpha = batch["alpha"]
    mask = (alpha[:, 0] > 0).astype(jnp.float32)  # [N]
    xyz, normal, rayo = batch["xyz"], batch["normal"], batch["rayo"]
    lvis = batch.get("lvis") if cfg.is_nerf else None

    surf2c = dc.calc_vdir(rayo, xyz)
    surf2l = dc.calc_ldir(lxyz, xyz)
    normal_pred = dc.normal_correct(normal, surf2c)

    z = dc.apply_encoder(params, xyz, cfg)
    basecolor, ks, rough, spec, albedo = _decode_brdf(params, z, cfg)

    brdf, brdf_spec, brdf_diff = microfacet_brdf(
        surf2l, surf2c, normal_pred, albedo=albedo, rough=rough, f0=spec)

    light = dc.get_light(params) if light_override is None else light_override
    gamma = None if cfg.is_nerf else dc.get_gamma(params)
    rgb_pred = render_equation(
        brdf, surf2l, normal_pred, lareas, light, light_vis=lvis, gamma=gamma)

    aux = {
        "mask": mask,
        "rgb_pred_linear": rgb_pred,
        "rgb_gt": batch["rgb"],
        "spec": spec,
        "rough": rough,
        "z": z,
    }

    m = mask[:, None]
    rgb_vis = linear2srgb(rgb_pred) if cfg.is_nerf else rgb_pred
    pred = {
        "rgb": rgb_vis * m,
        "normal": normal_pred * m,
        "albedo": albedo * m,
        "basecolor": basecolor * m,
        "spec": spec * m,
        "rough": rough * m,
        "ks": ks * m,
        "alpha": batch.get("pred_alpha", alpha),
        "z": z * m,
    }
    if mode != "train":
        rgb_d = render_equation(
            brdf_diff, surf2l, normal_pred, lareas, light, light_vis=lvis,
            gamma=gamma)
        rgb_s = render_equation(
            brdf_spec, surf2l, normal_pred, lareas, light, light_vis=lvis,
            gamma=gamma)
        # component renders stay LINEAR even for CG scenes — the reference
        # never srgb-encodes rgb_diff/rgb_spec (vq_nfr.py:645-650 /
        # ref_nfr.py:259-263; vis_batch writes them raw)
        pred["rgb_diff"] = rgb_d * m
        pred["rgb_spec"] = rgb_s * m
    return pred, aux


def nfr_unit_loss(aux, cfg: dc.DecompConfig, mode="train"):
    """Masked-mean MSE in linear space (nfr_unit.py:393-429)."""
    mask = aux["mask"]
    gt = aux["rgb_gt"]
    linear_gt = srgb2linear(gt) if cfg.is_nerf else gt
    per_ray = jnp.mean((linear_gt - aux["rgb_pred_linear"]) ** 2, axis=-1)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    loss = jnp.sum(per_ray * mask) / denom
    return loss, {"rgb": loss, "loss": loss}
