"""ref_nfr: residual appearance baking on top of a trained vq_nfr.

Parity target: decomp/nerfvq_nfr3/nerfactor/models/ref_nfr.py.
  * Frozen: fine_enc, bottleneck, spec head, and the converged light
    (ref_nfr.py:141-147 sets vqnfr_model.trainable = False; the light is a
    plain tensor loaded from vq_nfr's last validation epoch, :76-88).
  * Trainable: rgb_enc (encodes the reference-RGB 'basecolor' buffer into
    z_ref), and new diff/rough heads over concat(z_xyz, z_ref)
    (ref_nfr.py:148-152, 203-213), plus gamma for real data.
  * Train loss: plain masked MSE in linear space (ref_nfr.py:584-610).
  * fast_render: the 'raw' reconstruction uses the unscaled residual BRDF,
    while relighting uses the opt_scale'd one (ref_nfr.py:357-374).

Params are split into 'frozen' and 'train' subtrees so the optimizer can
update only the trainable part (the TPU-native equivalent of keras
trainable=False).
"""

import jax
import jax.numpy as jnp

from ..ops import nn
from ..ops.colorspace import linear2srgb, srgb2linear
from ..ops.microfacet import microfacet_brdf
from ..ops.render import render_equation
from . import decomp_common as dc

__all__ = ["init_ref_nfr", "ref_nfr_forward", "ref_nfr_loss",
           "ref_fast_render"]

RGB_ENC_ACTS = [None, "relu", "sigmoid"]


def init_ref_nfr(seed, cfg: dc.DecompConfig, vq_params, light):
    """vq_params: trained vq_nfr params; light: converged [Lh, Lw, 3]."""
    key = jax.random.PRNGKey(seed)
    k_ref, k_d, k_r = jax.random.split(key, 3)
    frozen = {
        "fine_enc": vq_params["fine_enc"],
        "bottleneck": vq_params["bottleneck"],
        "spec_out": vq_params["spec_main"],
        "light": jnp.asarray(light, jnp.float32),
    }
    train = {
        "rgb_enc": nn.mlp_init(k_ref, 3, [cfg.z_dim] * 3),
        "diff_out": dc.init_head(k_d, 2 * cfg.z_dim, 3, width=cfg.z_dim),
        "rough_out": dc.init_head(k_r, 2 * cfg.z_dim, 1, width=cfg.z_dim),
    }
    if not cfg.is_nerf:
        train["gamma_bias"] = vq_params.get(
            "gamma_bias", jnp.ones((1,), jnp.float32))
        train["gamma_index"] = vq_params.get(
            "gamma_index", jnp.ones((1,), jnp.float32))
    return {"frozen": frozen, "train": train}


def _brdf_maps(params, batch, cfg):
    frozen, train = params["frozen"], params["train"]
    # Frozen encoder path — stop_gradient mirrors trainable=False.
    z_xyz = jax.lax.stop_gradient(
        dc.apply_encoder(frozen, batch["xyz"], cfg))
    ks = jax.lax.stop_gradient(dc.apply_head(frozen["spec_out"], z_xyz))
    # Trainable reference branch (ref_nfr.py:206-213)
    z_ref = nn.mlp_apply(train["rgb_enc"], batch["ref"], RGB_ENC_ACTS)
    z_bias = jnp.concatenate([z_xyz, z_ref], axis=-1)
    basecolor = cfg.albedo_slope * dc.apply_head(
        train["diff_out"], z_bias) + cfg.albedo_bias
    rough = dc.apply_head(train["rough_out"], z_bias)
    spec = ks * basecolor
    albedo = (1.0 - ks) * basecolor
    return basecolor, ks, rough, spec, albedo


def _gamma(params, cfg):
    if cfg.is_nerf:
        return None
    t = params["train"]
    from ..ops.math import clip_preserve_gradient
    return (t["gamma_bias"],
            clip_preserve_gradient(t["gamma_index"], 0.0, 5.0))


def ref_nfr_forward(params, batch, cfg: dc.DecompConfig, lxyz, lareas,
                    mode="train", opt_scale=None, novel_probes=None,
                    novel_olat=None):
    alpha = batch["alpha"]
    mask = (alpha[:, 0] > 0).astype(jnp.float32)
    xyz, normal, rayo = batch["xyz"], batch["normal"], batch["rayo"]
    lvis = batch.get("lvis") if cfg.is_nerf else None
    surf2c = dc.calc_vdir(rayo, xyz)
    surf2l = dc.calc_ldir(lxyz, xyz)
    normal_pred = dc.normal_correct(normal, surf2c)

    basecolor, ks, rough, spec, albedo = _brdf_maps(params, batch, cfg)

    if opt_scale is not None and mode == "test":
        albedo = albedo * opt_scale
        spec = spec * opt_scale

    brdf, brdf_spec, brdf_diff = microfacet_brdf(
        surf2l, surf2c, normal_pred, albedo=albedo, rough=rough, f0=spec)

    # The light is a constant here (ref_nfr.py:88 loads it as a plain
    # tensor, never a Variable) — block gradients to keep it frozen.
    light = jax.lax.stop_gradient(params["frozen"]["light"])
    gamma = _gamma(params, cfg)
    rgb_pred = render_equation(
        brdf, surf2l, normal_pred, lareas, light, light_vis=lvis, gamma=gamma)

    aux = {"mask": mask, "rgb_gt": batch["rgb"],
           "rgb_pred_linear": rgb_pred}

    m = mask[:, None]
    pred = {
        "rgb": (linear2srgb(rgb_pred) if cfg.is_nerf else rgb_pred) * m,
        "normal": normal_pred * m,
        "albedo": albedo * m,
        "basecolor": basecolor * m,
        "spec": spec * m,
        "rough": rough * m,
        "ks": ks * m,
        "alpha": batch.get("pred_alpha", alpha),
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
    if novel_probes is not None:
        rgb_probes = render_equation(
            brdf, surf2l, normal_pred, lareas, novel_probes, light_vis=lvis,
            gamma=gamma, probe_batch=True)
        pred["rgb_probes"] = (
            linear2srgb(rgb_probes) if cfg.is_nerf else rgb_probes
        ) * m[:, :, None]
    if novel_olat is not None:
        rgb_olat = render_equation(
            brdf, surf2l, normal_pred, lareas, novel_olat, light_vis=lvis,
            gamma=gamma, probe_batch=True)
        pred["rgb_olat"] = (
            linear2srgb(rgb_olat) if cfg.is_nerf else rgb_olat
        ) * m[:, :, None]
    return pred, aux


def ref_nfr_loss(aux, cfg: dc.DecompConfig, mode="train"):
    """Masked-mean MSE in linear space (ref_nfr.py:584-610)."""
    mask = aux["mask"]
    gt = aux["rgb_gt"]
    linear_gt = srgb2linear(gt) if cfg.is_nerf else gt
    per_ray = jnp.mean((linear_gt - aux["rgb_pred_linear"]) ** 2, axis=-1)
    loss = jnp.sum(per_ray * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return loss, {"rgb": loss, "loss": loss}


def ref_fast_render(params, batch, cfg: dc.DecompConfig, lxyz, lareas,
                    opt_scale=None, novel_probes=None, novel_olat=None,
                    edit_mask=None, edit_material=None):
    """Inference (ref_nfr.py:306-417): raw recon from the UNSCALED residual
    BRDF; relighting from the scaled/edited one."""
    alpha = batch["alpha"]
    mask = (alpha[:, 0] > 0).astype(jnp.float32)
    xyz, normal, rayo = batch["xyz"], batch["normal"], batch["rayo"]
    lvis = batch.get("lvis") if cfg.is_nerf else None
    surf2c = dc.calc_vdir(rayo, xyz)
    surf2l = dc.calc_ldir(lxyz, xyz)
    normal_pred = dc.normal_correct(normal, surf2c)

    basecolor, ks, rough, spec, albedo = _brdf_maps(params, batch, cfg)

    if edit_mask is not None:
        em = (edit_mask[:, 0:1] > 0).astype(jnp.float32)

        def upd(src, val):
            val = jnp.asarray(val, jnp.float32)
            return jnp.where(val[0] < 0, src, src * (1 - em) + em * val)

        albedo = upd(albedo, edit_material["diff"])
        spec = upd(spec, edit_material["spec"])
        rough = upd(rough, edit_material["rough"])

    if opt_scale is not None:
        albedo_s, spec_s = albedo * opt_scale, spec * opt_scale
    else:
        albedo_s, spec_s = albedo, spec
    relight = novel_probes is not None or novel_olat is not None
    if relight:  # scaled BRDF only feeds the relighting passes
        brdf, _, _ = microfacet_brdf(
            surf2l, surf2c, normal_pred, albedo=albedo_s, rough=rough,
            f0=spec_s)

    light = jax.lax.stop_gradient(params["frozen"]["light"])
    gamma = _gamma(params, cfg)
    if dc.fused_render_enabled(cfg) and not relight:
        from ..ops.render import fused_render_equation
        rgb_pred = fused_render_equation(
            xyz, normal_pred, surf2c, albedo, rough, spec, lvis,
            lareas, lxyz, light, gamma=gamma)
    else:
        raw_brdf, _, _ = microfacet_brdf(
            surf2l, surf2c, normal_pred, albedo=albedo, rough=rough, f0=spec)
        rgb_pred = render_equation(
            raw_brdf, surf2l, normal_pred, lareas, light, light_vis=lvis,
            gamma=gamma)

    m = mask[:, None]
    pred = {
        "rgb": (linear2srgb(rgb_pred) if cfg.is_nerf else rgb_pred) * m,
        "alpha": batch.get("pred_alpha", alpha),
    }
    if novel_probes is not None:
        rgb_probes = render_equation(
            brdf, surf2l, normal_pred, lareas, novel_probes, light_vis=lvis,
            gamma=gamma, probe_batch=True)
        pred["rgb_probes"] = (
            linear2srgb(rgb_probes) if cfg.is_nerf else rgb_probes
        ) * m[:, :, None]
    if novel_olat is not None:
        rgb_olat = render_equation(
            brdf, surf2l, normal_pred, lareas, novel_olat, light_vis=lvis,
            gamma=gamma, probe_batch=True)
        pred["rgb_olat"] = (
            linear2srgb(rgb_olat) if cfg.is_nerf else rgb_olat
        ) * m[:, :, None]
    return pred
