"""Standalone normal-refinement ("shape") model.

Parity target: decomp/nerfvq_nfr3/nerfactor/models/shape.py:59-69,
121-233 — an MLP that refines NeuS normals: posenc(xyz) -> normal_mlp
(width x depth, relu, skip) -> concat(posenc(view)) -> normal_out
(width, width, 3) + eps, normalized; loss = normal_loss_weight * MSE of
alpha-blended-onto-bg normals. The main pipeline runs with
shape_mode='finetune' (buffers used directly), so this is the legacy
pre-training path kept for completeness.
"""

import jax
import jax.numpy as jnp

from ..ops import nn
from ..ops.embed import posenc, posenc_dim
from ..ops.math import safe_l2_normalize
from . import decomp_common as dc

__all__ = ["init_shape_refine", "shape_refine_forward",
           "shape_refine_loss"]

N_FREQS_VDIR = 4


def init_shape_refine(seed, cfg: dc.DecompConfig, mlp_depth=4,
                      mlp_skip_at=2):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    d_embed = posenc_dim(3, cfg.n_freqs_xyz)
    d_view = posenc_dim(3, N_FREQS_VDIR)
    return {
        "normal_mlp": nn.mlp_init(
            k1, d_embed, [cfg.mlp_width] * mlp_depth,
            skip_at=(mlp_skip_at,)),
        "normal_out": nn.mlp_init(
            k2, cfg.mlp_width + d_view,
            [cfg.mlp_width, cfg.mlp_width, 3]),
    }


def shape_refine_forward(params, batch, cfg: dc.DecompConfig, eps=1e-6,
                         mlp_depth=4, mlp_skip_at=2):
    alpha = batch["alpha"]
    mask = (alpha[:, 0] > 0).astype(jnp.float32)
    xyz = batch["xyz"]
    rayd = safe_l2_normalize(batch["rayd"], axis=1)

    h = posenc(xyz, cfg.n_freqs_xyz)
    h = nn.mlp_apply(params["normal_mlp"], h, ["relu"] * mlp_depth,
                     skip_at=(mlp_skip_at,))
    h = jnp.concatenate([h, posenc(rayd, N_FREQS_VDIR)], axis=-1)
    normal = nn.mlp_apply(
        params["normal_out"], h, ["relu", "relu", None]) + eps
    normal_pred = safe_l2_normalize(normal, axis=1)
    return {
        "normal": normal_pred * mask[:, None],
        "mask": mask,
    }


def shape_refine_loss(pred, batch, cfg: dc.DecompConfig,
                      normal_loss_weight=1.0):
    """Alpha-blended MSE (shape.py:204-233)."""
    alpha = batch["alpha"]
    bg = jnp.ones_like(batch["normal"]) if cfg.white_bg \
        else jnp.zeros_like(batch["normal"])
    blend = lambda v: v * alpha + bg * (1.0 - alpha)
    per_ray = jnp.mean(
        (blend(batch["normal"]) - blend(pred["normal"])) ** 2, axis=-1)
    return normal_loss_weight * jnp.mean(per_ray)
