"""NeuS network fields: SDF MLP, IDR color MLP, background NeRF, variance.

Parity target: geo/NeuS-ours2/models/fields.py:9-263 — the same
architectures (geometric-init SDF with Softplus(beta=100), skip-at-4 with
1/sqrt(2) scaling, weight normalization; 4-layer IDR rendering net;
background NeRF; SingleVariance exp(10 v)) expressed as functional JAX.

The reference obtains SDF spatial gradients via double-backward
``torch.autograd.grad`` (fields.py:96-107); here ``sdf_gradient`` is a plain
``jax.grad`` of the scalar field, which composes with outer differentiation
for the Eikonal term at no extra cost.
"""

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn
from ..ops.embed import make_embedder, posenc_dim

__all__ = [
    "SDFConfig", "ColorConfig", "BgNeRFConfig",
    "init_sdf", "sdf_apply", "sdf_only", "sdf_gradient",
    "init_color", "color_apply",
    "init_bg_nerf", "bg_nerf_apply",
    "init_variance", "inv_s_from",
]


def _softplus100(x):
    # Softplus(beta=100): (1/100) log(1 + exp(100 x)); jax.nn.softplus is
    # numerically stable for large inputs.
    return jax.nn.softplus(100.0 * x) / 100.0


@dataclass(frozen=True)
class SDFConfig:
    d_in: int = 3
    d_out: int = 257
    d_hidden: int = 256
    n_layers: int = 8
    skip_in: Tuple[int, ...] = (4,)
    multires: int = 6
    bias: float = 0.5
    scale: float = 1.0
    inside_outside: bool = False


@dataclass(frozen=True)
class ColorConfig:
    d_feature: int = 256
    mode: str = "idr"
    d_in: int = 9
    d_out: int = 3
    d_hidden: int = 256
    n_layers: int = 4
    multires_view: int = 4
    squeeze_out: bool = True


@dataclass(frozen=True)
class BgNeRFConfig:
    depth: int = 8
    width: int = 256
    d_in: int = 4
    d_in_view: int = 3
    multires: int = 10
    multires_view: int = 4
    skips: Tuple[int, ...] = (4,)


def _sdf_dims(cfg: SDFConfig):
    d_embed = posenc_dim(cfg.d_in, cfg.multires) if cfg.multires > 0 \
        else cfg.d_in
    return [d_embed] + [cfg.d_hidden] * cfg.n_layers + [cfg.d_out]


def init_sdf(seed, cfg: SDFConfig):
    """Geometric init + weight norm (fields.py:37-68)."""
    dims = _sdf_dims(cfg)
    rng = np.random.RandomState(seed)
    raw = nn.geometric_sdf_init(
        rng, dims, cfg.skip_in, dims[0], bias=cfg.bias,
        inside_outside=cfg.inside_outside)
    return [
        nn.wn_dense_init(None, w.shape[0], w.shape[1], w=w, b=b)
        for (w, b) in raw
    ]


def sdf_apply(params, x, cfg: SDFConfig):
    """Full SDF net output [N, d_out]: channel 0 is the (rescaled) SDF."""
    inputs = x * cfg.scale
    if cfg.multires > 0:
        emb = make_embedder(cfg.multires)
        inputs = emb(inputs)
    h = inputs
    n_lin = len(params)
    for l, p in enumerate(params):
        if l in cfg.skip_in:
            h = jnp.concatenate([h, inputs], axis=-1) / np.sqrt(2.0)
        h = nn.wn_dense_apply(p, h)
        if l < n_lin - 1:
            h = _softplus100(h)
    return jnp.concatenate([h[:, :1] / cfg.scale, h[:, 1:]], axis=-1)


def sdf_only(params, x, cfg: SDFConfig):
    return sdf_apply(params, x, cfg)[:, 0]


def sdf_gradient(params, x, cfg: SDFConfig):
    """d sdf / d x, differentiable (counterpart of fields.py:96-107)."""
    g = jax.grad(lambda pts: jnp.sum(sdf_only(params, pts, cfg)))(x)
    return g


def sdf_value_feature_gradient(params, x, cfg: SDFConfig):
    """(sdf [N,1], feature [N,d_out-1], d sdf/d x [N,3]) sharing ONE
    forward pass via vjp — the render core needs all three, and calling
    sdf_apply + sdf_gradient separately runs the MLP forward twice."""
    out, vjp_fn = jax.vjp(lambda pts: sdf_apply(params, pts, cfg), x)
    sdf = out[:, :1]
    feature = out[:, 1:]
    seed = jnp.zeros_like(out).at[:, 0].set(1.0)
    (grad,) = vjp_fn(seed)
    return sdf, feature, grad


def init_color(key, cfg: ColorConfig):
    d_view_embed = posenc_dim(3, cfg.multires_view) \
        if cfg.multires_view > 0 else 3
    d0 = cfg.d_in + cfg.d_feature + (d_view_embed - 3)
    dims = [d0] + [cfg.d_hidden] * cfg.n_layers + [cfg.d_out]
    params = []
    for l in range(len(dims) - 1):
        key, sub = jax.random.split(key)
        # torch Linear default init (kaiming-uniform-ish bounds)
        params.append(nn.wn_dense_init(sub, dims[l], dims[l + 1]))
    return params


def color_apply(params, points, normals, view_dirs, feature, cfg: ColorConfig):
    if cfg.multires_view > 0:
        view_dirs = make_embedder(cfg.multires_view)(view_dirs)
    if cfg.mode == "idr":
        h = jnp.concatenate([points, view_dirs, normals, feature], axis=-1)
    elif cfg.mode == "no_view_dir":
        h = jnp.concatenate([points, normals, feature], axis=-1)
    elif cfg.mode == "no_normal":
        h = jnp.concatenate([points, view_dirs, feature], axis=-1)
    else:
        raise NotImplementedError(cfg.mode)
    n_lin = len(params)
    for l, p in enumerate(params):
        h = nn.wn_dense_apply(p, h)
        if l < n_lin - 1:
            h = jax.nn.relu(h)
    return jax.nn.sigmoid(h) if cfg.squeeze_out else h


def init_bg_nerf(key, cfg: BgNeRFConfig):
    """Background NeRF (fields.py:176-254), use_viewdirs=True layout."""
    d_pts = posenc_dim(cfg.d_in, cfg.multires)
    d_view = posenc_dim(cfg.d_in_view, cfg.multires_view)
    params = {"pts": [], "views": [], "feature": None, "alpha": None,
              "rgb": None}
    cur = d_pts
    for i in range(cfg.depth):
        key, sub = jax.random.split(key)
        params["pts"].append(nn.dense_init(sub, cur, cfg.width))
        cur = cfg.width + (d_pts if i in cfg.skips else 0)
    key, k1, k2, k3, k4 = jax.random.split(key, 5)
    params["views"].append(
        nn.dense_init(k1, d_view + cfg.width, cfg.width // 2))
    params["feature"] = nn.dense_init(k2, cfg.width, cfg.width)
    params["alpha"] = nn.dense_init(k3, cfg.width, 1)
    params["rgb"] = nn.dense_init(k4, cfg.width // 2, 3)
    return params


def bg_nerf_apply(params, pts, views, cfg: BgNeRFConfig):
    pts_e = make_embedder(cfg.multires)(pts)
    views_e = make_embedder(cfg.multires_view)(views)
    h = pts_e
    for i, p in enumerate(params["pts"]):
        h = jax.nn.relu(nn.dense_apply(p, h))
        if i in cfg.skips:
            h = jnp.concatenate([pts_e, h], axis=-1)
    alpha = nn.dense_apply(params["alpha"], h)
    feat = nn.dense_apply(params["feature"], h)
    h = jnp.concatenate([feat, views_e], axis=-1)
    for p in params["views"]:
        h = jax.nn.relu(nn.dense_apply(p, h))
    rgb = nn.dense_apply(params["rgb"], h)
    return alpha, rgb


def init_variance(init_val=0.3):
    return {"variance": jnp.asarray(init_val, jnp.float32)}


def inv_s_from(params, clip=(1e-6, 1e6)):
    """exp(10 * v), clipped (fields.py:257-263, renderer.py:229)."""
    return jnp.clip(jnp.exp(params["variance"] * 10.0), clip[0], clip[1])
