"""Minimal functional NN layer zoo: dense / skip-MLP / weight-norm dense.

Params are plain pytrees (lists of dicts of jnp arrays) so they thread
through jit/pjit/orbax without a framework. Two MLP dialects exist in the
reference and both are reproduced:

  * Stage-2 "Network" (decomp/nerfvq_nfr3/nerfactor/networks/mlp.py:24-50):
    ``for i, layer: y = layer(x_); if i in skip_at: y = concat(y, x); x_ = y``
    i.e. the ORIGINAL input is concatenated onto the OUTPUT of layer i.
    Keras Dense default init: glorot_uniform W, zeros b.

  * Stage-1 IDR-style MLPs (geo/NeuS-ours2/models/fields.py:9-172):
    skip layers concatenate the embedded input BEFORE layer l and divide by
    sqrt(2); geometric init for the SDF net; weight normalization
    (w = g * v / ||v||_row).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "dense_init",
    "dense_apply",
    "mlp_init",
    "mlp_apply",
    "wn_dense_init",
    "wn_dense_apply",
    "ACTS",
]

ACTS = {
    None: lambda x: x,
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "softplus100": lambda x: jax.nn.softplus(100.0 * x) / 100.0,
}


def dense_init(key, d_in, d_out, w_init="glorot_uniform"):
    if w_init == "glorot_uniform":
        lim = math.sqrt(6.0 / (d_in + d_out))
        w = jax.random.uniform(key, (d_in, d_out), jnp.float32, -lim, lim)
    else:
        raise NotImplementedError(w_init)
    return {"w": w, "b": jnp.zeros((d_out,), jnp.float32)}


def dense_apply(p, x):
    return x @ p["w"] + p["b"]


def mlp_init(key, d_in, widths, skip_at=None):
    """Stage-2 style skip-MLP parameters.

    ``widths`` are the per-layer output dims; layer i in ``skip_at`` has the
    original input concatenated to its output, widening the next layer.
    """
    skip_at = tuple(skip_at or ())
    params = []
    cur = d_in
    for i, w_out in enumerate(widths):
        key, sub = jax.random.split(key)
        params.append(dense_init(sub, cur, w_out))
        cur = w_out + (d_in if i in skip_at else 0)
    return params


def mlp_apply(params, x, acts, skip_at=None):
    """Apply a stage-2 skip-MLP. ``acts`` is a list of ACTS keys per layer."""
    skip_at = tuple(skip_at or ())
    h = x
    for i, p in enumerate(params):
        y = ACTS[acts[i]](dense_apply(p, h))
        if i in skip_at:
            y = jnp.concatenate([y, x], axis=-1)
        h = y
    return h


# ---------------------------------------------------------------------------
# Weight-normalized dense (stage 1). PyTorch's weight_norm keeps (g, v) with
# w = g * v / ||v|| where the norm is over the input dim of each output row.


def wn_dense_init(key, d_in, d_out, w=None, b=None):
    """Build weight-norm params, optionally from a given dense (w, b).

    ``w`` is stored transposed relative to torch: shape (d_in, d_out); the
    norm is taken over d_in per output unit (torch's dim=(1,) on a
    (d_out, d_in) matrix).
    """
    if w is None:
        std = 1.0 / math.sqrt(d_in)
        k1, k2 = jax.random.split(key)
        w = jax.random.uniform(k1, (d_in, d_out), jnp.float32, -std, std)
        b = jax.random.uniform(k2, (d_out,), jnp.float32, -std, std)
    g = jnp.linalg.norm(w, axis=0)  # (d_out,)
    return {"v": w, "g": g, "b": b}


def wn_dense_apply(p, x):
    v_norm = jnp.linalg.norm(p["v"], axis=0, keepdims=True)
    w = p["g"][None, :] * p["v"] / jnp.maximum(v_norm, 1e-12)
    return x @ w + p["b"]


# ---------------------------------------------------------------------------
# Geometric init for the SDF network (fields.py:45-63), expressed as numpy so
# init is exactly reproducible and cheap.


def geometric_sdf_init(rng, dims, skip_in, d_in_embed, bias=0.5,
                       inside_outside=False):
    """Per-layer (w, b) for the geometric-init SDF MLP.

    dims: full layer dims [d_embed, hidden..., d_out]; layers whose OUTPUT
    feeds a skip concat have out_dim reduced by dims[0]. ``d_in_embed`` is the
    embedded input width; raw xyz occupies the first 3 channels of it.
    Reference: geo/NeuS-ours2/models/fields.py:37-63.
    """
    n_layers = len(dims) - 1
    params = []
    for l in range(n_layers):
        if l + 1 in skip_in:
            out_dim = dims[l + 1] - dims[0]
        else:
            out_dim = dims[l + 1]
        in_dim = dims[l]
        if l == n_layers - 1:
            mean = np.sqrt(np.pi) / np.sqrt(in_dim)
            if inside_outside:
                mean = -mean
            w = rng.normal(mean, 1e-4, size=(in_dim, out_dim))
            b = np.full((out_dim,), bias if inside_outside else -bias)
        elif l == 0:
            w = np.zeros((in_dim, out_dim))
            w[:3, :] = rng.normal(
                0.0, np.sqrt(2) / np.sqrt(out_dim), size=(3, out_dim))
            b = np.zeros((out_dim,))
        elif l in skip_in:
            w = rng.normal(
                0.0, np.sqrt(2) / np.sqrt(out_dim), size=(in_dim, out_dim))
            w[-(dims[0] - 3):, :] = 0.0
            b = np.zeros((out_dim,))
        else:
            w = rng.normal(
                0.0, np.sqrt(2) / np.sqrt(out_dim), size=(in_dim, out_dim))
            b = np.zeros((out_dim,))
        params.append(
            (jnp.asarray(w, jnp.float32), jnp.asarray(b, jnp.float32)))
    return params
