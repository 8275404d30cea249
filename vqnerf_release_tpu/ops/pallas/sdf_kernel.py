"""Fused SDF MLP forward + spatial gradient Pallas kernel.

The occlusion/extraction hot path (gen_geo light visibility) evaluates the
geometric-init SDF MLP (PE(6) -> 9 weight-norm layers, Softplus beta=100,
skip at layer 4) plus its spatial gradient for millions of sample points.
The jnp path computes the gradient with a reverse-mode vjp (a second full
pass with large HBM residuals); this kernel instead:

  * keeps ALL layer weights resident in VMEM (~1 MB) across the grid,
  * computes the positional encoding AND its analytic x/y/z derivatives
    in-kernel,
  * carries three forward-mode tangent channels through the layers
    (tangent_out = (tangent_in @ W) * sigmoid(beta * pre)),
  * writes only sdf [N] and grad [N, 3] to HBM — no residuals.

Forward-only (no autodiff through it): used by inference paths. Weight
normalization is folded outside (w = g * v / ||v||) since it is a pure
function of the parameters.

Layer dims for the default SDFConfig (d_hidden 256, d_out 257, multires 6,
skip at 4): in 39 -> 256 x3 -> 217 (skip concat back to 256) -> 256 x4 ->
257. The kernel handles any dims produced by `pack_sdf_params`.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...models import fields

__all__ = ["pack_sdf_params", "sdf_fwdgrad_pallas",
           "sdf_fwd_pallas", "sdf_fwdgrad_jnp"]

BLOCK = 256
_BETA = 100.0


def pack_sdf_params(params):
    """Weight-norm SDF params -> list of plain (W [in,out], b [out])."""
    out = []
    for p in params:
        v_norm = jnp.linalg.norm(p["v"], axis=0, keepdims=True)
        w = p["g"][None, :] * p["v"] / jnp.maximum(v_norm, 1e-12)
        out.append((w, p["b"]))
    return out


def _posenc_with_grad(pts, n_freqs):
    """PE values [B, 3+6F*?]... returns (embed [B, D], d_embed [3, B, D])
    where d_embed[k] = d embed / d pts_k. Layout matches ops/embed.posenc:
    [x, sin(2^0 x), cos(2^0 x), ...] with 3-channel blocks."""
    b = pts.shape[0]
    feats = [pts]
    # one-hot selector rows for d pts / d pts_k
    tangents = [
        jnp.broadcast_to(
            jnp.eye(3, dtype=pts.dtype)[k][None, :], (b, 3))
        for k in range(3)
    ]
    d_feats = [[t] for t in tangents]
    for i in range(n_freqs):
        freq = float(2**i)
        s = jnp.sin(pts * freq)
        c = jnp.cos(pts * freq)
        feats.append(s)
        feats.append(c)
        for k in range(3):
            sel = tangents[k]
            d_feats[k].append(c * freq * sel)
            d_feats[k].append(-s * freq * sel)
    embed = jnp.concatenate(feats, axis=-1)
    d_embed = [jnp.concatenate(d_feats[k], axis=-1) for k in range(3)]
    return embed, d_embed


def _softplus100(x):
    return jax.nn.softplus(_BETA * x) / _BETA


def _posenc_only(pts, n_freqs):
    feats = [pts]
    for i in range(n_freqs):
        freq = float(2**i)
        feats.append(jnp.sin(pts * freq))
        feats.append(jnp.cos(pts * freq))
    return jnp.concatenate(feats, axis=-1)


def _make_fwd_kernel(n_layers, skip_in, n_freqs, scale):
    """Forward-only variant (the up-sample rounds need no gradient)."""

    def kernel(pts_ref, *refs):
        out_sdf_ref = refs[-1]
        wb = refs[:-1]
        pts = pts_ref[:] * scale
        h = _posenc_only(pts, n_freqs)
        embed = h
        for l in range(n_layers):
            if l in skip_in:
                h = jnp.concatenate([h, embed], axis=-1) / np.sqrt(2.0)
            pre = jnp.dot(h, wb[2 * l][:],
                          preferred_element_type=jnp.float32)                 + wb[2 * l + 1][:]
            h = _softplus100(pre) if l < n_layers - 1 else pre
        out_sdf_ref[:] = h[:, 0:1] * (1.0 / scale)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("n_freqs", "skip_in", "scale", "interpret"))
def _call_fwd(pts, flat_wb, n_freqs, skip_in, scale, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = pts.shape[0]
    n_layers = len(flat_wb) // 2
    kernel = _make_fwd_kernel(n_layers, skip_in, n_freqs, scale)
    in_specs = [pl.BlockSpec((BLOCK, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for arr in flat_wb:
        if arr.ndim == 2:
            in_specs.append(pl.BlockSpec(
                arr.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
        else:
            in_specs.append(pl.BlockSpec(
                arr.shape, lambda i: (0,), memory_space=pltpu.VMEM))
    sdf = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        grid=(n // BLOCK,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BLOCK, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pts, *flat_wb)
    return sdf[:, 0]


def sdf_fwd_pallas(params, pts, cfg, interpret=False):
    """sdf [N] only (forward kernel). N must be a BLOCK multiple."""
    packed = pack_sdf_params(params)
    flat = []
    for w, b in packed:
        flat.append(w)
        flat.append(b)
    return _call_fwd(pts, tuple(flat), cfg.multires, tuple(cfg.skip_in),
                     float(cfg.scale), interpret)


def _make_kernel(n_layers, skip_in, n_freqs, scale):
    def kernel(pts_ref, *refs):
        # refs: w0, b0, w1, b1, ..., out_sdf_ref, out_grad_ref
        out_grad_ref = refs[-1]
        out_sdf_ref = refs[-2]
        wb = refs[:-2]

        pts = pts_ref[:] * scale
        h, dh = _posenc_with_grad(pts, n_freqs)
        embed, d_embed = h, dh

        for l in range(n_layers):
            if l in skip_in:
                inv = 1.0 / np.sqrt(2.0)
                h = jnp.concatenate([h, embed], axis=-1) * inv
                dh = [
                    jnp.concatenate([dh[k], d_embed[k]], axis=-1) * inv
                    for k in range(3)
                ]
            w = wb[2 * l][:]
            b_vec = wb[2 * l + 1][:]
            pre = jnp.dot(h, w, preferred_element_type=jnp.float32) + b_vec
            dpre = [
                jnp.dot(dh[k], w, preferred_element_type=jnp.float32)
                for k in range(3)
            ]
            if l < n_layers - 1:
                gate = jax.nn.sigmoid(_BETA * pre)
                h = _softplus100(pre)
                dh = [dpre[k] * gate for k in range(3)]
            else:
                h, dh = pre, dpre

        # chain rule through the input scaling; sdf channel / scale
        out_sdf_ref[:] = h[:, 0:1] * (1.0 / scale)
        out_grad_ref[:] = jnp.stack(
            [dh[k][:, 0] for k in range(3)], axis=-1)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("n_freqs", "skip_in", "scale", "interpret"))
def _call(pts, flat_wb, n_freqs, skip_in, scale, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = pts.shape[0]
    n_layers = len(flat_wb) // 2
    kernel = _make_kernel(n_layers, skip_in, n_freqs, scale)

    in_specs = [
        pl.BlockSpec((BLOCK, 3), lambda i: (i, 0),
                     memory_space=pltpu.VMEM)
    ]
    for arr in flat_wb:
        if arr.ndim == 2:
            in_specs.append(pl.BlockSpec(
                arr.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
        else:
            in_specs.append(pl.BlockSpec(
                arr.shape, lambda i: (0,), memory_space=pltpu.VMEM))

    out_shapes = (
        jax.ShapeDtypeStruct((n, 1), jnp.float32),
        jax.ShapeDtypeStruct((n, 3), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((BLOCK, 1), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((BLOCK, 3), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    )
    sdf, grad = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=(n // BLOCK,),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(pts, *flat_wb)
    return sdf[:, 0], grad


def sdf_fwdgrad_pallas(params, pts, cfg, interpret=False):
    """(sdf [N], grad [N, 3]) from the fused kernel. N must be a multiple
    of BLOCK (pad + slice at the call site)."""
    packed = pack_sdf_params(params)
    flat = []
    for w, b in packed:
        flat.append(w)
        flat.append(b)
    return _call(pts, tuple(flat), cfg.multires, tuple(cfg.skip_in),
                 float(cfg.scale), interpret)


def sdf_fwdgrad_jnp(params, pts, cfg):
    """Reference jnp path for parity testing."""
    sdf = fields.sdf_only(params, pts, cfg)
    grad = fields.sdf_gradient(params, pts, cfg)
    return sdf, grad
