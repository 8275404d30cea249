"""Hand-derived VJP for the fused SDF (value, feature, gradient) op.

The NeuS training loss consumes the SDF's spatial gradient (Eikonal term +
color-net normals), so the training step differentiates THROUGH the
gradient computation — reverse-over-reverse when the gradient comes from
``jax.vjp`` (models/fields.py:121-130). This module computes the spatial
gradient in explicit forward mode (3 tangent channels with analytic
positional-encoding derivatives) and hand-derives the single reverse pass
over that forward program, exposed as ``jax.custom_vjp``:

  * backward recomputes the forward instead of saving 9 layers of
    activations+tangents (keeps HBM flat, mirrors the Pallas plan);
  * the only second-order pieces are elementwise: softplus''(z) and the
    embed's d²/dx² — no nested autodiff anywhere;
  * per-layer cotangents are plain matmuls, so XLA (or a Pallas port)
    schedules one flat chain instead of a double-transposed graph.

Counterpart of the reference's double ``torch.autograd.grad``
(geo/NeuS-ours2/models/fields.py:96-107 + renderer.py second-order use).
Validated against nested autodiff in tests/test_sdf_manual.py.

MEASURED OUTCOME (r1, 1x TPU v5e, 65k points, production 8x256 net):
reverse-over-forward is CORRECT (5e-5 rel) but 2.0x slower than XLA's
reverse-over-reverse (27.7 vs 13.8 ms) — forward mode pays 3 tangent
channels where the inner vjp pays one cotangent pass, and the hand
backward recomputes the forward besides. XLA's nested autodiff runs at
~40 TFLOP/s effective (~70% of this MLP's measured 60 TFLOP/s ceiling),
so the remaining headroom for ANY hand-written kernel is ~1.4x. The
training path therefore keeps fields.sdf_value_feature_gradient; this
module stays as the verified reference backward (and the analysis
record) for any future Pallas double-reverse kernel.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .fields import SDFConfig, _sdf_dims

__all__ = ["sdf_vfg_manual"]


def _wn_weight(p):
    v_norm = jnp.linalg.norm(p["v"], axis=0, keepdims=True)
    return p["g"][None, :] * p["v"] / jnp.maximum(v_norm, 1e-12)


def _embed_terms(x, cfg: SDFConfig):
    """e [N,D], de = d e/d x_(j%3) [N,D], dde = d²e/dx² [N,D] — every embed
    channel depends on exactly one input component, so the Jacobian /
    Hessian are stored as their (diagonal-per-channel) nonzero entries.
    Includes the cfg.scale chain (xin = s·x)."""
    s = cfg.scale
    xin = x * s
    if cfg.multires == 0:
        return xin, jnp.full_like(x, s), jnp.zeros_like(x)
    es, des, ddes = [xin], [jnp.full_like(x, s)], [jnp.zeros_like(x)]
    for k in range(cfg.multires):
        f = float(2**k)
        sin, cos = jnp.sin(xin * f), jnp.cos(xin * f)
        es += [sin, cos]
        des += [f * s * cos, -f * s * sin]
        ddes += [-(f * s) ** 2 * sin, -(f * s) ** 2 * cos]
    return (jnp.concatenate(es, -1), jnp.concatenate(des, -1),
            jnp.concatenate(ddes, -1))


def _tmm(t, w):
    """[N,3,D] @ [D,E] -> [N,3,E] as one flat MXU matmul (einsum over the
    tangent axis trips a TPU fusion-cost-model crash under the tunnel's
    AOT compiler, and the reshape form is what we want anyway)."""
    n, k, d = t.shape
    return (t.reshape(n * k, d) @ w).reshape(n, k, -1)


def _tangent0(de, d_in):
    """Seed tangents T0 [N,3,D]: channel j responds only to input j%d_in."""
    n, d = de.shape
    mask = (jnp.arange(d) % d_in == jnp.arange(3)[:, None]
            ).astype(de.dtype)  # [3, D]
    return de[:, None, :] * mask[None, :, :]


def _forward(params, x, cfg: SDFConfig):
    """Primal + 3-channel tangent forward. Returns outputs and the
    recomputation-friendly residual pack (just e/de plus per-layer z and
    inputs when requested by the backward)."""
    e, de, _ = _embed_terms(x, cfg)
    t0 = _tangent0(de, cfg.d_in)
    ws = [_wn_weight(p) for p in params]
    h, t = e, t0
    hs, ts, zs = [], [], []
    n_lin = len(params)
    sqrt2 = np.sqrt(2.0)
    for l, p in enumerate(params):
        if l in cfg.skip_in:
            h = jnp.concatenate([h, e], axis=-1) / sqrt2
            t = jnp.concatenate([t, t0], axis=-1) / sqrt2
        hs.append(h)
        ts.append(t)
        z = h @ ws[l] + p["b"]
        tz = _tmm(t, ws[l])
        zs.append(z)
        if l < n_lin - 1:
            sig = jax.nn.sigmoid(100.0 * z)
            h = jax.nn.softplus(100.0 * z) / 100.0
            t = sig[:, None, :] * tz
        else:
            h, t = z, tz
    sdf = h[:, :1] / cfg.scale
    feature = h[:, 1:]
    grad = t[:, :, 0] / cfg.scale
    return (sdf, feature, grad), (hs, ts, zs, ws, e, de)


def _backward(params, x, cfg: SDFConfig, cots):
    s_bar, f_bar, g_bar = cots
    _out, res = _forward(params, x, cfg)  # recompute (no saved acts)
    hs, ts, zs, ws, e, de = res
    _, _, dde = _embed_terms(x, cfg)

    n_lin = len(params)
    sqrt2 = np.sqrt(2.0)
    d_embed = _sdf_dims(cfg)[0]

    # cotangents entering the top: the last layer is linear; the gradient
    # output reads tangent channel 0 only. NB: built with pads, not
    # concatenate — a concat of two primal inputs seeding this chain
    # crashes the TPU compiler's fusion cost model (SIGILL in
    # TpuPriorityFusionQueue::NormalizedComputationCost, libtpu 2026-07).
    h_bar = (jnp.pad(s_bar / cfg.scale, ((0, 0), (0, f_bar.shape[-1])))
             + jnp.pad(f_bar, ((0, 0), (1, 0))))
    t_bar = (g_bar / cfg.scale)[:, :, None] * (
        jnp.arange(zs[-1].shape[-1]) == 0).astype(h_bar.dtype)[None, None, :]

    e_bar = jnp.zeros_like(e)
    t0_bar = jnp.zeros_like(de)  # only the diagonal dir ever contributes
    w_bars, b_bars = [None] * n_lin, [None] * n_lin

    for l in range(n_lin - 1, -1, -1):
        z, h_in, t_in, w = zs[l], hs[l], ts[l], ws[l]
        if l < n_lin - 1:
            sig = jax.nn.sigmoid(100.0 * z)
            dsig = 100.0 * sig * (1.0 - sig)  # softplus100''
            tz = _tmm(t_in, w)
            z_bar = h_bar * sig + jnp.sum(t_bar * tz, axis=1) * dsig
            tz_bar = sig[:, None, :] * t_bar
        else:
            z_bar, tz_bar = h_bar, t_bar
        n, k, d = t_in.shape
        w_bars[l] = (h_in.T @ z_bar
                     + t_in.reshape(n * k, d).T
                     @ tz_bar.reshape(n * k, -1))
        b_bars[l] = jnp.sum(z_bar, axis=0)
        h_bar = z_bar @ w.T
        t_bar = _tmm(tz_bar, w.T)
        if l in cfg.skip_in:
            d_prev = h_bar.shape[-1] - d_embed
            e_bar = e_bar + h_bar[:, d_prev:] / sqrt2
            # tangent seed cotangent: only dir k == j % d_in is nonzero in
            # T0, so collect that diagonal
            t_skip = t_bar[:, :, d_prev:] / sqrt2
            t0_bar = t0_bar + _diag_dirs(t_skip, cfg.d_in)
            h_bar = h_bar[:, :d_prev] / sqrt2
            t_bar = t_bar[:, :, :d_prev] / sqrt2
    e_bar = e_bar + h_bar
    t0_bar = t0_bar + _diag_dirs(t_bar, cfg.d_in)

    # embed reverse: e depends on x via de (first order) and T0 via dde
    x_bar = _fold_dirs(e_bar * de, cfg.d_in) + _fold_dirs(t0_bar * dde,
                                                          cfg.d_in)

    params_bar = []
    for l, (p, w_bar) in enumerate(zip(params, w_bars)):
        v, g = p["v"], p["g"]
        v_norm = jnp.maximum(jnp.linalg.norm(v, axis=0, keepdims=True),
                             1e-12)
        wv = jnp.sum(w_bar * v, axis=0, keepdims=True)  # [1, d_out]
        g_bar_wn = (wv / v_norm)[0]
        v_bar = (g[None, :] / v_norm) * (w_bar - v * wv / v_norm**2)
        params_bar.append({"v": v_bar, "g": g_bar_wn, "b": b_bars[l]})
    return params_bar, x_bar


def _diag_dirs(t, d_in):
    """[N,3,D] tangent cotangent -> [N,D] keeping dir k = j %% d_in."""
    d = t.shape[-1]
    mask = (jnp.arange(d) % d_in == jnp.arange(3)[:, None]
            ).astype(t.dtype)  # [3, D]
    return jnp.sum(t * mask[None, :, :], axis=1)


def _fold_dirs(v, d_in):
    """[N,D] per-channel values -> [N,3] summed onto each channel's input
    component (j %% d_in)."""
    d = v.shape[-1]
    mask = (jnp.arange(d) % d_in == jnp.arange(3)[:, None]).astype(v.dtype)
    return v @ mask.T


def _cfg_of(cfg_tuple):
    return SDFConfig(**dict(cfg_tuple))


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _vfg_cv(params, x, cfg_tuple):
    out, _ = _forward(params, x, _cfg_of(cfg_tuple))
    return out


def _vfg_fwd(params, x, cfg_tuple):
    out, _ = _forward(params, x, _cfg_of(cfg_tuple))
    return out, (params, x)


def _vfg_bwd(cfg_tuple, res, cots):
    params, x = res
    params_bar, x_bar = _backward(params, x, _cfg_of(cfg_tuple), cots)
    return params_bar, x_bar


_vfg_cv.defvjp(_vfg_fwd, _vfg_bwd)


def sdf_vfg_manual(params, x, cfg: SDFConfig):
    """(sdf [N,1], feature [N,d_out-1], grad [N,3]) with a hand-written
    VJP — a drop-in replacement for fields.sdf_value_feature_gradient in
    gradient-consuming training code."""
    cfg_tuple = tuple(sorted(
        (k, getattr(cfg, k)) for k in cfg.__dataclass_fields__))
    return _vfg_cv(params, x, cfg_tuple)
