"""Fused microfacet-BRDF + render-equation Pallas kernel.

Replaces the inference-path composition of ``microfacet_brdf`` +
``render_equation`` (ops/microfacet.py + ops/render.py): the jnp pipeline
materializes several [N, L, 3] HBM tensors (surf2l, half vectors, F/D/G,
brdf, per-light contributions — ~50 MB each at N=8192, L=512); this kernel
streams a ray block through VMEM and writes only the [N, 3] integral.

Layout: rays on sublanes, lights on lanes.
  ray_attr [N, 16]: xyz(0:3) normal(3:6) surf2c(6:9) albedo(9:12)
                    f0(12:15) rough(15)
  lights   [8, L]:  lxyz(0:3) light rgb(3:6) areas(6) pad(7)
  lvis     [N, L]
Out: rgb [N, 3] (pre-gamma, pre-clip — callers apply gamma/tonemap).

Numerics match ops/microfacet.py exactly (same safe-normalize epsilon,
divide_no_nan, clip ranges); forward-only (inference paths: fast_render,
relight probes, vq_test). Training keeps the jnp path for gradients.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fused_brdf_render", "fused_available", "pack_lights"]

_PI = float(np.pi)
BLOCK_RAYS = 128


def fused_available():
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu  # noqa: F401
        return True
    except Exception:
        return False


def _safe_norm3(x, y, z, eps=1e-6):
    inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, eps))
    return x * inv, y * inv, z * inv


def _gsub(cos_t, alpha2):
    cos_t = jnp.clip(cos_t, 0.0, 1.0)
    den = cos_t + jnp.sqrt(jnp.abs(alpha2 + (1.0 - alpha2) * cos_t * cos_t))
    return jnp.where(den == 0.0, 0.0, 2.0 * cos_t / jnp.where(
        den == 0.0, 1.0, den))


def _render_block_kernel(attr_ref, lvis_ref, lights_ref, out_ref):
    attr = attr_ref[:]  # [B, 16]
    x = attr[:, 0:1]
    yy = attr[:, 1:2]
    zz = attr[:, 2:3]
    nx = attr[:, 3:4]
    ny = attr[:, 4:5]
    nz = attr[:, 5:6]
    vx = attr[:, 6:7]
    vy = attr[:, 7:8]
    vz = attr[:, 8:9]
    rough = attr[:, 15:16]

    lx = lights_ref[0:1, :]  # [1, L]
    ly = lights_ref[1:2, :]
    lz = lights_ref[2:3, :]
    areas = lights_ref[6:7, :]

    # normalize per-ray vectors (match safe_l2_normalize semantics)
    nx, ny, nz = _safe_norm3(nx, ny, nz)
    vx, vy, vz = _safe_norm3(vx, vy, vz)

    # surface -> light dirs [B, L]
    sx = lx - x
    sy = ly - yy
    sz = lz - zz
    sx, sy, sz = _safe_norm3(sx, sy, sz)

    # half vectors
    hx = sx + vx
    hy = sy + vy
    hz = sz + vz
    hx, hy, hz = _safe_norm3(hx, hy, hz)

    cos_vh = jnp.clip(hx * vx + hy * vy + hz * vz, 0.0, 1.0)  # [B, L]
    cos_nh = jnp.clip(hx * nx + hy * ny + hz * nz, 0.0, 1.0)
    cos_ln = sx * nx + sy * ny + sz * nz  # unclipped (render-eq cos)
    cos_vn = nx * vx + ny * vy + nz * vz  # [B, 1]

    alpha2 = jnp.square(rough * rough)  # [B, 1]

    den_d = _PI * jnp.square(
        cos_nh * cos_nh * (alpha2 - 1.0) + 1.0)
    d = jnp.where(den_d == 0.0, 0.0,
                  alpha2 / jnp.where(den_d == 0.0, 1.0, den_d))

    g = _gsub(cos_ln, alpha2) * _gsub(cos_vn, alpha2)

    den_spec = 4.0 * jnp.abs(cos_ln) * jnp.abs(cos_vn)
    gd_over_den = jnp.where(
        den_spec == 0.0, 0.0,
        (g * d) / jnp.where(den_spec == 0.0, 1.0, den_spec))

    front = (cos_ln > 0.0).astype(attr.dtype)
    lv = front * lvis_ref[:]  # [B, L]
    weight = lv * cos_ln * areas  # [B, L]
    one_m_cvh5 = (1.0 - cos_vh) ** 5

    for c in range(3):
        albedo_c = attr[:, 9 + c : 10 + c]
        f0_c = attr[:, 12 + c : 13 + c]
        f = f0_c + (1.0 - f0_c) * one_m_cvh5
        brdf_c = f * gd_over_den + albedo_c * (1.0 / _PI)
        light_c = lights_ref[3 + c : 4 + c, :]  # [1, L]
        contrib = brdf_c * weight * light_c
        out_ref[:, c : c + 1] = jnp.sum(contrib, axis=1, keepdims=True)


def pack_lights(lxyz, lareas, light_flat):
    """[8, L] packed light constants."""
    l = lxyz.shape[0]
    out = jnp.zeros((8, l), jnp.float32)
    out = out.at[0:3].set(lxyz.T)
    out = out.at[3:6].set(light_flat.T)
    out = out.at[6].set(lareas)
    return out


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_brdf_render(xyz, normal, surf2c, albedo, rough, f0, lvis,
                      lights_packed, interpret=False):
    """Fused render. All per-ray args [N, *]; lights_packed from
    ``pack_lights``; lvis [N, L] (pass front-lit-only ones for no
    visibility data). Returns rgb [N, 3] (pre-gamma/tonemap)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = xyz.shape[0]
    l = lights_packed.shape[1]
    assert n % BLOCK_RAYS == 0, f"pad rays to a multiple of {BLOCK_RAYS}"

    attr = jnp.concatenate(
        [xyz, normal, surf2c, albedo, f0, rough], axis=-1)  # [N, 16]

    grid = (n // BLOCK_RAYS,)
    return pl.pallas_call(
        _render_block_kernel,
        out_shape=jax.ShapeDtypeStruct((n, 3), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_RAYS, 16), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_RAYS, l), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, l), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_RAYS, 3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(attr, lvis, lights_packed)
