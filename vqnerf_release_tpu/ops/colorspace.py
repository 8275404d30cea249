"""sRGB <-> linear conversions.

Parity target: decomp/nerfvq_nfr3/nerfactor/util/img.py (linear2srgb /
srgb2linear) — standard IEC 61966-2-1 piecewise curves. The reference clips
inputs to [0, 1] before linear2srgb; we do the same (without the warning).
"""

import jax.numpy as jnp

SRGB_LINEAR_THRES = 0.0031308
SRGB_INV_THRES = 0.04045
SRGB_LINEAR_COEFF = 12.92
SRGB_EXP_COEFF = 1.055
SRGB_EXPONENT = 2.4


def linear2srgb(x):
    x = jnp.clip(x, 0.0, 1.0)
    lin = x * SRGB_LINEAR_COEFF
    # Clamp the pow input away from 0 so the backward pass of x**(1/2.4)
    # stays finite at 0 (the branch is unselected there anyway).
    safe_x = jnp.maximum(x, SRGB_LINEAR_THRES)
    nonlin = SRGB_EXP_COEFF * safe_x ** (1.0 / SRGB_EXPONENT) - (
        SRGB_EXP_COEFF - 1.0
    )
    return jnp.where(x <= SRGB_LINEAR_THRES, lin, nonlin)


def srgb2linear(x):
    lin = x / SRGB_LINEAR_COEFF
    base = jnp.maximum(
        (x + SRGB_EXP_COEFF - 1.0) / SRGB_EXP_COEFF, 1e-8
    )
    nonlin = base**SRGB_EXPONENT
    return jnp.where(x <= SRGB_INV_THRES, lin, nonlin)
