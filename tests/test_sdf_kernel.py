"""Fused SDF forward+gradient kernel vs the jnp reference path."""

import jax.numpy as jnp
import numpy as np

from vqnerf_release_tpu.models import fields
from vqnerf_release_tpu.ops.pallas.sdf_kernel import (BLOCK,
                                                      sdf_fwdgrad_jnp,
                                                      sdf_fwdgrad_pallas)


def test_fused_sdf_matches_jnp():
    cfg = fields.SDFConfig()
    params = fields.init_sdf(0, cfg)
    rs = np.random.RandomState(0)
    pts = jnp.asarray(rs.randn(BLOCK * 2, 3).astype(np.float32)) * 0.5

    sdf_ref, grad_ref = sdf_fwdgrad_jnp(params, pts, cfg)
    sdf_k, grad_k = sdf_fwdgrad_pallas(params, pts, cfg, interpret=True)

    np.testing.assert_allclose(
        np.asarray(sdf_k), np.asarray(sdf_ref), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(grad_k), np.asarray(grad_ref), rtol=3e-3, atol=3e-4)


def test_fused_sdf_nondefault_scale():
    cfg = fields.SDFConfig(scale=2.0)
    params = fields.init_sdf(1, cfg)
    rs = np.random.RandomState(1)
    pts = jnp.asarray(rs.randn(BLOCK, 3).astype(np.float32)) * 0.3

    sdf_ref, grad_ref = sdf_fwdgrad_jnp(params, pts, cfg)
    sdf_k, grad_k = sdf_fwdgrad_pallas(params, pts, cfg, interpret=True)
    np.testing.assert_allclose(
        np.asarray(sdf_k), np.asarray(sdf_ref), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(grad_k), np.asarray(grad_ref), rtol=3e-3, atol=3e-4)
