"""sdf_manual: the hand-derived reverse-over-forward VJP for
(sdf, feature, gradient) must match nested autodiff exactly — forward
bit-identical, parameter/input gradients (including the second-order
Eikonal path) to f32 tolerance."""

import jax
import jax.numpy as jnp
import numpy as np

from vqnerf_release_tpu.models import fields
from vqnerf_release_tpu.models.sdf_manual import sdf_vfg_manual

CFG = fields.SDFConfig(d_hidden=64, n_layers=4, d_out=65, multires=6,
                       skip_in=(2,), scale=1.5)


def _setup(seed=0, n=64):
    params = fields.init_sdf(0, CFG)
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.rand(n, 3).astype(np.float32) - 0.5)
    return params, x


def test_forward_matches_vjp_based():
    params, x = _setup()
    s1, f1, g1 = fields.sdf_value_feature_gradient(params, x, CFG)
    s2, f2, g2 = sdf_vfg_manual(params, x, CFG)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)


def test_custom_vjp_matches_nested_autodiff():
    params, x = _setup(1)

    def mk(vfg):
        def loss(params, x):
            s, f, g = vfg(params, x, CFG)
            eik = jnp.mean((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)
            # touch every output, including a grad*feature cross term so
            # all cotangent paths (s̄, f̄, ḡ) are non-trivial
            return (jnp.sum(jnp.sin(s)) * 0.3 + eik
                    + jnp.sum(f**2) * 0.01
                    + jnp.sum(g * jnp.cos(f[:, :3])))
        return loss

    ga = jax.grad(mk(fields.sdf_value_feature_gradient),
                  argnums=(0, 1))(params, x)
    gm = jax.grad(mk(sdf_vfg_manual), argnums=(0, 1))(params, x)
    for a, m in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gm)):
        scale = float(jnp.max(jnp.abs(a))) + 1e-8
        np.testing.assert_allclose(np.asarray(m) / scale,
                                   np.asarray(a) / scale, atol=2e-5)


def test_custom_vjp_under_jit_and_vmapless_batch():
    params, x = _setup(2, n=128)

    @jax.jit
    def loss(params, x):
        s, f, g = sdf_vfg_manual(params, x, CFG)
        return jnp.mean((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)

    val, grads = jax.value_and_grad(loss)(params, x)
    assert np.isfinite(float(val))
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(grads))
