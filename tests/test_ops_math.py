import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqnerf_release_tpu.ops import colorspace, math as vmath


def test_divide_no_nan():
    x = jnp.array([1.0, 2.0, -3.0, 4.0])
    y = jnp.array([2.0, 0.0, 3.0, 0.0])
    out = vmath.divide_no_nan(x, y)
    np.testing.assert_allclose(out, [0.5, 0.0, -1.0, 0.0])
    # gradient through zero-denominator lanes is exactly zero
    g = jax.grad(lambda a: jnp.sum(vmath.divide_no_nan(a, y)))(x)
    np.testing.assert_allclose(g, [0.5, 0.0, 1.0 / 3.0, 0.0])


def test_clip_preserve_gradient():
    x = jnp.array([-1.0, 0.5, 2.0])
    out = vmath.clip_preserve_gradient(x, 0.0, 1.0)
    np.testing.assert_allclose(out, [0.0, 0.5, 1.0])
    g = jax.grad(lambda a: jnp.sum(vmath.clip_preserve_gradient(a, 0.0, 1.0) ** 2))(x)
    # d/dx of clip(x)^2 with pass-through grad: 2*clip(x)
    np.testing.assert_allclose(g, [0.0, 1.0, 2.0])


def test_safe_l2_normalize_matches_tf_semantics():
    # tf.linalg.l2_normalize: x * rsqrt(max(sum(x^2), eps))
    x = np.random.RandomState(0).randn(5, 3).astype(np.float32)
    out = vmath.safe_l2_normalize(jnp.asarray(x), axis=1)
    expected = x / np.sqrt(np.maximum((x**2).sum(1, keepdims=True), 1e-6))
    np.testing.assert_allclose(out, expected, rtol=1e-6)
    # zero vector stays zero (and grad is finite)
    z = jnp.zeros((1, 3))
    np.testing.assert_allclose(vmath.safe_l2_normalize(z, axis=1), z)
    g = jax.grad(lambda a: jnp.sum(vmath.safe_l2_normalize(a, axis=1)))(z)
    assert np.isfinite(np.asarray(g)).all()


def test_safe_acos_grad_finite_at_one():
    g = jax.grad(vmath.safe_acos)(jnp.asarray(1.0))
    assert np.isfinite(g)
    # interior matches d/dx acos = -1/sqrt(1-x^2) closely
    g_mid = jax.grad(vmath.safe_acos)(jnp.asarray(0.3))
    np.testing.assert_allclose(g_mid, -1.0 / np.sqrt(1 - 0.09), rtol=1e-3)


def test_safe_atan2_grad():
    g = jax.grad(lambda a: vmath.safe_atan2(a, jnp.asarray(0.0)))(
        jnp.asarray(0.0))
    assert np.isfinite(g)


@pytest.mark.parametrize("v", [0.0, 0.001, 0.0031308, 0.2, 0.5, 1.0])
def test_srgb_roundtrip(v):
    x = jnp.asarray(v, jnp.float32)
    s = colorspace.linear2srgb(x)
    back = colorspace.srgb2linear(s)
    np.testing.assert_allclose(back, x, atol=5e-6)


def test_srgb_reference_values():
    # Spot values from the IEC 61966-2-1 curve
    np.testing.assert_allclose(
        colorspace.linear2srgb(jnp.asarray(0.5)), 0.735357, atol=1e-5)
    np.testing.assert_allclose(
        colorspace.linear2srgb(jnp.asarray(0.002)), 0.02584, atol=1e-5)
    # gradient finite at 0
    g = jax.grad(lambda a: colorspace.linear2srgb(a))(jnp.asarray(0.0))
    assert np.isfinite(g)


def test_rgb2chromaticity():
    rgb = jnp.asarray([[3.0, 0.0, 4.0], [0.0, 0.0, 0.0]])
    out = vmath.rgb2chromaticity(rgb)
    np.testing.assert_allclose(out, [[0.6, 0.0, 0.8], [0.0, 0.0, 0.0]])
