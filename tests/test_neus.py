import jax
import jax.numpy as jnp
import numpy as np

from vqnerf_release_tpu.models import fields
from vqnerf_release_tpu.models.neus import NeuSConfig, init_neus, neus_render


def test_sdf_geometric_init_approximates_sphere():
    """Geometric init (fields.py:45-63) yields sdf(x) ~ |x| - bias."""
    cfg = fields.SDFConfig()
    params = fields.init_sdf(0, cfg)
    rs = np.random.RandomState(0)
    dirs = rs.randn(64, 3)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    radii = rs.uniform(0.1, 1.0, (64, 1))
    pts = (dirs * radii).astype(np.float32)
    sdf = np.asarray(fields.sdf_only(params, jnp.asarray(pts), cfg))
    expected = np.linalg.norm(pts, axis=1) - cfg.bias
    # loose: the MLP only approximates the sphere well near the surface
    assert np.abs(sdf - expected).mean() < 0.2
    # sign agreement away from the surface
    far = np.abs(expected) > 0.15
    assert (np.sign(sdf[far]) == np.sign(expected[far])).mean() > 0.9


def test_sdf_gradient_matches_finite_differences():
    cfg = fields.SDFConfig()
    params = fields.init_sdf(0, cfg)
    pts = jnp.asarray(
        np.random.RandomState(1).randn(8, 3).astype(np.float32)) * 0.3
    g = np.asarray(fields.sdf_gradient(params, pts, cfg))
    eps = 1e-2
    fd = np.zeros_like(g)
    for k in range(3):
        d = np.zeros((1, 3), np.float32)
        d[0, k] = eps
        hi = np.asarray(fields.sdf_only(params, pts + d, cfg))
        lo = np.asarray(fields.sdf_only(params, pts - d, cfg))
        fd[:, k] = (hi - lo) / (2 * eps)
    # f32 + Softplus(beta=100) makes exact FD comparison noisy; check the
    # gradient direction and magnitude instead.
    cos = np.sum(g * fd, axis=1) / (
        np.linalg.norm(g, axis=1) * np.linalg.norm(fd, axis=1) + 1e-12)
    assert (cos > 0.99).all()
    np.testing.assert_allclose(
        np.linalg.norm(g, axis=1), np.linalg.norm(fd, axis=1), rtol=0.15)


def test_sdf_gradient_near_unit_norm_at_init():
    """Eikonal property holds approximately at geometric init."""
    cfg = fields.SDFConfig()
    params = fields.init_sdf(0, cfg)
    pts = jnp.asarray(
        np.random.RandomState(2).randn(64, 3).astype(np.float32)) * 0.5
    g = np.asarray(fields.sdf_gradient(params, pts, cfg))
    norms = np.linalg.norm(g, axis=1)
    assert np.abs(norms - 1.0).mean() < 0.2


def test_variance_network():
    p = fields.init_variance(0.3)
    np.testing.assert_allclose(
        float(fields.inv_s_from(p)), np.exp(3.0), rtol=1e-5)


def test_neus_render_finds_sphere_surface():
    cfg = NeuSConfig(n_samples=32, n_importance=32, up_sample_steps=4,
                     perturb=0.0)
    params = init_neus(0, cfg)
    # Rays from (0,0,2) toward origin: the init sphere (r=0.5) surface is at
    # depth ~1.5.
    r = 16
    rays_o = jnp.tile(jnp.asarray([[0.0, 0.0, 2.0]]), (r, 1))
    rays_d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (r, 1))
    near = jnp.full((r, 1), 0.5)
    far = jnp.full((r, 1), 3.5)

    out = jax.jit(
        lambda p: neus_render(
            p, cfg, rays_o, rays_d, near, far, radius=1.0,
            cos_anneal_ratio=1.0)
    )(params)

    assert out["color_fine"].shape == (r, 3)
    assert out["weights"].shape == (r, cfg.n_samples + cfg.n_importance)
    w_sum = np.asarray(out["weight_sum"])
    assert (w_sum > 0.5).all(), "rays through the init sphere should be opaque"
    depth = np.asarray(out["depth"])
    np.testing.assert_allclose(depth, 1.5, atol=0.15)
    surf = np.asarray(out["surf"])
    np.testing.assert_allclose(surf[:, 2], 0.5, atol=0.15)
    assert np.isfinite(np.asarray(out["gradient_error"]))


def test_neus_render_miss_is_transparent():
    cfg = NeuSConfig(n_samples=32, n_importance=32, up_sample_steps=4,
                     perturb=0.0)
    params = init_neus(0, cfg)
    r = 4
    rays_o = jnp.tile(jnp.asarray([[0.0, 2.0, 2.0]]), (r, 1))
    rays_d = jnp.tile(
        jnp.asarray([[0.0, 0.0, -1.0]]), (r, 1))  # passes 2 units above
    near = jnp.full((r, 1), 0.5)
    far = jnp.full((r, 1), 3.5)
    out = neus_render(params, cfg, rays_o, rays_d, near, far, radius=1.0,
                      cos_anneal_ratio=1.0)
    assert (np.asarray(out["weight_sum"]) < 0.1).all()


def test_neus_render_grads_flow():
    cfg = NeuSConfig(n_samples=16, n_importance=16, up_sample_steps=2,
                     perturb=0.0)
    params = init_neus(0, cfg)
    rays_o = jnp.asarray([[0.0, 0.0, 2.0]] * 4)
    rays_d = jnp.asarray([[0.0, 0.0, -1.0]] * 4)
    near = jnp.full((4, 1), 0.5)
    far = jnp.full((4, 1), 3.5)

    def loss(p):
        out = neus_render(p, cfg, rays_o, rays_d, near, far, radius=1.0,
                          cos_anneal_ratio=1.0)
        return (jnp.mean(jnp.abs(out["color_fine"] - 0.5))
                + 0.1 * out["gradient_error"])

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # both the SDF net (via Eikonal + geometry) and color net get signal
    g_sdf = np.concatenate(
        [np.asarray(l).ravel() for l in jax.tree_util.tree_leaves(g["sdf"])])
    g_col = np.concatenate(
        [np.asarray(l).ravel() for l in jax.tree_util.tree_leaves(g["color"])])
    assert np.abs(g_sdf).max() > 0
    assert np.abs(g_col).max() > 0
