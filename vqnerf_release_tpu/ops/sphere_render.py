"""Render BRDFs on a unit sphere under an envmap (BRDF visualization).

Parity target: decomp/nerfvq_nfr3/brdf/renderer.py:23-249 (SphereRenderer):
an orthographic unit sphere facing the camera; per-pixel normals from the
sphere; the rendering equation integrated over the lat-long light sphere —
used to visualize BRDF datasets / edited materials.
"""

import numpy as np

from .light import gen_light_xyz
from .microfacet import microfacet_brdf
from .render import render_equation

__all__ = ["sphere_normals", "render_brdf_sphere"]


def sphere_normals(imh):
    """Orthographic sphere: returns (normals [N,3], mask [imh,imh]) where
    the sphere projects to the centered disk."""
    ys, xs = np.meshgrid(
        np.linspace(1, -1, imh), np.linspace(-1, 1, imh), indexing="ij")
    rr = xs**2 + ys**2
    mask = rr <= 1.0
    z = np.sqrt(np.clip(1.0 - rr, 0.0, 1.0))
    normals = np.stack([xs, ys, z], axis=-1)
    normals[~mask] = np.array([0.0, 0.0, 1.0])
    return normals.reshape(-1, 3).astype(np.float32), mask


def render_brdf_sphere(albedo, rough, f0, envmap, imh=128, light_h=16):
    """Render one material on the sphere under ``envmap`` [Lh, Lw, 3].

    albedo/f0: [3]; rough: scalar. Returns [imh, imh, 3] float image
    (linear), background black.
    """
    import jax.numpy as jnp

    normals, mask = sphere_normals(imh)
    n = normals.shape[0]
    lxyz, lareas = gen_light_xyz(light_h, 2 * light_h)
    lxyz_flat = jnp.asarray(lxyz.reshape(-1, 3) / np.linalg.norm(
        lxyz.reshape(-1, 3), axis=-1, keepdims=True), jnp.float32)

    surf2l = jnp.broadcast_to(lxyz_flat[None], (n,) + lxyz_flat.shape)
    surf2c = jnp.asarray(
        np.tile([[0.0, 0.0, 1.0]], (n, 1)), jnp.float32)  # ortho view
    normals_j = jnp.asarray(normals)
    albedo_j = jnp.tile(jnp.asarray(albedo, jnp.float32)[None], (n, 1))
    rough_j = jnp.full((n, 1), float(rough), jnp.float32)
    f0_j = jnp.tile(jnp.asarray(f0, jnp.float32)[None], (n, 1))

    brdf, _, _ = microfacet_brdf(
        surf2l, surf2c, normals_j, albedo=albedo_j, rough=rough_j, f0=f0_j)
    rgb = render_equation(
        brdf, surf2l, normals_j,
        jnp.asarray(lareas.reshape(-1), jnp.float32),
        jnp.asarray(envmap, jnp.float32))
    img = np.array(rgb).reshape(imh, imh, 3)
    img[~mask] = 0.0
    return img
