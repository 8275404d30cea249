"""neus_occlusion must match neus_render's weight_sum exactly (same
sampling + alpha math, minus color/feature/Eikonal)."""

import jax.numpy as jnp
import numpy as np

from vqnerf_release_tpu.models.neus import (NeuSConfig, init_neus,
                                            neus_occlusion, neus_render)


def test_occlusion_matches_render_weight_sum():
    cfg = NeuSConfig(n_samples=16, n_importance=16, up_sample_steps=2,
                     perturb=0.0)
    params = init_neus(0, cfg)
    rs = np.random.RandomState(0)
    n = 24
    # mix of hitting and missing rays
    o = np.tile([[0.0, 0.0, 2.0]], (n, 1)).astype(np.float32)
    o[n // 2 :, 1] = 2.0  # these miss the init sphere
    d = np.tile([[0.0, 0.0, -1.0]], (n, 1)).astype(np.float32)
    near = np.full((n, 1), 0.5, np.float32)
    far = np.full((n, 1), 3.5, np.float32)

    full = neus_render(params, cfg, jnp.asarray(o), jnp.asarray(d),
                       jnp.asarray(near), jnp.asarray(far), radius=1.0,
                       cos_anneal_ratio=1.0)
    occ = neus_occlusion(params, cfg, jnp.asarray(o), jnp.asarray(d),
                         jnp.asarray(near), jnp.asarray(far), radius=1.0,
                         cos_anneal_ratio=1.0)
    np.testing.assert_allclose(
        np.asarray(occ), np.asarray(full["weight_sum"]), rtol=1e-4,
        atol=1e-5)
    # hit rays opaque, miss rays transparent
    assert (np.asarray(occ)[: n // 2] > 0.5).all()
    assert (np.asarray(occ)[n // 2 :] < 0.1).all()
