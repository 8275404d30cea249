"""Lloyd's k-means in JAX (codebook initialization).

Parity target: decomp/nerfvq_nfr3/nerfactor/util/torch_kmeans.py — random
sample init (np.random.choice without replacement under a seed), euclidean
assignment via a distance matmul, mean re-centering, stop when the squared
sum of center shifts < tol. Used by the VQ trainer's epoch-0 latent
clustering (train_nfr.py:470-488).

TPU-native: the assignment/update loop runs under lax.while_loop with a
static iteration cap; distances use one [N, K] matmul per iteration.
Empty clusters keep their previous center (the reference would produce NaN
there; k << N in practice so it never hits, but we stay safe).
"""

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["kmeans", "kmeans_predict"]


def _pairwise_sq_dist(x, centers):
    # |x|^2 - 2 x c^T + |c|^2  -> [N, K]
    return (
        jnp.sum(x**2, axis=1, keepdims=True)
        - 2.0 * x @ centers.T
        + jnp.sum(centers**2, axis=1)[None, :]
    )


def kmeans(x, num_clusters, seed=1, tol=1e-4, max_iters=1000):
    """Returns (assignments [N], centers [K, D])."""
    x = jnp.asarray(x, jnp.float32)
    rng = np.random.RandomState(seed)
    idx = rng.choice(x.shape[0], num_clusters, replace=False)
    init_centers = x[jnp.asarray(idx)]

    def step(state):
        centers, _, it = state
        assign = jnp.argmin(_pairwise_sq_dist(x, centers), axis=1)
        onehot = jax.nn.one_hot(assign, num_clusters, dtype=x.dtype)  # [N,K]
        counts = jnp.sum(onehot, axis=0)  # [K]
        sums = onehot.T @ x  # [K, D]
        new_centers = jnp.where(
            (counts > 0)[:, None], sums / jnp.maximum(counts, 1.0)[:, None],
            centers)
        shift = jnp.sum(
            jnp.sqrt(jnp.sum((new_centers - centers) ** 2, axis=1)))
        return new_centers, shift**2, it + 1

    def cond(state):
        _, shift_sq, it = state
        return jnp.logical_and(shift_sq >= tol, it < max_iters)

    centers, _, _ = jax.lax.while_loop(
        cond, step, (init_centers, jnp.asarray(jnp.inf), jnp.asarray(0)))
    assign = jnp.argmin(_pairwise_sq_dist(x, centers), axis=1)
    return assign, centers


def kmeans_predict(x, centers):
    x = jnp.asarray(x, jnp.float32)
    return jnp.argmin(_pairwise_sq_dist(x, centers), axis=1)
