"""Positional encoding.

Parity targets:
  * geo/NeuS-ours2/models/embedder.py:6-51 (stage 1)
  * decomp/nerfvq_nfr3/nerfactor/networks/embedder.py:23-47 (stage 2)

Both references emit, for input x of dim d and n frequencies:
  [x, sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...],  f_k = 2**k
(log-sampled with max_freq_log2 = n - 1, include_input = True).

Output layout matters for weight compatibility (channel order is
input-then-per-frequency sin/cos blocks of width d), so we reproduce it
exactly rather than interleave.
"""

from functools import partial

import jax.numpy as jnp

__all__ = ["posenc", "posenc_dim", "make_embedder"]


def posenc_dim(in_dims, n_freqs, include_input=True):
    return (in_dims if include_input else 0) + 2 * n_freqs * in_dims


def posenc(x, n_freqs, include_input=True):
    """Positional-encode the last axis. Static n_freqs -> static shapes."""
    if n_freqs == 0:
        return x
    # freq_bands = 2 ** linspace(0, n_freqs - 1, n_freqs) == 2**k exactly.
    feats = [x] if include_input else []
    for k in range(n_freqs):
        freq = float(2**k)
        feats.append(jnp.sin(x * freq))
        feats.append(jnp.cos(x * freq))
    return jnp.concatenate(feats, axis=-1)


def make_embedder(n_freqs, include_input=True):
    if n_freqs == 0:
        return lambda x: x
    return partial(posenc, n_freqs=n_freqs, include_input=include_input)
