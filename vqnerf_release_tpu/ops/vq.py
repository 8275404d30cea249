"""Functional EMA vector quantization.

Parity target: decomp/nerfvq_nfr3/nerfactor/networks/vq_layers.py:174-349
(VectorQuantizerEMA) including:
  * L2 distances via one matmul: |z|^2 - 2 z C + |C|^2, codebook C [D, K]
  * random-dropout code masking at the distance level (:284-290)
  * straight-through estimator (:327)
  * zero-debiased Sonnet EMAs of cluster sizes and dw = z^T onehot, Laplace
    smoothing, and the unused-code freeze (:304-319)
  * perplexity (:328-330)

Differences by design (TPU-native):
  * No side effects — EMA statistics live in an explicit ``VqEmaState``
    pytree threaded through the train step (the reference calls ``.assign``
    and ``.numpy()`` eagerly, which cannot live under jit).
  * Background rays are excluded with a weight vector instead of
    boolean_mask so shapes stay static.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["VqEmaState", "init_vq_ema_state", "vq_lookup", "vq_ema_apply"]


class VqEmaState(NamedTuple):
    hidden_cluster_size: jnp.ndarray  # [K]
    hidden_dw: jnp.ndarray  # [D, K]
    counter: jnp.ndarray  # [] int32, shared by both EMAs


def init_vq_ema_state(z_dim, n_embed):
    return VqEmaState(
        hidden_cluster_size=jnp.zeros((n_embed,), jnp.float32),
        hidden_dw=jnp.zeros((z_dim, n_embed), jnp.float32),
        counter=jnp.zeros((), jnp.int32),
    )


def _ema_update(hidden, value, counter, decay):
    """Sonnet ExponentialMovingAverage: returns (new_hidden, debiased)."""
    new_hidden = hidden - (hidden - value) * (1.0 - decay)
    debiased = new_hidden / (1.0 - decay ** counter.astype(jnp.float32))
    return new_hidden, debiased


def vq_lookup(codebook, flat_inputs, thres=None, rng=None, mask=None,
              roll=None):
    """Nearest-code assignment with optional random code dropout.

    Args:
      codebook: [D, K]
      flat_inputs: [N, D]
      thres: None, or [K] (or scalar) dropout thresholds; a code is usable
             only where U(0,1) >= thres (vq_layers.py:284-290)
      rng: PRNG key (required when thres is given and roll is None)
      mask: optional [N] validity weights; invalid rows still get an argmin
            but callers must weight them out of any statistics
      roll: optional explicit [1, K] uniforms overriding the rng draw
            (deterministic dropout — used by the reference-parity tests,
            where the TF and JAX RNG streams cannot be aligned)
    Returns dict with encoding_indices [N], encodings [N, K],
      quantized [N, D] (no straight-through), distances [N, K].
    """
    distances = (
        jnp.sum(flat_inputs**2, axis=1, keepdims=True)
        - 2.0 * flat_inputs @ codebook
        + jnp.sum(codebook**2, axis=0, keepdims=True)
    )  # [N, K]

    if thres is not None:
        mask_value = jnp.max(distances)
        if roll is None:
            roll = jax.random.uniform(rng, (1, codebook.shape[1]))
        sel_mask = (roll >= thres).astype(distances.dtype)
        distances = distances * sel_mask + mask_value * (1.0 - sel_mask)

    encoding_indices = jnp.argmin(distances, axis=1)  # [N]
    encodings = jax.nn.one_hot(
        encoding_indices, codebook.shape[1], dtype=flat_inputs.dtype)
    quantized = codebook.T[encoding_indices]  # [N, D]
    return {
        "encoding_indices": encoding_indices,
        "encodings": encodings,
        "quantized": quantized,
        "distances": distances,
    }


def vq_ema_apply(codebook, flat_inputs, ema_state, *, commitment_cost,
                 decay=0.999, epsilon=1e-5, is_training=True, thres=None,
                 rng=None, mask=None, roll=None, use_pallas=False,
                 interpret=None):
    """Full VQ-EMA step (forward + codebook update proposal).

    Returns (outs, new_ema_state). ``outs`` keys:
      quantize: straight-through quantized inputs [N, D]
      loss: commitment_cost * e_latent_loss (scalar)
      perplexity, encodings, encoding_indices, distances
      update: (training only) new codebook value [D, K] — the caller assigns
        it into its state, mirroring ``self._codebook.assign`` at
        vq_nfr.py:580-583.
    ``mask``: [N] 1/0 validity; masked rows contribute nothing to the loss,
    EMA statistics, or perplexity.
    ``use_pallas``: route assignment + EMA statistics + codebook update
    through the fused TPU kernel (ops/pallas/vq_kernel.py); training mode
    only. The fused outs omit the ``distances`` and [N, K] ``encodings``
    diagnostics (rebuilding them would re-materialize what the kernel
    fuses away) and add masked per-code ``counts`` instead. The losses
    and straight-through estimator stay in jnp either way (gradients).
    """
    n = flat_inputs.shape[0]
    if mask is None:
        mask = jnp.ones((n,), flat_inputs.dtype)

    if use_pallas and is_training:
        return _vq_ema_apply_fused(
            codebook, flat_inputs, ema_state, commitment_cost, decay,
            epsilon, thres, rng, mask, roll, interpret)
    look = vq_lookup(codebook, flat_inputs, thres=thres, rng=rng, roll=roll)
    encodings = look["encodings"] * mask[:, None]
    quantized = look["quantized"]

    denom = jnp.maximum(jnp.sum(mask), 1.0)
    e_latent_loss = (
        jnp.sum(
            jnp.mean(
                (jax.lax.stop_gradient(quantized) - flat_inputs) ** 2, axis=-1
            )
            * mask
        )
        / denom
    )
    loss = commitment_cost * e_latent_loss

    # Straight-through estimator
    quantized_st = flat_inputs + jax.lax.stop_gradient(
        quantized - flat_inputs)

    avg_probs = jnp.sum(encodings, axis=0) / denom
    perplexity = jnp.exp(
        -jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)))

    outs = {
        "quantize": quantized_st,
        "loss": loss,
        "perplexity": perplexity,
        "encodings": encodings,
        "encoding_indices": look["encoding_indices"],
        "distances": look["distances"],
    }

    if not is_training:
        return outs, ema_state

    counts = jnp.sum(encodings, axis=0)  # [K]
    dw = (flat_inputs * mask[:, None]).T @ look["encodings"]  # [D, K]

    counter = ema_state.counter + 1
    hidden_cs, ema_cs = _ema_update(
        ema_state.hidden_cluster_size, counts, counter, decay)
    hidden_dw, ema_dw = _ema_update(
        ema_state.hidden_dw, dw, counter, decay)

    n_total = jnp.sum(ema_cs)
    smoothed_cs = (
        (ema_cs + epsilon)
        / (n_total + codebook.shape[1] * epsilon)
        * n_total
    )
    normalized_w = ema_dw / smoothed_cs[None, :]

    used = (counts > 0).astype(codebook.dtype)  # unused-code freeze
    update = normalized_w * used[None, :] + codebook * (1.0 - used[None, :])
    outs["update"] = jax.lax.stop_gradient(update)

    new_state = VqEmaState(hidden_cs, hidden_dw, counter)
    return outs, new_state


def _vq_ema_apply_fused(codebook, flat_inputs, ema_state, commitment_cost,
                        decay, epsilon, thres, rng, mask, roll, interpret):
    """Fused-kernel training step; same contract as vq_ema_apply minus the
    ``distances`` diagnostic (see ops/pallas/vq_kernel.py)."""
    from .pallas.vq_kernel import vq_fused_train

    if interpret is None:  # compiled on TPU, interpreter elsewhere
        interpret = jax.default_backend() != "tpu"
    k = codebook.shape[1]
    if thres is None:
        sel = jnp.ones((k,), jnp.float32)
    else:
        if roll is None:
            roll = jax.random.uniform(rng, (1, k))
        sel = (roll >= thres).astype(jnp.float32).reshape((k,))

    counter = ema_state.counter + 1
    fused = vq_fused_train(
        codebook, flat_inputs, mask.astype(jnp.float32), sel,
        ema_state.hidden_cluster_size, ema_state.hidden_dw,
        counter.astype(jnp.float32), decay=decay, epsilon=epsilon,
        interpret=interpret)

    quantized = fused["quantized"]

    denom = jnp.maximum(jnp.sum(mask), 1.0)
    e_latent_loss = (
        jnp.sum(jnp.mean((quantized - flat_inputs) ** 2, axis=-1) * mask)
        / denom
    )
    avg_probs = fused["counts"] / denom
    perplexity = jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)))

    outs = {
        "quantize": flat_inputs + jax.lax.stop_gradient(
            quantized - flat_inputs),
        "loss": commitment_cost * e_latent_loss,
        "perplexity": perplexity,
        # no [N, K] "encodings" in fused mode — rebuilding the one-hot
        # would re-materialize exactly the HBM intermediate the kernel
        # avoids; the masked per-code "counts" cover the consumers
        # (usage = counts > 0)
        "counts": fused["counts"],
        "encoding_indices": fused["indices"],
        "update": fused["update"],
    }
    new_state = VqEmaState(fused["hidden_cs"], fused["hidden_dw"], counter)
    return outs, new_state
