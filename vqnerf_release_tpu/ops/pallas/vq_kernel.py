"""Fused VQ-EMA Pallas kernel: assignment + statistics + codebook update.

One kernel per training step covering the whole VectorQuantizerEMA hot
path (reference: decomp/nerfvq_nfr3/nerfactor/networks/vq_layers.py:174-349;
jnp parity implementation: ops/vq.py):

  * L2 distances |z|^2 - 2 zC + |C|^2 on the MXU,
  * dropout-code masking at the distance level,
  * argmin assignment (first-index tie-break, matching jnp.argmin),
  * quantized rows (one-hot @ C^T, MXU),
  * masked cluster counts and dw = (z*mask)^T one-hot (MXU), accumulated
    across ray blocks in VMEM,
  * on the last block: the Sonnet EMA update (zero-debias, Laplace
    smoothing, unused-code freeze) producing the new hidden EMA state and
    the assigned codebook.

The jnp path in ops/vq.py materializes [N, K] one-hots and distances in
HBM between ops; here a ray block stays in VMEM and only the [N] indices,
[N, D] quantized rows and the [K]-sized statistics leave the kernel. Every
output is consumed under stop_gradient by construction (the EMA update
bypasses gradients in the reference too, vq_nfr.py:580-583), so the kernel
needs no VJP; the commitment loss and straight-through estimator stay in
jnp where autodiff needs them.

Semantics note: dropped codes are excluded from the argmin with a large
constant rather than the jnp path's fill of max(distances) over the WHOLE
[N, K] matrix; the argmin can differ only in the degenerate case where a
row's usable minimum already equals that global max while a dropped code
has a lower index. The `distances` diagnostic output is not produced in
fused mode.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["vq_fused_train", "BLOCK_ROWS"]

BLOCK_ROWS = 512
_BIG = 1e30


def _vq_block_kernel(counter_ref, x_ref, rowmask_ref, sel_ref, cb_ref,
                     hcs_ref, hdw_ref, idx_ref, quant_ref, counts_ref,
                     new_hcs_ref, new_hdw_ref, update_ref, *, decay,
                     epsilon, n_embed):
    i = pl.program_id(0)
    last = pl.num_programs(0) - 1

    x = x_ref[:]  # [B, D]
    cb = cb_ref[:]  # [D, K]
    rowmask = rowmask_ref[:]  # [B, 1]

    # L2 distances on the MXU (vq_layers.py:279-283)
    x_sq = jnp.sum(x * x, axis=1, keepdims=True)  # [B, 1]
    cb_sq = jnp.sum(cb * cb, axis=0, keepdims=True)  # [1, K]
    cross = jnp.dot(x, cb, preferred_element_type=jnp.float32)  # [B, K]
    d = x_sq - 2.0 * cross + cb_sq

    # random-dropout code masking at the distance level (:284-290)
    sel = sel_ref[:]  # [1, K]
    d = jnp.where(sel > 0.0, d, _BIG)

    # argmin with first-index tie-break (matches jnp.argmin)
    dmin = jnp.min(d, axis=1, keepdims=True)  # [B, 1]
    iota_k = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    idx = jnp.min(jnp.where(d <= dmin, iota_k, n_embed), axis=1,
                  keepdims=True)  # [B, 1]
    idx_ref[:] = idx

    onehot = (iota_k == idx).astype(jnp.float32)  # [B, K]

    # quantized rows = one-hot gather as a matmul (:292)
    quant_ref[:] = jax.lax.dot_general(
        onehot, cb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [B, D]

    # masked statistics, accumulated across ray blocks
    oh_m = onehot * rowmask  # [B, K]
    counts_blk = jnp.sum(oh_m, axis=0, keepdims=True)  # [1, K]
    dw_blk = jax.lax.dot_general(
        x, oh_m, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [D, K]

    @pl.when(i == 0)
    def _():
        counts_ref[:] = counts_blk
        new_hdw_ref[:] = dw_blk

    @pl.when(i > 0)
    def _():
        counts_ref[:] = counts_ref[:] + counts_blk
        new_hdw_ref[:] = new_hdw_ref[:] + dw_blk

    # Sonnet EMA + Laplace smoothing + unused-code freeze on the final
    # block, once the statistics are complete (vq_layers.py:304-319).
    # new_hdw_ref holds the accumulated dw until this point; it is
    # rewritten in place with the EMA-updated hidden value.
    @pl.when(i == last)
    def _():
        counter = counter_ref[0]
        counts = counts_ref[:]  # [1, K]
        dw = new_hdw_ref[:]  # [D, K]
        one_m_decay = 1.0 - decay
        debias = 1.0 - jnp.exp(counter * jnp.log(decay))

        hcs = hcs_ref[:] - (hcs_ref[:] - counts) * one_m_decay
        new_hcs_ref[:] = hcs
        ema_cs = hcs / debias

        hdw = hdw_ref[:] - (hdw_ref[:] - dw) * one_m_decay
        new_hdw_ref[:] = hdw
        ema_dw = hdw / debias

        n_total = jnp.sum(ema_cs)
        smoothed = ((ema_cs + epsilon)
                    / (n_total + n_embed * epsilon) * n_total)  # [1, K]
        normalized_w = ema_dw / smoothed

        used = (counts > 0.0).astype(jnp.float32)  # [1, K]
        update_ref[:] = normalized_w * used + cb * (1.0 - used)

    @pl.when(jnp.logical_and(i == 0, last > 0))
    def _():
        # define the small epilogue outputs on every revisited block so
        # the buffers are initialized before the final-step overwrite
        new_hcs_ref[:] = hcs_ref[:]
        update_ref[:] = cb


@functools.partial(
    jax.jit, static_argnames=("decay", "epsilon", "interpret"))
def vq_fused_train(codebook, flat_inputs, rowmask, sel, hidden_cs,
                   hidden_dw, counter, *, decay, epsilon, interpret=False):
    """Fused training-mode VQ step.

    Args:
      codebook: [D, K] float32
      flat_inputs: [N, D] float32 (any N; padded internally)
      rowmask: [N] validity weights (1/0)
      sel: [K] usable-code mask (1 = usable) — dropout already drawn
      hidden_cs / hidden_dw: Sonnet EMA hidden values ([K], [D, K])
      counter: scalar float32 — the ALREADY-INCREMENTED EMA counter
    Returns dict: indices [N] int32, quantized [N, D], counts [K],
      hidden_cs [K], hidden_dw [D, K], update [D, K]; all stop_gradient.
    """
    # every output is a constant w.r.t. autodiff (the reference applies
    # the EMA update via .assign outside gradients); cutting gradients at
    # the INPUTS keeps jax from trying to JVP through pallas_call
    (codebook, flat_inputs, rowmask, sel, hidden_cs, hidden_dw,
     counter) = jax.tree_util.tree_map(
        jax.lax.stop_gradient,
        (codebook, flat_inputs, rowmask, sel, hidden_cs, hidden_dw,
         counter))
    n, d_dim = flat_inputs.shape
    k = codebook.shape[1]

    n_pad = -n % BLOCK_ROWS
    if n_pad:
        flat_inputs = jnp.pad(flat_inputs, ((0, n_pad), (0, 0)))
        rowmask = jnp.pad(rowmask, ((0, n_pad),))
    n_full = n + n_pad
    grid = (n_full // BLOCK_ROWS,)

    kernel = functools.partial(
        _vq_block_kernel, decay=float(decay), epsilon=float(epsilon),
        n_embed=k)

    out_shapes = (
        jax.ShapeDtypeStruct((n_full, 1), jnp.int32),     # indices
        jax.ShapeDtypeStruct((n_full, d_dim), jnp.float32),  # quantized
        jax.ShapeDtypeStruct((1, k), jnp.float32),        # counts
        jax.ShapeDtypeStruct((1, k), jnp.float32),        # new hidden_cs
        jax.ShapeDtypeStruct((d_dim, k), jnp.float32),    # new hidden_dw
        jax.ShapeDtypeStruct((d_dim, k), jnp.float32),    # update
    )
    whole = lambda i: (0, 0)  # noqa: E731
    idx_o, quant_o, counts_o, hcs_o, hdw_o, upd_o = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # counter [1]
            pl.BlockSpec((BLOCK_ROWS, d_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((d_dim, k), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((d_dim, k), whole, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((BLOCK_ROWS, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS, d_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((d_dim, k), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((d_dim, k), whole, memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(counter.reshape((1,)), flat_inputs, rowmask[:, None],
      sel.reshape((1, k)), codebook, hidden_cs.reshape((1, k)), hidden_dw)

    outs = {
        "indices": idx_o[:n, 0],
        "quantized": quant_o[:n],
        "counts": counts_o[0],
        "hidden_cs": hcs_o[0],
        "hidden_dw": hdw_o,
        "update": upd_o,
    }
    return jax.tree_util.tree_map(jax.lax.stop_gradient, outs)
