"""On-device jitter-pair ray sampling for the scanned-dispatch trainers.

Same selection semantics as data.sampler.sample_pix (the reference's
outer_sample, decomp/nerfvq_nfr3/nerfactor/trainvali.py:327-412 /
train_nfr.py:380-470): per interior foreground pixel pick one
8-neighborhood jitter ('contrast' = max channel-max |rgb delta|,
deterministic; 'random' = uniform), keep pixels where BOTH alphas pass
the threshold, draw n_rays pixels with replacement, emit interleaved
[p, p_jit, ...] flat indices — but computed INSIDE the jitted epoch
scan from the device-resident store, with a jax PRNG key per step.

Why: the host samplers are exact but their index stream must cross the
host->device link every epoch, and that link (the axon tunnel)
serializes transfers with compute — staging is the residual gap between
the chunked scanned dispatch and its pure-compute ceiling (BASELINE.md
r4). Device sampling ships NOTHING per epoch (the per-step key is
fold_in(base_key, step) inside the scan), at the cost of a different
RNG stream: batches are equally distributed but not bit-identical to
the host path, which is why this is an explicit opt-in
(DecompConfig.device_sampling) rather than a default.

Replicated / u8 stores only: the per-step view slice would be a
cross-device collective on a row-sharded store ('shard'), where the
host index stream is the cheaper design anyway.
"""

import jax
import jax.numpy as jnp

from .sampler import _JITTERS

__all__ = ["make_device_sampler"]


def make_device_sampler(store, h, w, n_rays, jitter_mode="random",
                        alpha_thres=0.9, views=None):
    """Build sample(arrays, view_idx, key) -> [2*n_rays (+mesh pad)]
    i32 flat pixel indices, jit-safe inside the epoch scan. ``store``
    supplies row_stride/pad_index; ``h, w`` are the (homogeneous) view
    shape. ``views`` (optional, same order as the store): lets the
    deterministic contrast-mode jitter choice be precomputed ONCE on
    the host instead of recomputed from the full image every step."""
    if store.sharded:
        raise ValueError(
            "device sampling needs a replicated store "
            "(device_views='on'/'u8'); use the host samplers with "
            "device_views='shard'")
    stride = store.row_stride
    hw = h * w
    pad_index = store.pad_index
    ih, iw = h - 2, w - 2
    offs = jnp.asarray([dy * w + dx for dy, dx in _JITTERS], jnp.int32)
    ys = (jnp.arange(ih, dtype=jnp.int32) + 1)[:, None]
    xs = (jnp.arange(iw, dtype=jnp.int32) + 1)[None, :]
    c_flat = (ys * w + xs).reshape(-1)  # interior centers [ih*iw]

    jidx_table = None
    if jitter_mode == "contrast" and views is not None:
        # rgb never changes during training, so the per-view argmax
        # jitter (trainvali.py:361) is a training-time constant
        import numpy as np
        rows = []
        for v in views:
            rgb = np.asarray(v.rgb, np.float32).reshape(h, w, 3)
            center = rgb[1:-1, 1:-1]
            deltas = np.stack([
                np.max(np.abs(
                    rgb[1 + dy:h - 1 + dy, 1 + dx:w - 1 + dx] - center),
                    axis=-1)
                for dy, dx in _JITTERS])  # [8, ih, iw]
            rows.append(np.argmax(deltas, axis=0).reshape(-1))
        jidx_table = jnp.asarray(np.stack(rows), jnp.int32)  # [V,ih*iw]

    def sample(arrays, view_idx, key):
        base = view_idx * stride
        alpha = jax.lax.dynamic_slice_in_dim(
            arrays["alpha"], base, hw, axis=0)[:, 0]
        if jitter_mode == "contrast":
            if jidx_table is not None:
                jidx = jax.lax.dynamic_slice_in_dim(
                    jidx_table, view_idx, 1, axis=0)[0]
            else:
                # deterministic: neighbor with max channel-max |rgb
                # delta| (trainvali.py:361); ties -> first, same as
                # np.argmax
                rgb = jax.lax.dynamic_slice_in_dim(
                    arrays["rgb"], base, hw, axis=0).reshape(h, w, 3)
                center = rgb[1:-1, 1:-1]
                deltas = jnp.stack([
                    jnp.max(jnp.abs(
                        rgb[1 + dy:h - 1 + dy, 1 + dx:w - 1 + dx]
                        - center), axis=-1)
                    for dy, dx in _JITTERS])  # [8, ih, iw]
                jidx = jnp.argmax(deltas, axis=0).reshape(-1)
            k_sel = key
        else:
            k_jit, k_sel = jax.random.split(key)
            jidx = jax.random.randint(k_jit, (ih * iw,), 0, 8)
        cj = c_flat + offs[jidx]
        keep = ((alpha[c_flat] > alpha_thres)
                & (alpha[cj] > alpha_thres))
        cs = jnp.cumsum(keep.astype(jnp.int32))
        count = cs[-1]
        # with replacement, like rng.randint(0, coords.shape[0], n)
        sel = jax.random.randint(k_sel, (n_rays,), 0,
                                 jnp.maximum(count, 1))
        pos = jnp.searchsorted(cs, sel + 1, side="left")
        pc, pj = c_flat[pos], cj[pos]
        # an all-background view yields pad rows (alpha=0, masked
        # downstream) instead of the host path's exception
        empty = count == 0
        pc = jnp.where(empty, pad_index, pc)
        pj = jnp.where(empty, pad_index, pj)
        pix = jnp.stack([pc, pj], axis=-1).reshape(-1)
        mesh = store._mesh
        if mesh is not None and mesh.devices.size > 1:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            from ..parallel.mesh import RAY_AXIS
            # pad to a device multiple with masked pad rows and keep
            # the gathered batch ray-sharded — the exact shape/layout
            # the host-staged index stream arrives in
            # (train/loop.py::_epoch_scan_xs pads the same way)
            extra = (-pix.shape[0]) % mesh.devices.size
            if extra:
                pix = jnp.concatenate(
                    [pix, jnp.full((extra,), pad_index, jnp.int32)])
            pix = jax.lax.with_sharding_constraint(
                pix, NamedSharding(mesh, P(RAY_AXIS)))
        return pix

    return sample
