"""Epoch-level decomposition training drivers.

Parity targets:
  * generic loop (nfr_unit / ref_nfr): decomp/nerfvq_nfr3/nerfactor/
    trainvali.py:54-324 — per epoch iterate all train views (1 view = 1
    outer_sample batch), ckpt + validation every 30 epochs, per-view vis,
    metas rollup.
  * VQ loop: nerfactor/train_nfr.py:52-376 — epoch-0 latent k-means init,
    fixed VQ eval set, per-validation codebook-dropout sweep with elbow
    selection writing main_<k> dirs, loss.json / vq_test_loss.json /
    vq_num.png.

Differences by design: host-side numpy sampling feeds jitted steps; RNG is
a seeded numpy RandomState + jax PRNG stream (TF Philox streams cannot be
reproduced bit-for-bit — SURVEY.md §7 'Numerical parity').
"""

import json
import os
import time
from os.path import join

import jax
import jax.numpy as jnp
import numpy as np

from ..data.sampler import build_vq_eval_set
from ..data.sampler import outer_sample as _outer_sample_np
from ..data.sampler import sample_pix as _sample_pix_np
from ..models import decomp_common as dc
from ..models.nfr_unit import nfr_unit_forward, nfr_unit_loss
from ..models.ref_nfr import ref_nfr_forward, ref_nfr_loss
from ..models.vq_nfr import (vq_encode, vq_nfr_forward, vq_nfr_loss,
                             vq_test)
from ..ops.kmeans import kmeans
from ..ops.math import rgb2chromaticity
from ..ops.vq import init_vq_ema_state
from ..utils import ckpt as ckpt_util
from ..utils.vis import vis_view
from . import decomp_trainer as dt

__all__ = ["train_nfr_unit", "train_vq_nfr", "train_ref_nfr",
           "save_metas", "elbow_select"]


def _native_mode():
    """The ONE place that resolves VQNERF_NATIVE_SAMPLER (=0 pins
    numpy — the test suite does, for determinism; =1 forces native;
    unset = auto) -> 'native' | 'numpy'. Every sampler entry point
    (outer_sample, sample_view_pix, sample_view_pix_many) routes
    through this so they provably consume the rng identically (the
    bit-identical-batch guarantee of the device-resident path rests on
    that)."""
    mode = os.environ.get("VQNERF_NATIVE_SAMPLER", "auto")
    if mode == "0":
        return "numpy"
    from ..data import native as _native
    if _native.native_available():
        return "native"
    if mode == "1":
        raise RuntimeError(
            "VQNERF_NATIVE_SAMPLER=1 but native/fastloader is not "
            "built (make -C native/fastloader)")
    return "numpy"


def _native_select(view, n_rays, seed, jitter_mode, alpha_thres):
    """One native select_pairs call -> [2*n_rays] flat indices."""
    from ..data import native as _native
    coords = _native.select_pairs(
        view.alpha.reshape(view.h, view.w),
        view.rgb.reshape(view.h, view.w, 3), n_rays,
        jitter_mode=jitter_mode, alpha_thres=alpha_thres, seed=seed)
    return coords[:, 0] * view.w + coords[:, 1]


def _native_flat_pix(view, n_rays, rng, jitter_mode, alpha_thres):
    """Native index selection, or None for the numpy path. Draws
    exactly one child seed from the master rng per call."""
    if _native_mode() == "numpy":
        return None
    return _native_select(view, n_rays, int(rng.randint(0, 2**31 - 1)),
                          jitter_mode, alpha_thres)


def sample_view_pix(view, n_rays, rng, jitter_mode="random",
                    alpha_thres=0.9):
    """[2*n_rays] flat pixel indices (native when built, else numpy;
    ~10x apart in speed, different RNG streams, identical contract)."""
    flat = _native_flat_pix(view, n_rays, rng, jitter_mode, alpha_thres)
    if flat is not None:
        return flat
    return _sample_pix_np(view, n_rays, rng, jitter_mode=jitter_mode,
                          alpha_thres=alpha_thres)


_SAMPLER_POOL = None


def _sampler_pool():
    global _SAMPLER_POOL
    if _SAMPLER_POOL is None:
        from concurrent.futures import ThreadPoolExecutor
        _SAMPLER_POOL = ThreadPoolExecutor(
            max_workers=min(8, os.cpu_count() or 1),
            thread_name_prefix="pix-sampler")
    return _SAMPLER_POOL


def sample_view_pix_many(views, n_rays, rng, jitter_mode="random",
                         alpha_thres=0.9):
    """sample_view_pix over a list of views, bit-identical to the serial
    loop but parallel on the native path.

    The native sampler consumes the master rng ONLY to draw one child
    seed per call (_native_flat_pix), so drawing all seeds serially here
    and running the (GIL-releasing, thread-safe) select_pairs calls on a
    thread pool yields exactly the serial path's batches in exactly the
    serial path's rng stream — this is what un-binds the chunked
    scanned-dispatch trainers from the ~55 ms/epoch serial sampling wall
    (VERDICT r3 weak #3; reference prefetch intent:
    decomp/nerfvq_nfr3/nerfactor/datasets/base.py:86-122). The numpy
    fallback threads the master rng through each call and stays serial.
    """
    if _native_mode() == "native":
        # one child seed per view, drawn serially = the serial stream
        seeds = [int(rng.randint(0, 2**31 - 1)) for _ in views]
        return list(_sampler_pool().map(
            lambda args: _native_select(args[0], n_rays, args[1],
                                        jitter_mode, alpha_thres),
            zip(views, seeds)))
    return [sample_view_pix(v, n_rays, rng, jitter_mode=jitter_mode,
                            alpha_thres=alpha_thres) for v in views]


def outer_sample(view, n_rays, rng, jitter_mode="random", alpha_thres=0.9):
    """sample_view_pix + host gather: the batch dict the host-path
    trainers device_put (the native gather is ~10x the numpy one)."""
    flat = _native_flat_pix(view, n_rays, rng, jitter_mode, alpha_thres)
    if flat is None:
        return _outer_sample_np(view, n_rays, rng,
                                jitter_mode=jitter_mode,
                                alpha_thres=alpha_thres)
    from ..data import native as _native
    n = view.h * view.w
    batch = {}
    for k in ("rayo", "rayd", "rgb", "alpha", "pred_alpha", "xyz",
              "normal", "lvis", "ref"):
        arr = getattr(view, k, None)
        if arr is None:
            continue
        batch[k] = _native.gather_rows(arr.reshape(n, -1), flat)
    return batch


def _make_batch_source(train_views, cfg, jitter_mode):
    """Per-epoch training batch generator factory.

    Resolves cfg.device_views ('auto'/'on'/'u8'/'shard'/'off'): when
    the views fit the device-memory budget they are staged once on
    device and each step ships only sample_view_pix indices
    (data/device_store.py); otherwise every batch is host-gathered and
    device_put (the reference's tf.data streaming model,
    trainvali.py:108-122). 'u8' stages the lvis buffer quantized to
    uint8 (±1/510 per value, ~4x smaller store) — an explicit opt-in
    because batches are then no longer bit-identical to the host path;
    'auto' never quantizes silently, it only prints the hint when u8
    would have fit. 'shard' row-shards the store over the mesh instead
    of replicating it (per-device bytes drop n_dev-fold; the gather
    becomes an all-gather/reduce-scatter collective, bit-identical).

    Returns (epoch_batches, store); store is None on the host path."""
    mode = getattr(cfg, "device_views", "off") or "off"
    if mode not in ("auto", "on", "u8", "shard", "off"):
        raise ValueError("device_views must be 'auto', 'on', 'u8', "
                         "'shard' or 'off', got %r" % mode)
    store = None
    if train_views and mode != "off":
        from ..data.device_store import (fits_device_memory, get_store,
                                         views_compatible)
        if mode in ("on", "u8", "shard"):
            store = get_store(train_views, mesh=_get_mesh(),
                              quant=(mode == "u8"),
                              shard=(mode == "shard"))
        elif not views_compatible(train_views):
            print("[vqnerf-tpu] device_views=auto: heterogeneous views; "
                  "using the host-gather path")
        elif fits_device_memory(train_views):
            # cached by view identity: nfr_unit and vq_nfr share the
            # same list, so a pipeline stages the store once, not 3x
            store = get_store(train_views, mesh=_get_mesh())
        else:
            hint = (" (device_views='u8' WOULD fit by quantizing lvis "
                    "to uint8, ±1/510)"
                    if fits_device_memory(train_views, quant=True)
                    else "")
            print("[vqnerf-tpu] device_views=auto: views exceed the "
                  "device-memory budget; using the host-gather path"
                  + hint)

    def epoch_batches(rng):
        if store is not None:
            return _prefetch(
                store.gather(vi, sample_view_pix(
                    view, cfg.n_rays_per_step, rng,
                    jitter_mode=jitter_mode))
                for vi, view in enumerate(train_views))
        return _prefetch(
            _device_batch(outer_sample(
                view, cfg.n_rays_per_step, rng, jitter_mode=jitter_mode))
            for view in train_views)

    return epoch_batches, store


def _resolve_epoch_scan(cfg, store):
    """cfg.epoch_scan: None = auto (scan iff the store is active)."""
    want = getattr(cfg, "epoch_scan", None)
    if want is None:
        return store is not None
    if want and store is None:
        print("[vqnerf-tpu] epoch_scan requested but device_views is "
              "off/oversized; falling back to per-step dispatch")
        return False
    return bool(want)


def _chunk_plan(epoch, epochs, period, chunk):
    """#epochs for the next scanned dispatch: never past the end and
    never across a ckpt/vali boundary (those need host-side work)."""
    boundary = period - (epoch % period)
    return max(1, min(chunk, epochs - epoch, boundary))


def _resolve_scan_chunk(cfg, run_epoch):
    """cfg.epoch_scan_chunk: None = auto — min(6, ckpt/vali period).
    _chunk_plan clips dispatches at period boundaries, so the run sees at
    most two scan lengths per period tiling (chunk and period % chunk):
    one extra compile at worst, against chunked dispatch everywhere
    (measured 1.76x system-level at the production cadence — period 30,
    which chunk 6 tiles exactly; BASELINE.md r3). Beyond ~6 epochs per
    dispatch the serial host-side ray sampling binds."""
    if run_epoch is None:
        return 1
    chunk = getattr(cfg, "epoch_scan_chunk", None)
    if chunk is not None:
        return max(1, int(chunk))
    return min(6, cfg_ckpt_period(cfg))


def _scan_epoch_loop(start_epoch, epochs, period, chunk, sample_xs,
                     dispatch, fetch, post_epoch):
    """Shared chunked scanned-dispatch driver for the three trainers.

    ``sample_xs(n_epochs)`` host-samples the next dispatch's xs (reading
    the trainer's current step/key state from its closure);
    ``dispatch(xs)`` launches the scan and returns the DEVICE lds without
    syncing; ``fetch(lds, n_ep)`` is the sync point, returning one
    payload per epoch; ``post_epoch(e1, payload, wall_s, state_epoch)``
    does logging/guard/ckpt/vali. The next chunk's sampling overlaps the
    dispatched scan; wall time is the chunk wall split over its epochs.
    """
    pending_xs = None
    epoch = start_epoch
    while epoch < epochs:
        t_chunk = time.time()
        n_ep = _chunk_plan(epoch, epochs, period, chunk)
        xs = pending_xs if pending_xs is not None else sample_xs(n_ep)
        try:
            lds = dispatch(xs)
        except jax.errors.JaxRuntimeError as e:
            if "RESOURCE_EXHAUSTED" in str(e) and n_ep > 1:
                # chunk=12 at the production bench shape OOMs a 16 GB
                # v5e (BASELINE.md r4): the whole chunk's xs stack
                # lives in HBM alongside model/opt state
                raise RuntimeError(
                    "device OOM dispatching a %d-epoch scanned chunk; "
                    "lower epoch_scan_chunk (auto policy caps at "
                    "min(6, ckpt/vali period), which is also the "
                    "measured memory-safe point at production shapes)"
                    % n_ep) from e
            raise
        nxt = epoch + n_ep
        pending_xs = sample_xs(
            _chunk_plan(nxt, epochs, period, chunk)) if nxt < epochs \
            else None
        payloads = fetch(lds, n_ep)
        wall = (time.time() - t_chunk) / n_ep
        for j in range(n_ep):
            post_epoch(epoch + j + 1, payloads[j], wall, nxt)
        epoch = nxt


def _resolve_device_sampling(cfg, store, train_views, jitter_mode):
    """cfg.device_sampling -> a jit-safe sample_fn for the epoch scan,
    or None (with a notice when the opt-in cannot apply: no scanned
    store, row-sharded store, or heterogeneous view shapes)."""
    if not getattr(cfg, "device_sampling", False):
        return None
    why = None
    if store is None:
        why = "the scanned device-store dispatch is not active"
    elif store.sharded:
        why = "device_views='shard' keeps the host index stream"
    elif len({(v.h, v.w) for v in train_views}) != 1:
        why = "views have heterogeneous shapes"
    if why:
        import sys
        print("[vqnerf-tpu] device_sampling requested but %s; "
              "falling back to host sampling" % why, file=sys.stderr)
        return None
    from ..data.device_sampler import make_device_sampler
    v0 = train_views[0]
    return make_device_sampler(store, v0.h, v0.w, cfg.n_rays_per_step,
                               jitter_mode=jitter_mode,
                               views=train_views)


def _sampling_base_key(seed):
    """Dedicated PRNG stream for on-device sampling — disjoint from the
    VQ dropout stream (PRNGKey(seed)) by a fixed fold."""
    return jax.random.fold_in(jax.random.PRNGKey(seed), 0x53616d70)


def _epoch_scan_xs_nopix(train_views, step0, n_epochs=1):
    """(vi [E*K], steps [E*K]) for device-sampling dispatches — the ray
    indices are computed inside the scan, nothing else is staged."""
    k = len(train_views)
    vi = jnp.asarray(np.tile(np.arange(k, dtype=np.int32), n_epochs))
    steps = jnp.asarray(
        step0 + np.arange(n_epochs * k, dtype=np.float32))
    return vi, steps


_DECODE_CACHE = {}


def _pair_decoder(w, mesh):
    """Jitted (centers [E, n] i32, codes [E, n] u8) -> interleaved pix
    [E, 2n] i32 on device. codes index data.sampler._JITTERS (0-7) plus
    8 = identity (padding rows, where center == store.pad_index). Cached
    per (w, mesh) so chunked dispatch reuses one compiled decode."""
    key = (int(w), None if mesh is None
           else tuple(d.id for d in mesh.devices.flat))
    fn = _DECODE_CACHE.get(key)
    if fn is None:
        from ..data.sampler import _JITTERS
        offs = np.asarray(
            [dy * w + dx for dy, dx in _JITTERS] + [0], np.int32)

        def dec(c, codes):
            jit = c + jnp.asarray(offs)[codes]
            return jnp.stack([c, jit], axis=-1).reshape(c.shape[0], -1)

        if mesh is not None:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            from ..parallel.mesh import RAY_AXIS
            fn = jax.jit(dec, out_shardings=NamedSharding(
                mesh, P(None, RAY_AXIS)))
        else:
            fn = jax.jit(dec)
        _DECODE_CACHE[key] = fn
    return fn


def _encode_pairs(pix, w):
    """Interleaved [E, 2n] flat indices -> (centers [E, n] i32, jitter
    codes [E, n] u8), or None when any jitter is not one of the 8
    neighbor offsets (defensive: the samplers guarantee it). Exact
    inverse of _pair_decoder's decode — the staged bytes drop from 8 to
    5 per ray pair, which matters because the axon tunnel serializes
    host->device transfers with device compute (BASELINE.md r4: staging
    is the residual 0.71x->1.0x gap of the chunked scanned dispatch)."""
    from ..data.sampler import _JITTERS
    c = pix[:, 0::2]
    d = pix[:, 1::2] - c
    offs = np.asarray([dy * w + dx for dy, dx in _JITTERS], np.int64)
    order = np.argsort(offs)
    so = offs[order]
    pos = np.clip(np.searchsorted(so, d), 0, len(so) - 1)
    if not np.array_equal(so[pos], d):
        return None
    return c.astype(np.int32), order[pos].astype(np.uint8)


_PAD_CODE = np.uint8(8)  # identity offset: pad pairs decode to
# (pad_index, pad_index), the store's zero row (alpha=0, masked)


def _epoch_scan_xs(train_views, cfg, rng, jitter_mode, store, step0,
                   n_epochs=1):
    """Host-sample ray indices for ``n_epochs`` WHOLE epochs: (vi [E*K],
    pix [E*K, 2n], steps [E*K]) staged for the scanned dispatch (pix
    sharded over the ray axis under a >1-device mesh, padded with the
    store's zero row). Epochs are sampled sequentially so the host rng
    stream is identical to n_epochs single-epoch calls.

    The interleaved (center, jitter) stream is staged compressed —
    center i32 + neighbor code u8, decoded back to the identical [E*K,
    2n] i32 on device by _pair_decoder — cutting the per-epoch
    host->device bytes 1.6x (the tunnel serializes transfers with
    compute, so staged bytes are wall time; BASELINE.md r4)."""
    jobs = [v for _ in range(n_epochs) for v in train_views]
    pix = np.stack([
        np.asarray(p) for p in sample_view_pix_many(
            jobs, cfg.n_rays_per_step, rng, jitter_mode=jitter_mode)
    ]).astype(np.int32)
    mesh = _get_mesh()
    n_dev = mesh.devices.size
    vi, steps = _epoch_scan_xs_nopix(train_views, step0,
                                     n_epochs=n_epochs)

    widths = {v.w for v in train_views}
    enc = (_encode_pairs(pix, train_views[0].w)
           if len(widths) == 1 else None)
    if enc is None:  # heterogeneous widths / foreign jitter: stage raw
        if n_dev > 1:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            from ..parallel.mesh import RAY_AXIS, pad_to_multiple
            pix, _ = pad_to_multiple(pix, n_dev, axis=1,
                                     pad_value=store.pad_index)
            pix = jax.device_put(
                jnp.asarray(pix), NamedSharding(mesh, P(None, RAY_AXIS)))
        else:
            pix = jnp.asarray(pix)
        return vi, pix, steps

    c, codes = enc
    if n_dev > 1:
        # the decoded [E, 2n_pad] must match the raw path's padded
        # length 2n + (-2n) % n_dev EXACTLY (losses can reduce over
        # padded rows, and the host-path comparison tests pad the same
        # way); when that length is odd it cannot be built from whole
        # (center, jitter) pairs — stage raw instead (odd meshes only)
        two_n = pix.shape[1]
        target = two_n + (-two_n) % n_dev
        if target % 2:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            from ..parallel.mesh import RAY_AXIS, pad_to_multiple
            pix, _ = pad_to_multiple(pix, n_dev, axis=1,
                                     pad_value=store.pad_index)
            pix = jax.device_put(
                jnp.asarray(pix), NamedSharding(mesh, P(None, RAY_AXIS)))
            return vi, pix, steps
        pad_pairs = target // 2 - c.shape[1]
        if pad_pairs:
            c = np.pad(c, ((0, 0), (0, pad_pairs)),
                       constant_values=store.pad_index)
            codes = np.pad(codes, ((0, 0), (0, pad_pairs)),
                           constant_values=_PAD_CODE)
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import RAY_AXIS
        # pairs axis may not divide the mesh (tiny test batches) —
        # replicate then; the decoder's out_shardings still lands the
        # decoded pix ray-sharded either way
        sh = NamedSharding(
            mesh, P(None, RAY_AXIS) if c.shape[1] % n_dev == 0
            else P(None, None))
        c = jax.device_put(jnp.asarray(c), sh)
        codes = jax.device_put(jnp.asarray(codes), sh)
    else:
        c = jnp.asarray(c)
        codes = jnp.asarray(codes)
    pix = _pair_decoder(train_views[0].w, mesh if n_dev > 1 else None)(
        c, codes)
    return vi, pix, steps


def _unstack_lds(lds):
    """Stacked scan outputs {name: [K]} -> per-step float dicts (ONE
    host transfer for the whole epoch: stack on device, fetch once).
    Shares its fetch core with _sync_scalar_dicts."""
    keys = sorted(lds)
    mat = np.asarray(jnp.stack([jnp.asarray(lds[k]) for k in keys]),
                     np.float64)
    return [{k: float(mat[i, j]) for i, k in enumerate(keys)}
            for j in range(mat.shape[1])]


def _epoch_dir(outdir, epoch):
    return join(outdir, "vis_vali", "epoch%09d" % epoch)


def _log_scalars(outdir, epoch, scalars):
    """Append per-epoch scalars to train_log.jsonl (the trainers' stand-in
    for the reference's TensorBoard loss_train/batch_time summaries,
    trainvali.py:250-255)."""
    os.makedirs(outdir, exist_ok=True)
    with open(join(outdir, "train_log.jsonl"), "a") as f:
        f.write(json.dumps({"epoch": epoch, **scalars}) + "\n")


def _sync_scalars(vals):
    """Fetch a list of per-step device scalars in ONE host transfer.

    A per-element float() costs one host round-trip EACH — ~3-10 ms
    through the TPU tunnel, i.e. seconds per epoch at ~100 steps —
    while a device-side stack followed by a single np.asarray moves the
    whole epoch's scalars in one round-trip. Plain python floats pass
    through unchanged (CPU tests, recursive calls on fetched values)."""
    if not vals:
        return np.zeros((0,), np.float64)
    if all(isinstance(v, (float, int)) for v in vals):
        return np.asarray(vals, np.float64)
    return np.asarray(jnp.stack([jnp.asarray(v) for v in vals]),
                      np.float64)


def _sync_scalar_dicts(dicts):
    """One host transfer for a whole epoch's list of {name: scalar}
    loss dicts: transposes to the {name: [K]} form and delegates to
    _unstack_lds (stack on device, fetch once, rebuild floats)."""
    if not dicts:
        return dicts
    return _unstack_lds({
        k: jnp.stack([jnp.asarray(d[k]) for d in dicts])
        for k in dicts[0]})


def _finite_mean(vals):
    """Epoch loss over HEALTHY steps only: steps skipped by the
    nonfinite-update guard (decomp_trainer._guarded_update) carry a NaN
    loss but left params untouched, so they must not poison the epoch
    rollup. Returns (mean, n_skipped); mean is NaN iff EVERY step was
    skipped (then _check_finite aborts, as it should)."""
    arr = _sync_scalars(vals)
    finite = np.isfinite(arr)
    n_skipped = int((~finite).sum())
    mean = float(arr[finite].mean()) if finite.any() else float("nan")
    return mean, n_skipped


def _check_finite(outdir, phase, epoch, scalars, state, state_epoch=None):
    """Divergence guard: on a non-finite epoch loss, checkpoint the
    failing state under <outdir>/debug_failure/ and raise with context.
    (The reference trains blind here — a NaN silently corrupts all later
    epochs; on long TPU runs we want the job to stop AND be resumable
    from the last good checkpoint.) With chunked scanned dispatches
    (epoch_scan_chunk > 1) per-epoch state is not observable mid-chunk;
    ``state_epoch`` labels the END-OF-CHUNK state actually saved."""
    bad = {k: v for k, v in scalars.items()
           if not np.isfinite(np.asarray(v)).all()}
    if not bad:
        return
    state_epoch = epoch if state_epoch is None else state_epoch
    dump = join(outdir, "debug_failure")
    ckpt_util.save_ckpt(dump, state_epoch, state)
    _log_scalars(dump, epoch, {"phase": phase, "non_finite": sorted(bad),
                               "state_epoch": state_epoch})
    granularity = ("" if state_epoch == epoch else
                   f" (chunked dispatch: the saved state is from "
                   f"end-of-chunk epoch {state_epoch}, the earliest "
                   "observable after the failure; rerun the failing "
                   "window with epoch_scan_chunk=1 to recover per-epoch "
                   "observability)")
    raise RuntimeError(
        f"{phase}: non-finite training loss at epoch {epoch}: {bad} — "
        f"failing state checkpointed under {dump}{granularity}; resume "
        f"from the last good checkpoint in {outdir} after lowering the "
        "LR or inspecting the data")


def save_metas(outdir):
    """Aggregate per-epoch metadata.json metrics (train_nfr.py:491-510)."""
    vali_root = join(outdir, "vis_vali")
    metrics = {k: [] for k in
               ("psnr", "ssim", "lpips", "psnr_luma", "ssim_luma", "mse")}
    if not os.path.isdir(vali_root):
        return metrics
    for e_dir in sorted(os.listdir(vali_root)):
        if not e_dir.startswith("epoch"):
            continue
        epoch_vals = {k: [] for k in metrics}
        for root, _, files in os.walk(join(vali_root, e_dir)):
            if "metadata.json" in files:
                with open(join(root, "metadata.json")) as f:
                    js = json.load(f)
                for k, v in js.items():
                    if k in epoch_vals:
                        epoch_vals[k].append(v)
        for k in metrics:
            metrics[k].append(
                float(np.mean(epoch_vals[k])) if epoch_vals[k] else None)
    from ..eval.metrics import lpips_impl
    metrics["lpips_impl"] = lpips_impl()
    with open(join(vali_root, "metas.json"), "w") as f:
        json.dump(metrics, f)
    return metrics


def elbow_select(drop_losses, best_thres):
    """The reference's elbow rule (train_nfr.py:322-334): pick the first i
    whose loss improves on i-1 and is within best_thres of every later
    loss; fall back to the last (all codes)."""
    n = len(drop_losses)
    for i in range(1, n - 1):
        if drop_losses[i - 1] > drop_losses[i]:
            ok = all(drop_losses[i] - drop_losses[j] <= best_thres
                     for j in range(i + 1, n))
            if ok:
                return i
    return n - 1


_MESH = None


def _get_mesh():
    """Lazy 1-D ray mesh over all devices (no-op sharding on 1 device)."""
    global _MESH
    if _MESH is None:
        from ..parallel import get_mesh
        _MESH = get_mesh()
    return _MESH


def _prefetch(iterable, depth=2):
    """Background-thread prefetch: overlaps host-side sampling with the
    async-dispatched TPU steps (the sampler costs ~14 ms/view native vs a
    ~7 ms step — without overlap the chip idles half the epoch)."""
    import queue
    import threading

    q = queue.Queue(maxsize=depth)
    done = object()
    err = []

    def worker():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:  # propagate to the consumer
            err.append(e)
        finally:
            q.put(done)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is done:
            if err:
                raise err[0]
            break
        yield item


def _device_batch(batch):
    """device_put a batch with the ray axis sharded over the mesh.
    Ray counts are padded to a device multiple with alpha=0 rows (masked
    out everywhere downstream)."""
    mesh = _get_mesh()
    n_dev = mesh.devices.size
    if n_dev == 1:
        return {k: jnp.asarray(v) for k, v in batch.items()}
    from ..parallel import shard_batch
    n = next(iter(batch.values())).shape[0]
    if n % n_dev:
        import numpy as _np
        pad = n_dev - n % n_dev
        batch = {
            k: _np.concatenate(
                [v, _np.zeros((pad,) + v.shape[1:], v.dtype)])
            for k, v in batch.items()
        }
    sharded, _ = shard_batch(batch, mesh, pad=False)
    return sharded


def train_nfr_unit(cfg: dc.DecompConfig, train_views, vali_views, outdir,
                   epochs=None, seed=None, jitter_mode="contrast",
                   resume=True):
    """Phase-1 trainer (trainvali.py with model=nfr_unit)."""
    from ..models.nfr_unit import init_nfr_unit

    epochs = epochs or cfg.epochs
    seed = cfg.random_seed if seed is None else seed
    rng = np.random.RandomState(seed)
    lxyz, lareas = dc.light_constants(cfg)
    params = init_nfr_unit(seed, cfg)
    tx, step_fn = dt.make_nfr_unit_step(cfg, lxyz, lareas)
    opt_state = tx.init(params)
    start_epoch = 0

    if resume:
        latest = ckpt_util.latest_ckpt(outdir)
        if latest:
            state = ckpt_util.load_ckpt(
                latest, {"params": params, "opt_state": opt_state,
                         "epoch": 0})
            params, opt_state = state["params"], state["opt_state"]
            start_epoch = int(state["epoch"])

    step = start_epoch * max(len(train_views), 1)
    history = []
    if start_epoch < epochs:  # don't stage the store for a no-op resume
        epoch_batches, store = _make_batch_source(train_views, cfg,
                                                  jitter_mode)
    else:
        epoch_batches = store = None
    scan_on = _resolve_epoch_scan(cfg, store)
    sample_fn = _resolve_device_sampling(
        cfg, store if scan_on else None, train_views, jitter_mode)
    run_epoch = (dt.make_plain_epoch_scan(step_fn, store,
                                          sample_fn=sample_fn)
                 if scan_on else None)
    period = cfg_ckpt_period(cfg)
    chunk = _resolve_scan_chunk(cfg, run_epoch)
    k_steps = max(len(train_views), 1)

    def _post_epoch(e1, losses, wall_s, state_epoch=None):
        mean_loss, n_skipped = _finite_mean(losses)
        history.append(mean_loss)
        # wall_s closes over the scalar fetch above, so it covers the
        # full epoch incl. device completion (the reference logs
        # batch_time_train the same way, trainvali.py:253-255); with
        # epoch_scan_chunk > 1 it is the chunk wall split over its epochs
        _log_scalars(outdir, e1, {"loss_train": mean_loss,
                                  "skipped_steps": n_skipped,
                                  "wall_s": round(wall_s, 4)})
        _check_finite(outdir, "nfr_unit", e1, {"loss_train": mean_loss},
                      {"params": params, "opt_state": opt_state,
                       "epoch": state_epoch or e1},
                      state_epoch=state_epoch)
        if e1 % period == 0 or e1 == epochs:
            ckpt_util.save_ckpt(
                outdir, e1,
                {"params": params, "opt_state": opt_state, "epoch": e1},
                keep=cfg.keep_recent_epochs
                if cfg.keep_recent_epochs > 0 else None)
            _nfr_vali(params, cfg, lxyz, lareas, vali_views,
                      _epoch_dir(outdir, e1), outdir)

    if run_epoch is not None:
        if sample_fn is not None:
            skey = _sampling_base_key(seed)

            def sample_xs(n_ep):
                return _epoch_scan_xs_nopix(
                    train_views, step, n_epochs=n_ep) + (skey,)
        else:
            def sample_xs(n_ep):
                return _epoch_scan_xs(train_views, cfg, rng,
                                      jitter_mode, store, step,
                                      n_epochs=n_ep)

        def dispatch(xs):
            nonlocal params, opt_state, step
            params, opt_state, lds = run_epoch(
                params, opt_state, store.arrays, *xs)
            step += int(xs[0].shape[0])
            return lds

        def fetch(lds, n_ep):
            losses = list(np.asarray(lds["loss"], np.float64))
            return [losses[j * k_steps:(j + 1) * k_steps]
                    for j in range(n_ep)]

        _scan_epoch_loop(start_epoch, epochs, period, chunk,
                         sample_xs, dispatch, fetch, _post_epoch)
    else:
        for epoch in range(start_epoch, epochs):
            t_epoch = time.time()
            losses = []
            for batch in epoch_batches(rng):
                params, opt_state, ld = step_fn(
                    params, opt_state, batch,
                    jnp.asarray(step, jnp.float32))
                # keep losses on device: a float() here would serialize
                # the async dispatch pipeline against host sampling
                losses.append(ld["loss"])
                step += 1
            _post_epoch(epoch + 1, losses, time.time() - t_epoch)
    save_metas(outdir)
    return params, history


def cfg_ckpt_period(cfg):
    return 30 if cfg.epochs >= 30 else max(1, cfg.epochs // 2)


# Peak-HBM bound for full-view validation forwards: the vali renders
# pass the WHOLE view (background rows included) through the model in
# one call, and at 512px x 512 lights the NxLx3 BRDF intermediates
# exceed the v5e's HBM (measured r5: RESOURCE_EXHAUSTED in _nfr_vali).
# The forwards are pointwise per ray, so chunking the ray axis is
# numerically identical and bounds peak memory; training and the
# masked-gather fast_render paths are unaffected.
_VALI_RAY_CHUNK = 131072


def _forward_chunked(forward, batch, chunk=None):
    """Run a per-ray vali forward in ray chunks; concat the pred dict.

    `forward(chunk_batch) -> pred_dict` where every pred entry is
    [N, ...] aligned with the batch rows (nfr_unit/vq_nfr/ref_nfr vali
    preds all are)."""
    chunk = chunk or _VALI_RAY_CHUNK
    n = next(iter(batch.values())).shape[0]
    if n <= chunk:
        return forward(batch)
    preds = []
    for i in range(0, n, chunk):
        preds.append(forward({k: v[i : i + chunk]
                              for k, v in batch.items()}))
    return {k: np.concatenate([np.asarray(p[k]) for p in preds])
            for k in preds[0]}


def _nfr_vali(params, cfg, lxyz, lareas, vali_views, epoch_dir, outdir):
    # light dump (nfr_unit.py:454-462)
    os.makedirs(epoch_dir, exist_ok=True)
    light = np.asarray(dc.get_light(params))
    np.save(join(os.path.dirname(epoch_dir), "np_light.npy"), light)
    from ..data.io import vis_light
    vis_light(light, outpath=join(
        os.path.dirname(epoch_dir), "pred_light.png"), h=256)
    for b_i, view in enumerate(vali_views):
        batch = _device_batch(view.as_batch())
        pred = _forward_chunked(
            lambda b: nfr_unit_forward(
                params, b, cfg, lxyz, lareas, mode="vali")[0], batch)
        vis = {"pred_" + k: np.asarray(v) for k, v in pred.items()
               if k != "z"}
        vis["gt_rgb"] = view.rgb
        vis["gt_alpha"] = view.alpha
        vis_view(vis, (view.h, view.w),
                 join(epoch_dir, "batch%09d" % b_i), view.id,
                 white_bg=cfg.white_bg, mode="vali")
    # refresh the browsable validation index (reference webpages,
    # ref_nfr.py:821-874; embeds train_log.jsonl + elbow history)
    from ..utils.html import write_vali_index
    write_vali_index(outdir, white_bg=cfg.white_bg)


def train_vq_nfr(cfg: dc.DecompConfig, nfr_params, train_views, vali_views,
                 outdir, epochs=None, seed=None, cluster_path=None,
                 resume=True):
    """Phase-2 trainer (train_nfr.py:52-376)."""
    from ..models.vq_nfr import init_vq_nfr

    epochs = epochs or cfg.epochs
    seed = cfg.random_seed if seed is None else seed
    rng = np.random.RandomState(seed)
    lxyz, lareas = dc.light_constants(cfg)

    # --- epoch 0: latent k-means init (train_nfr.py:210-227, 470-488)
    if cluster_path is None:
        cluster_path = join(outdir, "cluster_centers.npy")
    if os.path.exists(cluster_path):
        centers = np.load(cluster_path)
    else:
        zs = []
        enc_only = {k: nfr_params[k] for k in ("fine_enc", "bottleneck")}
        for view in train_views:
            batch = outer_sample(
                view, cfg.n_rays_per_step, rng, jitter_mode="random")
            mask = batch["alpha"][:, 0] > 0
            z = np.asarray(dc.apply_encoder(
                enc_only, jnp.asarray(batch["xyz"][mask]), cfg))
            zs.append(z)
        zs = np.concatenate(zs, axis=0)
        _, centers = kmeans(zs, cfg.num_embed, seed=seed)
        centers = np.asarray(centers)
        os.makedirs(os.path.dirname(cluster_path) or ".", exist_ok=True)
        np.save(cluster_path, centers)

    params, ema_state = init_vq_nfr(seed, cfg, nfr_params, centers)
    tx, step_fn = dt.make_vq_nfr_step(cfg, lxyz, lareas)
    opt_state = tx.init(params)

    # --- fixed VQ eval set (train_nfr.py:96-98, 513-554)
    per_view = max(1, cfg.total_sample_vq // max(len(train_views), 1))
    vq_eval = _device_batch(build_vq_eval_set(
        train_views, per_view, cfg.n_rays_per_step, rng))

    start_epoch = 0
    if resume:
        latest = ckpt_util.latest_ckpt(outdir)
        if latest:
            state = ckpt_util.load_ckpt(latest, {
                "params": params, "ema": ema_state,
                "opt_state": opt_state, "epoch": 0})
            params, ema_state = state["params"], state["ema"]
            opt_state, start_epoch = state["opt_state"], int(state["epoch"])

    train_thres = jnp.asarray(cfg.train_thres())
    val_thres_list = cfg.val_thres_list()
    x_list = list(range(cfg.num_embed - cfg.num_drop, cfg.num_embed + 1))
    key = jax.random.PRNGKey(seed)

    step = start_epoch * max(len(train_views), 1)
    history = []
    if start_epoch < epochs:  # don't stage the store for a no-op resume
        epoch_batches, store = _make_batch_source(train_views, cfg,
                                                  "random")
    else:
        epoch_batches = store = None
    scan_on = _resolve_epoch_scan(cfg, store)
    sample_fn = _resolve_device_sampling(
        cfg, store if scan_on else None, train_views, "random")
    run_epoch = (dt.make_vq_epoch_scan(step_fn, store,
                                       sample_fn=sample_fn)
                 if scan_on else None)

    def _vq_xs(step0, n_epochs=1):
        nonlocal key
        if sample_fn is None:
            vi, pix, steps = _epoch_scan_xs(
                train_views, cfg, rng, "random", store, step0,
                n_epochs=n_epochs)
        else:  # indices sampled on device; keys_vec still staged below
            vi, steps = _epoch_scan_xs_nopix(
                train_views, step0, n_epochs=n_epochs)
        subs = []  # same key stream as the step path
        for _ in range(n_epochs * len(train_views)):
            key, sub = jax.random.split(key)
            subs.append(sub)
        if sample_fn is not None:
            return vi, jnp.stack(subs), steps, _sampling_base_key(seed)
        return vi, pix, jnp.stack(subs), steps

    period = cfg_ckpt_period(cfg)
    chunk = _resolve_scan_chunk(cfg, run_epoch)
    k_steps = max(len(train_views), 1)

    def _post_epoch(e1, loss_dicts, wall_s, state_epoch=None):
        mean_loss, n_skipped = _finite_mean(
            [d["loss"] for d in loss_dicts])
        history.append(mean_loss)
        _log_scalars(outdir, e1, {
            **{k: _finite_mean([d[k] for d in loss_dicts])[0]
               for k in loss_dicts[0]},
            "skipped_steps": n_skipped,
            "wall_s": round(wall_s, 4)})
        _check_finite(outdir, "vq_nfr", e1, {"loss": mean_loss},
                      {"params": params, "ema": ema_state,
                       "opt_state": opt_state,
                       "epoch": state_epoch or e1},
                      state_epoch=state_epoch)
        if e1 % period == 0 or e1 == epochs:
            ckpt_util.save_ckpt(
                outdir, e1,
                {"params": params, "ema": ema_state,
                 "opt_state": opt_state, "epoch": e1},
                keep=cfg.keep_recent_epochs
                if cfg.keep_recent_epochs > 0 else None)
            _vq_vali(
                params, cfg, lxyz, lareas, vali_views, vq_eval,
                val_thres_list, x_list, loss_dicts,
                _epoch_dir(outdir, e1), seed)

    if run_epoch is not None:
        def sample_xs(n_ep):
            return _vq_xs(step, n_ep)

        def dispatch(xs):
            nonlocal params, ema_state, opt_state, step
            params, ema_state, opt_state, lds = run_epoch(
                params, ema_state, opt_state, store.arrays, train_thres,
                *xs)
            step += int(xs[0].shape[0])
            return lds

        def fetch(lds, n_ep):
            loss_dicts = _unstack_lds(lds)
            return [loss_dicts[j * k_steps:(j + 1) * k_steps]
                    for j in range(n_ep)]

        _scan_epoch_loop(start_epoch, epochs, period, chunk,
                         sample_xs, dispatch, fetch, _post_epoch)
    else:
        for epoch in range(start_epoch, epochs):
            t_epoch = time.time()
            loss_dicts = []
            for batch in epoch_batches(rng):
                key, sub = jax.random.split(key)
                params, ema_state, opt_state, ld = step_fn(
                    params, ema_state, opt_state, batch, train_thres,
                    sub, jnp.asarray(step, jnp.float32))
                loss_dicts.append(ld)  # device; sync at epoch end
                step += 1
            loss_dicts = _sync_scalar_dicts(loss_dicts)
            _post_epoch(epoch + 1, loss_dicts, time.time() - t_epoch)
    save_metas(outdir)
    return params, ema_state, history


def _vq_vali(params, cfg, lxyz, lareas, vali_views, vq_eval,
             val_thres_list, x_list, loss_dicts, epoch_dir, seed):
    os.makedirs(epoch_dir, exist_ok=True)
    # loss.json: summed mean loss terms across the epoch's batches
    losses = {}
    for d in loss_dicts:
        for k, v in d.items():
            losses[k] = losses.get(k, 0.0) + v
    with open(join(epoch_dir, "loss.json"), "w") as f:
        json.dump(losses, f)

    # light dump (consumed by ref_nfr init, ref_nfr.py:76-88)
    light = np.asarray(dc.get_light(params))
    np.save(join(os.path.dirname(epoch_dir), "np_light.npy"), light)

    # dropout sweep on the fixed eval set (train_nfr.py:292-317)
    key = jax.random.PRNGKey(seed)
    vq_scores = {"vqrgb": [], "chromaticity": []}
    for thres in val_thres_list:
        aux = vq_test(params, vq_eval, cfg, lxyz, lareas,
                      thres=jnp.asarray(thres), rng=key)
        mask = aux["mask"]
        gt = aux["rgb_gt"]
        vq_rgb = aux["vq_rgb_linear"]
        from ..ops.colorspace import linear2srgb, srgb2linear
        if cfg.is_nerf:
            linear_gt = srgb2linear(gt)
            vq_srgb = linear2srgb(vq_rgb)
        else:
            linear_gt, vq_srgb = gt, vq_rgb
        denom = float(jnp.maximum(jnp.sum(mask), 1.0))
        vqrgb = float(jnp.sum(
            jnp.mean((gt - vq_srgb) ** 2, axis=-1) * mask)) / denom
        chrom = float(jnp.sum(jnp.mean(
            (rgb2chromaticity(linear_gt)
             - rgb2chromaticity(vq_rgb)) ** 2, axis=-1) * mask)) / denom
        vq_scores["vqrgb"].append(vqrgb)
        vq_scores["chromaticity"].append(chrom)
    with open(join(epoch_dir, "vq_test_loss.json"), "w") as f:
        json.dump(vq_scores, f)

    drop_losses = np.array(vq_scores["chromaticity"])
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        plt.clf()
        plt.plot(x_list, drop_losses)
        plt.savefig(join(epoch_dir, "vq_num.png"))
    except Exception:
        pass

    main_vq = elbow_select(list(drop_losses), cfg.best_thres)

    # per-threshold validation vis into <epoch>/<k or main_k>/batch%09d
    for i, thres in enumerate(val_thres_list):
        k_codes = cfg.num_embed - cfg.num_drop + i
        sub = ("main_%d" % k_codes) if i == main_vq else str(k_codes)
        for b_i, view in enumerate(vali_views):
            batch = _device_batch(view.as_batch())
            key, k2 = jax.random.split(key)
            # same rng for every chunk: vali-mode dropout masks the
            # CODEBOOK from (thres, rng) only, so chunks stay
            # consistent with the unchunked call
            pred = _forward_chunked(
                lambda b: vq_nfr_forward(
                    params, init_vq_ema_state(cfg.z_dim, cfg.num_embed),
                    b, cfg, lxyz, lareas, mode="vali",
                    thres=jnp.asarray(thres), rng=k2)[0], batch)
            vis = {"pred_" + k: np.asarray(v) for k, v in pred.items()}
            vis["gt_rgb"] = view.rgb
            vis["gt_alpha"] = view.alpha
            vis_view(vis, (view.h, view.w),
                     join(epoch_dir, sub, "batch%09d" % b_i), view.id,
                     white_bg=cfg.white_bg, mode="vali")
    from ..utils.html import write_vali_index
    write_vali_index(os.path.dirname(os.path.dirname(epoch_dir)),
                     white_bg=cfg.white_bg)
    return main_vq


def train_ref_nfr(cfg: dc.DecompConfig, vq_params, light, train_views,
                  vali_views, outdir, epochs=None, seed=None, resume=True):
    """Phase-3 trainer (trainvali.py with model=ref_nfr)."""
    from ..models.ref_nfr import init_ref_nfr

    epochs = epochs or cfg.epochs
    seed = cfg.random_seed if seed is None else seed
    rng = np.random.RandomState(seed)
    lxyz, lareas = dc.light_constants(cfg)
    params = init_ref_nfr(seed, cfg, vq_params, light)
    tx, step_fn = dt.make_ref_nfr_step(cfg, lxyz, lareas)
    opt_state = tx.init(params["train"])

    start_epoch = 0
    if resume:
        latest = ckpt_util.latest_ckpt(outdir)
        if latest:
            state = ckpt_util.load_ckpt(latest, {
                "params": params, "opt_state": opt_state, "epoch": 0})
            params, opt_state = state["params"], state["opt_state"]
            start_epoch = int(state["epoch"])

    step = start_epoch * max(len(train_views), 1)
    history = []
    if start_epoch < epochs:  # don't stage the store for a no-op resume
        epoch_batches, store = _make_batch_source(train_views, cfg,
                                                  "contrast")
    else:
        epoch_batches = store = None
    # donate only opt_state: params carry the frozen subtree
    scan_on = _resolve_epoch_scan(cfg, store)
    sample_fn = _resolve_device_sampling(
        cfg, store if scan_on else None, train_views, "contrast")
    run_epoch = (dt.make_plain_epoch_scan(step_fn, store,
                                          donate=(1,),
                                          sample_fn=sample_fn)
                 if scan_on else None)
    period = cfg_ckpt_period(cfg)
    chunk = _resolve_scan_chunk(cfg, run_epoch)
    k_steps = max(len(train_views), 1)

    def _post_epoch(e1, losses, wall_s, state_epoch=None):
        mean_loss, n_skipped = _finite_mean(losses)
        history.append(mean_loss)
        _log_scalars(outdir, e1, {"loss_train": mean_loss,
                                  "skipped_steps": n_skipped,
                                  "wall_s": round(wall_s, 4)})
        _check_finite(outdir, "ref_nfr", e1, {"loss_train": mean_loss},
                      {"params": params, "opt_state": opt_state,
                       "epoch": state_epoch or e1},
                      state_epoch=state_epoch)
        if e1 % period == 0 or e1 == epochs:
            ckpt_util.save_ckpt(
                outdir, e1,
                {"params": params, "opt_state": opt_state, "epoch": e1},
                keep=cfg.keep_recent_epochs
                if cfg.keep_recent_epochs > 0 else None)
            epoch_dir = _epoch_dir(outdir, e1)
            for b_i, view in enumerate(vali_views):
                batch = _device_batch(view.as_batch())
                pred = _forward_chunked(
                    lambda b: ref_nfr_forward(
                        params, b, cfg, lxyz, lareas, mode="vali")[0],
                    batch)
                vis = {"pred_" + k: np.asarray(v) for k, v in pred.items()}
                vis["gt_rgb"] = view.rgb
                vis["gt_alpha"] = view.alpha
                vis_view(vis, (view.h, view.w),
                         join(epoch_dir, "batch%09d" % b_i), view.id,
                         white_bg=cfg.white_bg, mode="vali")
            from ..utils.html import write_vali_index
            write_vali_index(outdir, white_bg=cfg.white_bg)

    if run_epoch is not None:
        if sample_fn is not None:
            skey = _sampling_base_key(seed)

            def sample_xs(n_ep):
                return _epoch_scan_xs_nopix(
                    train_views, step, n_epochs=n_ep) + (skey,)
        else:
            def sample_xs(n_ep):
                return _epoch_scan_xs(train_views, cfg, rng, "contrast",
                                      store, step, n_epochs=n_ep)

        def dispatch(xs):
            nonlocal params, opt_state, step
            params, opt_state, lds = run_epoch(
                params, opt_state, store.arrays, *xs)
            step += int(xs[0].shape[0])
            return lds

        def fetch(lds, n_ep):
            losses = list(np.asarray(lds["loss"], np.float64))
            return [losses[j * k_steps:(j + 1) * k_steps]
                    for j in range(n_ep)]

        _scan_epoch_loop(start_epoch, epochs, period, chunk,
                         sample_xs, dispatch, fetch, _post_epoch)
    else:
        for epoch in range(start_epoch, epochs):
            t_epoch = time.time()
            losses = []
            for batch in epoch_batches(rng):
                params, opt_state, ld = step_fn(
                    params, opt_state, batch,
                    jnp.asarray(step, jnp.float32))
                losses.append(ld["loss"])  # device; sync at epoch end
                step += 1
            _post_epoch(epoch + 1, losses, time.time() - t_epoch)
    save_metas(outdir)
    return params, history
