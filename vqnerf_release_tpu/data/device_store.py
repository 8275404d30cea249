"""Device-resident stage-2 view store: per-step batches gathered ON
device from pre-staged view buffers.

The reference streams every training batch CPU->GPU through tf.data
(decomp/nerfvq_nfr3/nerfactor/datasets/base.py:86-122); our host path
does the same with a prefetch thread. Both ship the full gathered batch
(~4.3 MB/step with a 512-light lvis) over the host->device link every
step. On a TPU the idiomatic alternative is to device_put every view
ONCE and ship only the host-sampled ray INDICES (8 KB/step): the gather
runs on device, and the per-step host->device traffic drops ~500x. With
index selection kept on the host (data.sampler.sample_pix, identical
RNG consumption), device-gathered batches equal host-gathered batches
bit for bit — tests/test_device_store.py asserts this through full
training loops.

Memory: the store holds [V, H*W + 1, C] float32 per buffer key (the +1
row is zeros, used to pad ray counts to a device multiple — padded rows
carry alpha=0 and are masked out downstream, matching
parallel.mesh.shard_batch's zero-row padding). A 100-view 512^2 scene
without lvis is ~2 GB; WITH a 512-direction lvis it is ~55 GB and does
not fit HBM — the 'auto' policy (fits_device_memory) falls back to the
host path in that case.
"""

import logging

import numpy as np

__all__ = ["DeviceViewStore", "get_store", "store_nbytes",
           "views_compatible", "fits_device_memory"]

logger = logging.getLogger(__name__)

_KEYS = ("rayo", "rayd", "rgb", "alpha", "pred_alpha", "xyz", "normal",
         "lvis", "ref")

# [0,1]-domain buffers eligible for uint8 staging (device_views='u8').
# lvis dominates the store (n_lights channels vs 3 for everything else:
# a 512-direction lvis is ~97% of the bytes), so quantizing it alone
# cuts the store ~4x. Quantization error is ±1/510 per value — NOT
# bit-identical to the host path, which is why 'u8' is an explicit
# opt-in mode rather than an 'auto' tier.
_QUANT_KEYS = ("lvis",)

# Conservative default budget when the backend does not report its
# memory: leaves >= 3/4 of a 16 GB v5e HBM for params/grads/activations.
_DEFAULT_BUDGET_BYTES = 4 << 30


def store_nbytes(views, quant=False):
    """Device bytes the store would need for these views (per device
    when replicated — device_views='shard' divides this by the mesh
    size). quant=True prices the device_views='u8' layout (uint8 for
    _QUANT_KEYS, float32 rest)."""
    total = 0
    for k in _KEYS:
        arr = getattr(views[0], k, None)
        if arr is None:
            continue
        n, c = arr.reshape(arr.shape[0], -1).shape
        itemsize = 1 if (quant and k in _QUANT_KEYS) else 4
        total += len(views) * (n + 1) * c * itemsize
    return total


def views_compatible(views):
    """True iff every view shares view[0]'s resolution and key set —
    the store stacks [V, HW, C] per key, so a heterogeneous dataset
    must fall back to the host-gather path instead of crashing
    (device_views='auto' checks this before staging)."""
    if not views:
        return False
    n0 = views[0].rayo.reshape(views[0].rayo.shape[0], -1).shape[0]
    keys0 = [k for k in _KEYS if getattr(views[0], k, None) is not None]
    for v in views[1:]:
        keys = [k for k in _KEYS if getattr(v, k, None) is not None]
        if keys != keys0:
            return False
        for k in keys:
            a = np.asarray(getattr(v, k))
            a0 = np.asarray(getattr(views[0], k))
            if (a.reshape(a.shape[0], -1).shape
                    != a0.reshape(a0.shape[0], -1).shape):
                return False
        if v.rayo.reshape(v.rayo.shape[0], -1).shape[0] != n0:
            return False
    return True


def fits_device_memory(views, budget_bytes=None, quant=False):
    """'auto' policy: stage the views on device iff they fit the budget.

    Budget = 25% of the backend-reported per-device memory when
    available, else a conservative 4 GiB."""
    if budget_bytes is None:
        budget_bytes = _DEFAULT_BUDGET_BYTES
        try:
            import jax
            stats = jax.local_devices()[0].memory_stats()
            if stats and stats.get("bytes_limit"):
                budget_bytes = stats["bytes_limit"] // 4
        except Exception:  # tunnel/CPU backends may not report stats
            pass
    return store_nbytes(views, quant=quant) <= budget_bytes


_CHUNK_BYTES = 64 << 20  # scripts/bench_transfer.py: the axon tunnel
# moves 4-64 MB buffers at ~18-27 MB/s but a single 256 MB device_put
# HANGS; stage big arrays as row chunks and concatenate on device


def _chunked_put(arr, sharding=None):
    import jax
    import jax.numpy as jnp

    if arr.nbytes <= _CHUNK_BYTES:
        x = jnp.asarray(arr)
        return jax.device_put(x, sharding) if sharding is not None else x
    rows = max(1, _CHUNK_BYTES // max(arr[0].nbytes, 1))
    parts = []
    for i in range(0, arr.shape[0], rows):
        p = jnp.asarray(arr[i:i + rows])
        if sharding is not None:
            p = jax.device_put(p, sharding)
        parts.append(p)
    return jnp.concatenate(parts, axis=0)


def _sharded_put(arr, mesh):
    """Stage [R, C] row-sharded over the mesh (each device holds
    R/n_dev contiguous rows, NOT a replica). Each device's shard is
    transferred with _chunked_put and the global array assembled with
    make_array_from_single_device_arrays — no full-array host copy on
    any device."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import RAY_AXIS
    sh = NamedSharding(mesh, P(RAY_AXIS, None))
    pieces = []
    for dev, idx in sh.devices_indices_map(arr.shape).items():
        piece = _chunked_put(
            arr[idx[0]], sharding=jax.sharding.SingleDeviceSharding(dev))
        pieces.append(piece)
    return jax.make_array_from_single_device_arrays(arr.shape, sh, pieces)


def _make_sharded_gather(mesh, row_stride, rows_local, keys):
    """Collective row-gather from a row-sharded store (device_views=
    'shard'): every device all-gathers the ray-sharded index vector,
    gathers the requested rows it OWNS (zeros elsewhere), and a
    reduce-scatter over the ray axis hands each device exactly its ray
    shard of the batch — the classic sharded-embedding-lookup pattern,
    riding ICI instead of replicating the store into every HBM. Exactly
    one device contributes each row (+0.0 from the rest), so the result
    equals the replicated gather bit for bit."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import RAY_AXIS

    def local(arrays, vi, pix):
        flat = vi * row_stride + pix                       # [n_loc]
        flat_all = jax.lax.all_gather(flat, RAY_AXIS, tiled=True)  # [N]
        start = jax.lax.axis_index(RAY_AXIS) * rows_local
        loc = flat_all - start
        valid = (loc >= 0) & (loc < rows_local)
        loc = jnp.clip(loc, 0, rows_local - 1)
        out = {}
        for k, a in arrays.items():
            rows = a[loc]
            if rows.dtype == jnp.uint8:                    # u8-staged
                rows = rows.astype(jnp.float32) * (1.0 / 255.0)
            rows = jnp.where(valid[:, None], rows, 0.0)
            out[k] = jax.lax.psum_scatter(
                rows, RAY_AXIS, scatter_dimension=0, tiled=True)
        return out

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=({k: P(RAY_AXIS, None) for k in keys}, P(),
                  P(RAY_AXIS)),
        out_specs={k: P(RAY_AXIS, None) for k in keys})


class DeviceViewStore:
    """Views staged on device once; per-step gather by flat pixel index.

    gather(view_idx, pix) returns the same batch dict as
    data.sampler.outer_sample for the same indices. Under a >1-device
    mesh the store is replicated (default) or row-sharded over the
    mesh (shard=True: per-device HBM drops n_dev-fold and the gather
    becomes an all-gather/reduce-scatter collective, still
    bit-identical); either way the gathered batch comes back sharded
    over the ray axis (same layout shard_batch produces)."""

    def __init__(self, views, mesh=None, quant=False, shard=False):
        import jax
        import jax.numpy as jnp

        if not views_compatible(views):
            raise ValueError(
                "DeviceViewStore needs homogeneous views (same "
                "resolution and buffer keys); use device_views='off' "
                "(or 'auto', which falls back) for this dataset")
        self.quant = bool(quant)
        self.n_views = len(views)
        self.keys = [k for k in _KEYS
                     if getattr(views[0], k, None) is not None]
        n_pix = views[0].rayo.reshape(views[0].rayo.shape[0], -1).shape[0]
        self.pad_index = n_pix  # the appended zero row
        # rows stored FLAT as [V*(HW+1), C]: the gather indexes
        # view_idx*row_stride + pix directly, so XLA emits one small
        # row-gather instead of a [HW+1, C] dynamic-slice (which would
        # materialize the whole view — 134 MB for a 512-light lvis at
        # 256^2 — per step inside the scanned epoch)
        self.row_stride = n_pix + 1
        self._mesh = mesh if (mesh is not None
                              and mesh.devices.size > 1) else None
        # 'shard' only differs from 'on' under a >1-device mesh
        self.sharded = bool(shard) and self._mesh is not None

        stacked = {}
        for k in self.keys:
            per = [np.asarray(getattr(v, k), np.float32).reshape(
                n_pix, -1) for v in views]
            arr = np.stack(per, axis=0)  # [V, HW, C]
            arr = np.concatenate(
                [arr, np.zeros((self.n_views, 1, arr.shape[-1]),
                               np.float32)], axis=1)  # pad row
            arr = arr.reshape(self.n_views * self.row_stride, -1)
            if self.quant and k in _QUANT_KEYS:
                # [0,1]-domain buffer -> uint8; gather_rows dequantizes
                arr = np.clip(np.rint(arr * 255.0), 0, 255) \
                    .astype(np.uint8)
            stacked[k] = arr
        logger.info(
            "[device-views] staging %d views (%.0f MB%s%s) on device",
            self.n_views, store_nbytes(views, quant=self.quant) / 2**20,
            ", lvis quantized to u8" if self.quant else "",
            ", row-sharded over %d devices"
            % (self._mesh.devices.size if self.sharded else 1)
            if self.sharded else "")

        if self.sharded:
            from ..parallel.mesh import batch_sharding
            n_dev = self._mesh.devices.size
            n_rows = self.n_views * self.row_stride
            rows_pad = (-n_rows) % n_dev  # zero rows; never indexed
            if rows_pad:
                stacked = {
                    k: np.concatenate(
                        [v, np.zeros((rows_pad, v.shape[-1]), v.dtype)])
                    for k, v in stacked.items()}
            self._arrays = {k: _sharded_put(v, self._mesh)
                            for k, v in stacked.items()}
            self._gather_in_jit = _make_sharded_gather(
                self._mesh, self.row_stride,
                (n_rows + rows_pad) // n_dev, self.keys)
            self._pix_sharding = batch_sharding(self._mesh)
            self._gather = jax.jit(self._gather_in_jit)
        elif self._mesh is not None:
            from ..parallel.mesh import batch_sharding, replicate
            rep = replicate(self._mesh)
            self._arrays = {
                k: _chunked_put(v, sharding=rep)
                for k, v in stacked.items()}
            self._gather_in_jit = self._gather_impl
            self._pix_sharding = batch_sharding(self._mesh)
            out_sh = {k: self._pix_sharding for k in self.keys}
            self._gather = jax.jit(self._gather_impl,
                                   out_shardings=out_sh)
        else:
            self._arrays = {k: _chunked_put(v)
                            for k, v in stacked.items()}
            self._gather_in_jit = self._gather_impl
            self._pix_sharding = None
            self._gather = jax.jit(self._gather_impl)

    @property
    def arrays(self):
        """Device-resident {key: [V*(HW+1), C]} dict (for the scanned
        epoch runners, which gather inside lax.scan via gather_in_jit).
        Row-sharded over the mesh when self.sharded, else replicated."""
        return self._arrays

    @property
    def gather_in_jit(self):
        """(arrays, view_idx, pix) -> batch dict; safe inside a jitted
        scan body. Replicated stores: the flat row-gather. Sharded
        stores: the shard_map collective gather (all-gather indices,
        owner-gathers rows, reduce-scatter over the ray axis)."""
        return self._gather_in_jit

    @staticmethod
    def gather_rows(arrays, view_idx, pix, row_stride):
        """The in-jit gather shared by gather() and the scanned epoch
        bodies: one flat row-gather per buffer key. uint8-staged keys
        (device_views='u8') dequantize here, AFTER the gather — the
        store stays u8 in HBM, only the batch is float32."""
        import jax.numpy as jnp

        flat = view_idx * row_stride + pix
        out = {}
        for k, a in arrays.items():
            rows = a[flat]
            if rows.dtype == jnp.uint8:
                rows = rows.astype(jnp.float32) * (1.0 / 255.0)
            out[k] = rows
        return out

    def _gather_impl(self, arrays, view_idx, pix):
        return self.gather_rows(arrays, view_idx, pix, self.row_stride)

    def gather(self, view_idx, pix):
        """pix: [N] flat pixel indices (np.int64/int32) from sample_pix.
        Pads N to a device multiple with the zero row (alpha=0)."""
        import jax
        import jax.numpy as jnp

        pix = np.asarray(pix, np.int32)
        if self._mesh is not None:
            from ..parallel.mesh import pad_to_multiple
            pix, _ = pad_to_multiple(pix, self._mesh.devices.size,
                                     pad_value=self.pad_index)
            pix = jax.device_put(jnp.asarray(pix), self._pix_sharding)
        return self._gather(self._arrays, jnp.int32(view_idx), pix)


_STORE_CACHE = []  # [(view_ids, views_ref, mesh_key, store)], max 2


def get_store(views, mesh=None, quant=False, shard=False):
    """DeviceViewStore for these views, cached by view identity: the
    nfr_unit and vq_nfr phases train on the SAME view list, so a full
    pipeline run must not re-upload the multi-GB store per phase. The
    cache keeps a strong reference to the views so ids cannot be
    recycled; 2 entries cover a pipeline (train list + with_ref list)."""
    key = (tuple(id(v) for v in views), bool(quant), bool(shard))
    mesh_key = (None if mesh is None
                else tuple(d.id for d in mesh.devices.flat))
    for ids, _ref, mk, store in _STORE_CACHE:
        if ids == key and mk == mesh_key:
            return store
    store = DeviceViewStore(views, mesh=mesh, quant=quant, shard=shard)
    _STORE_CACHE.append((key, views, mesh_key, store))
    del _STORE_CACHE[:-2]
    return store
