"""Device mesh + sharding helpers (ray-axis data parallelism)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["get_mesh", "batch_sharding", "shard_batch", "replicate",
           "pad_to_multiple"]

RAY_AXIS = "rays"


def get_mesh(devices=None):
    """1-D mesh over the ray/batch axis. The models here are point-wise
    MLPs over rays — sharding the ray axis is the entire parallelism story
    (replacing MirroredStrategy, trainvali.py:436-446)."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (RAY_AXIS,))


def batch_sharding(mesh):
    return NamedSharding(mesh, P(RAY_AXIS))


def replicate(mesh):
    return NamedSharding(mesh, P())


def pad_to_multiple(arr, multiple, axis=0, pad_value=0.0):
    """Pad axis 0 up to a multiple (so uneven ray counts shard evenly).
    Returns (padded, original_len)."""
    n = arr.shape[axis]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return arr, n
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, target - n)
    return np.pad(np.asarray(arr), widths, constant_values=pad_value), n


def shard_batch(batch, mesh, pad=True):
    """device_put a dict-of-arrays batch with the leading axis sharded over
    the mesh. Pads the ray axis to a device multiple (padded rows carry
    alpha=0 so they behave as background). Returns (sharded_batch, n_orig).
    """
    n_dev = mesh.devices.size
    sharding = batch_sharding(mesh)
    out = {}
    n_orig = None
    for k, v in batch.items():
        v = np.asarray(v)
        if pad:
            v, n = pad_to_multiple(v, n_dev)
            n_orig = n if n_orig is None else n_orig
        out[k] = jax.device_put(jnp.asarray(v), sharding)
    return out, n_orig
