"""Checkpointing via orbax (replacing tf.train.CheckpointManager,
trainvali.py:157-174, and the torch state-dict saves of
nerf_runner.py:210-232).

Layout mirrors the reference: <outdir>/checkpoints/ckpt-<n>; the latest is
auto-restored on startup; cross-model restores (vq loads nfr, ref loads vq)
just load the params pytree of the earlier phase.
"""

import os
import re

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = ["save_ckpt", "load_ckpt", "latest_ckpt", "list_ckpts"]


def _ckptdir(outdir):
    return os.path.join(outdir, "checkpoints")


def save_ckpt(outdir, step, state, keep=None):
    """state: any pytree (params, opt_state, ema, step...).

    keep: retain only the newest ``keep`` checkpoints
    (tf.train.CheckpointManager max_to_keep / the reference's
    keep_recent_epochs, trainvali.py:163-167); None keeps all."""
    path = os.path.join(_ckptdir(outdir), "ckpt-%d" % step)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    if keep is not None and keep > 0:
        import shutil
        for old in list_ckpts(outdir)[:-keep]:
            shutil.rmtree(old, ignore_errors=True)
    return path


def list_ckpts(outdir):
    d = _ckptdir(outdir)
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        m = re.fullmatch(r"ckpt-(\d+)", name)
        if m:
            out.append((int(m.group(1)), os.path.join(d, name)))
    return [p for _, p in sorted(out)]


def latest_ckpt(outdir):
    ckpts = list_ckpts(outdir)
    return ckpts[-1] if ckpts else None


def load_ckpt(path, example_state=None):
    """Restore a pytree; with example_state, the checkpoint is restored
    INTO that structure (keeps namedtuples like optax states intact)."""
    if path is None:
        raise FileNotFoundError("no checkpoint found (latest_ckpt is None)")
    ckptr = ocp.PyTreeCheckpointer()
    if example_state is None:
        return ckptr.restore(os.path.abspath(path))
    restored = ckptr.restore(
        os.path.abspath(path),
        args=ocp.args.PyTreeRestore(item=example_state))

    def _check(ref, got):
        arr = np.asarray(got) if not hasattr(got, "shape") else got
        assert tuple(np.shape(arr)) == tuple(np.shape(ref)), (
            f"ckpt shape {np.shape(arr)} != expected {np.shape(ref)}")
        return jax.numpy.asarray(arr)

    return jax.tree_util.tree_map(_check, example_state, restored)
