"""Lightweight performance tracing.

The reference logs per-batch wall time to TensorBoard
(decomp/nerfvq_nfr3/nerfactor/trainvali.py:250-255) and nothing else;
here we expose two TPU-appropriate tools:

  * ``trace(logdir)`` — context manager around ``jax.profiler`` that
    captures a device trace viewable in TensorBoard / Perfetto (covers
    XLA op timing, fusion boundaries, HBM traffic).
  * ``StepTimer`` — cheap host-side step timing with correct async
    semantics: it closes over a host transfer of a caller-supplied
    device scalar, because under the axon tunnel (and in general with
    async dispatch) wall-clocking dispatch alone under-measures.

Wired into the training CLIs via ``--profile-dir``.
"""

import contextlib
import json
import os
import time

__all__ = ["trace", "StepTimer"]


@contextlib.contextmanager
def trace(logdir):
    """Capture a jax profiler trace into ``logdir`` (no-op if None)."""
    if not logdir:
        yield
        return
    import jax
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Aggregates step wall times; ``sync`` must be a device scalar whose
    value depends on the step's full computation."""

    def __init__(self, path=None):
        self.path = path
        self.times = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync=None):
        if sync is not None:
            float(sync)  # forces completion (block_until_ready is not a
            # barrier under the axon tunnel)
        self.times.append(time.perf_counter() - self._t0)

    def summary(self):
        if not self.times:
            return {}
        ts = sorted(self.times)
        n = len(ts)
        out = {
            "steps": n,
            "mean_ms": 1e3 * sum(ts) / n,
            "p50_ms": 1e3 * ts[n // 2],
            "p90_ms": 1e3 * ts[min(n - 1, (9 * n) // 10)],
            "best_ms": 1e3 * ts[0],
        }
        if self.path:
            os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
            with open(self.path, "w") as f:
                json.dump(out, f)
        return out
