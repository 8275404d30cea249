"""Divergence guards: a non-finite training loss must stop the run with
an actionable error AND leave the failing state checkpointed for triage,
instead of silently corrupting later epochs."""

import os

import numpy as np
import pytest

from vqnerf_release_tpu.data.shape_dataset import ShapeView
from vqnerf_release_tpu.models import decomp_common as dc
from vqnerf_release_tpu.train import loop
from vqnerf_release_tpu.utils import ckpt as ckpt_util

CFG = dc.DecompConfig(light_h=2, num_embed=4, num_drop=2, z_dim=16,
                      mlp_width=16, n_rays_per_step=32, epochs=1,
                      thres_str="0.1;0.2", total_sample_vq=64)


def _poisoned_view(seed=0):
    rs = np.random.RandomState(seed)
    n = 128
    rgb = rs.rand(n, 3).astype(np.float32)
    rgb[5, 0] = np.nan  # poison one pixel
    normal = rs.randn(n, 3).astype(np.float32)
    normal /= np.linalg.norm(normal, axis=1, keepdims=True)
    return ShapeView(
        id="train_000", h=8, w=16,
        rayo=np.tile(np.array([[0, 0, 3.0]], np.float32), (n, 1)),
        rayd=rs.randn(n, 3).astype(np.float32),
        rgb=rgb,
        alpha=np.ones((n, 1), np.float32),
        pred_alpha=np.ones((n, 1), np.float32),
        xyz=(rs.rand(n, 3).astype(np.float32) - 0.5),
        normal=normal,
        lvis=rs.rand(n, CFG.n_lights).astype(np.float32),
        ref=rgb.copy(),
    )


def test_nfr_unit_nan_guard(tmp_path):
    outdir = str(tmp_path / "nfr")
    view = _poisoned_view()
    with pytest.raises(RuntimeError, match="non-finite training loss"):
        loop.train_nfr_unit(CFG, [view], [], outdir, resume=False)
    dump = os.path.join(outdir, "debug_failure")
    latest = ckpt_util.latest_ckpt(dump)
    assert latest is not None
    state = ckpt_util.load_ckpt(latest)
    assert "params" in state and "opt_state" in state
    assert os.path.exists(os.path.join(dump, "train_log.jsonl"))


def test_chunk_plan_boundaries():
    """_chunk_plan never crosses the end of training or a ckpt/vali
    boundary (host-side work runs there), and never returns < 1."""
    # plain full chunks: epochs=12, period=6, chunk=3 -> 3,3 | 3,3
    sched, e = [], 0
    while e < 12:
        n = loop._chunk_plan(e, 12, 6, 3)
        sched.append(n)
        e += n
    assert sched == [3, 3, 3, 3]
    # chunk clipped at a period boundary: period=4, chunk=3 -> 3,1 rep.
    sched, e = [], 0
    while e < 8:
        n = loop._chunk_plan(e, 8, 4, 3)
        sched.append(n)
        e += n
    assert sched == [3, 1, 3, 1]
    # remainder chunk at the end: epochs=5, period=10, chunk=2 -> 2,2,1
    sched, e = [], 0
    while e < 5:
        n = loop._chunk_plan(e, 5, 10, 2)
        sched.append(n)
        e += n
    assert sched == [2, 2, 1]
    # degenerate: chunk larger than everything still moves forward
    assert loop._chunk_plan(0, 1, 1, 100) == 1


def test_scan_epoch_loop_schedule():
    """The shared chunked driver samples the NEXT chunk between dispatch
    and fetch (overlap), delivers one post_epoch per epoch with the
    end-of-chunk state_epoch label, and honors the chunk plan."""
    calls = []

    def sample_xs(n_ep):
        calls.append(("sample", n_ep))
        return list(range(n_ep))

    def dispatch(xs):
        calls.append(("dispatch", len(xs)))
        return xs

    def fetch(lds, n_ep):
        calls.append(("fetch", n_ep))
        return [f"p{i}" for i in range(n_ep)]

    posts = []

    def post_epoch(e1, payload, wall, state_epoch):
        posts.append((e1, payload, state_epoch))

    # epochs=5, period=10, chunk=2 -> chunks 2,2,1
    loop._scan_epoch_loop(0, 5, 10, 2, sample_xs, dispatch, fetch,
                          post_epoch)
    kinds = [c[0] for c in calls]
    # overlap: each chunk's NEXT sampling happens before its fetch
    assert kinds == ["sample", "dispatch", "sample", "fetch",
                     "dispatch", "sample", "fetch",
                     "dispatch", "fetch"]
    # the final chunk samples nothing further (no 4th sample call)
    assert [c[1] for c in calls if c[0] == "sample"] == [2, 2, 1]
    # one post per epoch, labeled with its chunk's END epoch
    assert posts == [(1, "p0", 2), (2, "p1", 2),
                     (3, "p0", 4), (4, "p1", 4),
                     (5, "p0", 5)]


def test_nfr_unit_nan_guard_chunked(tmp_path):
    """With chunked dispatches the guard still fires on the FAILING
    epoch but checkpoints (and labels) the end-of-chunk state — the
    earliest observable state after the failure."""
    import dataclasses
    import json

    outdir = str(tmp_path / "nfr_chunked")
    cfg = dataclasses.replace(CFG, epochs=4, epoch_scan_chunk=2)
    view = _poisoned_view()
    with pytest.raises(RuntimeError, match="end-of-chunk epoch 2"):
        loop.train_nfr_unit(cfg, [view], [], outdir, resume=False)
    dump = os.path.join(outdir, "debug_failure")
    latest = ckpt_util.latest_ckpt(dump)
    assert latest is not None
    state = ckpt_util.load_ckpt(latest)
    assert int(np.asarray(state["epoch"])) == 2
    rows = [json.loads(l) for l in
            open(os.path.join(dump, "train_log.jsonl"))]
    assert rows[-1]["epoch"] == 1 and rows[-1]["state_epoch"] == 2


def test_scan_epoch_loop_oom_hint():
    """A RESOURCE_EXHAUSTED dispatch of a multi-epoch chunk re-raises
    with the actionable lower-epoch_scan_chunk hint (the raw error at
    chunk=12 on a v5e was undiagnosable; BASELINE.md r4)."""
    import jax
    import pytest

    def sample_xs(n_ep):
        return list(range(n_ep))

    def dispatch(xs):
        raise jax.errors.JaxRuntimeError(
            "RESOURCE_EXHAUSTED: TPU backend error (ResourceExhausted)")

    with pytest.raises(RuntimeError, match="lower epoch_scan_chunk"):
        loop._scan_epoch_loop(0, 6, 10, 3, sample_xs, dispatch,
                              lambda lds, n: [None] * n,
                              lambda *a: None)

    # single-epoch chunks (nothing to lower) propagate the raw error
    with pytest.raises(jax.errors.JaxRuntimeError):
        loop._scan_epoch_loop(0, 6, 10, 1, sample_xs, dispatch,
                              lambda lds, n: [None] * n,
                              lambda *a: None)
