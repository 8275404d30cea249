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
