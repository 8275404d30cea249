"""train/loop.py helpers: chunked validation forwards (r5 — the full
512px x 512-light view OOMed the v5e in one vali call)."""

import numpy as np


def test_forward_chunked_matches_unchunked():
    from vqnerf_release_tpu.models import decomp_common as dc
    from vqnerf_release_tpu.models.nfr_unit import (init_nfr_unit,
                                                    nfr_unit_forward)
    from vqnerf_release_tpu.train.loop import _forward_chunked

    cfg = dc.DecompConfig(light_h=2, num_embed=4, num_drop=2,
                          thres_str="0.1;0.2", z_dim=16, mlp_width=8)
    lxyz, lareas = dc.light_constants(cfg)
    params = init_nfr_unit(0, cfg)
    rs = np.random.RandomState(0)
    n = 23  # odd size: chunk=7 leaves a short remainder
    normal = rs.randn(n, 3).astype(np.float32)
    normal /= np.linalg.norm(normal, axis=1, keepdims=True)
    batch = {
        "rayo": np.tile(np.array([[0, 0, 3.0]], np.float32), (n, 1)),
        "rayd": rs.randn(n, 3).astype(np.float32),
        "rgb": rs.rand(n, 3).astype(np.float32),
        "alpha": (rs.rand(n, 1) > 0.3).astype(np.float32),
        "pred_alpha": np.ones((n, 1), np.float32),
        "xyz": rs.rand(n, 3).astype(np.float32) - 0.5,
        "normal": normal,
        "lvis": rs.rand(n, cfg.n_lights).astype(np.float32),
    }

    def fwd(b):
        return nfr_unit_forward(params, b, cfg, lxyz, lareas,
                                mode="vali")[0]

    full = {k: np.asarray(v) for k, v in fwd(batch).items()}
    chunked = _forward_chunked(fwd, batch, chunk=7)
    assert set(full) == set(chunked)
    for k in full:
        np.testing.assert_allclose(chunked[k], full[k], rtol=2e-6,
                                   atol=2e-6, err_msg=k)
    # small batches pass through without copies
    same = _forward_chunked(fwd, batch, chunk=64)
    for k in full:
        np.testing.assert_allclose(np.asarray(same[k]), full[k],
                                   rtol=0, atol=0, err_msg=k)
