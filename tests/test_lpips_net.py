"""LPIPS network math with synthetic weights (identity-ish checks)."""

import numpy as np

from vqnerf_release_tpu.eval.lpips_net import lpips_from_weights


def _synthetic_weights(tmp_path):
    rs = np.random.RandomState(0)
    cfg = [  # (kh, kw, cin, cout) per AlexNet conv
        (11, 11, 3, 8), (5, 5, 8, 12), (3, 3, 12, 16),
        (3, 3, 16, 16), (3, 3, 16, 16)]
    w = {}
    for li, (kh, kw, cin, cout) in enumerate(cfg, start=1):
        w[f"conv{li}/kernel"] = rs.randn(kh, kw, cin, cout) * 0.05
        w[f"conv{li}/bias"] = rs.randn(cout) * 0.01
    for i, (_, _, _, cout) in enumerate(cfg):
        w[f"lin{i}/kernel"] = np.abs(rs.randn(1, 1, cout, 1)) * 0.1
    p = str(tmp_path / "lpips.npz")
    np.savez(p, **w)
    return p


def test_lpips_identity_and_ordering(tmp_path):
    path = _synthetic_weights(tmp_path)
    rs = np.random.RandomState(1)
    a = rs.rand(64, 64, 3)
    assert lpips_from_weights(a, a, path) < 1e-10
    small = np.clip(a + 0.02 * rs.randn(64, 64, 3), 0, 1)
    big = np.clip(a + 0.4 * rs.randn(64, 64, 3), 0, 1)
    d_small = lpips_from_weights(a, small, path)
    d_big = lpips_from_weights(a, big, path)
    assert 0 < d_small < d_big


def test_lpips_env_dispatch(tmp_path, monkeypatch):
    from vqnerf_release_tpu.eval import metrics
    path = _synthetic_weights(tmp_path)
    monkeypatch.setenv("VQNERF_LPIPS_WEIGHTS", path)
    rs = np.random.RandomState(2)
    a = rs.rand(32, 32, 3)
    b = np.clip(a + 0.1 * rs.randn(32, 32, 3), 0, 1)
    v = metrics.lpips(a, b)
    assert v > 0
    monkeypatch.delenv("VQNERF_LPIPS_WEIGHTS")
    v2 = metrics.lpips(a, b)  # proxy path
    assert v2 > 0
