"""Full-PIPELINE e2e smoke on the 8-virtual-device CPU mesh (r3 VERDICT
weak #5/#8), wired into the suite.

The multichip dryrun and the unit tests cover every sharded PIECE (both
stages' steps, scanned/chunked dispatches, the replicated/u8/sharded
store gathers, the extraction render); this test runs scripts/
smoke_e2e.py — geo train -> extraction -> 3 decomp phases -> 4-pass
test driver — as ONE pipeline under the mesh, once per device-view
store variant, and asserts final-loss finiteness, output-tree
completeness, and recon-PSNR agreement across the variants (u8
quantizes lvis to ±1/510; auto and shard gather bit-identical batches,
so their recon must agree to fp noise and u8 within a small tolerance).

scripts/mesh_e2e_validate.py is the standalone, production-scale
version of this check.
"""

import importlib.util
import math
import os
import sys

import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _smoke():
    spec = importlib.util.spec_from_file_location(
        "smoke_e2e_for_test",
        os.path.join(REPO, "scripts", "smoke_e2e.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_full_pipeline_on_mesh_all_store_variants(tmp_path, monkeypatch):
    assert jax.device_count() == 8, jax.devices()
    smoke = _smoke()
    results = {}
    for variant in ("auto", "u8", "shard"):
        root = tmp_path / variant
        monkeypatch.setattr(sys, "argv", [
            "smoke_e2e.py", "--root", str(root),
            "--imh", "24", "--geo-iters", "60", "--epochs", "3",
            "--geo-sampler", "16+8r2", "--occ-res", "16", "--fast-vis",
            "--light-h", "2", "--device-views", variant,
        ])
        out = smoke.main()
        assert out.get("recon_psnr") is not None, out
        assert all(math.isfinite(h) for h in out["losses"]), out
        results[variant] = out["recon_psnr"]
        # output-tree completeness: the 4-pass driver artifacts
        vis = root / "out" / "sphere_ref_nfr" / "lr5e-4" / \
            "vis_test" / "latest"
        assert (vis / "raw_test" / "batch000000000"
                / "pred_rgb.png").exists(), variant
        assert (vis / "pd_vq" / "batch000000000"
                / "embed_map.png").exists(), variant

    # bit-identical batches for auto/shard -> tight; u8 quantized lvis
    assert abs(results["shard"] - results["auto"]) < 1e-3, results
    assert abs(results["u8"] - results["auto"]) < 0.3, results
