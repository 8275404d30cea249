"""bench.py metric plumbing (no TPU): the schedule-weighted headline
must follow config._GEO_FAST_SAMPLER — parity tail reuses the parity
metric, a dense occ tail (tail_occ) gets its own entry and enters the
weighted number."""

import importlib.util
import os

import pytest


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_tail_bench_none_when_tail_is_parity(monkeypatch):
    import vqnerf_release_tpu.config as vcfg
    bench = _bench()
    monkeypatch.setattr(vcfg, "_GEO_FAST_SAMPLER", dict(
        n_samples=24, n_importance=8, up_sample_steps=2, occ_res=128,
        tail_frac=0.25, tail_sampler="64+64r4"))
    assert bench.bench_geo_train_tail() is None


def test_schedule_metric_weights_configured_tail(monkeypatch):
    import vqnerf_release_tpu.config as vcfg
    bench = _bench()
    carve = {"value": 80000.0}
    tail = {"value": 40000.0}

    monkeypatch.setattr(vcfg, "_GEO_FAST_SAMPLER", dict(
        n_samples=24, n_importance=8, up_sample_steps=2, occ_res=128,
        tail_frac=0.25, tail_sampler="64+32r2", tail_occ=True))
    m = bench.geo_train_schedule_metric(carve, tail)
    expect = 1.0 / (0.75 / 80000.0 + 0.25 / 40000.0)
    assert m["value"] == pytest.approx(expect, rel=1e-6)
    assert "occ 64+32r2" in m["note"]
    assert m["metric"] == "geo_train_rays_per_sec"

    # parity-tail default: note names the parity spec, same formula
    monkeypatch.setattr(vcfg, "_GEO_FAST_SAMPLER", dict(
        n_samples=24, n_importance=8, up_sample_steps=2, occ_res=128,
        tail_frac=0.25, tail_sampler="64+64r4"))
    m2 = bench.geo_train_schedule_metric(carve, tail)
    assert "64+64r4" in m2["note"] and "occ 64+64r4" not in m2["note"]
