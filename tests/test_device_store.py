"""Device-resident view store: device-gathered batches must equal the
host-gathered outer_sample batches bit for bit (same rng), pad rows must
behave as background under the 8-device mesh, and full training loops
must produce identical trajectories with device_views on vs off."""

import dataclasses

import numpy as np
import pytest

from vqnerf_release_tpu.data.device_store import (
    DeviceViewStore, fits_device_memory, store_nbytes)
from vqnerf_release_tpu.data.sampler import outer_sample, sample_pix
from vqnerf_release_tpu.data.shape_dataset import ShapeView
from vqnerf_release_tpu.models import decomp_common as dc
from vqnerf_release_tpu.parallel import get_mesh
from vqnerf_release_tpu.train import loop

CFG = dc.DecompConfig(light_h=2, num_embed=4, num_drop=2, z_dim=16,
                      mlp_width=16, n_rays_per_step=20, epochs=2,
                      thres_str="0.1;0.2", total_sample_vq=64,
                      keep_recent_epochs=1)


def _view(seed=0, h=10, w=12, with_lvis=True, with_ref=False):
    rs = np.random.RandomState(seed)
    n = h * w
    normal = rs.randn(n, 3).astype(np.float32)
    normal /= np.linalg.norm(normal, axis=1, keepdims=True)
    alpha = (rs.rand(n, 1) > 0.25).astype(np.float32)
    return ShapeView(
        id="train_%03d" % seed, h=h, w=w,
        rayo=np.tile(np.array([[0, 0, 3.0]], np.float32), (n, 1)),
        rayd=rs.randn(n, 3).astype(np.float32),
        rgb=rs.rand(n, 3).astype(np.float32),
        alpha=alpha,
        pred_alpha=alpha.copy(),
        xyz=(rs.rand(n, 3).astype(np.float32) - 0.5),
        normal=normal,
        lvis=rs.rand(n, CFG.n_lights).astype(np.float32)
        if with_lvis else None,
        ref=rs.rand(n, 3).astype(np.float32) if with_ref else None,
    )


@pytest.mark.parametrize("with_lvis,with_ref",
                         [(True, False), (False, True), (False, False)])
def test_gather_matches_host_gather(with_lvis, with_ref):
    views = [_view(s, with_lvis=with_lvis, with_ref=with_ref)
             for s in range(3)]
    store = DeviceViewStore(views)
    for vi, view in enumerate(views):
        pix = sample_pix(view, 16, np.random.RandomState(7 + vi))
        host = outer_sample(view, 16, np.random.RandomState(7 + vi))
        dev = store.gather(vi, pix)
        assert set(dev) == set(host)
        for k in host:
            np.testing.assert_array_equal(np.asarray(dev[k]), host[k],
                                          err_msg=k)


def test_mesh_gather_pads_with_background():
    views = [_view(s) for s in range(2)]
    mesh = get_mesh()
    assert mesh.devices.size == 8  # conftest virtual devices
    store = DeviceViewStore(views, mesh=mesh)
    pix = sample_pix(views[1], 9, np.random.RandomState(3))  # 18 % 8 != 0
    host = outer_sample(views[1], 9, np.random.RandomState(3))
    dev = store.gather(1, pix)
    n = pix.shape[0]
    for k in host:
        got = np.asarray(dev[k])
        assert got.shape[0] == 24  # padded to the device multiple
        np.testing.assert_array_equal(got[:n], host[k], err_msg=k)
    assert np.all(np.asarray(dev["alpha"])[n:] == 0)  # background rows


def test_chunked_put_matches_direct(monkeypatch):
    # force the chunked staging path (production trigger: >64 MB keys;
    # a single huge device_put runs at <1 MB/s through the axon tunnel)
    from vqnerf_release_tpu.data import device_store as ds
    monkeypatch.setattr(ds, "_CHUNK_BYTES", 64)
    arr = np.random.RandomState(0).rand(37, 5).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(ds._chunked_put(arr)), arr)
    views = [_view(s) for s in range(2)]
    store = ds.DeviceViewStore(views)
    pix = sample_pix(views[0], 8, np.random.RandomState(1))
    host = outer_sample(views[0], 8, np.random.RandomState(1))
    dev = store.gather(0, pix)
    for k in host:
        np.testing.assert_array_equal(np.asarray(dev[k]), host[k])


def test_auto_policy_budget():
    views = [_view(s) for s in range(2)]
    assert store_nbytes(views) > 0
    assert fits_device_memory(views, budget_bytes=1 << 30)
    assert not fits_device_memory(views, budget_bytes=128)


def test_u8_store_quantizes_lvis_only():
    views = [_view(s) for s in range(3)]
    # u8 prices lvis at 1 byte/elem; everything else stays fp32
    n_lvis = sum((v.lvis.size + v.lvis.shape[-1]) for v in views)
    assert store_nbytes(views) - store_nbytes(views, quant=True) \
        == 3 * n_lvis
    store = DeviceViewStore(views, quant=True)
    import jax.numpy as jnp
    assert store.arrays["lvis"].dtype == jnp.uint8
    assert store.arrays["rgb"].dtype == jnp.float32
    for vi, view in enumerate(views):
        pix = sample_pix(view, 16, np.random.RandomState(7 + vi))
        host = outer_sample(view, 16, np.random.RandomState(7 + vi))
        dev = store.gather(vi, pix)
        for k in host:
            got = np.asarray(dev[k])
            if k == "lvis":
                # quantized round trip: within half a u8 step, and
                # exactly equal to the explicit round-trip formula
                np.testing.assert_allclose(got, host[k], atol=0.5 / 255)
                expect = np.clip(np.rint(host[k] * 255), 0, 255) / 255.0
                np.testing.assert_allclose(got, expect.astype(np.float32),
                                           rtol=0, atol=1e-7)
            else:
                np.testing.assert_array_equal(got, host[k], err_msg=k)


def test_sharded_store_gather_matches_and_scales_memory():
    views = [_view(s) for s in range(3)]
    mesh = get_mesh()
    n_dev = mesh.devices.size
    assert n_dev == 8
    store = DeviceViewStore(views, mesh=mesh, shard=True)
    assert store.sharded
    # per-device HBM is 1/n_dev of the store (plus row padding), not a
    # replica: every key's shards tile the row axis disjointly
    for k, a in store.arrays.items():
        shards = a.addressable_shards
        assert len(shards) == n_dev
        rows_local = a.shape[0] // n_dev
        assert all(s.data.shape[0] == rows_local for s in shards)
        starts = sorted(s.index[0].start or 0 for s in shards)
        assert starts == [i * rows_local for i in range(n_dev)]
    # the collective gather is bit-identical to the host gather
    for vi, view in enumerate(views):
        pix = sample_pix(view, 16, np.random.RandomState(7 + vi))
        host = outer_sample(view, 16, np.random.RandomState(7 + vi))
        dev = store.gather(vi, pix)
        n = pix.shape[0]
        for k in host:
            np.testing.assert_array_equal(
                np.asarray(dev[k])[:n], host[k], err_msg=k)
    # u8 composes with shard: lvis stays uint8 in every shard
    import jax.numpy as jnp
    store_q = DeviceViewStore(views, mesh=mesh, shard=True, quant=True)
    assert store_q.arrays["lvis"].dtype == jnp.uint8
    pix = sample_pix(views[0], 16, np.random.RandomState(3))
    host = outer_sample(views[0], 16, np.random.RandomState(3))
    got = np.asarray(store_q.gather(0, pix)["lvis"])[:pix.shape[0]]
    np.testing.assert_allclose(got, host["lvis"], atol=0.5 / 255)


def test_u8_mode_trains_and_auto_hints(tmp_path, capsys, monkeypatch):
    monkeypatch.setenv("VQNERF_NATIVE_SAMPLER", "0")
    views = [_view(s) for s in range(2)]
    vali = [_view(9)]
    cfg = dataclasses.replace(CFG, device_views="u8")
    params, hist = loop.train_nfr_unit(
        cfg, views, vali, str(tmp_path / "u8"), resume=False)
    assert np.all(np.isfinite(hist))
    # 'auto' must NOT quantize silently when fp32 does not fit — it
    # falls back to the host path and hints at 'u8' when that would fit
    from vqnerf_release_tpu.data import device_store as ds
    from vqnerf_release_tpu.train.loop import _make_batch_source
    fp32_bytes = store_nbytes(views)
    u8_bytes = store_nbytes(views, quant=True)
    budget = (fp32_bytes + u8_bytes) // 2
    monkeypatch.setattr(ds, "_DEFAULT_BUDGET_BYTES", budget)
    monkeypatch.setattr(
        ds, "fits_device_memory",
        lambda v, budget_bytes=None, quant=False:
        store_nbytes(v, quant=quant) <= budget)
    cfg_auto = dataclasses.replace(CFG, device_views="auto")
    _, store = _make_batch_source(views, cfg_auto, "contrast")
    assert store is None
    out = capsys.readouterr().out
    assert "u8" in out and "WOULD fit" in out


def test_store_cached_across_phases():
    # nfr_unit and vq_nfr share the SAME views list; a pipeline run must
    # stage the multi-GB store once, not once per phase
    from vqnerf_release_tpu.data.device_store import get_store
    views = [_view(s) for s in range(2)]
    assert get_store(views) is get_store(views)
    assert get_store(views) is not get_store([_view(7)])


def test_heterogeneous_views_fall_back():
    from vqnerf_release_tpu.data.device_store import views_compatible
    homo = [_view(0), _view(1)]
    assert views_compatible(homo)
    mixed_res = [_view(0), _view(1, h=6, w=6)]
    mixed_keys = [_view(0, with_lvis=True), _view(1, with_lvis=False)]
    assert not views_compatible(mixed_res)
    assert not views_compatible(mixed_keys)
    with pytest.raises(ValueError, match="homogeneous"):
        DeviceViewStore(mixed_res)
    # the auto default must route heterogeneous data to the host path
    # (not crash): a short nfr_unit run trains through
    import dataclasses

    from vqnerf_release_tpu.train.loop import _make_batch_source
    cfg = dataclasses.replace(CFG, device_views="auto")
    _, store = _make_batch_source(mixed_keys, cfg, "contrast")
    assert store is None


@pytest.mark.parametrize("trainer", ["nfr_unit", "vq_nfr", "ref_nfr"])
def test_training_trajectory_identical(tmp_path, trainer, monkeypatch):
    # pin the numpy sampler so 'on' and 'off' share the rng stream
    monkeypatch.setenv("VQNERF_NATIVE_SAMPLER", "0")
    views = [_view(s, with_ref=(trainer == "ref_nfr")) for s in range(2)]
    vali = [_view(9, with_ref=(trainer == "ref_nfr"))]

    def run(mode, sub):
        dv, scan = {"off": ("off", False), "on": ("on", False),
                    "scan": ("on", True),
                    "shard": ("shard", True)}[mode]
        cfg = dataclasses.replace(CFG, device_views=dv, epoch_scan=scan)
        out = str(tmp_path / (trainer + "_" + sub))
        if trainer == "nfr_unit":
            params, hist = loop.train_nfr_unit(
                cfg, views, vali, out, resume=False)
        elif trainer == "vq_nfr":
            nfr_params, _ = loop.train_nfr_unit(
                cfg, views, vali, str(tmp_path / ("warm_" + sub)),
                epochs=1, resume=False)
            params, _, hist = loop.train_vq_nfr(
                cfg, nfr_params, views, vali, out, resume=False)
        else:
            nfr_params, _ = loop.train_nfr_unit(
                cfg, views, vali, str(tmp_path / ("warm_" + sub)),
                epochs=1, resume=False)
            vq_params, _, _ = loop.train_vq_nfr(
                cfg, nfr_params, views, vali,
                str(tmp_path / ("vq_" + sub)), epochs=1, resume=False)
            light = np.asarray(dc.get_light(vq_params))
            params, hist = loop.train_ref_nfr(
                cfg, vq_params, light, views, vali, out, resume=False)
        return params, hist

    p_off, h_off = run("off", "off")
    import jax
    # host per-step == store per-step == store epoch-scan (one
    # dispatch) == row-sharded store + collective gather
    for mode in ("on", "scan", "shard"):
        p_m, h_m = run(mode, mode)
        np.testing.assert_allclose(h_m, h_off, rtol=0, atol=0,
                                   err_msg=mode)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)), p_m, p_off)


@pytest.mark.parametrize("trainer", ["nfr_unit", "vq_nfr", "ref_nfr"])
def test_chunked_epoch_scan_trajectory_identical(tmp_path, trainer,
                                                 monkeypatch):
    """epoch_scan_chunk > 1 (several epochs per lax.scan dispatch) must
    reproduce the chunk=1 trajectory bit for bit — same host rng stream,
    same per-step key stream, chunks clipped at ckpt/vali boundaries
    (epochs=4 -> period 2 -> chunk sizes 2,2)."""
    monkeypatch.setenv("VQNERF_NATIVE_SAMPLER", "0")
    views = [_view(s, with_ref=(trainer == "ref_nfr")) for s in range(2)]
    vali = [_view(9, with_ref=(trainer == "ref_nfr"))]

    def run(chunk, sub):
        cfg = dataclasses.replace(
            CFG, device_views="on", epoch_scan=True,
            epoch_scan_chunk=chunk, epochs=4)
        out = str(tmp_path / (trainer + "_" + sub))
        if trainer == "nfr_unit":
            params, hist = loop.train_nfr_unit(
                cfg, views, vali, out, resume=False)
        elif trainer == "vq_nfr":
            nfr_params, _ = loop.train_nfr_unit(
                cfg, views, vali, str(tmp_path / ("warm_" + sub)),
                epochs=1, resume=False)
            params, _, hist = loop.train_vq_nfr(
                cfg, nfr_params, views, vali, out, resume=False)
        else:
            nfr_params, _ = loop.train_nfr_unit(
                cfg, views, vali, str(tmp_path / ("warm_" + sub)),
                epochs=1, resume=False)
            vq_params, _, _ = loop.train_vq_nfr(
                cfg, nfr_params, views, vali,
                str(tmp_path / ("vq_" + sub)), epochs=1, resume=False)
            light = np.asarray(dc.get_light(vq_params))
            params, hist = loop.train_ref_nfr(
                cfg, vq_params, light, views, vali, out, resume=False)
        return params, hist

    import jax
    p_1, h_1 = run(1, "c1")
    p_n, h_n = run(5, "c5")  # clipped to the period-2 boundaries
    assert len(h_n) == len(h_1) == 4
    np.testing.assert_allclose(h_n, h_1, rtol=0, atol=0)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), p_n, p_1)


def test_scan_chunk_auto_policy():
    """epoch_scan_chunk=None (the default) picks min(6, ckpt period);
    chunks clip at period boundaries so at most two scan lengths compile
    per period tiling. An explicit int (incl. --preset-override) wins."""
    run_epoch = object()  # any non-None sentinel
    # production cadence: 150 epochs -> period 30 -> chunk 6
    cfg = dataclasses.replace(CFG, epochs=150, epoch_scan_chunk=None)
    assert loop._resolve_scan_chunk(cfg, run_epoch) == 6
    # short runs: epochs=4 -> period 2 -> chunk 2; epochs=2 -> period 1
    assert loop._resolve_scan_chunk(
        dataclasses.replace(CFG, epochs=4, epoch_scan_chunk=None),
        run_epoch) == 2
    assert loop._resolve_scan_chunk(
        dataclasses.replace(CFG, epochs=2, epoch_scan_chunk=None),
        run_epoch) == 1
    # a period 6 does not divide still chunks (it must NOT fall back to
    # per-epoch dispatch): epochs=26 -> period 13 -> chunk 6, and the
    # plan per period is 6,6,1 — exactly two distinct scan lengths
    cfg26 = dataclasses.replace(CFG, epochs=26, epoch_scan_chunk=None)
    assert loop._resolve_scan_chunk(cfg26, run_epoch) == 6
    sched, e = [], 0
    while e < 26:
        n = loop._chunk_plan(e, 26, 13, 6)
        sched.append(n)
        e += n
    assert sched == [6, 6, 1, 6, 6, 1]
    assert len(set(sched)) == 2
    # explicit values win; no scan path -> always 1
    assert loop._resolve_scan_chunk(
        dataclasses.replace(CFG, epochs=150, epoch_scan_chunk=1),
        run_epoch) == 1
    assert loop._resolve_scan_chunk(cfg, None) == 1
    # the CLI override parses the Optional[int] field to an int
    from vqnerf_release_tpu.cli import _apply_preset_overrides
    cfg_o = _apply_preset_overrides(CFG, "epoch_scan_chunk=3")
    assert cfg_o.epoch_scan_chunk == 3
    assert loop._resolve_scan_chunk(cfg_o, run_epoch) == 3


def test_compressed_pix_staging_exact(monkeypatch):
    """_epoch_scan_xs stages the jitter-pair stream compressed (center
    i32 + neighbor code u8, 5 bytes/pair vs 8) and decodes ON DEVICE —
    the decoded [E, 2n] must equal the raw interleaved staging bit for
    bit, including the mesh path's zero-row padding (same rng stream,
    both jitter modes, multi-epoch)."""
    monkeypatch.setenv("VQNERF_NATIVE_SAMPLER", "0")
    views = [_view(s) for s in range(3)]
    store = DeviceViewStore(views, mesh=get_mesh())
    for jitter_mode in ("random", "contrast"):
        vi_c, pix_c, steps_c = loop._epoch_scan_xs(
            views, CFG, np.random.RandomState(3), jitter_mode, store,
            step0=5.0, n_epochs=2)
        # raw expectation: identical sampling, old-style staging
        rng = np.random.RandomState(3)
        jobs = [v for _ in range(2) for v in views]
        raw = np.stack([
            np.asarray(p) for p in loop.sample_view_pix_many(
                jobs, CFG.n_rays_per_step, rng,
                jitter_mode=jitter_mode)]).astype(np.int32)
        n_dev = get_mesh().devices.size
        if n_dev > 1:
            from vqnerf_release_tpu.parallel import pad_to_multiple
            raw, _ = pad_to_multiple(raw, n_dev, axis=1,
                                     pad_value=store.pad_index)
        np.testing.assert_array_equal(np.asarray(pix_c), raw,
                                      err_msg=jitter_mode)
        assert np.asarray(pix_c).dtype == np.int32
        np.testing.assert_array_equal(
            np.asarray(vi_c), np.tile(np.arange(3, dtype=np.int32), 2))
        np.testing.assert_array_equal(
            np.asarray(steps_c), 5.0 + np.arange(6, dtype=np.float32))


def test_encode_pairs_roundtrip_and_rejection():
    """_encode_pairs is the exact inverse of _pair_decoder for every
    neighbor code, and refuses (None) a jitter that is not one of the 8
    neighbor offsets so staging falls back to the raw path."""
    w = 12
    from vqnerf_release_tpu.data.sampler import _JITTERS
    centers = np.array([[13, 25, 37, 49, 61, 73, 85, 97]], np.int32)
    offs = np.array([dy * w + dx for dy, dx in _JITTERS], np.int32)
    pix = np.empty((1, 16), np.int32)
    pix[0, 0::2] = centers
    pix[0, 1::2] = centers + offs
    c, codes = loop._encode_pairs(pix, w)
    np.testing.assert_array_equal(c, centers)
    np.testing.assert_array_equal(codes[0], np.arange(8))
    dec = loop._pair_decoder(w, None)(c, codes)
    np.testing.assert_array_equal(np.asarray(dec), pix)
    # code 8 (padding) decodes to the identity offset
    pad = loop._pair_decoder(w, None)(
        np.full((1, 2), 120, np.int32), np.full((1, 2), 8, np.uint8))
    np.testing.assert_array_equal(np.asarray(pad),
                                  np.full((1, 4), 120, np.int32))
    # a non-neighbor jitter (offset +2) is rejected
    bad = pix.copy()
    bad[0, 1] = bad[0, 0] + 2
    assert loop._encode_pairs(bad, w) is None
