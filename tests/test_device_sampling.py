"""On-device jitter-pair sampling (DecompConfig.device_sampling): the
sampled pairs must satisfy the host sampler's selection contract
(interior centers, 8-neighborhood jitters, both alphas above threshold,
contrast mode's deterministic argmax jitter), be reproducible per key,
and train every phase with resume-identical trajectories."""

import dataclasses

import numpy as np
import pytest

from vqnerf_release_tpu.data.device_sampler import make_device_sampler
from vqnerf_release_tpu.data.device_store import DeviceViewStore
from vqnerf_release_tpu.data.sampler import _JITTERS
from vqnerf_release_tpu.models import decomp_common as dc
from vqnerf_release_tpu.train import loop

from tests.test_device_store import CFG, _view


def _sample(views, jitter_mode, n_rays=64, seed=0):
    import jax
    store = DeviceViewStore(views)
    v0 = views[0]
    fn = make_device_sampler(store, v0.h, v0.w, n_rays,
                             jitter_mode=jitter_mode)
    key = jax.random.PRNGKey(seed)
    return store, np.asarray(fn(store.arrays, np.int32(0), key)), key, fn


@pytest.mark.parametrize("jitter_mode", ["random", "contrast"])
def test_device_sampler_contract(jitter_mode):
    views = [_view(3)]
    v = views[0]
    h, w = v.h, v.w
    store, pix, key, fn = _sample(views, jitter_mode)
    assert pix.shape == (128,) and pix.dtype == np.int32
    c, j = pix[0::2], pix[1::2]
    ys, xs = c // w, c % w
    # interior centers
    assert (ys >= 1).all() and (ys <= h - 2).all()
    assert (xs >= 1).all() and (xs <= w - 2).all()
    # jitters are 8-neighborhood offsets
    offs = {dy * w + dx for dy, dx in _JITTERS}
    assert set((j - c).tolist()) <= offs
    # both alphas above threshold
    alpha = v.alpha.reshape(-1)
    assert (alpha[c] > 0.9).all() and (alpha[j] > 0.9).all()
    # reproducible per key
    pix2 = np.asarray(fn(store.arrays, np.int32(0), key))
    np.testing.assert_array_equal(pix, pix2)
    if jitter_mode == "contrast":
        # the jitter choice is the host sampler's deterministic argmax
        rgb = v.rgb.reshape(h, w, 3)
        for ci, ji in zip(c, j):
            y, x = divmod(int(ci), w)
            deltas = [np.max(np.abs(rgb[y + dy, x + dx] - rgb[y, x]))
                      for dy, dx in _JITTERS]
            dy, dx = _JITTERS[int(np.argmax(deltas))]
            assert int(ji) == (y + dy) * w + (x + dx)
        # the host-precomputed jitter table (views=...) must reproduce
        # the in-scan computation exactly
        import jax
        fn_pre = make_device_sampler(store, h, w, 64,
                                     jitter_mode="contrast",
                                     views=views)
        pix3 = np.asarray(fn_pre(store.arrays, np.int32(0), key))
        np.testing.assert_array_equal(pix, pix3)


def test_device_sampler_empty_view_pads():
    import jax
    v = _view(0)
    v.alpha[:] = 0.0
    v.pred_alpha[:] = 0.0
    store = DeviceViewStore([v])
    fn = make_device_sampler(store, v.h, v.w, 8)
    pix = np.asarray(fn(store.arrays, np.int32(0), jax.random.PRNGKey(0)))
    assert (pix == store.pad_index).all()


def test_device_sampler_pads_to_mesh_multiple():
    """2*n_rays not divisible by the mesh: the device sampler must pad
    with masked pad rows to the same length the host-staged path
    produces (2n + (-2n) % n_dev) so shapes/layout agree."""
    import jax

    from vqnerf_release_tpu.parallel import get_mesh
    mesh = get_mesh()
    if mesh.devices.size == 1:
        pytest.skip("needs a >1-device mesh")
    views = [_view(3)]
    store = DeviceViewStore(views, mesh=mesh)
    n_rays = 6  # 12 % 8 != 0 on the 8-device test mesh
    fn = make_device_sampler(store, views[0].h, views[0].w, n_rays)
    pix = np.asarray(fn(store.arrays, np.int32(0),
                        jax.random.PRNGKey(0)))
    n_dev = mesh.devices.size
    want = 2 * n_rays + (-2 * n_rays) % n_dev
    assert pix.shape == (want,)
    assert (pix[2 * n_rays:] == store.pad_index).all()
    alpha = views[0].alpha.reshape(-1)
    assert (alpha[pix[:2 * n_rays]] > 0.9).all()


def test_device_sampler_rejects_sharded_store():
    from vqnerf_release_tpu.parallel import get_mesh
    views = [_view(s) for s in range(2)]
    mesh = get_mesh()
    if mesh.devices.size == 1:
        pytest.skip("needs a >1-device mesh")
    store = DeviceViewStore(views, mesh=mesh, shard=True)
    with pytest.raises(ValueError, match="replicated"):
        make_device_sampler(store, views[0].h, views[0].w, 8)


@pytest.mark.parametrize("trainer", ["nfr_unit", "vq_nfr", "ref_nfr"])
def test_device_sampling_trains_and_resumes(tmp_path, trainer,
                                            monkeypatch):
    """Every phase trains under device_sampling, and a 2+2-epoch
    resumed run reproduces the straight 4-epoch run exactly for
    nfr_unit/ref_nfr — their only rng is the sampling stream, and
    fold_in(base_key, step) is resume-invariant by construction. The
    vq phase keeps its sequentially-split dropout key stream, which
    restarts on resume on EVERY path (host included; the reference
    reseeds per process the same way, train_nfr.py:92-97), so vq
    asserts same-seed reproducibility instead."""
    monkeypatch.setenv("VQNERF_NATIVE_SAMPLER", "0")
    import jax
    views = [_view(s, with_ref=(trainer == "ref_nfr")) for s in range(2)]
    vali = [_view(9, with_ref=(trainer == "ref_nfr"))]
    cfg = dataclasses.replace(CFG, device_views="on", epoch_scan=True,
                              device_sampling=True, epochs=4)

    # upstream phases computed ONCE and shared by every run(): rerunning
    # the vq phase into an existing dir reloads cluster_centers.npy
    # WITHOUT consuming the host rng the kmeans branch would (reference
    # behavior — train_nfr.py:210-227 reuses the cluster npy), which
    # shifts its sampling stream and the converged light constant
    cfg_host = dataclasses.replace(cfg, device_sampling=False)
    nfr_params = vq_params = light = None
    if trainer != "nfr_unit":
        nfr_params, _ = loop.train_nfr_unit(
            cfg_host, views, vali, str(tmp_path / "warm"),
            epochs=1, resume=False)
    if trainer == "ref_nfr":
        vq_params, _, _ = loop.train_vq_nfr(
            cfg_host, nfr_params, views, vali, str(tmp_path / "vq"),
            epochs=1, resume=False)
        light = np.asarray(dc.get_light(vq_params))

    def run(sub, epochs, resume):
        out = str(tmp_path / (trainer + "_" + sub))
        if trainer == "nfr_unit":
            return loop.train_nfr_unit(
                cfg, views, vali, out, epochs=epochs, resume=resume)[0], \
                out
        if trainer == "vq_nfr":
            # fresh per-sub dir: the vq resume path itself is covered
            # by test_device_store's trajectory tests
            return loop.train_vq_nfr(
                cfg, nfr_params, views, vali, out, epochs=epochs,
                resume=resume)[0], out
        return loop.train_ref_nfr(
            cfg, vq_params, light, views, vali, out, epochs=epochs,
            resume=resume)[0], out

    p_straight, _ = run("straight", 4, False)
    if trainer == "vq_nfr":
        p_again, _ = run("again", 4, False)
    else:
        run("again", 2, False)
        p_again, _ = run("again", 4, True)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), p_again, p_straight)


def test_device_sampling_falls_back_without_store(tmp_path, capsys,
                                                  monkeypatch):
    """device_sampling without an active store must warn and train on
    the host path instead of crashing."""
    monkeypatch.setenv("VQNERF_NATIVE_SAMPLER", "0")
    views = [_view(s) for s in range(2)]
    cfg = dataclasses.replace(CFG, device_views="off",
                              device_sampling=True, epochs=1)
    loop.train_nfr_unit(cfg, views, [_view(9)],
                        str(tmp_path / "o"), resume=False)
    assert "device_sampling requested but" in capsys.readouterr().err
