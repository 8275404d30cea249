import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqnerf_release_tpu.models import decomp_common as dc
from vqnerf_release_tpu.models.nfr_unit import (
    init_nfr_unit, nfr_unit_forward, nfr_unit_loss)
from vqnerf_release_tpu.models.ref_nfr import (
    init_ref_nfr, ref_fast_render, ref_nfr_forward, ref_nfr_loss)
from vqnerf_release_tpu.models.vq_nfr import (
    init_vq_nfr, vq_fast_embed, vq_fast_render, vq_nfr_forward, vq_nfr_loss,
    vq_test)

CFG = dc.DecompConfig(light_h=4, num_embed=6, num_drop=4, z_dim=32,
                      mlp_width=16, thres_str="0.1;0.2;0.3;0.4")
CFG_REAL = dc.DecompConfig(data_type="dtu", light_h=4, num_embed=6,
                           num_drop=4, z_dim=32, mlp_width=16,
                           thres_str="0.1;0.2;0.3;0.4")


def _batch(cfg, n=32, seed=0, with_ref=False):
    rs = np.random.RandomState(seed)
    alpha = np.ones((n, 1), np.float32)
    alpha[-4:] = 0.0  # some background rays
    b = {
        "rayo": np.tile(np.array([[0, 0, 3.0]], np.float32), (n, 1)),
        "rayd": rs.randn(n, 3).astype(np.float32),
        "rgb": rs.rand(n, 3).astype(np.float32),
        "alpha": alpha,
        "pred_alpha": alpha.copy(),
        "xyz": (rs.rand(n, 3).astype(np.float32) - 0.5),
        "normal": rs.randn(n, 3).astype(np.float32),
    }
    b["normal"] /= np.linalg.norm(b["normal"], axis=1, keepdims=True)
    if cfg.is_nerf:
        b["lvis"] = rs.rand(n, cfg.n_lights).astype(np.float32)
    if with_ref:
        b["ref"] = rs.rand(n, 3).astype(np.float32)
    return {k: jnp.asarray(v) for k, v in b.items()}


@pytest.mark.parametrize("cfg", [CFG, CFG_REAL], ids=["nerf", "dtu"])
def test_nfr_unit_forward_and_loss(cfg):
    params = init_nfr_unit(0, cfg)
    lxyz, lareas = dc.light_constants(cfg)
    batch = _batch(cfg)
    pred, aux = nfr_unit_forward(params, batch, cfg, lxyz, lareas,
                                 mode="vali")
    assert pred["rgb"].shape == (32, 3)
    assert pred["rough"].shape == (32, 1)
    # background rows zeroed
    np.testing.assert_allclose(np.asarray(pred["rgb"][-4:]), 0.0)
    assert np.isfinite(np.asarray(pred["rgb"])).all()
    assert (np.asarray(pred["rgb"]) >= 0).all()
    assert (np.asarray(pred["rgb"]) <= 1).all()
    loss, ld = nfr_unit_loss(aux, cfg)
    assert np.isfinite(float(loss))

    def f(p):
        _, aux = nfr_unit_forward(p, batch, cfg, lxyz, lareas)
        return nfr_unit_loss(aux, cfg)[0]

    g = jax.grad(f)(params)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))
    # the light must receive gradient (it is trainable, nfr_unit.py:320-327)
    assert np.abs(np.asarray(g["light"])).max() > 0


def _vq_setup(cfg, seed=0):
    nfr_params = init_nfr_unit(seed, cfg)
    centers = np.random.RandomState(seed).rand(
        cfg.num_embed, cfg.z_dim).astype(np.float32)
    params, ema = init_vq_nfr(seed, cfg, nfr_params, centers)
    lxyz, lareas = dc.light_constants(cfg)
    return params, ema, lxyz, lareas


@pytest.mark.parametrize("cfg", [CFG, CFG_REAL], ids=["nerf", "dtu"])
def test_vq_nfr_train_step_semantics(cfg):
    params, ema, lxyz, lareas = _vq_setup(cfg)
    batch = _batch(cfg)
    thres = jnp.asarray(cfg.train_thres())
    rng = jax.random.PRNGKey(0)

    pred, aux, new_ema = vq_nfr_forward(
        params, ema, batch, cfg, lxyz, lareas, mode="train", thres=thres,
        rng=rng)
    assert "codebook_update" in aux
    assert aux["codebook_update"].shape == (cfg.z_dim, cfg.num_embed)
    assert int(new_ema.counter) == 1
    # embed ids: fg in [1, K], bg == 0
    emb = np.asarray(pred["embed"])
    assert (emb[-4:] == 0).all()
    assert (emb[:-4] >= 1).all() and (emb[:-4] <= cfg.num_embed).all()

    loss, ld = vq_nfr_loss(params, aux, cfg, mode="train")
    assert np.isfinite(float(loss))
    for k in ("rgb", "vqrgb", "vqloss", "chromaticity", "chr_smooth",
              "sim_smooth", "lambert"):
        assert k in ld, k

    # grads flow to both decode paths + codebook (via commitment/sim)
    def f(p):
        _, aux2, _ = vq_nfr_forward(
            p, ema, batch, cfg, lxyz, lareas, mode="train", thres=thres,
            rng=rng)
        return vq_nfr_loss(p, aux2, cfg, mode="train")[0]

    g = jax.grad(f)(params)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))
    assert np.abs(np.asarray(g["diff_vq"][0]["w"])).max() > 0
    assert np.abs(np.asarray(g["diff_main"][0]["w"])).max() > 0


def test_vq_nfr_vali_loss():
    cfg = CFG
    params, ema, lxyz, lareas = _vq_setup(cfg)
    batch = _batch(cfg)
    _, aux, _ = vq_nfr_forward(
        params, ema, batch, cfg, lxyz, lareas, mode="vali")
    loss, ld = vq_nfr_loss(params, aux, cfg, mode="vali")
    assert set(ld) == {"rgb", "vqrgb", "chromaticity", "loss"}
    assert np.isfinite(float(loss))


def test_vq_codebook_unused_freeze():
    cfg = CFG
    params, ema, lxyz, lareas = _vq_setup(cfg)
    batch = _batch(cfg)
    # Drop all codes except code 3: only it can be used -> all others frozen
    thres = np.ones((cfg.num_embed,), np.float32)
    thres[3] = 0.0
    _, aux, _ = vq_nfr_forward(
        params, ema, batch, cfg, lxyz, lareas, mode="train",
        thres=jnp.asarray(thres), rng=jax.random.PRNGKey(1))
    update = np.asarray(aux["codebook_update"])
    cb = np.asarray(dc.get_codebook(params))
    unused = [i for i in range(cfg.num_embed) if i != 3]
    np.testing.assert_allclose(update[:, unused], cb[:, unused], atol=1e-6)
    assert np.abs(update[:, 3] - cb[:, 3]).max() > 1e-4


def test_vq_fast_render_relight_and_edit():
    cfg = CFG
    params, ema, lxyz, lareas = _vq_setup(cfg)
    batch = _batch(cfg)
    probes = jnp.asarray(
        np.random.RandomState(1).rand(5, cfg.n_lights, 3), jnp.float32)
    olat = jnp.asarray(
        np.random.RandomState(2).rand(4, cfg.n_lights, 3), jnp.float32)
    pred = vq_fast_render(
        params, batch, cfg, lxyz, lareas, novel_probes=probes,
        novel_olat=olat, opt_scale=jnp.asarray([1.1, 0.9, 1.0]),
        gen_embed=True, rng=jax.random.PRNGKey(0))
    assert pred["rgb_probes"].shape == (32, 5, 3)
    assert pred["rgb_olat"].shape == (32, 4, 3)
    assert "embed" in pred

    # Edit: paint fg albedo red inside a mask
    edit_mask = np.zeros((32, 1), np.float32)
    edit_mask[:8] = 1.0
    pred_e = vq_fast_render(
        params, batch, cfg, lxyz, lareas,
        edit_mask=jnp.asarray(edit_mask),
        edit_material={"diff": [1.0, 0.0, 0.0], "spec": [-1.0, 0, 0],
                       "rough": [-1.0]})
    np.testing.assert_allclose(
        np.asarray(pred_e["albedo"][:8]),
        np.tile([[1.0, 0.0, 0.0]], (8, 1)), atol=1e-6)
    # outside mask unchanged vs no-edit render
    pred_0 = vq_fast_render(params, batch, cfg, lxyz, lareas)
    np.testing.assert_allclose(
        np.asarray(pred_e["albedo"][8:]), np.asarray(pred_0["albedo"][8:]),
        atol=1e-6)


@pytest.mark.parametrize("base_cfg", [CFG, CFG_REAL], ids=["nerf", "dtu"])
def test_fast_render_fused_agreement(base_cfg):
    """use_fused_render=True must reproduce the jnp primary render in both
    fast_render paths (the flag routes pd_test/raw_test/edit/video renders
    through ops/pallas/render_kernel.py)."""
    import dataclasses

    cfg = base_cfg
    cfg_fused = dataclasses.replace(cfg, use_fused_render=True)
    params, ema, lxyz, lareas = _vq_setup(cfg)
    batch = _batch(cfg, n=40, with_ref=True)  # 40 % 128 != 0: pads

    a = vq_fast_render(params, batch, cfg, lxyz, lareas,
                       opt_scale=jnp.asarray([1.1, 0.9, 1.0]))
    b = vq_fast_render(params, batch, cfg_fused, lxyz, lareas,
                       opt_scale=jnp.asarray([1.1, 0.9, 1.0]))
    np.testing.assert_allclose(
        np.asarray(a["rgb"]), np.asarray(b["rgb"]), rtol=2e-4, atol=2e-5)

    rparams = init_ref_nfr(0, cfg, params, dc.get_light(params))
    ra = ref_fast_render(rparams, batch, cfg, lxyz, lareas)
    rb = ref_fast_render(rparams, batch, cfg_fused, lxyz, lareas)
    np.testing.assert_allclose(
        np.asarray(ra["rgb"]), np.asarray(rb["rgb"]), rtol=2e-4, atol=2e-5)


def test_vq_fast_embed_and_vq_test():
    cfg = CFG
    params, ema, lxyz, lareas = _vq_setup(cfg)
    batch = _batch(cfg)
    out = vq_fast_embed(params, batch, cfg)
    emb = np.asarray(out["embed"])
    assert emb.shape == (32,)
    assert (emb[-4:] == 0).all()

    for thres in cfg.val_thres_list():
        aux = vq_test(params, batch, cfg, lxyz, lareas,
                      thres=jnp.asarray(thres), rng=jax.random.PRNGKey(0))
        assert np.isfinite(np.asarray(aux["vq_rgb_linear"])).all()
    # all-dropped-but-first list entry uses fewest codes
    first = cfg.val_thres_list()[0]
    assert first.sum() == cfg.num_drop  # drops num_drop codes
    last = cfg.val_thres_list()[-1]
    assert last.sum() == 0  # keeps all


@pytest.mark.parametrize("cfg", [CFG, CFG_REAL], ids=["nerf", "dtu"])
def test_ref_nfr_freezes_encoder(cfg):
    params_vq, _, lxyz, lareas = _vq_setup(cfg)
    light = np.random.RandomState(0).rand(*cfg.light_res, 3).astype(
        np.float32)
    params = init_ref_nfr(0, cfg, params_vq, light)
    batch = _batch(cfg, with_ref=True)

    pred, aux = ref_nfr_forward(params, batch, cfg, lxyz, lareas,
                                mode="vali")
    assert np.isfinite(np.asarray(pred["rgb"])).all()
    loss, _ = ref_nfr_loss(aux, cfg)
    assert np.isfinite(float(loss))

    def f(p):
        _, aux2 = ref_nfr_forward(p, batch, cfg, lxyz, lareas)
        return ref_nfr_loss(aux2, cfg)[0]

    g = jax.grad(f)(params)
    # frozen subtree gets exactly zero gradient
    for leaf in jax.tree_util.tree_leaves(g["frozen"]):
        np.testing.assert_allclose(np.asarray(leaf), 0.0)
    # trainable branch gets signal
    assert np.abs(np.asarray(g["train"]["rgb_enc"][0]["w"])).max() > 0
    assert np.abs(np.asarray(g["train"]["diff_out"][0]["w"])).max() > 0


def test_ref_fast_render_scale_only_affects_relight():
    cfg = CFG
    params_vq, _, lxyz, lareas = _vq_setup(cfg)
    light = np.ones((*cfg.light_res, 3), np.float32)
    params = init_ref_nfr(0, cfg, params_vq, light)
    batch = _batch(cfg, with_ref=True)
    probes = jnp.asarray(
        np.random.RandomState(1).rand(3, cfg.n_lights, 3), jnp.float32)

    p1 = ref_fast_render(params, batch, cfg, lxyz, lareas,
                         novel_probes=probes)
    p2 = ref_fast_render(params, batch, cfg, lxyz, lareas,
                         novel_probes=probes,
                         opt_scale=jnp.asarray([2.0, 2.0, 2.0]))
    # raw recon identical (unscaled brdf, ref_nfr.py:357-370)
    np.testing.assert_allclose(
        np.asarray(p1["rgb"]), np.asarray(p2["rgb"]), atol=1e-6)
    # relight differs
    assert np.abs(
        np.asarray(p1["rgb_probes"]) - np.asarray(p2["rgb_probes"])
    ).max() > 1e-4


def test_shape_refine_model():
    from vqnerf_release_tpu.models.shape_refine import (
        init_shape_refine, shape_refine_forward, shape_refine_loss)
    cfg = CFG
    params = init_shape_refine(0, cfg)
    batch = _batch(cfg)
    pred = shape_refine_forward(params, batch, cfg)
    assert pred["normal"].shape == (32, 3)
    # fg normals unit, bg zero
    norms = np.linalg.norm(np.asarray(pred["normal"]), axis=1)
    assert np.allclose(norms[:-4], 1.0, atol=1e-4)
    assert np.allclose(norms[-4:], 0.0)
    loss = shape_refine_loss(pred, batch, cfg)
    assert np.isfinite(float(loss))

    def f(p):
        out = shape_refine_forward(p, batch, cfg)
        return shape_refine_loss(out, batch, cfg)

    g = jax.grad(f)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
