"""Model-level differential parity for the paper core (r2 VERDICT #1).

Builds the REAL reference ``vq_nfr.Model`` and ``ref_nfr.Model`` (keras,
from their own INIs, via tests.reference_shims) at tiny widths and runs
them side-by-side with ours through the full checkpoint round trip:

    reference nfr_unit ckpt tree
      -> reference vq_nfr.Model (restores that ckpt at init)
      -> tf.train.Checkpoint -> interop.tf_import.import_vq_nfr
      -> our vq_nfr_forward / vq_nfr_loss / vq_test / vq_fast_render /
         vq_fast_embed on the SAME weights
    reference vq_nfr ckpt tree
      -> reference ref_nfr.Model -> import_ref_nfr
      -> our ref_nfr_forward / ref_nfr_loss / ref_fast_render

Covered reference surface (all /root/reference/decomp/nerfvq_nfr3):
  * vq_nfr.Model.call train + vali            (models/vq_nfr.py:534-692)
  * compute_loss — every one of the seven train terms and the vali
    triple                                    (models/vq_nfr.py:876-986)
  * the EMA codebook update assigned during call (:580-583) and the
    assign-then-optimize ordering, via one exact SGD step over ALL
    trainable variables                       (train_nfr.py:562-576)
  * vq_test over the deterministic 0/1 drop vectors train_nfr builds
    (:196-199, 292-317) + the elbow block     (:322-334)
  * fast_render: probes relight, dst_env, opt_scale raw/vis_scale,
    edit_mask/edit_material, gen_embed        (models/vq_nfr.py:262-398)
  * fast_embed                                (models/vq_nfr.py:209-256)
  * ref_nfr.Model.call train + vali + compute_loss
    (models/ref_nfr.py:179-280, 584-610), fast_render raw-vs-scaled
    (:306-417), and one SGD step over the trainable (non-frozen) subset.

The batches keep background rows in ALIGNED PAIRS so the reference's
boolean_mask compaction preserves the jitter-pair structure that the
chroma-gated smoothness loss assumes (outer_sample emits fg-only pairs
in production; aligned-bg pairs additionally exercise our masking).
"""

import os
from os.path import join
from types import SimpleNamespace

import numpy as np
import pytest

import tests.reference_shims as rs

N_RAYS = 48  # rows 40..45 are background, in aligned pairs
NUM_EMBED = 6
NUM_DROP = 4
MLP_WIDTH = 16
Z_DIM = 256  # conv_width is hardcoded in nfr_unit._init_net (:114)
LIGHT_H = 16  # OLAT init hardcodes 16x32 indices (vq_nfr.py:96-102)
N_LIGHTS = LIGHT_H * 2 * LIGHT_H


def _tf():
    import tensorflow as tf
    return tf


def _make_batch_np(with_ref=False):
    rsr = np.random.RandomState(21)
    alpha = np.ones((N_RAYS, 1), np.float32)
    alpha[40:46] = 0.0
    normal = rsr.randn(N_RAYS, 3).astype(np.float32)
    normal /= np.linalg.norm(normal, axis=1, keepdims=True)
    batch = {
        "rayo": np.tile([[0.0, 0.0, 3.0]], (N_RAYS, 1)).astype(np.float32),
        "rayd": rsr.randn(N_RAYS, 3).astype(np.float32),
        "rgb": rsr.rand(N_RAYS, 3).astype(np.float32),
        "alpha": alpha,
        "pred_alpha": alpha.copy(),
        "xyz": (rsr.rand(N_RAYS, 3) - 0.5).astype(np.float32),
        "normal": normal,
        "lvis": rsr.rand(N_RAYS, N_LIGHTS).astype(np.float32),
    }
    if with_ref:
        batch["ref"] = rsr.rand(N_RAYS, 3).astype(np.float32)
    return batch


def _ref_tuple(tf, batch, with_ref=False):
    """The 'nerf' data_type batch tuple (vq_nfr.py:539-541 /
    ref_nfr.py:184-186)."""
    parts = [
        tf.constant(["v0"] * N_RAYS), tf.constant([[16, 16]] * N_RAYS),
        tf.constant(batch["rayo"]), tf.constant(batch["rayd"]),
        tf.constant(batch["rgb"]), tf.constant(batch["alpha"]),
        tf.constant(batch["pred_alpha"]), tf.constant(batch["xyz"]),
        tf.constant(batch["normal"]),
    ]
    if with_ref:
        parts.append(tf.constant(batch["ref"]))
    parts.append(tf.constant(batch["lvis"]))
    return tuple(parts)


def _write_ini(ini, path):
    with open(path, "w") as fh:
        ini.write(fh)


@pytest.fixture(scope="module")
def chain(tmp_path_factory):
    """nfr_unit ckpt tree + reference vq_nfr model + our imported params."""
    tf = _tf()
    import configparser

    import cv2
    import jax.numpy as jnp

    from vqnerf_release_tpu.config import decomp_config_from_ini
    from vqnerf_release_tpu.interop.tf_import import import_vq_nfr
    from vqnerf_release_tpu.models import decomp_common as dc

    root = tmp_path_factory.mktemp("refchain")
    env_dir = root / "envs"
    env_dir.mkdir()
    env = np.random.RandomState(0).rand(
        LIGHT_H, 2 * LIGHT_H, 3).astype(np.float32)
    cv2.imwrite(str(env_dir / "city.hdr"), env)

    # ---- nfr_unit stage (checkpoint the vq model restores at init) ----
    nfr_mod = rs.import_ref_decomp("models.nfr_unit")
    nfr_parent = root / "nfr_unit"
    nfr_root = nfr_parent / "lr5e-4"
    (nfr_root / "checkpoints").mkdir(parents=True)

    ini_nfr = configparser.ConfigParser()
    ini_nfr.read(f"{rs.REF_DECOMP}/nerfactor/config/nfr_unit.ini")
    for k, v in (("data_type", "nerf"), ("light_h", str(LIGHT_H)),
                 ("mlp_width", str(MLP_WIDTH)), ("imh", "16"),
                 ("test_envmap_dir", str(env_dir))):
        ini_nfr["DEFAULT"][k] = v
    _write_ini(ini_nfr, str(nfr_parent / "lr5e-4.ini"))

    batch_np = _make_batch_np()
    tf.random.set_seed(0)
    model_nfr = nfr_mod.Model(ini_nfr)
    model_nfr.register_trainable()
    model_nfr(_ref_tuple(tf, batch_np), mode="vali")  # creates _light
    tf.train.Checkpoint(net=model_nfr).save(
        str(nfr_root / "checkpoints" / "ckpt"))
    nfr_ckpt = str(nfr_root / "checkpoints" / "ckpt-1")
    vis_dir = nfr_root / "vis_vali" / "epoch000000150"
    vis_dir.mkdir(parents=True)
    np.save(str(vis_dir / "np_light.npy"),
            np.abs(np.asarray(model_nfr.light)))

    # ---- vq_nfr stage ----
    vq_mod = rs.import_ref_decomp("models.vq_nfr")
    vq_parent = root / "vq_nfr"
    vq_root = vq_parent / "lr5e-4"
    (vq_root / "checkpoints").mkdir(parents=True)

    # Well-separated centers with DISTINCT pairwise distances: random
    # uniform centers in 256-D are nearly equidistant, so nearest-code
    # and closest-pair argmins tie within fp noise and TF-vs-JAX
    # rounding flips them — the separation below keeps every argmin
    # decision outside the fp-noise band
    rsr = np.random.RandomState(1)
    cluster = 0.05 + 0.02 * np.arange(NUM_EMBED, dtype=np.float32)[
        :, None] * np.ones((NUM_EMBED, Z_DIM), np.float32)
    blk = Z_DIM // NUM_EMBED
    for i in range(NUM_EMBED):
        cluster[i, i * blk:(i + 1) * blk] = 0.9 - 0.07 * i
    cluster += 0.01 * rsr.rand(NUM_EMBED, Z_DIM).astype(np.float32)
    np.save(str(root / "cluster.npy"), cluster)

    ini_vq = configparser.ConfigParser()
    ini_vq.read(f"{rs.REF_DECOMP}/nerfactor/config/vq_nfr.ini")
    for k, v in (("data_type", "nerf"), ("light_h", str(LIGHT_H)),
                 ("mlp_width", str(MLP_WIDTH)), ("imh", "16"),
                 ("test_envmap_dir", str(env_dir)),
                 ("nfr_model_ckpt", nfr_ckpt),
                 ("cluster_center_path", str(root / "cluster.npy")),
                 ("num_embed", str(NUM_EMBED)),
                 ("num_drop", str(NUM_DROP)),
                 ("thres_str", "0.1;0.2;0.3;0.4")):
        ini_vq["DEFAULT"][k] = v
    vq_ini_path = str(vq_parent / "lr5e-4.ini")
    _write_ini(ini_vq, vq_ini_path)

    tf.random.set_seed(0)
    model_vq = vq_mod.Model(ini_vq)
    model_vq.register_trainable()
    # vali call creates the lazy _light/_codebook variables WITHOUT the
    # training-mode EMA assign, so the checkpoint holds the pristine state
    model_vq(_ref_tuple(tf, batch_np), mode="vali")
    tf.train.Checkpoint(net=model_vq).save(
        str(vq_root / "checkpoints" / "ckpt"))
    vq_ckpt = str(vq_root / "checkpoints" / "ckpt-1")
    # light dump tree the ref_nfr phase reads (ref_nfr.py:78-90: an epoch
    # dir containing a SUBDIRECTORY with np_light.npy)
    vq_vis = vq_root / "vis_vali" / "epoch000000150" / "batch000000000"
    vq_vis.mkdir(parents=True)
    np.save(str(vq_vis / "np_light.npy"), np.asarray(model_vq._light))

    # ---- our side: INI -> config, checkpoint -> params ----
    cfg, _ = decomp_config_from_ini(vq_ini_path)
    params, ema, _ = import_vq_nfr(str(vq_root), cfg)
    lxyz, lareas = dc.light_constants(cfg)

    jbatch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    fg = int(batch_np["alpha"].sum())

    def _all_vars():
        # keras Model.variables does NOT enumerate raw tf.Module
        # attributes like the sonnet EMA layers — include them
        # explicitly or restore() leaks EMA counter/hidden state
        # between tests
        ema_vars = []
        for m in (model_vq.vq_layer.ema_cluster_size,
                  model_vq.vq_layer.ema_dw):
            ema_vars += [m._counter, m._hidden, m.average]
        # keras 3 also drops raw tf.Variable attributes (_light,
        # _codebook — trainable in the reference's TF-2.x keras) from
        # Model.variables; include them so restore() is complete
        ema_vars += [model_vq._light, model_vq._codebook]
        seen = {id(v) for v in model_vq.variables}
        return list(model_vq.variables) + [
            v for v in ema_vars if id(v) not in seen]

    def snapshot():
        return [(v, v.numpy()) for v in _all_vars()]

    def restore(snap):
        for v, val in snap:
            v.assign(val)

    return SimpleNamespace(
        tf=tf, root=root, env_dir=env_dir, model_vq=model_vq,
        model_nfr=model_nfr, nfr_root=nfr_root,
        vq_root=vq_root, vq_ckpt=vq_ckpt, vq_ini_path=vq_ini_path,
        batch_np=batch_np, jbatch=jbatch, fg=fg, cfg=cfg, params=params,
        ema=ema, lxyz=lxyz, lareas=lareas, snapshot=snapshot,
        restore=restore)


def test_nfr_unit_loss_parity(chain):
    """nfr_unit compute_loss (plain linear-space MSE, nfr_unit.py) on
    shared imported weights — completes the three-model loss triple."""
    import jax.numpy as jnp

    from vqnerf_release_tpu.interop.tf_import import import_nfr_unit
    from vqnerf_release_tpu.models.nfr_unit import (nfr_unit_forward,
                                                    nfr_unit_loss)

    tf = chain.tf
    pred_ref, gt_ref, kw_ref, _ = chain.model_nfr(
        _ref_tuple(tf, chain.batch_np), mode="train")
    kw_ref["keep_batch"] = True
    per_ray_ref, ld_ref = chain.model_nfr.compute_loss(pred_ref, gt_ref,
                                                       **kw_ref)

    params, cfg = import_nfr_unit(str(chain.nfr_root))
    from vqnerf_release_tpu.models import decomp_common as dc
    lxyz, lareas = dc.light_constants(cfg)
    _, aux = nfr_unit_forward(params, chain.jbatch, cfg, lxyz, lareas,
                              mode="train")
    loss, _ = nfr_unit_loss(aux, cfg, mode="train")
    _cmp(loss, float(tf.reduce_mean(ld_ref["rgb"])), "nfr_unit loss",
         rtol=5e-4, atol=1e-6)


def _cmp(ours, theirs, name, rtol=2e-4, atol=3e-5):
    got = np.asarray(ours)
    want = np.asarray(theirs).reshape(got.shape)
    np.testing.assert_allclose(got, want, rtol=rtol, atol=atol,
                               err_msg=name)


def _cmp_loss_dicts(tf, ld_ref, ld_ours, keys):
    """Reference loss_dict entries are per-fg-ray vectors (scalars
    broadcast); their mean over fg rays equals our masked-mean scalars."""
    for k in keys:
        _cmp(ld_ours[k], float(tf.reduce_mean(ld_ref[k])),
             f"loss[{k}]", rtol=5e-4, atol=1e-5)


def test_vq_nfr_vali_forward_and_loss_parity(chain):
    from vqnerf_release_tpu.models.vq_nfr import vq_nfr_forward, vq_nfr_loss

    tf = chain.tf
    pred_ref, gt_ref, kw_ref, _ = chain.model_vq(
        _ref_tuple(tf, chain.batch_np), mode="vali")
    kw_ref["keep_batch"] = True
    _, ld_ref = chain.model_vq.compute_loss(pred_ref, gt_ref, **kw_ref)

    pred, aux, _ = vq_nfr_forward(
        chain.params, chain.ema, chain.jbatch, chain.cfg, chain.lxyz,
        chain.lareas, mode="vali")
    _, ld = vq_nfr_loss(chain.params, aux, chain.cfg, mode="vali")

    for key in ("rgb", "normal", "albedo", "spec", "rough", "ks",
                "rgb_diff", "rgb_spec", "vq_rgb", "vq_albedo", "vq_spec",
                "vq_rough"):
        _cmp(pred[key], pred_ref[key], key)
    np.testing.assert_array_equal(
        np.asarray(pred["embed"]),
        pred_ref["embed"].numpy().reshape(-1), err_msg="embed")
    _cmp_loss_dicts(tf, ld_ref, ld, ("rgb", "vqrgb", "chromaticity"))


def test_vq_nfr_train_call_update_and_all_loss_terms(chain):
    from vqnerf_release_tpu.models.vq_nfr import vq_nfr_forward, vq_nfr_loss

    tf = chain.tf
    snap = chain.snapshot()
    try:
        pred_ref, gt_ref, kw_ref, _ = chain.model_vq(
            _ref_tuple(tf, chain.batch_np), mode="train")
        # the call just assigned the EMA update into _codebook (:580-583)
        cb_after_ref = chain.model_vq._codebook.numpy()
        kw_ref["keep_batch"] = True
        _, ld_ref = chain.model_vq.compute_loss(pred_ref, gt_ref, **kw_ref)

        pred, aux, new_ema = vq_nfr_forward(
            chain.params, chain.ema, chain.jbatch, chain.cfg, chain.lxyz,
            chain.lareas, mode="train")
        loss, ld = vq_nfr_loss(chain.params, aux, chain.cfg, mode="train")

        for key in ("rgb", "normal", "albedo", "spec", "rough", "ks"):
            _cmp(pred[key], pred_ref[key], key)
        _cmp(aux["codebook_update"], cb_after_ref, "codebook_update",
             rtol=1e-4, atol=1e-5)
        # the sonnet EMA internals drive future updates — match them too
        layer = chain.model_vq.vq_layer
        _cmp(new_ema.hidden_cluster_size,
             layer.ema_cluster_size._hidden.numpy(), "ema_cs_hidden")
        _cmp(new_ema.hidden_dw, layer.ema_dw._hidden.numpy(),
             "ema_dw_hidden", rtol=1e-4, atol=1e-5)
        _cmp_loss_dicts(
            tf, ld_ref, ld,
            ("rgb", "vqrgb", "vqloss", "chromaticity", "chr_smooth",
             "sim_smooth", "lambert", "loss"))
    finally:
        chain.restore(snap)


def test_vq_nfr_one_sgd_step_parity(chain, tmp_path):
    """One exact optimizer step over EVERY trainable variable: reference
    train_iter semantics (tape -> compute_average_loss -> SGD) against
    our grads + the assign-then-optimize codebook ordering, compared
    through a second checkpoint import."""
    import jax
    import jax.numpy as jnp

    from vqnerf_release_tpu.interop.tf_import import import_vq_nfr
    from vqnerf_release_tpu.models.vq_nfr import vq_nfr_forward, vq_nfr_loss

    tf = chain.tf
    lr = 0.05
    snap = chain.snapshot()
    try:
        with tf.GradientTape() as tape:
            pred_ref, gt_ref, kw_ref, _ = chain.model_vq(
                _ref_tuple(tf, chain.batch_np), mode="train")
            kw_ref["keep_batch"] = True
            per_ray, _ = chain.model_vq.compute_loss(
                pred_ref, gt_ref, **kw_ref)
            wl = tf.nn.compute_average_loss(
                per_ray, global_batch_size=chain.fg)
        tvars = chain.model_vq.trainable_variables
        grads = tape.gradient(wl, tvars)
        assert all(g is not None for g in grads), [
            v.name for v, g in zip(tvars, grads) if g is None]
        tf.keras.optimizers.SGD(lr).apply_gradients(zip(grads, tvars))

        after_dir = tmp_path / "after"
        (after_dir / "checkpoints").mkdir(parents=True)
        tf.train.Checkpoint(net=chain.model_vq).save(
            str(after_dir / "checkpoints" / "ckpt"))
        ref_after, _, _ = import_vq_nfr(str(after_dir), chain.cfg)

        def loss_fn(p):
            _, aux, _ = vq_nfr_forward(
                p, chain.ema, chain.jbatch, chain.cfg, chain.lxyz,
                chain.lareas, mode="train")
            loss, _ = vq_nfr_loss(p, aux, chain.cfg, mode="train")
            return loss, aux["codebook_update"]

        (_, cb_update), our_grads = jax.value_and_grad(
            loss_fn, has_aux=True)(chain.params)
        stepped = jax.tree_util.tree_map(
            lambda p, g: p - lr * g, chain.params, our_grads)
        # reference order: EMA assign during call, SGD delta on top
        stepped["codebook"] = cb_update - lr * our_grads["codebook"]

        flat_ours = jax.tree_util.tree_flatten_with_path(stepped)[0]
        flat_ref = dict(jax.tree_util.tree_flatten_with_path(ref_after)[0])
        ref_paths = {jax.tree_util.keystr(p) for p in
                     (k for k, _ in flat_ref.items())}
        assert {jax.tree_util.keystr(p) for p, _ in flat_ours} == ref_paths
        # atol: zero-init head biases sit exactly at the relu boundary,
        # where TF-vs-JAX fp noise flips a unit's gate and toggles its
        # full gradient (~lr * 2e-3); rtol still pins every weight with
        # a pre-activation away from zero
        for path, leaf in flat_ours:
            _cmp(leaf, flat_ref[path], jax.tree_util.keystr(path),
                 rtol=5e-4, atol=2.5e-4)
    finally:
        chain.restore(snap)


def test_vq_test_sweep_and_elbow_parity(chain):
    """The dropout sweep train_nfr runs every vali period, over its exact
    deterministic 0/1 threshold vectors, plus the elbow selection."""
    import jax
    import jax.numpy as jnp

    from vqnerf_release_tpu.models.vq_nfr import vq_test
    from vqnerf_release_tpu.ops.colorspace import linear2srgb, srgb2linear
    from vqnerf_release_tpu.ops.math import rgb2chromaticity
    from vqnerf_release_tpu.train.loop import elbow_select

    tf = chain.tf
    # train_nfr.py:196-199
    val_thres_list = [
        np.array([0.0] * (NUM_EMBED - i) + [1.0] * i, np.float32)
        for i in range(NUM_DROP + 1)]
    val_thres_list.reverse()

    ref_scores, our_scores = [], []
    for thres in val_thres_list:
        pred_ref, gt_ref, kw_ref, _ = chain.model_vq.vq_test(
            _ref_tuple(tf, chain.batch_np), mode="vali", thres=thres)
        kw_ref["keep_batch"] = True
        _, ld_ref = chain.model_vq.compute_loss(pred_ref, gt_ref, **kw_ref)
        ref_scores.append((float(tf.reduce_mean(ld_ref["vqrgb"])),
                           float(tf.reduce_mean(ld_ref["chromaticity"]))))

        aux = vq_test(chain.params, chain.jbatch, chain.cfg, chain.lxyz,
                      chain.lareas, thres=jnp.asarray(thres),
                      rng=jax.random.PRNGKey(0))
        mask, gt, vq_rgb = aux["mask"], aux["rgb_gt"], aux["vq_rgb_linear"]
        linear_gt = srgb2linear(gt)
        vq_srgb = linear2srgb(vq_rgb)
        denom = float(jnp.maximum(jnp.sum(mask), 1.0))
        vqrgb = float(jnp.sum(
            jnp.mean((gt - vq_srgb) ** 2, axis=-1) * mask)) / denom
        chrom = float(jnp.sum(jnp.mean(
            (rgb2chromaticity(linear_gt)
             - rgb2chromaticity(vq_rgb)) ** 2, axis=-1) * mask)) / denom
        our_scores.append((vqrgb, chrom))

    # Under heavy dropout a few rays sit near-equidistant between the
    # surviving codes, and TF-vs-JAX fp noise flips their assignment —
    # the score means then differ at the 1e-3 level. The sweep must
    # still track closely AND produce the same elbow decision.
    np.testing.assert_allclose(our_scores, ref_scores, rtol=5e-3,
                               atol=1e-3)

    # elbow (train_nfr.py:322-334), transcribed verbatim, over a grid of
    # synthetic drop-loss vectors + the real sweep above
    def ref_elbow(drop_losses, main_thres):
        best_flag = False
        main_vq = None
        for i in range(1, len(drop_losses) - 1):
            if drop_losses[i - 1] > drop_losses[i]:
                best_flag = True
                for j in range(i + 1, len(drop_losses)):
                    if drop_losses[i] - drop_losses[j] > main_thres:
                        best_flag = False
                        break
            else:
                best_flag = False
            if best_flag:
                main_vq = i
                break
        if not best_flag:
            main_vq = len(drop_losses) - 1
        return main_vq

    rsr = np.random.RandomState(3)
    vectors = [np.array([c for _, c in our_scores])] + [
        rsr.rand(NUM_DROP + 1) for _ in range(200)]
    for v in vectors:
        for bt in (0.002, 0.05, 0.5):
            assert elbow_select(list(v), bt) == ref_elbow(v, bt), (v, bt)
    # and the real sweep makes the SAME k choice on both sides
    ours_k = elbow_select([c for _, c in our_scores], 0.002)
    refs_k = ref_elbow(np.array([c for _, c in ref_scores]), 0.002)
    assert ours_k == refs_k


def test_vq_fast_render_parity(chain):
    from vqnerf_release_tpu.models.vq_nfr import vq_fast_render

    tf = chain.tf
    import jax.numpy as jnp

    probes = np.stack([v.numpy().reshape(-1, 3)
                       for v in chain.model_vq.novel_probes.values()])
    dst_env_np = chain.model_vq.novel_probes["city"].numpy().reshape(-1, 3)
    opt_scale = np.array([1.2, 0.9, 1.1], np.float32)
    thres = np.array([0.0, 1.0, 0.0, 1.0, 0.0, 0.0], np.float32)

    # A: probes relight + dst_env primary + opt_scale + gen_embed
    pred_ref, _, _, _ = chain.model_vq.fast_render(
        _ref_tuple(tf, chain.batch_np), mode="vali", relight_probes=True,
        opt_scale=tf.constant(opt_scale), dst_env="city", gen_embed=True,
        thres=thres)
    import jax
    pred = vq_fast_render(
        chain.params, chain.jbatch, chain.cfg, chain.lxyz, chain.lareas,
        novel_probes=jnp.asarray(probes), opt_scale=jnp.asarray(opt_scale),
        dst_env=jnp.asarray(dst_env_np), gen_embed=True,
        thres=jnp.asarray(thres), rng=jax.random.PRNGKey(0))
    for key in ("basecolor", "albedo", "spec", "rough", "rgb",
                "rgb_probes"):
        _cmp(pred[key], pred_ref[key], f"A:{key}")
    np.testing.assert_array_equal(
        np.asarray(pred["embed"]),
        pred_ref["embed"].numpy().reshape(-1), err_msg="A:embed")

    # B: vis_scale (pd_test pass semantics: render unscaled, emit
    # sRGB-then-scaled basecolor/spec maps)
    pred_ref, _, _, _ = chain.model_vq.fast_render(
        _ref_tuple(tf, chain.batch_np), mode="vali",
        opt_scale=tf.constant(opt_scale), vis_scale=True, dst_env="city")
    pred = vq_fast_render(
        chain.params, chain.jbatch, chain.cfg, chain.lxyz, chain.lareas,
        opt_scale=jnp.asarray(opt_scale), vis_scale=True,
        dst_env=jnp.asarray(dst_env_np))
    for key in ("basecolor", "spec", "rough", "rgb"):
        _cmp(pred[key], pred_ref[key], f"B:{key}")

    # C: material edit (diff+rough replaced, spec kept via negative
    # first channel — the edit-server flow, vq_nfr.py:324-330)
    edit_mask = np.zeros((N_RAYS, 1), np.float32)
    edit_mask[5:20] = 1.0
    material = {"diff": [0.8, 0.1, 0.1], "spec": [-1.0, 0.0, 0.0],
                "rough": [0.3]}
    pred_ref, _, _, _ = chain.model_vq.fast_render(
        _ref_tuple(tf, chain.batch_np), mode="vali",
        edit_mask=tf.constant(edit_mask), edit_material=material,
        dst_env="city")
    pred = vq_fast_render(
        chain.params, chain.jbatch, chain.cfg, chain.lxyz, chain.lareas,
        edit_mask=jnp.asarray(edit_mask), edit_material=material,
        dst_env=jnp.asarray(dst_env_np))
    for key in ("albedo", "spec", "rough", "rgb"):
        _cmp(pred[key], pred_ref[key], f"C:{key}")


def test_vq_fast_embed_parity(chain):
    import jax.numpy as jnp

    from vqnerf_release_tpu.models.vq_nfr import vq_fast_embed

    tf = chain.tf
    import jax
    thres = np.array([0.0, 0.0, 1.0, 1.0, 1.0, 0.0], np.float32)
    _, _, _, vis_ref = chain.model_vq.fast_embed(
        _ref_tuple(tf, chain.batch_np), mode="vali", thres=thres,
        ref_batch=False)
    out = vq_fast_embed(chain.params, chain.jbatch, chain.cfg,
                        thres=jnp.asarray(thres), rng=jax.random.PRNGKey(0))
    np.testing.assert_array_equal(
        np.asarray(out["embed"]),
        vis_ref["embed"].numpy().reshape(-1), err_msg="embed")


@pytest.fixture(scope="module")
def ref_chain(chain, tmp_path_factory):
    """Reference ref_nfr.Model built on the vq checkpoint tree."""
    tf = chain.tf
    import configparser

    import jax.numpy as jnp

    from vqnerf_release_tpu.interop.tf_import import import_ref_nfr

    ref_mod = rs.import_ref_decomp("models.ref_nfr")
    root = chain.root
    ref_parent = root / "ref_nfr"
    ref_root = ref_parent / "lr5e-4"
    (ref_root / "checkpoints").mkdir(parents=True)

    ini_ref = configparser.ConfigParser()
    ini_ref.read(f"{rs.REF_DECOMP}/nerfactor/config/ref_nfr.ini")
    for k, v in (("data_type", "nerf"), ("light_h", str(LIGHT_H)),
                 ("mlp_width", str(MLP_WIDTH)), ("imh", "16"),
                 ("test_envmap_dir", str(chain.env_dir)),
                 ("nfr_model_ckpt", chain.vq_ckpt)):
        ini_ref["DEFAULT"][k] = v
    _write_ini(ini_ref, str(ref_parent / "lr5e-4.ini"))

    tf.random.set_seed(0)
    model_ref = ref_mod.Model(ini_ref)
    model_ref.register_trainable()
    batch_np = _make_batch_np(with_ref=True)
    model_ref(_ref_tuple(tf, batch_np, with_ref=True), mode="vali")
    tf.train.Checkpoint(net=model_ref).save(
        str(ref_root / "checkpoints" / "ckpt"))

    params, cfg = import_ref_nfr(str(ref_root), str(chain.vq_root))
    jbatch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    from vqnerf_release_tpu.models import decomp_common as dc
    lxyz, lareas = dc.light_constants(cfg)
    return SimpleNamespace(
        tf=tf, model_ref=model_ref, ref_root=ref_root, batch_np=batch_np,
        jbatch=jbatch, fg=int(batch_np["alpha"].sum()), params=params,
        cfg=cfg, lxyz=lxyz, lareas=lareas)


def test_ref_nfr_forward_and_loss_parity(ref_chain):
    from vqnerf_release_tpu.models.ref_nfr import (ref_nfr_forward,
                                                   ref_nfr_loss)

    tf = ref_chain.tf
    c = ref_chain

    # the converged light the reference loaded from the vq vis_vali tree
    # must equal what the importer reconstructed from the vq checkpoint
    _cmp(c.params["frozen"]["light"],
         np.asarray(c.model_ref.light).reshape(LIGHT_H, 2 * LIGHT_H, 3),
         "frozen light")

    # vali: compute_loss returns ONLY the per-ray loss (ref_nfr.py:605)
    pred_ref, gt_ref, kw_ref, _ = c.model_ref(
        _ref_tuple(tf, c.batch_np, with_ref=True), mode="vali")
    kw_ref["keep_batch"] = True
    per_ray_ref = c.model_ref.compute_loss(pred_ref, gt_ref, **kw_ref)

    pred, aux = ref_nfr_forward(c.params, c.jbatch, c.cfg, c.lxyz,
                                c.lareas, mode="vali")
    loss, _ = ref_nfr_loss(aux, c.cfg, mode="vali")

    for key in ("rgb", "normal", "albedo", "basecolor", "spec", "rough",
                "ks", "rgb_diff", "rgb_spec"):
        _cmp(pred[key], pred_ref[key], key)
    _cmp(loss, float(tf.reduce_mean(per_ray_ref)), "vali loss",
         rtol=5e-4, atol=1e-6)

    # train loss (plain linear-space MSE)
    pred_ref, gt_ref, kw_ref, _ = c.model_ref(
        _ref_tuple(tf, c.batch_np, with_ref=True), mode="train")
    kw_ref["keep_batch"] = True
    per_ray_ref, ld_ref = c.model_ref.compute_loss(pred_ref, gt_ref,
                                                   **kw_ref)
    _, aux = ref_nfr_forward(c.params, c.jbatch, c.cfg, c.lxyz, c.lareas,
                             mode="train")
    loss, _ = ref_nfr_loss(aux, c.cfg, mode="train")
    _cmp(loss, float(tf.reduce_mean(ld_ref["rgb"])), "train loss",
         rtol=5e-4, atol=1e-6)


def test_ref_nfr_fast_render_parity(ref_chain):
    import jax.numpy as jnp

    from vqnerf_release_tpu.models.ref_nfr import ref_fast_render

    tf = ref_chain.tf
    c = ref_chain
    probes = np.stack([v.numpy().reshape(-1, 3)
                       for v in c.model_ref.novel_probes.values()])
    opt_scale = np.array([0.8, 1.3, 1.0], np.float32)

    # raw recon from the UNSCALED brdf; probes from the scaled one
    # (ref_nfr.py:357-374)
    pred_ref, _, _, _ = c.model_ref.fast_render(
        _ref_tuple(tf, c.batch_np, with_ref=True), mode="vali",
        relight_probes=True, opt_scale=tf.constant(opt_scale))
    pred = ref_fast_render(
        c.params, c.jbatch, c.cfg, c.lxyz, c.lareas,
        opt_scale=jnp.asarray(opt_scale), novel_probes=jnp.asarray(probes))
    _cmp(pred["rgb"], pred_ref["rgb"], "raw rgb")
    _cmp(pred["rgb_probes"], pred_ref["rgb_probes"], "rgb_probes")


def test_ref_nfr_one_sgd_step_parity(ref_chain, tmp_path):
    """The frozen/train split under one exact SGD step: only
    rgb_enc/diff_out/rough_out move (ref_nfr.py:141-153), and their new
    values match our gradient step on params['train']."""
    import jax

    from vqnerf_release_tpu.interop.tf_import import import_ref_nfr
    from vqnerf_release_tpu.models.ref_nfr import (ref_nfr_forward,
                                                   ref_nfr_loss)

    tf = ref_chain.tf
    c = ref_chain
    lr = 0.05
    tvars = c.model_ref.trainable_variables
    # the borrowed vq nets are frozen: 3 nets x 3 layers x (w, b)
    assert len(tvars) == 18, [v.name for v in tvars]
    snap = [v.numpy() for v in tvars]
    try:
        with tf.GradientTape() as tape:
            pred_ref, gt_ref, kw_ref, _ = c.model_ref(
                _ref_tuple(tf, c.batch_np, with_ref=True), mode="train")
            kw_ref["keep_batch"] = True
            per_ray, _ = c.model_ref.compute_loss(pred_ref, gt_ref,
                                                  **kw_ref)
            wl = tf.nn.compute_average_loss(per_ray,
                                            global_batch_size=c.fg)
        grads = tape.gradient(wl, tvars)
        assert all(g is not None for g in grads)
        tf.keras.optimizers.SGD(lr).apply_gradients(zip(grads, tvars))

        after = tmp_path / "after"
        (after / "checkpoints").mkdir(parents=True)
        tf.train.Checkpoint(net=c.model_ref).save(
            str(after / "checkpoints" / "ckpt"))
        ref_after, _ = import_ref_nfr(str(after), str(
            os.path.dirname(os.path.dirname(c.model_ref.vqnfr_ckpt))))

        def loss_fn(train_params):
            params = {"frozen": c.params["frozen"], "train": train_params}
            _, aux = ref_nfr_forward(params, c.jbatch, c.cfg, c.lxyz,
                                     c.lareas, mode="train")
            loss, _ = ref_nfr_loss(aux, c.cfg, mode="train")
            return loss

        our_grads = jax.grad(loss_fn)(c.params["train"])
        stepped = jax.tree_util.tree_map(
            lambda p, g: p - lr * g, c.params["train"], our_grads)
        flat_ours = jax.tree_util.tree_flatten_with_path(stepped)[0]
        flat_ref = {jax.tree_util.keystr(p): v for p, v in
                    jax.tree_util.tree_flatten_with_path(
                        ref_after["train"])[0]}
        for path, leaf in flat_ours:
            _cmp(leaf, flat_ref[jax.tree_util.keystr(path)],
                 jax.tree_util.keystr(path), rtol=5e-4, atol=5e-5)
        # frozen subtree untouched by the step
        for path, leaf in jax.tree_util.tree_flatten_with_path(
                ref_after["frozen"])[0]:
            _cmp(leaf,
                 dict(jax.tree_util.tree_flatten_with_path(
                     c.params["frozen"])[0])[path],
                 f"frozen{jax.tree_util.keystr(path)}", rtol=1e-6,
                 atol=1e-7)
    finally:
        for v, val in zip(tvars, snap):
            v.assign(val)


def test_compute_rgb_scales_matches_reference(tmp_path):
    """Executable parity for the albedo-scale matching glue
    (test.py:52-120 vs pipelines/test_driver.compute_rgb_scales) on a
    synthetic raw_test/vis_comps/data tree — r2 VERDICT #5."""
    import cv2

    ref_test = rs.import_ref_decomp("test")

    scene_dir = tmp_path / "lego_3072_ref_nfr"  # -> scene 'lego', spec path
    out = scene_dir / "lr5e-4"
    (out / "checkpoints").mkdir(parents=True)
    raw = out / "raw_test" / "ckpt-5"
    data_root = tmp_path / "nfr_blender" / "lego_3072"
    vis_root = tmp_path / "vis_comps" / "lego_3072"

    rsr = np.random.RandomState(9)
    for i in range(2):
        bd = raw / ("batch%09d" % i)
        bd.mkdir(parents=True)
        for name in ("pred_albedo", "pred_spec", "pred_alpha"):
            img = (rsr.rand(16, 16, 3) * 255).astype(np.uint8)
            cv2.imwrite(str(bd / (name + ".png")), img[..., ::-1])
        vd = vis_root / ("val_%03d" % i)
        vd.mkdir(parents=True)
        for name in ("albedo", "metal"):
            img = (rsr.rand(16, 16, 3) * 255).astype(np.uint8)
            cv2.imwrite(str(vd / (name + ".png")), img[..., ::-1])
        dd = data_root / ("val_%03d" % i)
        dd.mkdir(parents=True)
        rgba = (rsr.rand(16, 16, 4) * 255).astype(np.uint8)
        cv2.imwrite(str(dd / "rgba.png"), rgba[..., [2, 1, 0, 3]])

    with open(scene_dir / "lr5e-4.ini", "w") as f:
        f.write("[DEFAULT]\ndata_root = %s\n" % data_root)

    if not ref_test.FLAGS.is_parsed():
        ref_test.FLAGS(["prog"])
    ref_test.FLAGS.ckpt = str(out / "checkpoints" / "ckpt-5")
    scale_ref = ref_test.compute_rgb_scales()

    from vqnerf_release_tpu.pipelines.test_driver import compute_rgb_scales
    ours = compute_rgb_scales(str(raw), str(data_root),
                              vis_root=str(vis_root),
                              scene_name="lego_3072")
    np.testing.assert_allclose(ours, np.asarray(scale_ref), rtol=1e-4,
                               atol=1e-6)
