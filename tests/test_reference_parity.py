"""Executable differential parity against the reference code itself.

The reference source sits read-only at /root/reference with tf + torch
importable, so instead of trusting numpy re-derivations we run the actual
reference modules side-by-side with ours on random inputs (r1 VERDICT #1).
Import shims (sonnet EMA etc.) live in tests/reference_shims.py.

Covered here:
  * nerfactor/util/math.py      — safe_atan2/safe_acos (values+grads),
                                  safe_l2_normalize, safe_cumprod
  * nerfactor/util/microfacet.py — get_brdf values + input gradients
  * nerfactor/util/geom.py      — gen_world2local, dir2rusink
  * nerfactor/networks/vq_layers.py — VectorQuantizerEMA: 5 chained train
    steps incl. EMA debiasing, Laplace smoothing, unused-code freeze,
    straight-through grads, and the dropout-threshold path (deterministic
    roll injection on both sides)
  * tf.image.ssim               — vs eval/metrics.ssim
  * geo/NeuS-ours2/models/renderer.py — up_sample chain + full render on
    shared weights via interop/torch_import (torch CPU), the checkpoint
    round-trip the acceptance run will rely on.
  * nerfactor/models/nfr_unit.py — the REAL reference keras model built
    from its own INI, forward + tf.train.Checkpoint ->
    interop/tf_import -> our forward on the same weights.
"""

import numpy as np
import pytest

import tests.reference_shims as rs

RTOL = 1e-5
ATOL = 1e-5


def _tf():
    import tensorflow as tf
    return tf


# ---------------------------------------------------------------- math ---

def test_safe_math_values_and_grads():
    tf = _tf()
    import jax
    import jax.numpy as jnp

    from vqnerf_release_tpu.ops import math as vmath

    ref = rs.import_ref_decomp("util.math")
    rsr = np.random.RandomState(0)
    # include the singular points the safe versions exist for
    x = np.concatenate([rsr.randn(64), [0.0, 0.0, 1.0]]).astype(np.float32)
    y = np.concatenate([rsr.randn(64), [0.0, 1e-8, 0.0]]).astype(np.float32)

    with tf.GradientTape(persistent=True) as tape:
        tx, ty = tf.constant(x), tf.constant(y)
        tape.watch([tx, ty])
        z_ref = ref.safe_atan2(tx, ty)
        s_ref = tf.reduce_sum(z_ref)
    gx_ref, gy_ref = tape.gradient(s_ref, [tx, ty])

    z = vmath.safe_atan2(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(z), z_ref.numpy(), rtol=RTOL,
                               atol=ATOL)
    gx, gy = jax.grad(
        lambda a, b: jnp.sum(vmath.safe_atan2(a, b)), argnums=(0, 1))(
            jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(gx), gx_ref.numpy(), rtol=RTOL,
                               atol=ATOL)
    np.testing.assert_allclose(np.asarray(gy), gy_ref.numpy(), rtol=RTOL,
                               atol=ATOL)

    # acos: interior + exact/overflowing endpoints
    c = np.concatenate([np.clip(rsr.randn(64), -0.999, 0.999),
                        [-1.0, 1.0, 1.0000005, -1.0000005]]
                       ).astype(np.float32)
    with tf.GradientTape() as tape:
        tc = tf.constant(c)
        tape.watch(tc)
        a_ref = ref.safe_acos(tc)
        s_ref = tf.reduce_sum(a_ref)
    ga_ref = tape.gradient(s_ref, tc)
    a = vmath.safe_acos(jnp.asarray(c))
    np.testing.assert_allclose(np.asarray(a), a_ref.numpy(), rtol=RTOL,
                               atol=ATOL)
    ga = jax.grad(lambda v: jnp.sum(vmath.safe_acos(v)))(jnp.asarray(c))
    np.testing.assert_allclose(np.asarray(ga), ga_ref.numpy(), rtol=RTOL,
                               atol=ATOL)

    # l2_normalize incl. a zero row; cumprod
    v = rsr.randn(32, 3).astype(np.float32)
    v[0] = 0.0
    np.testing.assert_allclose(
        np.asarray(vmath.safe_l2_normalize(jnp.asarray(v), axis=1)),
        ref.safe_l2_normalize(tf.constant(v), axis=1).numpy(),
        rtol=RTOL, atol=ATOL)
    w = rsr.rand(8, 16).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(vmath.safe_cumprod(jnp.asarray(w))),
        ref.safe_cumprod(tf.constant(w)).numpy(), rtol=RTOL, atol=ATOL)


# ---------------------------------------------------------- microfacet ---

def test_microfacet_brdf_values_and_grads():
    tf = _tf()
    import jax
    import jax.numpy as jnp

    from vqnerf_release_tpu.ops.microfacet import microfacet_brdf

    ref = rs.import_ref_decomp("util.microfacet")
    rsr = np.random.RandomState(1)
    n, l = 64, 24
    pts2l = rsr.randn(n, l, 3).astype(np.float32)
    pts2c = rsr.randn(n, 3).astype(np.float32)
    normal = rsr.randn(n, 3).astype(np.float32)
    albedo = rsr.rand(n, 3).astype(np.float32)
    rough = (rsr.rand(n, 1) * 0.95 + 0.02).astype(np.float32)
    f0 = rsr.rand(n, 3).astype(np.float32)

    t_args = [tf.constant(a) for a in
              (pts2l, pts2c, normal, albedo, rough, f0)]
    with tf.GradientTape() as tape:
        tape.watch(t_args)
        brdf_ref, glossy_ref, diffuse_ref = ref.get_brdf(
            t_args[0], t_args[1], t_args[2], albedo=t_args[3],
            rough=t_args[4], f0=t_args[5])
        s = tf.reduce_sum(brdf_ref)
    grads_ref = tape.gradient(s, t_args)

    j_args = [jnp.asarray(a) for a in
              (pts2l, pts2c, normal, albedo, rough, f0)]
    brdf, glossy, diffuse = microfacet_brdf(*j_args)
    np.testing.assert_allclose(np.asarray(brdf), brdf_ref.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(glossy), glossy_ref.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(diffuse), diffuse_ref.numpy(),
                               rtol=1e-5, atol=1e-6)

    grads = jax.grad(
        lambda *a: jnp.sum(microfacet_brdf(*a)[0]),
        argnums=tuple(range(6)))(*j_args)
    for g, g_ref, name in zip(
            grads, grads_ref,
            ("pts2l", "pts2c", "normal", "albedo", "rough", "f0")):
        np.testing.assert_allclose(
            np.asarray(g), g_ref.numpy(), rtol=2e-3, atol=1e-4,
            err_msg=f"grad wrt {name}")


# ----------------------------------------------------------------- geom ---

def test_world2local_matches_reference():
    tf = _tf()

    from vqnerf_release_tpu.ops.geom import world2local

    ref = rs.import_ref_decomp("util.geom")
    rsr = np.random.RandomState(2)
    normal = rsr.randn(128, 3).astype(np.float32)
    rot_ref = ref.gen_world2local(tf.constant(normal)).numpy()
    rot = world2local(normal)
    np.testing.assert_allclose(rot, rot_ref, rtol=1e-4, atol=1e-5)


def test_dir2rusink_matches_reference():
    tf = _tf()

    from vqnerf_release_tpu.data.merl import rusink_angles

    ref = rs.import_ref_decomp("util.geom")
    rsr = np.random.RandomState(3)
    # local-frame directions in the upper hemisphere (n = +Z), as produced
    # by gen_world2local before the lookup (reference brdf path)
    def hemi(n):
        d = rsr.randn(n, 3)
        d[:, 2] = np.abs(d[:, 2]) + 0.1
        return (d / np.linalg.norm(d, axis=1, keepdims=True)
                ).astype(np.float32)

    a, b = hemi(128), hemi(128)
    rusink_ref = ref.dir2rusink(tf.constant(a), tf.constant(b)).numpy()
    # reference returns (phi_d, theta_h, theta_d) and rotates `b`
    n = np.tile([[0.0, 0.0, 1.0]], (128, 1))
    t = np.tile([[1.0, 0.0, 0.0]], (128, 1))
    theta_h, theta_d, phi_d = rusink_angles(b, a, n, t=t)
    np.testing.assert_allclose(theta_h, rusink_ref[:, 1], rtol=1e-4,
                               atol=2e-4)
    np.testing.assert_allclose(theta_d, rusink_ref[:, 2], rtol=1e-4,
                               atol=2e-4)
    np.testing.assert_allclose(phi_d, rusink_ref[:, 0], rtol=1e-4,
                               atol=2e-4)


# ----------------------------------------------------------------- ssim ---

def test_ssim_matches_tf_image_ssim():
    tf = _tf()

    from vqnerf_release_tpu.eval.metrics import ssim

    rsr = np.random.RandomState(4)
    for shape in ((32, 48, 3), (24, 24, 3)):
        a = (rsr.rand(*shape) * 255).astype(np.uint8)
        noise = rsr.randn(*shape) * 12
        b = np.clip(a.astype(np.float64) + noise, 0, 255).astype(np.uint8)
        ref_val = float(tf.image.ssim(
            tf.constant(a[None]), tf.constant(b[None]), max_val=255))
        ours = ssim(a, b)
        np.testing.assert_allclose(ours, ref_val, rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------- VQ-EMA ---

def test_vq_ema_five_steps_match_reference():
    """Five chained VectorQuantizerEMA training steps: codebook update
    trajectory, commitment loss, perplexity, assignments, and the
    straight-through gradient all match vq_layers.py:174-349 (with the
    sonnet EMA shim re-implementing the published zero-debias formula)."""
    tf = _tf()
    import jax
    import jax.numpy as jnp

    from vqnerf_release_tpu.ops.vq import init_vq_ema_state, vq_ema_apply

    vq_mod = rs.import_ref_decomp("networks.vq_layers")
    d, k, n = 16, 8, 96
    beta, decay = 0.1, 0.9  # fast decay so freeze/debias effects show
    rsr = np.random.RandomState(5)

    layer = vq_mod.VectorQuantizerEMA(
        embedding_dim=d, num_embeddings=k, commitment_cost=beta, seed=0,
        decay=decay)
    codebook_ref = tf.Variable(rsr.rand(d, k).astype(np.float32))

    codebook = jnp.asarray(codebook_ref.numpy())
    state = init_vq_ema_state(d, k)

    for step in range(5):
        # leave codes 6,7 unused -> exercises the freeze (:304-319)
        z = rsr.rand(n, d).astype(np.float32)
        z = z / np.linalg.norm(z, axis=1, keepdims=True)
        near = rsr.randint(0, 6, size=n)
        z = 0.7 * z + 0.3 * codebook_ref.numpy().T[near]
        z = z.astype(np.float32)

        with tf.GradientTape() as tape:
            tz = tf.constant(z)
            tape.watch(tz)
            outs_ref = layer(tz, codebook_ref, is_training=True)
            # downstream consumer grad through the straight-through z_vq
            s = tf.reduce_sum(tf.sin(outs_ref["quantize"])) \
                + outs_ref["loss"]
        gz_ref = tape.gradient(s, tz)
        codebook_ref.assign(outs_ref["update"])

        old_codebook, old_state = codebook, state
        outs, state = vq_ema_apply(
            old_codebook, jnp.asarray(z), old_state, commitment_cost=beta,
            decay=decay, is_training=True)
        codebook = outs["update"]

        np.testing.assert_allclose(
            np.asarray(outs["encoding_indices"]),
            outs_ref["encoding_indices"].numpy(), err_msg=f"step {step}")
        np.testing.assert_allclose(
            float(outs["loss"]), float(outs_ref["loss"]), rtol=1e-5,
            atol=1e-6, err_msg=f"step {step}")
        np.testing.assert_allclose(
            float(outs["perplexity"]), float(outs_ref["perplexity"]),
            rtol=1e-5, atol=1e-6, err_msg=f"step {step}")
        np.testing.assert_allclose(
            np.asarray(codebook), codebook_ref.numpy(), rtol=1e-4,
            atol=1e-5, err_msg=f"codebook after step {step}")

        def scalar(zz):
            o, _ = vq_ema_apply(
                old_codebook, zz, old_state, commitment_cost=beta,
                decay=decay, is_training=True)
            return jnp.sum(jnp.sin(o["quantize"])) + o["loss"]

        gz = jax.grad(scalar)(jnp.asarray(z))
        np.testing.assert_allclose(
            np.asarray(gz), gz_ref.numpy(), rtol=1e-4, atol=1e-5,
            err_msg=f"straight-through grad step {step}")


def test_neus_render_checkpoint_roundtrip_parity(tmp_path):
    """The acceptance-run round trip: REAL reference torch networks
    (geometric-init SDF, IDR color, variance) -> reference-format .pth ->
    interop.torch_import -> our full hierarchical render equals the
    reference NeuSRenderer.render (renderer.py:131-401) on the same rays:
    up_sample chain, render_core compositing, Eikonal error, surf/depth."""
    torch = pytest.importorskip("torch")

    from vqnerf_release_tpu.interop.torch_import import import_neus
    from vqnerf_release_tpu.models import fields as vfields
    from vqnerf_release_tpu.models.neus import NeuSConfig, neus_render

    ref_fields = rs.import_ref_geo("fields")
    ref_renderer = rs.import_ref_geo("renderer")

    torch.manual_seed(0)
    sdf_net = ref_fields.SDFNetwork(
        d_in=3, d_out=65, d_hidden=64, n_layers=6, skip_in=(3,),
        multires=6, bias=0.5, scale=1.0, geometric_init=True,
        weight_norm=True)
    color_net = ref_fields.RenderingNetwork(
        d_feature=64, mode="idr", d_in=9, d_out=3, d_hidden=64,
        n_layers=4, weight_norm=True, multires_view=4, squeeze_out=True)
    var_net = ref_fields.SingleVarianceNetwork(0.3)
    renderer = ref_renderer.NeuSRenderer(
        None, sdf_net, var_net, color_net, n_samples=16, n_importance=16,
        n_outside=0, up_sample_steps=2, perturb=0.0)

    rsr = np.random.RandomState(7)
    n = 24
    rays_o = (rsr.rand(n, 3) * 0.4 - 0.2 + [[0.0, 0.0, 2.0]]
              ).astype(np.float32)
    rays_d = (rsr.rand(n, 3) * 0.3 - 0.15 - rays_o).astype(np.float32)
    rays_d /= np.linalg.norm(rays_d, axis=1, keepdims=True)
    near = np.full((n, 1), 1.0, np.float32)
    far = np.full((n, 1), 3.0, np.float32)
    radius = 1.0

    out_ref = renderer.render(
        torch.from_numpy(rays_o), torch.from_numpy(rays_d),
        torch.from_numpy(near), torch.from_numpy(far), radius,
        perturb_overwrite=0, background_rgb=None, cos_anneal_ratio=0.7)

    ckpt_dir = tmp_path / "checkpoints"
    ckpt_dir.mkdir()
    torch.save({
        "sdf_network_fine": sdf_net.state_dict(),
        "color_network_fine": color_net.state_dict(),
        "variance_network_fine": var_net.state_dict(),
        "iter_step": 1,
    }, ckpt_dir / "ckpt_000001.pth")

    cfg = NeuSConfig(
        sdf=vfields.SDFConfig(d_out=65, d_hidden=64, n_layers=6,
                              skip_in=(3,), multires=6),
        color=vfields.ColorConfig(d_feature=64, d_hidden=64),
        n_samples=16, n_importance=16, n_outside=0, up_sample_steps=2,
        perturb=0.0, variance_init=0.3)
    params, _ = import_neus(str(tmp_path), cfg)

    import jax.numpy as jnp
    out = neus_render(params, cfg, jnp.asarray(rays_o),
                      jnp.asarray(rays_d), jnp.asarray(near),
                      jnp.asarray(far), radius, perturb_overwrite=0.0,
                      background_rgb=None, cos_anneal_ratio=0.7)

    def cmp(key, rtol=2e-4, atol=2e-4):
        got = np.asarray(out[key])
        want = out_ref[key].detach().numpy().reshape(got.shape)
        np.testing.assert_allclose(got, want, rtol=rtol, atol=atol,
                                   err_msg=key)

    cmp("color_fine")
    cmp("s_val", atol=1e-5)
    cmp("weight_sum")
    cmp("weight_max")
    cmp("depth", atol=5e-4)
    cmp("surf", atol=5e-4)
    np.testing.assert_allclose(
        float(out["gradient_error"]),
        float(out_ref["gradient_error"]), rtol=5e-4, atol=5e-5,
        err_msg="eikonal")


def test_nfr_unit_checkpoint_roundtrip_parity(tmp_path):
    """Decomp-side round trip: the REAL reference nfr_unit keras model
    (nfr_unit.py:110-306) built from its own INI, forward on a batch ->
    tf.train.Checkpoint -> interop.tf_import.import_nfr_unit -> our
    nfr_unit_forward matches on rgb/albedo/spec/rough/basecolor."""
    tf = _tf()
    import configparser
    import os

    import cv2
    import jax.numpy as jnp

    from vqnerf_release_tpu.interop.tf_import import import_nfr_unit
    from vqnerf_release_tpu.models import decomp_common as dc
    from vqnerf_release_tpu.models.nfr_unit import nfr_unit_forward

    nfr_mod = rs.import_ref_decomp("models.nfr_unit")

    env_dir = tmp_path / "envs"
    env_dir.mkdir()
    cv2.imwrite(str(env_dir / "city.hdr"),
                np.random.RandomState(0).rand(2, 4, 3).astype(np.float32))

    ini = configparser.ConfigParser()
    ini.read(f"{rs.REF_DECOMP}/nerfactor/config/nfr_unit.ini")
    ini["DEFAULT"]["data_type"] = "nerf"
    ini["DEFAULT"]["light_h"] = "16"  # OLAT init hardcodes 16x32 indices (:74-76)
    ini["DEFAULT"]["mlp_width"] = "16"
    ini["DEFAULT"]["imh"] = "16"
    ini["DEFAULT"]["test_envmap_dir"] = str(env_dir)

    tf.random.set_seed(0)
    model = nfr_mod.Model(ini)
    model.register_trainable()

    n, l = 48, 512  # light_h 16 -> 16x32 lights
    rsr = np.random.RandomState(8)
    alpha = np.ones((n, 1), np.float32)
    alpha[-6:] = 0.0
    normal = rsr.randn(n, 3).astype(np.float32)
    normal /= np.linalg.norm(normal, axis=1, keepdims=True)
    batch_np = {
        "rayo": np.tile([[0.0, 0.0, 3.0]], (n, 1)).astype(np.float32),
        "rayd": rsr.randn(n, 3).astype(np.float32),
        "rgb": rsr.rand(n, 3).astype(np.float32),
        "alpha": alpha,
        "pred_alpha": alpha.copy(),
        "xyz": (rsr.rand(n, 3) - 0.5).astype(np.float32),
        "normal": normal,
        "lvis": rsr.rand(n, l).astype(np.float32),
    }
    ref_batch = (
        tf.constant(["v0"] * n), tf.constant([[16, 16]] * n),
        tf.constant(batch_np["rayo"]), tf.constant(batch_np["rayd"]),
        tf.constant(batch_np["rgb"]), tf.constant(batch_np["alpha"]),
        tf.constant(batch_np["pred_alpha"]), tf.constant(batch_np["xyz"]),
        tf.constant(batch_np["normal"]), tf.constant(batch_np["lvis"]))
    pred_ref, _, _, _ = model(ref_batch, mode="vali")

    ckpt_dir = str(tmp_path / "checkpoints")
    os.makedirs(ckpt_dir)
    tf.train.Checkpoint(net=model).save(os.path.join(ckpt_dir, "ckpt"))

    cfg = dc.DecompConfig(data_type="nerf", light_h=16, mlp_width=16,
                          z_dim=256)  # conv_width hardcoded 256 (:113)
    params, cfg = import_nfr_unit(str(tmp_path), cfg)
    lxyz, lareas = dc.light_constants(cfg)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    pred, _ = nfr_unit_forward(params, batch, cfg, lxyz, lareas,
                               mode="vali")

    for key in ("rgb", "albedo", "spec", "rough", "basecolor"):
        np.testing.assert_allclose(
            np.asarray(pred[key]), pred_ref[key].numpy(), rtol=2e-4,
            atol=2e-5, err_msg=key)


def test_vq_dropout_roll_parity():
    """The dropout-threshold masking path with an identical injected roll
    on both sides (TF/JAX RNG streams cannot be aligned, so the roll is
    the interface): same surviving codes, same assignments."""
    tf = _tf()
    import jax.numpy as jnp

    from vqnerf_release_tpu.ops.vq import vq_lookup

    vq_mod = rs.import_ref_decomp("networks.vq_layers")
    d, k, n = 8, 6, 40
    rsr = np.random.RandomState(6)
    codebook = rsr.rand(d, k).astype(np.float32)
    z = rsr.rand(n, d).astype(np.float32)
    roll = rsr.rand(1, k).astype(np.float32)
    thres = 0.5

    layer = vq_mod.VectorQuantizerEMA(
        embedding_dim=d, num_embeddings=k, commitment_cost=0.1, seed=0)
    orig_uniform = tf.random.uniform
    try:
        tf.random.uniform = lambda *a, **kw: tf.constant(roll)
        outs_ref = layer(tf.constant(z), tf.constant(codebook),
                         is_training=False, thres=thres)
    finally:
        tf.random.uniform = orig_uniform

    look = vq_lookup(jnp.asarray(codebook), jnp.asarray(z), thres=thres,
                     roll=jnp.asarray(roll))
    np.testing.assert_allclose(
        np.asarray(look["encoding_indices"]),
        outs_ref["encoding_indices"].numpy())
    surviving = set(np.asarray(look["encoding_indices"]).tolist())
    dropped = set(np.nonzero(roll[0] < thres)[0].tolist())
    assert not (surviving & dropped)
