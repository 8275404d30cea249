"""Full-stack golden test: the nfr_unit forward re-derived in pure numpy
from the reference's equations (mlp.Network semantics, head wiring,
ks/albedo split, render equation) with weights SHARED from our params —
catches any wiring divergence the unit oracles can't see."""

import jax.numpy as jnp
import numpy as np

from vqnerf_release_tpu.models import decomp_common as dc
from vqnerf_release_tpu.models.nfr_unit import init_nfr_unit, nfr_unit_forward

CFG = dc.DecompConfig(light_h=4, z_dim=32, mlp_width=16,
                      num_embed=6, num_drop=4, thres_str="0.1;0.2;0.3;0.4")


def _np_dense(p, x):
    return x @ np.asarray(p["w"]) + np.asarray(p["b"])


def _np_mlp(params, x, acts, skip_at=()):
    """networks/mlp.py:39-50: y = act(layer(x_)); if i in skip_at:
    y = concat(y, x); x_ = y."""
    act_fns = {None: lambda v: v, "relu": lambda v: np.maximum(v, 0),
               "sigmoid": lambda v: 1 / (1 + np.exp(-v))}
    h = x
    for i, p in enumerate(params):
        y = act_fns[acts[i]](_np_dense(p, h))
        if i in skip_at:
            y = np.concatenate([y, x], axis=-1)
        h = y
    return h


def _np_posenc(x, n):
    feats = [x]
    for k in range(n):
        feats.append(np.sin(x * 2.0**k))
        feats.append(np.cos(x * 2.0**k))
    return np.concatenate(feats, axis=-1)


def _np_norm(x, axis, eps=1e-6):
    return x / np.sqrt(np.maximum((x**2).sum(axis, keepdims=True), eps))


def _np_brdf(pts2l, pts2c, normal, albedo, rough, f0):
    pts2l = _np_norm(pts2l, 2)
    pts2c = _np_norm(pts2c, 1)
    normal = _np_norm(normal, 1)
    h = _np_norm(pts2l + pts2c[:, None, :], 2)
    cos_vh = np.clip(np.einsum("nlk,nk->nl", h, pts2c), 0, 1)[..., None]
    f = f0[:, None, :] + (1 - f0[:, None, :]) * (1 - cos_vh) ** 5
    alpha = (rough**2)[:, None, :]
    cos_nh = np.clip(np.einsum("nlk,nk->nl", h, normal), 0, 1)
    den_d = np.pi * ((cos_nh**2)[..., None] * (alpha**2 - 1) + 1) ** 2
    d = np.where(den_d == 0, 0, alpha**2 / np.where(den_d == 0, 1, den_d))

    def gsub(c):
        c = np.clip(c, 0, 1)
        den = c + np.sqrt(np.abs(alpha**2 + (1 - alpha**2) * c**2))
        return np.where(den == 0, 0, 2 * c / np.where(den == 0, 1, den))

    cos_ln = np.einsum("nlk,nk->nl", pts2l, normal)[..., None]
    cos_vn = np.einsum("nk,nk->n", normal, pts2c)[:, None, None]
    g = gsub(cos_ln) * gsub(cos_vn)
    den = 4 * np.abs(cos_ln) * np.abs(cos_vn)
    glossy = np.where(den == 0, 0, f * g * d / np.where(den == 0, 1, den))
    return glossy + (albedo / np.pi)[:, None, :]


def _np_linear2srgb(x):
    x = np.clip(x, 0, 1)
    lin = x * 12.92
    nonlin = 1.055 * np.maximum(x, 0.0031308) ** (1 / 2.4) - 0.055
    return np.where(x <= 0.0031308, lin, nonlin)


def test_nfr_unit_full_forward_golden():
    cfg = CFG
    params = init_nfr_unit(0, cfg)
    lxyz_np, lareas_np = __import__(
        "vqnerf_release_tpu.ops.light", fromlist=["gen_light_xyz"]
    ).gen_light_xyz(*cfg.light_res)
    lxyz = lxyz_np.reshape(-1, 3)
    lareas = lareas_np.reshape(-1)

    rs = np.random.RandomState(0)
    n = 24
    xyz = (rs.rand(n, 3) - 0.5).astype(np.float32)
    normal = _np_norm(rs.randn(n, 3), 1).astype(np.float32)
    rayo = np.tile([[0, 0, 3.0]], (n, 1)).astype(np.float32)
    lvis = rs.rand(n, cfg.n_lights).astype(np.float32)
    rgb_gt = rs.rand(n, 3).astype(np.float32)
    alpha = np.ones((n, 1), np.float32)

    batch = {k: jnp.asarray(v) for k, v in dict(
        rayo=rayo, rayd=rayo, rgb=rgb_gt, alpha=alpha,
        pred_alpha=alpha, xyz=xyz, normal=normal, lvis=lvis).items()}
    from vqnerf_release_tpu.models.decomp_common import light_constants
    lx, la = light_constants(cfg)
    pred, aux = nfr_unit_forward(params, batch, cfg, lx, la, mode="vali")

    # ---- numpy re-derivation (nfr_unit.py:179-306)
    surf2c = _np_norm(rayo - xyz, 1)
    surf2l = _np_norm(lxyz[None] - xyz[:, None], 2)
    cosc = np.sum(normal * surf2c, -1, keepdims=True)
    normal_c = np.where(cosc >= 0, normal, -normal)

    z = _np_posenc(xyz, cfg.n_freqs_xyz)
    z = _np_mlp([{k: np.asarray(v) for k, v in p.items()}
                 for p in params["fine_enc"]], z, ["relu"] * 4,
                skip_at=(2,))
    z = _np_mlp([{k: np.asarray(v) for k, v in p.items()}
                 for p in params["bottleneck"]], z,
                [None, "relu", "sigmoid"])
    heads = {}
    for name, dim in (("diff_out", 3), ("spec_out", 1), ("rough_out", 1)):
        heads[name] = _np_mlp(
            [{k: np.asarray(v) for k, v in p.items()}
             for p in params[name]], z, ["relu", "relu", "sigmoid"],
            skip_at=(1,))
    basecolor = heads["diff_out"]
    ks = heads["spec_out"]
    rough = heads["rough_out"]
    spec = ks * basecolor
    albedo = (1 - ks) * basecolor

    brdf = _np_brdf(surf2l, surf2c, normal_c, albedo, rough, spec)
    cos = np.einsum("nlk,nk->nl", surf2l, normal_c)
    front = (cos > 0).astype(np.float32)
    light = np.clip(np.asarray(params["light"]), 0, np.inf).reshape(-1, 3)
    contrib = brdf * ((front * lvis * cos)[..., None]
                      * lareas.reshape(1, -1, 1) * light[None])
    rgb_lin = np.clip(contrib.sum(1), 0, 1)
    expected_rgb = _np_linear2srgb(rgb_lin)

    np.testing.assert_allclose(
        np.asarray(pred["basecolor"]), basecolor, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(pred["ks"]), ks, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(pred["rough"]), rough, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(pred["albedo"]), albedo, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(pred["rgb"]), expected_rgb, rtol=3e-3, atol=5e-4)

    # loss: srgb2linear(gt) vs linear pred, MSE per ray, mean
    lin_gt = np.where(rgb_gt <= 0.04045, rgb_gt / 12.92,
                      ((rgb_gt + 0.055) / 1.055) ** 2.4)
    expected_loss = np.mean((lin_gt - rgb_lin) ** 2)
    from vqnerf_release_tpu.models.nfr_unit import nfr_unit_loss
    loss, _ = nfr_unit_loss(aux, cfg)
    np.testing.assert_allclose(float(loss), expected_loss, rtol=2e-3)


def test_vq_nfr_full_forward_and_losses_golden():
    """vq_nfr train forward + all loss terms re-derived in numpy
    (vq_nfr.py:534-692, 876-986) with shared weights; thres=None so the
    assignment is deterministic."""
    import jax

    from vqnerf_release_tpu.models.vq_nfr import (init_vq_nfr,
                                                  vq_nfr_forward,
                                                  vq_nfr_loss)
    from vqnerf_release_tpu.ops.vq import init_vq_ema_state

    cfg = CFG
    rs = np.random.RandomState(1)
    nfr_params = init_nfr_unit(0, cfg)
    centers = rs.rand(cfg.num_embed, cfg.z_dim).astype(np.float32)
    params, ema = init_vq_nfr(0, cfg, nfr_params, centers)

    from vqnerf_release_tpu.ops.light import gen_light_xyz
    lxyz_np, lareas_np = gen_light_xyz(*cfg.light_res)
    lxyz = lxyz_np.reshape(-1, 3)
    lareas = lareas_np.reshape(-1)

    n = 16  # 8 jitter pairs
    xyz = (rs.rand(n, 3) - 0.5).astype(np.float32)
    normal = _np_norm(rs.randn(n, 3), 1).astype(np.float32)
    rayo = np.tile([[0, 0, 3.0]], (n, 1)).astype(np.float32)
    lvis = rs.rand(n, cfg.n_lights).astype(np.float32)
    rgb_gt = rs.rand(n, 3).astype(np.float32)
    alpha = np.ones((n, 1), np.float32)

    batch = {k: jnp.asarray(v) for k, v in dict(
        rayo=rayo, rayd=rayo, rgb=rgb_gt, alpha=alpha,
        pred_alpha=alpha, xyz=xyz, normal=normal, lvis=lvis).items()}
    from vqnerf_release_tpu.models.decomp_common import light_constants
    lx, la = light_constants(cfg)
    pred, aux, new_ema = vq_nfr_forward(
        params, ema, batch, cfg, lx, la, mode="train", thres=None)
    loss, ld = vq_nfr_loss(params, aux, cfg, mode="train")

    # ---- numpy
    def mlp(ps, x, acts, skip=()):
        return _np_mlp([{k: np.asarray(v) for k, v in p.items()}
                        for p in ps], x, acts, skip_at=skip)

    surf2c = _np_norm(rayo - xyz, 1)
    surf2l = _np_norm(lxyz[None] - xyz[:, None], 2)
    cosc = np.sum(normal * surf2c, -1, keepdims=True)
    normal_c = np.where(cosc >= 0, normal, -normal)

    z = _np_posenc(xyz, cfg.n_freqs_xyz)
    z = mlp(params["fine_enc"], z, ["relu"] * 4, skip=(2,))
    z_enc = mlp(params["bottleneck"], z, [None, "relu", "sigmoid"])
    z_norm = _np_norm(z_enc, 1)

    # codebook: clip[0,1] + column L2 norm (vq_nfr.py:761-769)
    cb = np.clip(np.asarray(params["codebook"]), 0, 1)
    cb = cb / np.sqrt(np.maximum((cb**2).sum(0, keepdims=True), 1e-6))
    dist = ((z_norm**2).sum(1, keepdims=True) - 2 * z_norm @ cb
            + (cb**2).sum(0, keepdims=True))
    idx = dist.argmin(1)
    quant = cb.T[idx]
    e_latent = ((quant - z_norm) ** 2).mean()
    vq_loss = cfg.commitment_cost * e_latent
    z_vq = z_norm + (quant - z_norm)  # straight-through primal == quant
    np.testing.assert_allclose(float(aux["vq_loss"]), vq_loss, rtol=1e-4)

    basecolor = mlp(params["diff_main"], z_enc,
                    ["relu", "relu", "sigmoid"], skip=(1,))
    ks = mlp(params["spec_main"], z_enc,
             ["relu", "relu", "sigmoid"], skip=(1,))
    rough = mlp(params["rough_main"], z_enc,
                ["relu", "relu", "sigmoid"], skip=(1,))
    spec = ks * basecolor
    albedo = (1 - ks) * basecolor

    vq_albedo = mlp(params["diff_vq"], z_vq,
                    ["relu", "relu", "sigmoid"], skip=(1,))
    vq_spec = mlp(params["spec_vq"], z_vq,
                  ["relu", "relu", "sigmoid"], skip=(1,))
    vq_rough = mlp(params["rough_vq"], z_vq,
                   ["relu", "relu", "sigmoid"], skip=(1,))

    light = np.clip(np.asarray(params["light"]), 0, np.inf).reshape(-1, 3)
    cos = np.einsum("nlk,nk->nl", surf2l, normal_c)
    front = (cos > 0).astype(np.float32)
    w = (front * lvis * cos)[..., None] * lareas.reshape(1, -1, 1)

    rgb_lin = np.clip((_np_brdf(surf2l, surf2c, normal_c, albedo, rough,
                                spec) * w * light[None]).sum(1), 0, 1)
    vq_lin = np.clip((_np_brdf(surf2l, surf2c, normal_c, vq_albedo,
                               vq_rough, vq_spec) * w * light[None]
                      ).sum(1), 0, 1)
    np.testing.assert_allclose(
        np.asarray(aux["rgb_pred_linear"]), rgb_lin, rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(aux["vq_rgb_linear"]), vq_lin, rtol=5e-3, atol=5e-4)

    # ---- losses (vq_nfr.py:876-986)
    lin_gt = np.where(rgb_gt <= 0.04045, rgb_gt / 12.92,
                      ((rgb_gt + 0.055) / 1.055) ** 2.4)
    exp = {}
    exp["rgb"] = cfg.combine_weight * np.mean((lin_gt - rgb_lin) ** 2)
    exp["vqrgb"] = np.mean((lin_gt - vq_lin) ** 2)
    exp["vqloss"] = cfg.vq_loss_weight * vq_loss

    def chroma(v):
        d = np.sqrt((v**2).sum(-1, keepdims=True))
        return np.where(d == 0, 0, v / np.where(d == 0, 1, d))

    exp["chromaticity"] = cfg.chromaticity_loss_weight * np.mean(
        (chroma(lin_gt) - chroma(vq_lin)) ** 2)

    schr = chroma(rgb_gt)
    chr_e = np.sqrt(((schr[::2] - schr[1::2]) ** 2).sum(-1))
    chr_e = np.where(chr_e > cfg.chr_thres, chr_e, 0.0)
    w_chr = np.exp(-cfg.chr_alpha * chr_e)
    pair = w_chr * (1 - (z_vq[::2] * z_vq[1::2]).sum(-1))
    exp["chr_smooth"] = cfg.mat_sloss_weight * pair.mean()

    # sim loss evaluates at the EMA-UPDATED codebook (the reference
    # assigns during call, then compute_loss re-reads get_codebook —
    # vq_nfr.py:580-583, 959-963)
    cb_up = np.clip(np.asarray(aux["codebook_update"]), 0, 1)
    cb_up = cb_up / np.sqrt(
        np.maximum((cb_up**2).sum(0, keepdims=True), 1e-6))
    cbt = cb_up.T
    d2 = np.sqrt((((cbt[:, None] - cbt[None]) ** 2).sum(-1)) + 1e-12)
    eye = np.eye(cfg.num_embed)
    masked = d2 * (1 - eye) + eye * d2.max()
    exp["sim_smooth"] = cfg.sim_loss_weight * (-np.log(masked.min()))

    sg = np.where(rough < 0.5, 0.0, 2 * rough - 1)
    exp["lambert"] = cfg.lambert_weight * np.mean(
        spec.max(-1) * sg[:, 0])

    for k, v in exp.items():
        np.testing.assert_allclose(
            float(ld[k]), v, rtol=5e-3, atol=1e-6,
            err_msg=f"loss term {k}")


def test_ref_nfr_full_forward_golden():
    """ref_nfr forward re-derived in numpy (ref_nfr.py:176-300): frozen
    encoder ks path, rgb_enc on the ref buffer, concat(z_xyz, z_ref)
    heads, frozen-light render, plain linear MSE loss."""
    from vqnerf_release_tpu.models.nfr_unit import init_nfr_unit
    from vqnerf_release_tpu.models.ref_nfr import (init_ref_nfr,
                                                   ref_nfr_forward,
                                                   ref_nfr_loss)
    from vqnerf_release_tpu.models.vq_nfr import init_vq_nfr

    cfg = CFG
    rs = np.random.RandomState(2)
    nfr_params = init_nfr_unit(0, cfg)
    vq_params, _ = init_vq_nfr(
        0, cfg, nfr_params,
        rs.rand(cfg.num_embed, cfg.z_dim).astype(np.float32))
    light_np = rs.rand(*cfg.light_res, 3).astype(np.float32)
    params = init_ref_nfr(0, cfg, vq_params, light_np)

    from vqnerf_release_tpu.ops.light import gen_light_xyz
    lxyz_np, lareas_np = gen_light_xyz(*cfg.light_res)
    lxyz = lxyz_np.reshape(-1, 3)
    lareas = lareas_np.reshape(-1)

    n = 16
    xyz = (rs.rand(n, 3) - 0.5).astype(np.float32)
    normal = _np_norm(rs.randn(n, 3), 1).astype(np.float32)
    rayo = np.tile([[0, 0, 3.0]], (n, 1)).astype(np.float32)
    lvis = rs.rand(n, cfg.n_lights).astype(np.float32)
    rgb_gt = rs.rand(n, 3).astype(np.float32)
    ref = rs.rand(n, 3).astype(np.float32)
    alpha = np.ones((n, 1), np.float32)

    batch = {k: jnp.asarray(v) for k, v in dict(
        rayo=rayo, rayd=rayo, rgb=rgb_gt, alpha=alpha, pred_alpha=alpha,
        xyz=xyz, normal=normal, lvis=lvis, ref=ref).items()}
    from vqnerf_release_tpu.models.decomp_common import light_constants
    lx, la = light_constants(cfg)
    pred, aux = ref_nfr_forward(params, batch, cfg, lx, la, mode="vali")

    def mlp(ps, x, acts, skip=()):
        return _np_mlp([{k: np.asarray(v) for k, v in p.items()}
                        for p in ps], x, acts, skip_at=skip)

    frozen = params["frozen"]
    train = params["train"]
    surf2c = _np_norm(rayo - xyz, 1)
    surf2l = _np_norm(lxyz[None] - xyz[:, None], 2)
    cosc = np.sum(normal * surf2c, -1, keepdims=True)
    normal_c = np.where(cosc >= 0, normal, -normal)

    z = _np_posenc(xyz, cfg.n_freqs_xyz)
    z = mlp(frozen["fine_enc"], z, ["relu"] * 4, skip=(2,))
    z_xyz = mlp(frozen["bottleneck"], z, [None, "relu", "sigmoid"])
    ks = mlp(frozen["spec_out"], z_xyz,
             ["relu", "relu", "sigmoid"], skip=(1,))
    z_ref = mlp(train["rgb_enc"], ref, [None, "relu", "sigmoid"])
    z_bias = np.concatenate([z_xyz, z_ref], axis=-1)
    basecolor = mlp(train["diff_out"], z_bias,
                    ["relu", "relu", "sigmoid"], skip=(1,))
    rough = mlp(train["rough_out"], z_bias,
                ["relu", "relu", "sigmoid"], skip=(1,))
    spec = ks * basecolor
    albedo = (1 - ks) * basecolor

    cos = np.einsum("nlk,nk->nl", surf2l, normal_c)
    front = (cos > 0).astype(np.float32)
    w = (front * lvis * cos)[..., None] * lareas.reshape(1, -1, 1)
    rgb_lin = np.clip(
        (_np_brdf(surf2l, surf2c, normal_c, albedo, rough, spec) * w
         * light_np.reshape(-1, 3)[None]).sum(1), 0, 1)

    np.testing.assert_allclose(
        np.asarray(pred["ks"]), ks, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(pred["basecolor"]), basecolor, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(pred["rgb"]), _np_linear2srgb(rgb_lin), rtol=5e-3,
        atol=5e-4)

    lin_gt = np.where(rgb_gt <= 0.04045, rgb_gt / 12.92,
                      ((rgb_gt + 0.055) / 1.055) ** 2.4)
    loss, _ = ref_nfr_loss(aux, cfg)
    np.testing.assert_allclose(
        float(loss), np.mean((lin_gt - rgb_lin) ** 2), rtol=3e-3)
