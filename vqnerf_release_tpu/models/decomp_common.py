"""Shared infrastructure for the decomposition-model family
(nfr_unit -> vq_nfr -> ref_nfr).

Parity targets:
  * decomp/nerfvq_nfr3/nerfactor/models/shape.py:71-119 (embedders,
    light/view directions)
  * nerfactor/models/nfr_unit.py:106-129, 308-391 (network shapes, light /
    gamma properties, head decoders, normal correction)
  * nerfactor/models/vq_nfr.py:135-164, 761-833 (VQ heads, codebook property)

TPU-native design notes:
  * Models are (init_params, forward) function pairs over pytree params —
    no classes, no chunk_apply: the full ray batch flows through in one
    XLA program (the reference chunks at 65k-100k rays purely to fit GPU
    memory; on TPU remat + batching handles that).
  * Background rays are handled with a [N] foreground mask instead of
    boolean_mask, keeping shapes static under jit/pjit.
"""

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn
from ..ops.embed import posenc, posenc_dim
from ..ops.light import gen_light_xyz
from ..ops.math import clip_preserve_gradient, safe_l2_normalize

__all__ = [
    "DecompConfig", "light_constants",
    "init_encoder", "init_head", "apply_encoder", "apply_head",
    "calc_ldir", "calc_vdir", "normal_correct",
    "get_light", "get_gamma", "get_codebook",
]


@dataclass(frozen=True)
class DecompConfig:
    """Typed replacement for the INI soup (config/*.ini + scripts/train)."""
    data_type: str = "nerf"  # 'nerf' | 'dtu' | 'hw'
    light_h: int = 16
    imh: int = 512
    white_bg: bool = True
    # networks (nfr_unit.ini: mlp_width/conv_width/n_freqs_xyz)
    mlp_width: int = 128
    z_dim: int = 256  # conv_width
    n_freqs_xyz: int = 10
    albedo_slope: float = 1.0
    albedo_bias: float = 0.0
    light_init_val: float = 0.5
    # vq (vq_nfr.ini + scripts/train/vq_nerf.sh)
    num_embed: int = 15
    num_drop: int = 12
    commitment_cost: float = 0.1
    vq_decay: float = 0.999
    # loss weights (vq_nfr.ini)
    combine_weight: float = 0.2
    vq_loss_weight: float = 1.0
    chromaticity_loss_weight: float = 1.0
    mat_sloss_weight: float = 0.05
    sim_loss_weight: float = 1e-4
    lambert_weight: float = 1e-3
    chr_alpha: float = 60.0
    chr_thres: float = 0.1
    # optimization
    lr: float = 5e-4
    lr_decay_steps: int = 500_000
    lr_decay_rate: float = 0.1
    # Gradient clipping (trainvali.py:145-154; reference INIs ship both
    # at -1 = off, kept for parity). At most one may be > 0.
    clipnorm: float = -1.0
    clipvalue: float = -1.0
    # Production hardening beyond the reference: a single non-finite
    # gradient (observed ~1-in-2 long vq runs on the synthetic sphere —
    # the reference is equally exposed) otherwise poisons every param
    # through adam in one step. When on, such steps apply a zero update
    # and leave optimizer/EMA state untouched.
    skip_nonfinite_updates: bool = True
    n_rays_per_step: int = 1024
    epochs: int = 150
    thres_str: str = "0.1;0.15;0.2;0.25;0.3;0.35;0.4;0.45;0.5;0.55;0.6;0.65"
    total_sample_vq: int = 200_000
    best_thres: float = 0.002
    random_seed: int = 2
    xyz_jitter_std: float = 0.01  # ref_nfr only
    keep_recent_epochs: int = -1  # <=0 keeps all (trainvali.py:163-167)
    # inference: route the primary (single-envmap) render through the
    # fused Pallas BRDF+integration kernel (ops/pallas/render_kernel.py).
    # None = auto: ON when the backend is TPU (measured 1.65x: 6.4 vs
    # 10.6 ms per 65k-ray view, agreement-tested), OFF elsewhere (the
    # interpret-mode kernel is far slower than the jnp path on CPU).
    # Force with --preset-override use_fused_render=True/False.
    use_fused_render: Optional[bool] = None
    # Training: route VQ assignment + EMA statistics + codebook update
    # through the single fused Pallas kernel (ops/pallas/vq_kernel.py;
    # exact-agreement-tested vs the jnp path incl. gradients, and on the
    # real TPU). None = auto: OFF everywhere — scan-timed on a v5e the
    # kernel is performance-NEUTRAL (320 us/step both paths at the
    # production 2048x256 x 15 codes; 666 vs 682 us at 65k rows): XLA
    # already emits the tiny distance/dw matmuls optimally, so the fused
    # kernel is an equivalence-proven alternative, not a speedup
    # (BASELINE.md r3). Force with --preset-override use_fused_vq=True.
    use_fused_vq: Optional[bool] = None
    # Training data path: 'auto' stages all train views on device once
    # and ships only host-sampled ray indices per step (8 KB instead of
    # the ~4.3 MB gathered batch; see data/device_store.py) when the
    # views fit the device-memory budget, falling back to the
    # host-gather + prefetch path otherwise. 'on' forces staging, 'off'
    # forces the host path. Batches are bit-identical in all of those.
    # 'u8' additionally stages lvis quantized to uint8 (±1/510 per
    # value, ~4x smaller store — fits 512-light scenes the fp32 store
    # cannot); explicit opt-in because batches then differ from the
    # host path at the quantization step.
    device_views: str = "auto"
    # With device-resident views, run each training epoch as ONE
    # lax.scan dispatch (all K steps in a single XLA program, batches
    # gathered on device from the store) instead of K python-dispatched
    # steps — removes the per-dispatch latency that dominates the ~2 ms
    # step through the axon tunnel. None = auto: on whenever the store
    # is active. Ignored (with a notice) when the store is off. The
    # scanned epoch inlines the SAME jitted step functions, and full
    # training runs are asserted equal in tests/test_device_store.py.
    epoch_scan: Optional[bool] = None
    # With epoch_scan active, dispatch up to this many WHOLE epochs as a
    # single lax.scan (chunks never cross a ckpt/vali boundary, where
    # host-side work runs). 1 = one dispatch per epoch. Larger chunks
    # amortize the per-dispatch + scalar-fetch round trips that dominate
    # short epochs through the axon tunnel; batches, rng streams, and
    # trajectories are bit-identical to chunk=1 (tests/test_device_store).
    # None = auto: min(6, ckpt/vali period) — chunks clip at period
    # boundaries, so at most two scan lengths compile per period tiling
    # (production 150 epochs / period 30 -> chunk 6 exactly, measured
    # 1.76x system-level, BASELINE.md r3; beyond ~6 the serial
    # host-side ray sampling binds). The tradeoff: a NaN epoch inside a
    # chunk is only observable at chunk end (the divergence guard
    # checkpoints and labels the end-of-chunk state).
    epoch_scan_chunk: Optional[int] = None
    # With the scanned dispatch on a replicated/u8 store, sample the
    # jitter-pair ray indices ON DEVICE inside the scan
    # (data/device_sampler.py) instead of staging the host-sampled
    # index stream per epoch. Removes the last per-epoch host->device
    # transfer (the tunnel serializes transfers with compute —
    # BASELINE.md r4's residual system gap). Same selection semantics
    # and distribution, but a jax PRNG stream instead of the host rng,
    # so batches are NOT bit-identical to the host path — explicit
    # opt-in, never auto. Ignored (with a notice) without an active
    # scanned store or with device_views='shard'.
    device_sampling: bool = False

    @property
    def light_res(self) -> Tuple[int, int]:
        return (self.light_h, 2 * self.light_h)

    @property
    def is_nerf(self) -> bool:
        return self.data_type == "nerf"

    @property
    def n_lights(self) -> int:
        return self.light_h * 2 * self.light_h

    def train_thres(self):
        """Per-code dropout thresholds used in training
        (train_nfr.py:67-76)."""
        makeups = [0.0] * (self.num_embed - self.num_drop)
        if self.thres_str != "-":
            out = np.array(
                makeups + [float(x) for x in self.thres_str.split(";")],
                np.float32)
        else:
            out = np.array(makeups, np.float32)
        assert out.shape[0] == self.num_embed, (
            "thres_str must supply num_drop thresholds "
            f"(got {out.shape[0]} != num_embed {self.num_embed})")
        return out

    def val_thres_list(self):
        """Deterministic keep-first-k masks, fewest-codes-first reversed to
        all-codes-last (train_nfr.py:77-79)."""
        lst = [
            np.array([0.0] * (self.num_embed - i) + [1.0] * i, np.float32)
            for i in range(self.num_drop + 1)
        ]
        lst.reverse()
        return lst


def fused_render_enabled(cfg: DecompConfig):
    """Resolve the use_fused_render auto default (None -> TPU only)."""
    if cfg.use_fused_render is None:
        return jax.default_backend() == "tpu"
    return bool(cfg.use_fused_render)


_WARNED_FUSED_VQ_MESH = False


def fused_vq_enabled(cfg: DecompConfig):
    """Resolve the use_fused_vq auto default (None -> off; see the
    DecompConfig field comment for the measured rationale).

    Single-device only: the fused pallas_call carries no sharding
    annotation, so under a >1-device ray mesh it would at best force an
    all-gather of the sharded [N, D] inputs per step and at worst fail
    to lower — fall back to the jnp path (which pjit partitions fine)
    until a shard_map wrapper exists."""
    if cfg.use_fused_vq is None:
        return False
    if cfg.use_fused_vq and jax.device_count() > 1:
        global _WARNED_FUSED_VQ_MESH
        if not _WARNED_FUSED_VQ_MESH:
            print("[vqnerf-tpu] use_fused_vq is single-device-only "
                  "(un-annotated pallas_call under a %d-device mesh); "
                  "using the jnp VQ path" % jax.device_count())
            _WARNED_FUSED_VQ_MESH = True
        return False
    return bool(cfg.use_fused_vq)


def light_constants(cfg: DecompConfig):
    """(lxyz [L,3], lareas [L]) as jnp constants."""
    lxyz, lareas = gen_light_xyz(*cfg.light_res)
    return (jnp.asarray(lxyz.reshape(-1, 3), jnp.float32),
            jnp.asarray(lareas.reshape(-1), jnp.float32))


# ---------------------------------------------------------------------------
# Networks. Architecture constants (nfr_unit.py:110-129):
#   fine_enc:   [mlp_width]*4, relu, skip@2, input = posenc(xyz, 10) = 63
#   bottleneck: [mlp_width, z_dim, z_dim], [None, relu, sigmoid]
#   heads:      [z_dim, z_dim//2, out], [relu, relu, sigmoid], skip@1

ENC_ACTS = ["relu"] * 4
ENC_SKIP = (2,)
BOTTLENECK_ACTS = [None, "relu", "sigmoid"]
HEAD_ACTS = ["relu", "relu", "sigmoid"]
HEAD_SKIP = (1,)


def init_encoder(key, cfg: DecompConfig):
    d_embed = posenc_dim(3, cfg.n_freqs_xyz)
    k1, k2 = jax.random.split(key)
    return {
        "fine_enc": nn.mlp_init(
            k1, d_embed, [cfg.mlp_width] * 4, skip_at=ENC_SKIP),
        "bottleneck": nn.mlp_init(
            k2, cfg.mlp_width, [cfg.mlp_width, cfg.z_dim, cfg.z_dim]),
    }


def apply_encoder(enc_params, xyz, cfg: DecompConfig):
    """posenc -> fine_enc -> bottleneck => z in [0,1]^z_dim
    (nfr_unit.py:329-342 _pred_bias_at / vq_nfr.py:771-784 _pred_enc_at)."""
    h = posenc(xyz, cfg.n_freqs_xyz)
    h = nn.mlp_apply(enc_params["fine_enc"], h, ENC_ACTS, skip_at=ENC_SKIP)
    return nn.mlp_apply(enc_params["bottleneck"], h, BOTTLENECK_ACTS)


def init_head(key, d_in, d_out, width=None):
    """Head decoder [width, width//2, d_out] w/ skip@1."""
    width = width or d_in
    return nn.mlp_init(key, d_in, [width, width // 2, d_out],
                       skip_at=HEAD_SKIP)


def apply_head(head_params, z):
    return nn.mlp_apply(head_params, z, HEAD_ACTS, skip_at=HEAD_SKIP)


def calc_ldir(lxyz, xyz):
    """Unit surface->light directions [N, L, 3] (shape.py:103-110)."""
    surf2l = lxyz[None, :, :] - xyz[:, None, :]
    return safe_l2_normalize(surf2l, axis=2)


def calc_vdir(rayo, xyz):
    """Unit surface->camera directions [N, 3] (shape.py:112-119)."""
    return safe_l2_normalize(rayo - xyz, axis=1)


def normal_correct(normal, surf2c):
    """Flip normals facing away from the camera (nfr_unit.py:384-387)."""
    cos = jnp.sum(normal * surf2c, axis=-1, keepdims=True)
    return jnp.where(cos >= 0, normal, -normal)


def get_light(params):
    """Non-negative light (clip-preserve-grad), nfr_unit.py:320-327."""
    return clip_preserve_gradient(params["light"], 0.0, jnp.inf)


def get_gamma(params):
    """(bias, index) with index clipped to [0, 5] (nfr_unit.py:310-318)."""
    return (params["gamma_bias"],
            clip_preserve_gradient(params["gamma_index"], 0.0, 5.0))


def get_codebook(params):
    """clip[0,1] + column-L2-normalize (vq_nfr.py:761-769). [z_dim, K]."""
    cb = clip_preserve_gradient(params["codebook"], 0.0, 1.0)
    return safe_l2_normalize(cb, axis=0)
