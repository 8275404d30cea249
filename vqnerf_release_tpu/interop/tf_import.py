"""Import reference TensorFlow checkpoints into our param pytrees.

The reference saves the decomposition stage with
``tf.train.Checkpoint(step, optimizer, net=model)``
(decomp/nerfvq_nfr3/nerfactor/trainvali.py:162-169). Because the model's
``net`` dict holds plain (non-trackable) ``networks/base.py:21-26`` Network
objects, the ONLY layer weights that reach the checkpoint are the keras
Dense layers aliased directly onto the model as ``net_<name>_layer<i>`` by
``register_trainable`` (models/base.py:81-104), plus the lazily-created
``tf.Variable`` attributes (``_light`` nfr_unit.py:320-327, ``_gamma_bias``
/ ``_gamma_index`` nfr_unit.py:51-54 & 310-318 — present only for
data_type != 'nerf', ``_codebook`` vq_nfr.py:761-767) and the sonnet EMA
modules inside ``vq_layer`` (networks/vq_layers.py:246-256).

Object-graph checkpoint keys are attribute paths, e.g.::

    net/net_fine_enc_layer0/kernel/.ATTRIBUTES/VARIABLE_VALUE
    net/_light/.ATTRIBUTES/VARIABLE_VALUE
    net/vq_layer/ema_cluster_size/_hidden/.ATTRIBUTES/VARIABLE_VALUE

We match those paths with key patterns rather than rebuilding the TF object
graph, so the importer has no keras/sonnet dependency and tolerates extra
bookkeeping keys (optimizer slots, save_counter, ...). Kernel layout is the
same as ours ([d_in, d_out], y = x @ W + b), so no transposes are needed;
the codebook is stored [z_dim, K] (vq_nfr.py:765), matching
``params['codebook']``.

A per-phase import notes which net-dict entries are NOT in the checkpoint:
the ref_nfr phase freezes the borrowed vq nets (ref_nfr.py:143), keras
propagates ``trainable=False`` to them, and register_trainable skips
non-trainable layers — so ref_nfr checkpoints carry only the fresh heads
and the frozen subtree must come from the vq checkpoint.
"""

import os
import re

import jax.numpy as jnp
import numpy as np

from ..models import decomp_common as dc
from ..models.nfr_unit import init_nfr_unit
from ..models.ref_nfr import init_ref_nfr
from ..models.vq_nfr import init_vq_nfr
from ..ops.vq import VqEmaState

__all__ = [
    "import_nfr_unit", "import_vq_nfr", "import_ref_nfr",
    "infer_decomp_config", "as_train_state",
]

_SUFFIX = r"/\.ATTRIBUTES/VARIABLE_VALUE$"


def _tf():
    import tensorflow as tf  # local: heavy, and only interop needs it
    try:
        tf.config.set_visible_devices([], "GPU")
    except Exception:
        pass
    return tf


def _reader(path):
    """CheckpointReader for a prefix, or the latest prefix in a directory
    (also looks under <path>/checkpoints, the reference's layout)."""
    tf = _tf()
    prefix = path
    if os.path.isdir(path):
        prefix = tf.train.latest_checkpoint(path)
        if prefix is None:
            prefix = tf.train.latest_checkpoint(
                os.path.join(path, "checkpoints"))
        if prefix is None:
            raise FileNotFoundError(
                f"no TF checkpoint under {path} (need a 'checkpoint' index "
                "file; pass an explicit ckpt-N prefix otherwise)")
    return tf.train.load_checkpoint(prefix), prefix


def _value_keys(reader):
    return [k for k in reader.get_variable_to_shape_map()
            if re.search(_SUFFIX, k)]


def _collect_mlp(reader, keys, name, n_layers):
    """[{'w','b'}] for the ``net_<name>_layer<i>`` Dense aliases."""
    # TF 2.4-era keras names the Dense weight 'kernel'; modern keras uses
    # '_kernel' — accept both so checkpoints written by either era import
    pat = re.compile(
        r"(?:^|/)net_%s_layer(\d+)/_?(kernel|bias)%s"
        % (re.escape(name), _SUFFIX))
    found = {}
    for k in keys:
        m = pat.search(k)
        if m:
            found.setdefault(int(m.group(1)), {})[m.group(2)] = k
    if sorted(found) != list(range(n_layers)):
        raise KeyError(
            f"net '{name}': expected layers 0..{n_layers - 1}, found "
            f"{sorted(found)} — is this the right phase's checkpoint?")
    out = []
    for i in range(n_layers):
        if set(found[i]) != {"kernel", "bias"}:
            raise KeyError(f"net '{name}' layer {i}: missing kernel or bias")
        out.append({
            "w": jnp.asarray(reader.get_tensor(found[i]["kernel"]),
                             jnp.float32),
            "b": jnp.asarray(reader.get_tensor(found[i]["bias"]),
                             jnp.float32),
        })
    return out


def _var(reader, keys, attr, required=True):
    pat = re.compile(r"(?:^|/)%s%s" % (re.escape(attr), _SUFFIX))
    hits = [k for k in keys if pat.search(k)]
    if len(hits) > 1:
        raise KeyError(f"variable '{attr}' is ambiguous: {hits}")
    if not hits:
        if required:
            raise KeyError(f"variable '{attr}' not found in checkpoint")
        return None
    return np.asarray(reader.get_tensor(hits[0]))


def _ema_field(reader, keys, which, field):
    """Sonnet ExponentialMovingAverage variable under vq_layer: ``which``
    is 'cluster_size' or 'dw'; ``field`` is hidden/average/counter (the
    underscore prefix on sonnet's private attrs is optional in the match).
    """
    pat = re.compile(r"(?:^|/)_?%s%s" % (re.escape(field), _SUFFIX))
    hits = [k for k in keys
            if ("vq_layer" in k and which in k and pat.search(k))]
    if len(hits) != 1:
        return None
    return np.asarray(reader.get_tensor(hits[0]))


def _check_like(expected, got, what):
    e, g = np.shape(expected), np.shape(got)
    if tuple(e) != tuple(g):
        raise ValueError(f"{what}: checkpoint shape {g} != expected {e} "
                         "(config mismatch?)")
    return jnp.asarray(got, jnp.float32)


def _check_mlp(expected, got, what):
    return [
        {k: _check_like(e[k], g[k], f"{what}[{i}].{k}") for k in ("w", "b")}
        for i, (e, g) in enumerate(zip(expected, got))
    ]


def infer_decomp_config(path, phase="vq_nfr", data_type=None, **overrides):
    """Build a DecompConfig from checkpoint tensor shapes.

    mlp_width/z_dim come from the encoder kernels (rgb_enc for ref_nfr,
    which has no encoder of its own), light_h from ``_light``, num_embed
    from ``_codebook``; data_type defaults to 'hw' when gamma variables are
    present and 'nerf' otherwise (nfr_unit.py:51-54 — 'dtu' is
    indistinguishable from 'hw' at the checkpoint level; override if so).
    """
    reader, _ = _reader(path)
    keys = _value_keys(reader)
    shapes = reader.get_variable_to_shape_map()

    def shape_of(regex):
        pat = re.compile(regex)
        hits = [k for k in keys if pat.search(k)]
        if len(hits) != 1:
            raise KeyError(f"want exactly one key matching {regex}, got "
                           f"{hits}")
        return shapes[hits[0]]

    cfg_kw = {}
    if phase == "ref_nfr":
        cfg_kw["z_dim"] = shape_of(
            r"(?:^|/)net_rgb_enc_layer0/_?kernel" + _SUFFIX)[1]
        # ref_nfr's light is a plain tensor, not a Variable
        # (ref_nfr.py:90), so real ref checkpoints carry no _light —
        # callers must supply light_h (import_ref_nfr forwards the vq
        # checkpoint's)
        try:
            cfg_kw["light_h"] = shape_of(r"(?:^|/)_light" + _SUFFIX)[0]
        except KeyError:
            pass
    else:
        cfg_kw["mlp_width"] = shape_of(
            r"(?:^|/)net_fine_enc_layer0/_?kernel" + _SUFFIX)[1]
        cfg_kw["z_dim"] = shape_of(
            r"(?:^|/)net_bottleneck_layer2/_?kernel" + _SUFFIX)[1]
        cfg_kw["light_h"] = shape_of(r"(?:^|/)_light" + _SUFFIX)[0]
    if phase == "vq_nfr":
        num_embed = shape_of(r"(?:^|/)_codebook" + _SUFFIX)[1]
        num_drop = min(dc.DecompConfig.num_drop, max(num_embed - 1, 0))
        cfg_kw["num_embed"] = num_embed
        cfg_kw["num_drop"] = num_drop
        # keep train_thres() consistent for any num_drop
        cfg_kw["thres_str"] = ";".join(
            "%.4f" % t for t in np.linspace(0.1, 0.65, num_drop))
    if data_type is None:
        has_gamma = any(re.search(r"(?:^|/)_gamma_bias" + _SUFFIX, k)
                        for k in keys)
        data_type = "hw" if has_gamma else "nerf"
    cfg_kw["data_type"] = data_type
    cfg_kw.update(overrides)
    return dc.DecompConfig(**cfg_kw)


def _import_gamma(reader, keys, params, cfg):
    gb = _var(reader, keys, "_gamma_bias", required=not cfg.is_nerf)
    gi = _var(reader, keys, "_gamma_index", required=not cfg.is_nerf)
    if gb is not None and gi is not None:
        one = np.zeros((1,), np.float32)
        params["gamma_bias"] = _check_like(one, gb, "gamma_bias")
        params["gamma_index"] = _check_like(one, gi, "gamma_index")


def import_nfr_unit(path, cfg=None):
    """Reference nfr_unit checkpoint -> our nfr_unit params.

    Net layout per nfr_unit.py:110-129: fine_enc/bottleneck/diff_out/
    spec_out/rough_out (+ _light, and gamma for real data).
    Returns (params, cfg).
    """
    if cfg is None:
        cfg = infer_decomp_config(path, "nfr_unit")
    reader, _ = _reader(path)
    keys = _value_keys(reader)
    expected = init_nfr_unit(0, cfg)
    params = {
        name: _check_mlp(expected[name],
                         _collect_mlp(reader, keys, name, len(expected[name])),
                         name)
        for name in ("fine_enc", "bottleneck",
                     "diff_out", "spec_out", "rough_out")
    }
    params["light"] = _check_like(
        expected["light"], _var(reader, keys, "_light"), "light")
    _import_gamma(reader, keys, params, cfg)
    return params, cfg


def _import_ema(reader, keys, cfg):
    """VqEmaState from the sonnet EMA variables. Falls back to the
    debiased ``average`` when only it is present (for a converged
    checkpoint hidden == average * (1 - decay^counter) ~= average)."""
    counter = _ema_field(reader, keys, "cluster_size", "counter")
    counter_i = int(counter) if counter is not None else 1_000_000

    def hidden_of(which, shape):
        h = _ema_field(reader, keys, which, "hidden")
        if h is None:
            avg = _ema_field(reader, keys, which, "average")
            if avg is None:
                raise KeyError(
                    f"vq_layer ema_{which}: neither hidden nor average "
                    "found in checkpoint")
            h = avg * (1.0 - cfg.vq_decay ** min(counter_i, 1_000_000))
        return _check_like(np.zeros(shape, np.float32), h, f"ema_{which}")

    return VqEmaState(
        hidden_cluster_size=hidden_of("cluster_size", (cfg.num_embed,)),
        hidden_dw=hidden_of("dw", (cfg.z_dim, cfg.num_embed)),
        counter=jnp.asarray(counter_i, jnp.int32),
    )


def import_vq_nfr(path, cfg=None):
    """Reference vq_nfr checkpoint -> (params, VqEmaState, cfg).

    Net layout per vq_nfr.py:135-165: the three fresh *_vq heads plus the
    borrowed nfr nets re-keyed as fine_enc/bottleneck/diff_main/spec_main/
    rough_main (all trainable, hence all checkpointed), _codebook
    ([z_dim, K], vq_nfr.py:765), _light, EMA stats, gamma for real data.
    """
    if cfg is None:
        cfg = infer_decomp_config(path, "vq_nfr")
    reader, _ = _reader(path)
    keys = _value_keys(reader)
    nfr_expected = init_nfr_unit(0, cfg)
    expected, _ = init_vq_nfr(
        0, cfg, nfr_expected,
        np.zeros((cfg.num_embed, cfg.z_dim), np.float32))
    params = {
        name: _check_mlp(expected[name],
                         _collect_mlp(reader, keys, name, len(expected[name])),
                         name)
        for name in ("fine_enc", "bottleneck", "diff_main", "spec_main",
                     "rough_main", "diff_vq", "spec_vq", "rough_vq")
    }
    params["light"] = _check_like(
        expected["light"], _var(reader, keys, "_light"), "light")
    params["codebook"] = _check_like(
        expected["codebook"], _var(reader, keys, "_codebook"), "codebook")
    _import_gamma(reader, keys, params, cfg)
    return params, _import_ema(reader, keys, cfg), cfg


def import_ref_nfr(ref_path, vq_path, cfg=None):
    """Reference ref_nfr checkpoint -> our {'frozen', 'train'} params.

    The ref phase checkpoints ONLY its fresh trainable heads (rgb_enc/
    diff_out/rough_out, ref_nfr.py:148-153) plus _light and gamma: the
    borrowed vq nets are frozen (ref_nfr.py:143) so register_trainable
    never aliases them. The frozen encoder/spec head therefore come from
    the vq checkpoint, exactly as the reference reconstructs them at load
    (ref_nfr.py:139-147). Returns (params, cfg).
    """
    vq_params, _, vq_cfg = import_vq_nfr(vq_path, cfg)
    if cfg is None:
        cfg = infer_decomp_config(
            ref_path, "ref_nfr", data_type=vq_cfg.data_type,
            mlp_width=vq_cfg.mlp_width, light_h=vq_cfg.light_h,
            num_embed=vq_cfg.num_embed, num_drop=vq_cfg.num_drop)
    if cfg.z_dim != vq_cfg.z_dim:
        raise ValueError(
            f"ref z_dim {cfg.z_dim} != vq z_dim {vq_cfg.z_dim}")
    reader, _ = _reader(ref_path)
    keys = _value_keys(reader)
    light = _var(reader, keys, "_light", required=False)
    if light is None:  # pre-refinement export: keep the vq light
        light = vq_params["light"]
    expected = init_ref_nfr(0, cfg, vq_params, np.asarray(light))
    train = {
        name: _check_mlp(expected["train"][name],
                         _collect_mlp(reader, keys, name,
                                      len(expected["train"][name])),
                         name)
        for name in ("rgb_enc", "diff_out", "rough_out")
    }
    _import_gamma(reader, keys, train, cfg)
    params = {
        "frozen": {
            "fine_enc": vq_params["fine_enc"],
            "bottleneck": vq_params["bottleneck"],
            "spec_out": vq_params["spec_main"],
            "light": _check_like(expected["frozen"]["light"], light,
                                 "light"),
        },
        "train": train,
    }
    return params, cfg


def as_train_state(phase, cfg, params, ema_state=None, epoch=0):
    """Wrap imported params in the exact state dict our training loops
    checkpoint (train/loop.py), with a fresh optimizer, so the result can
    be saved with utils.ckpt.save_ckpt and picked up by --resume or the
    test driver."""
    from ..train import decomp_trainer as dt
    lxyz, lareas = dc.light_constants(cfg)
    if phase == "nfr_unit":
        tx, _ = dt.make_nfr_unit_step(cfg, lxyz, lareas)
        return {"params": params, "opt_state": tx.init(params),
                "epoch": epoch}
    if phase == "vq_nfr":
        if ema_state is None:
            raise ValueError("vq_nfr state needs ema_state")
        tx, _ = dt.make_vq_nfr_step(cfg, lxyz, lareas)
        return {"params": params, "ema": ema_state,
                "opt_state": tx.init(params), "epoch": epoch}
    if phase == "ref_nfr":
        tx, _ = dt.make_ref_nfr_step(cfg, lxyz, lareas)
        return {"params": params, "opt_state": tx.init(params["train"]),
                "epoch": epoch}
    raise ValueError(f"unknown phase {phase!r}")
