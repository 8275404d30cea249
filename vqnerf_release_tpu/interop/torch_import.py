"""Import reference NeuS (stage-1) torch checkpoints into our pytrees.

The reference saves geometry training as a torch pickle
(geo/NeuS-ours2/nerf_runner.py:221-233) with state dicts under
'sdf_network_fine' / 'color_network_fine' / 'variance_network_fine' /
'nerf' plus 'optimizer' and 'iter_step'. Module parameter names
(models/fields.py):

  * SDF / color nets: ``lin{l}.weight_v`` [out, in], ``lin{l}.weight_g``
    [out, 1], ``lin{l}.bias`` (old-style ``nn.utils.weight_norm``,
    fields.py:66,141) — our wn params store v transposed ([in, out],
    column norms), same math (ops/nn.py:84-108).
  * background NeRF: ``pts_linears.{i}`` / ``views_linears.0`` /
    ``feature_linear`` / ``alpha_linear`` / ``rgb_linear``
    (fields.py:210-225); torch Linear weights are [out, in] -> transposed.
  * variance: scalar parameter ``variance`` (fields.py:260).

Loaded with ``weights_only=True`` so untrusted pickles cannot execute
code; the optimizer state is intentionally dropped (ours is optax).
"""

import os
import re

import jax.numpy as jnp
import numpy as np

__all__ = ["import_neus"]


def _load(path):
    import torch  # local: only interop needs it
    if os.path.isdir(path):
        ckptdir = path
        if os.path.isdir(os.path.join(path, "checkpoints")):
            ckptdir = os.path.join(path, "checkpoints")
        names = sorted(n for n in os.listdir(ckptdir) if n.endswith(".pth"))
        if not names:
            raise FileNotFoundError(f"no .pth checkpoints under {ckptdir}")
        path = os.path.join(ckptdir, names[-1])
    return torch.load(path, map_location="cpu", weights_only=True), path


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach")
                      else t)


def _check(expected, got, what):
    if tuple(np.shape(expected)) != tuple(np.shape(got)):
        raise ValueError(f"{what}: checkpoint shape {np.shape(got)} != "
                         f"expected {np.shape(expected)} (config mismatch?)")
    return jnp.asarray(got, jnp.float32)


def _wn_layers(sd, expected, what):
    """State dict with lin{l}.weight_v/weight_g/bias -> our wn list."""
    n = max(int(m.group(1)) for k in sd
            if (m := re.fullmatch(r"lin(\d+)\.weight_v", k))) + 1
    if n != len(expected):
        raise ValueError(f"{what}: {n} layers in checkpoint, expected "
                         f"{len(expected)}")
    out = []
    for l in range(n):
        v = _np(sd[f"lin{l}.weight_v"]).T  # [out, in] -> [in, out]
        g = _np(sd[f"lin{l}.weight_g"]).reshape(-1)
        b = _np(sd[f"lin{l}.bias"])
        out.append({
            "v": _check(expected[l]["v"], v, f"{what}.lin{l}.v"),
            "g": _check(expected[l]["g"], g, f"{what}.lin{l}.g"),
            "b": _check(expected[l]["b"], b, f"{what}.lin{l}.b"),
        })
    return out


def _dense(sd, name, expected, what):
    return {
        "w": _check(expected["w"], _np(sd[f"{name}.weight"]).T,
                    f"{what}.w"),
        "b": _check(expected["b"], _np(sd[f"{name}.bias"]), f"{what}.b"),
    }


def import_neus(path, cfg):
    """Reference NeuS .pth checkpoint (or its exp dir) -> (params,
    iter_step) matching models/neus.init_neus structure. ``cfg`` is a
    NeuSConfig; the background net is imported only when cfg.n_outside>0.
    """
    from ..models.neus import init_neus
    ckpt, resolved = _load(path)
    expected = init_neus(0, cfg)

    params = {
        "sdf": _wn_layers(ckpt["sdf_network_fine"], expected["sdf"],
                          "sdf"),
        "color": _wn_layers(ckpt["color_network_fine"], expected["color"],
                            "color"),
        "variance": {"variance": _check(
            expected["variance"]["variance"],
            _np(ckpt["variance_network_fine"]["variance"]).reshape(()),
            "variance")},
    }
    if "bg" in expected:
        sd = ckpt["nerf"]
        bg_e = expected["bg"]
        params["bg"] = {
            "pts": [_dense(sd, f"pts_linears.{i}", bg_e["pts"][i],
                           f"bg.pts{i}")
                    for i in range(len(bg_e["pts"]))],
            "views": [_dense(sd, "views_linears.0", bg_e["views"][0],
                             "bg.views0")],
            "feature": _dense(sd, "feature_linear", bg_e["feature"],
                              "bg.feature"),
            "alpha": _dense(sd, "alpha_linear", bg_e["alpha"], "bg.alpha"),
            "rgb": _dense(sd, "rgb_linear", bg_e["rgb"], "bg.rgb"),
        }
    return params, int(ckpt.get("iter_step", 0))
