"""LPIPS (AlexNet backbone) evaluated from an external weights file.

The reference's LPIPS runs a frozen TF AlexNet graph
(xiuminglib/metric.py:340-370) whose .pb is not shipped in the repo; this
module reproduces the LPIPS computation given an npz of weights with keys:
  conv{1..5}/kernel [kh, kw, cin, cout], conv{1..5}/bias [cout]
  lin{0..4}/kernel  [1, 1, cin, 1]
(the standard lpips 0.1 'alex' linear heads). Inputs in [0,1] are scaled to
[-1,1] and normalized by the LPIPS shift/scale constants.
"""

import numpy as np
from scipy.signal import fftconvolve

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float64)
_SCALE = np.array([0.458, 0.448, 0.450], np.float64)

_ALEX = [  # (stride, pad, pool_after)
    (4, 2, True),
    (1, 2, True),
    (1, 1, False),
    (1, 1, False),
    (1, 1, True),
]


def _conv2d(x, kernel, bias, stride, pad):
    kh, kw, cin, cout = kernel.shape
    x = np.pad(x, ((pad, pad), (pad, pad), (0, 0)))
    h = (x.shape[0] - kh) // stride + 1
    w = (x.shape[1] - kw) // stride + 1
    out = np.empty((h, w, cout), np.float64)
    # correlate per output channel via FFT over input channels
    for co in range(cout):
        acc = np.zeros(
            (x.shape[0] - kh + 1, x.shape[1] - kw + 1), np.float64)
        for ci in range(cin):
            acc += fftconvolve(
                x[..., ci], kernel[::-1, ::-1, ci, co], mode="valid")
        out[..., co] = (acc + bias[co])[::stride, ::stride][:h, :w]
    return out


def _maxpool(x, k=3, s=2):
    h = (x.shape[0] - k) // s + 1
    w = (x.shape[1] - k) // s + 1
    out = np.empty((h, w, x.shape[2]), x.dtype)
    for i in range(h):
        for j in range(w):
            out[i, j] = x[i * s : i * s + k, j * s : j * s + k].max(
                axis=(0, 1))
    return out


def _features(x, weights):
    feats = []
    for li, (stride, pad, pool) in enumerate(_ALEX, start=1):
        x = _conv2d(x, weights[f"conv{li}/kernel"],
                    weights[f"conv{li}/bias"], stride, pad)
        x = np.maximum(x, 0.0)
        feats.append(x)
        if pool:
            x = _maxpool(x)
    return feats


def lpips_from_weights(im1, im2, weights_path):
    weights = dict(np.load(weights_path))
    outs = []
    for im in (im1, im2):
        x = np.asarray(im, np.float64)
        if x.dtype == np.uint8 or x.max() > 1.5:
            x = x / 255.0
        x = x * 2.0 - 1.0
        x = (x - _SHIFT) / _SCALE
        outs.append(_features(x, weights))
    dist = 0.0
    for li, (f1, f2) in enumerate(zip(*outs)):
        n1 = f1 / np.maximum(
            np.sqrt(np.sum(f1**2, axis=-1, keepdims=True)), 1e-10)
        n2 = f2 / np.maximum(
            np.sqrt(np.sum(f2**2, axis=-1, keepdims=True)), 1e-10)
        diff = (n1 - n2) ** 2
        lin = weights[f"lin{li}/kernel"].reshape(-1)
        dist += float(np.mean(np.sum(diff * lin, axis=-1)))
    return dist
