"""Image quality metrics.

Parity targets: third_party/xiuminglib/xiuminglib/metric.py:
  * PSNR over uint8 images (data range 255), and PSNR_luma over the Y
    channel of YCbCr (ITU-R BT.601 weights), used by the trainers'
    metadata.json (nfr_unit.py:614, vq_nfr.py:1131)
  * SSIM: tf.image.ssim semantics — 11x11 Gaussian window sigma=1.5,
    K1=0.01, K2=0.03, mean over channels/windows
  * LPIPS: the reference runs a frozen TF AlexNet .pb whose weights are NOT
    in the repo checkout (metric.py:340-370); with zero egress we cannot
    fetch any pretrained net, so lpips() loads weights from
    VQNERF_LPIPS_WEIGHTS (npz of conv kernels + linear heads) when present
    and otherwise falls back to a documented gradient-domain proxy.

All numpy (evaluation is offline).
"""

import os

import numpy as np
from scipy.ndimage import convolve

__all__ = ["psnr", "psnr_luma", "ssim", "lpips", "lpips_impl", "mse"]


def _to_float(img):
    img = np.asarray(img)
    if img.dtype == np.uint8:
        return img.astype(np.float64), 255.0
    if img.dtype == np.uint16:
        return img.astype(np.float64), 65535.0
    return img.astype(np.float64), 1.0


def mse(im1, im2):
    a, _ = _to_float(im1)
    b, _ = _to_float(im2)
    return float(np.mean((a - b) ** 2))


def psnr(im1, im2):
    a, rng = _to_float(im1)
    b, _ = _to_float(im2)
    err = np.mean((a - b) ** 2)
    return float(10.0 * np.log10(rng**2 / max(err, 1e-12)))


def _luma(img):
    # ITU-R BT.601 (the PIL/YCbCr convention xiuminglib uses)
    return (0.299 * img[..., 0] + 0.587 * img[..., 1]
            + 0.114 * img[..., 2])


def psnr_luma(im1, im2):
    a, rng = _to_float(im1)
    b, _ = _to_float(im2)
    err = np.mean((_luma(a) - _luma(b)) ** 2)
    return float(10.0 * np.log10(rng**2 / max(err, 1e-12)))


def _gaussian_kernel(size=11, sigma=1.5):
    ax = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-0.5 * (ax / sigma) ** 2)
    k = np.outer(g, g)
    return k / k.sum()


def ssim(im1, im2, data_range=None, k1=0.01, k2=0.03):
    """tf.image.ssim-equivalent: Gaussian 11x11 sigma 1.5, per channel,
    mean over valid windows and channels."""
    a, rng_a = _to_float(im1)
    b, _ = _to_float(im2)
    rng = data_range if data_range is not None else rng_a
    if a.ndim == 2:
        a, b = a[..., None], b[..., None]
    kern = _gaussian_kernel()
    c1 = (k1 * rng) ** 2
    c2 = (k2 * rng) ** 2
    vals = []
    pad = 5
    for c in range(a.shape[2]):
        x, y = a[..., c], b[..., c]
        mu_x = convolve(x, kern, mode="constant")
        mu_y = convolve(y, kern, mode="constant")
        xx = convolve(x * x, kern, mode="constant")
        yy = convolve(y * y, kern, mode="constant")
        xy = convolve(x * y, kern, mode="constant")
        var_x = xx - mu_x**2
        var_y = yy - mu_y**2
        cov = xy - mu_x * mu_y
        s = ((2 * mu_x * mu_y + c1) * (2 * cov + c2)) / (
            (mu_x**2 + mu_y**2 + c1) * (var_x + var_y + c2))
        # valid region only (tf uses 'valid' window placement)
        vals.append(s[pad:-pad, pad:-pad])
    return float(np.mean(vals))


def _lpips_proxy(im1, im2):
    """Documented LPIPS substitute when no weights are available: mean of
    pixel L2 and gradient-magnitude L2 in [0,1] space — monotone with
    perceptual difference on the distortions we evaluate, NOT the published
    LPIPS scale."""
    a, rng = _to_float(im1)
    b, _ = _to_float(im2)
    a, b = a / rng, b / rng
    gax, gay = np.gradient(_luma(a) if a.ndim == 3 else a)
    gbx, gby = np.gradient(_luma(b) if b.ndim == 3 else b)
    pix = np.mean((a - b) ** 2)
    grad = np.mean((gax - gbx) ** 2 + (gay - gby) ** 2)
    return float(np.sqrt(pix) + np.sqrt(grad))


_PROXY_WARNED = False


def lpips_impl():
    """Which backend lpips() will use: "alexnet" (real LPIPS from
    VQNERF_LPIPS_WEIGHTS) or "proxy" (gradient-domain substitute on a
    DIFFERENT scale). Writers of metric JSONs record this next to every
    "lpips" value so proxy and real scores are distinguishable downstream
    (ADVICE r1: the silent fallback made them indistinguishable)."""
    weights_path = os.environ.get("VQNERF_LPIPS_WEIGHTS", "")
    if weights_path and os.path.exists(weights_path):
        return "alexnet"
    return "proxy"


def lpips(im1, im2):
    global _PROXY_WARNED
    if lpips_impl() == "alexnet":
        from .lpips_net import lpips_from_weights
        return lpips_from_weights(
            im1, im2, os.environ["VQNERF_LPIPS_WEIGHTS"])
    if not _PROXY_WARNED:
        _PROXY_WARNED = True
        import warnings
        warnings.warn(
            "VQNERF_LPIPS_WEIGHTS unset: 'lpips' values are the documented "
            "gradient-domain proxy, not AlexNet LPIPS (different scale). "
            "Output JSONs carry lpips_impl='proxy'.")
    return _lpips_proxy(im1, im2)
