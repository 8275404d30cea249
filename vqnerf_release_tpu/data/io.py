"""Image / array IO matching the reference's on-disk formats.

Parity targets:
  * 16-bit RGBA PNGs read as uint16 // 256 (geo/NeuS-ours2/nerfset.py:152-157)
  * xiuminglib img.load + normalize_uint (uint8/16 -> [0,1] float)
  * HDR (.hdr Radiance) and EXR envmaps (xiuminglib/io/{hdr,exr}.py) — read
    here via imageio/cv2 (no OpenEXR binding needed)
  * bilinear-antialias resize (nerfactor/util/img.py:100-139 wraps
    tf.image.resize(antialias=True)); we use cv2 INTER_AREA for downscale /
    INTER_LINEAR for upscale, which matches the antialias behavior closely
    (documented float-level divergence, not structural)
  * alpha_blend (nerfactor/util/img.py): fg * a + bg * (1 - a)
"""

import json
import os

import cv2
import numpy as np

__all__ = [
    "read_rgba16", "load_img_f32", "write_img", "read_hdr", "read_envmap",
    "resize", "alpha_blend", "read_json", "write_json", "vis_light",
    "sortglob",
]


def sortglob(directory, pattern="*", ext=None):
    import glob as _glob
    if ext is None:
        paths = _glob.glob(os.path.join(directory, pattern))
    else:
        if isinstance(ext, str):
            ext = (ext,)
        paths = []
        for e in ext:
            paths += _glob.glob(os.path.join(directory, "*." + e))
    return sorted(paths)


def read_rgba16(path, longint=True):
    """uint16 PNG -> uint8 (floor-divide by 256), as the stage-1 loaders do."""
    img = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    if longint and img.dtype == np.uint16:
        img = (img // 256).astype(np.uint8)
    if img.ndim == 3 and img.shape[2] >= 3:
        # BGR(A) -> RGB(A)
        img = img[..., [2, 1, 0] + ([3] if img.shape[2] == 4 else [])]
    return np.clip(img, 0, 255)


def load_img_f32(path):
    """Load any PNG/JPG to float32 in [0, 1] (xiuminglib load+normalize)."""
    img = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    if img.ndim == 3 and img.shape[2] >= 3:
        img = img[..., [2, 1, 0] + ([3] if img.shape[2] == 4 else [])]
    if img.dtype == np.uint8:
        return img.astype(np.float32) / 255.0
    if img.dtype == np.uint16:
        return img.astype(np.float32) / 65535.0
    return img.astype(np.float32)


def write_img(arr, path, clip=True):
    """float [0,1] (or uint8) -> 8-bit PNG. Returns the uint8 array
    (xiuminglib io.img.write_arr contract)."""
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        if clip:
            arr = np.clip(arr, 0.0, 1.0)
        arr = (arr * 255.0).round().astype(np.uint8)
    out = arr
    os.makedirs(os.path.dirname(str(path)) or ".", exist_ok=True)
    if arr.ndim == 3 and arr.shape[2] >= 3:
        arr = arr[..., [2, 1, 0] + ([3] if arr.shape[2] == 4 else [])]
    cv2.imwrite(str(path), arr)
    return out


def read_hdr(path):
    """Radiance .hdr -> float32 HxWx3 (linear)."""
    img = cv2.imread(str(path), cv2.IMREAD_UNCHANGED | cv2.IMREAD_ANYDEPTH)
    if img is None:
        import imageio.v2 as imageio
        return np.asarray(imageio.imread(path), np.float32)
    return img[..., ::-1].astype(np.float32)  # BGR -> RGB


def read_envmap(path, new_h=None):
    """.hdr/.exr/.npy envmap, optionally resized to height new_h."""
    ext = os.path.basename(str(path)).split(".")[-1].lower()
    if ext == "exr":
        # no EXR codec ships in cv2/imageio here; use our own reader
        from .exr import read_exr
        arr = read_exr(path)
        if arr.ndim == 3 and arr.shape[2] == 4:
            arr = arr[..., :3]
    elif ext == "hdr":
        arr = read_hdr(path)
    elif ext == "npy":
        arr = np.load(path).astype(np.float32)
    else:
        raise NotImplementedError(ext)
    if new_h is not None and arr.shape[0] != new_h:
        arr = resize(arr, new_h=new_h)
    return arr


def resize(img, new_h=None, new_w=None):
    """Antialiased bilinear resize (util/img.py:100-139 semantics)."""
    h, w = img.shape[:2]
    if new_h is not None and new_w is None:
        new_w = int(w / h * new_h)
    elif new_w is not None and new_h is None:
        new_h = int(h / w * new_w)
    if (new_h, new_w) == (h, w):
        return img
    interp = cv2.INTER_AREA if new_h < h else cv2.INTER_LINEAR
    squeeze = img.ndim == 3 and img.shape[2] == 1
    out = cv2.resize(np.asarray(img), (new_w, new_h), interpolation=interp)
    if img.ndim == 3 and out.ndim == 2 and not squeeze:
        out = out[..., None]
    if squeeze and out.ndim == 2:
        out = out[..., None]
    return out


def alpha_blend(fg, alpha, bg):
    """fg * alpha + bg * (1 - alpha); alpha broadcast to fg's channels."""
    fg = np.asarray(fg, np.float32)
    bg = np.asarray(bg, np.float32)
    alpha = np.asarray(alpha, np.float32)
    if alpha.ndim == fg.ndim - 1:
        alpha = alpha[..., None]
    return fg * alpha + bg * (1.0 - alpha)


def vis_light(light, outpath=None, h=None):
    """Tonemap an HDR envmap for visualization (util/light.py): clip by the
    max, gamma 1/2.2, to uint8."""
    light = np.asarray(light, np.float32)
    if h is not None and light.shape[0] != h:
        light = resize(light, new_h=h)
    maxv = max(float(light.max()), 1e-8)
    tonemapped = np.power(np.clip(light / maxv, 0, 1), 1.0 / 2.2)
    img = (tonemapped * 255).astype(np.uint8)
    if outpath is not None:
        write_img(img, outpath)
    return img


def read_json(path):
    with open(path) as f:
        return json.load(f)


def write_json(obj, path):
    os.makedirs(os.path.dirname(str(path)) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f, indent=2)
