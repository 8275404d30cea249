"""ctypes bindings for the native fast loader (native/fastloader).

Provides drop-in accelerated versions of the jitter-pair sampler's
selection/gather hot path and a fast .npy reader. Falls back to numpy when
the shared library has not been built (``make -C native/fastloader``).
"""

import ctypes
import os

import numpy as np

__all__ = ["native_available", "select_pairs", "gather_rows",
           "load_npy_f32", "outer_sample_native"]

_LIB = None


def _find_lib():
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cands = [
        os.path.join(here, "native", "fastloader", "libfastloader.so"),
        os.environ.get("VQNERF_FASTLOADER", ""),
    ]
    for c in cands:
        if c and os.path.exists(c):
            return c
    return None


def _lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = _find_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.select_pairs.restype = ctypes.c_int64
    lib.select_pairs.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_double, ctypes.c_int64,
        ctypes.c_int, ctypes.c_uint64, ctypes.POINTER(ctypes.c_int64)]
    lib.gather_rows.restype = None
    lib.gather_rows.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float)]
    lib.load_npy_f32.restype = ctypes.c_int64
    lib.load_npy_f32.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    _LIB = lib
    return lib


def native_available():
    return _lib() is not None


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def select_pairs(alpha, rgb, n_rays, jitter_mode="random",
                 alpha_thres=0.9, seed=0):
    """[2*n_rays, 2] interleaved (pixel, jitter) coords."""
    lib = _lib()
    h, w = alpha.shape
    alpha = np.ascontiguousarray(alpha, np.float32)
    rgb = np.ascontiguousarray(rgb, np.float32)
    out = np.empty((2 * n_rays, 2), np.int64)
    mode = 1 if jitter_mode == "contrast" else 0
    n_cand = lib.select_pairs(
        _fptr(alpha), _fptr(rgb), h, w, alpha_thres, n_rays, mode,
        ctypes.c_uint64(seed),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if n_cand < 0:
        raise ValueError("no foreground pixels above threshold")
    return out


def gather_rows(src, flat_idx):
    lib = _lib()
    src = np.ascontiguousarray(src, np.float32)
    flat_idx = np.ascontiguousarray(flat_idx, np.int64)
    n = flat_idx.shape[0]
    c = src.shape[1]
    out = np.empty((n, c), np.float32)
    lib.gather_rows(
        _fptr(src), c,
        flat_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
        _fptr(out))
    return out


def load_npy_f32(path, shape=None):
    lib = _lib()
    if shape is None:
        # peek the header via numpy (cheap) to size the buffer
        with open(path, "rb") as f:
            version = np.lib.format.read_magic(f)
            shape, _, _ = np.lib.format._read_array_header(f, version)
    n = int(np.prod(shape))
    out = np.empty(n, np.float32)
    got = lib.load_npy_f32(str(path).encode(), _fptr(out), n)
    if got < 0:
        raise IOError(f"load_npy_f32 failed ({got}) for {path}")
    assert got == n, (got, n)
    return out.reshape(shape)


def outer_sample_native(view, n_rays, seed, jitter_mode="random",
                        alpha_thres=0.9):
    """Native-accelerated outer_sample: identical output contract to
    data.sampler.outer_sample (interleaved fg jitter pairs), different RNG
    stream (xorshift vs numpy)."""
    h, w = view.h, view.w
    alpha = view.alpha.reshape(h, w)
    rgb = view.rgb.reshape(h, w, 3)
    coords = select_pairs(alpha, rgb, n_rays, jitter_mode=jitter_mode,
                          alpha_thres=alpha_thres, seed=seed)
    flat = coords[:, 0] * w + coords[:, 1]
    batch = {}
    for k in ("rayo", "rayd", "rgb", "alpha", "pred_alpha", "xyz",
              "normal", "lvis", "ref"):
        arr = getattr(view, k, None)
        if arr is None:
            continue
        batch[k] = gather_rows(arr.reshape(h * w, -1), flat)
    return batch
