"""Native (C++/OpenMP) host-side augmentation kernels with scipy fallback.

The TPU compute path is JAX/XLA/Pallas; this package covers the HOST hot
path — the geometric augmentation resampling that feeds the chip
(``data/augmentation.py``). scipy's float64 ``map_coordinates`` +
``gaussian_filter`` cap one worker at a few 128^3 patches/s; the C++ loops
(float32 resample, fused separable gaussian, OpenMP across grid lines)
remove that ceiling on multi-core TPU hosts.

Usage: call :func:`get_lib` — returns the loaded ctypes library, building it
with ``build.sh`` (plain ``g++``) on first use, or ``None`` when no
toolchain is available / ``MDT_NO_NATIVE=1``; callers fall back to scipy.
Exact scipy parity is pinned by ``tests/test_native_resample.py``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libmdtresample.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _signatures(lib):
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.resample_linear_f32.argtypes = [
        f32p, i64p, ctypes.c_int, f64p, ctypes.c_int64, ctypes.c_float, f32p
    ]
    lib.resample_nearest_u8.argtypes = [
        u8p, i64p, ctypes.c_int, f64p, ctypes.c_int64, ctypes.c_uint8, u8p
    ]
    lib.gaussian_f64.argtypes = [f64p, i64p, ctypes.c_int, ctypes.c_double, ctypes.c_double]
    lib.build_coords_f64.argtypes = [
        ctypes.c_void_p, f64p, ctypes.c_double, i64p, ctypes.c_int, f64p, f64p
    ]
    lib.native_num_threads.restype = ctypes.c_int
    lib.wbc_greedy.argtypes = [
        f64p, ctypes.c_int64, ctypes.c_int32, i64p, i64p,
        ctypes.c_double, ctypes.c_double, f64p, f64p, i64p,
    ]
    lib.nms_2to3d.argtypes = [
        f64p, ctypes.c_int64, i64p, ctypes.c_double, i64p, f64p, i64p,
    ]
    return lib


def get_lib():
    """The loaded native library, or None (then use the scipy path)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("MDT_NO_NATIVE") == "1":
            return None
        try:
            # rebuild keyed on a content hash of the source, not mtimes:
            # after a fresh clone mtimes are checkout-time (arbitrary order),
            # and a stale-but-loadable binary would otherwise be used silently
            import hashlib

            h = hashlib.sha256()
            for src in ("resample.cpp", "wbc.cpp"):
                with open(os.path.join(_HERE, src), "rb") as f:
                    h.update(f.read())
            src_hash = h.hexdigest()
            hash_file = _SO + ".srchash"
            built_hash = None
            if os.path.isfile(hash_file):
                with open(hash_file) as f:
                    built_hash = f.read().strip()
            if not os.path.isfile(_SO) or built_hash != src_hash:
                subprocess.run(
                    ["sh", os.path.join(_HERE, "build.sh")],
                    check=True, capture_output=True, timeout=120,
                )
                with open(hash_file, "w") as f:
                    f.write(src_hash)
            _lib = _signatures(ctypes.CDLL(_SO))
        except Exception:  # no toolchain / load failure -> scipy fallback
            _lib = None
        return _lib


def map_coordinates_linear(src: np.ndarray, coords: np.ndarray, cval: float) -> np.ndarray:
    """scipy.ndimage.map_coordinates(order=1, mode='constant') equivalent.

    src: float array (any dtype, computed in float32); coords: (dim, *out).
    """
    lib = get_lib()
    if lib is None:
        from scipy import ndimage

        return ndimage.map_coordinates(
            src.astype(np.float64), coords, order=1, mode="constant", cval=cval
        ).astype(np.float32)
    out_shape = coords.shape[1:]
    flat = np.ascontiguousarray(coords.reshape(coords.shape[0], -1), np.float64)
    out = np.empty(flat.shape[1], np.float32)
    lib.resample_linear_f32(
        np.ascontiguousarray(src, np.float32),
        np.asarray(src.shape, np.int64), src.ndim,
        flat, flat.shape[1], np.float32(cval), out,
    )
    return out.reshape(out_shape)


def map_coordinates_nearest(src: np.ndarray, coords: np.ndarray, cval: int = 0) -> np.ndarray:
    """scipy.ndimage.map_coordinates(order=0, mode='constant') for uint8 seg."""
    lib = get_lib()
    if lib is None:
        from scipy import ndimage

        return ndimage.map_coordinates(src, coords, order=0, mode="constant", cval=cval)
    out_shape = coords.shape[1:]
    flat = np.ascontiguousarray(coords.reshape(coords.shape[0], -1), np.float64)
    out = np.empty(flat.shape[1], np.uint8)
    lib.resample_nearest_u8(
        np.ascontiguousarray(src, np.uint8),
        np.asarray(src.shape, np.int64), src.ndim,
        flat, flat.shape[1], np.uint8(cval), out,
    )
    return out.reshape(out_shape).astype(src.dtype)


def build_coords(elastic, rot, scale, patch_size, center_in):
    """Fused sampling grid: rot/scale/elastic/center in one pass, or None
    when the native library is unavailable (callers use the NumPy path).

    elastic: (dim, *patch) float64 displacement (already * alpha) or None;
    rot: (dim, dim); center_in: per-axis input-center offsets.
    """
    lib = get_lib()
    if lib is None:
        return None
    patch = np.asarray(patch_size, np.int64)
    dim = len(patch_size)
    out = np.empty((dim,) + tuple(patch_size), np.float64)
    e_arg = None
    if elastic is not None:
        elastic = np.ascontiguousarray(elastic, np.float64)
        e_arg = elastic.ctypes.data_as(ctypes.c_void_p)
    lib.build_coords_f64(
        e_arg, np.ascontiguousarray(rot, np.float64), float(scale),
        patch, dim, np.ascontiguousarray(center_in, np.float64), out,
    )
    return out


def gaussian_filter_constant(arr: np.ndarray, sigma: float, truncate: float = 4.0) -> np.ndarray:
    """scipy.ndimage.gaussian_filter(mode='constant', cval=0) equivalent."""
    lib = get_lib()
    if lib is None:
        from scipy import ndimage

        return ndimage.gaussian_filter(arr, sigma, mode="constant", cval=0, truncate=truncate)
    buf = np.ascontiguousarray(arr, np.float64).copy()
    lib.gaussian_f64(buf, np.asarray(buf.shape, np.int64), buf.ndim, float(sigma), float(truncate))
    return buf.astype(arr.dtype) if arr.dtype != np.float64 else buf


def wbc_greedy(dets: np.ndarray, patch_codes: np.ndarray, order: np.ndarray,
               thresh: float, n_ens: float):
    """Native weighted box clustering (predictor.weighted_box_clustering
    semantics; the caller supplies the seed order and integer patch codes).
    Returns (keep_scores, keep_coords) or None when the library is absent."""
    lib = get_lib()
    if lib is None:
        return None
    n, cols = dets.shape
    nc = cols - 3
    keep_scores = np.empty(n, np.float64)
    keep_coords = np.empty((n, nc), np.float64)
    n_keep = np.zeros(1, np.int64)
    lib.wbc_greedy(
        np.ascontiguousarray(dets, np.float64), n, nc // 2,
        np.ascontiguousarray(patch_codes, np.int64),
        np.ascontiguousarray(order, np.int64),
        float(thresh), float(n_ens), keep_scores, keep_coords, n_keep,
    )
    k = int(n_keep[0])
    return keep_scores[:k], keep_coords[:k]


def nms_2to3d(dets: np.ndarray, order: np.ndarray, thresh: float):
    """Native 2D-slice -> 3D-cube clustering (predictor.nms_2to3D semantics;
    caller supplies the score order). Returns (keep_indices, keep_z) or None
    when the library is absent."""
    lib = get_lib()
    if lib is None:
        return None
    n = dets.shape[0]
    keep = np.empty(n, np.int64)
    keep_z = np.empty((n, 2), np.float64)
    n_keep = np.zeros(1, np.int64)
    lib.nms_2to3d(
        np.ascontiguousarray(dets, np.float64), n,
        np.ascontiguousarray(order, np.int64), float(thresh),
        keep, keep_z, n_keep,
    )
    k = int(n_keep[0])
    return keep[:k], keep_z[:k]
