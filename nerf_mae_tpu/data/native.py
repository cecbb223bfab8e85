"""ctypes bindings for the native host-side collate/augment library.

Builds native/collate.cpp on first use (g++ -O3 -shared); every function
has a numpy fallback so environments without a toolchain still work.
Correctness is pinned by tests/test_native.py (native == numpy reference).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import sys
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "collate.cpp")
_LIB_PATH = os.path.join(_REPO, "native", "libcollate.so")
_lib = None


def _build() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_SRC) > os.path.getmtime(_LIB_PATH)
        ):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", _LIB_PATH, _SRC],
                check=True, capture_output=True,
            )
            logger.info("built %s", _LIB_PATH)
        lib = ctypes.CDLL(_LIB_PATH)
        i64 = ctypes.c_int64
        fp = ctypes.POINTER(ctypes.c_float)
        lib.pad_to_cube.argtypes = [fp, i64, i64, i64, i64, fp, i64]
        lib.flip_axis.argtypes = [fp, i64, i64, i64, i64, ctypes.c_int, fp]
        lib.rot90_wl.argtypes = [fp, i64, i64, i64, i64, fp]
        lib.rotate_scale.argtypes = [fp, i64, i64, i64, i64,
                                     ctypes.c_float, ctypes.c_float, fp]
        lib.pad_to_patches.argtypes = [fp, i64, i64, i64, i64, fp, i64, i64]
        _lib = lib
    except Exception as e:  # no toolchain / build failure -> numpy fallback
        logger.warning("native collate unavailable (%s); using numpy", e)
        _lib = False
    return _lib or None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def available() -> bool:
    return _build() is not None


def pad_to_cube(g: np.ndarray, resolution: int) -> np.ndarray:
    lib = _build()
    g = np.ascontiguousarray(g, np.float32)
    if lib is None:
        out = np.zeros((resolution,) * 3 + (g.shape[3],), np.float32)
        cw = min(g.shape[0], resolution)
        cl = min(g.shape[1], resolution)
        ch = min(g.shape[2], resolution)
        out[:cw, :cl, :ch] = g[:cw, :cl, :ch]
        return out
    out = np.empty((resolution,) * 3 + (g.shape[3],), np.float32)
    lib.pad_to_cube(_ptr(g), *g.shape, _ptr(out), resolution)
    return out


def pad_to_patches(g: np.ndarray, resolution: int, patch: int) -> np.ndarray:
    """Fused pad-to-cube + patchify: (w, l, h, c) scene -> [t, t, t, p^3, c]
    patch-major layout (t = resolution // patch) in one memory pass. The
    host side of the patch-major input fast path (config.MAEConfig layout
    note); numpy fallback = pad_to_cube + ops.patchify.patchify_np."""
    lib = _build()
    g = np.ascontiguousarray(g, np.float32)
    t = resolution // patch
    if lib is None:
        from nerf_mae_tpu.ops.patchify import patchify_np

        return patchify_np(pad_to_cube(g, resolution)[None], patch)[0]
    out = np.empty((t, t, t, patch ** 3, g.shape[3]), np.float32)
    lib.pad_to_patches(_ptr(g), *g.shape, _ptr(out), resolution, patch)
    return out


def flip_axis(g: np.ndarray, axis: int) -> np.ndarray:
    lib = _build()
    g = np.ascontiguousarray(g, np.float32)
    if lib is None:
        return np.ascontiguousarray(np.flip(g, axis))
    out = np.empty_like(g)
    lib.flip_axis(_ptr(g), *g.shape, axis, _ptr(out))
    return out


def rot90_wl(g: np.ndarray) -> np.ndarray:
    lib = _build()
    g = np.ascontiguousarray(g, np.float32)
    if lib is None:
        return np.ascontiguousarray(np.flip(np.swapaxes(g, 0, 1), 0))
    out = np.empty((g.shape[1], g.shape[0], g.shape[2], g.shape[3]), np.float32)
    lib.rot90_wl(_ptr(g), *g.shape, _ptr(out))
    return out


def rotate_scale(g: np.ndarray, angle: float, scale: float) -> np.ndarray:
    lib = _build()
    g = np.ascontiguousarray(g, np.float32)
    if lib is None:
        from nerf_mae_tpu.data.datasets import rotate_and_scale_scene

        out, _ = rotate_and_scale_scene(g, None, angle, scale)
        return out
    out = np.empty_like(g)
    lib.rotate_scale(_ptr(g), *g.shape, ctypes.c_float(angle),
                     ctypes.c_float(scale), _ptr(out))
    return out
