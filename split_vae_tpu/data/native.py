"""ctypes binding for the native (C++) MultiCUB generator.

Builds ``native/libmulticub.so`` from source on first use (g++, cached by
mtime) and exposes ``generate()`` with the same contract as the Python
``MultiCUB.create_dataset`` path. Falls back silently (returns None loader)
when no compiler is available so the pure-numpy path keeps working.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", "native")
_SRC = os.path.join(_NATIVE_DIR, "multicub_gen.cpp")
_SO = os.path.join(_NATIVE_DIR, "libmulticub.so")

BG_MODES = {
    "solid_fixed": 0,
    "unseen_solid_fixed": 0,
    "solid_random": 1,
    "white": 2,
    # ckb handled specially (mode 3 / 4 for rotated)
}

_lib = None
_build_failed = False


def _ensure_built() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                check=True, capture_output=True, timeout=300)
        lib = ctypes.CDLL(_SO)
        lib.multicub_generate.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,      # sprites, n_sprites
            ctypes.POINTER(ctypes.c_float),                    # out_images
            ctypes.POINTER(ctypes.c_float),                    # out_counts
            ctypes.c_int, ctypes.c_int, ctypes.c_int,          # n_samples, size, max_objects
            ctypes.c_int,                                      # bg_mode
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,      # palette, n_colors
            ctypes.c_int, ctypes.c_uint64,                     # cell, seed
        ]
        lib.multicub_generate.restype = None
        _lib = lib
        return _lib
    except Exception:
        _build_failed = True
        return None


def generate(
    sprites: np.ndarray,
    n_samples: int,
    size: int,
    bg: str,
    palette: np.ndarray,
    max_objects: int = 5,
    seed: int = 0,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native batch generation; returns (images [N,S,S,3] in [0,1], counts)
    or None when the native library is unavailable or the bg mode is not
    supported natively."""
    lib = _ensure_built()
    if lib is None:
        return None
    if "rot" in bg:
        mode, cell = 4, int(bg[-1])
    elif "ckb" in bg:
        mode, cell = 3, int(bg[0]) if bg[0].isdigit() else 0
        if cell == 0:
            return None
    elif bg.replace("unseen_", "") in BG_MODES or bg in BG_MODES:
        mode, cell = BG_MODES.get(bg, BG_MODES.get(bg.replace("unseen_", ""), 0)), 0
    else:
        return None  # texture etc: numpy path

    sprites = np.ascontiguousarray(sprites, np.float32)
    palette = np.ascontiguousarray(palette, np.float32)
    out = np.empty((n_samples, size, size, 3), np.float32)
    counts = np.empty((n_samples,), np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    lib.multicub_generate(
        sprites.ctypes.data_as(fp), sprites.shape[0],
        out.ctypes.data_as(fp), counts.ctypes.data_as(fp),
        n_samples, size, max_objects, mode,
        palette.ctypes.data_as(fp), palette.shape[0], cell,
        ctypes.c_uint64(seed))
    return out, counts
