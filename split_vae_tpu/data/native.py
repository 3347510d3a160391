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

# Per-mode native coverage (modes are spair/data.py:59-158):
#   solid_fixed / unseen_solid_fixed / solid_random / white  -> native
#   k x k checkerboard ('3x3_ckb' style)                     -> native (mode 3)
#   rotated checkerboard ('ckb_rot_6')                       -> native (mode 4)
#   texture (Kylberg files or procedural fallback)           -> native (mode 5,
#       bank built host-side by _texture_bank below)
# Anything else falls back to the numpy MultiCUB path.
BG_MODES = {
    "solid_fixed": 0,
    "unseen_solid_fixed": 0,
    "solid_random": 1,
    "white": 2,
    # ckb handled specially (mode 3 / 4 for rotated); texture = mode 5
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
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,      # textures, n_textures
        ]
        lib.multicub_generate.restype = None
        _lib = lib
        return _lib
    except Exception:
        _build_failed = True
        return None


def _texture_bank(size: int, texture_dir: Optional[str], seed: int,
                  n_procedural: int = 256) -> np.ndarray:
    """Grayscale texture bank [T, size, size] in [0, 1].

    Kylberg files when present (spair/data.py:49,83-87), else the same
    procedural sin/cos texture family as the numpy fallback
    (data/multicub.py::MultiCUB._bg). The numpy path draws a fresh texture per
    sample; the native path samples from this pre-built bank — equivalent
    distributionally at bank sizes >= a few hundred (Redesign detail).
    """
    import glob as _glob

    files = sorted(_glob.glob(os.path.join(texture_dir, "*.png"))) if texture_dir else []
    if files:
        from PIL import Image

        return np.stack([
            np.asarray(Image.open(f).convert("L").resize((size, size)), np.float32)
            / 255.0
            for f in files
        ])
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:size, 0:size] / size
    bank = np.empty((n_procedural, size, size), np.float32)
    for i in range(n_procedural):
        f1, f2, ph = rng.uniform(4, 12), rng.uniform(4, 12), rng.uniform(0, 6)
        bank[i] = 0.5 + 0.25 * np.sin(f1 * xx + ph) * np.cos(f2 * yy)
    return bank


def generate(
    sprites: np.ndarray,
    n_samples: int,
    size: int,
    bg: str,
    palette: np.ndarray,
    max_objects: int = 5,
    seed: int = 0,
    texture_dir: Optional[str] = None,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native batch generation; returns (images [N,S,S,3] in [0,1], counts)
    or None when the native library is unavailable or the bg mode is not
    supported natively (see BG_MODES coverage table above)."""
    lib = _ensure_built()
    if lib is None:
        return None
    textures = np.zeros((0,), np.float32)
    if "rot" in bg:
        mode, cell = 4, int(bg[-1])
    elif "ckb" in bg:
        mode, cell = 3, int(bg[0]) if bg[0].isdigit() else 0
        if cell == 0:
            return None
    elif bg.replace("unseen_", "") == "texture":
        mode, cell = 5, 0
        textures = np.ascontiguousarray(
            _texture_bank(size, texture_dir, seed), np.float32)
    elif bg.replace("unseen_", "") in BG_MODES or bg in BG_MODES:
        mode, cell = BG_MODES.get(bg, BG_MODES.get(bg.replace("unseen_", ""), 0)), 0
    else:
        return None  # unknown mode: numpy path

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
        ctypes.c_uint64(seed),
        textures.ctypes.data_as(fp), int(textures.shape[0]) if mode == 5 else 0)
    return out, counts
