"""ctypes binding for the native C++ multi-view loader.

``native/dataio.cpp`` runs the per-object hot path (24 RGBA PNG decodes,
background composite, box resize, float batch assembly) in C++ worker
threads — the TPU-host replacement for the reference's process-pool
DataLoader (SURVEY.md §2 #19).  Falls back to the PIL path transparently
when the shared library hasn't been built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import logging
import os
from typing import List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "native", "libmvdataio.so")
_lib = None
_lib_checked = False


def _load_lib():
    global _lib, _lib_checked
    if _lib_checked:
        return _lib
    _lib_checked = True
    path = os.path.abspath(_LIB_PATH)
    if not os.path.exists(path):
        # try building it once (fast, no deps beyond libpng)
        try:
            import subprocess

            subprocess.run(
                ["make", "-C", os.path.dirname(path)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception as e:
            logger.info("native loader unavailable (%s); using PIL fallback", e)
            return None
    try:
        lib = ctypes.CDLL(path)
        lib.mv_load_views.restype = ctypes.c_int
        lib.mv_load_views.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int,
        ]
        assert lib.mv_version() == 1
        _lib = lib
        logger.info("native dataio loaded from %s", path)
    except Exception as e:  # pragma: no cover
        logger.warning("failed to load native dataio: %s", e)
        _lib = None
    return _lib


def native_available() -> bool:
    return _load_lib() is not None


def load_views(
    paths: List[str],
    out_size: int = 256,
    background: int = 128,
    full_size: int = 0,
    n_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray], Optional[np.ndarray]]:
    """Decode+composite+resize a list of RGBA PNGs.

    Returns (rgb [N,S,S,3] in [0,1], mask [N,S,S,1],
             full_rgb [N,F,F,3] | None, full_mask [N,F,F,1] | None).
    Raises on decode failure (caller implements skip-on-error semantics).
    """
    lib = _load_lib()
    n = len(paths)
    if lib is not None:
        rgb = np.empty((n, out_size, out_size, 3), np.float32)
        mask = np.empty((n, out_size, out_size, 1), np.float32)
        if full_size:
            full = np.empty((n, full_size, full_size, 3), np.float32)
            fmask = np.empty((n, full_size, full_size, 1), np.float32)
            fptr = full.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            fmptr = fmask.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        else:
            full = fmask = None
            fptr = fmptr = ctypes.POINTER(ctypes.c_float)()
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        errors = lib.mv_load_views(
            arr, n, out_size, background,
            rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            fptr, fmptr, full_size, n_threads,
        )
        if errors:
            raise IOError(f"native loader failed on {errors}/{n} views")
        return rgb, mask, full, fmask

    # PIL fallback
    from PIL import Image

    def one(path, size):
        img = Image.open(path).convert("RGBA")
        if img.size != (size, size):
            img = img.resize((size, size), Image.BILINEAR)
        a = np.asarray(img, np.float32) / 255.0
        rgb = a[..., :3] * a[..., 3:] + (background / 255.0) * (1 - a[..., 3:])
        return rgb, a[..., 3:]

    rgb = np.empty((n, out_size, out_size, 3), np.float32)
    mask = np.empty((n, out_size, out_size, 1), np.float32)
    full = np.empty((n, full_size, full_size, 3), np.float32) if full_size else None
    fmask = np.empty((n, full_size, full_size, 1), np.float32) if full_size else None
    for i, p in enumerate(paths):
        rgb[i], mask[i] = one(p, out_size)
        if full_size:
            full[i], fmask[i] = one(p, full_size)
    return rgb, mask, full, fmask
