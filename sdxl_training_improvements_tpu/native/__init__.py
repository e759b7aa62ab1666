"""Native (C++) image-prep library: lazy g++ build + ctypes binding.

``prepare_image_native(rgb_u8_hwc, target_h, target_w, ...)`` fuses
Lanczos3 resize -> crop -> flip -> [-1,1] float32 CHW in OpenMP-parallel C++
(``image_ops.cpp``).  The python fallback (PIL + numpy) in
``data/dataset.prepare_image_array`` remains authoritative for semantics;
this path exists for precompute throughput at dataset scale.

The shared object is compiled on first use into the package directory and
cached; ``available()`` is False (and everything falls back) when no
compiler is present or the build fails.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_DIR = Path(__file__).parent
_SRC = _DIR / "image_ops.cpp"
_SO = _DIR / "_image_ops.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> Optional[Path]:
    if _SO.exists() and _SO.stat().st_mtime >= _SRC.stat().st_mtime:
        return _SO
    cmds = [
        ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
         str(_SRC), "-o", str(_SO)],
        ["g++", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(_SO)],
        ["c++", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(_SO)],
    ]
    for cmd in cmds:
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return _SO
        except Exception:
            continue
    return None


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("SDXL_TPU_NO_NATIVE") == "1":
            return None
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(str(so))
            lib.prepare_image.restype = ctypes.c_int
            lib.prepare_image.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),  # src
                ctypes.c_int, ctypes.c_int,      # sh, sw
                ctypes.POINTER(ctypes.c_float),  # dst
                ctypes.c_int, ctypes.c_int,      # th, tw
                ctypes.c_int, ctypes.c_int,      # crop_top, crop_left
                ctypes.c_int, ctypes.c_int,      # rh, rw
                ctypes.c_int,                    # flip
            ]
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def prepare_image_native(rgb: np.ndarray, target_h: int, target_w: int,
                         crop_top: int, crop_left: int, resized_h: int,
                         resized_w: int, flip: bool = False
                         ) -> Optional[np.ndarray]:
    """uint8 HWC RGB -> float32 CHW in [-1,1]; None if native unavailable."""
    lib = _load()
    if lib is None:
        return None
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError(f"expected HWC RGB uint8, got {rgb.shape}")
    sh, sw = rgb.shape[:2]
    out = np.empty((3, target_h, target_w), dtype=np.float32)
    rc = lib.prepare_image(
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), sh, sw,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        target_h, target_w, crop_top, crop_left, resized_h, resized_w,
        int(flip))
    if rc != 0:
        raise ValueError(f"prepare_image failed with code {rc}")
    return out
