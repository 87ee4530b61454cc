"""ctypes bindings for the C++ native kernels (native/nemo_native.cpp).

Builds the shared library on first use (g++ -O3), caches it next to the
source, and degrades gracefully to the pure-Python paths when no compiler
is available.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = osp.join(osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))), "native")
_SRC = osp.join(_NATIVE_DIR, "nemo_native.cpp")
_SO = osp.join(_NATIVE_DIR, "libnemo_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def build_native(force: bool = False) -> Optional[str]:
    """Compile the native library; returns its path or None on failure."""
    if osp.exists(_SO) and not force and \
            os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
             "-o", _SO],
            check=True, capture_output=True)
        return _SO
    except (OSError, subprocess.CalledProcessError):
        return None


def get_native() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    path = build_native()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.chamfer_forward.argtypes = [f32p, f32p, ctypes.c_int64,
                                    ctypes.c_int64, f32p, i32p]
    lib.chamfer_backward.argtypes = [f32p, f32p, i32p, f32p,
                                     ctypes.c_int64, f32p, f32p]
    lib.parse_openpose_batch.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                         ctypes.c_int, f32p]
    lib.parse_openpose_batch.restype = ctypes.c_int64
    _lib = lib
    return _lib


def chamfer_forward_native(a: np.ndarray, b: np.ndarray
                           ) -> Tuple[np.ndarray, np.ndarray]:
    """CPU-native one-way NN (reference parity for the CUDA ext's forward)."""
    lib = get_native()
    if lib is None:
        raise RuntimeError("native library unavailable")
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    dist = np.empty(a.shape[0], np.float32)
    idx = np.empty(a.shape[0], np.int32)
    lib.chamfer_forward(a, b, a.shape[0], b.shape[0], dist, idx)
    return dist, idx


def parse_openpose_batch_native(paths: List[str], person: int = 0
                                ) -> np.ndarray:
    """Parse many OpenPose JSONs -> (N, 25, 3); zeros for empty frames."""
    lib = get_native()
    if lib is None:
        raise RuntimeError("native library unavailable")
    blob = b"\0".join(p.encode() for p in paths) + b"\0"
    out = np.zeros((len(paths), 25, 3), np.float32)
    lib.parse_openpose_batch(blob, len(paths), person, out)
    return out
