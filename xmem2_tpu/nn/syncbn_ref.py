"""ctypes loader for the C++ SyncBN reference ops (nn/csrc/syncbn_ref.cpp).

The TPU production path for cross-replica batch norm is
`nn.functional.batch_norm_train(..., axis_name=...)` — one lax.pmean of the
statistics. These native ops are its CPU parity oracle, mirroring the
reference's vendored CUDA kernels (bn_cuda.cu:37-279); tests/test_syncbn.py
checks both against each other and against jax autodiff.

All arrays NCHW-flattened [num, chn, sp], float32, C-contiguous.
"""

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), 'csrc')
_LIB = None
_LIB_FAILED = False

_I64 = ctypes.c_int64
_F32P = np.ctypeslib.ndpointer(np.float32, flags='C_CONTIGUOUS')


def load_native():
    """Compile-on-demand .so (same pattern as interactive/clicks).
    Returns None when no compiler is available."""
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    so_path = os.path.join(_CSRC, 'libsyncbnref.so')
    src = os.path.join(_CSRC, 'syncbn_ref.cpp')
    try:
        if (not os.path.exists(so_path)
                or os.path.getmtime(so_path) < os.path.getmtime(src)):
            subprocess.run(
                ['g++', '-O3', '-shared', '-fPIC', src, '-o', so_path],
                check=True, capture_output=True)
        lib = ctypes.CDLL(so_path)
        lib.syncbn_sum_sqsum.argtypes = [_F32P, _F32P, _F32P, _I64, _I64, _I64]
        lib.syncbn_forward.argtypes = [
            _F32P, _F32P, _F32P, _F32P, _F32P, _F32P,
            ctypes.c_int, ctypes.c_float, _I64, _I64, _I64]
        lib.syncbn_backward_xhat.argtypes = [
            _F32P, _F32P, _F32P, _F32P, _F32P, _F32P,
            ctypes.c_float, _I64, _I64, _I64]
        lib.syncbn_backward.argtypes = [
            _F32P, _F32P, _F32P, _F32P, _F32P, _F32P, _F32P,
            _F32P, _F32P, _F32P, ctypes.c_int, ctypes.c_float,
            _I64, _I64, _I64]
        _LIB = lib
    except Exception:
        _LIB_FAILED = True
    return _LIB


def _dims(x: np.ndarray) -> Tuple[int, int, int]:
    n, c = x.shape[:2]
    return n, c, int(np.prod(x.shape[2:], dtype=np.int64))


def sum_sqsum(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    lib = load_native()
    n, c, sp = _dims(x)
    s = np.empty((c,), np.float32)
    ss = np.empty((c,), np.float32)
    lib.syncbn_sum_sqsum(np.ascontiguousarray(x, np.float32), s, ss, n, c, sp)
    return s, ss


def forward(x, weight, bias, mean, var, eps=1e-5, affine=True) -> np.ndarray:
    lib = load_native()
    n, c, sp = _dims(x)
    x = np.ascontiguousarray(x, np.float32)
    z = np.empty_like(x)
    lib.syncbn_forward(z, x, np.ascontiguousarray(weight, np.float32),
                       np.ascontiguousarray(bias, np.float32),
                       np.ascontiguousarray(mean, np.float32),
                       np.ascontiguousarray(var, np.float32),
                       int(affine), float(eps), n, c, sp)
    return z


def backward_xhat(dz, x, mean, var, eps=1e-5):
    lib = load_native()
    n, c, sp = _dims(x)
    s = np.empty((c,), np.float32)
    sx = np.empty((c,), np.float32)
    lib.syncbn_backward_xhat(np.ascontiguousarray(dz, np.float32),
                             np.ascontiguousarray(x, np.float32),
                             np.ascontiguousarray(mean, np.float32),
                             np.ascontiguousarray(var, np.float32),
                             s, sx, float(eps), n, c, sp)
    return s, sx


def backward(dz, x, weight, mean, var, sum_dz_n, sum_dz_xhat_n, eps=1e-5,
             affine=True):
    """sum_dz_n / sum_dz_xhat_n must be normalized by num*sp (as the
    reference expects, bn_cuda.cu:216-222). Returns (dx, dweight, dbias)."""
    lib = load_native()
    n, c, sp = _dims(x)
    dz = np.ascontiguousarray(dz, np.float32)
    dx = np.empty_like(dz)
    dw = np.zeros((c,), np.float32)
    db = np.zeros((c,), np.float32)
    lib.syncbn_backward(dz, np.ascontiguousarray(x, np.float32),
                        np.ascontiguousarray(weight, np.float32),
                        np.ascontiguousarray(mean, np.float32),
                        np.ascontiguousarray(var, np.float32),
                        np.ascontiguousarray(sum_dz_n, np.float32),
                        np.ascontiguousarray(sum_dz_xhat_n, np.float32),
                        dx, dw, db, int(affine), float(eps), n, c, sp)
    return dx, dw, db
