"""Click encoding: distance maps + click state (Clicker).

Parity targets in the reference repo:
  - BFS dist maps: fbrs/utils/cython/_get_dist_maps.pyx (here: a C++ ctypes
    extension compiled on demand, csrc/dist_maps.cpp, with a numpy fallback)
  - exact tensor formula: fbrs/model/ops.py:54-80 (here: jit-able jax)
  - Clicker click bookkeeping: fbrs/inference/clicker.py

Both encoders end with tanh(2*sqrt(d)) of the min normalized squared
distance, two layers (positive/negative clicks).
"""

import os
import subprocess
from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Tuple

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), 'csrc')
_LIB = None
_LIB_FAILED = False


def _load_native():
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    import ctypes
    so_path = os.path.join(_CSRC, 'libdistmaps.so')
    src = os.path.join(_CSRC, 'dist_maps.cpp')
    try:
        if (not os.path.exists(so_path)
                or os.path.getmtime(so_path) < os.path.getmtime(src)):
            subprocess.run(
                ['g++', '-O3', '-shared', '-fPIC', src, '-o', so_path],
                check=True, capture_output=True)
        lib = ctypes.CDLL(so_path)
        lib.get_dist_maps.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.POINTER(ctypes.c_float)]
        _LIB = lib
    except Exception as e:  # no compiler / sandbox: fall back to numpy
        print(f'dist_maps: native build unavailable ({e}); using numpy BFS')
        _LIB_FAILED = True
    return _LIB


def _bfs_numpy(points: np.ndarray, height: int, width: int,
               norm_delimeter: float) -> np.ndarray:
    """Reference-faithful BFS in numpy (slow; used when g++ is unavailable)."""
    from collections import deque
    out = np.full((2, height, width), 1e6, np.float32)
    q = deque()
    n = points.shape[0]
    for i in range(n):
        x, y = int(round(points[i, 0])), int(round(points[i, 1]))
        if x >= 0:
            layer = 1 if i >= n / 2 else 0
            q.append((x, y, layer, x, y))
            out[layer, x, y] = 0.0
    while q:
        x0, y0, layer, ox, oy = q.popleft()
        for dx, dy in ((-1, 0), (0, -1), (0, 1), (1, 0)):
            x, y = x0 + dx, y0 + dy
            if 0 <= x < height and 0 <= y < width:
                nd = ((x - ox) / norm_delimeter) ** 2 + ((y - oy) / norm_delimeter) ** 2
                if out[layer, x, y] > nd:
                    out[layer, x, y] = nd
                    q.append((x, y, layer, ox, oy))
    return out


def get_dist_maps_native(points: np.ndarray, height: int, width: int,
                         norm_delimeter: float) -> np.ndarray:
    """points [n, 2] float (row, col; <0 = absent) -> [2, H, W] float32 of
    min squared normalized distances (pos layer, neg layer). BFS semantics."""
    import ctypes
    points = np.ascontiguousarray(points, np.float32)
    lib = _load_native()
    if lib is None:
        return _bfs_numpy(points, height, width, norm_delimeter)
    out = np.empty((2, height, width), np.float32)
    lib.get_dist_maps(
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        points.shape[0], height, width, ctypes.c_float(norm_delimeter),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def encode_dist(d: np.ndarray) -> np.ndarray:
    """Final encoding tanh(2*sqrt(d)) (reference ops.py:80)."""
    return np.tanh(2.0 * np.sqrt(d))


def dist_maps_jax(points, height: int, width: int, norm_radius: float,
                  spatial_scale: float = 1.0):
    """Exact-euclidean jit path (reference ops.py:54-80).

    points [n, 2] (first half positive, second half negative; <0 = absent).
    Returns [2, H, W] float32 = tanh(2*sqrt(min_d)).
    """
    import jax.numpy as jnp
    pts = jnp.asarray(points, jnp.float32)
    n = pts.shape[0]
    rows = jnp.arange(height, dtype=jnp.float32)
    cols = jnp.arange(width, dtype=jnp.float32)
    rr = rows[:, None, None]
    cc = cols[None, :, None]
    pr = pts[:, 0][None, None, :] * spatial_scale
    pc = pts[:, 1][None, None, :] * spatial_scale
    denom = norm_radius * spatial_scale
    d = ((rr - pr) / denom) ** 2 + ((cc - pc) / denom) ** 2  # [H, W, n]
    invalid = jnp.max(pts, axis=1) < 0
    d = jnp.where(invalid[None, None, :], 1e6, d)
    half = n // 2
    pos = jnp.min(d[..., :half], axis=-1)
    neg = jnp.min(d[..., half:], axis=-1)
    out = jnp.stack([pos, neg], axis=0)
    return jnp.tanh(2.0 * jnp.sqrt(out))


# ---------------------------------------------------------------------------
# click bookkeeping (reference fbrs/inference/clicker.py)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Click:
    is_positive: bool
    coords: Tuple[int, int]  # (row, col)


class Clicker:
    def __init__(self, gt_mask: Optional[np.ndarray] = None):
        self.gt_mask = gt_mask
        self.reset_clicks()

    def reset_clicks(self):
        self.clicks_list: List[Click] = []
        self.num_pos_clicks = 0
        self.num_neg_clicks = 0

    def add_click(self, click: Click):
        if click.is_positive:
            self.num_pos_clicks += 1
        else:
            self.num_neg_clicks += 1
        self.clicks_list.append(click)

    def get_clicks(self, clicks_limit: Optional[int] = None) -> List[Click]:
        return self.clicks_list[:clicks_limit]

    def __len__(self):
        return len(self.clicks_list)

    def get_state(self):
        return list(self.clicks_list)

    def set_state(self, state):
        self.clicks_list = list(state)
        self.num_pos_clicks = sum(c.is_positive for c in state)
        self.num_neg_clicks = len(state) - self.num_pos_clicks

    def to_points(self, clicks_limit: Optional[int] = None,
                  max_clicks: Optional[int] = None) -> np.ndarray:
        """Pack clicks into the [n, 2] points layout the dist-map encoders
        expect: positives first, then negatives, padded with -1."""
        clicks = self.get_clicks(clicks_limit)
        pos = [c.coords for c in clicks if c.is_positive]
        neg = [c.coords for c in clicks if not c.is_positive]
        half = max_clicks if max_clicks is not None else max(len(pos), len(neg), 1)
        pts = np.full((2 * half, 2), -1.0, np.float32)
        for i, (r, c) in enumerate(pos[:half]):
            pts[i] = (r, c)
        for i, (r, c) in enumerate(neg[:half]):
            pts[half + i] = (r, c)
        return pts
