"""Dist-maps parity: C++ BFS vs reference Cython semantics (numpy BFS
reimplementation) and vs the exact-euclidean jax formula."""

import numpy as np
import pytest

from xmem2_tpu.interactive.clicks.dist_maps import (
    Click, Clicker, _bfs_numpy, dist_maps_jax, encode_dist,
    get_dist_maps_native, _load_native)


def points_case():
    # 2 positive + 1 negative click, one absent slot
    return np.array([[5, 7], [20, 30], [12, 2], [-1, -1]], np.float32)


def test_native_matches_numpy_bfs():
    pts = points_case()
    a = get_dist_maps_native(pts, 32, 40, 5.0)
    b = _bfs_numpy(pts, 32, 40, 5.0)
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
    assert a[0, 5, 7] == 0.0 and a[0, 20, 30] == 0.0
    assert a[1, 12, 2] == 0.0


def test_native_lib_built():
    # the C++ extension should actually build in this environment
    assert _load_native() is not None


def test_jax_formula_close_to_bfs():
    # BFS propagates 4-connected so its distances upper-bound the exact
    # euclidean ones; for points on the grid they agree along axis-aligned
    # paths and are close elsewhere
    pts = points_case()
    bfs = encode_dist(get_dist_maps_native(pts, 32, 40, 5.0))
    exact = np.asarray(dist_maps_jax(pts, 32, 40, 5.0))
    assert (exact <= bfs + 1e-4).all()
    assert np.abs(exact - bfs).mean() < 0.08


def test_clicker_points_layout():
    c = Clicker()
    c.add_click(Click(True, (3, 4)))
    c.add_click(Click(False, (8, 9)))
    c.add_click(Click(True, (1, 1)))
    pts = c.to_points(max_clicks=4)
    assert pts.shape == (8, 2)
    np.testing.assert_array_equal(pts[0], (3, 4))
    np.testing.assert_array_equal(pts[1], (1, 1))
    np.testing.assert_array_equal(pts[4], (8, 9))
    assert (pts[2] == -1).all() and (pts[5] == -1).all()
