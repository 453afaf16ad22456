"""DAVIS J&F metric tests.

The reference util/metrics.py needs skimage (absent here), so the boundary
F-measure is validated against hand-computed cases and invariants instead of
the reference module; jaccard against exact arithmetic."""

import numpy as np

from xmem2_tpu.utils.metrics import (
    _disk, _seg2bmap, batched_f_measure, batched_jaccard, f_measure)


class TestJaccard:
    def test_exact_values(self):
        gt = np.zeros((2, 10, 10), np.int64)
        pred = np.zeros((2, 10, 10), np.int64)
        gt[0, 2:6, 2:6] = 1          # 16 px
        pred[0, 4:8, 4:8] = 1        # 16 px, 4 px overlap
        gt[1, :, :] = 0              # empty frame
        j = batched_jaccard(gt, pred, nb_objects=1)
        np.testing.assert_allclose(j[0], 4 / 28)
        assert j[1] == 1.0           # empty union scores 1 (DAVIS convention)

    def test_multi_object_average(self):
        gt = np.zeros((1, 8, 8), np.int64)
        pred = np.zeros((1, 8, 8), np.int64)
        gt[0, 0:4, 0:4] = 1
        pred[0, 0:4, 0:4] = 1        # perfect for obj 1
        gt[0, 4:8, 4:8] = 2
        pred[0, 4:6, 4:6] = 2        # 4/16 for obj 2
        j = batched_jaccard(gt, pred)
        np.testing.assert_allclose(j[0], (1.0 + 4 / 16) / 2)


class TestFMeasure:
    def test_perfect_match(self):
        m = np.zeros((20, 30), bool)
        m[5:15, 10:20] = True
        assert f_measure(m, m) == 1.0

    def test_empty_cases(self):
        empty = np.zeros((20, 30), bool)
        full = np.zeros((20, 30), bool)
        full[5:15, 10:20] = True
        assert f_measure(empty, empty) == 1.0   # both empty: P=R=1
        assert f_measure(full, empty) == 0.0    # no pred boundary: R=0 -> F=0
        assert f_measure(empty, full) == 0.0

    def test_shifted_boundary_within_tolerance(self):
        # 1-px shift is inside the default bound_th radius -> F stays 1
        a = np.zeros((64, 64), bool)
        b = np.zeros((64, 64), bool)
        a[10:30, 10:30] = True
        b[11:31, 10:30] = True
        assert f_measure(a, b) == 1.0

    def test_far_boundary_penalized(self):
        a = np.zeros((64, 64), bool)
        b = np.zeros((64, 64), bool)
        a[2:10, 2:10] = True
        b[40:60, 40:60] = True
        assert f_measure(a, b) == 0.0

    def test_bmap_is_one_pixel_wide_interior(self):
        m = np.zeros((16, 16), bool)
        m[4:12, 4:12] = True
        b = _seg2bmap(m)
        # boundary offset 1/2 px toward origin: rows/cols 3..11
        assert b[3, 5] and b[11, 5] and b[5, 3] and b[5, 11]
        assert not b[6:10, 6:10].any()  # interior clear

    def test_disk_structuring_element(self):
        d = _disk(2)
        assert d.shape == (5, 5)
        assert d[2, 2] == 1 and d[0, 2] == 1 and d[0, 0] == 0

    def test_batched(self):
        gt = np.zeros((2, 32, 32), np.int64)
        pred = np.zeros((2, 32, 32), np.int64)
        gt[:, 8:20, 8:20] = 1
        pred[0, 8:20, 8:20] = 1
        pred[1, 9:21, 8:20] = 1
        f = batched_f_measure(gt, pred)
        assert f[0] == 1.0 and f[1] == 1.0
