"""Data-layer parity tests: host-side resize vs torch semantics, MaskMapper
vs the reference implementation, VideoReader behavior on the bundled example
video."""

import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')

from xmem2_tpu.utils.resize_np import (
    resize_bilinear_np, resize_nearest_np, shorter_side_size)
from xmem2_tpu.inference.data.mask_mapper import MaskMapper

torch = pytest.importorskip('torch')
import torch.nn.functional as TF  # noqa: E402

CHAIR = '/root/reference/example_videos/chair'


class TestResizeParity:
    @pytest.mark.parametrize('in_hw,out_hw', [
        ((480, 720), (144, 216)), ((37, 53), (100, 150)), ((64, 64), (48, 48)),
    ])
    def test_bilinear(self, in_hw, out_hw):
        rng = np.random.default_rng(0)
        img = rng.standard_normal(in_hw + (3,)).astype(np.float32)
        ours = resize_bilinear_np(img, out_hw)
        ref = TF.interpolate(torch.from_numpy(np.moveaxis(img, -1, 0)[None]),
                             out_hw, mode='bilinear', align_corners=False)
        # sub-1/255 arithmetic-order differences are below pixel quantization
        np.testing.assert_allclose(ours, np.moveaxis(ref[0].numpy(), 0, -1),
                                   rtol=1e-3, atol=5e-4)

    @pytest.mark.parametrize('in_hw,out_hw', [
        ((480, 720), (144, 216)), ((30, 54), (123, 77)),
    ])
    def test_nearest(self, in_hw, out_hw):
        rng = np.random.default_rng(1)
        img = (rng.uniform(0, 5, (2,) + in_hw)).astype(np.float32)
        ours = resize_nearest_np(img, out_hw)
        ref = TF.interpolate(torch.from_numpy(img)[None], out_hw,
                             mode='nearest')
        np.testing.assert_array_equal(ours, ref[0].numpy())

    def test_shorter_side(self):
        assert shorter_side_size(480, 720, 144) == (144, 216)
        assert shorter_side_size(720, 480, 144) == (216, 144)
        assert shorter_side_size(480, 853, 480) == (480, 853)


class TestMaskMapperParity:
    def _ref(self):
        from inference.data.mask_mapper import MaskMapper as RefMapper
        return RefMapper()

    def test_exhaustive(self):
        mask = np.zeros((10, 12), np.uint8)
        mask[2:5, 3:6] = 3
        mask[6:9, 7:10] = 7
        ref, ours = self._ref(), MaskMapper()
        rm, rl = ref.convert_mask(mask, exhaustive=True)
        om, ol = ours.convert_mask(mask, exhaustive=True)
        np.testing.assert_array_equal(om, rm.numpy())
        assert list(ol) == list(rl)
        assert ref.remappings == ours.remappings

        pred = np.zeros((10, 12), np.uint8)
        pred[1:4, 1:4] = 1
        pred[5:8, 5:8] = 2
        np.testing.assert_array_equal(ours.remap_index_mask(pred),
                                      ref.remap_index_mask(pred))

    def test_incremental_youtube_style(self):
        ref, ours = self._ref(), MaskMapper()
        m1 = np.zeros((8, 8), np.uint8)
        m1[0:3, 0:3] = 1
        m2 = np.zeros((8, 8), np.uint8)
        m2[4:7, 4:7] = 2
        for m in (m1, m2):
            rm, rl = ref.convert_mask(m.copy())
            om, ol = ours.convert_mask(m.copy())
            np.testing.assert_array_equal(om, rm.numpy())
            assert list(ol) == list(rl)


class TestVideoReader:
    def test_chair_sample(self):
        from xmem2_tpu.inference.data.video_reader import VideoReader
        reader = VideoReader('', f'{CHAIR}/JPEGImages', f'{CHAIR}/Annotations',
                             size=144, use_all_masks=False)
        assert len(reader) == 60
        s = reader[0]
        assert s.rgb.shape == (144, 216, 3)
        assert s.shape == (480, 720)
        assert s.mask is not None and s.mask.shape == (480, 720)
        assert s.need_resize
        # only the first frame's mask is loaded when use_all_masks=False
        assert reader[1].mask is None
        # ImageNet normalization applied
        assert -3 < s.rgb.mean() < 3

    def test_mask_resize(self):
        from xmem2_tpu.inference.data.video_reader import VideoReader
        reader = VideoReader('', f'{CHAIR}/JPEGImages', f'{CHAIR}/Annotations',
                             size=144, use_all_masks=False)
        m = (reader[0].mask > 0).astype(np.float32)[None]
        r = reader.resize_mask(m)
        assert r.shape == (1, 144, 216)
        assert set(np.unique(r)) <= {0.0, 1.0}

    def test_prefetch_iteration(self):
        from xmem2_tpu.inference.data.video_reader import VideoReader
        reader = VideoReader('', f'{CHAIR}/JPEGImages', f'{CHAIR}/Annotations',
                             size=144, use_all_masks=False)
        frames = [s.frame for i, s in zip(range(3), reader)]
        assert frames == ['frame_000000.jpg', 'frame_000001.jpg',
                          'frame_000002.jpg']
