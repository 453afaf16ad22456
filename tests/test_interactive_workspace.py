"""Behavioral tests for the GUI-free interactive pieces: ResourceManager
workspace lifecycle, overlay renderers, and interaction state machines."""

import numpy as np
import pytest
from PIL import Image


@pytest.fixture
def workspace(tmp_path):
    rng = np.random.default_rng(0)
    frames = tmp_path / 'frames'
    frames.mkdir()
    for i in range(5):
        Image.fromarray(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
                        ).save(frames / f'{i:05d}.jpg')
    return tmp_path, frames


class TestResourceManager:
    def _make(self, tmp_path, frames, **over):
        from xmem2_tpu.interactive.resource_manager import ResourceManager
        cfg = {'images': str(frames), 'video': None,
               'workspace': str(tmp_path / 'ws'), 'size': -1,
               'num_objects': 2, 'buffer_size': 10}
        cfg.update(over)
        return ResourceManager(cfg)

    def test_workspace_lifecycle(self, workspace):
        tmp_path, frames = workspace
        rm = self._make(tmp_path, frames)
        assert len(rm) == 5
        assert rm.num_objects == 2
        img = rm.get_image(0)
        assert img.shape == (48, 64, 3)

        mask = np.zeros((48, 64), np.uint8)
        mask[10:20, 10:20] = 1
        rm.save_mask(2, mask)
        np.testing.assert_array_equal(rm.get_mask(2), mask)

        rm.add_reference(2)
        # a fresh manager on the same workspace restores references + masks
        rm2 = self._make(tmp_path, frames, num_objects=None)
        assert rm2.references == {2}
        assert rm2.num_objects == 2
        np.testing.assert_array_equal(rm2.get_mask(2), mask)

    def test_key_cache(self, workspace):
        tmp_path, frames = workspace
        rm = self._make(tmp_path, frames)
        key = np.ones((1, 3, 4, 8), np.float32)
        shrink = np.ones((1, 3, 4, 1), np.float32)
        sel = np.ones((1, 3, 4, 8), np.float32)
        small_mask = np.zeros((2, 3, 4), np.float32)
        for ti in range(5):
            rm.add_key_and_stuff_with_mask(ti, key * ti, shrink, sel, small_mask)
        assert rm.all_masks_present()
        assert rm.keys.shape == (5, 3, 4, 8)


class TestOverlays:
    def test_all_modes(self):
        from xmem2_tpu.interactive.interactive_utils import get_visualization
        rng = np.random.default_rng(1)
        image = rng.integers(0, 255, (32, 40, 3), dtype=np.uint8)
        mask = np.zeros((32, 40), np.uint8)
        mask[8:16, 8:16] = 1
        layer = rng.integers(0, 255, (32, 40, 4), dtype=np.uint8)
        for mode in ('davis', 'fade', 'light', 'popup', 'layered'):
            out = get_visualization(mode, image, mask, layer, [1])
            assert out.shape == image.shape and out.dtype == np.uint8
        # foreground recolored in davis mode
        davis = get_visualization('davis', image, mask, None, [1])
        assert not np.array_equal(davis[8:16, 8:16], image[8:16, 8:16])
        np.testing.assert_array_equal(davis[0:4, 0:4], image[0:4, 0:4])


class TestInteractions:
    def test_free_interaction_draws_and_predicts(self):
        from xmem2_tpu.interactive.interaction import FreeInteraction
        prev = np.zeros((32, 40), np.uint8)
        it = FreeInteraction(None, prev, (32, 40), num_objects=2)
        it.set_size(3)
        it.push_point(5, 5, 1)
        it.push_point(20, 5, 1)
        it.end_path()
        prob = np.asarray(it.predict())
        assert prob.shape == (3, 32, 40)
        mask = prob.argmax(0)
        assert (mask == 1).sum() > 0

    def test_aggregate_wbg_hard(self):
        import jax.numpy as jnp
        from xmem2_tpu.interactive.interaction import aggregate_wbg
        prob = jnp.asarray(np.stack([
            np.full((4, 4), 0.9, np.float32),
            np.full((4, 4), 0.1, np.float32),
        ]))
        out = np.asarray(aggregate_wbg(prob, keep_bg=True, hard=True))
        assert out.shape == (3, 4, 4)
        np.testing.assert_allclose(out.sum(0), 1.0, rtol=1e-5)
        assert out[1].min() > 0.99  # hard softmax picks object 1
