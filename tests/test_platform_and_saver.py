"""Direct unit tests for two round-2 fixes: the JAX_PLATFORMS env guard
(sitecustomize override) and the spawn-based ParallelImageSaver drain
semantics (no dropped writes, idempotent shutdown, clean exit)."""

import os

import numpy as np
from PIL import Image


def test_honor_jax_platforms_env(monkeypatch):
    import jax
    from xmem2_tpu.utils.platform import honor_jax_platforms_env

    monkeypatch.setenv('JAX_PLATFORMS', 'cpu')
    jax.config.update('jax_platforms', 'cpu,cpu')  # simulate an override
    honor_jax_platforms_env()
    assert jax.config.jax_platforms == 'cpu'

    # without the env var the config is left alone
    monkeypatch.delenv('JAX_PLATFORMS')
    jax.config.update('jax_platforms', 'cpu,cpu')
    honor_jax_platforms_env()
    assert jax.config.jax_platforms == 'cpu,cpu'
    jax.config.update('jax_platforms', 'cpu')


def test_parallel_image_saver_drains_everything(tmp_path):
    """Every enqueued mask/overlay is on disk after wait_for_jobs_to_finish,
    and calling it again (the __exit__ path) is a no-op."""
    from xmem2_tpu.utils.image_saver import ParallelImageSaver

    n = 12
    rng = np.random.default_rng(0)
    with ParallelImageSaver(str(tmp_path), vid_name='vid') as saver:
        for i in range(n):
            mask = Image.fromarray(
                rng.integers(0, 255, (16, 24), dtype=np.uint8))
            orig = Image.fromarray(
                rng.integers(0, 255, (16, 24, 3), dtype=np.uint8))
            saver.save_mask(mask, f'frame_{i:06d}.png')
            saver.save_overlay(orig, mask, f'frame_{i:06d}.png')
        saver.wait_for_jobs_to_finish(verbose=False)
        saver.wait_for_jobs_to_finish(verbose=False)  # idempotent
    # __exit__ ran too — still no error, and all files exist
    assert len(list((tmp_path / 'vid' / 'masks').glob('*.png'))) == n
    assert len(list((tmp_path / 'vid' / 'overlay').glob('*.jpg'))) == n


def test_parallel_image_saver_sync_mode(tmp_path):
    """workers=0 degrades to synchronous writes (single-core test machines)."""
    from xmem2_tpu.utils.image_saver import ParallelImageSaver

    with ParallelImageSaver(str(tmp_path), vid_name='vid',
                            workers=0) as saver:
        mask = Image.fromarray(np.zeros((8, 8), np.uint8))
        saver.save_mask(mask, 'frame_000000.png')
        assert (tmp_path / 'vid' / 'masks' / 'frame_000000.png').exists()
