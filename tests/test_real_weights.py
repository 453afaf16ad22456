"""Real-weights accuracy gate.

Skipped unless trained XMem weights exist at saves/XMem.pth (or .npz) — this
environment has zero egress, so the checkpoint cannot be downloaded here. The
first environment that provides weights runs these automatically:

  1. chair sanity: average IoU >= 90% with 3 annotated frames
     (reference main.py:41-43 — the reference's own executable contract)
  2. DAVIS-17-style smoke on the caps 2-object video: finite probabilities,
     J (mean IoU) well above chance

To run: place the official checkpoint at saves/XMem.pth (download_models.sh)
and `python -m pytest tests/test_real_weights.py -v`.
"""

import os
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parent.parent
WEIGHT_CANDIDATES = [REPO / 'saves' / 'XMem.pth', REPO / 'saves' / 'XMem.npz']
WEIGHTS = next((p for p in WEIGHT_CANDIDATES if p.exists()), None)

pytestmark = pytest.mark.skipif(
    WEIGHTS is None,
    reason='trained weights not present (zero-egress env) — put the official '
           'checkpoint at saves/XMem.pth to enable the accuracy gate')

CHAIR = '/root/reference/example_videos/chair'
CAPS = '/root/reference/example_videos/caps'


@pytest.fixture(scope='module')
def config(tmp_path_factory):
    from xmem2_tpu.config import VIDEO_INFERENCE_CONFIG
    cfg = VIDEO_INFERENCE_CONFIG.copy()
    cfg['model'] = str(WEIGHTS)
    return cfg


def test_chair_sanity_iou(config, tmp_path):
    """reference main.py:33-43: 3 annotated frames, average IoU >= 0.9."""
    from xmem2_tpu.inference.run_on_video import run_on_video

    stats = run_on_video(
        f'{CHAIR}/JPEGImages', f'{CHAIR}/Annotations', tmp_path / 'out',
        frames_with_masks=[5, 10, 15], compute_iou=True, print_progress=False,
        overwrite_config={'model': config['model']})
    ious = stats[stats['iou'] >= 0]['iou']
    assert ious.mean() >= 0.9, f'average IoU {ious.mean():.4f} < 0.9'


def test_caps_two_object_jf(config, tmp_path):
    """2-object permanent-memory path with real weights: per-frame J stays
    high against the densely annotated GT."""
    from PIL import Image
    from xmem2_tpu.inference.run_on_video import run_on_video
    from xmem2_tpu.utils.metrics import batched_jaccard

    run_on_video(
        f'{CAPS}/JPEGImages', f'{CAPS}/Annotations', tmp_path / 'out',
        frames_with_masks=[0], compute_iou=False, print_progress=False,
        overwrite_config={'model': config['model']})

    gt_dir = sorted(Path(f'{CAPS}/Annotations').glob('*.png'))
    pred_dir = sorted((tmp_path / 'out' / 'masks').glob('*.png'))
    assert len(pred_dir) == len(gt_dir)
    gts = np.stack([np.asarray(Image.open(p).convert('P')) for p in gt_dir])
    preds = np.stack([np.asarray(Image.open(p).convert('P')) for p in pred_dir])
    j = batched_jaccard(gts, preds, average_over_objects=True)
    assert float(np.mean(j)) >= 0.75, f'mean J {np.mean(j):.4f}'
