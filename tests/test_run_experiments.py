"""run_experiments harness e2e smoke: baseline selectors over a chair subset,
results.json + per-method mask outputs + compute_metrics (the reference
version is bit-rotted, run_experiments.py:18; ours must actually run)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

CHAIR = '/root/reference/example_videos/chair'


@pytest.mark.slow
def test_run_experiments_cli(tmp_path):
    from xmem2_tpu.bridge.torch_params import save_params
    from xmem2_tpu.models.init import init_params

    root = tmp_path / 'videos' / 'chair'
    (root / 'JPEGImages').mkdir(parents=True)
    (root / 'Annotations').mkdir(parents=True)
    for i in range(5):
        n = f'frame_{i:06d}.jpg'
        (root / 'JPEGImages' / n).write_bytes(
            (Path(CHAIR) / 'JPEGImages' / n).read_bytes())
    for i in range(5):
        n = f'frame_{i:06d}.png'
        (root / 'Annotations' / n).write_bytes(
            (Path(CHAIR) / 'Annotations' / n).read_bytes())

    ckpt = tmp_path / 'synth.npz'
    p = init_params(seed=0)
    p.tree['key_proj']['key_proj']['weight'] = \
        p.tree['key_proj']['key_proj']['weight'] * 0.01
    p.tree['key_proj']['d_proj']['weight'] = \
        p.tree['key_proj']['d_proj']['weight'] * 0.01
    save_params(p, str(ckpt))

    out = tmp_path / 'out'
    # split-dispatch path: the single-program fast step compiles several
    # large variants, which is slow on 1 CPU core (its numerics are covered
    # in-process by test_e2e_parity)
    env = dict(os.environ, JAX_PLATFORMS='cpu', XMEM2_FAST_STEP='0')
    r = subprocess.run(
        [sys.executable, 'run_experiments.py',
         '--videos_root', str(tmp_path / 'videos'), '--output', str(out),
         '--k', '2', '--selectors', 'first_frame_only', 'uniform',
         '--model', str(ckpt), '--size', '144'],
        capture_output=True, text=True, timeout=560,
        cwd=str(Path(__file__).parent.parent), env=env)
    assert r.returncode == 0, r.stderr[-2000:]

    results = json.loads((out / 'results.json').read_text())
    assert set(results['chair']) == {'first_frame_only', 'uniform'}
    assert results['chair']['first_frame_only']['frames'] == [0]
    assert len(results['chair']['uniform']['frames']) == 2
    for sel in ('first_frame_only', 'uniform'):
        masks = list((out / sel / 'chair' / 'masks').glob('*.png'))
        assert len(masks) == 5, (sel, r.stdout[-500:])

    # value-level asserts — the exact failure mode that rotted the
    # reference harness (run_experiments.py:18) was results nobody read.
    # results.json mean_iou covers only UNANNOTATED frames (annotated ones
    # report -1 by convention, run_on_video.py:180): real numbers in [0, 1).
    ffo = results['chair']['first_frame_only']['mean_iou']
    uni = results['chair']['uniform']['mean_iou']
    for v in (ffo, uni):
        assert 0.0 <= v < 1.0 and v == v, (ffo, uni)

    # compute_metrics over the saved predictions vs the GT annotations
    # (layout: gt_root/<vid>/*.png)
    gt_root = tmp_path / 'gt'
    gt_root.mkdir()
    (gt_root / 'chair').symlink_to(root / 'Annotations')
    sys.path.insert(0, str(Path(__file__).parent.parent))
    from run_experiments import compute_metrics
    rows_uni = compute_metrics(str(out / 'uniform'), str(gt_root))
    rows_ffo = compute_metrics(str(out / 'first_frame_only'), str(gt_root))
    assert 'chair' in rows_uni and 0 <= rows_uni['chair']['J&F'] <= 1
    # selector ORDERING on the full-sequence J&F (annotated frames included):
    # uniform pins 2 of 5 frames to their exact GT vs first_frame_only's 1,
    # so with imperfect synthetic-weight predictions elsewhere uniform must
    # strictly win — 2/5 + 3j/5 > 1/5 + 4j/5 for any j < 1. A harness that
    # writes masks to the wrong directory, mixes up selectors, or stops
    # honoring frames_with_masks breaks this inequality immediately.
    assert rows_uni['chair']['J&F'] > rows_ffo['chair']['J&F'], \
        (rows_uni, rows_ffo)
    assert rows_ffo['chair']['J&F'] >= 1 / 5 - 0.05, rows_ffo
    assert rows_uni['chair']['J&F'] >= 2 / 5 - 0.05, rows_uni
