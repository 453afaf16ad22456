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

    # compute_metrics over the saved predictions vs the GT annotations
    # (layout: gt_root/<vid>/*.png)
    gt_root = tmp_path / 'gt'
    gt_root.mkdir()
    (gt_root / 'chair').symlink_to(root / 'Annotations')
    sys.path.insert(0, str(Path(__file__).parent.parent))
    from run_experiments import compute_metrics
    rows = compute_metrics(str(out / 'uniform'), str(gt_root))
    assert 'chair' in rows and 0 <= rows['chair']['J&F'] <= 1
