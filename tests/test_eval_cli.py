"""eval.py CLI smoke: generic-dataset evaluation end-to-end — palette PNG
outputs, FPS report, score dumps for merge_multi_scale."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

CHAIR = '/root/reference/example_videos/chair'


@pytest.fixture(scope='module')
def mini_generic(tmp_path_factory):
    root = tmp_path_factory.mktemp('generic')
    img_dir = root / 'JPEGImages' / 'chair'
    ann_dir = root / 'Annotations' / 'chair'
    img_dir.mkdir(parents=True)
    ann_dir.mkdir(parents=True)
    for i in range(5):
        src = Path(CHAIR) / 'JPEGImages' / f'frame_{i:06d}.jpg'
        (img_dir / src.name).write_bytes(src.read_bytes())
    src = Path(CHAIR) / 'Annotations' / 'frame_000000.png'
    (ann_dir / src.name).write_bytes(src.read_bytes())

    ckpt = root / 'synth.npz'
    sys.path.insert(0, str(Path(__file__).parent.parent))
    from xmem2_tpu.models.init import init_params
    from xmem2_tpu.bridge.torch_params import save_params
    p = init_params(seed=0)
    p.tree['key_proj']['key_proj']['weight'] = \
        p.tree['key_proj']['key_proj']['weight'] * 0.01
    p.tree['key_proj']['d_proj']['weight'] = \
        p.tree['key_proj']['d_proj']['weight'] * 0.01
    save_params(p, str(ckpt))
    return root, ckpt


@pytest.mark.slow
def test_eval_generic(mini_generic, tmp_path):
    root, ckpt = mini_generic
    out = tmp_path / 'out'
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    r = subprocess.run(
        [sys.executable, 'eval.py', '--dataset', 'G',
         '--generic_path', str(root), '--model', str(ckpt),
         '--output', str(out), '--size', '144', '--save_all', '--save_scores',
         '--compute_dtype', 'float32'],
        capture_output=True, text=True, timeout=500,
        cwd=str(Path(__file__).parent.parent), env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert 'FPS' in r.stdout

    masks = sorted((out / 'Annotations' / 'chair').glob('*.png')) \
        if (out / 'Annotations').exists() else sorted((out / 'chair').glob('*.png'))
    assert len(masks) == 5, r.stdout
    m = Image.open(masks[0])
    assert m.mode == 'P'
    assert np.array(m).shape == (480, 720)  # saved at original size

    scores = sorted((out / 'Scores' / 'chair').glob('*.npz'))
    assert len(scores) == 5
    assert not any('backward' in p.name for p in scores), \
        'score files must be <frame>.npz so merge_multi_scale picks them up'
    with np.load(scores[0]) as z:
        assert z['prob'].ndim == 3
    # the label-remap sidecar merge_multi_scale's backward remap consumes
    # (reference eval.py:241 dumps backward.hkl at the last frame)
    backward = json.loads(
        (out / 'Scores' / 'chair' / 'backward.json').read_text())
    assert all(isinstance(int(k), int) for k in backward)


@pytest.mark.slow
def test_eval_chunked_matches(mini_generic, tmp_path):
    """--chunked (step_chunk runs) produces the same masks as the per-frame
    loop."""
    root, ckpt = mini_generic
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    outs = {}
    # chunked is the default now; the per-frame arm must opt out explicitly
    for tag, extra in (('plain', ['--no_chunked']), ('chunked', ['--chunked'])):
        out = tmp_path / tag
        r = subprocess.run(
            [sys.executable, 'eval.py', '--dataset', 'G',
             '--generic_path', str(root), '--model', str(ckpt),
             '--output', str(out), '--size', '144', '--save_all',
             '--compute_dtype', 'float32'] + extra,
            capture_output=True, text=True, timeout=500,
            cwd=str(Path(__file__).parent.parent), env=env)
        assert r.returncode == 0, r.stderr[-2000:]
        outs[tag] = sorted((out / 'chair').glob('*.png'))
        assert len(outs[tag]) == 5

    for pa, pb in zip(outs['plain'], outs['chunked']):
        a = np.asarray(Image.open(pa))
        b = np.asarray(Image.open(pb))
        assert float(np.mean(a == b)) >= 0.999, pa.name


@pytest.fixture(scope='module')
def mini_youtube(tmp_path_factory, mini_generic):
    """Tiny synthetic YouTubeVOS-2018 layout: 2 videos x 5 chair frames,
    YT frame naming (00000.jpg...), meta.json with per-object required
    frames (reference inference/data/test_datasets.py YouTubeVOSTestDataset
    contract)."""
    _, ckpt = mini_generic
    root = tmp_path_factory.mktemp('y18')
    meta = {'videos': {}}
    for vid in ('vid0', 'vid1'):
        img_dir = root / 'all_frames' / 'valid_all_frames' / 'JPEGImages' / vid
        ann_dir = root / 'valid' / 'Annotations' / vid
        img_dir.mkdir(parents=True)
        ann_dir.mkdir(parents=True)
        for i in range(5):
            src = Path(CHAIR) / 'JPEGImages' / f'frame_{i:06d}.jpg'
            (img_dir / f'{i:05d}.jpg').write_bytes(src.read_bytes())
        src = Path(CHAIR) / 'Annotations' / 'frame_000000.png'
        (ann_dir / '00000.png').write_bytes(src.read_bytes())
        meta['videos'][vid] = {
            'objects': {'1': {'frames': ['00000', '00002', '00004']}}}
    (root / 'valid' / 'meta.json').write_text(json.dumps(meta))
    return root, ckpt


@pytest.mark.slow
def test_eval_youtube_branch(mini_youtube, tmp_path):
    """Y18 end-to-end: split remap (val->valid), required-frames filtering
    via meta.json, palette saves under Annotations/, zip packaging
    (reference eval.py:92-94, 251-257)."""
    root, ckpt = mini_youtube
    out = tmp_path / 'y18_out'
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    r = subprocess.run(
        [sys.executable, 'eval.py', '--dataset', 'Y18',
         '--y18_path', str(root), '--model', str(ckpt),
         '--output', str(out), '--size', '144',
         '--compute_dtype', 'float32'],
        capture_output=True, text=True, timeout=500,
        cwd=str(Path(__file__).parent.parent), env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert 'Making zip for YouTubeVOS' in r.stdout

    for vid in ('vid0', 'vid1'):
        masks = sorted((out / 'Annotations' / vid).glob('*.png'))
        # only the meta.json-required frames are saved (no --save_all)
        assert [m.stem for m in masks] == ['00000', '00002', '00004'], masks
        m = Image.open(masks[0])
        assert m.mode == 'P'

    import zipfile
    zpath = out / f'{out.name}.zip'
    assert zpath.exists()
    with zipfile.ZipFile(zpath) as z:
        names = z.namelist()
    assert any(n.startswith('Annotations/vid0') and n.endswith('.png')
               for n in names), names


@pytest.mark.slow
def test_eval_memory_shards_matches(mini_generic, tmp_path):
    """--memory_shards 8: the CLI-reachable multi-chip memory-bank path (the
    banks live sharded over the 8-virtual-CPU mesh, the per-frame readout is
    the exact sharded program) produces the same masks as the single-chip
    run."""
    root, ckpt = mini_generic
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    outs = {}
    for tag, extra in (('single', []), ('sharded', ['--memory_shards', '8'])):
        out = tmp_path / tag
        r = subprocess.run(
            [sys.executable, 'eval.py', '--dataset', 'G',
             '--generic_path', str(root), '--model', str(ckpt),
             '--output', str(out), '--size', '144', '--save_all',
             '--no_chunked', '--compute_dtype', 'float32'] + extra,
            capture_output=True, text=True, timeout=500,
            cwd=str(Path(__file__).parent.parent), env=env)
        assert r.returncode == 0, r.stderr[-2000:]
        outs[tag] = sorted((out / 'chair').glob('*.png'))
        assert len(outs[tag]) == 5

    for pa, pb in zip(outs['single'], outs['sharded']):
        a = np.asarray(Image.open(pa))
        b = np.asarray(Image.open(pb))
        assert float(np.mean(a == b)) >= 0.999, pa.name
