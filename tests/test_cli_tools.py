"""CLI smokes for the two host-side tools: import_existing.py (workspace
project import, reference import_existing.py:23-87) and merge_multi_scale.py
(multi-scale score ensembling, reference merge_multi_scale.py:26-135).

Both are pure host-side (PIL/numpy) — no JAX — so the subprocesses are cheap.
"""

import json
import os
import subprocess
import sys
import zipfile
from pathlib import Path

import numpy as np
from PIL import Image

REPO = '/root/repo'


def run_cli(script, args, cwd):
    env = dict(os.environ)
    env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')
    return subprocess.run(
        [sys.executable, os.path.join(REPO, script)] + args,
        cwd=cwd, env=env, capture_output=True, text=True, timeout=300)


class TestImportExisting:
    def _make_sources(self, root: Path, n=3):
        imgs = root / 'src_images'
        msks = root / 'src_masks'
        imgs.mkdir()
        msks.mkdir()
        rng = np.random.default_rng(0)
        for i in range(n):
            arr = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
            Image.fromarray(arr).save(imgs / f'{i:05d}.jpg')
        # two-object RGB masks: red + green blobs on black
        for i in range(2):
            m = np.zeros((48, 64, 3), np.uint8)
            m[8:20, 8:20] = (255, 0, 0)
            m[28:40, 40:60] = (0, 255, 0)
            Image.fromarray(m).save(msks / f'{i:05d}.png')
        return imgs, msks

    def test_import_images_and_masks(self, tmp_path):
        imgs, msks = self._make_sources(tmp_path)
        proc = run_cli('import_existing.py',
                       ['--name', 'proj', '--size', '32',
                        '--images', str(imgs), '--masks', str(msks)],
                       cwd=tmp_path)
        assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])

        proj = tmp_path / 'workspace' / 'proj'
        out_imgs = sorted((proj / 'images').iterdir())
        assert [p.name for p in out_imgs] == [
            'frame_000000.jpg', 'frame_000001.jpg', 'frame_000002.jpg']
        im = Image.open(out_imgs[0])
        # shorter side resized to 32, aspect preserved (48x64 -> 32x42)
        assert min(im.size) == 32

        out_msks = sorted((proj / 'masks').iterdir())
        assert len(out_msks) == 2
        m = Image.open(out_msks[0])
        assert m.mode == 'P'
        idx = np.asarray(m)
        # background 0 + two object indices, nearest-resize keeps them pure
        assert set(np.unique(idx)) == {0, 1, 2}

        info = json.loads((proj / 'info.json').read_text())
        assert info['num_objects'] == 2

    def test_refuses_to_overwrite(self, tmp_path):
        imgs, msks = self._make_sources(tmp_path)
        first = run_cli('import_existing.py',
                        ['--name', 'proj', '--size', '32',
                         '--images', str(imgs)], cwd=tmp_path)
        assert first.returncode == 0
        again = run_cli('import_existing.py',
                        ['--name', 'proj', '--size', '32',
                         '--images', str(imgs)], cwd=tmp_path)
        assert again.returncode == 0
        assert 'already has images' in again.stdout
        # untouched: still exactly 3 frames
        assert len(list((tmp_path / 'workspace/proj/images').iterdir())) == 3


class TestMergeMultiScale:
    def _write_scores(self, run: Path, vid: str, frames: dict,
                      backward=None):
        d = run / 'Scores' / vid
        d.mkdir(parents=True)
        for name, prob in frames.items():
            np.savez_compressed(d / f'{name}.npz',
                                prob=prob.astype(np.uint8))
        if backward is not None:
            (d / 'backward.json').write_text(json.dumps(backward))

    def test_merge_two_scales_davis(self, tmp_path):
        """Summing across runs must flip the argmax where the runs disagree
        asymmetrically, missing per-run frames are skipped, and the backward
        mapping remaps internal indices to original labels."""
        h = w = 8
        # run A alone: class 1 wins everywhere. A+B summed: class 2 wins in
        # the right half (B is confident there), so merging changes pixels.
        a = np.zeros((3, h, w), np.float32)
        a[1] = 120
        a[2] = 100
        b = np.zeros((3, h, w), np.float32)
        b[1, :, :w // 2] = 110
        b[2, :, w // 2:] = 200
        runA = tmp_path / 'runA'
        runB = tmp_path / 'runB'
        backward = {'2': 1, '5': 2}   # original labels 2,5 <- indices 1,2
        self._write_scores(runA, 'vid1', {'00000': a, '00001': a}, backward)
        self._write_scores(runB, 'vid1', {'00000': b})   # 00001 missing in B
        out = tmp_path / 'merged'

        proc = run_cli('merge_multi_scale.py',
                       ['--dataset', 'D', '--list', str(runA), str(runB),
                        '--output', str(out), '--num_proc', '2'],
                       cwd=tmp_path)
        assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])

        m0 = np.asarray(Image.open(out / 'vid1' / '00000.png'))
        # left half: argmax index 1 -> label 2; right half: index 2 -> label 5
        assert set(np.unique(m0[:, :w // 2])) == {2}
        assert set(np.unique(m0[:, w // 2:])) == {5}
        # frame present only in runA: index 1 everywhere -> label 2
        m1 = np.asarray(Image.open(out / 'vid1' / '00001.png'))
        assert set(np.unique(m1)) == {2}
        # palette PNGs + DAVIS zip packaging
        assert Image.open(out / 'vid1' / '00000.png').mode == 'P'
        assert zipfile.ZipFile(str(out) + '.zip').namelist()

    def test_merge_youtube_layout_no_backward(self, tmp_path):
        """Y dataset: outputs under Annotations/, no backward.json -> raw
        argmax indices, zip contains the Annotations tree."""
        h = w = 4
        a = np.zeros((2, h, w), np.float32)
        a[1] = 50
        run = tmp_path / 'run'
        self._write_scores(run, 'vidY', {'00000': a})
        out = tmp_path / 'merged_y'
        proc = run_cli('merge_multi_scale.py',
                       ['--dataset', 'Y', '--list', str(run),
                        '--output', str(out), '--num_proc', '1'],
                       cwd=tmp_path)
        assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
        m = np.asarray(Image.open(out / 'Annotations' / 'vidY' / '00000.png'))
        assert set(np.unique(m)) == {1}
        zf = zipfile.ZipFile(out / (out.name + '.zip'))
        assert any(n.startswith('Annotations') for n in zf.namelist())
