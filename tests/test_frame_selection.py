"""Frame-selection parity + candidate-API tests.

The torch reference select_next_candidates (frame_selection.py:99) is the
oracle: identical synthetic keys/masks must yield identical chosen frame
indices. The reference file needs torchvision (not installed here), so a
minimal functional stub backed by torch.nn.functional is injected first.
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')

torch = pytest.importorskip('torch')

CHAIR = '/root/reference/example_videos/chair'


def _stub_torchvision():
    if 'torchvision' in sys.modules:
        return
    import torch.nn.functional as TF

    class InterpolationMode:
        NEAREST = 'nearest'
        BILINEAR = 'bilinear'

    class Resize:
        def __init__(self, size, interpolation='nearest'):
            self.size = tuple(size)
            self.mode = interpolation

        def __call__(self, x):
            # tensor path of torchvision Resize == F.interpolate
            return TF.interpolate(x[None].float(), size=self.size,
                                  mode=self.mode)[0]

    tv = types.ModuleType('torchvision')
    transforms = types.ModuleType('torchvision.transforms')
    functional = types.ModuleType('torchvision.transforms.functional')
    transforms.Resize = Resize
    transforms.InterpolationMode = InterpolationMode
    tv.transforms = transforms
    sys.modules['torchvision'] = tv
    sys.modules['torchvision.transforms'] = transforms
    sys.modules['torchvision.transforms.functional'] = functional
    # frame_selection.py imports extract_keys from its utils sibling at module
    # level; stub it (the parity test drives select_next_candidates directly)
    utils_stub = types.ModuleType('inference.frame_selection.frame_selection_utils')
    utils_stub.extract_keys = None
    utils_stub.get_determenistic_augmentations = None
    sys.modules['inference.frame_selection.frame_selection_utils'] = utils_stub


def synth_case(seed=0, n=12, h=6, w=8, ck=16, H=48, W=64):
    rng = np.random.default_rng(seed)
    keys = rng.standard_normal((n, ck, h, w)).astype(np.float32)
    shrink = ((rng.standard_normal((n, 1, h, w)) ** 2) + 1).astype(np.float32)
    sel = (1 / (1 + np.exp(-rng.standard_normal((n, ck, h, w))))).astype(np.float32)
    masks = []
    for i in range(n):
        m = np.zeros((1, H, W), np.float32)
        if i % 5 == 3:
            m[0, :1, :1] = 1.0          # tiny mask -> filtered out
        else:
            y, x = rng.integers(0, H - 16), rng.integers(0, W - 16)
            m[0, y:y + 16, x:x + 16] = 1.0
        masks.append(m)
    return keys, shrink, sel, masks


class TestSelectNextCandidatesParity:
    @pytest.mark.parametrize('seed,k,prev', [(0, 3, (0,)), (1, 4, (0, 5)),
                                             (2, 2, (7,))])
    def test_same_choices_as_reference(self, seed, k, prev):
        _stub_torchvision()
        from inference.frame_selection.frame_selection import (
            select_next_candidates as ref_select)
        from xmem2_tpu.inference.frame_selection.frame_selection import (
            select_next_candidates as our_select)

        keys, shrink, sel, masks = synth_case(seed)

        ref = ref_select(
            torch.from_numpy(keys), torch.from_numpy(shrink),
            torch.from_numpy(sel), [torch.from_numpy(m) for m in masks],
            num_next_candidates=k, previously_chosen_candidates=list(prev),
            device='cpu', alpha=0.5, min_mask_presence_percent=0.25)

        ours = our_select(
            np.moveaxis(keys, 1, -1), np.moveaxis(shrink, 1, -1),
            np.moveaxis(sel, 1, -1), [m for m in masks],
            num_next_candidates=k, previously_chosen_candidates=list(prev),
            alpha=0.5, min_mask_presence_percent=0.25)

        assert list(ours) == [int(i) for i in ref]

    def test_alpha_extremes_match(self):
        """alpha=0 ignores masks; alpha=1 compares only masked regions
        (reference docstring semantics)."""
        _stub_torchvision()
        from inference.frame_selection.frame_selection import (
            select_next_candidates as ref_select)
        from xmem2_tpu.inference.frame_selection.frame_selection import (
            select_next_candidates as our_select)

        keys, shrink, sel, masks = synth_case(4)
        for alpha in (0.0, 1.0):
            ref = ref_select(
                torch.from_numpy(keys), torch.from_numpy(shrink),
                torch.from_numpy(sel), [torch.from_numpy(m) for m in masks],
                num_next_candidates=2, previously_chosen_candidates=[0],
                device='cpu', alpha=alpha)
            ours = our_select(
                np.moveaxis(keys, 1, -1), np.moveaxis(shrink, 1, -1),
                np.moveaxis(sel, 1, -1), masks,
                num_next_candidates=2, previously_chosen_candidates=[0],
                alpha=alpha)
            assert list(ours) == [int(i) for i in ref], f'alpha={alpha}'


class TestCandidateAPI:
    @pytest.mark.slow
    def test_select_k_next_best_annotation_candidates(self, tmp_path,
                                                      monkeypatch):
        """End-to-end API (reference run_on_video.py:285-370) on a chair
        subset with precomputed masks."""
        from PIL import Image
        from xmem2_tpu.bridge.torch_params import save_params
        from xmem2_tpu.models.init import init_params
        import xmem2_tpu.config as C

        imgs = tmp_path / 'imgs'
        anns = tmp_path / 'anns'
        out = tmp_path / 'out' / 'masks'
        imgs.mkdir()
        anns.mkdir()
        out.mkdir(parents=True)
        n = 8
        for i in range(n):
            src = Path(CHAIR) / 'JPEGImages' / f'frame_{i:06d}.jpg'
            (imgs / src.name).write_bytes(src.read_bytes())
        ann = Path(CHAIR) / 'Annotations' / 'frame_000000.png'
        (anns / ann.name).write_bytes(ann.read_bytes())
        # "previously predicted" masks: the first annotation replicated
        m = np.asarray(Image.open(ann).convert('P'), np.uint8)
        for i in range(n):
            Image.fromarray((m > 0).astype(np.uint8) * 255).save(
                out / f'frame_{i:06d}.png')

        ckpt = tmp_path / 'synth.npz'
        p = init_params(seed=0)
        p.tree['key_proj']['key_proj']['weight'] = \
            p.tree['key_proj']['key_proj']['weight'] * 0.01
        p.tree['key_proj']['d_proj']['weight'] = \
            p.tree['key_proj']['d_proj']['weight'] * 0.01
        save_params(p, str(ckpt))
        monkeypatch.setitem(C.VIDEO_INFERENCE_CONFIG, 'model', str(ckpt))
        monkeypatch.setitem(C.VIDEO_INFERENCE_CONFIG, 'size', 144)

        from xmem2_tpu.inference.run_on_video import (
            select_k_next_best_annotation_candidates)
        chosen = select_k_next_best_annotation_candidates(
            str(imgs), str(anns), masks_out_path=tmp_path / 'out', k=3,
            print_progress=False, previously_chosen_candidates=(0,),
            use_previously_predicted_masks=True)
        assert len(chosen) == 3
        assert all(0 <= c < n for c in chosen)
        assert 0 not in chosen          # only_new_candidates
        assert len(set(chosen)) == 3
