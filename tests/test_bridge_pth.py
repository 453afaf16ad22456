"""Bridge .pth round-trip: the real conversion path (torch.save file ->
load_torch_checkpoint / load_any -> XMemParams) — not just in-memory state
dicts — must produce the identical parameter tree.

This keeps the real-weights gate (tests/test_real_weights.py, armed but
skipped in the zero-egress environment) low-risk: when saves/XMem.pth is
downloadable, the only untested step left is the weights' values themselves.
Reference weight layout: model/network.py load_weights + the distributed
saves/XMem.pth (reference README.md:179-183).
"""

import os

import numpy as np
import pytest
import jax

from tests.golden_utils import synth_state_dict

torch = pytest.importorskip('torch')

GOLDEN = os.path.join(os.path.dirname(__file__), 'golden', 'model_golden.npz')


@pytest.fixture(scope='module')
def full_size_sd():
    golden = np.load(GOLDEN)
    names = [str(n) for n in golden['sdmeta/names']]
    shapes = [tuple(s[:nd]) for s, nd in
              zip(golden['sdmeta/shapes'], golden['sdmeta/ndims'])]
    return synth_state_dict(names, shapes)


def _tree_equal(a, b, path=''):
    assert set(a) == set(b), f'{path}: {set(a) ^ set(b)}'
    for k in a:
        if isinstance(a[k], dict):
            _tree_equal(a[k], b[k], f'{path}/{k}')
        else:
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=f'{path}/{k}')


def test_pth_file_roundtrip(full_size_sd, tmp_path):
    """torch.save(.pth) -> load_torch_checkpoint == convert_state_dict on
    the in-memory dict, for the full-size reference-shaped state dict."""
    from xmem2_tpu.bridge.torch_params import (
        convert_state_dict, load_torch_checkpoint)

    pth = tmp_path / 'synth_xmem.pth'
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in full_size_sd.items()}, str(pth))

    from_file = load_torch_checkpoint(str(pth))
    in_memory = convert_state_dict(dict(full_size_sd))
    _tree_equal(in_memory.tree, from_file.tree)


def test_load_any_dispatch_and_npz_roundtrip(full_size_sd, tmp_path):
    """load_any picks the loader by extension; .pth -> save_params(.npz) ->
    load_any(.npz) survives bit-exactly (the production conversion recipe
    in README's real-weights gate)."""
    from xmem2_tpu.bridge.torch_params import load_any, save_params

    pth = tmp_path / 'synth_xmem.pth'
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in full_size_sd.items()}, str(pth))
    p1 = load_any(str(pth))

    npz = tmp_path / 'synth_xmem.npz'
    save_params(p1, str(npz))
    p2 = load_any(str(npz))
    _tree_equal(p1.tree, p2.tree)

    # the converted tree is jit-consumable (pytree registration)
    leaf_sum = jax.jit(lambda p: sum(
        x.sum() for x in jax.tree.leaves(p.tree)))(p2)
    assert np.isfinite(float(leaf_sum))
