"""init_params must produce exactly the tree structure (paths + shapes) that
convert_state_dict produces from a reference checkpoint."""

import numpy as np

from xmem2_tpu.bridge.torch_params import convert_state_dict
from xmem2_tpu.models.init import init_params
from tests.conftest import load_golden
from tests.golden_utils import synth_state_dict


def flatten(tree, prefix=''):
    out = {}
    for k, v in tree.items():
        key = f'{prefix}.{k}' if prefix else k
        if isinstance(v, dict):
            out.update(flatten(v, key))
        else:
            out[key] = np.asarray(v).shape
    return out


def test_init_structure_matches_checkpoint():
    meta = load_golden('model_golden')
    names = [str(n) for n in meta['sdmeta/names']]
    shapes = [tuple(s[:nd]) for s, nd in
              zip(meta['sdmeta/shapes'], meta['sdmeta/ndims'])]
    converted = convert_state_dict(synth_state_dict(names, shapes))
    fresh = init_params()

    a = flatten(converted.tree)
    b = flatten(fresh.tree)
    missing = sorted(set(a) - set(b))
    extra = sorted(set(b) - set(a))
    assert not missing, f'init_params missing: {missing[:10]}'
    assert not extra, f'init_params extra: {extra[:10]}'
    mismatched = [k for k in a if a[k] != b[k]]
    assert not mismatched, \
        f'shape mismatches: {[(k, a[k], b[k]) for k in mismatched[:10]]}'


def test_forward_runs():
    import jax.numpy as jnp
    from xmem2_tpu.models import encode_key
    p = init_params()
    key, shrinkage, selection, f16, f8, f4 = encode_key(
        p, jnp.zeros((1, 64, 96, 3)))
    assert key.shape == (1, 4, 6, 64)
    assert shrinkage.shape == (1, 4, 6, 1)
    assert f16.shape == (1, 4, 6, 1024)
