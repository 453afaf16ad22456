"""Long-video stress: the full InferenceCore loop through many frames with a
small memory budget must trigger repeated consolidations AND long-term
eviction while staying finite and bounded (the expand_long_vid scenario,
BASELINE.md config #4)."""

import numpy as np
import pytest
import jax.numpy as jnp


@pytest.mark.slow
def test_long_video_consolidation_and_eviction():
    from xmem2_tpu.models.init import init_params
    from xmem2_tpu.inference.net import XMemNet
    from xmem2_tpu.inference.core import InferenceCore

    cfg = {
        'hidden_dim': 64, 'top_k': 10, 'mem_every': 2, 'deep_update_every': -1,
        'enable_long_term': True, 'enable_long_term_count_usage': True,
        'max_mid_term_frames': 4, 'min_mid_term_frames': 2,
        'num_prototypes': 8, 'max_long_term_elements': 64, 'size': -1,
    }
    params = init_params(seed=0)
    # keep keys small so similarities stay in a sane range (see e2e test)
    params.tree['key_proj']['key_proj']['weight'] = \
        params.tree['key_proj']['key_proj']['weight'] * 0.01
    params.tree['key_proj']['d_proj']['weight'] = \
        params.tree['key_proj']['d_proj']['weight'] * 0.01
    net = XMemNet(params)
    proc = InferenceCore(net, config=cfg)
    proc.set_all_labels([1])

    rng = np.random.default_rng(0)
    h, w = 64, 96
    base = rng.standard_normal((h, w, 3)).astype(np.float32)
    mask0 = np.zeros((1, h, w), np.float32)
    mask0[0, 20:40, 30:60] = 1

    # ping-pong the same few frames, expand_long_vid style
    frames = [base + 0.05 * rng.standard_normal((h, w, 3)).astype(np.float32)
              for _ in range(6)]
    order = list(range(6)) + list(range(4, -1, -1))
    evicted = False
    n_frames = 60
    for ti in range(n_frames):
        f = jnp.asarray(frames[order[ti % len(order)]])
        if ti == 0:
            prob = proc.step(f, jnp.asarray(mask0), [1])
        else:
            prob = proc.step(f, end=(ti == n_frames - 1))
        p = np.asarray(prob)
        assert np.isfinite(p).all(), f'non-finite prob at frame {ti}'
        mm = proc.memory
        assert mm.temp_size <= cfg['max_mid_term_frames'] * mm.HW
        assert mm.long_size <= cfg['max_long_term_elements']
        if mm.long_size >= cfg['max_long_term_elements'] - cfg['num_prototypes']:
            evicted = True

    assert proc.memory.long_size > 0, 'consolidation never happened'
    assert evicted, 'long-term memory never reached the eviction regime'
