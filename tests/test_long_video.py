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


@pytest.mark.slow
def test_long_term_host_spill_and_revive():
    """Host-DRAM spill tier (SURVEY §5.7 stretch): with spill_long_term on,
    long-term eviction archives the dropped rows host-side; revive re-uploads
    the most relevant ones into free capacity and they participate in
    subsequent matches."""
    from xmem2_tpu.models.init import init_params
    from xmem2_tpu.inference.net import XMemNet
    from xmem2_tpu.inference.core import InferenceCore

    cfg = {
        'hidden_dim': 64, 'top_k': 10, 'mem_every': 2, 'deep_update_every': -1,
        'enable_long_term': True, 'enable_long_term_count_usage': True,
        'max_mid_term_frames': 4, 'min_mid_term_frames': 2,
        'num_prototypes': 8, 'max_long_term_elements': 64, 'size': -1,
        'spill_long_term': True,
    }
    params = init_params(seed=0)
    params.tree['key_proj']['key_proj']['weight'] = \
        params.tree['key_proj']['key_proj']['weight'] * 0.01
    params.tree['key_proj']['d_proj']['weight'] = \
        params.tree['key_proj']['d_proj']['weight'] * 0.01
    net = XMemNet(params)
    proc = InferenceCore(net, config=cfg)
    proc.set_all_labels([1])

    rng = np.random.default_rng(1)
    h, w = 64, 96
    frames = [rng.standard_normal((h, w, 3)).astype(np.float32) * 0.5
              for _ in range(6)]
    mask0 = np.zeros((1, h, w), np.float32)
    mask0[0, 20:40, 30:60] = 1

    order = list(range(6)) + list(range(4, -1, -1))
    n_frames = 80
    for ti in range(n_frames):
        f = jnp.asarray(frames[order[ti % len(order)]])
        if ti == 0:
            prob = proc.step(f, jnp.asarray(mask0), [1])
        else:
            prob = proc.step(f, end=(ti == n_frames - 1))
        assert np.isfinite(np.asarray(prob)).all(), f'frame {ti}'

    mm = proc.memory
    assert mm.archive is not None and len(mm.archive) > 0, \
        'eviction never archived anything'
    archived_before = len(mm.archive)

    # free some capacity, then revive against the last frame's key
    key, _, _ = proc.encode_frame_key(jnp.asarray(frames[0]))
    mm.long = __import__('xmem2_tpu.memory.store', fromlist=['x']) \
        .evict_by_usage(mm.long, jnp.int32(16))
    mm.long_size = int(mm.long.size)
    revived = mm.revive_from_archive(query_key=key)
    assert revived > 0
    assert len(mm.archive) == archived_before - revived
    assert mm.long_size == 16 + revived
    assert mm.long_size <= cfg['max_long_term_elements'] - cfg['num_prototypes']

    # the revived rows are live: a match over them stays finite
    prob = proc.step(jnp.asarray(frames[1]))
    assert np.isfinite(np.asarray(prob)).all()


@pytest.mark.slow
def test_spill_revive_through_production_update_config():
    """The PRODUCTION revive path: a run with spill_long_term on archives
    evicted rows; raising max_long_term_elements live (the GUI "max
    long-term" slider / InferenceCore.update_config, reference
    gui.py:1120-1128 analog) grows the store and pulls archived rows back —
    no test-only internals involved."""
    from xmem2_tpu.models.init import init_params
    from xmem2_tpu.inference.net import XMemNet
    from xmem2_tpu.inference.core import InferenceCore

    cfg = {
        'hidden_dim': 64, 'top_k': 10, 'mem_every': 2, 'deep_update_every': -1,
        'enable_long_term': True, 'enable_long_term_count_usage': True,
        'max_mid_term_frames': 4, 'min_mid_term_frames': 2,
        'num_prototypes': 8, 'max_long_term_elements': 64, 'size': -1,
        'spill_long_term': True,
    }
    params = init_params(seed=0)
    params.tree['key_proj']['key_proj']['weight'] = \
        params.tree['key_proj']['key_proj']['weight'] * 0.01
    params.tree['key_proj']['d_proj']['weight'] = \
        params.tree['key_proj']['d_proj']['weight'] * 0.01
    net = XMemNet(params)
    proc = InferenceCore(net, config=dict(cfg))
    proc.set_all_labels([1])

    rng = np.random.default_rng(2)
    h, w = 64, 96
    frames = [rng.standard_normal((h, w, 3)).astype(np.float32) * 0.5
              for _ in range(6)]
    mask0 = np.zeros((1, h, w), np.float32)
    mask0[0, 20:40, 30:60] = 1

    order = list(range(6)) + list(range(4, -1, -1))
    for ti in range(80):
        f = jnp.asarray(frames[order[ti % len(order)]])
        if ti == 0:
            proc.step(f, jnp.asarray(mask0), [1])
        else:
            proc.step(f)

    mm = proc.memory
    assert mm.archive is not None and len(mm.archive) > 0
    archived_before = len(mm.archive)
    long_before = mm.long_size

    new_cfg = dict(cfg)
    new_cfg['max_long_term_elements'] = 256
    proc.update_config(new_cfg)

    revived = archived_before - len(mm.archive)
    assert revived > 0, 'update_config did not revive archived rows'
    assert mm.long_size == long_before + revived
    assert mm.long.capacity >= 256 + cfg['num_prototypes']

    # the run continues with the revived rows matched
    prob = proc.step(jnp.asarray(frames[2]))
    assert np.isfinite(np.asarray(prob)).all()
