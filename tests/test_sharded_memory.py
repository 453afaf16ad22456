"""Sharded memory-bank PRODUCT path (config `memory_shards` / eval.py
--memory_shards): MemoryManager keeps [long | temp | perm] sharded over a
`memory` mesh axis and match_memory dispatches to the exact sharded readout
(parallel/sharded_readout.sharded_topk_readout_multi).

Parity oracle: the single-device MemoryManager, which is itself pinned
against the torch reference in tests/test_memory_manager.py. Covered:
add/match cycles, usage counters, working->long-term consolidation,
long-term eviction, permanent memory add/update/remove — all with the bank
physically distributed over the 8-virtual-CPU mesh (so each shard holds 1/8
of the slots: the bank "exceeds one chip's worth" by construction).

Reference parity target: inference/memory_manager.py match_memory :61-190
(the reference has no multi-GPU bank — this is the rebuild's CP analog,
SURVEY §2.9/§5.7).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from xmem2_tpu.memory.manager import MemoryManager

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason='needs the 8-virtual-device CPU mesh')

CK, CV, H, W = 16, 8, 6, 8


def make_config(**over):
    cfg = {
        'hidden_dim': 8,
        'top_k': 5,
        'enable_long_term': True,
        'enable_long_term_count_usage': True,
        'max_mid_term_frames': 4,
        'min_mid_term_frames': 2,
        'num_prototypes': 8,
        'max_long_term_elements': 100,
        'permanent_buffer_frames': 2,
        'memory_shards': 0,
    }
    cfg.update(over)
    return cfg


class Driver:
    """NHWC driver over our MemoryManager (single- or sharded-bank)."""

    def __init__(self, config):
        self.mm = MemoryManager(dict(config))

    def add(self, key, shrinkage, value, objects, selection=None,
            permanent=False, ti=None):
        j = lambda x, src: jnp.asarray(np.moveaxis(x, src, -1))
        self.mm.add_memory(
            j(key, 1), j(shrinkage, 1), j(value, 2), objects,
            selection=j(selection, 1) if selection is not None else None,
            permanent=permanent, ti=ti)

    def match(self, qk, qe):
        j = lambda x: jnp.asarray(np.moveaxis(x, 1, -1))
        out = self.mm.match_memory(j(qk), j(qe) if qe is not None else None)
        return np.moveaxis(np.asarray(out)[0], -1, 1)   # [O, CV, h, w]


def frame_data(rng, n_obj):
    key = rng.standard_normal((1, CK, H, W)).astype(np.float32)
    shrink = (rng.standard_normal((1, 1, H, W)).astype(np.float32) ** 2) + 1
    sel = (1 / (1 + np.exp(-rng.standard_normal((1, CK, H, W))))).astype(
        np.float32)
    value = rng.standard_normal((1, n_obj, CV, H, W)).astype(np.float32)
    return key, shrink, sel, value


def run_pair(config, n_frames, n_obj=2, rng_seed=0, permanent_frames=(),
             shards=8):
    """Identical add/match sequence through the single-device and the
    sharded manager; returns both drivers and their per-frame readouts."""
    rng = np.random.default_rng(rng_seed)
    base = Driver(make_config(**config))
    shrd = Driver(make_config(memory_shards=shards, **config))
    objects = list(range(1, n_obj + 1))
    base_outs, shrd_outs = [], []
    for ti in range(n_frames):
        key, shrink, sel, value = frame_data(rng, n_obj)
        permanent = ti in permanent_frames
        base.add(key, shrink, value, objects, sel, permanent=permanent, ti=ti)
        shrd.add(key, shrink, value, objects, sel, permanent=permanent, ti=ti)
        qk, qs, qe, _ = frame_data(rng, n_obj)
        base_outs.append(base.match(qk, qe))
        shrd_outs.append(shrd.match(qk, qe))
    return base, shrd, base_outs, shrd_outs


def assert_sharded(store, n=8):
    assert store is not None
    assert len(store.key.sharding.device_set) == n
    assert not store.key.sharding.is_fully_replicated
    assert not store.value.sharding.is_fully_replicated


class TestShardedManagerParity:
    def test_add_match_and_usage(self):
        base, shrd, b, s = run_pair(dict(max_mid_term_frames=100), 4)
        for i, (x, y) in enumerate(zip(b, s)):
            np.testing.assert_allclose(y, x, rtol=1e-5, atol=1e-5,
                                       err_msg=f'frame {i}')
        assert_sharded(shrd.mm.temp)
        # usage counters propagate through the sharded update path
        n = int(base.mm.temp_size)
        np.testing.assert_allclose(
            np.asarray(shrd.mm.temp.use_count)[:n],
            np.asarray(base.mm.temp.use_count)[:n], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(shrd.mm.temp.life_count)[:n],
            np.asarray(base.mm.temp.life_count)[:n], rtol=1e-5, atol=1e-6)

    @pytest.mark.slow
    def test_consolidation_and_eviction(self):
        # 10 frames with max_mt=4/min_mt=2 trigger consolidation repeatedly;
        # max_long=64 forces a long-term eviction along the way
        base, shrd, b, s = run_pair(
            dict(max_long_term_elements=64), 10)
        for i, (x, y) in enumerate(zip(b, s)):
            np.testing.assert_allclose(y, x, rtol=1e-4, atol=1e-5,
                                       err_msg=f'frame {i}')
        assert base.mm.long_size > 0, 'consolidation must have run'
        assert shrd.mm.long_size == base.mm.long_size
        assert_sharded(shrd.mm.long)

    @pytest.mark.slow
    def test_permanent_memory_ops(self):
        base, shrd, b, s = run_pair(
            dict(max_mid_term_frames=100), 6, permanent_frames=(0, 3))
        for i, (x, y) in enumerate(zip(b, s)):
            np.testing.assert_allclose(y, x, rtol=1e-5, atol=1e-5,
                                       err_msg=f'frame {i}')
        assert_sharded(shrd.mm.perm)

        # in-place update + remove of a permanent frame
        rng = np.random.default_rng(99)
        key, shrink, sel, value = frame_data(rng, 2)
        j = lambda x, src: jnp.asarray(np.moveaxis(x, src, -1))
        for d in (base, shrd):
            d.mm.update_permanent_memory(
                3, j(key, 1), j(shrink, 1), j(value, 2), selection=j(sel, 1))
            d.mm.remove_from_permanent_memory(0)
        qk, _, qe, _ = frame_data(rng, 2)
        np.testing.assert_allclose(shrd.match(qk, qe), base.match(qk, qe),
                                   rtol=1e-5, atol=1e-5)

    def test_capacity_divides_mesh(self):
        shrd = Driver(make_config(memory_shards=8, max_mid_term_frames=100))
        rng = np.random.default_rng(0)
        key, shrink, sel, value = frame_data(rng, 2)
        shrd.add(key, shrink, value, [1, 2], sel)
        for store in (shrd.mm.temp, shrd.mm.perm, shrd.mm.long):
            if store is not None:
                assert store.capacity % 8 == 0
