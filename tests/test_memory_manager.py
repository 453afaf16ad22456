"""Parity tests: xmem2_tpu MemoryManager vs the reference MemoryManager
(torch CPU, imported from /root/reference as a test oracle).

Covers: add/match cycles, usage counting, working->long-term consolidation,
long-term eviction, permanent memory add/update/remove, multi-group (without
long-term — the reference's multi-group+LT suffix logic is a documented
deviation)."""

import sys

import numpy as np
import pytest
import jax.numpy as jnp

sys.path.insert(0, '/root/reference')

from xmem2_tpu.memory.manager import MemoryManager

torch = pytest.importorskip('torch')


def make_config(**over):
    cfg = {
        'hidden_dim': 8,
        'top_k': 5,
        'enable_long_term': True,
        'enable_long_term_count_usage': True,
        'max_mid_term_frames': 4,
        'min_mid_term_frames': 2,
        'num_prototypes': 8,
        'max_long_term_elements': 100,  # high enough to avoid eviction unless a test lowers it
        'permanent_buffer_frames': 2,
    }
    cfg.update(over)
    return cfg


class RefDriver:
    """Drives the reference MemoryManager with NCHW numpy data."""

    def __init__(self, config):
        from inference.memory_manager import MemoryManager as RefMM
        self.mm = RefMM(config=dict(config))

    def add(self, key, shrinkage, value, objects, selection=None, permanent=False, ti=None):
        t = lambda x: torch.from_numpy(np.ascontiguousarray(x))
        self.mm.add_memory(t(key), t(shrinkage), t(value), objects,
                           selection=t(selection) if selection is not None else None,
                           permanent=permanent, ti=ti)

    def match(self, qk, qe):
        t = lambda x: torch.from_numpy(np.ascontiguousarray(x))
        out = self.mm.match_memory(t(qk), t(qe) if qe is not None else None)
        return out.numpy()  # [O, CV, h, w]


class JaxDriver:
    """Drives our MemoryManager with NHWC jnp data (converted from NCHW)."""

    def __init__(self, config):
        self.mm = MemoryManager(dict(config))

    def add(self, key, shrinkage, value, objects, selection=None, permanent=False, ti=None):
        j = lambda x, src: jnp.asarray(np.moveaxis(x, src, -1))
        self.mm.add_memory(
            j(key, 1), j(shrinkage, 1), j(value, 2), objects,
            selection=j(selection, 1) if selection is not None else None,
            permanent=permanent, ti=ti)

    def match(self, qk, qe):
        j = lambda x: jnp.asarray(np.moveaxis(x, 1, -1))
        out = self.mm.match_memory(j(qk), j(qe) if qe is not None else None)
        # ours: [1, O, h, w, CV] -> [O, CV, h, w]
        return np.moveaxis(np.asarray(out)[0], -1, 1)


CK, CV, H, W = 16, 8, 6, 8


def frame_data(rng, n_obj):
    key = rng.standard_normal((1, CK, H, W)).astype(np.float32)
    shrink = (rng.standard_normal((1, 1, H, W)).astype(np.float32) ** 2) + 1
    sel = (1 / (1 + np.exp(-rng.standard_normal((1, CK, H, W))))).astype(np.float32)
    value = rng.standard_normal((1, n_obj, CV, H, W)).astype(np.float32)
    return key, shrink, sel, value


def run_sequence(config, n_frames, n_obj=2, rng_seed=0, permanent_frames=(),
                 match_every=1):
    """Run an identical add/match sequence through both managers, returning
    the list of per-frame readouts from each."""
    rng = np.random.default_rng(rng_seed)
    ref, ours = RefDriver(config), JaxDriver(config)
    objects = list(range(1, n_obj + 1))
    ref_outs, our_outs = [], []
    for ti in range(n_frames):
        key, shrink, sel, value = frame_data(rng, n_obj)
        permanent = ti in permanent_frames
        ref.add(key, shrink, value, objects, sel, permanent=permanent, ti=ti)
        ours.add(key, shrink, value, objects, sel, permanent=permanent, ti=ti)
        if ti % match_every == 0:
            qk, qs, qe, _ = frame_data(rng, n_obj)
            ref_outs.append(ref.match(qk, qe))
            our_outs.append(ours.match(qk, qe))
    return ref, ours, ref_outs, our_outs


class TestWorkingMemoryParity:
    def test_add_match_no_consolidation(self):
        cfg = make_config(max_mid_term_frames=100)  # never consolidates
        ref, ours, ref_outs, our_outs = run_sequence(cfg, 3)
        for i, (r, o) in enumerate(zip(ref_outs, our_outs)):
            np.testing.assert_allclose(o, r, rtol=1e-4, atol=1e-4,
                                       err_msg=f'frame {i}')

    def test_usage_counters(self):
        cfg = make_config(max_mid_term_frames=100)
        ref, ours, *_ = run_sequence(cfg, 3)
        ref_use = ref.mm.temporary_work_mem.use_count.numpy().ravel()
        ref_life = ref.mm.temporary_work_mem.life_count.numpy().ravel()
        n = ref_use.shape[0]
        our_use = np.asarray(ours.mm.temp.use_count)[:n]
        our_life = np.asarray(ours.mm.temp.life_count)[:n]
        np.testing.assert_allclose(our_use, ref_use, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(our_life, ref_life, rtol=1e-4, atol=1e-5)


class TestConsolidationParity:
    def test_consolidation_and_long_term(self):
        cfg = make_config()
        # 4-frame working cap, 2-frame min -> consolidates at frame 3, 5, 7...
        ref, ours, ref_outs, our_outs = run_sequence(cfg, 8)
        assert ref.mm.long_mem.engaged()
        assert ours.mm.long_size > 0
        for i, (r, o) in enumerate(zip(ref_outs, our_outs)):
            np.testing.assert_allclose(o, r, rtol=1e-3, atol=1e-3,
                                       err_msg=f'frame {i}')
        # long-term contents match
        n = ref.mm.long_mem.size
        np.testing.assert_allclose(
            np.asarray(ours.mm.long.key)[:n],
            ref.mm.long_mem.key[0].numpy().T, rtol=1e-4, atol=1e-4)

    def test_eviction(self):
        # max_long=20, P=8: eviction triggers at long_size >= 12 with a
        # nonzero removal count (the reference crashes on k=0 topk, so sizes
        # are chosen to stay in its valid regime)
        cfg = make_config(max_long_term_elements=20)
        ref, ours, ref_outs, our_outs = run_sequence(cfg, 14)
        assert ref.mm.long_mem.size <= 20
        assert ours.mm.long_size == ref.mm.long_mem.size
        for i, (r, o) in enumerate(zip(ref_outs, our_outs)):
            np.testing.assert_allclose(o, r, rtol=1e-3, atol=1e-3,
                                       err_msg=f'frame {i}')


class TestPermanentMemory:
    def test_permanent_preload_and_match(self):
        cfg = make_config()
        ref, ours, ref_outs, our_outs = run_sequence(
            cfg, 6, permanent_frames=(0,))
        for i, (r, o) in enumerate(zip(ref_outs, our_outs)):
            np.testing.assert_allclose(o, r, rtol=1e-3, atol=1e-3,
                                       err_msg=f'frame {i}')

    def test_update_and_remove(self):
        """The reference's update/remove path has two real bugs (off-by-one
        frame slots from the 1e-9 floor fudge, kv_memory_store.py:92, and
        object-0 value broadcast on update, :112) that we deliberately do not
        replicate — so this is a self-consistency test: updating frame i in
        place must equal having added the new data originally, and removing a
        frame must equal never having added it."""
        cfg = make_config()
        rng = np.random.default_rng(3)
        j = lambda x, src: jnp.asarray(np.moveaxis(x, src, -1))
        frames = [frame_data(rng, 2) for _ in range(3)]
        f1_new = frame_data(rng, 2)
        temp_frame = frame_data(rng, 2)
        q = frame_data(rng, 2)

        def build(perm_frames):
            d = JaxDriver(cfg)
            for ti, (key, shrink, sel, value) in enumerate(perm_frames):
                d.add(key, shrink, value, [1, 2], sel, permanent=True, ti=ti)
            key, shrink, sel, value = temp_frame
            d.add(key, shrink, value, [1, 2], sel)
            return d

        # update frame 1 in place == adding the new frame 1 originally
        a = build(frames)
        key, shrink, sel, value = f1_new
        a.mm.update_permanent_memory(1, j(key, 1), j(shrink, 1), j(value, 2), j(sel, 1))
        b = build([frames[0], f1_new, frames[2]])
        qk, _, qe, _ = q
        np.testing.assert_allclose(a.match(qk, qe), b.match(qk, qe),
                                   rtol=1e-5, atol=1e-5)

        # remove frame 0 == never having added it
        a.mm.remove_from_permanent_memory(0)
        c = build([f1_new, frames[2]])
        np.testing.assert_allclose(a.match(qk, qe), c.match(qk, qe),
                                   rtol=1e-5, atol=1e-5)


class TestMultiGroup:
    def test_late_object_group_no_longterm(self):
        # NOTE: selection is passed even though long-term is off — the
        # reference crashes on selection=None when a new group appears
        # (memory_manager.py:261 subscripts None in the placeholder add)
        cfg = make_config(enable_long_term=False,
                          enable_long_term_count_usage=False)
        rng = np.random.default_rng(5)
        ref, ours = RefDriver(cfg), JaxDriver(cfg)
        # 2 frames with one object
        for ti in range(2):
            key, shrink, sel, value = frame_data(rng, 1)
            ref.add(key, shrink, value, [1], sel)
            ours.add(key, shrink, value, [1], sel)
        # object 2 appears: group 2 gets only the later frames
        for ti in range(2, 5):
            key, shrink, sel, value = frame_data(rng, 2)
            ref.add(key, shrink, value, [1, 2], sel)
            ours.add(key, shrink, value, [1, 2], sel)
            qk, qs, qe, _ = frame_data(rng, 2)
            np.testing.assert_allclose(ours.match(qk, qe), ref.match(qk, qe),
                                       rtol=1e-3, atol=1e-3, err_msg=f'frame {ti}')


class TestFusedReadoutPath:
    """The Pallas production readout (interpret mode on CPU) must reproduce
    the jnp path through the full manager life-cycle: permanent preload,
    consolidation, long-term usage, multi-group."""

    def _fused_vs_jnp(self, monkeypatch, cfg, n_frames, permanent_frames=(),
                      n_obj=2, atol=1e-4):
        monkeypatch.setenv('XMEM2_FUSED_READOUT', '0')
        _, _, _, jnp_outs = run_sequence(cfg, n_frames, n_obj=n_obj,
                                         permanent_frames=permanent_frames)
        monkeypatch.setenv('XMEM2_FUSED_READOUT', 'interpret')
        _, _, ref_outs, fused_outs = run_sequence(
            cfg, n_frames, n_obj=n_obj, permanent_frames=permanent_frames)
        for i, (a, b) in enumerate(zip(fused_outs, jnp_outs)):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=atol,
                                       err_msg=f'fused vs jnp, frame {i}')
        # and both still track the torch reference
        for i, (a, r) in enumerate(zip(fused_outs, ref_outs)):
            np.testing.assert_allclose(a, r, rtol=1e-3, atol=1e-3,
                                       err_msg=f'fused vs torch, frame {i}')

    def test_working_and_permanent(self, monkeypatch):
        cfg = make_config(max_mid_term_frames=100)
        self._fused_vs_jnp(monkeypatch, cfg, 4, permanent_frames=(0,))

    def test_with_consolidation_and_long_term(self, monkeypatch):
        cfg = make_config()
        self._fused_vs_jnp(monkeypatch, cfg, 8, permanent_frames=(0,))

    def test_usage_counters_match_jnp(self, monkeypatch):
        cfg = make_config(max_mid_term_frames=100)
        monkeypatch.setenv('XMEM2_FUSED_READOUT', '0')
        _, ours_jnp, *_ = run_sequence(cfg, 4)
        monkeypatch.setenv('XMEM2_FUSED_READOUT', 'interpret')
        _, ours_fused, *_ = run_sequence(cfg, 4)
        np.testing.assert_allclose(
            np.asarray(ours_fused.mm.temp.use_count),
            np.asarray(ours_jnp.mm.temp.use_count), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(ours_fused.mm.temp.life_count),
            np.asarray(ours_jnp.mm.temp.life_count), rtol=1e-5, atol=1e-6)


class TestBf16ValueStore:
    """value_store_dtype='bfloat16' (the AMP analog): halves value HBM and
    readout bandwidth; results stay within bf16 rounding of the f32 path."""

    def test_matches_f32_within_bf16_tolerance(self):
        cfg32 = make_config(max_mid_term_frames=100)
        cfg16 = make_config(max_mid_term_frames=100,
                            value_store_dtype='bfloat16')
        _, ours32, _, outs32 = run_sequence(cfg32, 4)
        _, ours16, _, outs16 = run_sequence(cfg16, 4)
        assert ours16.mm.temp.value.dtype == jnp.bfloat16
        assert ours32.mm.temp.value.dtype == jnp.float32
        for i, (a, b) in enumerate(zip(outs16, outs32)):
            np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2,
                                       err_msg=f'frame {i}')

    def test_consolidation_keeps_dtype(self):
        cfg = make_config(value_store_dtype='bfloat16')
        _, ours, _, outs = run_sequence(cfg, 8)
        assert ours.mm.long_size > 0
        assert ours.mm.long.value.dtype == jnp.bfloat16
        for o in outs:
            assert np.isfinite(o).all()
