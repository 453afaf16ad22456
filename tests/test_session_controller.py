"""Headless tests for SessionController — the GUI App's logic without Qt
(reference gui.py:714-1230 behaviors: propagation loops, reference
save/remove/replay, candidate computation, live config mutation, imports,
memory gauges)."""

import numpy as np
import pytest
from PIL import Image

from xmem2_tpu.interactive.session import SessionController


@pytest.fixture(scope='module')
def small_net():
    import sys
    sys.path.insert(0, '/root/repo')
    from tests.test_e2e_parity import build_synth_params
    from xmem2_tpu.bridge.torch_params import convert_state_dict
    from xmem2_tpu.inference.net import XMemNet
    _, _, sd = build_synth_params()
    return XMemNet(convert_state_dict(sd))


@pytest.fixture
def session(tmp_path, small_net):
    from xmem2_tpu.inference.core import InferenceCore
    from xmem2_tpu.interactive.resource_manager import ResourceManager

    rng = np.random.default_rng(0)
    frames = tmp_path / 'frames'
    frames.mkdir()
    base = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    for i in range(4):
        shifted = np.roll(base, i * 2, axis=1)
        Image.fromarray(shifted).save(frames / f'{i:05d}.jpg')

    cfg = {'hidden_dim': 64, 'top_k': 10, 'mem_every': 2,
           'deep_update_every': -1, 'enable_long_term': True,
           'enable_long_term_count_usage': True, 'max_mid_term_frames': 4,
           'min_mid_term_frames': 2, 'num_prototypes': 16,
           'max_long_term_elements': 1000, 'size': -1}
    rm = ResourceManager({'images': str(frames), 'video': None,
                          'workspace': str(tmp_path / 'ws'), 'size': -1,
                          'num_objects': 1, 'buffer_size': 10})
    proc = InferenceCore(small_net, config=dict(cfg))
    logs = []
    ctl = SessionController(proc, rm, None, None, cfg, log=logs.append)
    return ctl, rm, logs


def _paint_mask(ctl):
    mask = np.zeros((48, 64), np.uint8)
    mask[16:32, 24:40] = 1
    ctl.res_man.save_mask(ctl.cursur, mask)
    return mask


class TestPropagation:
    def test_forward_propagation_stores_masks_and_keys(self, session):
        ctl, rm, logs = session
        _paint_mask(ctl)
        n = ctl.propagate('forward')
        assert n == 3
        for ti in range(4):
            assert rm.get_mask(ti) is not None
        assert rm.all_masks_present()          # key cache filled per frame

    def test_propagate_without_mask_logs(self, session):
        ctl, rm, logs = session
        assert ctl.propagate('forward') == 0
        assert any('No mask' in m for m in logs)

    def test_full_propagation_starts_at_first_reference(self, session):
        ctl, rm, logs = session
        ctl.set_cursor(1)
        _paint_mask(ctl)
        assert ctl.save_reference()
        ctl.set_cursor(3)
        ctl.full_propagate()
        assert ctl.cursur == 3                 # walked 1 -> 3
        assert rm.get_mask(2) is not None

    def test_on_frame_callback_and_stop(self, session):
        ctl, rm, logs = session
        _paint_mask(ctl)
        seen = []

        def cb(ti):
            seen.append(ti)
            ctl.stop()                         # stop after the first frame

        n = ctl.propagate('forward', on_frame=cb)
        assert n == 1 and seen == [1]


class TestReferences:
    def test_save_remove_and_replay(self, session):
        ctl, rm, logs = session
        _paint_mask(ctl)
        assert ctl.save_reference()
        assert rm.references == {0}
        assert 0 in ctl.processor.permanent_memory_frames

        # a new controller over the same workspace replays the reference
        from xmem2_tpu.inference.core import InferenceCore
        proc2 = InferenceCore(ctl.processor.network, config=dict(ctl.config))
        ctl2 = SessionController(proc2, rm, None, None, ctl.config)
        assert ctl2.replay_references() == [0]
        assert 0 in proc2.permanent_memory_frames

        assert ctl.remove_reference()
        assert rm.references == set()
        assert ctl.processor.permanent_memory_frames == []

    def test_save_without_mask_fails(self, session):
        ctl, rm, logs = session
        assert not ctl.save_reference()
        assert not ctl.remove_reference()


class TestCandidatesAndConfig:
    def test_candidates_need_key_cache(self, session):
        ctl, rm, logs = session
        assert ctl.compute_candidates(k=1) is None
        assert any('FULL' in m for m in logs)

    def test_candidates_after_propagation(self, session):
        ctl, rm, logs = session
        _paint_mask(ctl)
        ctl.save_reference()
        ctl.propagate('forward')
        cands = ctl.compute_candidates(k=2)
        # with synthetic weights most predicted masks are "invalid" (tiny),
        # so only the index contract is checked here; selection-quality parity
        # lives in tests/test_frame_selection.py
        assert cands is not None and len(cands) == 2
        assert all(0 <= c < 4 for c in cands)

    def test_update_config_reaches_memory(self, session):
        ctl, rm, logs = session
        ctl.update_config({'top_k': 7, 'mem_every': 9})
        assert ctl.processor.memory.top_k == 7
        assert ctl.processor.mem_every == 9

    def test_memory_stats(self, session):
        ctl, rm, logs = session
        _paint_mask(ctl)
        ctl.save_reference()
        stats = ctl.memory_stats()
        assert stats['perm'] > 0 and stats['temp'] == 0


class TestImportsAndViz:
    def test_import_mask_and_layer(self, session, tmp_path):
        ctl, rm, logs = session
        mpath = tmp_path / 'ext_mask.png'
        m = np.zeros((48, 64), np.uint8)
        m[4:10, 4:10] = 1
        Image.fromarray(m, mode='P').save(mpath)
        assert ctl.import_mask(str(mpath))
        assert rm.get_mask(0).max() == 1

        lpath = tmp_path / 'layer.png'
        rgba = np.zeros((48, 64, 4), np.uint8)
        rgba[..., 3] = 128
        Image.fromarray(rgba, mode='RGBA').save(lpath)
        assert ctl.import_layer(str(lpath))
        assert ctl.viz_mode == 'layered'

        # non-RGBA rejected
        bad = tmp_path / 'bad.png'
        Image.fromarray(np.zeros((48, 64, 3), np.uint8)).save(bad)
        ctl.viz_mode = 'davis'
        assert not ctl.import_layer(str(bad))
        assert ctl.viz_mode == 'davis'

    def test_visualization_modes(self, session):
        ctl, rm, logs = session
        _paint_mask(ctl)
        for mode in ('davis', 'fade', 'light', 'popup'):
            ctl.viz_mode = mode
            viz = ctl.visualization(save=False)
            assert viz.shape == (48, 64, 3) and viz.dtype == np.uint8


class TestInteractionFlow:
    def test_free_brush_commit(self, session):
        ctl, rm, logs = session
        ctl.push_point(30.0, 20.0, False, 'free')
        ctl.push_point(34.0, 24.0, False, 'free')
        mask = ctl.end_path()
        assert mask is not None and mask.max() == 1
        assert rm.get_mask(0).max() == 1

    def test_explicit_commit_ends_interaction(self, session):
        """Commit button parity (reference gui.py:804-806): finalize the
        current interaction into the saved mask AND end it — the next stroke
        starts a fresh interaction instead of extending this one."""
        ctl, rm, logs = session
        ctl.push_point(30.0, 20.0, False, 'free')
        ctl.push_point(34.0, 24.0, False, 'free')
        first = ctl.interaction
        assert first is not None
        mask = ctl.commit()
        assert mask is not None and mask.max() == 1
        assert ctl.interaction is None
        assert rm.get_mask(0).max() == 1
        # commit with nothing in flight is a no-op
        assert ctl.commit() is None
        # a new stroke creates a NEW interaction object
        ctl.push_point(10.0, 10.0, False, 'free')
        assert ctl.interaction is not None and ctl.interaction is not first

    def test_reset_mask_zeroes_and_aborts_interaction(self, session):
        """Reset-mask parity (reference gui.py:910-917 on_reset_mask): zero
        the current frame's mask, save it, abandon the interaction — the
        documented negative-masks workaround."""
        ctl, rm, logs = session
        _paint_mask(ctl)
        assert rm.get_mask(0).max() == 1
        ctl.push_point(30.0, 20.0, False, 'free')
        assert ctl.interaction is not None
        out = ctl.reset_mask()
        assert out.max() == 0
        assert rm.get_mask(0) is not None and rm.get_mask(0).max() == 0
        assert ctl.interaction is None


class TestBulkImport:
    def _write_masks(self, tmp_path, frame_ids, value=1):
        d = tmp_path / 'bulk_masks'
        d.mkdir(exist_ok=True)
        for fi in frame_ids:
            m = np.zeros((48, 64), np.uint8)
            m[4:10, 4:10] = value
            Image.fromarray(m, mode='P').save(d / f'{fi:05d}.png')
        return d

    def test_small_batch_saves_references(self, session, tmp_path):
        """<= bulk_threshold masks: each import also goes to permanent
        memory, like individual imports (reference gui.py:1189-1191,
        1238-1240)."""
        ctl, rm, logs = session
        d = self._write_masks(tmp_path, [0, 2])
        result = ctl.import_all_masks(str(d))
        assert result == {'imported': 2, 'errors': []}
        assert rm.get_mask(0).max() == 1 and rm.get_mask(2).max() == 1
        assert rm.references == {0, 2}
        assert ctl.cursur == 2                   # parked at the last import

    def test_bulk_batch_suppresses_references_and_rewinds(self, session,
                                                          tmp_path):
        """> bulk_threshold: references are NOT saved (memory would explode
        at 1000+ masks) and the cursor returns to 0 (reference
        gui.py:1174-1187)."""
        ctl, rm, logs = session
        d = self._write_masks(tmp_path, [0, 1, 2, 3])
        progress = []
        result = ctl.import_all_masks(str(d), on_progress=progress.append,
                                      bulk_threshold=2)
        assert result == {'imported': 4, 'errors': []}
        assert progress == [1, 2, 3, 4]
        assert rm.references == set()
        assert ctl.cursur == 0
        for fi in range(4):
            assert rm.get_mask(fi).max() == 1

    def test_rejects_files_without_digits(self, session, tmp_path):
        ctl, rm, logs = session
        d = self._write_masks(tmp_path, [0, 1])
        (d / 'nodigits.png').write_bytes((d / '00000.png').read_bytes())
        result = ctl.import_all_masks(str(d))
        assert result['imported'] == 0
        assert 'nodigits.png' in result['errors']
        assert any('incorrect names' in m for m in logs)

    def test_rejects_out_of_range_ids(self, session, tmp_path):
        ctl, rm, logs = session
        d = self._write_masks(tmp_path, [0, 7])    # only 4 frames exist
        result = ctl.import_all_masks(str(d))
        assert result['imported'] == 0 and result['errors']

    def test_import_mask_validates_object_count(self, session, tmp_path):
        """reference gui.py:1208-1216: masks with more objects than the
        session was opened with are rejected."""
        ctl, rm, logs = session
        bad = tmp_path / 'toomany.png'
        m = np.zeros((48, 64), np.uint8)
        m[:8, :8] = 2                              # num_objects == 1
        m[10:12, :4] = 1     # keep indices contiguous or PIL remaps 2 -> 1
        img = Image.fromarray(m, mode='P')
        img.putpalette([0, 0, 0, 255, 0, 0, 0, 255, 0] + [0] * 759)
        img.save(bad)
        assert not ctl.import_mask(str(bad))
        assert any('objects' in msg for msg in logs)
