"""The fused Pallas readout kernel (interpret mode on CPU) must match the jnp
reference path exactly: per-group top-k softmax + per-object readout +
group-0 usage."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from xmem2_tpu.ops import similarity as S
from xmem2_tpu.ops.readout_kernel import fused_topk_readout


def jnp_reference(mk, ms, qk, qe, values, valid, group_ids, top_k):
    sim = S.get_similarity(mk, ms, qk, qe)
    affs = [S.softmax_w_top(sim, top_k, valid=valid[g])
            for g in range(valid.shape[0])]
    read = jnp.stack([S.readout(affs[g], values[o])
                      for o, g in enumerate(group_ids)])
    usage = jnp.sum(affs[0], axis=0)
    return read, usage


def make_case(seed, n, p, o, g, ck=16, cv=32, invalid_tail=0):
    rng = np.random.default_rng(seed)
    mk = rng.standard_normal((n, ck)).astype(np.float32)
    ms = (rng.standard_normal((n,)).astype(np.float32) ** 2) + 1
    qk = rng.standard_normal((p, ck)).astype(np.float32)
    qe = (1 / (1 + np.exp(-rng.standard_normal((p, ck))))).astype(np.float32)
    values = rng.standard_normal((o, n, cv)).astype(np.float32)
    valid = np.ones((g, n), bool)
    if invalid_tail:
        valid[:, -invalid_tail:] = False
    if g > 1:
        valid[1, :n // 3] = False  # a later group missing the oldest slots
    return (jnp.asarray(mk), jnp.asarray(ms), jnp.asarray(qk), jnp.asarray(qe),
            jnp.asarray(values), jnp.asarray(valid))


@pytest.mark.parametrize('n,p,o,g,gids', [
    (700, 130, 1, 1, (0,)),
    (1200, 260, 2, 1, (0, 0)),
    (900, 100, 3, 2, (0, 0, 1)),
])
def test_matches_jnp(n, p, o, g, gids):
    mk, ms, qk, qe, values, valid = make_case(0, n, p, o, g, invalid_tail=37)
    top_k = 30
    ref_read, ref_usage = jnp_reference(mk, ms, qk, qe, values, valid, gids,
                                        top_k)
    got_read, got_usage = fused_topk_readout(mk, ms, qk, qe, values, valid,
                                             gids, top_k, interpret=True)
    # readout tolerance covers the kernel's default-precision MXU dot
    # (the jnp path pins Precision.HIGHEST); affinities/usage are exact
    np.testing.assert_allclose(np.asarray(got_read), np.asarray(ref_read),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(got_usage), np.asarray(ref_usage),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize('seg_ns,o,g,gids', [
    ((500, 300), 1, 1, (0,)),
    ((700, 260, 140), 2, 1, (0, 0)),
    ((600, 200, 300), 3, 2, (0, 0, 1)),
    ((40, 900), 2, 2, (0, 1)),     # one segment smaller than top_k
])
def test_multi_segment_matches_concat(seg_ns, o, g, gids):
    """fused_topk_readout_multi over split segments == the jnp path over the
    concatenation (the production [long|temp|perm] layout)."""
    from xmem2_tpu.ops.readout_kernel import fused_topk_readout_multi

    n = sum(seg_ns)
    p, top_k = 130, 30
    mk, ms, qk, qe, values, valid = make_case(7, n, p, o, g, invalid_tail=23)
    ref_read, ref_usage = jnp_reference(mk, ms, qk, qe, values, valid, gids,
                                        top_k)

    segments = []
    off = 0
    for sn in seg_ns:
        segments.append((mk[off:off + sn], ms[off:off + sn],
                         values[:, off:off + sn], valid[:, off:off + sn]))
        off += sn
    got_read, usages = fused_topk_readout_multi(segments, qk, qe, gids, top_k,
                                                interpret=True)
    got_usage = jnp.concatenate(usages, axis=-1)

    np.testing.assert_allclose(np.asarray(got_read), np.asarray(ref_read),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(got_usage), np.asarray(ref_usage),
                               rtol=1e-5, atol=1e-6)


class TestBoundaryTies:
    """The expand_long_vid regime: ping-pong duplication puts bit-identical
    entries in memory, so fp ties at the k-th similarity are guaranteed. The
    kernel deterministically includes the whole tied set with exact
    normalization; the reference keeps an arbitrary k-subset. Pin both the
    normalization (weights sum to exactly 1 -> usage total == P for a
    single-group bank) and the readout delta vs the jnp path."""

    def _dup_case(self, seed=3, n=600, p=90, o=1, cv=32):
        rng = np.random.default_rng(seed)
        base = rng.standard_normal((n // 2, 16)).astype(np.float32)
        mk = np.concatenate([base, base])                  # every key twice
        ms = np.concatenate([x := (rng.standard_normal((n // 2,)).astype(
            np.float32) ** 2 + 1), x])
        qk = rng.standard_normal((p, 16)).astype(np.float32)
        qe = (1 / (1 + np.exp(-rng.standard_normal((p, 16))))).astype(
            np.float32)
        vbase = rng.standard_normal((o, n // 2, cv)).astype(np.float32)
        values = np.concatenate([vbase, vbase], axis=1)    # values match keys
        valid = np.ones((1, n), bool)
        return tuple(map(jnp.asarray, (mk, ms, qk, qe, values, valid)))

    def test_weights_sum_to_one_under_ties(self):
        mk, ms, qk, qe, values, valid = self._dup_case()
        got_read, got_usage = fused_topk_readout(mk, ms, qk, qe, values, valid,
                                                 (0,), 30, interpret=True)
        # every query row's affinity sums to 1 => total usage == P exactly
        total = float(jnp.sum(got_usage))
        assert abs(total - qk.shape[0]) < 1e-3, total

    def test_readout_matches_jnp_under_ties(self):
        """With duplicated (key, value) pairs the whole-tie-set readout and
        the arbitrary-subset readout select value rows with identical
        content, so the readout must agree to fp tolerance even though the
        per-slot affinity pattern differs."""
        mk, ms, qk, qe, values, valid = self._dup_case()
        ref_read, _ = jnp_reference(mk, ms, qk, qe, values, valid, (0,), 30)
        got_read, _ = fused_topk_readout(mk, ms, qk, qe, values, valid,
                                         (0,), 30, interpret=True)
        np.testing.assert_allclose(np.asarray(got_read), np.asarray(ref_read),
                                   rtol=5e-3, atol=5e-3)

    def test_straddling_tie_readout_delta_bounded(self):
        """Odd top_k over fully-duplicated entries forces the k-th tie pair
        to straddle the boundary: the reference keeps one arbitrary copy, the
        kernel keeps both (renormalized). The readout delta is then bounded
        by the k-th softmax weight times the value magnitude — assert that
        stated bound, and that normalization stays exact."""
        mk, ms, qk, qe, values, valid = self._dup_case()
        top_k = 31
        sim = S.get_similarity(mk, ms, qk, qe)
        aff = S.softmax_w_top(sim, top_k, valid=valid[0])
        ref_read = S.readout(aff, values[0])
        got_read, got_usage = fused_topk_readout(mk, ms, qk, qe, values, valid,
                                                 (0,), top_k, interpret=True)
        # per-row smallest kept weight (the k-th weight) bounds the deviation
        w_k = np.asarray(jnp.min(jnp.where(aff > 0, aff, jnp.inf), axis=-1))
        vmax = float(jnp.max(jnp.abs(values)))
        bound = 2.0 * w_k[:, None] * vmax + 5e-3
        delta = np.abs(np.asarray(got_read[0]) - np.asarray(ref_read))
        assert (delta <= bound).all(), \
            f'max delta {delta.max()} vs bound {bound.max()}'
        total = float(jnp.sum(got_usage))
        assert abs(total - qk.shape[0]) < 1e-3, total

    def test_large_k_falls_back_and_terminates(self):
        """top_k > BN//2 used to hang the merge-round trace loop (the width
        stopped shrinking); it must now fall back to the XLA stats path and
        still match the jnp reference."""
        mk, ms, qk, qe, values, valid = make_case(11, 900, 70, 1, 1)
        top_k = 300   # > BN//2 == 256
        ref_read, ref_usage = jnp_reference(mk, ms, qk, qe, values, valid,
                                            (0,), top_k)
        got_read, got_usage = fused_topk_readout(mk, ms, qk, qe, values, valid,
                                                 (0,), top_k, interpret=True)
        np.testing.assert_allclose(np.asarray(got_read),
                                   np.asarray(ref_read), rtol=5e-3, atol=5e-3)
        np.testing.assert_allclose(np.asarray(got_usage),
                                   np.asarray(ref_usage), rtol=1e-5, atol=1e-5)


def test_chunk_bounds_respect_group_buffers():
    """The greedy chunker charges one [BQ, BN] aff buffer per DISTINCT group
    in a chunk (ADVICE r4: a fixed 3-buffer estimate under-counted multi-
    group chunks and could push past Mosaic's 16MB scoped-vmem cap)."""
    from xmem2_tpu.ops.readout_kernel import BN, BQ, _chunk_bounds

    per_obj = 2 * BN * 512 * 4 + 2 * BQ * 512 * 4
    aff = BQ * BN * 4
    sim = 2 * BQ * BN * 4

    def cost(gids, lo, hi, first):
        groups = set(gids[lo:hi]) | ({0} if first else set())
        return sim + len(groups) * aff + (hi - lo) * per_obj

    for gids in [(0,) * 8, (0, 0, 0, 1, 1, 2, 3, 3), tuple(range(8)),
                 (0, 1) * 4, (5, 4, 3, 2, 1, 0)]:
        bounds = _chunk_bounds(gids, 512, 4)
        # covers all objects exactly once, in order
        assert bounds[0][0] == 0 and bounds[-1][1] == len(gids)
        assert all(b[1] == bounds[i + 1][0] for i, b in enumerate(bounds[:-1]))
        for i, (lo, hi) in enumerate(bounds):
            assert hi > lo
            # within budget unless the chunk is a single unavoidable object
            if hi - lo > 1:
                from xmem2_tpu.ops.readout_kernel import _VMEM_BUDGET
                assert cost(gids, lo, hi, i == 0) <= _VMEM_BUDGET

    # distinct-group chunks must be SMALLER than same-group chunks when the
    # extra aff buffers matter: with a tight budget, 3 distinct groups that
    # fit as one same-group chunk must split
    tight = sim + aff + 3 * per_obj + aff // 2
    assert _chunk_bounds((0, 0, 0), 512, 4, budget=tight) == [(0, 3)]
    assert len(_chunk_bounds((0, 1, 2), 512, 4, budget=tight)) > 1


def test_many_objects_chunked_pass_matches_jnp():
    """8 objects at the production value width (Cv=512) splits the streamed
    pass into VMEM-budgeted object chunks; an unchunked call at this shape
    scope-OOMs Mosaic's 16MB VMEM limit on v5e. Group boundaries
    intentionally straddle chunk boundaries, and usage must come from the
    first chunk only."""
    from xmem2_tpu.ops.readout_kernel import _chunk_bounds

    gids = (0, 0, 0, 1, 1, 2, 3, 3)
    assert len(_chunk_bounds(gids, 512, 4)) > 1  # must actually chunk
    mk, ms, qk, qe, values, valid = make_case(5, 400, 70, 8, 4, cv=512,
                                              invalid_tail=13)
    ref_read, ref_usage = jnp_reference(mk, ms, qk, qe, values, valid, gids, 30)
    got_read, got_usage = fused_topk_readout(mk, ms, qk, qe, values, valid,
                                             gids, 30, interpret=True)
    np.testing.assert_allclose(np.asarray(got_read), np.asarray(ref_read),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(got_usage), np.asarray(ref_usage),
                               rtol=1e-5, atol=1e-6)


def test_tiny_memory_degenerates_to_full_softmax():
    mk, ms, qk, qe, values, valid = make_case(1, 20, 40, 1, 1)
    ref_read, ref_usage = jnp_reference(mk, ms, qk, qe, values, valid, (0,), 30)
    got_read, got_usage = fused_topk_readout(mk, ms, qk, qe, values, valid,
                                             (0,), 30, interpret=True)
    np.testing.assert_allclose(np.asarray(got_read), np.asarray(ref_read),
                               rtol=5e-3, atol=5e-3)
