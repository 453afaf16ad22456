"""Golden-parity tests for the memory-affinity math and tensor utilities
against activations captured from the reference implementation
(scripts/gen_golden_ops.py)."""

import numpy as np
import jax.numpy as jnp

from xmem2_tpu.ops import similarity as S
from xmem2_tpu.ops import tensor as T
from tests.conftest import load_golden


def _chw_to_nc(x):
    # reference layout [1, C, N] -> ours [N, C]
    return np.ascontiguousarray(x[0].T)


class TestSimilarity:
    def test_full(self):
        g = load_golden('ops_similarity')
        sim = S.get_similarity(
            jnp.asarray(_chw_to_nc(g['mk'])), jnp.asarray(g['ms'][0, 0]),
            jnp.asarray(_chw_to_nc(g['qk'])), jnp.asarray(_chw_to_nc(g['qe'])),
        )
        # ours is [P, N]; reference is [1, N, P]
        np.testing.assert_allclose(np.asarray(sim).T, g['sim_full'][0], rtol=2e-5, atol=2e-5)

    def test_no_selection_no_shrinkage(self):
        g = load_golden('ops_similarity')
        sim = S.get_similarity(
            jnp.asarray(_chw_to_nc(g['mk'])), None,
            jnp.asarray(_chw_to_nc(g['qk'])), None,
        )
        np.testing.assert_allclose(np.asarray(sim).T, g['sim_no_qe'][0], rtol=2e-5, atol=2e-5)

    def test_selection_no_shrinkage(self):
        g = load_golden('ops_similarity')
        sim = S.get_similarity(
            jnp.asarray(_chw_to_nc(g['mk'])), None,
            jnp.asarray(_chw_to_nc(g['qk'])), jnp.asarray(_chw_to_nc(g['qe'])),
        )
        np.testing.assert_allclose(np.asarray(sim).T, g['sim_no_ms'][0], rtol=2e-5, atol=2e-5)


class TestTopKSoftmax:
    def test_affinity_and_usage(self):
        g = load_golden('ops_similarity')
        sim = jnp.asarray(g['sim_full'][0].T)  # [P, N]
        aff, usage = S.softmax_w_top(sim, int(g['top_k']), return_usage=True)
        np.testing.assert_allclose(np.asarray(aff).T, g['aff_topk'][0], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(usage), g['usage'][0], rtol=1e-4, atol=1e-5)

    def test_dense_softmax(self):
        g = load_golden('ops_similarity')
        sim = jnp.asarray(g['sim_full'][0].T)
        aff = S.masked_softmax(sim)
        np.testing.assert_allclose(np.asarray(aff).T, g['aff_dense'][0], rtol=1e-5, atol=1e-6)

    def test_validity_mask_equals_slicing(self):
        # masked top-k softmax over a suffix must equal top-k softmax of the slice
        rng = np.random.default_rng(1)
        sim = rng.standard_normal((17, 120)).astype(np.float32)
        valid = np.zeros(120, bool)
        valid[40:] = True
        aff_masked = S.softmax_w_top(jnp.asarray(sim), 10, valid=jnp.asarray(valid))
        aff_sliced = S.softmax_w_top(jnp.asarray(sim[:, 40:]), 10)
        np.testing.assert_allclose(np.asarray(aff_masked)[:, 40:], np.asarray(aff_sliced),
                                   rtol=1e-6, atol=1e-7)
        assert np.all(np.asarray(aff_masked)[:, :40] == 0)

    def test_fewer_valid_than_topk(self):
        rng = np.random.default_rng(2)
        sim = rng.standard_normal((5, 64)).astype(np.float32)
        valid = np.zeros(64, bool)
        valid[:7] = True  # fewer valid than top_k=30
        aff = S.softmax_w_top(jnp.asarray(sim), 30, valid=jnp.asarray(valid))
        a = np.asarray(aff)
        assert np.all(a[:, 7:] == 0)
        np.testing.assert_allclose(a.sum(-1), 1.0, rtol=1e-6)

    def test_sparse_matches_dense(self):
        g = load_golden('ops_similarity')
        sim = jnp.asarray(g['sim_full'][0].T)
        mv = jnp.asarray(_chw_to_nc(g['mv']))
        k = int(g['top_k'])
        aff = S.softmax_w_top(sim, k)
        dense_read = S.readout(aff, mv)
        w, idx = S.topk_sparse_softmax(sim, k)
        sparse_read = S.sparse_readout(w, idx, mv)
        np.testing.assert_allclose(np.asarray(sparse_read), np.asarray(dense_read),
                                   rtol=1e-5, atol=1e-5)
        usage_sparse = S.sparse_usage(w, idx, sim.shape[-1])
        np.testing.assert_allclose(np.asarray(usage_sparse), np.asarray(aff.sum(0)),
                                   rtol=1e-4, atol=1e-5)


class TestReadout:
    def test_readout(self):
        g = load_golden('ops_similarity')
        aff = jnp.asarray(g['aff_topk'][0].T)  # [P, N]
        mv = jnp.asarray(_chw_to_nc(g['mv']))  # [N, CV]
        out = S.readout(aff, mv)
        np.testing.assert_allclose(np.asarray(out).T, g['read'][0], rtol=1e-4, atol=1e-4)


class TestTensorOps:
    def test_aggregate(self):
        g = load_golden('ops_aggregate')
        prob = jnp.asarray(np.moveaxis(g['prob'], 0, -1))[..., None, :]  # HW1N? no:
        # our aggregate works on any axis; use channels-last [H, W, N_obj]
        prob = jnp.asarray(np.moveaxis(g['prob'], 0, -1))
        logits, out = T.aggregate(prob, axis=-1, return_logits=True)
        np.testing.assert_allclose(np.moveaxis(np.asarray(logits), -1, 0), g['logits'],
                                   rtol=1e-4, atol=3e-4)
        np.testing.assert_allclose(np.moveaxis(np.asarray(out), -1, 0), g['prob_out'],
                                   rtol=1e-4, atol=3e-4)

    def test_pad_divide_by(self):
        g = load_golden('ops_pad')
        img = jnp.asarray(np.moveaxis(g['img'], 0, -1))  # CHW -> HWC
        padded, pad = T.pad_divide_by(img, 16)
        assert list(pad) == list(g['pad'])
        np.testing.assert_array_equal(np.moveaxis(np.asarray(padded), -1, 0), g['padded'])
        back = T.unpad(padded, pad)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(img))
