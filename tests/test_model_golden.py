"""Golden-parity tests: the JAX XMem network vs activations captured from the
reference torch implementation (scripts/gen_golden_model.py)."""

import numpy as np
import pytest
import jax.numpy as jnp

from xmem2_tpu.bridge.torch_params import convert_state_dict
from xmem2_tpu.models import network as XN
from tests.conftest import load_golden

RTOL, ATOL = 1e-3, 1e-3


def nchw_to_nhwc(x):
    return np.moveaxis(x, -3, -1)


def nhwc_to_nchw(x):
    return np.moveaxis(x, -1, -3)


@pytest.fixture(scope='module')
def golden():
    return load_golden('model_golden')


@pytest.fixture(scope='module')
def params(golden):
    from tests.golden_utils import synth_state_dict
    names = [str(n) for n in golden['sdmeta/names']]
    shapes = [tuple(s[:nd]) for s, nd in
              zip(golden['sdmeta/shapes'], golden['sdmeta/ndims'])]
    sd = synth_state_dict(names, shapes)
    p = convert_state_dict(sd)
    assert p.key_dim == 64 and p.value_dim == 512 and p.hidden_dim == 64
    return p


@pytest.fixture(scope='module')
def encoded(params, golden):
    image = jnp.asarray(nchw_to_nhwc(golden['in/image']))
    return XN.encode_key(params, image)


class TestEncodeKey:
    def test_outputs(self, golden, encoded):
        key, shrinkage, selection, f16, f8, f4 = encoded
        for ours, ref in [(key, 'ek/key'), (shrinkage, 'ek/shrinkage'),
                          (selection, 'ek/selection'), (f16, 'ek/f16'),
                          (f8, 'ek/f8'), (f4, 'ek/f4')]:
            np.testing.assert_allclose(
                nhwc_to_nchw(np.asarray(ours)), golden[ref],
                rtol=RTOL, atol=ATOL, err_msg=ref)


class TestEncodeValue:
    def test_deep_update(self, params, golden, encoded):
        _, _, _, f16, _, _ = encoded
        image = jnp.asarray(nchw_to_nhwc(golden['in/image']))
        masks = jnp.asarray(golden['in/masks'])
        hidden = jnp.asarray(nchw_to_nhwc(golden['in/hidden']))
        g16, h_new = XN.encode_value(params, image, f16, hidden, masks,
                                     is_deep_update=True)
        # g16 activations are O(100) with the synthetic weights — atol scales
        # accordingly (CPU/TPU conv reassociation differs from torch by ~1e-3
        # absolute at that magnitude)
        np.testing.assert_allclose(nhwc_to_nchw(np.asarray(g16)), golden['ev/g16'],
                                   rtol=RTOL, atol=5e-3)
        np.testing.assert_allclose(nhwc_to_nchw(np.asarray(h_new)), golden['ev/hidden'],
                                   rtol=RTOL, atol=ATOL)

    def test_no_deep_update(self, params, golden, encoded):
        _, _, _, f16, _, _ = encoded
        image = jnp.asarray(nchw_to_nhwc(golden['in/image']))
        masks = jnp.asarray(golden['in/masks'])
        hidden = jnp.asarray(nchw_to_nhwc(golden['in/hidden']))
        g16, h_same = XN.encode_value(params, image, f16, hidden, masks,
                                      is_deep_update=False)
        np.testing.assert_allclose(nhwc_to_nchw(np.asarray(g16)),
                                   golden['ev/g16_nodeep'], rtol=RTOL, atol=5e-3)
        np.testing.assert_array_equal(np.asarray(h_same), np.asarray(hidden))


class TestSegment:
    def test_outputs(self, params, golden, encoded):
        _, _, _, f16, f8, f4 = encoded
        readout = jnp.asarray(nchw_to_nhwc(golden['in/readout']))
        hidden = jnp.asarray(nchw_to_nhwc(golden['in/hidden']))
        hid_out, logits, prob = XN.segment(params, (f16, f8, f4), readout, hidden,
                                           h_out=True, strip_bg=False)
        # hidden tanh inputs are O(100) with synthetic weights; atol scales
        # with magnitude (cross-backend conv reassociation ~3e-3 absolute)
        np.testing.assert_allclose(nhwc_to_nchw(np.asarray(hid_out)),
                                   golden['seg/hidden'], rtol=RTOL, atol=1e-2)
        np.testing.assert_allclose(np.asarray(logits), golden['seg/logits'],
                                   rtol=RTOL, atol=5e-3)
        np.testing.assert_allclose(np.asarray(prob), golden['seg/prob'],
                                   rtol=RTOL, atol=ATOL)


class TestReadMemory:
    def test_output(self, params, golden):
        # reference layouts: mk [B,CK,T,h,w]; mv [B,N,CV,T,h,w]; qk [B,CK,h,w]
        mk = jnp.asarray(np.moveaxis(golden['rm/mk'], 1, -1))   # [B,T,h,w,CK]
        ms = jnp.asarray(np.moveaxis(golden['rm/ms'], 1, -1))
        mv = jnp.asarray(np.moveaxis(golden['rm/mv'], 2, -1))   # [B,N,T,h,w,CV]
        qk = jnp.asarray(nchw_to_nhwc(golden['rm/qk']))
        qe = jnp.asarray(nchw_to_nhwc(golden['rm/qe']))
        mem = XN.read_memory(params, qk, qe, mk, ms, mv)
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(mem), -1, 2), golden['rm/mem'],
            rtol=RTOL, atol=ATOL)
