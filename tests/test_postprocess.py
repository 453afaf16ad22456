"""Adaptive bit-packed mask download (inference/postprocess.py).

The reference downloads the full float probability map and post-processes on
host (reference run_on_video.py:165-173); we argmax on device and download a
bit-packed index mask whose width adapts to the object count. These tests pin
the pack/unpack round-trip at every width and the width-selection rule.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from xmem2_tpu.inference.postprocess import (
    mask_pack_bits, prob_to_mask, prob_to_mask_packed, unpack_mask)


class TestPackBits:
    @pytest.mark.parametrize('num_classes,bits', [
        (1, 1), (2, 1),          # bg only / bg + 1 object (chair)
        (3, 2), (4, 2),          # caps (2 objects) and 3 objects
        (5, 4), (16, 4),         # 4..15 objects
        (17, 8), (256, 8),
    ])
    def test_selection_rule(self, num_classes, bits):
        assert mask_pack_bits(num_classes) == bits

    @pytest.mark.parametrize('num_classes', [2, 3, 4, 5, 16, 17])
    def test_roundtrip_matches_argmax(self, num_classes):
        """pack -> unpack == plain argmax mask for every pack width, at an
        odd width (exercises byte-boundary padding)."""
        rng = np.random.default_rng(num_classes)
        h, w = 7, 13
        prob = jnp.asarray(rng.random((num_classes, h, w)).astype(np.float32))
        plain = np.asarray(prob_to_mask(prob))
        packed = prob_to_mask_packed(prob)
        bits = mask_pack_bits(num_classes)
        ppb = 8 // bits
        assert packed.shape == (h, -(-w // ppb))
        out = unpack_mask(packed, w, bits)
        np.testing.assert_array_equal(out, plain)

    def test_roundtrip_with_resize(self):
        rng = np.random.default_rng(0)
        prob = jnp.asarray(rng.random((2, 8, 12)).astype(np.float32))
        out_hw = (16, 30)
        plain = np.asarray(prob_to_mask(prob, out_hw))
        packed = prob_to_mask_packed(prob, out_hw)
        out = unpack_mask(packed, out_hw[1], mask_pack_bits(2))
        np.testing.assert_array_equal(out, plain)

    def test_single_object_payload_is_one_eighth(self):
        """The chair regime: 1 object + bg packs 8 px/byte."""
        prob = jnp.asarray(np.random.default_rng(1).random((2, 16, 64))
                           .astype(np.float32))
        packed = prob_to_mask_packed(prob)
        assert packed.shape == (16, 8)

    def test_core_pack_bits_property(self):
        from xmem2_tpu.inference.core import InferenceCore
        proc = InferenceCore.__new__(InferenceCore)   # property only
        proc.all_labels = [1]
        assert proc.pack_bits == 1
        proc.all_labels = [1, 2]
        assert proc.pack_bits == 2
        proc.all_labels = list(range(1, 9))
        assert proc.pack_bits == 4
        proc.all_labels = None
        assert proc.pack_bits == 1
