"""XMemNet — the jit-compiled inference-facing wrapper around the functional
model (xmem2_tpu/models/network.py).

Each forward mode is a cached jax.jit with its boolean variants as static
arguments; shapes are static per (resolution, num_objects), so the per-frame
loop runs fully compiled with no retracing. Compute dtype (f32 parity /
bf16 fast path) is fixed at construction.
"""

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from xmem2_tpu.models import network as XN
from xmem2_tpu.models.network import XMemParams


class XMemNet:
    """Inference-facing network: encode_key / encode_value / segment.

    Mirrors the reference XMem nn.Module surface (model/network.py:122-132)
    minus the training-only read_memory (the MemoryManager handles reads at
    test time, as in the reference).
    """

    def __init__(self, params: XMemParams, compute_dtype=jnp.float32):
        # Pin all weights on-device once. Leaving numpy leaves in the tree
        # would re-upload every parameter on every jitted call (host->device
        # transfers dominate on tunneled TPUs).
        self.params = jax.device_put(params)
        self.dtype = compute_dtype

        self._encode_key = jax.jit(
            lambda p, frame: XN.encode_key(p, frame, dtype=self.dtype))
        self._encode_value = jax.jit(
            lambda p, frame, f16, h16, masks, deep: XN.encode_value(
                p, frame, f16, h16, masks, is_deep_update=deep, dtype=self.dtype),
            static_argnames=('deep',))
        self._segment = jax.jit(
            lambda p, f16, f8, f4, readout, hidden, h_out, strip_bg: XN.segment(
                p, (f16, f8, f4), readout, hidden, h_out=h_out,
                strip_bg=strip_bg, dtype=self.dtype),
            static_argnames=('h_out', 'strip_bg'))

    @property
    def key_dim(self):
        return self.params.key_dim

    @property
    def value_dim(self):
        return self.params.value_dim

    @property
    def hidden_dim(self):
        return self.params.hidden_dim

    def encode_key(self, frame: jnp.ndarray):
        """frame [1, H, W, 3] -> (key, shrinkage, selection, f16, f8, f4)."""
        return self._encode_key(self.params, frame)

    def encode_value(self, frame, f16, hidden, masks, is_deep_update=True):
        """masks [1, O, H, W] -> (value [1, O, h, w, Cv], hidden')."""
        if hidden is None:
            # hidden-dim-0 models carry no sensory state
            b, o = masks.shape[:2]
            h16, w16 = f16.shape[1:3]
            hidden = jnp.zeros((b, o, h16, w16, max(self.hidden_dim, 1)))
        return self._encode_value(self.params, frame, f16, hidden, masks,
                                  is_deep_update)

    def segment(self, multi_scale_features, memory_readout, hidden,
                h_out=True, strip_bg=True):
        f16, f8, f4 = multi_scale_features
        if hidden is None:
            b, o = memory_readout.shape[:2]
            h16, w16 = f16.shape[1:3]
            hidden = jnp.zeros((b, o, h16, w16, max(self.hidden_dim, 1)))
        return self._segment(self.params, f16, f8, f4, memory_readout, hidden,
                             h_out, strip_bg)
