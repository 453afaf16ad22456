"""S2MController — per-object scribble-to-mask inference.

Behavioral parity target: reference inference/interact/s2m_controller.py:8-38:
for each object, concatenate [image, prev_mask_k, positive scribbles,
negative scribbles] (6 channels), run the DeepLabV3+ net, sigmoid.
"""

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from xmem2_tpu.interactive.s2m.network import deeplabv3plus_resnet50_apply
from xmem2_tpu.ops.tensor import pad_divide_by, unpad


class S2MController:
    """ignore_class is usually 255; 0 is the background label (NOT ignore)."""

    def __init__(self, s2m_params: Dict, num_objects: int, ignore_class: int = 255,
                 dtype=jnp.float32):
        self.params = jax.device_put(s2m_params)
        self.num_objects = num_objects
        self.ignore_class = ignore_class
        self._apply = jax.jit(partial(deeplabv3plus_resnet50_apply, dtype=dtype))

    def interact(self, image: jnp.ndarray, prev_mask: jnp.ndarray,
                 scr_mask: np.ndarray) -> jnp.ndarray:
        """image [H, W, 3] (normalized); prev_mask [H, W] int (object ids);
        scr_mask [H, W] int scribble labels. Returns per-object probabilities
        [num_objects, H, W]."""
        h, w = image.shape[:2]
        out = jnp.zeros((self.num_objects, h, w), jnp.float32)
        scr = np.asarray(scr_mask)
        for ki in range(1, self.num_objects + 1):
            p_srb = (scr == ki).astype(np.float32)
            n_srb = ((scr != ki) & (scr != self.ignore_class)).astype(np.float32)
            prev_k = (prev_mask == ki).astype(jnp.float32)
            inp = jnp.concatenate([
                image,
                prev_k[..., None],
                jnp.asarray(p_srb)[..., None],
                jnp.asarray(n_srb)[..., None],
            ], axis=-1)
            inp, pads = pad_divide_by(inp, 16)
            logits = self._apply(self.params, inp[None])[0]       # [H', W', 1]
            prob = jax.nn.sigmoid(logits)
            out = out.at[ki - 1].set(unpad(prob, pads)[..., 0])
        return out
