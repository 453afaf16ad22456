"""Shape/padding utilities and soft aggregation.

Behavioral parity targets in the reference repo:
  - pad_divide_by / unpad: util/tensor_util.py:47-77 (centered padding to a
    multiple of d, STM convention)
  - aggregate: model/aggregate.py:6-17 (STM soft aggregation with the product
    of complements as the background probability)

Everything here is jit-friendly: static shapes in, static shapes out.
"""

from typing import Tuple

import jax
import jax.numpy as jnp


def compute_pad(h: int, w: int, d: int) -> Tuple[int, int, int, int]:
    """Centered padding amounts (lw, uw, lh, uh) to make H, W multiples of d.

    Matches the reference convention: the smaller half goes first (left/top).
    """
    new_h = h + (d - h % d) % d
    new_w = w + (d - w % d) % d
    lh, uh = (new_h - h) // 2, (new_h - h) - (new_h - h) // 2
    lw, uw = (new_w - w) // 2, (new_w - w) - (new_w - w) // 2
    return (lw, uw, lh, uh)


def pad_divide_by(img: jnp.ndarray, d: int):
    """Pad the trailing-spatial dims of an NHWC (or HWC / NHW) array.

    Accepts [..., H, W, C] (channels-last) arrays. Returns (padded, pad_tuple)
    where pad_tuple = (lw, uw, lh, uh) as in the reference.
    """
    h, w = img.shape[-3], img.shape[-2]
    lw, uw, lh, uh = compute_pad(h, w, d)
    pad_width = [(0, 0)] * (img.ndim - 3) + [(lh, uh), (lw, uw), (0, 0)]
    out = jnp.pad(img, pad_width)
    return out, (lw, uw, lh, uh)


def unpad(img: jnp.ndarray, pad: Tuple[int, int, int, int]) -> jnp.ndarray:
    """Inverse of pad_divide_by for channels-last arrays [..., H, W, C]."""
    lw, uw, lh, uh = pad
    h, w = img.shape[-3], img.shape[-2]
    return jax.lax.slice_in_dim(
        jax.lax.slice_in_dim(img, lh, h - uh, axis=img.ndim - 3),
        lw, w - uw, axis=img.ndim - 2,
    )


def aggregate(prob: jnp.ndarray, axis: int, return_logits: bool = False):
    """STM-style soft aggregation over the object axis.

    prob: probabilities per object, any shape with `axis` being the object
    dimension (reference: model/aggregate.py:6). Background probability is
    prod(1 - p_i); the whole stack is clamped and renormalized via softmax of
    the logit transform.
    """
    bg = jnp.prod(1.0 - prob, axis=axis, keepdims=True)
    new_prob = jnp.concatenate([bg, prob], axis=axis)
    new_prob = jnp.clip(new_prob, 1e-7, 1.0 - 1e-7)
    logits = jnp.log(new_prob / (1.0 - new_prob))
    out = jax.nn.softmax(logits, axis=axis)
    if return_logits:
        return logits, out
    return out
