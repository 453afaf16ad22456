"""On-device post-processing: probability maps -> index masks.

The reference does resize-back + argmax on the host after a full prob-map
download (run_on_video.py:165-173). On TPU the download dominates, so we
resize + argmax on device and transfer only the uint8 index mask
(1 byte/pixel instead of (1+O)*4)."""

from functools import partial

import jax
import jax.numpy as jnp

from xmem2_tpu.nn.functional import resize_bilinear


@partial(jax.jit, static_argnames=('out_hw',))
def prob_to_mask(prob: jnp.ndarray, out_hw=None) -> jnp.ndarray:
    """prob [C, H, W] -> uint8 index mask at out_hw (or native size).

    Matches reference semantics: bilinear(align_corners=False) channel resize
    THEN argmax (order matters)."""
    p = jnp.moveaxis(prob, 0, -1)            # [H, W, C]
    if out_hw is not None and tuple(out_hw) != p.shape[:2]:
        p = resize_bilinear(p, tuple(out_hw))
    return jnp.argmax(p, axis=-1).astype(jnp.uint8)


@partial(jax.jit, static_argnames=('out_hw',))
def prob_to_mask_packed(prob: jnp.ndarray, out_hw=None) -> jnp.ndarray:
    """Like prob_to_mask but 4-bit-packs the index mask (2 px/byte) so the
    device->host download is halved. Lossless for <= 15 objects. Width is
    padded to even before packing; unpack with unpack_mask."""
    m = prob_to_mask(prob, out_hw)
    h, w = m.shape
    if w % 2:
        m = jnp.pad(m, ((0, 0), (0, 1)))
    return (m[:, 0::2] << 4) | m[:, 1::2]


def unpack_mask(packed, width: int):
    """Host-side inverse of prob_to_mask_packed: [H, ceil(W/2)] -> [H, W]."""
    import numpy as np
    packed = np.asarray(packed)
    h, w2 = packed.shape
    out = np.empty((h, w2 * 2), np.uint8)
    out[:, 0::2] = packed >> 4
    out[:, 1::2] = packed & 0x0F
    return out[:, :width]
