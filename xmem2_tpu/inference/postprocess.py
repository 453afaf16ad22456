"""On-device post-processing: probability maps -> index masks.

The reference does resize-back + argmax on the host after a full prob-map
download (run_on_video.py:165-173). On TPU the download dominates, so we
resize + argmax on device and transfer only a bit-packed index mask: the
pack width adapts to the object count (1 bit/px single-object, 2 bits up to
3 objects, 4 bits up to 15), so the common single-object case moves 32x
fewer bytes than the reference's (1+O)*4 bytes/px float download.
"""

from functools import partial

import jax
import jax.numpy as jnp

from xmem2_tpu.nn.functional import resize_bilinear


def mask_pack_bits(num_classes: int) -> int:
    """Smallest {1,2,4,8} bit width holding indices 0..num_classes-1
    (num_classes counts the background channel)."""
    if num_classes <= 2:
        return 1
    if num_classes <= 4:
        return 2
    if num_classes <= 16:
        return 4
    return 8


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
    """Like prob_to_mask but bit-packs the index mask so the device->host
    download shrinks 8x/4x/2x (1/2/4 bits/px). The bit width is derived from
    the (static) channel count, so it is knowable host-side without a fetch:
    `mask_pack_bits(prob.shape[0])`. First pixel of each byte lands in the
    high bits; width is padded to a byte boundary; unpack with unpack_mask."""
    m = prob_to_mask(prob, out_hw)
    bits = mask_pack_bits(prob.shape[0])
    ppb = 8 // bits                          # pixels per byte
    if ppb == 1:
        return m
    h, w = m.shape
    pad = (-w) % ppb
    if pad:
        m = jnp.pad(m, ((0, 0), (0, pad)))
    packed = m[:, 0::ppb] << (8 - bits)
    for i in range(1, ppb):
        packed = packed | (m[:, i::ppb] << (8 - bits * (i + 1)))
    return packed


def unpack_mask(packed, width: int, bits: int = 4):
    """Host-side inverse of prob_to_mask_packed: [H, ceil(W*bits/8)] ->
    [H, width]. `bits` must be the width the packer chose —
    `mask_pack_bits(num_classes)`, surfaced as `InferenceCore.pack_bits`."""
    import numpy as np
    packed = np.asarray(packed)
    if bits == 8:
        return packed[:, :width]
    ppb = 8 // bits
    h, wb = packed.shape
    out = np.empty((h, wb * ppb), np.uint8)
    mask = (1 << bits) - 1
    for i in range(ppb):
        out[:, i::ppb] = (packed >> (8 - bits * (i + 1))) & mask
    return out[:, :width]
