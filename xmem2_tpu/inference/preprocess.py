"""On-device pre-processing: raw uint8 frames -> normalized, resized floats.

The reference normalizes + resizes on the CPU dataloader side
(video_reader.py:56-65) and uploads float32. Uploading the raw uint8 frame
(4x smaller) and normalizing/resizing on device is numerically equivalent
(normalization and bilinear resize commute — both are linear) and removes the
host from the per-frame critical path.
"""

from functools import partial

import jax
import jax.numpy as jnp

from xmem2_tpu.nn.functional import resize_bilinear
from xmem2_tpu.utils.resize_np import shorter_side_size

IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


@partial(jax.jit, static_argnames=('size',))
def preprocess_frame(img_u8: jnp.ndarray, size: int = -1) -> jnp.ndarray:
    """img_u8 [H0, W0, 3] uint8 -> [H, W, 3] float32, ImageNet-normalized,
    shorter side resized to `size` (if > 0)."""
    x = img_u8.astype(jnp.float32) / 255.0
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    if size > 0:
        h, w = img_u8.shape[:2]
        x = resize_bilinear(x, shorter_side_size(h, w, size))
    return x
