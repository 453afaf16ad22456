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
import numpy as np

from xmem2_tpu.nn.functional import resize_bilinear
from xmem2_tpu.utils.resize_np import shorter_side_size

# numpy (NOT jnp) on purpose: this module is imported lazily, sometimes from
# inside an active jit trace (core.py:56), and modern JAX stages jnp calls
# into the ambient trace — a module-level jnp constant born there would leak
# that trace's tracer into every later call.
IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


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
