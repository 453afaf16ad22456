"""xmem2_tpu — a TPU-native interactive video object segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of XMem++
(mbzuai-metaverse/XMem2): space-time memory networks with permanent memory,
working->long-term memory consolidation, frame annotation candidate selection,
training, and evaluation — designed TPU-first:

- NHWC layouts, bf16-capable compute, static shapes, jit-compiled step functions
- fixed-capacity memory ring buffers with validity masks (no dynamic torch.cat)
- fused memory-readout kernel (anisotropic-L2 similarity + top-k softmax + readout)
- SPMD training via jax.sharding.Mesh + pjit (DP over ICI)
"""

__version__ = "0.1.0"

from xmem2_tpu.config import VIDEO_INFERENCE_CONFIG  # noqa: F401
