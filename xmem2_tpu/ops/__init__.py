from xmem2_tpu.ops.tensor import pad_divide_by, unpad, aggregate  # noqa: F401
from xmem2_tpu.ops.similarity import (  # noqa: F401
    get_similarity,
    softmax_w_top,
    masked_softmax,
    readout,
)
