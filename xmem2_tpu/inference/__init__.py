from xmem2_tpu.inference.core import InferenceCore  # noqa: F401
from xmem2_tpu.inference.net import XMemNet  # noqa: F401
