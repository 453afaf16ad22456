from xmem2_tpu.inference.data.video_reader import VideoReader, Sample  # noqa: F401
from xmem2_tpu.inference.data.mask_mapper import MaskMapper  # noqa: F401
