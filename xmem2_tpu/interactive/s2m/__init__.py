from xmem2_tpu.interactive.s2m.network import deeplabv3plus_resnet50_apply, load_s2m_params  # noqa: F401
from xmem2_tpu.interactive.s2m.controller import S2MController  # noqa: F401
