from xmem2_tpu.memory.store import StoreBuffers  # noqa: F401
from xmem2_tpu.memory.manager import MemoryManager  # noqa: F401
