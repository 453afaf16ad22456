from xmem2_tpu.models.network import XMemParams, encode_key, encode_value, segment, read_memory  # noqa: F401
