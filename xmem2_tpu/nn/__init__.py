from xmem2_tpu.nn import functional  # noqa: F401
