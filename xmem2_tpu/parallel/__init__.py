from xmem2_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, data_sharding, replicated, shard_batch)
