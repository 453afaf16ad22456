from xmem2_tpu.interactive.clicks.dist_maps import (  # noqa: F401
    get_dist_maps_native, dist_maps_jax, Click, Clicker)
