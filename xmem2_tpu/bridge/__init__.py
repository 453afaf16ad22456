from xmem2_tpu.bridge.torch_params import (  # noqa: F401
    convert_state_dict,
    load_torch_checkpoint,
    save_params,
    load_params,
)
