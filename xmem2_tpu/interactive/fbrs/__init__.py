from xmem2_tpu.interactive.fbrs.controller import FBRSController, InteractiveController  # noqa: F401
