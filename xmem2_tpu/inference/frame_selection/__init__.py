from xmem2_tpu.inference.frame_selection.frame_selection import (  # noqa: F401
    select_next_candidates,
    first_frame_only,
    uniformly_selected_frames,
)
