"""Inference configuration defaults.

Mirrors the reference inference config surface (util/configuration.py:138-162 in
the reference repo) so a user of the reference can drop in the same overrides.
Training config lives in xmem2_tpu/train/configuration.py.
"""

# Default inference configuration. Keys and defaults match the reference so
# `overwrite_config` dicts written against the reference keep working.
VIDEO_INFERENCE_CONFIG = {
    'buffer_size': 100,
    'deep_update_every': -1,
    'enable_long_term': True,
    'enable_long_term_count_usage': True,
    'fbrs_model': 'saves/fbrs.pth',
    'hidden_dim': 64,
    'images': None,
    'key_dim': 64,
    'max_long_term_elements': 10000,
    'max_mid_term_frames': 10,
    'mem_every': 10,
    'min_mid_term_frames': 5,
    'model': './saves/XMem.pth',
    'no_amp': False,
    'num_objects': 1,
    'num_prototypes': 128,
    's2m_model': 'saves/s2m.pth',
    'size': 480,
    'top_k': 30,
    'value_dim': 512,
    'masks_out_path': None,
    'workspace': None,
    'save_masks': True,
    # --- TPU-specific extensions (not present in the reference) ---
    # Compute dtype for the conv/matmul heavy paths. 'bfloat16' is the TPU
    # fast path; 'float32' gives bit-closer parity with the fp32 reference.
    'compute_dtype': 'float32',
    # Capacity (in frames) that the permanent-memory buffer is bucketed to;
    # growing past a bucket boundary triggers one recompile.
    'permanent_buffer_frames': 4,
    # Maximum number of object groups compiled for (objects entering the video
    # together share one group; DAVIS/interactive use 1).
    'max_object_groups': 4,
    # Archive evicted long-term rows in host DRAM (memory/spill.py) instead of
    # discarding them; archived rows revive when max_long_term_elements is
    # raised live (MemoryManager.update_config / the GUI slider).
    'spill_long_term': False,
}
