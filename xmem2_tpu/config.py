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
    # Compute dtype for the conv/matmul heavy paths. 'auto' (default) picks
    # 'bfloat16' on TPU — the AMP analog of the reference's autocast default
    # (reference run_on_video.py:75) — and 'float32' elsewhere. Set 'float32'
    # (CLI --exact) for bit-closer parity with the fp32 reference; the
    # accuracy envelope of bf16 is pinned in tests/test_e2e_parity.py.
    'compute_dtype': 'auto',
    # Dtype the memory value banks are stored in: same 'auto' rule. bf16
    # halves value-bank HBM footprint and readout traffic.
    'value_store_dtype': 'auto',
    # Upload raw uint8 frames and normalize/resize on device (4x smaller
    # host->device transfers, host off the critical path). False restores
    # the reference's host-side float32 preprocessing.
    'device_preprocess': True,
    # Execute runs of steady-state frames as one compiled program
    # (InferenceCore.step_chunk — identical semantics, amortized dispatch).
    'chunk_frames': True,
    # Frames in flight before the oldest packed mask is fetched back.
    'pipeline_depth': 4,
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
    # Shard the memory banks' slot axes over this many chips (a 'memory'
    # mesh axis); the per-frame match runs as an exact sharded readout
    # (local top-k -> one ICI all_gather -> local partial readout -> psum,
    # parallel/sharded_readout.py). 0/1 = single-chip banks. Scales the bank
    # beyond one chip's HBM; no reference analog (one GPU's VRAM bounds it).
    'memory_shards': 0,
}


def resolve_dtype_name(name) -> str:
    """Resolve a config dtype name: 'auto' -> 'bfloat16' when running on TPU
    (the MXU-native dtype), 'float32' everywhere else (keeps CPU test runs at
    exact fp32 parity). Explicit names pass through."""
    name = str(name)
    if name == 'auto':
        import jax
        return 'bfloat16' if jax.default_backend() == 'tpu' else 'float32'
    return name
