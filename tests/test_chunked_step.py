"""Chunked steady-state stepping (InferenceCore.step_chunk): k plain frames
in one compiled program must match k successive step() calls — same packed
masks, same hidden state, same usage statistics (the chunk is the TPU-native
dispatch-amortization path; reference inference_core.py:62 pays Python+launch
per frame)."""

import numpy as np
import pytest
import jax.numpy as jnp

from xmem2_tpu.inference.postprocess import unpack_mask


CFG = {
    'hidden_dim': 64, 'top_k': 10, 'mem_every': 4, 'deep_update_every': -1,
    'enable_long_term': True, 'enable_long_term_count_usage': True,
    'max_mid_term_frames': 6, 'min_mid_term_frames': 3,
    'num_prototypes': 8, 'max_long_term_elements': 128, 'size': -1,
}
H, W = 64, 96


def _make_proc():
    from xmem2_tpu.models.init import init_params
    from xmem2_tpu.inference.net import XMemNet
    from xmem2_tpu.inference.core import InferenceCore

    params = init_params(seed=0)
    params.tree['key_proj']['key_proj']['weight'] = \
        params.tree['key_proj']['key_proj']['weight'] * 0.01
    params.tree['key_proj']['d_proj']['weight'] = \
        params.tree['key_proj']['d_proj']['weight'] * 0.01
    proc = InferenceCore(XMemNet(params), config=dict(CFG))
    proc.set_all_labels([1])
    return proc


def _video(n):
    rng = np.random.default_rng(7)
    frames = [rng.standard_normal((H, W, 3)).astype(np.float32) * 0.5
              for _ in range(n)]
    mask0 = np.zeros((1, H, W), np.float32)
    mask0[0, 20:40, 30:60] = 1
    return frames, mask0


def test_chunked_matches_per_frame():
    n = 13
    frames, mask0 = _video(n)
    hw = (H, W)

    # reference: one step() per frame
    a = _make_proc()
    acc_a = jnp.zeros((), jnp.uint32)
    packs_a = []
    for ti in range(n):
        if ti == 0:
            _, p, acc_a = a.step(jnp.asarray(frames[ti]), jnp.asarray(mask0),
                                 [1], end=(ti == n - 1), pack_hw=hw, acc=acc_a)
        else:
            _, p, acc_a = a.step(jnp.asarray(frames[ti]), end=(ti == n - 1),
                                 pack_hw=hw, acc=acc_a)
        packs_a.append(np.asarray(p))

    # chunked: plain runs go through step_chunk
    b = _make_proc()
    acc_b = jnp.zeros((), jnp.uint32)
    packs_b = [None] * n
    ti = 0
    used_chunks = 0
    while ti < n:
        if ti == 0:
            _, p, acc_b = b.step(jnp.asarray(frames[ti]), jnp.asarray(mask0),
                                 [1], end=False, pack_hw=hw, acc=acc_b)
            packs_b[ti] = np.asarray(p)
            ti += 1
            continue
        k = min(b.plain_run_length(), n - 1 - ti)  # keep the end frame out
        if k > 0:
            stack = jnp.asarray(np.stack(frames[ti:ti + k]))
            packs, acc_b = b.step_chunk(stack, pack_hw=hw, acc=acc_b)
            packs = np.asarray(packs)
            for j in range(k):
                packs_b[ti + j] = packs[j]
            ti += k
            used_chunks += 1
        else:
            _, p, acc_b = b.step(jnp.asarray(frames[ti]), end=(ti == n - 1),
                                 pack_hw=hw, acc=acc_b)
            packs_b[ti] = np.asarray(p)
            ti += 1
    assert used_chunks >= 3, 'chunked path never exercised'

    # identical masks frame by frame (tiny float-order wiggle tolerated)
    for ti in range(n):
        ma = unpack_mask(packs_a[ti], W, a.pack_bits)
        mb = unpack_mask(packs_b[ti], W, b.pack_bits)
        agree = float(np.mean(ma == mb))
        assert agree >= 0.999, f'frame {ti}: only {agree:.4f} agreement'

    # same memory bookkeeping
    assert a.curr_ti == b.curr_ti
    assert a.last_mem_ti == b.last_mem_ti
    assert a.memory.temp_size == b.memory.temp_size
    np.testing.assert_allclose(np.asarray(a.memory.get_hidden()),
                               np.asarray(b.memory.get_hidden()),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(a.memory.temp.use_count),
                               np.asarray(b.memory.temp.use_count),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_run_on_video_chunked_matches(tmp_path):
    """config['chunk_frames']=True must yield the same masks as the default
    per-frame production loop."""
    import shutil
    from pathlib import Path
    from PIL import Image
    from test_e2e_parity import CHAIR, SIZE, build_synth_params
    from xmem2_tpu.bridge.torch_params import save_params, convert_state_dict
    from xmem2_tpu.inference import run_on_video as R

    imgs = tmp_path / 'imgs'
    anns = tmp_path / 'anns'
    imgs.mkdir()
    anns.mkdir()
    n = 10
    for i in range(n):
        f = f'frame_{i:06d}.jpg'
        shutil.copy(Path(CHAIR) / 'JPEGImages' / f, imgs / f)
    shutil.copy(Path(CHAIR) / 'Annotations' / 'frame_000000.png',
                anns / 'frame_000000.png')

    _, _, sd = build_synth_params()
    ckpt = tmp_path / 'synth.npz'
    save_params(convert_state_dict(sd), str(ckpt))
    base = {'model': str(ckpt), 'size': SIZE, 'mem_every': 3,
            'save_masks': True}

    outs = {}
    for tag, chunked in (('plain', False), ('chunked', True)):
        out = tmp_path / f'out_{tag}'
        over = dict(base, chunk_frames=chunked)
        stats = R.run_on_video(str(imgs), str(anns), str(out),
                               frames_with_masks=[0], print_progress=False,
                               save_overlay=False, overwrite_config=over)
        assert len(stats) == n
        outs[tag] = sorted((out / 'masks').glob('*.png'))
        assert len(outs[tag]) == n

    for pa, pb in zip(outs['plain'], outs['chunked']):
        a = np.asarray(Image.open(pa))
        b = np.asarray(Image.open(pb))
        agree = float(np.mean(a == b))
        assert agree >= 0.999, f'{pa.name}: {agree:.4f}'


def test_chunk_rejects_oversized_run():
    n = 6
    frames, mask0 = _video(n)
    b = _make_proc()
    b.step(jnp.asarray(frames[0]), jnp.asarray(mask0), [1],
           pack_hw=(H, W), acc=jnp.zeros((), jnp.uint32))
    avail = b.plain_run_length()
    assert avail == CFG['mem_every'] - 1
    stack = jnp.asarray(np.stack(frames[1:1 + avail + 1]))
    with pytest.raises(ValueError):
        b.step_chunk(stack, pack_hw=(H, W))
