"""Benchmark evaluation over DAVIS / YouTubeVOS / long-video / generic
datasets.

CLI parity target: reference eval.py:28-257 — same flags, per-video loop,
FPS + peak-memory report, palette mask saving, score dumps for multi-scale
merging (saved as .npz instead of hickle), zip packaging for submission.
Fixes the reference's latent eval.py:233 bug (VideoReader.get_palette did not
exist; ours does).
"""

from xmem2_tpu.utils.platform import honor_jax_platforms_env
honor_jax_platforms_env()  # JAX_PLATFORMS env wins over sitecustomize

import os
import time
from argparse import ArgumentParser
from os import path

import numpy as np
from PIL import Image

from xmem2_tpu.config import VIDEO_INFERENCE_CONFIG


def main():
    parser = ArgumentParser()
    parser.add_argument('--model', default='./saves/XMem.npz')
    parser.add_argument('--d16_path', default='../DAVIS/2016')
    parser.add_argument('--d17_path', default='../DAVIS/2017')
    parser.add_argument('--y18_path', default='../YouTube2018')
    parser.add_argument('--y19_path', default='../YouTube')
    parser.add_argument('--lv_path', default='../long_video_set')
    parser.add_argument('--generic_path')
    parser.add_argument('--dataset', default='D17',
                        help='D16/D17/Y18/Y19/LV1/LV3/G')
    parser.add_argument('--split', default='val')
    parser.add_argument('--output', default=None)
    parser.add_argument('--save_all', action='store_true')
    parser.add_argument('--benchmark', action='store_true',
                        help='enable fair per-frame timing (blocks on device each frame)')
    parser.add_argument('--disable_long_term', action='store_true')
    parser.add_argument('--max_mid_term_frames', type=int, default=10)
    parser.add_argument('--min_mid_term_frames', type=int, default=5)
    parser.add_argument('--max_long_term_elements', type=int, default=10000)
    parser.add_argument('--num_prototypes', type=int, default=128)
    parser.add_argument('--top_k', type=int, default=30)
    parser.add_argument('--mem_every', type=int, default=5)
    parser.add_argument('--deep_update_every', type=int, default=-1)
    parser.add_argument('--save_scores', action='store_true')
    parser.add_argument('--size', type=int, default=480,
                        help='resize shorter side, -1 for original')
    parser.add_argument('--compute_dtype', default='auto',
                        choices=['auto', 'float32', 'bfloat16'],
                        help="'auto' = bfloat16 on TPU, float32 elsewhere")
    parser.add_argument('--exact', action='store_true',
                        help='force float32 compute + float32 memory value '
                             'stores (bit-closer parity with the fp32 '
                             'reference); overrides --compute_dtype')
    parser.add_argument('--chunked', default=None,
                        action='store_true',
                        help='Run plain-frame runs as one compiled program '
                             '(InferenceCore.step_chunk): amortizes '
                             'per-dispatch cost on host-attached TPUs. '
                             'Default on; --no_chunked disables.')
    parser.add_argument('--no_chunked', dest='chunked', action='store_false')
    parser.add_argument('--memory_shards', type=int, default=0,
                        help='shard the memory banks over this many chips '
                             '(a `memory` mesh axis); the per-frame readout '
                             'runs as an exact sharded program. 0 = off')
    parser.add_argument('--profile_dir', default=None,
                        help='write a jax.profiler device trace here '
                             '(view with tensorboard --logdir)')
    parser.add_argument('--spill_long_term', action='store_true',
                        help='archive evicted long-term memory rows in host '
                             'DRAM instead of discarding them; they revive '
                             'when max_long_term_elements is raised live')
    args = parser.parse_args()
    if args.chunked is None:
        args.chunked = True       # default on; --no_chunked opts out
    if args.exact:
        args.compute_dtype = 'float32'

    import jax
    import jax.numpy as jnp
    from xmem2_tpu.bridge.torch_params import load_any
    from xmem2_tpu.inference.core import InferenceCore
    from xmem2_tpu.inference.net import XMemNet
    from xmem2_tpu.inference.data.mask_mapper import MaskMapper
    from xmem2_tpu.inference.data.test_datasets import (
        DAVISTestDataset, GenericTestDataset, LongTestDataset,
        YouTubeVOSTestDataset)
    from xmem2_tpu.utils.resize_np import resize_bilinear_np

    config = VIDEO_INFERENCE_CONFIG.copy()
    config.update({
        'model': args.model, 'size': args.size, 'top_k': args.top_k,
        'mem_every': args.mem_every, 'deep_update_every': args.deep_update_every,
        'enable_long_term': not args.disable_long_term,
        'max_mid_term_frames': args.max_mid_term_frames,
        'min_mid_term_frames': args.min_mid_term_frames,
        'max_long_term_elements': args.max_long_term_elements,
        'num_prototypes': args.num_prototypes,
        'compute_dtype': args.compute_dtype,
        'value_store_dtype': 'float32' if args.exact else
                             VIDEO_INFERENCE_CONFIG['value_store_dtype'],
        'spill_long_term': args.spill_long_term,
        'memory_shards': args.memory_shards,
    })

    if args.output is None:
        args.output = f'../output/{args.dataset}_{args.split}'
        print(f'Output path not provided. Defaulting to {args.output}')

    is_youtube = args.dataset.startswith('Y')
    is_davis = args.dataset.startswith('D')
    is_lv = args.dataset.startswith('LV')

    if is_youtube or args.save_scores:
        out_path = path.join(args.output, 'Annotations')
    else:
        out_path = args.output

    # dataset selection (reference eval.py:77-129)
    if is_youtube:
        if args.split == 'val':
            # YouTubeVOS names its validation split 'valid'
            # (reference eval.py:92-94)
            args.split = 'valid'
        if args.dataset == 'Y18':
            meta_dataset = YouTubeVOSTestDataset(args.y18_path, args.split,
                                                 size=args.size)
        else:
            meta_dataset = YouTubeVOSTestDataset(args.y19_path, args.split,
                                                 size=args.size)
    elif is_davis:
        if args.dataset == 'D16':
            if args.split == 'val':
                meta_dataset = GenericTestDataset(
                    path.join(args.d16_path, 'trainval'), size=args.size)
            else:
                raise NotImplementedError
        else:
            imset = {'val': '2017/val.txt', 'test': '2017/test-dev.txt'}[args.split]
            meta_dataset = DAVISTestDataset(
                args.d17_path if args.split == 'val'
                else path.join(args.d17_path, 'trainval'),
                imset=imset, size=args.size)
    elif is_lv:
        meta_dataset = LongTestDataset(
            path.join(args.lv_path, {'LV1': 'long_video',
                                     'LV3': 'long_video_x3'}[args.dataset]),
            size=args.size)
    elif args.dataset == 'G':
        meta_dataset = GenericTestDataset(args.generic_path, size=args.size)
    else:
        raise NotImplementedError(args.dataset)

    params = load_any(args.model)
    from xmem2_tpu.config import resolve_dtype_name
    network = XMemNet(params, compute_dtype={
        'float32': jnp.float32, 'bfloat16': jnp.bfloat16}[
            resolve_dtype_name(args.compute_dtype)])

    from xmem2_tpu.utils.profiling import device_trace
    profile_ctx = device_trace(args.profile_dir)
    profile_ctx.__enter__()
    total_process_time = 0.0
    total_frames = 0

    for vid_reader in meta_dataset.get_datasets():
        vid_name = vid_reader.vid_name
        vid_length = len(vid_reader)
        # long-term usage heuristic per video length (reference eval.py:154-160)
        config['enable_long_term_count_usage'] = (
            config['enable_long_term'] and
            (vid_length / (config['max_mid_term_frames'] -
                           config['min_mid_term_frames'])
             * config['num_prototypes']) >= config['max_long_term_elements'])

        mapper = MaskMapper()
        processor = InferenceCore(network, config=config)
        first_mask_loaded = False

        def save_frame(sample, out_mask):
            if args.save_all or sample.save:
                this_out_path = path.join(out_path, vid_name)
                os.makedirs(this_out_path, exist_ok=True)
                out_mask = mapper.remap_index_mask(out_mask)
                out_img = Image.fromarray(out_mask)
                palette = vid_reader.get_palette()
                if palette is not None:
                    out_img.putpalette(palette)
                out_img.save(
                    path.join(this_out_path, sample.frame[:-4] + '.png'))

        # peekable buffer over the reader's background-prefetched iterator:
        # the chunked path looks ahead without double-decoding frames and
        # without forfeiting the prefetch thread's decode/compute overlap
        from collections import deque
        sample_iter = iter(vid_reader)
        lookahead = deque()

        def peek(j):
            while len(lookahead) <= j:
                lookahead.append(next(sample_iter))
            return lookahead[j]

        ti = 0
        while ti < vid_length:
            sample = peek(0)
            frame = sample.frame
            shape = sample.shape
            need_resize = sample.need_resize

            a = time.perf_counter()
            msk = sample.mask
            if not first_mask_loaded:
                if msk is not None:
                    first_mask_loaded = True
                else:
                    # no point segmenting before the first mask
                    lookahead.popleft()
                    ti += 1
                    continue

            # chunked fast path: a run of mask-less steady frames in one
            # dispatch (plain_run_length grows only after memory engages)
            if (args.chunked and not args.save_scores and msk is None):
                k = min(processor.plain_run_length(), vid_length - 1 - ti)
                chunk = [sample]
                for j in range(1, k):
                    s = peek(j)
                    if s.mask is not None:
                        break
                    chunk.append(s)
                if len(chunk) > 1:
                    from xmem2_tpu.inference.postprocess import unpack_mask
                    out_hw = tuple(int(x) for x in shape)
                    stack = jnp.asarray(np.stack([s.rgb for s in chunk]))
                    packs, _ = processor.step_chunk(stack, pack_hw=out_hw)
                    packs = np.asarray(packs)
                    total_process_time += time.perf_counter() - a
                    total_frames += len(chunk)
                    for j, s in enumerate(chunk):
                        save_frame(s, unpack_mask(packs[j], out_hw[1],
                                                  processor.pack_bits))
                        lookahead.popleft()
                    ti += len(chunk)
                    continue

            # upload only on the per-frame path — a chunked run re-stages the
            # frame inside np.stack, so an eager upload would be wasted h2d
            rgb = jnp.asarray(sample.rgb)
            if msk is not None:
                msk, labels = mapper.convert_mask(msk,
                                                  exhaustive=not is_youtube)
                if need_resize:
                    msk = vid_reader.resize_mask(msk)
                msk = jnp.asarray(msk)
                processor.set_all_labels(list(mapper.remappings.values()))
            else:
                labels = None

            if args.save_scores:
                # score dumps need the full probability map on host
                prob = processor.step(rgb, msk, labels,
                                      end=(ti == vid_length - 1))
                prob_np = np.asarray(prob)
                if need_resize:
                    prob_np = np.stack([
                        resize_bilinear_np(c[..., None], shape)[..., 0]
                        for c in prob_np])
                out_mask = np.argmax(prob_np, axis=0).astype(np.uint8)
            else:
                # resize-back + argmax + 4-bit pack run on device inside the
                # step's compiled program; only the packed mask is downloaded
                from xmem2_tpu.inference.postprocess import unpack_mask
                out_hw = tuple(int(x) for x in shape)
                _, packed, _ = processor.step(rgb, msk, labels,
                                              end=(ti == vid_length - 1),
                                              pack_hw=out_hw)
                out_mask = unpack_mask(packed, out_hw[1], processor.pack_bits)
            total_process_time += time.perf_counter() - a
            total_frames += 1

            if args.save_scores:
                prob_dir = path.join(args.output, 'Scores', vid_name)
                os.makedirs(prob_dir, exist_ok=True)
                if ti == vid_length - 1:
                    # label remappings for merge_multi_scale's backward remap
                    # (reference eval.py:241 dumps backward.hkl the same way)
                    import json
                    with open(path.join(prob_dir, 'backward.json'), 'w') as f:
                        json.dump(mapper.remappings, f)
                np.savez_compressed(
                    path.join(prob_dir, f'{frame[:-4]}.npz'),
                    prob=(prob_np * 255).astype(np.uint8))

            save_frame(sample, out_mask)
            lookahead.popleft()
            ti += 1

    profile_ctx.__exit__(None, None, None)
    print(f'Total processing time: {total_process_time}')
    print(f'Total processed frames: {total_frames}')
    if total_process_time > 0:
        print(f'FPS: {total_frames / total_process_time}')
    try:
        import jax
        stats = jax.local_devices()[0].memory_stats()
    except Exception:
        stats = None
    if stats and 'peak_bytes_in_use' in stats:
        print(f'Max allocated memory (MB): '
              f'{stats["peak_bytes_in_use"] / 2**20:.0f}')
    else:
        # never print a silent 0 — CPU/interpret backends expose no stats
        print('Max allocated memory (MB): n/a (backend reports no memory stats)')

    # zip packaging for benchmark submission (reference eval.py:250-257)
    if not args.save_scores:
        import shutil
        if is_youtube:
            print('Making zip for YouTubeVOS...')
            shutil.make_archive(
                path.join(args.output, path.basename(args.output)),
                'zip', args.output, 'Annotations')
        elif is_davis and args.split == 'test':
            print('Making zip for DAVIS test-dev...')
            shutil.make_archive(args.output, 'zip', args.output)


if __name__ == '__main__':
    main()
