"""run_on_video — the product's main inference path.

API parity target: reference inference/run_on_video.py (run_on_video :247,
_inference_on_video :31, _preload_permanent_memory :201,
select_k_next_best_annotation_candidates :285). Signatures and the returned
pandas DataFrame match so reference users can switch imports.
"""

import os
from dataclasses import replace
from pathlib import Path
from tempfile import TemporaryDirectory
from time import perf_counter
from typing import Iterable, List, Optional, Union
from warnings import warn

import numpy as np
import jax.numpy as jnp
from PIL import Image

from xmem2_tpu.config import VIDEO_INFERENCE_CONFIG
from xmem2_tpu.bridge.torch_params import load_any
from xmem2_tpu.inference.core import InferenceCore
from xmem2_tpu.inference.net import XMemNet
from xmem2_tpu.inference.data.video_reader import Sample, VideoReader
from xmem2_tpu.inference.data.mask_mapper import MaskMapper
from xmem2_tpu.inference.postprocess import unpack_mask
from xmem2_tpu.utils.image_saver import ParallelImageSaver
from xmem2_tpu.utils.iou import compute_array_iou


def _resolve_dtype(name: str):
    from xmem2_tpu.config import resolve_dtype_name
    return {'float32': jnp.float32,
            'bfloat16': jnp.bfloat16}[resolve_dtype_name(name)]


def _load_main_objects(imgs_in_path, masks_in_path, config):
    model_path = config.get('model')
    if model_path is not None and os.path.exists(str(model_path)):
        params = load_any(model_path)
    else:
        warn('No model weights were loaded, as config["model"] was not found.')
        raise FileNotFoundError(f'model checkpoint not found: {model_path}')

    network = XMemNet(params, compute_dtype=_resolve_dtype(
        config.get('compute_dtype', 'auto')))
    mapper = MaskMapper()
    processor = InferenceCore(network, config=config)
    vid_reader = _create_reader(imgs_in_path, masks_in_path, config)
    return mapper, processor, vid_reader


def _create_reader(imgs_in_path, masks_in_path, config) -> VideoReader:
    vid_reader = VideoReader(
        '', imgs_in_path, masks_in_path, size=config['size'], use_all_masks=True,
        host_preprocess=not config.get('device_preprocess', True))
    vid_length = len(vid_reader)
    # no need to count LT usage if the video is short (reference :190-196)
    config['enable_long_term_count_usage'] = (
        config['enable_long_term'] and
        (vid_length
         / (config['max_mid_term_frames'] - config['min_mid_term_frames'])
         * config['num_prototypes'])
        >= config['max_long_term_elements']
    )
    return vid_reader


def _preload_permanent_memory(frames_to_put_in_permanent_memory: List[int],
                              vid_reader: VideoReader, mapper: MaskMapper,
                              processor: InferenceCore,
                              augment_images_with_masks: bool = False):
    total_preloading_time = 0.0
    at_least_one_mask_loaded = False
    for j in frames_to_put_in_permanent_memory:
        sample = vid_reader[j]
        frame_rgb = sample.rgb if sample.rgb is not None else sample.rgb_u8
        if sample.mask is None:
            raise FileNotFoundError(
                f"Couldn't find mask {j}! Check that the filename matches the "
                f"frame or follows the `frame_%06d.png` format.")
        msk, labels = mapper.convert_mask(sample.mask, exhaustive=True)
        if min(msk.shape) == 0:
            warn(f'Skipping adding frame {j} to permanent memory: empty mask')
            continue
        if sample.need_resize:
            msk = vid_reader.resize_mask(msk)

        processor.set_all_labels(list(mapper.remappings.values()))
        a = perf_counter()
        processor.put_to_permanent_memory(jnp.asarray(frame_rgb),
                                          jnp.asarray(msk), ti=j)
        total_preloading_time += perf_counter() - a
        at_least_one_mask_loaded = True

        if augment_images_with_masks:
            from xmem2_tpu.inference.frame_selection.utils import (
                get_determenistic_augmentations)
            # the reference derives translate_distance from the RESIZED frame
            # (run_on_video.py:232-233 passes sample.rgb.shape, post-resize);
            # msk is already resized above, so its trailing dims give the
            # (H, W) that mask_aug operates in — frame_rgb may be the RAW
            # uint8 frame under device_preprocess and must not be used here
            augs = get_determenistic_augmentations(
                (msk.shape[-2], msk.shape[-1], 3), msk, subset='best_all')
            for img_aug, mask_aug in augs:
                # augment in raw image space, then normalize+resize
                # (reference run_on_video.py:236-242)
                rgb_aug = vid_reader.im_transform(img_aug(sample.raw_image_pil))
                msk_aug = mask_aug(np.asarray(msk))
                processor.put_to_permanent_memory(jnp.asarray(rgb_aug),
                                                  jnp.asarray(msk_aug))
    return at_least_one_mask_loaded, total_preloading_time



def _inference_on_video(frames_with_masks, imgs_in_path, masks_in_path,
                        masks_out_path,
                        original_memory_mechanism=False,
                        compute_iou=False,
                        manually_curated_masks=False,
                        print_progress=True,
                        augment_images_with_masks=False,
                        overwrite_config: Optional[dict] = None,
                        save_overlay=True,
                        object_color_if_single_object=(255, 255, 255),
                        print_fps=False,
                        image_saving_max_queue_size=200):
    from tqdm import tqdm

    frames_with_masks = set(frames_with_masks)
    config = VIDEO_INFERENCE_CONFIG.copy()
    overwrite_config = {} if overwrite_config is None else overwrite_config
    overwrite_config['masks_out_path'] = masks_out_path
    config.update(overwrite_config)

    mapper, processor, vid_reader = _load_main_objects(
        imgs_in_path, masks_in_path, config)
    vid_name = vid_reader.vid_name
    vid_length = len(vid_reader)

    if original_memory_mechanism:
        frames_to_put_in_permanent_memory = [0]  # only the first frame
    else:
        frames_to_put_in_permanent_memory = frames_with_masks
    at_least_one_mask_loaded, total_preloading_time = _preload_permanent_memory(
        frames_to_put_in_permanent_memory, vid_reader, mapper, processor,
        augment_images_with_masks=augment_images_with_masks)
    if not at_least_one_mask_loaded:
        raise ValueError('No valid masks provided!')

    # chunked stepping (default ON; config['chunk_frames']=False /
    # XMEM2_CHUNKED=0 opts out): runs of plain frames execute as one compiled
    # program (InferenceCore.step_chunk) — a TPU dispatch-amortization path
    # with identical semantics (tests/test_chunked_step.py pins mask
    # equality); disabled under the flag combos it cannot honor
    use_chunks = bool(config.get(
        'chunk_frames', os.environ.get('XMEM2_CHUNKED', '1') != '0'))
    use_chunks &= not manually_curated_masks
    # frames in flight before the oldest packed mask is fetched: overlaps the
    # device->host transfer (and the dispatch RTT on remote-attached chips)
    # with compute on the following frames. 1 = fully synchronous.
    pipeline_depth = max(int(config.get('pipeline_depth', 4)), 1)

    stats = []
    total_processing_time = 0.0
    with ParallelImageSaver(
            config['masks_out_path'], vid_name=vid_name,
            overlay_color_if_b_and_w=object_color_if_single_object,
            max_queue_size=image_saving_max_queue_size) as im_saver:

        def finish_frame(ti, sample, out_mask, mask_provided):
            curr_stat = {'frame': sample.frame, 'mask_provided': mask_provided}
            if compute_iou:
                gt = sample.mask  # original-resolution GT or None
                if gt is not None and not mask_provided:
                    curr_stat['iou'] = float(compute_array_iou(out_mask, gt))
                else:
                    curr_stat['iou'] = -1  # model saw this GT; skip
            stats.append(curr_stat)

            if config['save_masks']:
                out_mask = mapper.remap_index_mask(out_mask)
                out_img = Image.fromarray(out_mask)
                out_img = vid_reader.map_the_colors_back(out_img)
                im_saver.save_mask(mask=out_img, frame_name=sample.frame)
                if save_overlay:
                    im_saver.save_overlay(orig_img=sample.raw_image_pil,
                                          mask=out_img, frame_name=sample.frame)

        # in-flight packed masks: (ti, sample, packed device buffer,
        # pack width, pack bits, mask_provided). Fetch + host post-processing
        # happen `pipeline_depth` frames behind submission, so the
        # device->host transfer (and dispatch RTT on remote-attached chips)
        # overlaps compute on the following frames.
        from collections import deque
        inflight = deque()

        def drain_one():
            fti, fsample, packed, width, bits, provided = inflight.popleft()
            out_mask = unpack_mask(np.asarray(packed), width, bits)
            finish_frame(fti, fsample, out_mask, provided)

        def submit(ti, sample, packed, width, bits, provided):
            packed.copy_to_host_async()
            inflight.append((ti, sample, packed, width, bits, provided))
            while len(inflight) >= pipeline_depth:
                drain_one()

        # peekable buffer over the reader's background-prefetched iterator:
        # chunk lookahead must not forfeit the decode/compute overlap of
        # __iter__, and must not double-load frames via __getitem__
        from collections import deque
        sample_iter = iter(vid_reader)
        lookahead = deque()

        def peek(j):
            while len(lookahead) <= j:
                lookahead.append(next(sample_iter))
            return lookahead[j]

        progress = tqdm(total=vid_length, disable=not print_progress)
        loop_start = perf_counter()
        ti = 0
        while ti < vid_length:
            sample = peek(0)
            out_hw = tuple(int(x) for x in sample.shape)
            frame_rgb = sample.rgb if sample.rgb is not None else sample.rgb_u8

            # how many upcoming frames can go through one chunk dispatch
            k = 0
            if use_chunks and ti not in frames_with_masks:
                k = min(processor.plain_run_length(), vid_length - 1 - ti)
                while any((ti + j) in frames_with_masks for j in range(k)):
                    k -= 1
            if k > 1:
                chunk = [peek(j) for j in range(k)]
                for _ in range(k):
                    lookahead.popleft()
                stack = jnp.asarray(np.stack(
                    [s.rgb if s.rgb is not None else s.rgb_u8
                     for s in chunk]))
                packs, _ = processor.step_chunk(stack, pack_hw=out_hw)
                bits = processor.pack_bits
                for j, s in enumerate(chunk):
                    submit(ti + j, s, packs[j], out_hw[1], bits, False)
                progress.update(k)
                ti += k
                continue

            if ti in frames_with_masks:
                msk = sample.mask
            else:
                msk = None

            if msk is not None:
                msk, labels = mapper.convert_mask(msk, exhaustive=True)
                if sample.need_resize:
                    msk = vid_reader.resize_mask(msk)
                msk = jnp.asarray(msk)
                processor.set_all_labels(list(mapper.remappings.values()))
            else:
                labels = None

            if original_memory_mechanism:
                do_not_add_mask_to_memory = (ti == 0)
            else:
                do_not_add_mask_to_memory = msk is not None

            # resize-back + argmax + bit-pack run inside the step's compiled
            # program; only the packed index mask crosses device->host
            _, packed, _ = processor.step(
                jnp.asarray(frame_rgb), msk, labels,
                end=(ti == vid_length - 1),
                manually_curated_masks=manually_curated_masks,
                do_not_add_mask_to_memory=do_not_add_mask_to_memory,
                pack_hw=out_hw)
            submit(ti, sample, packed, out_hw[1], processor.pack_bits,
                   msk is not None)
            lookahead.popleft()
            progress.update(1)
            ti += 1
        while inflight:
            drain_one()
        total_processing_time = perf_counter() - loop_start
        progress.close()
        im_saver.wait_for_jobs_to_finish(verbose=print_progress)

    if print_fps:
        # total_processing_time is whole-loop WALL CLOCK (includes host frame
        # decode waits, mask unpack and IoU post-processing) — the pipelined
        # loop has no per-step device boundary to time, so this is labelled
        # end-to-end rather than presented as the reference's per-step sum
        print(f'TOTAL PRELOADING TIME: {total_preloading_time:.4f}s')
        print(f'TOTAL PROCESSING TIME (end-to-end wall clock): '
              f'{total_processing_time:.4f}s')
        print(f'TOTAL TIME (excluding image saving): '
              f'{total_preloading_time + total_processing_time:.4f}s')
        print(f'TOTAL PROCESSING FPS (end-to-end wall clock): '
              f'{vid_length / total_processing_time:.4f}')
        print(f'TOTAL FPS (excluding image saving): '
              f'{vid_length / (total_preloading_time + total_processing_time):.4f}')

    import pandas as pd
    return pd.DataFrame(stats)


def run_on_video(
    imgs_in_path: Union[str, os.PathLike],
    masks_in_path: Union[str, os.PathLike],
    masks_out_path: Union[str, os.PathLike],
    frames_with_masks: Iterable[int] = (0,),
    compute_iou=False,
    print_progress=True,
    **kwargs,
):
    """Run inference on a video (signature-compatible with the reference
    run_on_video, inference/run_on_video.py:247-282).

    Returns a pandas DataFrame with one row per frame ('frame',
    'mask_provided' and, when compute_iou=True, 'iou')."""
    return _inference_on_video(
        imgs_in_path=imgs_in_path,
        masks_in_path=masks_in_path,
        masks_out_path=masks_out_path,
        frames_with_masks=frames_with_masks,
        compute_iou=compute_iou,
        print_progress=print_progress,
        **kwargs,
    )


def select_k_next_best_annotation_candidates(
    imgs_in_path: Union[str, os.PathLike],
    masks_in_path: Union[str, os.PathLike],
    masks_out_path: Optional[Union[str, os.PathLike]] = None,
    k: int = 5,
    print_progress=True,
    previously_chosen_candidates=(0,),
    use_previously_predicted_masks=True,
    alpha=0.5,
    min_mask_presence_percent=0.25,
    **kwargs,
) -> List[int]:
    """Select the next best annotation candidate frames (API parity with
    reference run_on_video.py:285-370)."""
    from xmem2_tpu.inference.frame_selection.frame_selection import (
        select_next_candidates)
    from xmem2_tpu.inference.frame_selection.utils import extract_keys

    config = VIDEO_INFERENCE_CONFIG.copy()
    mapper, processor, vid_reader = _load_main_objects(
        imgs_in_path, masks_in_path, config)

    frame_keys, shrinkages, selections = extract_keys(
        vid_reader, processor, print_progress=print_progress)

    tmp_holder = None
    if masks_out_path is not None:
        p_masks_out = Path(masks_out_path)

    if use_previously_predicted_masks:
        assert masks_out_path is not None, (
            'When `use_previously_predicted_masks=True`, provide the path to '
            'previously predicted masks in `masks_out_path`')
        mask_paths = sorted((p_masks_out / 'masks').iterdir())
        masks = [np.asarray(Image.open(p), np.float32)[None] / 255.0
                 for p in mask_paths]
        if len(masks) != len(frame_keys):
            raise FileNotFoundError(
                f'Not enough masks ({len(masks)}) for {len(frame_keys)} frames')
    else:
        if masks_out_path is None:
            tmp_holder = TemporaryDirectory()
            p_masks_out = Path(tmp_holder.name)
        run_on_video(
            imgs_in_path=imgs_in_path, masks_in_path=masks_in_path,
            masks_out_path=p_masks_out,
            frames_with_masks=previously_chosen_candidates,
            compute_iou=False, print_progress=print_progress, **kwargs)
        masks = [np.asarray(Image.open(p), np.float32)[None] / 255.0
                 for p in sorted((p_masks_out / 'masks').iterdir())]

    chosen = select_next_candidates(
        np.concatenate(frame_keys), shrinkages=np.concatenate(shrinkages),
        selections=np.concatenate(selections), masks=masks,
        num_next_candidates=k,
        previously_chosen_candidates=list(previously_chosen_candidates),
        print_progress=print_progress, alpha=alpha, only_new_candidates=True,
        min_mask_presence_percent=min_mask_presence_percent)

    if tmp_holder is not None:
        tmp_holder.cleanup()
    return chosen
