"""Async mask/overlay writers + overlay composition.

Behavioral parity target: reference util/image_saver.py (create_overlay :161,
save_image :181, ParallelImageSaver :189). PNG encoding and disk IO run in
background worker processes so they overlap with device compute; a `workers=0`
mode degrades to synchronous writes (useful on single-core test machines).
"""

import multiprocessing
import os
import time
from pathlib import Path
from typing import Optional, Tuple

import numpy as np
from PIL import Image

# 'spawn' children, not fork: the parent runs JAX's thread pools, and a
# fork()ed child inherits their locked mutexes — PIL/numpy calls in the
# worker then deadlock (and dropped writes fail the save). Spawned workers
# start clean, but re-import the CLI's __main__ module, whose top-level
# imports (jax via honor_jax_platforms_env) take SECONDS per worker — paid
# once per video and overlapped with compute, but if the bounded queue fills
# before a worker finishes importing, the producer blocks until it does.
_MP = multiprocessing.get_context('spawn')


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def pool_pairs(images: dict, size, num_objects) -> np.ndarray:
    """Training montage: RGB / predicted masks / GT per (sample, frame) grid
    (reference util/image_saver.py:112-144). `images` is a train batch dict
    plus 'masks_<ti>' predictions; returns an HxWx3 uint8 array for
    tensorboard logging."""
    from PIL import Image as PILImage

    b = min(2, images['rgb'].shape[0])
    t = images['rgb'].shape[1]
    max_num_objects = max(num_objects[:b])
    h, w = size

    def to_img(x):
        x = np.asarray(x, np.float32)
        if x.ndim == 3:                           # [H, W, 3] normalized rgb
            x = x * IMAGENET_STD + IMAGENET_MEAN
        else:                                     # [H, W] mask
            x = np.repeat(x[..., None], 3, -1)
        x = (np.clip(x, 0, 1) * 255).astype(np.uint8)
        return np.asarray(PILImage.fromarray(x).resize((w, h), PILImage.NEAREST))

    rows = []
    for bi in range(b):
        for oi in range(max_num_objects):
            row = []
            for ti in range(t):
                rgb = to_img(images['rgb'][bi, ti])
                if ti == 0 or oi >= num_objects[bi]:
                    mask = to_img(images['first_frame_gt'][bi][0, oi])
                else:
                    mask = to_img(np.asarray(images[f'masks_{ti}'])[bi][oi])
                gt = to_img((images['cls_gt'][bi, ti] == (oi + 1)).astype(np.float32))
                row.append(np.concatenate([rgb, mask, gt], axis=0))
            rows.append(np.concatenate(row, axis=1))
    return np.concatenate(rows, axis=0)


def _check_if_black_and_white(mask_rgb: Image.Image) -> bool:
    colors = mask_rgb.getcolors()
    if colors is None or len(colors) > 2:
        return False
    if len(colors) == 1:
        return True  # all-black image
    return any(rgb == (255, 255, 255) for _, rgb in colors)


def create_overlay(img: Image.Image, mask: Image.Image, mask_alpha=0.5,
                   color_if_black_and_white=(255, 255, 255)) -> Image.Image:
    """Alpha-composite the mask over the image; single-object black&white
    masks are recolored (reference image_saver.py:161-179)."""
    mask = mask.convert('RGB')
    is_bw = _check_if_black_and_white(mask)
    if img.size != mask.size:
        mask = mask.resize(img.size, resample=Image.NEAREST)

    mask_arr = np.array(mask)
    if is_bw:
        mask_arr = np.where(mask_arr, np.array(color_if_black_and_white),
                            mask_arr).astype(np.uint8)
        mask = Image.fromarray(mask_arr, mode='RGB')

    # 255 (keep image) on background, mask_alpha on predicted pixels
    gray = mask_arr @ np.array([0.114, 0.587, 0.299])  # BGR2GRAY on RGB data,
    # matching the reference's cv2.cvtColor(mask_arr, COLOR_BGR2GRAY) call
    alpha = np.full(mask_arr.shape[:2], 255, np.uint8)
    alpha[gray > 0.5] = int(mask_alpha * 255)
    return Image.composite(img, mask, Image.fromarray(alpha, mode='L'))


def save_image(img: Image.Image, frame_name, video_name, general_dir_path,
               sub_dir_name='masks', extension='.png'):
    out_dir = os.path.join(str(general_dir_path), str(video_name), sub_dir_name)
    os.makedirs(out_dir, exist_ok=True)
    img.save(os.path.join(out_dir, frame_name[:-4] + extension))


def _mask_worker(q, vid_name, out_path):
    # blocking get + None sentinel: the queue is FIFO, so every enqueued item
    # is saved before the shutdown sentinel is seen — no drain race against
    # the parent's feeder thread
    while True:
        item = q.get()
        if item is None:
            return
        mask, frame_name, subdir, ext = item
        save_image(mask, frame_name, vid_name, out_path, subdir, ext)


def _overlay_worker(q, vid_name, out_path, object_color):
    while True:
        item = q.get()
        if item is None:
            return
        orig, mask, frame_name, subdir, ext = item
        ov = create_overlay(orig, mask, color_if_black_and_white=object_color)
        save_image(ov, frame_name, vid_name, out_path, subdir, ext)


class ParallelImageSaver:
    """Background mask/overlay saving (reference image_saver.py:189-345).

    workers>0: one process per stream (mask, overlay). workers=0: synchronous.
    """

    def __init__(self, general_output_path: str, vid_name: str,
                 overlay_color_if_b_and_w=(255, 255, 255),
                 max_queue_size: int = 200, workers: int = 1):
        self._p_out = Path(general_output_path)
        self._vid_name = vid_name
        self._object_color = overlay_color_if_b_and_w
        self._workers = workers
        if workers > 0:
            self._mask_queue = _MP.Queue(max_queue_size)
            self._overlay_queue = _MP.Queue(max_queue_size)
        self._mask_proc = None
        self._overlay_proc = None
        self._closed = False

    def save_mask(self, mask: Image.Image, frame_name: str):
        if self._workers == 0:
            save_image(mask, frame_name, self._vid_name, self._p_out,
                       'masks', '.png')
            return
        self._mask_queue.put((mask, frame_name, 'masks', '.png'))
        if self._mask_proc is None:
            self._mask_proc = _MP.Process(
                target=_mask_worker,
                args=(self._mask_queue, self._vid_name, self._p_out),
                daemon=True)
            self._mask_proc.start()

    def save_overlay(self, orig_img: Image.Image, mask: Image.Image,
                     frame_name: str):
        if self._workers == 0:
            ov = create_overlay(orig_img, mask,
                                color_if_black_and_white=self._object_color)
            save_image(ov, frame_name, self._vid_name, self._p_out,
                       'overlay', '.jpg')
            return
        self._overlay_queue.put((orig_img, mask, frame_name, 'overlay', '.jpg'))
        if self._overlay_proc is None:
            self._overlay_proc = _MP.Process(
                target=_overlay_worker,
                args=(self._overlay_queue, self._vid_name, self._p_out,
                      self._object_color), daemon=True)
            self._overlay_proc.start()

    def qsize(self) -> Tuple[int, int]:
        if self._workers == 0:
            return 0, 0
        return self._mask_queue.qsize(), self._overlay_queue.qsize()

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc_value, exc_tb):
        if exc_type is not None:
            self._teardown(kill=True)
            return False
        self.wait_for_jobs_to_finish(verbose=False)
        return False

    def _teardown(self, kill: bool):
        if self._workers == 0 or self._closed:
            return
        self._closed = True
        for p in (self._mask_proc, self._overlay_proc):
            if p is not None and kill:
                p.kill()
        # drop any unflushed feeder-buffer data so interpreter shutdown never
        # blocks joining a feeder thread whose reader process is gone
        for q in (self._mask_queue, self._overlay_queue):
            q.cancel_join_thread()
            q.close()

    def wait_for_jobs_to_finish(self, verbose: bool = False):
        if self._workers == 0 or self._closed:
            return
        for q, p in ((self._mask_queue, self._mask_proc),
                     (self._overlay_queue, self._overlay_proc)):
            if p is not None:
                q.put(None)                      # shutdown sentinel
        if verbose:
            while True:
                m, o = self.qsize()
                if max(m, o) == 0:
                    break
                print(f'Finishing saving the results, {m:>4d} masks and '
                      f'{o:>4d} overlays left.')
                time.sleep(1)
        for p in (self._mask_proc, self._overlay_proc):
            if p is not None:
                p.join()
        self._teardown(kill=False)
        if verbose:
            print('All saving jobs finished')
