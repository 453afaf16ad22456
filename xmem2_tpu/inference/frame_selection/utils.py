"""Frame-selection utilities: per-frame key extraction and the deterministic
augmentation catalog for permanent-memory augmentation.

Behavioral parity target: reference inference/frame_selection/
frame_selection_utils.py (extract_keys :11, get_determenistic_augmentations
:50). Augmentations are reimplemented with PIL (torchvision is not a
dependency); geometric parameters match the reference's catalog (rotate ±30°,
shear ±20°, zoom 0.5x/1.5x, brightness 1.5x/0.5x, posterize 3 bits,
sharpness 16x, gaussian blur k=7).
"""

from typing import Callable, List, Tuple

import numpy as np
from PIL import Image, ImageEnhance, ImageFilter, ImageOps


def extract_keys(vid_reader, processor, print_progress=False):
    """One pass over the video computing key/shrinkage/selection per frame.

    Returns (frame_keys, shrinkages, selections): lists of np arrays
    [1, h, w, C] (channels-last; cached host-side as in the reference)."""
    from tqdm import tqdm
    frame_keys, shrinkages, selections = [], [], []
    for sample in tqdm(vid_reader, total=len(vid_reader),
                       disable=not print_progress,
                       desc='Calculating key features'):
        key, shrinkage, selection = processor.encode_frame_key(
            np.asarray(sample.rgb))
        frame_keys.append(np.asarray(key))
        shrinkages.append(np.asarray(shrinkage))
        selections.append(np.asarray(selection))
    return frame_keys, shrinkages, selections


# ---------------------------------------------------------------------------
# deterministic augmentations
# ---------------------------------------------------------------------------

def _affine_pil(img: Image.Image, angle=0.0, translate=(0, 0), scale=1.0,
                shear=0.0, resample=Image.BILINEAR) -> Image.Image:
    """Center-based affine matching torchvision FT.affine conventions."""
    w, h = img.size
    cx, cy = w * 0.5, h * 0.5
    a = np.deg2rad(angle)
    s = np.deg2rad(shear)
    # torchvision: M = T(center) R(angle) Shear(s) Scale * T(-center) T(translate)
    cos_a, sin_a = np.cos(a), np.sin(a)
    # rotation+shear+scale matrix (inverse mapping for PIL)
    m00 = scale * cos_a
    m01 = -scale * np.sin(a + s) / max(np.cos(s), 1e-8)
    m10 = scale * sin_a
    m11 = scale * np.cos(a + s) / max(np.cos(s), 1e-8)
    mat = np.array([[m00, m01], [m10, m11]])
    inv = np.linalg.inv(mat)
    tx, ty = translate
    # PIL transform uses the inverse map: out(x, y) = in(a x + b y + c, ...)
    c0 = cx - inv[0, 0] * (cx + tx) - inv[0, 1] * (cy + ty)
    c1 = cy - inv[1, 0] * (cx + tx) - inv[1, 1] * (cy + ty)
    return img.transform((w, h), Image.AFFINE,
                         (inv[0, 0], inv[0, 1], c0, inv[1, 0], inv[1, 1], c1),
                         resample=resample)


def _mask_affine(mask: np.ndarray, **kw) -> np.ndarray:
    """Apply a geometric transform to an [O, H, W] float mask (nearest)."""
    out = np.empty_like(mask)
    for i, ch in enumerate(mask):
        im = Image.fromarray((ch * 255).astype(np.uint8))
        out[i] = np.asarray(_affine_pil(im, resample=Image.NEAREST, **kw),
                            np.float32) / 255.0
    return out


def _named(fn: Callable, name: str) -> Callable:
    fn.name = name
    return fn


def get_determenistic_augmentations(img_size=None, mask=None,
                                    subset: str = 'best_all'
                                    ) -> List[Tuple[Callable, Callable]]:
    """Returns (img_fn, mask_fn) pairs. img_fn: PIL RGB -> PIL RGB (raw image
    space); mask_fn: [O, H, W] float -> same. (Misspelling kept for API
    parity with the reference.)"""
    assert subset in {'best_3', 'best_3_with_symmetrical', 'best_all',
                      'original_only', 'all'}

    identity_img = _named(lambda im: im, 'identity')
    identity_mask = _named(lambda m: m, 'identity')

    bright = _named(lambda im: ImageEnhance.Brightness(im).enhance(1.5), 'bright')
    dark = _named(lambda im: ImageEnhance.Brightness(im).enhance(0.5), 'dark')
    gray = _named(lambda im: im.convert('L').convert('RGB'), 'gray')
    reduce_bits = _named(lambda im: ImageOps.posterize(im, 3), 'reduce_bits')
    sharp = _named(lambda im: ImageEnhance.Sharpness(im).enhance(16.0), 'sharp')
    # torchvision gaussian_blur(kernel_size=7) default sigma = 0.3*((7-1)*0.5-1)+0.8
    blur = _named(lambda im: im.filter(ImageFilter.GaussianBlur(radius=1.4)), 'blur')

    def geo(name, **kw):
        return (_named(lambda im: _affine_pil(im, **kw), name),
                _named(lambda m: _mask_affine(m, **kw), name))

    rotate_right = geo('rotate_right', angle=30)
    rotate_left = geo('rotate_left', angle=-30)
    zoom_out = geo('zoom_out', scale=0.5)
    zoom_in = geo('zoom_in', scale=1.5)
    shear_right = geo('shear_right', shear=20)
    shear_left = geo('shear_left', shear=-20)
    if img_size is not None:
        translate_distance = img_size[-2] // 5  # W/5 (img_size trailing = H, W, C)
    else:
        translate_distance = 200
    translate_right = geo('translate_right', translate=(translate_distance, 0))

    photometric = {
        'best_3': [blur],
        'best_3_with_symmetrical': [blur],
        'best_all': [bright, dark, reduce_bits, sharp, blur],
        'original_only': [bright, dark, gray, reduce_bits, sharp, blur],
        'all': [bright, dark, gray, reduce_bits, sharp, blur],
    }[subset]
    geometric = {
        'best_3': [zoom_in, shear_right],
        'best_3_with_symmetrical': [zoom_in, shear_right, shear_left],
        'best_all': [rotate_right, rotate_left, zoom_out, zoom_in,
                     shear_right, shear_left],
        'original_only': [],
        'all': [rotate_right, rotate_left, translate_right, zoom_out, zoom_in,
                shear_right, shear_left],
    }[subset]

    return ([(p, identity_mask) for p in photometric]
            + [(gi, gm) for gi, gm in geometric])
