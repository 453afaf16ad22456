"""Pixel-level parity for the deterministic augmentation catalog
(xmem2_tpu/inference/frame_selection/utils.py) against a transcribed
torchvision oracle.

The reference catalog (frame_selection_utils.py:50-214) is built from
torchvision transforms at pinned parameters. torchvision is not installed
here, so the oracle transcribes its math directly (same pattern as the
torchvision stub in test_frame_selection.py):
  * photometric ops: torchvision's PIL path literally calls
    ImageEnhance/ImageOps — the oracle pins the op + factor choice;
  * affine: torchvision `_get_inverse_affine_matrix` transcribed verbatim,
    applied through PIL Image.transform with the NEAREST default
    (InterpolationMode.NEAREST is F.affine/RandomAffine's default);
  * gaussian_blur: torchvision's truncated FIR kernel via torch conv2d with
    reflect padding (independent of the production numpy implementation);
  * mask path: torchvision's TENSOR affine (theta -> affine grid ->
    grid_sample nearest), since the reference applies mask_aug to a torch
    tensor (run_on_video.py:239).
"""

import math

import numpy as np
import pytest
from PIL import Image, ImageEnhance, ImageOps

from xmem2_tpu.inference.frame_selection.utils import (
    get_determenistic_augmentations)


# ------------------------------------------------- transcribed torchvision
def tv_inverse_affine_matrix(center, angle, translate, scale, shear):
    """Literal transcription of torchvision.transforms.functional
    ._get_inverse_affine_matrix (shear given as (sx, sy) degrees)."""
    rot = math.radians(angle)
    sx = math.radians(shear[0])
    sy = math.radians(shear[1])
    cx, cy = center
    tx, ty = translate
    a = math.cos(rot - sy) / math.cos(sy)
    b = -math.cos(rot - sy) * math.tan(sx) / math.cos(sy) - math.sin(rot)
    c = math.sin(rot - sy) / math.cos(sy)
    d = -math.sin(rot - sy) * math.tan(sx) / math.cos(sy) + math.cos(rot)
    matrix = [d, -b, 0.0, -c, a, 0.0]
    matrix = [x / scale for x in matrix]
    matrix[2] += matrix[0] * (-cx - tx) + matrix[1] * (-cy - ty)
    matrix[5] += matrix[3] * (-cx - tx) + matrix[4] * (-cy - ty)
    matrix[2] += cx
    matrix[5] += cy
    return matrix


def tv_affine_pil(img: Image.Image, angle=0.0, translate=(0, 0), scale=1.0,
                  shear=0.0) -> Image.Image:
    """torchvision F.affine, PIL path, NEAREST default interpolation."""
    w, h = img.size
    matrix = tv_inverse_affine_matrix((w * 0.5, h * 0.5), angle,
                                      translate, scale, (shear, 0.0))
    return img.transform((w, h), Image.AFFINE, matrix, resample=Image.NEAREST)


def tv_affine_tensor(mask: np.ndarray, angle=0.0, translate=(0, 0),
                     scale=1.0, shear=0.0) -> np.ndarray:
    """torchvision F.affine, tensor path (F_t.affine): inverse matrix with
    center (0,0), affine grid with half-pixel offsets, grid_sample nearest.
    mask: [O, H, W] float32."""
    import torch
    o, h, w = mask.shape
    matrix = tv_inverse_affine_matrix((0.0, 0.0), angle,
                                      [float(t) for t in translate], scale,
                                      (shear, 0.0))
    theta = torch.tensor(matrix, dtype=torch.float32).reshape(1, 2, 3)
    d = 0.5
    base_x = torch.linspace(-w * 0.5 + d, w * 0.5 + d - 1, steps=w)
    base_y = torch.linspace(-h * 0.5 + d, h * 0.5 + d - 1, steps=h)
    base_grid = torch.empty(1, h, w, 3)
    base_grid[..., 0].copy_(base_x)
    base_grid[..., 1].copy_(base_y[..., None])
    base_grid[..., 2].fill_(1)
    rescaled_theta = theta.transpose(1, 2) / torch.tensor(
        [0.5 * w, 0.5 * h])
    grid = base_grid.view(1, h * w, 3).bmm(rescaled_theta).view(1, h, w, 2)
    t = torch.from_numpy(mask[None].astype(np.float32))
    out = torch.nn.functional.grid_sample(t, grid, mode='nearest',
                                          padding_mode='zeros',
                                          align_corners=False)
    return out[0].numpy()


def tv_gaussian_blur_torch(img: Image.Image, ksize: int = 7) -> Image.Image:
    """torchvision F.gaussian_blur: sigma = 0.3*((k-1)*0.5-1)+0.8, truncated
    gaussian at integer offsets, separable conv2d with reflect pad, rounded
    back to uint8."""
    import torch
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = torch.linspace(-ksize // 2 + 1, ksize // 2, steps=ksize)
    pdf = torch.exp(-0.5 * (x / sigma).pow(2))
    k1 = pdf / pdf.sum()
    kernel2d = torch.mm(k1[:, None], k1[None, :])
    t = torch.from_numpy(
        np.asarray(img, np.float32).transpose(2, 0, 1))[None]    # [1,C,H,W]
    c = t.shape[1]
    k = kernel2d.expand(c, 1, ksize, ksize)
    pad = ksize // 2
    t = torch.nn.functional.pad(t, [pad] * 4, mode='reflect')
    out = torch.nn.functional.conv2d(t, k, groups=c)
    out = out[0].round().clamp(0, 255).to(torch.uint8).numpy()
    return Image.fromarray(out.transpose(1, 2, 0))


GEO_PARAMS = {
    'rotate_right': dict(angle=30),
    'rotate_left': dict(angle=-30),
    'zoom_out': dict(scale=0.5),
    'zoom_in': dict(scale=1.5),
    'shear_right': dict(shear=20),
    'shear_left': dict(shear=-20),
}

PHOTO_ORACLE = {
    'bright': lambda im: ImageEnhance.Brightness(im).enhance(1.5),
    'dark': lambda im: ImageEnhance.Brightness(im).enhance(0.5),
    'gray': lambda im: im.convert('L').convert('RGB'),
    'reduce_bits': lambda im: ImageOps.posterize(im, 3),
    'sharp': lambda im: ImageEnhance.Sharpness(im).enhance(16.0),
}


@pytest.fixture(scope='module')
def test_image():
    rng = np.random.default_rng(0)
    h, w = 64, 96
    # structured content (gradients + blob) + noise: catches geometry errors
    # that uniform noise would hide
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack([xx * 255 // w, yy * 255 // h,
                     ((xx - 48) ** 2 + (yy - 32) ** 2 < 300) * 200], -1)
    img = np.clip(base + rng.integers(0, 40, (h, w, 3)), 0, 255).astype(
        np.uint8)
    return Image.fromarray(img)


@pytest.fixture(scope='module')
def test_mask():
    m = np.zeros((2, 64, 96), np.float32)
    m[0, 10:30, 20:50] = 1.0
    m[1, 35:55, 55:85] = 1.0
    return m


def catalog(subset='all', img_size=(64, 96, 3)):
    augs = get_determenistic_augmentations(img_size=img_size, subset=subset)
    return {img_fn.name: (img_fn, mask_fn) for img_fn, mask_fn in augs}


class TestPhotometricParity:
    @pytest.mark.parametrize('name', list(PHOTO_ORACLE))
    def test_exact(self, name, test_image):
        img_fn, mask_fn = catalog()[name]
        got = np.asarray(img_fn(test_image))
        want = np.asarray(PHOTO_ORACLE[name](test_image))
        np.testing.assert_array_equal(got, want)
        # photometric augs leave the mask untouched
        m = np.random.default_rng(1).random((1, 8, 8)).astype(np.float32)
        np.testing.assert_array_equal(mask_fn(m), m)

    def test_blur_matches_torchvision_fir(self, test_image):
        img_fn, _ = catalog()['blur']
        got = np.asarray(img_fn(test_image)).astype(np.int16)
        want = np.asarray(tv_gaussian_blur_torch(test_image)).astype(np.int16)
        # independent implementations (numpy separable vs torch conv2d):
        # float association may flip the rounding of a few pixels by 1
        assert np.abs(got - want).max() <= 1
        assert (got != want).mean() < 0.02

    def test_blur_differs_from_pil_iir(self, test_image):
        """Guard: PIL's GaussianBlur(radius=1.4) is NOT the torchvision
        kernel — the production catalog must not regress to it."""
        from PIL import ImageFilter
        img_fn, _ = catalog()['blur']
        got = np.asarray(img_fn(test_image))
        pil = np.asarray(test_image.filter(ImageFilter.GaussianBlur(1.4)))
        assert (got != pil).any()


class TestGeometricImageParity:
    @pytest.mark.parametrize('name', list(GEO_PARAMS))
    def test_matches_torchvision_pil_affine(self, name, test_image):
        img_fn, _ = catalog()[name]
        got = np.asarray(img_fn(test_image))
        want = np.asarray(tv_affine_pil(test_image, **GEO_PARAMS[name]))
        # both paths are PIL NEAREST; the production inverse matrix is
        # computed numerically, so sub-ulp differences may flip the nearest
        # pick on exact cell boundaries for a stray pixel
        assert (got != want).mean() < 0.005, (got != want).mean()

    def test_translate_right_distance_is_w_over_5(self, test_image):
        img_fn, _ = catalog('all')['translate_right']
        got = np.asarray(img_fn(test_image))
        want = np.asarray(tv_affine_pil(test_image,
                                        translate=(96 // 5, 0)))
        assert (got != want).mean() < 0.005


class TestGeometricMaskParity:
    @pytest.mark.parametrize('name', list(GEO_PARAMS))
    def test_matches_torchvision_tensor_affine(self, name, test_mask):
        _, mask_fn = catalog()[name]
        got = mask_fn(test_mask)
        want = tv_affine_tensor(test_mask, **GEO_PARAMS[name])
        # the production mask path replicates the tensor affine exactly;
        # only fp ties at exact .5 grid positions may differ
        inter = np.logical_and(got > 0.5, want > 0.5).sum()
        union = np.logical_or(got > 0.5, want > 0.5).sum()
        assert union > 0
        assert inter / union > 0.99, inter / union
        assert (np.abs(got - want) > 0.5).mean() < 0.002


class TestCatalogComposition:
    """Pin the (aug, mask_aug) pair lists to the reference's subset tables
    (frame_selection_utils.py:110-214)."""

    def _names(self, subset):
        augs = get_determenistic_augmentations(img_size=(64, 96, 3),
                                               subset=subset)
        return [(i.name, m.name) for i, m in augs]

    def test_best_3(self):
        assert self._names('best_3') == [
            ('blur', 'identity'), ('zoom_in', 'zoom_in'),
            ('shear_right', 'shear_right')]

    def test_best_3_with_symmetrical(self):
        assert self._names('best_3_with_symmetrical') == [
            ('blur', 'identity'), ('zoom_in', 'zoom_in'),
            ('shear_right', 'shear_right'), ('shear_left', 'shear_left')]

    def test_best_all(self):
        assert self._names('best_all') == [
            ('bright', 'identity'), ('dark', 'identity'),
            ('reduce_bits', 'identity'), ('sharp', 'identity'),
            ('blur', 'identity'),
            ('rotate_right', 'rotate_right'), ('rotate_left', 'rotate_left'),
            ('zoom_out', 'zoom_out'), ('zoom_in', 'zoom_in'),
            ('shear_right', 'shear_right'), ('shear_left', 'shear_left')]

    def test_original_only(self):
        assert self._names('original_only') == [
            ('bright', 'identity'), ('dark', 'identity'),
            ('gray', 'identity'), ('reduce_bits', 'identity'),
            ('sharp', 'identity'), ('blur', 'identity')]

    def test_all(self):
        assert self._names('all') == [
            ('bright', 'identity'), ('dark', 'identity'),
            ('gray', 'identity'), ('reduce_bits', 'identity'),
            ('sharp', 'identity'), ('blur', 'identity'),
            ('rotate_right', 'rotate_right'), ('rotate_left', 'rotate_left'),
            ('translate_right', 'translate_right'),
            ('zoom_out', 'zoom_out'), ('zoom_in', 'zoom_in'),
            ('shear_right', 'shear_right'), ('shear_left', 'shear_left')]
