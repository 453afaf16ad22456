"""fBRS predictors: base (transform pipeline) and f-BRS-B (feature scale/bias
backpropagating refinement).

Behavioral parity targets: fbrs/inference/predictors/base.py (BasePredictor),
brs.py:54-141 (FeatureBRSPredictor, insertion 'after_aspp'), brs_functors.py
(ScaleBiasOptimizer with early-exit rules), brs_losses.py (BRSMaskLoss),
predictors/__init__.py:8-70 (f-BRS-B wiring: L-BFGS m=20 factr=0 pgtol=1e-8
maxfun=20, net_clicks_limit=8).

The torch autograd inner loop becomes one jitted jax.value_and_grad of the
scale/bias -> BRS loss function; scipy's fmin_l_bfgs_b drives it, as in the
reference.
"""

from functools import partial
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from xmem2_tpu.interactive.clicks.dist_maps import (
    Click, encode_dist, get_dist_maps_native)
from xmem2_tpu.interactive.fbrs import model as M
from xmem2_tpu.interactive.fbrs.transforms import (
    AddHorizontalFlip, LimitLongestSide, SigmoidForPred, ZoomIn)
from xmem2_tpu.nn.functional import resize_bilinear

NORM_RADIUS = 260


def compute_coord_features(image, clicks_lists, norm_radius=NORM_RADIUS):
    """Per-batch-item BFS dist maps -> [B, H, W, 2] (cpu_dist_maps=True path,
    reference fbrs_controller.py:8)."""
    b, h, w = image.shape[:3]
    out = np.empty((b, 2, h, w), np.float32)
    for i, clicks in enumerate(clicks_lists):
        pts = _points_from_clicks(clicks)
        out[i] = get_dist_maps_native(pts, h, w, norm_radius)
    return jnp.asarray(np.moveaxis(encode_dist(out), 1, -1))


def _points_from_clicks(clicks: List[Click], limit: Optional[int] = None,
                        num_max_points: Optional[int] = None) -> np.ndarray:
    clicks = clicks[:limit] if limit else clicks
    pos = [c.coords for c in clicks if c.is_positive]
    neg = [c.coords for c in clicks if not c.is_positive]
    half = num_max_points if num_max_points else max(len(pos), len(neg), 1)
    pts = np.full((2 * half, 2), -1.0, np.float32)
    for i, rc in enumerate(pos[:half]):
        pts[i] = rc
    for i, rc in enumerate(neg[:half]):
        pts[half + i] = rc
    return pts


class BasePredictor:
    def __init__(self, params, net_clicks_limit=None, with_flip=False,
                 zoom_in=None, max_size=None, dtype=jnp.float32):
        self.params = jax.device_put(params)
        self.with_flip = with_flip
        self.net_clicks_limit = net_clicks_limit
        self.original_image = None
        self.zoom_in = zoom_in
        self.dtype = dtype

        self.transforms = [zoom_in] if zoom_in is not None else []
        if max_size is not None:
            self.transforms.append(LimitLongestSide(max_size=max_size))
        self.transforms.append(SigmoidForPred())
        if with_flip:
            self.transforms.append(AddHorizontalFlip())

        self._forward = jax.jit(partial(M.forward, dtype=dtype))

    def set_input_image(self, image):
        """image [H, W, 3] or [1, H, W, 3] float (ImageNet-normalized)."""
        for t in self.transforms:
            t.reset()
        image = jnp.asarray(image)
        if image.ndim == 3:
            image = image[None]
        self.original_image = image

    def get_prediction(self, clicker):
        clicks_list = clicker.get_clicks()
        image, clicks_lists, is_image_changed = self.apply_transforms(
            self.original_image, [clicks_list])

        pred_logits = self._get_prediction(image, clicks_lists,
                                           is_image_changed)
        prediction = resize_bilinear(pred_logits, image.shape[1:3],
                                     align_corners=True)
        for t in reversed(self.transforms):
            prediction = t.inv_transform(prediction)

        if self.zoom_in is not None and self.zoom_in.check_possible_recalculation():
            return self.get_prediction(clicker)
        return prediction                        # [1, H, W, 1] probabilities

    def _get_prediction(self, image, clicks_lists, is_image_changed):
        coord = compute_coord_features(image, self._limited(clicks_lists))
        return self._forward(self.params, image, coord)

    def _limited(self, clicks_lists):
        if self.net_clicks_limit is None:
            return clicks_lists
        return [cl[:self.net_clicks_limit] for cl in clicks_lists]

    def apply_transforms(self, image, clicks_lists):
        is_image_changed = False
        for t in self.transforms:
            image, clicks_lists = t.transform(image, clicks_lists)
            is_image_changed |= t.image_changed
        return image, clicks_lists, is_image_changed

    def get_states(self):
        return {'transform_states': [t.get_state() for t in self.transforms]}

    def set_states(self, states):
        for state, t in zip(states['transform_states'], self.transforms):
            t.set_state(state)


class FeatureBRSPredictor(BasePredictor):
    """f-BRS-B: optimize per-channel scale/bias on the 'after_aspp' features
    so the prediction respects the clicks (reference brs.py:54-118)."""

    def __init__(self, params, optimize_after_n_clicks=1, prob_thresh=0.49,
                 reg_weight=1e-3, reg_bias_weight=10.0, min_iou_diff=1e-3,
                 lbfgs_params=None, **kwargs):
        super().__init__(params, **kwargs)
        self.optimize_after_n_clicks = optimize_after_n_clicks
        self.prob_thresh = prob_thresh
        self.reg_weight = reg_weight
        self.reg_bias_weight = reg_bias_weight
        self.min_iou_diff = min_iou_diff
        self.lbfgs_params = {'m': 20, 'factr': 0, 'pgtol': 1e-8, 'maxfun': 20}
        if lbfgs_params:
            self.lbfgs_params.update(lbfgs_params)
        self.lbfgs_params['maxiter'] = 2 * self.lbfgs_params['maxfun']

        self.opt_data = None
        self.input_data = None
        self.num_channels = 256 + 32             # after_aspp

        self._head_input = jax.jit(partial(self._head_input_fn, dtype=self.dtype))
        self._loss_and_grad = jax.jit(
            jax.value_and_grad(self._brs_loss, argnums=0, has_aux=True),
            static_argnums=(4,))  # out_hw is a static shape

    @staticmethod
    def _head_input_fn(params, image, coord, dtype=None):
        x = M.rgb_with_clicks(params, image, coord, dtype=dtype)
        return M.head_input(params, x, dtype=dtype)

    def _brs_loss(self, opt_params, feats, pos_mask, neg_mask, out_hw):
        """ScaleBiasOptimizer loss (brs_functors.py:93-109 + brs_losses.py):
        click-consistency squared error + scale/bias L2 regularization."""
        c = self.num_channels
        scale = opt_params[:c]
        bias = opt_params[c:]
        reg = self.reg_weight * (jnp.sum(scale ** 2)
                                 + self.reg_bias_weight * jnp.sum(bias ** 2))
        scaled = feats * (1.0 + scale)[None, None, None, :] + bias
        logits = M.head_from_features(self.params, scaled, out_hw,
                                      dtype=self.dtype)
        result = jax.nn.sigmoid(logits)
        if self.with_flip:
            n = result.shape[0] // 2
            result = 0.5 * (result[:n] + result[n:, :, ::-1])

        pos_diff = (1 - result) * pos_mask
        neg_diff = result * neg_mask
        eps = 1e-5
        loss = (jnp.sum(pos_diff ** 2) / (jnp.sum(pos_mask) + eps)
                + jnp.sum(neg_diff ** 2) / (jnp.sum(neg_mask) + eps))
        aux = (logits, jnp.max(jnp.abs(pos_diff)), jnp.max(jnp.abs(neg_diff)),
               result)
        return loss + reg, aux

    def _clicks_maps(self, clicks_lists, shape, radius=1):
        h, w = shape
        pos = np.zeros((len(clicks_lists), h, w, 1), np.float32)
        neg = np.zeros((len(clicks_lists), h, w, 1), np.float32)
        for li, clicks in enumerate(clicks_lists):
            for c in clicks:
                y, x = int(round(c.coords[0])), int(round(c.coords[1]))
                y1, x1 = max(y - radius, 0), max(x - radius, 0)
                tgt = pos if c.is_positive else neg
                tgt[li, y1:y + radius + 1, x1:x + radius + 1, 0] = 1
        return jnp.asarray(pos), jnp.asarray(neg)

    def set_input_image(self, image):
        super().set_input_image(image)
        self.opt_data = None
        self.input_data = None

    def _get_prediction(self, image, clicks_lists, is_image_changed):
        from scipy.optimize import fmin_l_bfgs_b

        num_clicks = len(clicks_lists[0])
        pos_mask, neg_mask = self._clicks_maps(clicks_lists, image.shape[1:3])
        if self.with_flip:
            n = pos_mask.shape[0] // 2 or 1
            pos_mask, neg_mask = pos_mask[:n], neg_mask[:n]

        if self.opt_data is None:
            self.opt_data = np.zeros((2 * self.num_channels,), np.float32)

        if (num_clicks <= (self.net_clicks_limit or num_clicks)
                or is_image_changed or self.input_data is None):
            coord = compute_coord_features(image, self._limited(clicks_lists))
            self.input_data = self._head_input(self.params, image, coord)

        out_hw = tuple(image.shape[1:3])
        best = {'loss': None, 'logits': None}
        last_mask = {'m': None}

        def func(x):
            (loss, aux), grad = self._loss_and_grad(
                jnp.asarray(x, jnp.float32), self.input_data, pos_mask,
                neg_mask, out_hw)
            logits, f_max_pos, f_max_neg, result = aux
            f_val = float(loss)
            if best['loss'] is None or f_val < best['loss']:
                best['loss'] = f_val
                best['logits'] = logits
            # early exits (brs_functors.py:63-73)
            if (float(f_max_pos) < (1 - self.prob_thresh)
                    and float(f_max_neg) < self.prob_thresh):
                return f_val, np.zeros_like(x)
            cur = np.asarray(result) > self.prob_thresh
            if last_mask['m'] is not None and self.min_iou_diff > 0:
                inter = np.logical_and(cur, last_mask['m']).sum()
                union = np.logical_or(cur, last_mask['m']).sum()
                if union > 0 and inter / union > 1 - self.min_iou_diff:
                    return f_val, np.zeros_like(x)
            last_mask['m'] = cur
            return f_val, np.asarray(grad, np.float64)

        if num_clicks > self.optimize_after_n_clicks:
            result = fmin_l_bfgs_b(func=func, x0=self.opt_data.astype(np.float64),
                                   m=self.lbfgs_params['m'],
                                   factr=self.lbfgs_params['factr'],
                                   pgtol=self.lbfgs_params['pgtol'],
                                   maxfun=self.lbfgs_params['maxfun'],
                                   maxiter=self.lbfgs_params['maxiter'])
            self.opt_data = result[0].astype(np.float32)

        if best['logits'] is not None:
            return best['logits']
        (_, aux), _ = self._loss_and_grad(
            jnp.asarray(self.opt_data), self.input_data, pos_mask, neg_mask,
            out_hw)
        return aux[0]

    def get_states(self):
        return {'transform_states': [t.get_state() for t in self.transforms],
                'opt_data': None if self.opt_data is None else self.opt_data.copy()}

    def set_states(self, states):
        for state, t in zip(states['transform_states'], self.transforms):
            t.set_state(state)
        self.opt_data = states['opt_data']


def get_predictor(params, brs_mode='f-BRS-B', prob_thresh=0.49, with_flip=True,
                  zoom_in_params=None, predictor_params=None,
                  brs_opt_func_params=None, lbfgs_params=None,
                  dtype=jnp.float32):
    """Predictor factory (reference predictors/__init__.py:8-70; NoBRS and
    f-BRS-B supported — the shipped fbrs.pth is a resnet50 f-BRS-B model)."""
    zoom_in = ZoomIn(**(zoom_in_params or {}))
    pp = dict(predictor_params or {})
    max_size = pp.pop('max_size', None)
    if brs_mode == 'NoBRS':
        return BasePredictor(params, zoom_in=zoom_in, with_flip=with_flip,
                             max_size=max_size, dtype=dtype, **pp)
    if brs_mode != 'f-BRS-B':
        raise NotImplementedError(
            f'brs_mode {brs_mode} not supported (f-BRS-B / NoBRS only)')
    opt = dict(brs_opt_func_params or {})
    return FeatureBRSPredictor(
        params, with_flip=with_flip, zoom_in=zoom_in, max_size=max_size,
        prob_thresh=prob_thresh, lbfgs_params=lbfgs_params, dtype=dtype,
        net_clicks_limit=pp.pop('net_clicks_limit', 8),
        min_iou_diff=opt.get('min_iou_diff', 1e-3), **pp)
