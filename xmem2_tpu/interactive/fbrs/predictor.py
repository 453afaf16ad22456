"""fBRS predictors: base (transform pipeline), f-BRS-A/B/C feature
refinement for both backbones, and input BRS (RGB-BRS / DistMap-BRS).

Behavioral parity targets: fbrs/inference/predictors/base.py (BasePredictor),
brs.py:54-141 (FeatureBRSPredictor, insertion after_c4/after_aspp/
after_deeplab), brs.py:143-226 (HRNetFeatureBRSPredictor, insertion A/C),
brs.py:228-280 (InputBRSPredictor, optimize_target rgb/dmaps/all),
brs_functors.py (ScaleBiasOptimizer/InputOptimizer with early-exit rules,
scale_act, flip_average), brs_losses.py (BRSMaskLoss), and
predictors/__init__.py:8-95 (mode dispatch, L-BFGS m=20 factr=0 pgtol=1e-8
maxfun=20, net_clicks_limit 8 for f-BRS / 5 for input BRS).

The torch autograd inner loop becomes one jitted jax.value_and_grad of the
opt-variables -> BRS loss function; scipy's fmin_l_bfgs_b drives it, as in
the reference.
"""

from functools import partial
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from xmem2_tpu.interactive.clicks.dist_maps import (
    Click, encode_dist, get_dist_maps_native)
from xmem2_tpu.interactive.fbrs import hrnet as HR
from xmem2_tpu.interactive.fbrs import model as M
from xmem2_tpu.interactive.fbrs.transforms import (
    AddHorizontalFlip, LimitLongestSide, SigmoidForPred, ZoomIn)
from xmem2_tpu.nn.functional import resize_bilinear

NORM_RADIUS = 260


def is_hrnet_params(params) -> bool:
    return 'stage2' in params.get('feature_extractor', {})


def hrnet_is_small(params) -> bool:
    """small HRNet has 2 layer1 bottlenecks, big has 4 (hrnet_ocr.py:170)."""
    return len(params['feature_extractor']['layer1']) == 2


def hrnet_width(params) -> int:
    return int(params['feature_extractor']['stage2']['0']['branches']['0']
               ['0']['conv1']['weight'].shape[-1])


def hrnet_ocr_mid_channels(params) -> int:
    return int(params['feature_extractor']['conv3x3_ocr']['0']
               ['weight'].shape[-1])


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
                 zoom_in=None, max_size=None, dtype=jnp.float32, **kwargs):
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

        if is_hrnet_params(params):
            self._forward = jax.jit(partial(
                HR.forward, small=hrnet_is_small(params), dtype=dtype))
        else:
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


class BRSBasePredictor(BasePredictor):
    """Common BRS machinery: click maps, the BRS mask loss with early exits,
    and the scipy L-BFGS driver (reference BRSBasePredictor + BaseOptimizer,
    brs.py:10-52 + brs_functors.py:8-85)."""

    def __init__(self, params, optimize_after_n_clicks=1, prob_thresh=0.49,
                 reg_weight=1e-3, min_iou_diff=0.01, flip_average=False,
                 lbfgs_params=None, **kwargs):
        super().__init__(params, **kwargs)
        self.optimize_after_n_clicks = optimize_after_n_clicks
        self.prob_thresh = prob_thresh
        self.reg_weight = reg_weight
        self.min_iou_diff = min_iou_diff
        self.flip_average = flip_average
        self.lbfgs_params = {'m': 20, 'factr': 0, 'pgtol': 1e-8, 'maxfun': 20}
        if lbfgs_params:
            self.lbfgs_params.update(lbfgs_params)
        self.lbfgs_params['maxiter'] = 2 * self.lbfgs_params['maxfun']

        self.opt_data = None
        self.input_data = None
        self._loss_and_grad = jax.jit(
            jax.value_and_grad(self._brs_loss, argnums=0, has_aux=True),
            static_argnums=(4,))  # out_hw is a static shape

    def set_input_image(self, image):
        super().set_input_image(image)
        self.opt_data = None
        self.input_data = None

    # -- subclass contract ---------------------------------------------------
    def _predict_with_opt(self, opt_params, input_data, out_hw):
        """(logits at out_hw, regularization loss) from the optimization
        variables. Pure — runs under jit/grad."""
        raise NotImplementedError

    def _get_head_input(self, image, clicks_lists):
        raise NotImplementedError

    # -- loss (BRSMaskLoss + reg, brs_losses.py:6-26) -------------------------
    def _brs_loss(self, opt_params, input_data, pos_mask, neg_mask, out_hw):
        logits, reg = self._predict_with_opt(opt_params, input_data, out_hw)
        result = jax.nn.sigmoid(logits)
        if self.with_flip and self.flip_average:
            n = result.shape[0] // 2
            result = 0.5 * (result[:n] + result[n:, :, ::-1])
            pos_mask, neg_mask = pos_mask[:n], neg_mask[:n]

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

    # -- the L-BFGS driver (BaseOptimizer.__call__, brs_functors.py:41-78) ----
    def _optimize(self, x0, input_data, pos_mask, neg_mask, out_hw,
                  num_clicks):
        from scipy.optimize import fmin_l_bfgs_b

        best = {'loss': None, 'logits': None}
        last_mask = {'m': None}

        def func(x):
            (loss, aux), grad = self._loss_and_grad(
                jnp.asarray(x, jnp.float32), input_data, pos_mask, neg_mask,
                out_hw)
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
            return f_val, np.asarray(grad, np.float64).ravel()

        opt_vec = None
        if num_clicks > self.optimize_after_n_clicks:
            result = fmin_l_bfgs_b(func=func, x0=x0.astype(np.float64),
                                   m=self.lbfgs_params['m'],
                                   factr=self.lbfgs_params['factr'],
                                   pgtol=self.lbfgs_params['pgtol'],
                                   maxfun=self.lbfgs_params['maxfun'],
                                   maxiter=self.lbfgs_params['maxiter'])
            opt_vec = result[0].astype(np.float32)

        if best['logits'] is not None:
            return best['logits'], opt_vec
        (_, aux), _ = self._loss_and_grad(
            jnp.asarray(x0, jnp.float32), input_data, pos_mask, neg_mask,
            out_hw)
        return aux[0], opt_vec

    def get_states(self):
        return {'transform_states': [t.get_state() for t in self.transforms],
                'opt_data': None if self.opt_data is None else self.opt_data.copy()}

    def set_states(self, states):
        for state, t in zip(states['transform_states'], self.transforms):
            t.set_state(state)
        self.opt_data = states['opt_data']


class ScaleBiasBRSPredictor(BRSBasePredictor):
    """Shared scale/bias BRS flow for both backbones (reference
    FeatureBRSPredictor/HRNetFeatureBRSPredictor bodies are line-for-line
    parallel, brs.py:54-226; the differences are the insertion points)."""

    def __init__(self, params, scale_act=None, reg_bias_weight=10.0, **kwargs):
        super().__init__(params, **kwargs)
        self.scale_act = scale_act
        self.reg_bias_weight = reg_bias_weight
        self.num_channels = None   # set by subclass

    def _unpack_scale_bias(self, opt_params):
        """ScaleBiasOptimizer.unpack_opt_params (brs_functors.py:96-109)."""
        c = self.num_channels
        scale = opt_params[:c]
        bias = opt_params[c:]
        reg = self.reg_weight * (jnp.sum(scale ** 2)
                                 + self.reg_bias_weight * jnp.sum(bias ** 2))
        if self.scale_act == 'tanh':
            scale = jnp.tanh(scale)
        elif self.scale_act == 'sin':
            scale = jnp.sin(scale)
        return 1.0 + scale, bias, reg

    def _get_prediction(self, image, clicks_lists, is_image_changed):
        num_clicks = len(clicks_lists[0])
        pos_mask, neg_mask = self._clicks_maps(clicks_lists, image.shape[1:3])

        if self.opt_data is None:
            self.opt_data = np.zeros((2 * self.num_channels,), np.float32)

        if (num_clicks <= (self.net_clicks_limit or num_clicks)
                or is_image_changed or self.input_data is None):
            coord = compute_coord_features(image, self._limited(clicks_lists))
            self.input_data = self._get_head_input(image, coord)

        logits, opt_vec = self._optimize(
            self.opt_data, self.input_data, pos_mask, neg_mask,
            tuple(image.shape[1:3]), num_clicks)
        if opt_vec is not None:
            self.opt_data = opt_vec
        return logits


class FeatureBRSPredictor(ScaleBiasBRSPredictor):
    """f-BRS on the DeepLabV3+ backbone (reference brs.py:54-141):
      after_c4 (f-BRS-A) / after_aspp (f-BRS-B) / after_deeplab (f-BRS-C)."""

    def __init__(self, params, insertion_mode='after_deeplab', **kwargs):
        super().__init__(params, **kwargs)
        self.insertion_mode = insertion_mode
        ch = M.num_deeplab_channels(params)
        if insertion_mode == 'after_deeplab':
            self.num_channels = ch
        elif insertion_mode == 'after_c4':
            self.num_channels = M.num_c4_channels(params)
        elif insertion_mode == 'after_aspp':
            self.num_channels = ch + 32
        else:
            raise NotImplementedError(insertion_mode)
        self._head_input = jax.jit(
            partial(self._head_input_fn, mode=insertion_mode,
                    dtype=self.dtype))

    @staticmethod
    def _head_input_fn(params, image, coord, mode, dtype=None):
        """reference _get_head_input (brs.py:121-141). Returns a dict so the
        after_c4 case can carry the frozen c1 skip features alongside."""
        x = M.rgb_with_clicks(params, image, coord, dtype=dtype)
        if mode == 'after_c4':
            c1, c4 = M.backbone_features(params, x, dtype=dtype)
            return {'feats': c4, 'c1': c1}
        feats = M.head_input(params, x, dtype=dtype)
        if mode == 'after_deeplab':
            feats = M.deeplab_head(params, feats, dtype=dtype)
        return {'feats': feats}

    def _get_head_input(self, image, coord):
        return self._head_input(self.params, image, coord)

    def _predict_with_opt(self, opt_params, input_data, out_hw):
        scale, bias, reg = self._unpack_scale_bias(opt_params)
        scaled = input_data['feats'] * scale[None, None, None, :] + bias
        if self.insertion_mode == 'after_c4':
            x = M.aspp_concat(self.params, scaled, input_data['c1'],
                              dtype=self.dtype)
            x = M.deeplab_head(self.params, x, dtype=self.dtype)
        elif self.insertion_mode == 'after_aspp':
            x = M.deeplab_head(self.params, scaled, dtype=self.dtype)
        else:
            x = scaled
        return M.logits_from_deeplab(self.params, x, out_hw,
                                     dtype=self.dtype), reg


class HRNetFeatureBRSPredictor(ScaleBiasBRSPredictor):
    """f-BRS on the HRNet+OCR backbone (reference brs.py:143-226):
      'A' scales the stitched HRNet features, 'C' the OCR output."""

    def __init__(self, params, insertion_mode='A', **kwargs):
        super().__init__(params, **kwargs)
        self.insertion_mode = insertion_mode
        self.small = hrnet_is_small(params)
        width = hrnet_width(params)
        if insertion_mode == 'A':
            self.num_channels = sum(k * width for k in (1, 2, 4, 8))
        elif insertion_mode == 'C':
            self.num_channels = hrnet_ocr_mid_channels(params)
        else:
            raise NotImplementedError(insertion_mode)
        self._head_input = jax.jit(
            partial(self._head_input_fn, mode=insertion_mode,
                    small=self.small, dtype=self.dtype))

    @staticmethod
    def _head_input_fn(params, image, coord, mode, small, dtype=None):
        """reference brs.py:209-226."""
        x = M.rgb_with_clicks(params, image, coord, dtype=dtype)
        fe = params['feature_extractor']
        feats = HR.compute_hrnet_feats(fe, x, small=small, dtype=dtype)
        if mode == 'C':
            out_aux = HR.aux_head(fe, feats, dtype=dtype)
            f = HR.conv3x3_ocr(fe, feats, dtype=dtype)
            context = HR.spatial_gather(f, out_aux)
            feats = HR.ocr_distri_head(fe, f, context, dtype=dtype)
        return {'feats': feats}

    def _get_head_input(self, image, coord):
        return self._head_input(self.params, image, coord)

    def _predict_with_opt(self, opt_params, input_data, out_hw):
        scale, bias, reg = self._unpack_scale_bias(opt_params)
        scaled = input_data['feats'] * scale[None, None, None, :] + bias
        fe = self.params['feature_extractor']
        if self.insertion_mode == 'A':
            out_aux = HR.aux_head(fe, scaled, dtype=self.dtype)
            f = HR.conv3x3_ocr(fe, scaled, dtype=self.dtype)
            context = HR.spatial_gather(f, out_aux)
            f = HR.ocr_distri_head(fe, f, context, dtype=self.dtype)
            logits = HR.cls_head(fe, f, dtype=self.dtype)
        else:
            logits = HR.cls_head(fe, scaled, dtype=self.dtype)
        logits = resize_bilinear(logits.astype(jnp.float32), tuple(out_hw),
                                 align_corners=True)
        return logits, reg


class InputBRSPredictor(BRSBasePredictor):
    """RGB-BRS / DistMap-BRS: optimize an image-shaped bias on the network
    input (reference brs.py:228-280 + InputOptimizer brs_functors.py:88-96).
    optimize_target: 'rgb', 'dmaps', or 'all' (rgb_conv output)."""

    def __init__(self, params, optimize_target='rgb', **kwargs):
        super().__init__(params, **kwargs)
        self.optimize_target = optimize_target
        self.hrnet = is_hrnet_params(params)
        self.small = hrnet_is_small(params) if self.hrnet else False
        self._opt_shape = None

    def _get_prediction(self, image, clicks_lists, is_image_changed):
        num_clicks = len(clicks_lists[0])
        pos_mask, neg_mask = self._clicks_maps(clicks_lists, image.shape[1:3])

        bs = image.shape[0] // 2 if self.with_flip else image.shape[0]
        opt_channels = 2 if self.optimize_target == 'dmaps' else 3
        shape = (bs, image.shape[1], image.shape[2], opt_channels)
        if self.opt_data is None or is_image_changed or self._opt_shape != shape:
            self.opt_data = np.zeros(shape, np.float32).ravel()
            self._opt_shape = shape

        # dist maps depend only on click coords (constant w.r.t. the bias)
        coord = compute_coord_features(image, self._limited(clicks_lists))
        input_data = {'image': image.astype(jnp.float32), 'dmaps': coord}

        logits, opt_vec = self._optimize(
            self.opt_data, input_data, pos_mask, neg_mask,
            tuple(image.shape[1:3]), num_clicks)
        if opt_vec is not None:
            self.opt_data = opt_vec
        return logits

    def _predict_with_opt(self, opt_params, input_data, out_hw):
        opt = opt_params.reshape(self._opt_shape)
        reg = self.reg_weight * jnp.sum(opt ** 2)
        if self.with_flip:
            opt = jnp.concatenate([opt, opt[:, :, ::-1]], axis=0)

        image, dmaps = input_data['image'], input_data['dmaps']
        if self.optimize_target == 'rgb':
            image = image + opt
        if self.optimize_target == 'dmaps':
            dmaps = dmaps + opt

        x = M.rgb_with_clicks(self.params, image, dmaps, dtype=self.dtype)
        if self.optimize_target == 'all':
            x = x + opt

        if self.hrnet:
            logits, _ = HR.hrnet_forward(self.params['feature_extractor'], x,
                                         small=self.small, dtype=self.dtype)
        else:
            feats = M.head_input(self.params, x, dtype=self.dtype)
            feats = M.deeplab_head(self.params, feats, dtype=self.dtype)
            logits = M.logits_from_deeplab(self.params, feats,
                                           x.shape[1:3], dtype=self.dtype)
        logits = resize_bilinear(logits.astype(jnp.float32), tuple(out_hw),
                                 align_corners=True)
        return logits, reg


def get_predictor(params, brs_mode='f-BRS-B', prob_thresh=0.49, with_flip=True,
                  zoom_in_params=None, predictor_params=None,
                  brs_opt_func_params=None, lbfgs_params=None,
                  dtype=jnp.float32):
    """Predictor factory (reference predictors/__init__.py:8-95)."""
    zoom_in = (ZoomIn(**zoom_in_params) if zoom_in_params is not None
               else ZoomIn())
    pp = dict(predictor_params or {})
    opt = dict(brs_opt_func_params or {})
    max_size = pp.pop('max_size', None)
    common = dict(with_flip=with_flip, zoom_in=zoom_in, max_size=max_size,
                  dtype=dtype)

    if brs_mode == 'NoBRS':
        return BasePredictor(params, **common, **pp)

    brs_common = dict(prob_thresh=prob_thresh, lbfgs_params=lbfgs_params,
                      **common, **opt)

    if brs_mode.startswith('f-BRS'):
        insertion_mode = {
            'f-BRS-A': 'after_c4',
            'f-BRS-B': 'after_aspp',
            'f-BRS-C': 'after_deeplab',
        }[brs_mode]
        net_clicks_limit = pp.pop('net_clicks_limit', 8)
        if is_hrnet_params(params):
            insertion_mode = {'after_c4': 'A', 'after_aspp': 'A',
                              'after_deeplab': 'C'}[insertion_mode]
            cls = HRNetFeatureBRSPredictor
        else:
            cls = FeatureBRSPredictor
        return cls(params, insertion_mode=insertion_mode,
                   net_clicks_limit=net_clicks_limit, **brs_common, **pp)

    if brs_mode in ('RGB-BRS', 'DistMap-BRS'):
        return InputBRSPredictor(
            params,
            optimize_target='dmaps' if brs_mode == 'DistMap-BRS' else 'rgb',
            net_clicks_limit=pp.pop('net_clicks_limit', 5),
            **brs_common, **pp)

    raise NotImplementedError(f'unknown brs_mode {brs_mode!r}')
