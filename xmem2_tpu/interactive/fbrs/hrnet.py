"""fBRS HRNet+OCR interactive-segmentation backbone (functional JAX, NHWC).

Behavioral parity targets in the reference repo:
  - HighResolutionNet (stem, layer1, 4-branch stages with transitions and
    multi-scale fusion, final upsample+concat): fbrs/model/modeling/
    hrnet_ocr.py:157-345
  - HighResolutionModule fusion rules: hrnet_ocr.py:88-155
  - BasicBlockV1b / BottleneckV1b: fbrs/model/modeling/resnetv1b.py:6-80
  - SpatialGather / SpatialOCR / ObjectAttentionBlock2D: fbrs/model/modeling/
    ocr.py (softmax-weighted class context, query/key/value 1x1 towers)
  - DistMapsHRNetModel wrapper: fbrs/model/is_hrnet_model.py:24-66

Structure notes that pin the parameter tree layout (torch Sequential
indices preserved as string keys, converted by model.load_fbrs_params):
  * stage transitions wrap downsampling convs in nested Sequentials, so a
    new-branch transition conv lives at  transition1.1.0.0  (outer list idx,
    Sequential idx, inner Sequential idx).
  * OCR conv towers interleave  Sequential(norm, relu)  at odd indices, so
    f_pixel BNs live at f_pixel.1.0 / f_pixel.3.0.
All interpolations use align_corners=True, as in the reference.
"""

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from xmem2_tpu.nn import functional as F


def _bn_relu(x, p_bn):
    return F.relu(F.batch_norm(x, p_bn))


def _basic_block(x, p, dtype=None):
    """BasicBlockV1b, stride/dilation 1 (resnetv1b.py:6-40)."""
    residual = x
    out = _bn_relu(F.conv2d(x, p['conv1'], padding=1, dtype=dtype), p['bn1'])
    out = F.batch_norm(F.conv2d(out, p['conv2'], padding=1, dtype=dtype),
                       p['bn2'])
    if 'downsample' in p:
        residual = F.batch_norm(
            F.conv2d(x, p['downsample']['0'], dtype=dtype),
            p['downsample']['1'])
    return F.relu(out + residual)


def _bottleneck(x, p, dtype=None):
    """BottleneckV1b, stride/dilation 1 (resnetv1b.py:43-80)."""
    residual = x
    out = _bn_relu(F.conv2d(x, p['conv1'], dtype=dtype), p['bn1'])
    out = _bn_relu(F.conv2d(out, p['conv2'], padding=1, dtype=dtype), p['bn2'])
    out = F.batch_norm(F.conv2d(out, p['conv3'], dtype=dtype), p['bn3'])
    if 'downsample' in p:
        residual = F.batch_norm(
            F.conv2d(x, p['downsample']['0'], dtype=dtype),
            p['downsample']['1'])
    return F.relu(out + residual)


def _conv_bn_relu_seq(x, p, stride=1, padding=0, relu=True, dtype=None):
    """Sequential(conv, bn[, relu]) with torch indices '0', '1'."""
    x = F.batch_norm(F.conv2d(x, p['0'], stride=stride, padding=padding,
                              dtype=dtype), p['1'])
    return F.relu(x) if relu else x


def _transition(x_list, p_trans, n_pre: int, n_cur: int, dtype=None):
    """_make_transition_layer forward (hrnet_ocr.py:239-271 + usage
    :307-330): same-branch 3x3 channel-change conv (or passthrough), new
    branches stride-2 chains from the last pre-branch."""
    out = []
    for i in range(n_cur):
        key = str(i)
        if i < n_pre:
            if p_trans is not None and key in p_trans:
                out.append(_conv_bn_relu_seq(x_list[i], p_trans[key],
                                             padding=1, dtype=dtype))
            else:
                out.append(x_list[i])
        else:
            x = x_list[-1]
            chain = p_trans[key]
            for j in sorted(chain.keys(), key=int):
                x = _conv_bn_relu_seq(x, chain[j], stride=2, padding=1,
                                      dtype=dtype)
            out.append(x)
    return out


def _hr_module(x_list, p, num_branches: int, num_blocks: int, dtype=None):
    """HighResolutionModule.forward (hrnet_ocr.py:129-155): per-branch basic
    blocks, then full multi-scale fusion."""
    if num_branches == 1:
        x = x_list[0]
        for b in range(num_blocks):
            x = _basic_block(x, p['branches']['0'][str(b)], dtype=dtype)
        return [x]

    xs = []
    for i in range(num_branches):
        x = x_list[i]
        for b in range(num_blocks):
            x = _basic_block(x, p['branches'][str(i)][str(b)], dtype=dtype)
        xs.append(x)

    fuse = p['fuse_layers']
    out = []
    for i in range(num_branches):
        y = None
        for j in range(num_branches):
            if j == i:
                t = xs[j]
            elif j > i:
                # 1x1 conv + bn, then upsample to branch i's resolution
                t = _conv_bn_relu_seq(xs[j], fuse[str(i)][str(j)], relu=False,
                                      dtype=dtype)
                t = F.resize_bilinear(t, xs[i].shape[1:3], align_corners=True)
            else:
                # chain of stride-2 convs; all but the last have relu
                t = xs[j]
                chain = fuse[str(i)][str(j)]
                ks = sorted(chain.keys(), key=int)
                for k in ks:
                    t = _conv_bn_relu_seq(t, chain[k], stride=2, padding=1,
                                          relu=(k != ks[-1]), dtype=dtype)
            y = t if y is None else y + t
        out.append(F.relu(y))
    return out


def _arch(small: bool) -> Dict:
    """Module/block counts (hrnet_ocr.py:170-205)."""
    nb = 2 if small else 4
    return {
        'num_blocks': nb,
        'stage2_modules': 1, 'stage3_modules': 3 if small else 4,
        'stage4_modules': 2 if small else 3,
    }


def compute_hrnet_feats(params: Dict, x: jnp.ndarray, small: bool = False,
                        dtype=None) -> jnp.ndarray:
    """Stem -> layer1 -> stages 2..4 -> upsample+concat (hrnet_ocr.py:347-394).
    x: rgb_conv output [B, H, W, 3]. Returns [B, H/4, W/4, 15*width]."""
    a = _arch(small)
    nb = a['num_blocks']

    x = _bn_relu(F.conv2d(x, params['conv1'], stride=2, padding=1,
                          dtype=dtype), params['bn1'])
    x = _bn_relu(F.conv2d(x, params['conv2'], stride=2, padding=1,
                          dtype=dtype), params['bn2'])
    for b in range(nb):
        x = _bottleneck(x, params['layer1'][str(b)], dtype=dtype)

    xs = _transition([x], params.get('transition1'), 1, 2, dtype=dtype)
    for m in range(a['stage2_modules']):
        xs = _hr_module(xs, params['stage2'][str(m)], 2, nb, dtype=dtype)

    xs = _transition(xs, params.get('transition2'), 2, 3, dtype=dtype)
    for m in range(a['stage3_modules']):
        xs = _hr_module(xs, params['stage3'][str(m)], 3, nb, dtype=dtype)

    xs = _transition(xs, params.get('transition3'), 3, 4, dtype=dtype)
    for m in range(a['stage4_modules']):
        xs = _hr_module(xs, params['stage4'][str(m)], 4, nb, dtype=dtype)

    hw = xs[0].shape[1:3]
    ups = [xs[0]] + [F.resize_bilinear(t, hw, align_corners=True)
                     for t in xs[1:]]
    return jnp.concatenate(ups, axis=-1)


def aux_head(params: Dict, feats: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """Sequential(conv1x1, bn, relu, conv1x1+bias) (hrnet_ocr.py:230-237)."""
    p = params['aux_head']
    x = _bn_relu(F.conv2d(feats, p['0'], dtype=dtype), p['1'])
    return F.conv2d(x, p['3'], dtype=dtype)


def conv3x3_ocr(params: Dict, feats: jnp.ndarray, dtype=None) -> jnp.ndarray:
    p = params['conv3x3_ocr']
    return _bn_relu(F.conv2d(feats, p['0'], padding=1, dtype=dtype), p['1'])


def spatial_gather(feats: jnp.ndarray, probs: jnp.ndarray,
                   scale: float = 1.0) -> jnp.ndarray:
    """SpatialGather_Module (ocr.py:7-27): per-class softmax over space,
    context[k] = sum_p softmax(probs)[k,p] * feats[p].
    feats [B, H, W, C]; probs [B, H, W, K] -> [B, K, C]."""
    b, h, w, c = feats.shape
    k = probs.shape[-1]
    pr = jax.nn.softmax(scale * probs.reshape(b, h * w, k), axis=1)  # over HW
    f = feats.reshape(b, h * w, c)
    return jnp.einsum('bpk,bpc->bkc', pr, f,
                      precision=jax.lax.Precision.HIGHEST)


def _conv_tower(x, p, n_convs: int, dtype=None):
    """OCR 1x1 conv tower: conv at even indices, Sequential(bn, relu) at odd
    (ocr.py:92-117)."""
    for i in range(n_convs):
        x = F.conv2d(x, p[str(2 * i)], dtype=dtype)
        x = _bn_relu(x, p[str(2 * i + 1)]['0'])
    return x


def ocr_distri_head(params: Dict, feats: jnp.ndarray, context: jnp.ndarray,
                    dtype=None) -> jnp.ndarray:
    """SpatialOCR_Module (ocr.py:30-61 + ObjectAttentionBlock2D :64-143).
    feats [B, H, W, C]; context [B, K, C] -> [B, H, W, C]."""
    p = params['ocr_distri_head']
    ob = p['object_context_block']
    b, h, w, c = feats.shape
    k = context.shape[1]
    proxy = context[:, :, None, :].reshape(b, k, 1, c)  # [B, K(h), 1(w), C]

    query = _conv_tower(feats, ob['f_pixel'], 2, dtype=dtype)     # [B,H,W,kc]
    key = _conv_tower(proxy, ob['f_object'], 2, dtype=dtype)      # [B,K,1,kc]
    value = _conv_tower(proxy, ob['f_down'], 1, dtype=dtype)      # [B,K,1,kc]
    kc = query.shape[-1]

    q = query.reshape(b, h * w, kc)
    kk = key.reshape(b, k, kc)
    v = value.reshape(b, k, kc)
    sim = jnp.einsum('bpc,bkc->bpk', q, kk,
                     precision=jax.lax.Precision.HIGHEST) * (kc ** -0.5)
    sim = jax.nn.softmax(sim, axis=-1)
    ctx = jnp.einsum('bpk,bkc->bpc', sim, v,
                     precision=jax.lax.Precision.HIGHEST)
    ctx = ctx.reshape(b, h, w, kc)
    ctx = _conv_tower(ctx, ob['f_up'], 1, dtype=dtype)            # [B,H,W,C]

    out = jnp.concatenate([ctx, feats], axis=-1)
    cbd = p['conv_bn_dropout']
    return _bn_relu(F.conv2d(out, cbd['0'], dtype=dtype), cbd['1']['0'])


def cls_head(params: Dict, feats: jnp.ndarray, dtype=None) -> jnp.ndarray:
    return F.conv2d(feats, params['cls_head'], dtype=dtype)


def hrnet_forward(params: Dict, x: jnp.ndarray, small: bool = False,
                  dtype=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """HighResolutionNet.forward (hrnet_ocr.py:335-345): returns
    (out, out_aux) logits at 1/4 resolution."""
    feats = compute_hrnet_feats(params, x, small=small, dtype=dtype)
    out_aux = aux_head(params, feats, dtype=dtype)
    f = conv3x3_ocr(params, feats, dtype=dtype)
    context = spatial_gather(f, out_aux)
    f = ocr_distri_head(params, f, context, dtype=dtype)
    return cls_head(params, f, dtype=dtype), out_aux


def forward(params: Dict, image: jnp.ndarray, coord_features: jnp.ndarray,
            small: bool = False, dtype=None) -> jnp.ndarray:
    """DistMapsHRNetModel.forward (is_hrnet_model.py:44-66): rgb_conv over
    [image|dist maps], HRNet+OCR, upsample to the input size."""
    from xmem2_tpu.interactive.fbrs.model import rgb_with_clicks
    x = rgb_with_clicks(params, image, coord_features, dtype=dtype)
    out, _ = hrnet_forward(params['feature_extractor'], x, small=small,
                           dtype=dtype)
    return F.resize_bilinear(out.astype(jnp.float32), image.shape[1:3],
                             align_corners=True)
