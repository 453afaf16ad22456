"""fBRS click-to-mask model: DistMapsModel with a dilated (output-stride-8)
ResNet-50-v1s DeepLabV3+ and a separable-conv head.

Behavioral parity targets in the reference repo:
  - DistMapsModel (rgb_conv 5->8->3, dist maps, feature extractor, head):
    fbrs/model/is_deeplab_model.py:30-78
  - DeepLabV3Plus (skip_project, ASPP rates 12/24/36, _DeepLabHead of two
    separable convs): fbrs/model/modeling/deeplab_v3.py
  - ResNet-50-v1s: deep 3-conv stem, layer3 dilation 2, layer4 dilation 4
    (fbrs/model/modeling/resnetv1b.py:114-196)
  - SepConvHead: fbrs/model/modeling/basic_blocks.py:27-54
All interpolations here use align_corners=True, as in the reference.

The forward is split into `head_input` (image+clicks -> 'after_aspp'
features) and `head_from_features` (features -> logits) so f-BRS-B can
optimize scale/bias on the intermediate features (predictor.py).
"""

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from xmem2_tpu.nn import functional as F


def _bn_relu(x, p_bn):
    return F.relu(F.batch_norm(x, p_bn))


def _bottleneck_v1b(x, p, stride=1, dilation=1, dtype=None):
    residual = x
    out = _bn_relu(F.conv2d(x, p['conv1'], dtype=dtype), p['bn1'])
    out = _bn_relu(F.conv2d(out, p['conv2'], stride=stride, padding=dilation,
                            dilation=dilation, dtype=dtype), p['bn2'])
    out = F.batch_norm(F.conv2d(out, p['conv3'], dtype=dtype), p['bn3'])
    if 'downsample' in p:
        residual = F.batch_norm(
            F.conv2d(x, p['downsample']['0'], stride=stride, dtype=dtype),
            p['downsample']['1'])
    return F.relu(out + residual)


def _layer_v1b(x, p, blocks, stride=1, dilation=1, dtype=None):
    """resnetv1b._make_layer: first block dilation = 1 (dilation<=2) or
    dilation//2 (dilation 4); remaining blocks use `dilation`."""
    first_dil = 1 if dilation in (1, 2) else dilation // 2
    x = _bottleneck_v1b(x, p['0'], stride=stride, dilation=first_dil, dtype=dtype)
    for i in range(1, blocks):
        x = _bottleneck_v1b(x, p[str(i)], dilation=dilation, dtype=dtype)
    return x


def _backbone_v1s(x, p, dtype=None):
    """Deep-stem dilated ResNet-50 (output stride 8). Returns (c1, c4)."""
    s = p['conv1']
    x = _bn_relu(F.conv2d(x, s['0'], stride=2, padding=1, dtype=dtype), s['1'])
    x = _bn_relu(F.conv2d(x, s['3'], padding=1, dtype=dtype), s['4'])
    x = F.conv2d(x, s['6'], padding=1, dtype=dtype)
    x = _bn_relu(x, p['bn1'])
    x = F.max_pool(x, 3, 2, 1)
    c1 = _layer_v1b(x, p['layer1'], 3, dtype=dtype)
    c2 = _layer_v1b(c1, p['layer2'], 4, stride=2, dtype=dtype)
    c3 = _layer_v1b(c2, p['layer3'], 6, stride=1, dilation=2, dtype=dtype)
    c4 = _layer_v1b(c3, p['layer4'], 3, stride=1, dilation=4, dtype=dtype)
    return c1, c4


def _sep_conv(x, p, padding=1, dtype=None):
    """SeparableConv2d: depthwise + pointwise + BN + relu
    (basic_blocks.py:57-73; body.0 dw, body.1 pw, body.2 bn)."""
    cin = x.shape[-1]
    x = F.conv2d(x, p['body']['0'], padding=padding, groups=cin, dtype=dtype)
    x = F.conv2d(x, p['body']['1'], dtype=dtype)
    return _bn_relu(x, p['body']['2'])


def _aspp(x, p, rates=(12, 24, 36), dtype=None):
    """_ASPP (deeplab_v3.py:115-147); dropout is identity at inference."""
    outs = [_bn_relu(F.conv2d(x, p['concurent']['0']['0'], dtype=dtype),
                     p['concurent']['0']['1'])]
    for i, r in enumerate(rates, start=1):
        outs.append(_bn_relu(
            F.conv2d(x, p['concurent'][str(i)]['0'], padding=r, dilation=r,
                     dtype=dtype),
            p['concurent'][str(i)]['1']))
    gp = jnp.mean(x, axis=(1, 2), keepdims=True)
    gp = _bn_relu(F.conv2d(gp, p['concurent']['4']['gap']['1'], dtype=dtype),
                  p['concurent']['4']['gap']['2'])
    gp = jnp.broadcast_to(gp, x.shape[:-1] + (gp.shape[-1],))
    out = jnp.concatenate(outs + [gp], axis=-1)
    return _bn_relu(F.conv2d(out, p['project']['0'], dtype=dtype),
                    p['project']['1'])


def _deeplab_head(x, p, dtype=None):
    """_DeepLabHead: two separable convs + 1x1 (deeplab_v3.py:99-112)."""
    x = _sep_conv(x, p['block']['0'], dtype=dtype)
    x = _sep_conv(x, p['block']['1'], dtype=dtype)
    return F.conv2d(x, p['block']['2'], dtype=dtype)


def _sep_conv_head(x, p, dtype=None):
    """SepConvHead(1, in=ch, mid=ch//2, 2 layers)."""
    x = _sep_conv(x, p['layers']['0'], dtype=dtype)
    x = _sep_conv(x, p['layers']['1'], dtype=dtype)
    return F.conv2d(x, p['layers']['2'], dtype=dtype)


def rgb_with_clicks(params: Dict, image: jnp.ndarray, coord_features: jnp.ndarray,
                    dtype=None) -> jnp.ndarray:
    """rgb_conv(concat(image, dist_maps)) (is_deeplab_model.py:55-58).
    image [1, H, W, 3]; coord_features [1, H, W, 2]."""
    p = params['rgb_conv']
    x = jnp.concatenate([image, coord_features], axis=-1)
    x = F.conv2d(x, p['0'], dtype=dtype)
    x = jnp.where(x >= 0, x, 0.2 * x)           # LeakyReLU(0.2)
    x = F.batch_norm(x, p['2'])
    return F.conv2d(x, p['3'], dtype=dtype)


def backbone_features(params: Dict, x: jnp.ndarray, dtype=None):
    """(skip-projected c1, c4) — the f-BRS-A insertion operands
    (reference brs.py:126-137). x: rgb_conv output."""
    fe = params['feature_extractor']
    c1, c4 = _backbone_v1s(x, fe['backbone'], dtype=dtype)
    c1 = _bn_relu(F.conv2d(c1, fe['skip_project']['skip_project']['0'],
                           dtype=dtype),
                  fe['skip_project']['skip_project']['1'])
    return c1, c4


def aspp_concat(params: Dict, c4: jnp.ndarray, c1: jnp.ndarray, dtype=None
                ) -> jnp.ndarray:
    """aspp(c4) upsampled to c1 + concat — yields 'after_aspp' features
    (reference brs.py:94-99, 131-136)."""
    fe = params['feature_extractor']
    a = _aspp(c4, fe['aspp'], dtype=dtype)
    a = F.resize_bilinear(a, c1.shape[1:3], align_corners=True)
    return jnp.concatenate([a, c1], axis=-1)     # [1, h, w, ch+32]


def head_input(params: Dict, x: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """'after_aspp' features for f-BRS-B (brs.py:121-141). x: rgb_conv out."""
    c1, c4 = backbone_features(params, x, dtype=dtype)
    return aspp_concat(params, c4, c1, dtype=dtype)


def deeplab_head(params: Dict, feats: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """'after_aspp' -> 'after_deeplab' features (feature_extractor.head)."""
    return _deeplab_head(feats, params['feature_extractor']['head'],
                         dtype=dtype)


def logits_from_deeplab(params: Dict, x: jnp.ndarray, out_hw, dtype=None
                        ) -> jnp.ndarray:
    """'after_deeplab' features -> logits at out_hw (SepConvHead + upsample,
    the f-BRS-C prediction path, brs.py:101-104)."""
    x = _sep_conv_head(x, params['head'], dtype=dtype)
    return F.resize_bilinear(x.astype(jnp.float32), tuple(out_hw),
                             align_corners=True)


def head_from_features(params: Dict, feats: jnp.ndarray, out_hw, dtype=None
                       ) -> jnp.ndarray:
    """features -> logits at out_hw (deeplab head + SepConvHead + upsample)."""
    return logits_from_deeplab(params, deeplab_head(params, feats, dtype=dtype),
                               out_hw, dtype=dtype)


def num_deeplab_channels(params: Dict) -> int:
    """ch of the DeepLabV3Plus (reference deeplab_v3.py:27) from the ASPP
    projection conv (HWIO layout: last dim = out channels)."""
    return int(params['feature_extractor']['aspp']['project']['0']
               ['weight'].shape[-1])


def num_c4_channels(params: Dict) -> int:
    """aspp_in_channels (reference deeplab_v3.py:28-33) from the first ASPP
    branch conv input dim."""
    return int(params['feature_extractor']['aspp']['concurent']['0']['0']
               ['weight'].shape[-2])


def forward(params: Dict, image: jnp.ndarray, coord_features: jnp.ndarray,
            dtype=None) -> jnp.ndarray:
    """Full forward: image + click maps -> logits [1, H, W, 1]."""
    x = rgb_with_clicks(params, image, coord_features, dtype=dtype)
    feats = head_input(params, x, dtype=dtype)
    return head_from_features(params, feats, image.shape[1:3], dtype=dtype)


def load_fbrs_params(path: str) -> Dict:
    """Load the reference saves/fbrs.pth into our tree layout.

    The reference's _AsppPooling nests its convs under 'gap'
    (deeplab_v3.py:150-158): aspp.concurent.4.gap.{1,2}."""
    import torch
    from xmem2_tpu.bridge.torch_params import _assign

    sd = torch.load(path, map_location='cpu', weights_only=True)
    if 'state_dict' in sd:
        sd = sd['state_dict']
    tree: Dict = {}
    bn_markers = {k.rsplit('.', 1)[0] for k in sd if k.endswith('running_mean')}
    for name, t in sd.items():
        if name.endswith('num_batches_tracked'):
            continue
        a = t.detach().cpu().numpy()
        prefix = name.rsplit('.', 1)[0]
        if name.endswith('weight') and a.ndim == 4:
            a = np.transpose(a, (2, 3, 1, 0))
        elif name.endswith('weight') and a.ndim == 2 and prefix not in bn_markers:
            a = np.transpose(a, (1, 0))
        _assign(tree, name.split('.'), a)
    return tree
