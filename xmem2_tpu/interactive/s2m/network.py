"""Scribble-to-mask network: DeepLabV3+ with a ResNet-50 backbone accepting
6 input channels (image, previous mask, positive + negative scribbles).

Behavioral parity targets in the reference repo:
  - inference/interact/s2m/s2m_network.py:56 (deeplabv3plus_resnet50,
    output_stride=16: layer4 stride replaced with dilation 2)
  - inference/interact/s2m/_deeplab.py:30-54 (DeepLabHeadV3Plus), :113-165
    (ASPP with global-pool branch), the final bilinear upsample of
    _SimpleSegmentationModel (s2m/utils.py)
  - inference/interact/s2m/s2m_resnet.py (torchvision-style ResNet-50 with
    replace_stride_with_dilation)

Weights load from the reference s2m.pth through the same generic bridge as
XMem (torch names -> HWIO trees).
"""

from typing import Dict

import jax
import jax.numpy as jnp

from xmem2_tpu.nn import functional as F


def _bottleneck(x, p, stride=1, dilation=1, dtype=None):
    """torchvision Bottleneck: 1x1 -> 3x3(stride, dilation) -> 1x1 ·4."""
    residual = x
    out = F.relu(F.batch_norm(F.conv2d(x, p['conv1'], dtype=dtype), p['bn1']))
    out = F.relu(F.batch_norm(
        F.conv2d(out, p['conv2'], stride=stride, padding=dilation,
                 dilation=dilation, dtype=dtype), p['bn2']))
    out = F.batch_norm(F.conv2d(out, p['conv3'], dtype=dtype), p['bn3'])
    if 'downsample' in p:
        residual = F.batch_norm(
            F.conv2d(x, p['downsample']['0'], stride=stride, dtype=dtype),
            p['downsample']['1'])
    return F.relu(out + residual)


def _layer(x, p, blocks, stride, dilation=1, dilate_all=False, dtype=None):
    """When dilate_all (output-stride-16 layer4): stride folds into dilation
    (torchvision replace_stride_with_dilation semantics: first block uses the
    PREVIOUS dilation, subsequent blocks the doubled one)."""
    if dilate_all:
        first_dilation, rest_dilation, stride = dilation, dilation * stride, 1
    else:
        first_dilation = rest_dilation = dilation
    x = _bottleneck(x, p['0'], stride=stride, dilation=first_dilation, dtype=dtype)
    for i in range(1, blocks):
        x = _bottleneck(x, p[str(i)], dilation=rest_dilation, dtype=dtype)
    return x


def _backbone(x, p, dtype=None):
    """ResNet-50, output stride 16: returns (low_level=layer1, out=layer4)."""
    x = F.conv2d(x, p['conv1'], stride=2, padding=3, dtype=dtype)
    x = F.relu(F.batch_norm(x, p['bn1']))
    x = F.max_pool(x, 3, 2, 1)
    low = _layer(x, p['layer1'], 3, stride=1, dtype=dtype)
    x = _layer(low, p['layer2'], 4, stride=2, dtype=dtype)
    x = _layer(x, p['layer3'], 6, stride=2, dtype=dtype)
    x = _layer(x, p['layer4'], 3, stride=2, dilation=1, dilate_all=True,
               dtype=dtype)
    return low, x


def _conv_bn_relu(x, p_conv, p_bn, padding=0, dilation=1, dtype=None):
    x = F.conv2d(x, p_conv, padding=padding, dilation=dilation, dtype=dtype)
    return F.relu(F.batch_norm(x, p_bn))


def _aspp(x, p, rates=(6, 12, 18), dtype=None):
    """ASPP: 1x1 + three dilated 3x3 + global-pool branch -> project
    (reference _deeplab.py:135-165; dropout is identity at inference)."""
    res = [_conv_bn_relu(x, p['convs']['0']['0'], p['convs']['0']['1'],
                         dtype=dtype)]
    for i, r in enumerate(rates, start=1):
        res.append(_conv_bn_relu(x, p['convs'][str(i)]['0'],
                                 p['convs'][str(i)]['1'],
                                 padding=r, dilation=r, dtype=dtype))
    gp = jnp.mean(x, axis=(1, 2), keepdims=True)
    gp = _conv_bn_relu(gp, p['convs']['4']['1'], p['convs']['4']['2'],
                       dtype=dtype)
    gp = jnp.broadcast_to(gp, x.shape[:-1] + (gp.shape[-1],))
    out = jnp.concatenate(res + [gp], axis=-1)
    return _conv_bn_relu(out, p['project']['0'], p['project']['1'], dtype=dtype)


def deeplabv3plus_resnet50_apply(params: Dict, x: jnp.ndarray, dtype=None
                                 ) -> jnp.ndarray:
    """x: [B, H, W, 6] -> logits [B, H, W, 1] (upsampled to input size)."""
    h, w = x.shape[1:3]
    low, out = _backbone(x, params['backbone'], dtype=dtype)
    cls = params['classifier']
    low = _conv_bn_relu(low, cls['project']['0'], cls['project']['1'],
                        dtype=dtype)
    feat = _aspp(out, cls['aspp'], dtype=dtype)
    feat = F.resize_bilinear(feat, low.shape[1:3])
    y = jnp.concatenate([low, feat], axis=-1)
    y = _conv_bn_relu(y, cls['classifier']['0'], cls['classifier']['1'],
                      padding=1, dtype=dtype)
    y = F.conv2d(y, cls['classifier']['3'], dtype=dtype)
    return F.resize_bilinear(y.astype(jnp.float32), (h, w))


def load_s2m_params(path: str) -> Dict:
    """Load the reference saves/s2m.pth into our tree layout."""
    import numpy as np
    import torch
    from xmem2_tpu.bridge.torch_params import _assign

    sd = torch.load(path, map_location='cpu', weights_only=True)
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
