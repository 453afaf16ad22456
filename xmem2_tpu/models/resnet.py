"""ResNet trunks (NHWC) used by the key encoder (ResNet-50 conv1..layer3) and
value encoder (ResNet-18 conv1..layer3 with extra input channels).

Behavioral parity: reference model/resnet.py:46-152. Only the trunk layers the
encoders consume are implemented (layer4 and the classifier head are unused by
XMem and are dropped).

Parameter layout mirrors the torch module tree, e.g.
  params['layer1']['0']['conv1']['weight']  (HWIO)
  params['layer1']['0']['downsample']['0' (conv) / '1' (bn)]
"""

from typing import Sequence

import jax.numpy as jnp

from xmem2_tpu.nn import functional as F


def basic_block(x: jnp.ndarray, p: dict, stride: int = 1, dtype=None) -> jnp.ndarray:
    """ResNet-18/34 block (reference model/resnet.py:46-75)."""
    residual = x
    out = F.conv2d(x, p['conv1'], stride=stride, padding=1, dtype=dtype)
    out = F.batch_norm(out, p['bn1'])
    out = F.relu(out)
    out = F.conv2d(out, p['conv2'], stride=1, padding=1, dtype=dtype)
    out = F.batch_norm(out, p['bn2'])
    if 'downsample' in p:
        residual = F.conv2d(x, p['downsample']['0'], stride=stride, dtype=dtype)
        residual = F.batch_norm(residual, p['downsample']['1'])
    return F.relu(out + residual)


def bottleneck_block(x: jnp.ndarray, p: dict, stride: int = 1, dtype=None) -> jnp.ndarray:
    """ResNet-50 block (reference model/resnet.py:78-114)."""
    residual = x
    out = F.conv2d(x, p['conv1'], dtype=dtype)
    out = F.relu(F.batch_norm(out, p['bn1']))
    out = F.conv2d(out, p['conv2'], stride=stride, padding=1, dtype=dtype)
    out = F.relu(F.batch_norm(out, p['bn2']))
    out = F.conv2d(out, p['conv3'], dtype=dtype)
    out = F.batch_norm(out, p['bn3'])
    if 'downsample' in p:
        residual = F.conv2d(x, p['downsample']['0'], stride=stride, dtype=dtype)
        residual = F.batch_norm(residual, p['downsample']['1'])
    return F.relu(out + residual)


def layer(x: jnp.ndarray, p: dict, block_fn, num_blocks: int, stride: int, dtype=None):
    x = block_fn(x, p['0'], stride=stride, dtype=dtype)
    for i in range(1, num_blocks):
        x = block_fn(x, p[str(i)], stride=1, dtype=dtype)
    return x


def stem(x: jnp.ndarray, p: dict, dtype=None) -> jnp.ndarray:
    """conv1 (7x7 s2) + bn + relu + maxpool (3x3 s2). Shared by both trunks.

    NOTE: the reference ValueEncoder applies maxpool BEFORE relu
    (modules.py:137-138) — max and relu commute, so this is identical.
    """
    x = F.conv2d(x, p['conv1'], stride=2, padding=3, dtype=dtype)
    x = F.relu(F.batch_norm(x, p['bn1']))
    return F.max_pool(x, 3, 2, 1)


RESNET50_BLOCKS: Sequence[int] = (3, 4, 6)   # layer1..layer3
RESNET18_BLOCKS: Sequence[int] = (2, 2, 2)


def resnet50_trunk(x: jnp.ndarray, p: dict, dtype=None):
    """Returns (f4, f8, f16) = (layer1, layer2, layer3) features.

    NOTE: the reference KeyEncoder renames layer1 to 'res2'
    (reference modules.py:162), so the param subtree uses that name."""
    x = stem(x, p, dtype=dtype)
    f4 = layer(x, p['res2'] if 'res2' in p else p['layer1'],
               bottleneck_block, 3, stride=1, dtype=dtype)
    f8 = layer(f4, p['layer2'], bottleneck_block, 4, stride=2, dtype=dtype)
    f16 = layer(f8, p['layer3'], bottleneck_block, 6, stride=2, dtype=dtype)
    return f4, f8, f16


def resnet18_trunk(x: jnp.ndarray, p: dict, dtype=None):
    """Returns layer3 (1/16, 256ch) features."""
    x = stem(x, p, dtype=dtype)
    x = layer(x, p['layer1'], basic_block, 2, stride=1, dtype=dtype)
    x = layer(x, p['layer2'], basic_block, 2, stride=2, dtype=dtype)
    x = layer(x, p['layer3'], basic_block, 2, stride=2, dtype=dtype)
    return x
