"""XMem network blocks, NHWC/TPU-native.

Group tensors carry an object dimension: [B, N_obj, H, W, C]. All group ops are
permutation-equivariant over N_obj and are applied by folding objects into the
batch dimension (free reshapes under XLA).

Behavioral parity targets in the reference repo:
  - FeatureFusionBlock / HiddenUpdater / HiddenReinforcer / ValueEncoder /
    KeyEncoder / UpsampleBlock / KeyProjection / Decoder: model/modules.py
  - GConv2D / GroupResBlock / MainToGroupDistributor / up/downsample_groups:
    model/group_modules.py
  - CBAM: model/cbam.py
The two GRUs keep the reference's nonstandard gate order (new value computed
before the forget gate, model/modules.py:64-72) for weight compatibility.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from xmem2_tpu.nn import functional as F


# ---------------------------------------------------------------------------
# group helpers (reference model/group_modules.py)
# ---------------------------------------------------------------------------

def _fold(g: jnp.ndarray) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    b, n = g.shape[:2]
    return g.reshape((b * n,) + g.shape[2:]), (b, n)


def _unfold(x: jnp.ndarray, bn: Tuple[int, int]) -> jnp.ndarray:
    b, n = bn
    return x.reshape((b, n) + x.shape[1:])


def gconv2d(g: jnp.ndarray, p: dict, stride=1, padding=0, dtype=None) -> jnp.ndarray:
    x, bn = _fold(g)
    return _unfold(F.conv2d(x, p, stride=stride, padding=padding, dtype=dtype), bn)


def upsample_groups(g: jnp.ndarray, ratio: int = 2) -> jnp.ndarray:
    x, bn = _fold(g)
    h, w = x.shape[1:3]
    return _unfold(F.resize_bilinear(x, (h * ratio, w * ratio)), bn)


def downsample_groups(g: jnp.ndarray, ratio: float = 0.5) -> jnp.ndarray:
    x, bn = _fold(g)
    return _unfold(F.interpolate_area_down(x, ratio), bn)


def distribute(x: jnp.ndarray, g: jnp.ndarray, method: str = 'cat') -> jnp.ndarray:
    """MainToGroupDistributor: broadcast frame features x [B,H,W,C] to every
    object group slot of g [B,N,H,W,Cg] (reference group_modules.py:58-82)."""
    n = g.shape[1]
    xb = jnp.broadcast_to(x[:, None], (x.shape[0], n) + x.shape[1:])
    if method == 'cat':
        return jnp.concatenate([xb, g], axis=-1)
    if method == 'add':
        return xb + g
    raise NotImplementedError(method)


def group_resblock(g: jnp.ndarray, p: dict, dtype=None) -> jnp.ndarray:
    """GroupResBlock (reference group_modules.py:36-55)."""
    out = gconv2d(F.relu(g), p['conv1'], padding=1, dtype=dtype)
    out = gconv2d(F.relu(out), p['conv2'], padding=1, dtype=dtype)
    if 'downsample' in p:
        g = gconv2d(g, p['downsample'], padding=1, dtype=dtype)
    return out + g


# ---------------------------------------------------------------------------
# CBAM (reference model/cbam.py)
# ---------------------------------------------------------------------------

def cbam(x: jnp.ndarray, p: dict, dtype=None) -> jnp.ndarray:
    """Channel gate (avg+max pooled shared MLP) then spatial gate (7x7 conv).

    x: [B, H, W, C] (object groups already folded into batch).
    """
    # channel gate — pools over all of H, W
    avg = jnp.mean(x, axis=(1, 2))                     # [B, C]
    mx = jnp.max(x, axis=(1, 2))
    mlp = p['ChannelGate']['mlp']

    def shared_mlp(v):
        v = F.linear(v, mlp['1'], dtype=dtype)
        v = F.relu(v)
        return F.linear(v, mlp['3'], dtype=dtype)

    att = F.sigmoid(shared_mlp(avg) + shared_mlp(mx))  # [B, C]
    x = x * att[:, None, None, :].astype(x.dtype)

    # spatial gate — channel-pool (max, mean) then 7x7 conv
    pooled = jnp.concatenate(
        [jnp.max(x, axis=-1, keepdims=True), jnp.mean(x, axis=-1, keepdims=True)],
        axis=-1,
    )
    gate = F.conv2d(pooled, p['SpatialGate']['spatial']['conv'], padding=3, dtype=dtype)
    return x * F.sigmoid(gate).astype(x.dtype)


# ---------------------------------------------------------------------------
# fusion / GRUs / projection (reference model/modules.py)
# ---------------------------------------------------------------------------

def _split_weight(p: dict, cx: int, part: str) -> dict:
    """Channel-slice a conv param dict across a concat boundary. The 'x' part
    keeps the bias (added once); the 'g' part is bias-free."""
    w = p['weight']
    if part == 'x':
        out = {'weight': w[:, :, :cx]}
        if p.get('bias') is not None:
            out['bias'] = p['bias']
        return out
    return {'weight': w[:, :, cx:]}


def _fused_distribute_resblock(x: jnp.ndarray, g: jnp.ndarray, p: dict,
                               dtype=None) -> jnp.ndarray:
    """group_resblock(distribute(x, g)) with the frame-feature half factored
    out of conv1 and downsample.

    A conv over a channel concat is the sum of convs over the parts, and the
    frame features x are IDENTICAL across the N object slots distribute
    broadcasts them to — so their contribution is computed once per frame and
    broadcast, instead of N times. Per-object conv1/downsample input width
    drops from (Cx+Cg) to Cg: for the decoder fuser (1024 frame + 576 group
    channels, reference modules.py:22-41) that removes ~2/3 of the
    per-object FLOPs of those convs at high object counts. relu commutes
    with concat, so splitting is exact up to f32 summation order."""
    cx = x.shape[-1]
    xr = F.relu(x)
    out_x = F.conv2d(xr, _split_weight(p['conv1'], cx, 'x'),
                     padding=1, dtype=dtype)
    out = gconv2d(F.relu(g), _split_weight(p['conv1'], cx, 'g'),
                  padding=1, dtype=dtype)
    out = out + out_x[:, None].astype(out.dtype)
    out = gconv2d(F.relu(out), p['conv2'], padding=1, dtype=dtype)
    skip_x = F.conv2d(x, _split_weight(p['downsample'], cx, 'x'),
                      padding=1, dtype=dtype)
    skip = gconv2d(g, _split_weight(p['downsample'], cx, 'g'),
                   padding=1, dtype=dtype)
    return out + skip + skip_x[:, None].astype(out.dtype)


def feature_fusion(x: jnp.ndarray, g: jnp.ndarray, p: dict, dtype=None) -> jnp.ndarray:
    """FeatureFusionBlock (reference modules.py:22-41)."""
    if g.shape[1] > 1 and 'downsample' in p['block1']:
        # multi-object: frame features enter conv1/downsample once, not N×
        g = _fused_distribute_resblock(x, g, p['block1'], dtype=dtype)
    else:
        g = distribute(x, g)
        g = group_resblock(g, p['block1'], dtype=dtype)
    flat, bn = _fold(g)
    r = _unfold(cbam(flat, p['attention'], dtype=dtype), bn)
    return group_resblock(g + r, p['block2'], dtype=dtype)


def _gru_gate(values: jnp.ndarray, h: jnp.ndarray, hidden_dim: int) -> jnp.ndarray:
    """Shared nonstandard-GRU update (reference modules.py:64-72, 93-97)."""
    forget = F.sigmoid(values[..., :hidden_dim])
    update = F.sigmoid(values[..., hidden_dim:hidden_dim * 2])
    new_value = jnp.tanh(values[..., hidden_dim * 2:])
    return forget * h * (1.0 - update) + update * new_value


def hidden_updater(
    g16: jnp.ndarray, g8: jnp.ndarray, g4: jnp.ndarray, h: jnp.ndarray,
    p: dict, hidden_dim: int, dtype=None,
) -> jnp.ndarray:
    """Multi-scale GRU in the decoder (reference modules.py:44-74).
    g4 here already includes the logits channel (decoder concatenates it)."""
    g = (gconv2d(g16, p['g16_conv'], dtype=dtype)
         + gconv2d(downsample_groups(g8, 0.5), p['g8_conv'], dtype=dtype)
         + gconv2d(downsample_groups(g4, 0.25), p['g4_conv'], dtype=dtype))
    values = gconv2d(jnp.concatenate([g, h.astype(g.dtype)], axis=-1),
                     p['transform'], padding=1, dtype=dtype)
    return _gru_gate(values.astype(jnp.float32), h.astype(jnp.float32), hidden_dim)


def hidden_reinforcer(g: jnp.ndarray, h: jnp.ndarray, p: dict, hidden_dim: int,
                      dtype=None) -> jnp.ndarray:
    """Single GRU in the value encoder (reference modules.py:77-99)."""
    values = gconv2d(jnp.concatenate([g, h.astype(g.dtype)], axis=-1),
                     p['transform'], padding=1, dtype=dtype)
    return _gru_gate(values.astype(jnp.float32), h.astype(jnp.float32), hidden_dim)


def key_projection(x: jnp.ndarray, p: dict, need_s: bool, need_e: bool, dtype=None):
    """KeyProjection (reference modules.py:194-211): key, shrinkage (d^2+1),
    selection (sigmoid)."""
    key = F.conv2d(x, p['key_proj'], padding=1, dtype=dtype)
    shrinkage = None
    selection = None
    if need_s:
        d = F.conv2d(x, p['d_proj'], padding=1, dtype=dtype).astype(jnp.float32)
        shrinkage = d * d + 1.0
    if need_e:
        selection = F.sigmoid(
            F.conv2d(x, p['e_proj'], padding=1, dtype=dtype).astype(jnp.float32))
    return key.astype(jnp.float32), shrinkage, selection


def upsample_block(skip_f: jnp.ndarray, up_g: jnp.ndarray, p: dict, dtype=None):
    """UpsampleBlock (reference modules.py:178-191): 2x upsample + skip add."""
    skip = F.conv2d(skip_f, p['skip_conv'], padding=1, dtype=dtype)
    g = upsample_groups(up_g, 2)
    g = distribute(skip, g, method='add')
    return group_resblock(g, p['out_conv'], dtype=dtype)
