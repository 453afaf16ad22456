"""XMem top-level network functions (NHWC, functional).

Parity target: reference model/network.py (encode_key :40, encode_value :72,
read_memory :89, segment :107, init_hyperparameters :134, load_weights :184).

The torch nn.Module mode-dispatched forward becomes four pure functions over a
parameter pytree. The parameter tree mirrors the torch state-dict hierarchy
(see xmem2_tpu/bridge/torch_params.py for the converter):
  key_encoder.{conv1,bn1,layer1..3}, key_proj.{key_proj,d_proj,e_proj},
  value_encoder.{conv1,bn1,layer1..3,fuser,hidden_reinforce},
  decoder.{fuser,hidden_update,up_16_8,up_8_4,pred}
"""

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from xmem2_tpu.models import modules as M
from xmem2_tpu.models import resnet
from xmem2_tpu.nn import functional as F
from xmem2_tpu.ops.tensor import aggregate
from xmem2_tpu.ops.similarity import get_similarity, masked_softmax, readout


@dataclass
class XMemParams:
    """Model parameters + hyperparameters sniffed from checkpoint shapes
    (reference network.py:134-182). Registered as a jax pytree: the weight
    tree is a traced child, the hyperparameters are static aux data, so
    XMemParams flows through jit/pjit/grad directly."""
    tree: dict
    key_dim: int = 64
    value_dim: int = 512
    hidden_dim: int = 64
    single_object: bool = False

    @property
    def disable_hidden(self) -> bool:
        return self.hidden_dim <= 0


jax.tree_util.register_pytree_node(
    XMemParams,
    lambda p: ((p.tree,), (p.key_dim, p.value_dim, p.hidden_dim, p.single_object)),
    lambda aux, children: XMemParams(children[0], *aux),
)


def encode_key(params: XMemParams, frame: jnp.ndarray, need_sk: bool = True,
               need_ek: bool = True, dtype=None):
    """frame: [B, H, W, 3] -> (key, shrinkage, selection, f16, f8, f4).

    key/shrinkage/selection are [B, h16, w16, C] f32; f* keep compute dtype.
    (reference network.py:40-70; the B*T variant is handled by callers folding
    time into batch.)
    """
    p = params.tree
    f4, f8, f16 = resnet.resnet50_trunk(frame, p['key_encoder'], dtype=dtype)
    key, shrinkage, selection = M.key_projection(
        f16, p['key_proj'], need_sk, need_ek, dtype=dtype)
    return key, shrinkage, selection, f16, f8, f4


def encode_value(params: XMemParams, frame: jnp.ndarray, image_feat_f16: jnp.ndarray,
                 h16: Optional[jnp.ndarray], masks: jnp.ndarray,
                 is_deep_update: bool = True, dtype=None):
    """frame: [B, H, W, 3]; image_feat_f16: [B, h16, w16, 1024];
    h16 (hidden): [B, N, h16, w16, Ch] or None; masks: [B, N, H, W].

    Returns (g16 [B, N, h16, w16, Cv], h16').
    (reference network.py:72-85 + modules.py ValueEncoder:102-150)
    """
    p = params.tree['value_encoder']
    b, n = masks.shape[:2]

    if n != 1 and not params.single_object:
        others = jnp.sum(masks, axis=1, keepdims=True) - masks  # sum of other objects
    else:
        others = jnp.zeros_like(masks)

    if params.single_object:
        g = masks[..., None]                                   # [B, N, H, W, 1]
    else:
        g = jnp.stack([masks, others], axis=-1)                # [B, N, H, W, 2]
    g = M.distribute(frame, g)                                 # [B, N, H, W, 3+1/2]
    g = g.reshape((b * n,) + g.shape[2:])

    g = resnet.resnet18_trunk(g, p, dtype=dtype)               # [B*N, h16, w16, 256]
    g = g.reshape((b, n) + g.shape[1:])
    g = M.feature_fusion(image_feat_f16, g, p['fuser'], dtype=dtype)

    if is_deep_update and not params.disable_hidden and h16 is not None:
        h16 = M.hidden_reinforcer(g, h16, p['hidden_reinforce'],
                                  params.hidden_dim, dtype=dtype)
    return g, h16


def segment(params: XMemParams, multi_scale_features, memory_readout: jnp.ndarray,
            hidden_state: Optional[jnp.ndarray], selector: Optional[jnp.ndarray] = None,
            h_out: bool = True, strip_bg: bool = True, dtype=None):
    """Decode memory readout into per-object probabilities
    (reference network.py:107-120 + modules.py Decoder:214-250).

    multi_scale_features: (f16 [B,h16,w16,1024], f8, f4)
    memory_readout: [B, N, h16, w16, Cv]
    hidden_state:   [B, N, h16, w16, Ch] or None
    Returns (hidden_state', logits [B, 1+N, H, W], prob [B, {N|1+N}, H, W]).
    """
    p = params.tree['decoder']
    f16, f8, f4 = multi_scale_features
    b, n = memory_readout.shape[:2]

    if not params.disable_hidden and hidden_state is not None:
        g16 = M.feature_fusion(
            f16, jnp.concatenate([memory_readout,
                                  hidden_state.astype(memory_readout.dtype)], axis=-1),
            p['fuser'], dtype=dtype)
    else:
        g16 = M.feature_fusion(f16, memory_readout, p['fuser'], dtype=dtype)

    g8 = M.upsample_block(f8, g16, p['up_16_8'], dtype=dtype)
    g4 = M.upsample_block(f4, g8, p['up_8_4'], dtype=dtype)

    flat_g4 = F.relu(g4.reshape((b * n,) + g4.shape[2:]))
    logits = F.conv2d(flat_g4, p['pred'], padding=1, dtype=dtype)  # [B*N, H4, W4, 1]
    logits = logits.astype(jnp.float32)

    if h_out and not params.disable_hidden and hidden_state is not None:
        g4h = jnp.concatenate(
            [g4, logits.reshape((b, n) + logits.shape[1:]).astype(g4.dtype)], axis=-1)
        hidden_state = M.hidden_updater(g16, g8, g4h, hidden_state,
                                        p['hidden_update'], params.hidden_dim,
                                        dtype=dtype)
    else:
        hidden_state = None

    h4, w4 = logits.shape[1:3]
    logits = F.resize_bilinear(logits, (h4 * 4, w4 * 4))
    logits = logits.reshape((b, n) + logits.shape[1:3])            # [B, N, H, W]

    prob = F.sigmoid(logits)
    if selector is not None:
        prob = prob * selector

    logits_out, prob = aggregate(prob, axis=1, return_logits=True)
    if strip_bg:
        prob = prob[:, 1:]
    return hidden_state, logits_out, prob


def read_memory(params: XMemParams, query_key, query_selection,
                memory_key, memory_shrinkage, memory_value):
    """Training-time dense memory read (reference network.py:89-105).

    query_key/selection: [B, h, w, Ck]; memory_key/shrinkage: [B, T, h, w, C*];
    memory_value: [B, N_obj, T, h, w, Cv].
    Returns [B, N_obj, h, w, Cv].
    """
    b, n_obj = memory_value.shape[:2]
    h, w = query_key.shape[1:3]
    t = memory_key.shape[1]

    mk = memory_key.reshape(b, t * h * w, -1)
    ms = memory_shrinkage.reshape(b, t * h * w)
    qk = query_key.reshape(b, h * w, -1)
    qe = query_selection.reshape(b, h * w, -1) if query_selection is not None else None

    def one(mk_, ms_, qk_, qe_):
        aff = masked_softmax(get_similarity(mk_, ms_, qk_, qe_))
        return aff  # [hw, T*h*w]

    aff = jax.vmap(one)(mk, ms, qk, qe) if qe is not None else jax.vmap(
        lambda a, b_, c: one(a, b_, c, None))(mk, ms, qk)

    mv = memory_value.reshape(b, n_obj, t * h * w, -1)
    out = jnp.einsum('bpn,bonc->bopc', aff, mv,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return out.reshape(b, n_obj, h, w, -1)
