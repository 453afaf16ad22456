"""Torch-checkpoint -> JAX parameter-tree bridge.

The reference distributes weights as torch state dicts (saves/XMem.pth). This
module converts them into the NHWC/HWIO parameter pytree that
xmem2_tpu.models consumes, including:
  - hyperparameter sniffing from tensor shapes (reference network.py:134-182)
  - single->multi-object conv1 surgery: pad the value-encoder input conv from
    4 to 5 channels (reference network.py:184-198, zero-init padding)
  - layout conversion: conv OIHW -> HWIO, linear [out,in] -> [in,out]

No torch code runs at inference time: `load_torch_checkpoint` uses torch only
to deserialize the .pth (torch CPU is a host-side IO dependency), and native
.npz checkpoints skip torch entirely.
"""

from typing import Dict, Tuple

import numpy as np

from xmem2_tpu.models.network import XMemParams


def _assign(tree: dict, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def convert_state_dict(sd: Dict[str, np.ndarray],
                       init_as_zero_if_needed: bool = True) -> XMemParams:
    """Convert a reference-format state dict (name -> numpy array) into
    XMemParams. Tensors must already be numpy (caller detaches torch)."""
    sd = dict(sd)

    # --- hyperparameters from shapes (reference network.py:146-152) ---
    key_dim = sd['key_proj.key_proj.weight'].shape[0]
    value_dim = sd['value_encoder.fuser.block2.conv2.weight'].shape[0]
    if 'decoder.hidden_update.transform.weight' in sd:
        hidden_dim = sd['decoder.hidden_update.transform.weight'].shape[0] // 3
    else:
        hidden_dim = 0

    # --- single->multi object surgery (reference network.py:184-198) ---
    ve_conv1 = sd['value_encoder.conv1.weight']
    if ve_conv1.shape[1] == 4:
        pads = np.zeros((ve_conv1.shape[0], 1) + ve_conv1.shape[2:], ve_conv1.dtype)
        if not init_as_zero_if_needed:
            rng = np.random.default_rng(0)
            pads = rng.standard_normal(pads.shape).astype(ve_conv1.dtype)
        sd['value_encoder.conv1.weight'] = np.concatenate([ve_conv1, pads], axis=1)

    tree: dict = {}
    bn_markers = {k.rsplit('.', 1)[0] for k in sd if k.endswith('running_mean')}
    for name, arr in sd.items():
        if name.endswith('num_batches_tracked'):
            continue
        path = name.split('.')
        prefix = name.rsplit('.', 1)[0]
        leaf = path[-1]
        a = np.asarray(arr)
        if leaf == 'weight' and a.ndim == 4:
            a = np.transpose(a, (2, 3, 1, 0))          # OIHW -> HWIO
        elif leaf == 'weight' and a.ndim == 2 and prefix not in bn_markers:
            a = np.transpose(a, (1, 0))                # [out,in] -> [in,out]
        _assign(tree, path, a)

    return XMemParams(tree=tree, key_dim=key_dim, value_dim=value_dim,
                      hidden_dim=hidden_dim)


def load_torch_checkpoint(path: str, init_as_zero_if_needed: bool = True) -> XMemParams:
    """Load a reference .pth checkpoint (requires torch on the host)."""
    import torch  # local import: torch is a host-side IO dependency only

    sd = torch.load(path, map_location='cpu', weights_only=True)
    np_sd = {k: v.detach().cpu().numpy() for k, v in sd.items()}
    return convert_state_dict(np_sd, init_as_zero_if_needed)


# ---------------------------------------------------------------------------
# native checkpoint format (.npz, torch-free)
# ---------------------------------------------------------------------------

def _flatten(tree: dict, prefix='') -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f'{prefix}{k}' if not prefix else f'{prefix}.{k}'
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def save_params(params: XMemParams, path: str):
    flat = _flatten(params.tree)
    flat['__meta.key_dim'] = np.array(params.key_dim)
    flat['__meta.value_dim'] = np.array(params.value_dim)
    flat['__meta.hidden_dim'] = np.array(params.hidden_dim)
    np.savez(path, **flat)


def load_params(path: str) -> XMemParams:
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    key_dim = int(flat.pop('__meta.key_dim'))
    value_dim = int(flat.pop('__meta.value_dim'))
    hidden_dim = int(flat.pop('__meta.hidden_dim'))
    tree: dict = {}
    for name, arr in flat.items():
        _assign(tree, name.split('.'), arr)
    return XMemParams(tree=tree, key_dim=key_dim, value_dim=value_dim,
                      hidden_dim=hidden_dim)


def load_any(path: str) -> XMemParams:
    """Load either a native .npz or a torch .pth checkpoint by extension."""
    if str(path).endswith('.npz'):
        return load_params(path)
    return load_torch_checkpoint(path)
