"""Capture golden activations from the reference XMem network (torch CPU,
seeded random weights) for parity-testing the JAX rebuild.

The reference is used strictly as an oracle: we instantiate its nn.Module,
load deterministic synthetic weights (tests/golden_utils.synth_state_dict —
the parity tests regenerate the same weights, so only names/shapes and
activations are stored), run the four forward modes, and save to
tests/golden/model_golden.npz.

Usage: python scripts/gen_golden_model.py
"""

import pathlib
import sys

import numpy as np
import torch

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
from tests.golden_utils import synth_state_dict  # noqa: E402

sys.path.insert(0, '/root/reference')
from model.network import XMem  # noqa: E402

OUT = REPO / 'tests' / 'golden'
OUT.mkdir(parents=True, exist_ok=True)

torch.manual_seed(0)
rng = np.random.default_rng(7)

config = {}
net = XMem(config, model_path=None, pretrained_key_encoder=False,
           pretrained_value_encoder=False).eval()

names = [k for k in net.state_dict() if not k.endswith('num_batches_tracked')]
shapes = [tuple(net.state_dict()[k].shape) for k in names]
sd = synth_state_dict(names, shapes)
full_sd = dict(net.state_dict())
for k, v in sd.items():
    full_sd[k] = torch.from_numpy(v)
net.load_state_dict(full_sd)

B, N_OBJ, H, W = 1, 2, 64, 96
h16, w16 = H // 16, W // 16
CK, CV, CH = 64, 512, 64

image = rng.standard_normal((B, 3, H, W)).astype(np.float32)
masks = rng.uniform(0, 1, (B, N_OBJ, H, W)).astype(np.float32)
hidden = rng.standard_normal((B, N_OBJ, CH, h16, w16)).astype(np.float32) * 0.3
readout_in = rng.standard_normal((B, N_OBJ, CV, h16, w16)).astype(np.float32) * 0.3

out = {
    'sdmeta/names': np.array(names),
    # shapes can be ragged in length -> store as padded int array + ndim
    'sdmeta/shapes': np.array([list(s) + [0] * (4 - len(s)) for s in shapes]),
    'sdmeta/ndims': np.array([len(s) for s in shapes]),
}

with torch.no_grad():
    t_image = torch.from_numpy(image)
    key, shrinkage, selection, f16, f8, f4 = net.encode_key(t_image)
    out.update({
        'in/image': image, 'ek/key': key.numpy(), 'ek/shrinkage': shrinkage.numpy(),
        'ek/selection': selection.numpy(), 'ek/f16': f16.numpy(),
        'ek/f8': f8.numpy(), 'ek/f4': f4.numpy(),
    })

    g16, h_new = net.encode_value(t_image, f16, torch.from_numpy(hidden),
                                  torch.from_numpy(masks), is_deep_update=True)
    out.update({'in/masks': masks, 'in/hidden': hidden,
                'ev/g16': g16.numpy(), 'ev/hidden': h_new.numpy()})

    g16_nodeep, _ = net.encode_value(t_image, f16, torch.from_numpy(hidden),
                                     torch.from_numpy(masks), is_deep_update=False)
    out['ev/g16_nodeep'] = g16_nodeep.numpy()

    hid_out, logits, prob = net.segment(
        (f16, f8, f4), torch.from_numpy(readout_in), torch.from_numpy(hidden),
        h_out=True, strip_bg=False)
    out.update({'in/readout': readout_in, 'seg/hidden': hid_out.numpy(),
                'seg/logits': logits.numpy(), 'seg/prob': prob.numpy()})

    # read_memory (training path)
    T = 3
    mk = rng.standard_normal((B, CK, T, h16, w16)).astype(np.float32)
    ms = (rng.standard_normal((B, 1, T, h16, w16)).astype(np.float32) ** 2) + 1
    mv = rng.standard_normal((B, N_OBJ, CV, T, h16, w16)).astype(np.float32) * 0.3
    qk = rng.standard_normal((B, CK, h16, w16)).astype(np.float32)
    qe = (1 / (1 + np.exp(-rng.standard_normal((B, CK, h16, w16))))).astype(np.float32)
    mem = net.read_memory(torch.from_numpy(qk), torch.from_numpy(qe),
                          torch.from_numpy(mk), torch.from_numpy(ms),
                          torch.from_numpy(mv))
    out.update({'rm/mk': mk, 'rm/ms': ms, 'rm/mv': mv, 'rm/qk': qk, 'rm/qe': qe,
                'rm/mem': mem.numpy()})

np.savez_compressed(OUT / 'model_golden.npz', **out)
size_mb = (OUT / 'model_golden.npz').stat().st_size / 1e6
print(f'wrote model_golden.npz with {len(out)} arrays ({size_mb:.1f} MB)')
