"""Generate golden activations for the memory-affinity math from the reference
implementation (torch CPU). The reference repo is used strictly as a test
oracle — its outputs are saved to tests/golden/*.npz; no reference code enters
this repo.

Usage: python scripts/gen_golden_ops.py
"""

import pathlib
import sys

import numpy as np
import torch

REF = '/root/reference'
OUT = pathlib.Path(__file__).resolve().parent.parent / 'tests' / 'golden'
OUT.mkdir(parents=True, exist_ok=True)

sys.path.insert(0, REF)
from model.memory_util import do_softmax, get_similarity  # noqa: E402
from model.aggregate import aggregate  # noqa: E402
from util.tensor_util import pad_divide_by  # noqa: E402

torch.manual_seed(0)
rng = np.random.default_rng(0)


def save(name, **arrays):
    np.savez(OUT / f'{name}.npz', **{k: np.asarray(v) for k, v in arrays.items()})
    print(f'wrote {name}.npz:', {k: tuple(np.asarray(v).shape) for k, v in arrays.items()})


def t(x):
    return torch.from_numpy(np.ascontiguousarray(x)).float()


# --- similarity / softmax / readout ---------------------------------------
N, P, CK, CV, K = 200, 96, 64, 32, 30
mk = rng.standard_normal((1, CK, N)).astype(np.float32)
ms = (rng.standard_normal((1, 1, N)).astype(np.float32) ** 2) + 1.0
qk = rng.standard_normal((1, CK, P)).astype(np.float32)
qe = (1.0 / (1.0 + np.exp(-rng.standard_normal((1, CK, P))))).astype(np.float32)

sim_full = get_similarity(t(mk), t(ms), t(qk), t(qe))
sim_no_qe = get_similarity(t(mk), None, t(qk), None)
sim_no_ms = get_similarity(t(mk), None, t(qk), t(qe))

aff_topk, usage = do_softmax(sim_full.clone(), top_k=K, inplace=False, return_usage=True)
aff_dense = do_softmax(sim_full.clone(), top_k=None)

mv = rng.standard_normal((1, CV, N)).astype(np.float32)
read = torch.bmm(t(mv), aff_topk)  # reference MemoryManager._readout: v @ affinity

save(
    'ops_similarity',
    mk=mk, ms=ms, qk=qk, qe=qe, mv=mv,
    sim_full=sim_full.numpy(), sim_no_qe=sim_no_qe.numpy(), sim_no_ms=sim_no_ms.numpy(),
    aff_topk=aff_topk.numpy(), usage=usage.numpy(), aff_dense=aff_dense.numpy(),
    read=read.numpy(), top_k=np.array(K),
)

# --- aggregate -------------------------------------------------------------
prob = rng.uniform(0, 1, (3, 24, 40)).astype(np.float32)
logits_ref, prob_ref = aggregate(t(prob), dim=0, return_logits=True)
save('ops_aggregate', prob=prob, logits=logits_ref.numpy(), prob_out=prob_ref.numpy())

# --- pad_divide_by ---------------------------------------------------------
img = rng.standard_normal((3, 37, 53)).astype(np.float32)
padded, pad = pad_divide_by(t(img), 16)
save('ops_pad', img=img, padded=padded.numpy(), pad=np.array(pad))

print('done')
