"""Frame annotation candidate selection — diversity-driven greedy picking.

Behavioral parity target: reference inference/frame_selection/frame_selection.py
(select_next_candidates :99, baselines :18-26). The selection criterion is the
pairwise cycle dissimilarity relu(sim(A->B) - sim(B->A)).mean() over composite
keys (key ⊙ (α·mask + (1-α))), greedily maximizing the minimum dissimilarity
to already-chosen frames.

TPU redesign: the reference loops python-side over (round x frame x chosen)
computing one [HW, HW] similarity pair at a time. Here a jitted, vmapped
kernel computes a whole candidate-vs-all-frames row at once, and the greedy
loop maintains a running min — O(k·N) pair computations instead of O(k²·N).
"""

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from xmem2_tpu.ops.similarity import get_similarity
from xmem2_tpu.utils.resize_np import resize_nearest_np


def first_frame_only(*args, **kwargs):
    return [0]


def uniformly_selected_frames(num_total_frames: int, how_many_frames=10, **kwargs) -> List[int]:
    return np.linspace(0, num_total_frames - 1, how_many_frames).astype(int).tolist()


@jax.jit
def _cycle_dissim_one_pair(ck_c, sh_c, se_c, ck_j, sh_j, se_j):
    """Cycle dissimilarity d(c, j) for one frame pair; inputs [HW, Ck]/[HW].
    (reference frame_selection.py:215-224)."""
    fwd = get_similarity(ck_c, sh_c, ck_j, se_j)      # mem=c, query=j: [HWj, HWc]
    rev = get_similarity(ck_j, sh_j, ck_c, se_c)      # mem=j, query=c: [HWc, HWj]
    # The reference subtracts the two [N, HW] matrices elementwise in their
    # own (mutually transposed) layouts (frame_selection.py:220); in our
    # query-major layout that is exactly fwd - rev (sum-relu is transpose
    # invariant).
    cycle = fwd - rev
    return jnp.sum(jax.nn.relu(cycle)) / cycle.size


_cycle_dissim_batch = jax.jit(jax.vmap(
    _cycle_dissim_one_pair, in_axes=(None, None, None, 0, 0, 0)))


def select_next_candidates(keys: np.ndarray, shrinkages, selections,
                           masks: List[np.ndarray], num_next_candidates: int,
                           previously_chosen_candidates: List[int] = (0,),
                           print_progress=False, alpha=0.5,
                           min_mask_presence_percent=0.25,
                           progress_callback=None, only_new_candidates=True,
                           epsilon=0.5, batch_size: int = 64) -> List[int]:
    """Greedy max-min cycle-dissimilarity frame selection.

    keys:       [N, h, w, Ck]  (channels-last; from extract_keys)
    shrinkages: [N, h, w, 1]
    selections: [N, h, w, Ck]
    masks:      list of [O, H, W] float arrays (predicted or provided)
    Returns chosen frame indices (only the new ones when only_new_candidates).
    """
    from tqdm import tqdm

    assert len(keys) == len(masks)
    assert len(keys) > 0
    assert num_next_candidates > 0
    assert len(previously_chosen_candidates) > 0
    assert 0.0 <= alpha <= 1.0
    assert min_mask_presence_percent >= 0
    assert len(previously_chosen_candidates) < len(keys)

    n = len(keys)
    h, w = keys.shape[1:3]
    ck = keys.shape[-1]
    hw = h * w

    masks_validity = np.full(n, True)
    composite = np.empty((n, hw, ck), np.float32)
    invalid = 0
    for i, mask in enumerate(masks):
        mask = np.asarray(mask)
        if mask.ndim == 2:
            mask = mask[None]
        mask_bin = mask.max(axis=0)                       # union of objects
        ratio = (mask_bin > epsilon).sum() / mask_bin.size * 100
        if ratio < min_mask_presence_percent and i not in previously_chosen_candidates:
            masks_validity[i] = False
            invalid += 1
            composite[i] = 0
            continue
        m = resize_nearest_np(mask.max(axis=0, keepdims=True), (h, w))[0]
        ck_i = keys[i].reshape(hw, ck)
        comp = ck_i * m.reshape(hw, 1)
        composite[i] = comp * alpha + ck_i * (1 - alpha)

    print(f'Frames with invalid (empty or too small) masks: {invalid} / {len(masks)}')

    comp_j = jnp.asarray(composite)                        # [N, HW, Ck]
    shr_j = jnp.asarray(shrinkages.reshape(n, hw))
    sel_j = jnp.asarray(selections.reshape(n, hw, ck))
    validity_j = jnp.asarray(masks_validity)

    chosen = list(previously_chosen_candidates)
    # running min over chosen candidates of d(c, j) for each frame j
    dmin = jnp.full((n,), jnp.inf)

    def min_against(c_idx, dmin):
        out = []
        for s in range(0, n, batch_size):
            e = min(s + batch_size, n)
            d = _cycle_dissim_batch(comp_j[c_idx], shr_j[c_idx], sel_j[c_idx],
                                    comp_j[s:e], shr_j[s:e], sel_j[s:e])
            out.append(d)
        d_all = jnp.concatenate(out)
        return jnp.minimum(dmin, d_all)

    for c in chosen:
        dmin = min_against(c, dmin)

    it = range(num_next_candidates)
    if print_progress:
        it = tqdm(it, desc='Iteratively picking the most dissimilar frames')
    for i in it:
        scores = jnp.where(validity_j, dmin, 0.0)
        new_c = int(jnp.argmax(scores))
        chosen.append(new_c)
        dmin = min_against(new_c, dmin)
        if progress_callback is not None:
            progress_callback.emit(i + 1)

    if only_new_candidates:
        return chosen[len(previously_chosen_candidates):]
    return chosen
