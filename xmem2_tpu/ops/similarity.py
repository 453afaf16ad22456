"""Anisotropic-L2 memory affinity math — the per-frame hot kernel.

Numerical parity targets in the reference repo (model/memory_util.py:7-80):
  - get_similarity: shrinkage-scaled anisotropic L2 similarity between memory
    keys and query keys with a per-query-channel selection term
  - do_softmax(top_k): exact top-k softmax, zeros outside the top-k. (We add
    max-subtraction — a mathematical no-op the reference skips — because the
    reference's "scores <= 0" bound can be violated by fp cancellation.)
  - readout: value readout through the affinity

TPU-first design notes:
  * Query-major layout: similarity is [P, N] (P = query pixels, N = memory
    elements), so top-k runs over the trailing axis (lane dimension) and both
    matmuls hit the MXU with contiguous operands.
  * All functions are mask-driven: invalid memory slots (fixed-capacity ring
    buffers are masked, never resized) get -inf scores, which top-k + exp turn
    into exact zeros. This reproduces the reference's per-object-group ragged
    softmax (inference/memory_manager.py:99-120) with a single static-shape
    kernel.
  * A fused Pallas kernel with the same contract lives in
    xmem2_tpu/ops/readout_kernel.py; this module is the jnp reference
    implementation and the fallback for CPU tests.
"""

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # used instead of -jnp.inf so exp() gives exact 0 without nan risk

# f32 inputs go through the MXU at full precision (bf16 inputs are unaffected:
# they are already native MXU operands with f32 accumulation).
_PRECISION = jax.lax.Precision.HIGHEST

_TOPK_BLOCK = 512  # level-1 block for the two-level exact top-k


def top_k_values(sim: jnp.ndarray, k: int) -> jnp.ndarray:
    """Exact top-k VALUES over the trailing axis, two-level blockwise.

    XLA's TopK on TPU sorts each full row; splitting rows into blocks, taking
    each block's top-k, and reducing over the k*n_blocks candidates is exact
    (the global top-k is contained in the union of block top-ks) and ~5x
    faster at memory-bank widths (measured 160ms -> 33ms at [1620, 34428]).
    Only values are returned — the softmax stats (tau, max, Z) need no
    indices."""
    n = sim.shape[-1]
    k = min(k, n)
    bs = _TOPK_BLOCK
    if n <= 2 * bs or k >= bs:
        return jax.lax.top_k(sim, k)[0]
    lead = sim.shape[:-1]
    nb = n // bs
    blocks = sim[..., :nb * bs].reshape(lead + (nb, bs))
    cand = jax.lax.top_k(blocks, k)[0].reshape(lead + (nb * k,))
    if n % bs:
        cand = jnp.concatenate([cand, sim[..., nb * bs:]], axis=-1)
    return jax.lax.top_k(cand, k)[0]


def get_similarity(
    mk: jnp.ndarray,
    ms: Optional[jnp.ndarray],
    qk: jnp.ndarray,
    qe: Optional[jnp.ndarray],
    accum_dtype=jnp.float32,
    amp: bool = False,
) -> jnp.ndarray:
    """Similarity between memory keys and query keys.

    Args:
      mk: [N, Ck] memory keys.
      ms: [N] memory shrinkage (>= 1), or None.
      qk: [P, Ck] query keys.
      qe: [P, Ck] query selection in [0, 1], or None.
      amp: run the MXU at Precision.HIGH (3-pass bf16x3) instead of
        HIGHEST (6-pass) — the TPU analog of the reference's autocast
        similarity (memory_util.py:7-32 under run_on_video.py:75). Unlike
        casting operands to bf16 outright, bf16x3 keeps ~f32 accuracy
        (~2^-21 relative), so the downstream top-k SELECTION is stable —
        the similarity feeds a discrete top-k whose membership flips under
        bf16 operand rounding would discretely change the readout. The
        value readout itself (the dominant matmul) still runs native bf16
        in AMP mode; selection math gets the accurate-but-fast tier.

    Returns:
      sim: [P, N] similarity (note: transposed w.r.t. the reference's B x N x HW
      layout; query-major is the TPU-friendly orientation).

    With selection:   sim[p,n] = -sum_c qe[p,c] * (mk[n,c] - qk[p,c])^2
    Without:          sim[p,n] = -||mk[n]||^2 + 2 mk[n].qk[p]
    Then scaled by ms[n] / sqrt(Ck).
    """
    ck = mk.shape[-1]
    if amp:
        cast, prec = (lambda x: x), jax.lax.Precision.HIGH
    else:
        cast, prec = (lambda x: x), _PRECISION
    if qe is not None:
        # -a_sq + two_ab - b_sq, computed as two MXU matmuls + a row reduction
        a_sq = jnp.matmul(cast(qe), cast((mk * mk)).T,
                          preferred_element_type=accum_dtype, precision=prec)  # [P, N]
        two_ab = 2.0 * jnp.matmul(cast(qk * qe), cast(mk).T,
                                  preferred_element_type=accum_dtype, precision=prec)
        b_sq = jnp.sum(qe * qk * qk, axis=-1, keepdims=True).astype(accum_dtype)  # [P, 1]
        sim = -a_sq + two_ab - b_sq
    else:
        a_sq = jnp.sum(mk * mk, axis=-1).astype(accum_dtype)  # [N]
        two_ab = 2.0 * jnp.matmul(cast(qk), cast(mk).T,
                                  preferred_element_type=accum_dtype, precision=prec)
        sim = -a_sq[None, :] + two_ab

    if ms is not None:
        sim = sim * ms[None, :].astype(accum_dtype)
    return sim / math.sqrt(ck)


def get_similarity_padded(
    mk: jnp.ndarray,
    ms: Optional[jnp.ndarray],
    qk: jnp.ndarray,
    qe: Optional[jnp.ndarray],
    pp: int,
    nn: int,
    amp: bool = False,
) -> jnp.ndarray:
    """get_similarity emitted directly at padded shape [pp, nn] via ONE matmul.

    The fused readout kernels tile sim in [256, 512] blocks; padding the [P, N]
    product after the fact is a full-array HBM copy (262 MB at chunked-query
    scale — it showed up as the #4 op in the r5 device profile). Instead the
    SMALL operands are padded (qk/qe rows, mk/ms columns) and the whole
    similarity — both matmul terms, the b_sq row term, the shrinkage scale and
    the 1/sqrt(Ck) — is folded into a single augmented matmul epilogue, so
    exactly one [pp, nn] array is ever written:

        lhs = [qe, 2*qk*qe, b_sq]   [P, 2Ck+1]
        rhs = [-mk*mk, mk, -1]      [N, 2Ck+1]
        sim = (lhs @ rhs.T) * (ms / sqrt(Ck))   # scale fused as epilogue

    (without selection: lhs = [2*qk, 1], rhs = [mk, -a_sq].)

    Padded columns yield sim = 0 — NOT -inf. Callers must mask them via the
    (zero-padded) valid planes, which both fused kernels already do. Math and
    precision tier match get_similarity exactly (same operands, same HIGH /
    HIGHEST MXU passes, f32 accumulation); only the association of the +/-
    terms moves into the dot, which is bit-equivalent because each output
    element accumulates the same addends in f32.
    """
    ck = mk.shape[-1]
    p, n = qk.shape[0], mk.shape[0]
    prec = jax.lax.Precision.HIGH if amp else _PRECISION
    scale = 1.0 / math.sqrt(ck)
    if ms is not None:
        col = (ms.astype(jnp.float32) * scale)
    else:
        col = jnp.full((n,), scale, jnp.float32)
    col = jnp.pad(col, (0, nn - n))

    if qe is not None:
        b_sq = jnp.sum(qe * qk * qk, axis=-1, keepdims=True)       # [P, 1]
        lhs = jnp.concatenate([qe, 2.0 * qk * qe, b_sq], axis=-1)  # [P, 2Ck+1]
        rhs = jnp.concatenate([-mk * mk, mk,
                               -jnp.ones((n, 1), mk.dtype)], axis=-1)
    else:
        a_sq = jnp.sum(mk * mk, axis=-1, keepdims=True)            # [N, 1]
        lhs = jnp.concatenate([2.0 * qk, jnp.ones((p, 1), qk.dtype)], axis=-1)
        rhs = jnp.concatenate([mk, -a_sq], axis=-1)
    lhs = jnp.pad(lhs, ((0, pp - p), (0, 0)))
    rhs = jnp.pad(rhs, ((0, nn - n), (0, 0)))
    sim = jnp.matmul(lhs, rhs.T, preferred_element_type=jnp.float32,
                     precision=prec)
    return sim * col[None, :]


def softmax_w_top(
    sim: jnp.ndarray,
    top_k: int,
    valid: Optional[jnp.ndarray] = None,
    return_usage: bool = False,
):
    """Exact top-k softmax over the trailing (memory) axis.

    Args:
      sim: [P, N] similarities.
      top_k: number of entries kept per query.
      valid: optional [N] bool mask of valid memory slots. Invalid slots never
        receive probability mass (this is how ragged per-group extents and
        ring-buffer capacities are expressed).
      return_usage: additionally return usage[n] = sum_p affinity[p, n].

    Returns:
      affinity [P, N] dense (zeros outside the per-query top-k),
      optionally usage [N].

    Matches reference do_softmax (model/memory_util.py:41-54): exp is applied
    to the raw top-k values with no max subtraction.
    """
    if valid is not None:
        sim = jnp.where(valid[None, :], sim, NEG_INF)

    top_k = min(top_k, sim.shape[-1])  # tiny memories degrade to full softmax
    vals, idx = jax.lax.top_k(sim, top_k)  # [P, k], sorted descending
    # Max-subtraction is a mathematical no-op for softmax but prevents overflow
    # (the reference skips it, model/memory_util.py:48, relying on sim <= 0;
    # that bound is violated by fp cancellation when keys are large).
    vals = vals - vals[..., :1]
    ex = jnp.exp(jnp.where(vals <= NEG_INF * 0.5, -jnp.inf, vals))
    ex = ex / jnp.sum(ex, axis=-1, keepdims=True)

    # Scatter the normalized top-k weights back to a dense [P, N] affinity.
    affinity = jnp.zeros(sim.shape, dtype=ex.dtype)
    p_idx = jnp.broadcast_to(
        jax.lax.broadcasted_iota(jnp.int32, idx.shape, 0), idx.shape
    )
    affinity = affinity.at[p_idx, idx].set(ex, mode='drop')

    if return_usage:
        return affinity, jnp.sum(affinity, axis=0)
    return affinity


def topk_sparse_softmax(
    sim: jnp.ndarray,
    top_k: int,
    valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k softmax that stays sparse: returns (weights [P,k], indices [P,k]).

    Same numerics as softmax_w_top but without materializing the dense [P, N]
    affinity — used by the gather-based readout path.
    """
    if valid is not None:
        sim = jnp.where(valid[None, :], sim, NEG_INF)
    top_k = min(top_k, sim.shape[-1])  # tiny memories degrade to full softmax
    vals, idx = jax.lax.top_k(sim, top_k)
    vals = vals - vals[..., :1]  # see softmax_w_top: no-op mathematically
    ex = jnp.exp(jnp.where(vals <= NEG_INF * 0.5, -jnp.inf, vals))
    ex = ex / jnp.sum(ex, axis=-1, keepdims=True)
    return ex, idx


def masked_softmax(sim: jnp.ndarray, valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Full (non-top-k) softmax over the trailing axis with optional validity.

    Matches reference do_softmax without top_k (model/memory_util.py:55-59):
    max-subtracted for stability.
    """
    if valid is not None:
        sim = jnp.where(valid[None, :], sim, NEG_INF)
    m = jnp.max(sim, axis=-1, keepdims=True)
    ex = jnp.exp(sim - m)
    return ex / jnp.sum(ex, axis=-1, keepdims=True)


def readout(affinity: jnp.ndarray, mv: jnp.ndarray, out_dtype=None) -> jnp.ndarray:
    """Value readout: [P, N] @ [N, Cv] -> [P, Cv] (reference memory_util.py:73-80)."""
    out = jnp.matmul(affinity, mv, preferred_element_type=jnp.float32, precision=_PRECISION)
    if out_dtype is not None:
        out = out.astype(out_dtype)
    return out


def sparse_readout(weights: jnp.ndarray, idx: jnp.ndarray, mv: jnp.ndarray) -> jnp.ndarray:
    """Gather-based readout from sparse top-k affinity.

    weights/idx: [P, k] from topk_sparse_softmax; mv: [N, Cv].
    Returns [P, Cv]. FLOPs O(P*k*Cv) instead of O(P*N*Cv).
    """
    gathered = jnp.take(mv, idx, axis=0)  # [P, k, Cv]
    return jnp.einsum('pk,pkc->pc', weights, gathered,
                      preferred_element_type=jnp.float32, precision=_PRECISION)


def sparse_usage(weights: jnp.ndarray, idx: jnp.ndarray, n: int) -> jnp.ndarray:
    """usage[n] = sum of top-k weights that landed on slot n (scatter-add)."""
    usage = jnp.zeros((n,), dtype=weights.dtype)
    return usage.at[idx.reshape(-1)].add(weights.reshape(-1), mode='drop')


def get_affinity(mk, ms, qk, qe, valid=None):
    """Training-path shorthand: dense softmax of the similarity
    (reference memory_util.py:67-71)."""
    return masked_softmax(get_similarity(mk, ms, qk, qe), valid)
