"""Fused Pallas TPU kernel for the memory readout hot path.

The per-frame hot op (reference model/memory_util.py:7-80 +
inference/memory_manager.py:61-190) is: anisotropic-L2 similarity between the
query frame and all memory slots, per-object-group top-k softmax, value
readout, and usage accumulation. The straightforward XLA path materializes a
dense [G, HW, N] affinity per group in HBM (hundreds of MB at long-video
scale) and reads it back for G readout matmuls plus a usage reduction.

Split of work here:
  1. XLA computes the dense similarity once (two MXU matmuls) and, per object
     group, its top-k — which yields everything the softmax needs in closed
     form: the row max, the k-th value (inclusion threshold tau), and the
     normalizer Z = sum(exp(vals - max)).
  2. A single-pass Pallas kernel streams similarity/value blocks and fuses:
     threshold masking, exp, normalization, per-object value accumulation
     (MXU), and group-0 usage accumulation. No dense affinity ever reaches
     HBM, no scatter, no per-group affinity copies.

Production layout: memory lives in up to three fixed-capacity stores
([long | temp | perm], xmem2_tpu/memory/manager.py). `fused_topk_readout_multi`
takes the segments separately — the global top-k is the top-k of the
per-segment top-k candidates, and the Pallas pass runs per segment with the
shared softmax stats, so the big value buffers are never concatenated in HBM.

Numerics: identical to the jnp reference path (ops/similarity.py) except on
exact fp ties at the k-th similarity value: the kernel deterministically
includes the WHOLE tied set with exact normalization (the tie count at the
threshold is folded into Z, so weights sum to exactly 1), whereas torch.topk
(reference memory_util.py:45) keeps an arbitrary k-subset of the tie. Ties
require bit-identical memory entries (e.g. ping-pong duplicated long videos);
tests/test_readout_kernel.py pins the readout delta and the end-metric in
that regime.
"""

import functools
import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BQ = 256   # query tile
BN = 512   # memory tile


def _round_up(x, m):
    return (x + m - 1) // m * m


def _make_kernel(n_blocks: int, num_groups: int, group_ids: Tuple[int, ...],
                 cv: int, compute_usage: bool):
    num_objects = len(group_ids)
    # aff is only materialized for groups this call's objects map to (plus
    # group 0 when this call owns the usage output) — with object chunking
    # (see _pallas_pass) that bounds the [BQ, BN] intermediates in VMEM.
    needed_groups = sorted(set(group_ids) | ({0} if compute_usage else set()))

    def kernel(sim_ref, v_ref, valid_ref, tau_ref, rmax_ref, invz_ref,
               qvalid_ref, out_ref, usage_ref, acc_ref):
        """Grid (q_blocks, n_blocks); n is the fast axis, so `acc` accumulates
        the readout across memory blocks for one query block, and the usage
        output block (indexed by n) accumulates across query blocks."""
        qi = pl.program_id(0)
        ni = pl.program_id(1)
        tau = tau_ref[...]                      # [BQ, G]
        rmax = rmax_ref[...]                    # [BQ, G]
        invz = invz_ref[...]                    # [BQ, G]
        qvalid = qvalid_ref[...]                # [BQ, 1]

        @pl.when(ni == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        sim = sim_ref[...]                      # [BQ, BN]
        gv = valid_ref[...]                     # [G, BN] f32
        aff = {}
        for g in needed_groups:
            t = tau[:, g][:, None]
            m = rmax[:, g][:, None]
            z = invz[:, g][:, None]
            # the valid plane must gate the exp itself, not just scale the
            # result: padded sim columns hold 0 (get_similarity_padded), and
            # exp(0 - rmax) overflows to inf for strongly negative rows —
            # inf * 0 would poison the block with NaNs
            w = jnp.where((sim >= t) & (gv[g][None, :] > 0),
                          jnp.exp(sim - m), 0.0)
            aff[g] = w * z * qvalid
        vdt = v_ref.dtype
        for o in range(num_objects):
            # values stream in their storage dtype (bf16 halves the HBM
            # traffic of the dominant operand). bf16 stores (the AMP analog,
            # reference autocast readout memory_util.py:73-80): the affinity
            # rounds to bf16 and the dot runs native bf16 x bf16 -> f32 on
            # the MXU — same operand precision class as the reference's fp16
            # autocast einsum, 1 MXU pass instead of the f32 slow path. f32
            # stores keep the exact f32 dot (matches the jnp path bit-class).
            a = aff[group_ids[o]].astype(vdt) if vdt == jnp.bfloat16 \
                else aff[group_ids[o]]
            acc_ref[:, o * cv:(o + 1) * cv] += jnp.dot(
                a, v_ref[o], preferred_element_type=jnp.float32)

        @pl.when(qi == 0)
        def _():
            usage_ref[...] = jnp.zeros_like(usage_ref)
        if compute_usage:
            usage_ref[0, :] += jnp.sum(aff[0], axis=0)

        @pl.when(ni == n_blocks - 1)
        def _():
            out_ref[...] = acc_ref[...]

    return kernel


# Scoped-VMEM budget for one streamed-readout pallas call; Mosaic's hard
# scoped-vmem limit on v5e is 16MB, leave headroom for the compiler's own
# staging. Per chunked object the call holds a double-buffered value block
# (storage dtype — bf16 stores halve it) plus f32 acc scratch + out block;
# the double-buffered sim block is shared across objects, and each DISTINCT
# group in the chunk (plus group 0 on the usage-computing first chunk)
# materializes its own [BQ, BN] f32 affinity buffer. An unchunked 8-object
# f32 call at Cv=512 wants ~21MB and hard-fails Mosaic (seen in the r3
# bench); bf16 stores fit 8 objects in two calls instead of eight.
_VMEM_BUDGET = 12 * 1024 * 1024


def _chunk_bounds(group_ids, cv: int, val_itemsize: int = 4,
                  budget: int = _VMEM_BUDGET):
    """Greedy object chunking under the VMEM budget, charging one [BQ, BN]
    f32 affinity buffer per DISTINCT group a chunk touches (the earlier
    fixed 3-buffer estimate under-counted multi-group chunks, which could
    push a chunk past Mosaic's 16MB hard cap). Returns [(start, end)) pairs
    covering range(len(group_ids)); every chunk takes at least one object."""
    per_obj = 2 * BN * cv * val_itemsize + 2 * BQ * cv * 4
    aff_buf = BQ * BN * 4
    sim_shared = 2 * BQ * BN * 4
    bounds = []
    i, n = 0, len(group_ids)
    while i < n:
        groups = {0} if not bounds else set()  # first chunk computes usage
        cost = sim_shared + len(groups) * aff_buf
        j = i
        while j < n:
            extra = per_obj + (aff_buf if group_ids[j] not in groups else 0)
            if j > i and cost + extra > budget:
                break
            cost += extra
            groups.add(group_ids[j])
            j += 1
        bounds.append((i, j))
        i = j
    return bounds


def _pallas_pass_chunk(sim_p, v_p, valid_p, tau_p, rmax_p, invz_p, qvalid,
                       group_ids, compute_usage, interpret):
    """One pallas call over a chunk of objects. Padded inputs; returns
    (out [PP, o*Cv], usage [1, NN])."""
    pp, nn = sim_p.shape
    o, _, cv = v_p.shape
    g = valid_p.shape[0]

    kernel = _make_kernel(nn // BN, g, tuple(int(x) for x in group_ids), cv,
                          compute_usage)

    return pl.pallas_call(
        kernel,
        grid=(pp // BQ, nn // BN),
        in_specs=[
            pl.BlockSpec((BQ, BN), lambda i, j: (i, j)),         # sim
            pl.BlockSpec((o, BN, cv), lambda i, j: (0, j, 0)),   # values
            pl.BlockSpec((g, BN), lambda i, j: (0, j)),          # valid
            pl.BlockSpec((BQ, g), lambda i, j: (i, 0)),          # tau
            pl.BlockSpec((BQ, g), lambda i, j: (i, 0)),          # rmax
            pl.BlockSpec((BQ, g), lambda i, j: (i, 0)),          # 1/Z
            pl.BlockSpec((BQ, 1), lambda i, j: (i, 0)),          # qvalid
        ],
        out_specs=[
            pl.BlockSpec((BQ, o * cv), lambda i, j: (i, 0)),     # readout
            pl.BlockSpec((1, BN), lambda i, j: (0, j)),          # usage
        ],
        out_shape=[
            jax.ShapeDtypeStruct((pp, o * cv), jnp.float32),
            jax.ShapeDtypeStruct((1, nn), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BQ, o * cv), jnp.float32),               # acc
        ],
        interpret=interpret,
    )(sim_p, v_p, valid_p, tau_p, rmax_p, invz_p, qvalid)


def _pallas_pass(sim, values, valid, tau, rmax, invz, group_ids, interpret,
                 true_p: Optional[int] = None):
    """One streamed segment pass. sim [P,N], values [O,N,Cv], valid [G,N];
    tau/rmax/invz [P,G] shared softmax stats. Returns (out [P,O*Cv] f32
    partial readout, usage [N] f32 group-0 usage).

    Objects are chunked across pallas calls so each call's VMEM footprint
    stays under _VMEM_BUDGET; ≤2-object configs (chair/caps) are a single
    call, identical to the unchunked kernel. The similarity block is
    re-streamed from HBM once per chunk — the value blocks dominate traffic
    so the overhead is small, and usage is only computed by the first call.

    true_p: when the caller already padded the QUERY rows (sim from
    get_similarity_padded), the real row count — padded rows must not leak
    into the usage reduction. Padded sim COLUMNS need no sentinel value:
    the kernel multiplies by the zero-padded valid plane.
    """
    p, n = sim.shape
    o, _, cv = values.shape
    g = valid.shape[0]

    pp, nn = _round_up(p, BQ), _round_up(n, BN)
    pad_q, pad_n = pp - p, nn - n

    sim_p = jnp.pad(sim, ((0, pad_q), (0, pad_n)), constant_values=-jnp.inf)
    # keep values in their storage dtype: padding preserves it, the kernel
    # upcasts per block in VMEM — no HBM-level f32 copy of the bank
    v_p = jnp.pad(values, ((0, 0), (0, pad_n), (0, 0)))
    valid_p = jnp.pad(valid, ((0, 0), (0, pad_n))).astype(jnp.float32)
    qvalid = (jnp.arange(pp) < (p if true_p is None else true_p)) \
        .astype(jnp.float32)[:, None]
    tau_p = jnp.pad(tau, ((0, pad_q), (0, 0)), constant_values=jnp.inf)
    rmax_p = jnp.pad(rmax, ((0, pad_q), (0, 0)))
    invz_p = jnp.pad(invz, ((0, pad_q), (0, 0)))

    outs, usage = [], None
    for c0, c1 in _chunk_bounds(group_ids, cv, v_p.dtype.itemsize):
        out_c, usage_c = _pallas_pass_chunk(
            sim_p, v_p[c0:c1], valid_p, tau_p, rmax_p, invz_p, qvalid,
            group_ids[c0:c1], compute_usage=(c0 == 0), interpret=interpret)
        outs.append(out_c)
        if c0 == 0:
            usage = usage_c

    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
    return out[:p], usage[0, :n]


def _make_cand_kernel(num_groups: int, k: int):
    """Per-block exact top-k VALUES per group, via k-step iterative max with
    tie multiplicities. XLA's sort-based TopK costs ~0.2us/row on TPU; this
    VMEM-resident extraction is ~5-10x cheaper at memory-bank widths and its
    per-block top-k multisets merge exactly (torch.topk tie semantics: exactly
    k entries per block, value-identical tie subsets)."""

    def kernel(sim_ref, valid_ref, out_ref):
        gg = pl.program_id(2)
        sim = sim_ref[...]                       # [BQ, BN]
        gvs = valid_ref[...]                     # [G, BN] f32
        # row-select the grid's group via an iota mask (dynamic sublane
        # indexing is not lowerable; G is tiny so the reduce is free)
        rows = jax.lax.broadcasted_iota(jnp.int32, gvs.shape, 0)
        gv = jnp.sum(jnp.where(rows == gg, gvs, 0.0), axis=0,
                     keepdims=True)              # [1, BN]
        js = jax.lax.broadcasted_iota(jnp.int32, (sim.shape[0], k), 1)
        rem = jnp.where(gv > 0, sim, -jnp.inf)
        out = jnp.full((sim.shape[0], k), -jnp.inf)
        cum = jnp.zeros((sim.shape[0], 1), jnp.int32)
        for _ in range(k):
            m = jnp.max(rem, axis=1, keepdims=True)              # [BQ, 1]
            hit = rem == m
            cnt = jnp.sum(hit, axis=1, keepdims=True).astype(jnp.int32)
            mask = (js >= cum) & (js < cum + cnt)
            out = jnp.where(mask, m, out)
            rem = jnp.where(hit, -jnp.inf, rem)
            cum = cum + cnt
        out_ref[0, 0, :, :] = out

    return kernel


def block_topk_candidates(sim: jnp.ndarray, valid: jnp.ndarray, k: int,
                          interpret: bool = False) -> jnp.ndarray:
    """Per-512-block exact top-k values for every group.

    sim [P, N]; valid [G, N] -> candidates [G, P, nb*k] with nb = ceil(N/BN).
    The global top-k over N equals the top-k over these candidates."""
    p, n = sim.shape
    g = valid.shape[0]
    pp, nn = _round_up(p, BQ), _round_up(n, BN)
    sim_p = jnp.pad(sim, ((0, pp - p), (0, nn - n)),
                    constant_values=-jnp.inf)
    valid_p = jnp.pad(valid, ((0, 0), (0, nn - n))).astype(jnp.float32)
    nb = nn // BN

    out = pl.pallas_call(
        _make_cand_kernel(g, k),
        grid=(pp // BQ, nb, g),
        in_specs=[
            pl.BlockSpec((BQ, BN), lambda i, j, gg: (i, j)),
            pl.BlockSpec((g, BN), lambda i, j, gg: (0, j)),
        ],
        # full-block aligned stores: group and memory-block index the leading
        # output dims (Mosaic constrains only the last two block dims)
        out_specs=pl.BlockSpec((1, 1, BQ, k), lambda i, j, gg: (gg, j, i, 0)),
        out_shape=jax.ShapeDtypeStruct((g, nb, pp, k), jnp.float32),
        interpret=interpret,
    )(sim_p, valid_p)

    cand = out[:, :, :p]                                  # [G, nb, P, k]
    return cand.transpose(0, 2, 1, 3).reshape(g, p, nb * k)


def _tie_corrected_z(z, vals, tau, rmax, sims, valids):
    """Fold boundary ties into the softmax normalizer.

    The streaming pass includes EVERY entry with sim >= tau, so when ties at
    the k-th value extend past the k candidate slots, Z computed from the k
    candidates alone under-counts and the weights would sum above 1. Count
    the tied entries across all segments, subtract the ones already inside
    the candidate list, and add the difference's mass to Z. Exact: without
    boundary ties the correction is identically zero.

    z/tau/rmax [G, P]; vals [G, P, k]; sims list of [P, N]; valids [G, N].
    """
    cnt_in_k = jnp.sum(vals == tau[..., None], axis=-1)       # [G, P] int
    cnt_total = jnp.zeros_like(cnt_in_k)
    for sim, valid in zip(sims, valids):
        eq = (sim[None, :, :] == tau[:, :, None]) & valid[:, None, :]
        cnt_total = cnt_total + jnp.sum(eq, axis=-1)
    # -inf tau/rmax only occur for padded or under-full groups, where the
    # correction must vanish (and exp(-inf - -inf) would be nan).
    tie_w = jnp.where(jnp.isfinite(tau) & jnp.isfinite(rmax),
                      jnp.exp(tau - rmax), 0.0)
    return z + (cnt_total - cnt_in_k).astype(z.dtype) * tie_w


def _topk_stats_fused(sims, valids, top_k: int, interpret: bool):
    """tau/rmax/invz via the Pallas candidate kernel, merge included.

    The obvious merge — `lax.top_k(merged, k)` — is a perf trap: the stats
    consumers (slice row 0 / row k-1 / exp-sum over the last axis) make XLA's
    layout assignment put the sorted axis minor ({2,0,1:T(1,128)}), and a
    lane-minor sort runs ~10x slower than the sublane-tiled one (~5 ms vs
    ~0.5 ms at P=1350, M=330 on v5e). The candidate kernel's iterative-max
    extraction has a pinned custom-call layout and identical top-k-value
    semantics (exactly k slots, tie multiplicities), so it does the merge
    rounds too: each round maps width M -> ceil(M/BN)*k, and the final
    single-block round leaves the k values sorted descending."""
    g = valids[0].shape[0]
    total_n = sum(s.shape[-1] for s in sims)
    k = min(top_k, total_n)
    if k > BN // 2:
        # each merge round maps width M -> ceil(M/BN)*k, which stops
        # shrinking once k > BN/2 (and the candidate kernel unrolls k
        # max-steps, hostile to compile time at that size anyway): use the
        # XLA top-k stats path for large-k configs.
        return _topk_stats(sims, valids, top_k)

    cands = []
    for sim, valid in zip(sims, valids):
        kk = min(k, sim.shape[-1])
        c = block_topk_candidates(sim, valid, kk, interpret=interpret)
        cands.append(c)                                   # [G, P, nb*kk]
    merged = jnp.concatenate(cands, axis=-1)              # [G, P, sum]

    # merge rounds (always >= 1, so the k survivors come out sorted desc);
    # width shrinks strictly while > BN, then one single-block round ends it
    while True:
        ones = jnp.ones((1, merged.shape[-1]), bool)
        merged = jnp.stack([
            block_topk_candidates(merged[gi], ones, k, interpret=interpret)[0]
            for gi in range(g)
        ])                                                # [G, P, nb*k]
        if merged.shape[-1] == k:
            break
    vals = merged                                         # [G, P, k] desc
    rmax = vals[..., 0]
    z = jnp.sum(jnp.exp(vals - rmax[..., None]), axis=-1)
    tau = vals[..., -1]
    z = _tie_corrected_z(z, vals, tau, rmax, sims, valids)
    return (tau.transpose(1, 0), rmax.transpose(1, 0),
            (1.0 / z).transpose(1, 0))


def _topk_stats(sims: Sequence[jnp.ndarray], valids: Sequence[jnp.ndarray],
                top_k: int):
    """Global per-group top-k softmax stats across segments.

    The top-k of a concatenation equals the top-k over the union of the
    per-segment top-k candidates, so segments never get concatenated at
    full width. Returns (tau, rmax, invz), each [P, G]."""
    from xmem2_tpu.ops.similarity import NEG_INF, top_k_values

    g = valids[0].shape[0]
    total_n = sum(s.shape[-1] for s in sims)
    k = min(top_k, total_n)

    vals_g = []
    for gi in range(g):
        cands = []
        for sim, valid in zip(sims, valids):
            simg = jnp.where(valid[gi][None, :], sim, NEG_INF)
            cands.append(top_k_values(simg, min(k, simg.shape[-1])))
        merged = cands[0] if len(cands) == 1 else jnp.concatenate(cands, -1)
        vals_g.append(jax.lax.top_k(merged, k)[0])        # [P, k] desc
    vals = jnp.stack(vals_g)                              # [G, P, k]
    rmax = vals[..., 0]
    z = jnp.sum(jnp.exp(vals - rmax[..., None]), axis=-1)
    tau = vals[..., -1]
    z = _tie_corrected_z(z, vals, tau, rmax, sims, valids)
    return (tau.transpose(1, 0), rmax.transpose(1, 0),
            (1.0 / z).transpose(1, 0))


def fused_topk_readout_multi(
    segments: Sequence[Tuple[jnp.ndarray, Optional[jnp.ndarray],
                             jnp.ndarray, jnp.ndarray]],
    qk: jnp.ndarray,           # [P, Ck]
    qe: Optional[jnp.ndarray],  # [P, Ck] or None
    group_ids: Tuple[int, ...],
    top_k: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """Fused readout over multiple memory segments sharing one global top-k.

    segments: per store, (mk [N,Ck], ms [N] or None, values [O,N,Cv],
    valid [G,N] bool). Returns (readout [O, P, Cv] f32, [usage [N] f32 per
    segment]) — equivalent to the jnp path over the concatenation
    (reference memory_manager.py:61-190), but the dense affinity and the
    concatenated value buffer never reach HBM."""
    from xmem2_tpu.ops.similarity import get_similarity_padded

    # bf16 value stores signal AMP mode (the reference's autocast analog):
    # the similarity matmuls also run with bf16 operands / f32 accumulation
    amp = segments[0][2].dtype == jnp.bfloat16
    p = qk.shape[0]
    pp = _round_up(p, BQ)
    seg_ns = [seg[0].shape[0] for seg in segments]
    # similarity emitted directly at kernel-tile shape: padding the [P, N]
    # product afterwards is a full-size HBM copy (see get_similarity_padded)
    sims = [get_similarity_padded(mk, ms, qk, qe, pp, _round_up(n, BN),
                                  amp=amp)
            for (mk, ms, _, _), n in zip(segments, seg_ns)]
    valids = [jnp.pad(seg[3], ((0, 0), (0, _round_up(n, BN) - n)))
              for seg, n in zip(segments, seg_ns)]
    tau, rmax, invz = _topk_stats_fused(sims, valids, top_k, interpret)

    o = segments[0][2].shape[0]
    cv = segments[0][2].shape[-1]

    out = None
    usages = []
    for sim, (_, _, values, valid), n in zip(sims, segments, seg_ns):
        seg_out, seg_usage = _pallas_pass(sim, values,
                                          jnp.pad(valid, ((0, 0),
                                                  (0, sim.shape[1] - n))),
                                          tau, rmax, invz, group_ids,
                                          interpret, true_p=p)
        out = seg_out if out is None else out + seg_out
        usages.append(seg_usage[:n])

    readout = out[:p].reshape(p, o, cv).transpose(1, 0, 2)       # [O, P, Cv]
    return readout, usages


def fused_topk_readout(
    mk: jnp.ndarray,           # [N, Ck]
    ms: jnp.ndarray,           # [N]
    qk: jnp.ndarray,           # [P, Ck]
    qe: jnp.ndarray,           # [P, Ck] or None
    values: jnp.ndarray,       # [O, N, Cv]
    valid: jnp.ndarray,        # [G, N] bool
    group_ids: Tuple[int, ...],
    top_k: int,
    interpret: bool = False,
):
    """Single-segment convenience wrapper: returns (readout [O, P, Cv] f32,
    usage [N] f32). Equivalent to: per-group softmax_w_top over valid slots,
    per-object readout, group-0 usage (the jnp path in ops/similarity.py)."""
    readout, usages = fused_topk_readout_multi(
        [(mk, ms, values, valid)], qk, qe, group_ids, top_k,
        interpret=interpret)
    return readout, usages[0]
