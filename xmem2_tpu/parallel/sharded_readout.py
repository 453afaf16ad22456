"""Memory-bank sharding across chips — the context-parallel analog.

The reference has no sequence/context parallelism; its long-sequence axis is
the memory size N (SURVEY §2.9/§5.7). For memory banks too large for one
chip's HBM (or to scale readout throughput), the bank is sharded over a mesh
axis: every chip holds N/D slots and the per-frame readout becomes

  1. local similarity [P, N/D] + local exact top-k candidate values
     (ops/similarity.top_k_values — the same blockwise scheme as the fused
     single-chip kernel),
  2. all_gather of the candidates (G*P*k floats, ~200KB — rides ICI),
  3. identical-on-every-chip global softmax stats (tau, max, Z): the global
     top-k of a sharded array is the top-k of the union of per-shard top-ks,
  4. local partial readout through the local values,
  5. psum over the axis -> the exact unsharded readout on every chip.

Exactness: steps 1-5 reproduce ops/similarity.softmax_w_top + readout over
the concatenated bank bit-for-bit up to float addition order (the psum).
Communication: one all_gather of k candidates per query + one psum of the
[O, P, Cv] readout — no raw keys/values ever cross chips.

Usage: `shard_map`ped over a Mesh axis (tests/test_multichip.py drives it on
the 8-virtual-CPU mesh); the `memory` axis name is independent of the 'data'
axis used for training DP.
"""

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xmem2_tpu.ops.similarity import NEG_INF, get_similarity, top_k_values


def _local_readout(mk, ms, qk, qe, values, valid, group_ids, top_k, axis):
    """Per-shard body (runs under shard_map over `axis`)."""
    g = valid.shape[0]
    sim = get_similarity(mk, ms, qk, qe)                  # [P, N/D]

    # local candidates per group
    cands = []
    for gi in range(g):
        simg = jnp.where(valid[gi][None, :], sim, NEG_INF)
        cands.append(top_k_values(simg, min(top_k, simg.shape[-1])))
    local = jnp.stack(cands)                              # [G, P, k_loc]

    # union of every shard's candidates -> exact global stats on all chips
    all_c = jax.lax.all_gather(local, axis, axis=2, tiled=True)  # [G,P,D*k]
    k = min(top_k, all_c.shape[-1])
    vals = jax.lax.top_k(all_c, k)[0]                     # [G, P, k] desc
    rmax = vals[..., 0]                                   # [G, P]
    z = jnp.sum(jnp.exp(vals - rmax[..., None]), axis=-1)
    tau = vals[..., -1]

    # local affinity under the global stats, local partial readout
    out = []
    for o, gi in enumerate(group_ids):
        w = jnp.where((sim >= tau[gi][:, None]) & valid[gi][None, :],
                      jnp.exp(sim - rmax[gi][:, None]), 0.0) / z[gi][:, None]
        out.append(jnp.matmul(w, values[o],
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST))
    partial_read = jnp.stack(out)                         # [O, P, Cv]
    usage0 = jnp.where((sim >= tau[0][:, None]) & valid[0][None, :],
                       jnp.exp(sim - rmax[0][:, None]), 0.0) / z[0][:, None]
    usage = jnp.sum(usage0, axis=0)                       # [N/D] local usage

    return jax.lax.psum(partial_read, axis), usage


def sharded_topk_readout(
    mesh: Mesh,
    mk: jnp.ndarray,           # [N, Ck]   sharded over axis
    ms: Optional[jnp.ndarray],  # [N]
    qk: jnp.ndarray,           # [P, Ck]   replicated
    qe: Optional[jnp.ndarray],  # [P, Ck]
    values: jnp.ndarray,       # [O, N, Cv] sharded over axis (dim 1)
    valid: jnp.ndarray,        # [G, N] bool, sharded over axis (dim 1)
    group_ids: Tuple[int, ...],
    top_k: int,
    axis: str = 'memory',
):
    """Exact top-k softmax readout over a memory bank sharded across `axis`.

    Returns (readout [O, P, Cv] replicated, usage [N] sharded) — numerically
    the single-chip result (ops/similarity path) up to psum addition order.
    """
    try:
        from jax import shard_map  # jax >= 0.8 (check_rep renamed check_vma)
        check_kw = {'check_vma': False}
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map
        check_kw = {'check_rep': False}

    spec_n = P(axis)
    fn = shard_map(
        partial(_local_readout, group_ids=tuple(int(i) for i in group_ids),
                top_k=top_k, axis=axis),
        mesh=mesh,
        in_specs=(spec_n, spec_n if ms is not None else None,
                  P(), P() if qe is not None else None,
                  P(None, axis, None), P(None, axis)),
        out_specs=(P(), spec_n),
        **check_kw,
    )
    return fn(mk, ms, qk, qe, values, valid)


def _local_readout_multi(qk, qe, *segments_flat, group_ids, top_k, axis,
                         n_seg, has_ms, has_qe):
    """Per-shard body over MULTIPLE memory segments sharing one global top-k
    (the sharded analog of ops/readout_kernel.fused_topk_readout_multi, i.e.
    of MemoryManager._match_kernel's [long | temp | perm] layout)."""
    segs = [segments_flat[i * 4:(i + 1) * 4] for i in range(n_seg)]
    g = segs[0][3].shape[0]
    if not has_qe:
        qe = None

    sims, valids = [], []
    for mk, ms, values, valid in segs:
        sims.append(get_similarity(mk, ms if has_ms else None, qk, qe))
        valids.append(valid)

    # local candidates per group, across every segment
    cands = []
    for gi in range(g):
        per_seg = []
        for sim, valid in zip(sims, valids):
            simg = jnp.where(valid[gi][None, :], sim, NEG_INF)
            per_seg.append(top_k_values(simg, min(top_k, simg.shape[-1])))
        merged = per_seg[0] if len(per_seg) == 1 else \
            jnp.concatenate(per_seg, axis=-1)
        k_loc = min(top_k, merged.shape[-1])
        cands.append(jax.lax.top_k(merged, k_loc)[0])
    local = jnp.stack(cands)                              # [G, P, k_loc]

    # union of every shard's candidates -> exact global stats on all chips
    all_c = jax.lax.all_gather(local, axis, axis=2, tiled=True)  # [G,P,D*k]
    k = min(top_k, all_c.shape[-1])
    vals = jax.lax.top_k(all_c, k)[0]                     # [G, P, k] desc
    rmax = vals[..., 0]                                   # [G, P]
    z = jnp.sum(jnp.exp(vals - rmax[..., None]), axis=-1)
    tau = vals[..., -1]

    # local affinity under the global stats; per-segment partial readout
    total = None
    usages = []
    for sim, (mk, ms, values, valid) in zip(sims, segs):
        out = []
        for o, gi in enumerate(group_ids):
            w = jnp.where((sim >= tau[gi][:, None]) & valid[gi][None, :],
                          jnp.exp(sim - rmax[gi][:, None]), 0.0) \
                / z[gi][:, None]
            out.append(jnp.matmul(w, values[o].astype(jnp.float32),
                                  preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.HIGHEST))
        partial_read = jnp.stack(out)                     # [O, P, Cv]
        total = partial_read if total is None else total + partial_read
        usage0 = jnp.where((sim >= tau[0][:, None]) & valid[0][None, :],
                           jnp.exp(sim - rmax[0][:, None]), 0.0) \
            / z[0][:, None]
        usages.append(jnp.sum(usage0, axis=0))            # [N_s/D] local

    return (jax.lax.psum(total, axis), *usages)


def sharded_topk_readout_multi(
    mesh: Mesh,
    segments,                  # [(mk [N,Ck], ms [N]|None, values [O,N,Cv],
                               #   valid [G,N] bool)] — N sharded over axis
    qk: jnp.ndarray,           # [P, Ck]   replicated
    qe: Optional[jnp.ndarray],  # [P, Ck] or None
    group_ids: Tuple[int, ...],
    top_k: int,
    axis: str = 'memory',
):
    """Exact multi-segment top-k readout over memory banks sharded across
    `axis` — the distributed twin of fused_topk_readout_multi: one global
    top-k across all segments AND all shards, per-segment usage.

    Every segment's slot count must divide the axis size. ms/qe presence must
    be uniform across segments (as in MemoryManager, where the selection
    factor is global). Returns (readout [O, P, Cv] replicated,
    [usage [N_s] sharded, per segment]).
    """
    try:
        from jax import shard_map
        check_kw = {'check_vma': False}
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map
        check_kw = {'check_rep': False}

    has_ms = segments[0][1] is not None
    has_qe = qe is not None
    spec_n = P(axis)
    flat, in_specs = [], [P(), P() if has_qe else P()]
    for mk, ms, values, valid in segments:
        # ms slots are filled with a dummy when absent so the flat arity is
        # static; has_ms tells the body to ignore them
        flat += [mk, ms if has_ms else jnp.zeros((mk.shape[0],), mk.dtype),
                 values, valid]
        in_specs += [spec_n, spec_n, P(None, axis, None), P(None, axis)]

    fn = shard_map(
        partial(_local_readout_multi,
                group_ids=tuple(int(i) for i in group_ids), top_k=top_k,
                axis=axis, n_seg=len(segments), has_ms=has_ms, has_qe=has_qe),
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(),) + (spec_n,) * len(segments),
        **check_kw,
    )
    out = fn(qk, qe if has_qe else jnp.zeros_like(qk), *flat)
    return out[0], list(out[1:])


def shard_memory_bank(mesh: Mesh, mk, ms, values, valid, axis: str = 'memory'):
    """Place a memory bank with N sharded over `axis` (helper for callers
    building a distributed bank; N must divide the axis size)."""
    ns = NamedSharding(mesh, P(axis))
    return (jax.device_put(mk, ns),
            jax.device_put(ms, ns) if ms is not None else None,
            jax.device_put(values, NamedSharding(mesh, P(None, axis, None))),
            jax.device_put(valid, NamedSharding(mesh, P(None, axis))))
