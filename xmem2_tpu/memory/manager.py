"""MemoryManager — three memory stores + working->long-term consolidation.

Behavioral parity target: reference inference/memory_manager.py (MemoryManager
:8, match_memory :61, add_memory :212, compress_features :316, consolidation
:349, update/remove permanent :192/:204, copy_perm_mem_only :392).

TPU-native redesign:
  * The three stores (temporary working, permanent, long-term) are
    fixed-capacity StoreBuffers; every per-frame operation (match, append,
    usage update, consolidation, eviction) is a jit-compiled static-shape
    kernel. Ragged per-object-group extents are validity masks, not slices.
  * The host keeps integer mirrors of store sizes and object-group structure
    and only orchestrates which kernel to call — no device->host syncs in the
    steady-state loop.
  * Recompiles happen only on rare topology changes: first frame (dimensions
    learned), permanent-store bucket growth, or a new object group appearing.

Known deviations (documented, both reference bugs we do not replicate):
  1. Multi-group + long-term: the reference assumes a group's long-term values
     align to the key suffix even though consolidation appends an arbitrary
     usage-ranked subset (memory_manager.py:105-126). Our per-slot masks track
     true validity; single-group behavior (DAVIS/interactive, all benchmarks)
     matches the reference exactly.
  2. Permanent frame slots: the reference computes the slot of a newly added
     permanent frame as int((total+1e-9)//(frame+1e-9))-1
     (kv_memory_store.py:92); the 1e-9 fudge floors the ratio one short, so
     every frame after the first is registered at the PREVIOUS slot and
     update/remove corrupt the wrong frame. We track slots correctly.
  3. Permanent frame update: the reference broadcasts object-0's value row
     over all objects of a group when updating a frame in place
     (kv_memory_store.py:112 indexes the [O, Cv, N] tensor by group id).
     We update each object's values.
"""

import math
import os
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from xmem2_tpu.memory import store as ST
from xmem2_tpu.memory.store import StoreBuffers
from xmem2_tpu.ops.similarity import (
    get_similarity, masked_softmax, readout, softmax_w_top,
)


# ---------------------------------------------------------------------------
# jitted kernels (pure; static args control the compiled variant)
# ---------------------------------------------------------------------------

def _slice_store(s: StoreBuffers, n: int) -> StoreBuffers:
    """View of the first n slots (free inside jit — a static prefix slice).
    All valid slots live in [0, size) <= n, so matching over the view is
    exact; only dead capacity is skipped."""
    if n >= s.capacity:
        return s
    return StoreBuffers(
        key=s.key[:n], shrinkage=s.shrinkage[:n], selection=s.selection[:n],
        value=s.value[:, :n], val_valid=s.val_valid[:, :n],
        use_count=s.use_count[:n], life_count=s.life_count[:n], size=s.size)


def _pad_usage(usage: jnp.ndarray, cap: int) -> jnp.ndarray:
    return usage if usage.shape[0] == cap else jnp.pad(
        usage, (0, cap - usage.shape[0]))


@partial(jax.jit, static_argnames=('group_ids', 'top_k', 'use_long',
                                   'count_usage', 'count_long_usage',
                                   'fused', 'interpret', 'used_caps',
                                   'use_perm', 'usage_frames'))
def _match_kernel(temp: StoreBuffers, perm: StoreBuffers,
                  long: Optional[StoreBuffers],
                  qk: jnp.ndarray, qe: Optional[jnp.ndarray],
                  *, group_ids: Tuple[int, ...], top_k: int, use_long: bool,
                  count_usage: bool, count_long_usage: bool,
                  fused: bool = False, interpret: bool = False,
                  used_caps: Optional[Tuple[int, ...]] = None,
                  use_perm: bool = True, usage_frames: int = 1):
    """Memory readout across [long | temp | perm] with per-group top-k softmax.

    qk/qe: [HW, Ck]. Returns (readout [O, HW, Cv], temp', long').
    Mirrors reference match_memory (memory_manager.py:61-190): similarity is
    computed once over the concatenation, each object group softmaxes over its
    own valid subset, usage is recorded for temp (and long when enabled) from
    the group-0 affinity.

    usage_frames: life-count advance for this call — a BATCHED readout whose
    qk stacks k frames' queries passes k, reproducing the totals of k
    sequential per-frame readouts (use is additive over queries; affinities
    never depend on usage, so only the totals matter).

    fused=True streams the softmax+readout through the Pallas kernel
    (ops/readout_kernel.py) — no dense [G, HW, N] affinity in HBM; the jnp
    path below is the reference implementation and the CPU fallback.

    used_caps (static, [long,] temp, perm order): bucketed occupied-prefix
    widths — compute scales with how full each store is, not its capacity.
    """
    temp_full, long_full = temp, long
    seg_full = ([long] if use_long else []) + [temp] \
        + ([perm] if use_perm else [])
    if used_caps is not None:
        seg_stores = [_slice_store(s, n) for s, n in zip(seg_full, used_caps)]
    else:
        seg_stores = seg_full
    ti = 1 if use_long else 0     # index of temp in the segment lists
    valids = [s.val_valid & s.slot_valid()[None, :] for s in seg_stores]

    if fused:
        from xmem2_tpu.ops.readout_kernel import fused_topk_readout_multi
        segments = [(s.key, s.shrinkage, s.value, v)
                    for s, v in zip(seg_stores, valids)]
        out, usages = fused_topk_readout_multi(
            segments, qk, qe, group_ids, top_k, interpret=interpret)
        if use_long and count_long_usage:
            long = ST.update_usage(
                long_full, _pad_usage(usages[0], long_full.capacity),
                frames=usage_frames)
        if count_usage:
            temp = ST.update_usage(
                temp_full, _pad_usage(usages[ti], temp_full.capacity),
                frames=usage_frames)
        return out, temp, long

    # bf16 value stores signal AMP mode (reference autocast analog): the
    # similarity and readout matmuls run with bf16 operands / f32 accum —
    # the same semantics as the fused kernel so the two paths stay
    # equivalent within either mode
    amp = seg_stores[0].value.dtype == jnp.bfloat16
    sims = [get_similarity(s.key, s.shrinkage, qk, qe, amp=amp)
            for s in seg_stores]
    caps = [s.capacity for s in seg_stores]

    sim = jnp.concatenate(sims, axis=-1)              # [HW, N]
    valid = jnp.concatenate(valids, axis=-1)          # [G, N]

    aff = jax.vmap(lambda v: softmax_w_top(sim, top_k, valid=v))(valid)  # [G, HW, N]

    # per-object readout: objects use their group's affinity
    gids = jnp.asarray(group_ids, jnp.int32)
    aff_obj = jnp.take(aff, gids, axis=0)             # [O, HW, N]
    off = 0
    out = None
    for s, cap in zip(seg_stores, caps):
        seg_aff = jax.lax.slice_in_dim(aff_obj, off, off + cap, axis=-1)
        if amp:
            contrib = jnp.einsum('opn,onc->opc',
                                 seg_aff.astype(jnp.bfloat16), s.value,
                                 preferred_element_type=jnp.float32)
        else:
            contrib = jnp.einsum('opn,onc->opc', seg_aff,
                                 s.value.astype(jnp.float32),
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
        out = contrib if out is None else out + contrib
        off += cap

    # usage bookkeeping from the group-0 affinity (reference :93-95, :133-141)
    if count_usage or count_long_usage:
        usage_vec = jnp.sum(aff[0], axis=0)           # [N]
        off = 0
        if use_long:
            if count_long_usage:
                long = ST.update_usage(
                    long_full,
                    _pad_usage(jax.lax.slice_in_dim(usage_vec, 0, caps[0]),
                               long_full.capacity), frames=usage_frames)
            off += caps[0]
        if count_usage:
            temp = ST.update_usage(
                temp_full,
                _pad_usage(jax.lax.slice_in_dim(usage_vec, off, off + caps[ti]),
                           temp_full.capacity), frames=usage_frames)
    return out, temp, long


@partial(jax.jit, static_argnames=('num_prototypes', 'min_work_elements',
                                   'group_ids', 'use_selection'))
def _consolidate_kernel(temp: StoreBuffers, long: StoreBuffers,
                        *, num_prototypes: int, min_work_elements: int,
                        group_ids: Tuple[int, ...], use_selection: bool):
    """Working->long-term consolidation (reference compress_features +
    consolidation, memory_manager.py:316-390):
      1. candidates = slots [0, size - min_work_elements)
      2. prototypes = top-num_prototypes candidates by usage
      3. potentiation: prototype values = candidate values attended onto the
         prototype keys (dense softmax per object group)
      4. prototypes appended to long-term; candidate range compacted away
    """
    cap = temp.capacity
    idx = jnp.arange(cap)
    cand_end = temp.size - min_work_elements
    cand_mask = idx < cand_end

    u = jnp.where(cand_mask, ST.usage(temp), -jnp.inf)
    top_vals, proto_idx = jax.lax.top_k(u, num_prototypes)   # sorted desc
    proto_ok = top_vals > -jnp.inf                            # [P]

    proto_key = jnp.take(temp.key, proto_idx, axis=0)         # [P, Ck]
    proto_sel = jnp.take(temp.selection, proto_idx, axis=0) if use_selection else None

    # potentiation: memory = candidates, queries = prototypes -> [P, cap]
    sim = get_similarity(temp.key, temp.shrinkage, proto_key, proto_sel)

    g_valid = temp.val_valid & cand_mask[None, :]             # [G, cap]
    aff = jax.vmap(lambda v: masked_softmax(sim, valid=v))(g_valid)  # [G, P, cap]

    gids = jnp.asarray(group_ids, jnp.int32)
    aff_obj = jnp.take(aff, gids, axis=0)                     # [O, P, cap]
    proto_value = jnp.einsum('opn,onc->opc', aff_obj,
                             temp.value.astype(jnp.float32),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)  # [O, P, Cv]
    proto_shrinkage = readout(aff[0], temp.shrinkage[:, None])[:, 0]  # [P]

    # prototype validity per group: chosen slot must be valid for the group
    proto_group_valid = (jnp.take(temp.val_valid, proto_idx, axis=1)
                         & proto_ok[None, :])                 # [G, P]

    long = ST.append(long, proto_key, proto_shrinkage, None, proto_value,
                     proto_group_valid)
    temp = ST.remove_range(temp, jnp.int32(0), cand_end)
    return temp, long


def _readout_mode() -> Tuple[bool, bool]:
    """(fused, interpret) for the readout path.

    XMEM2_FUSED_READOUT: 'auto' (default) = Pallas kernel on TPU, jnp path
    elsewhere; '1' = force kernel; '0' = force jnp; 'interpret' = kernel in
    interpret mode (CPU parity testing)."""
    mode = os.environ.get('XMEM2_FUSED_READOUT', 'auto').lower()
    if mode == '1':
        return True, False
    if mode == '0':
        return False, False
    if mode == 'interpret':
        return True, True
    return jax.default_backend() == 'tpu', False


_evict_kernel = jax.jit(ST.evict_by_usage)
_append_kernel = jax.jit(ST.append)
_replace_kernel = jax.jit(ST.replace_at)
_remove_range_kernel = jax.jit(ST.remove_range)
_update_usage_kernel = jax.jit(ST.update_usage)


# ---------------------------------------------------------------------------
# host-side manager
# ---------------------------------------------------------------------------

class MemoryManager:
    """Host-side orchestrator with the reference MemoryManager's API surface."""

    def __init__(self, config: dict):
        self.config = config
        self.hidden_dim = config['hidden_dim']
        self.top_k = config['top_k']

        self.enable_long_term = config['enable_long_term']
        self.enable_long_term_usage = config['enable_long_term_count_usage']
        if self.enable_long_term:
            self.max_mt_frames = config['max_mid_term_frames']
            self.min_mt_frames = config['min_mid_term_frames']
            self.num_prototypes = config['num_prototypes']
            self.max_long_elements = config['max_long_term_elements']
        self.perm_bucket_frames = config.get('permanent_buffer_frames', 4)

        # memory-value storage dtype: 'bfloat16' halves HBM footprint and
        # readout bandwidth (the AMP analog of the reference's fp16 autocast,
        # run_on_video.py:75); 'float32' keeps bit-parity with the torch-f32
        # oracle; 'auto' (default) resolves per backend (bf16 on TPU)
        from xmem2_tpu.config import resolve_dtype_name
        self.value_dtype = jnp.bfloat16 \
            if resolve_dtype_name(config.get('value_store_dtype', 'auto')) \
            == 'bfloat16' else jnp.float32

        # multi-chip memory-bank sharding (SURVEY §5.7 / §2.9 CP analog):
        # memory_shards > 1 shards every store's slot axis over a `memory`
        # mesh axis; match_memory dispatches to the exact sharded readout
        # (parallel/sharded_readout.py). The reference has no equivalent —
        # its bank is bounded by one GPU's VRAM.
        self.memory_shards = int(config.get('memory_shards', 0) or 0)
        self.memory_mesh = None
        if self.memory_shards > 1:
            from xmem2_tpu.parallel.mesh import memory_mesh
            self.memory_mesh = memory_mesh(self.memory_shards)

        # host-DRAM spill of evicted long-term elements (SURVEY §5.7)
        self.spill_long_term = bool(config.get('spill_long_term', False))
        self.archive = None
        if self.spill_long_term:
            from xmem2_tpu.memory.spill import HostArchive
            self.archive = HostArchive()

        self.CK = self.CV = None
        self.H = self.W = self.HW = None

        self.hidden = None  # [1, O, h, w, Ch]

        self.temp: Optional[StoreBuffers] = None
        self.perm: Optional[StoreBuffers] = None
        self.long: Optional[StoreBuffers] = None

        # host mirrors / topology
        self.temp_size = 0
        self.perm_size = 0
        self.long_size = 0
        self.obj_groups: List[List[int]] = []   # 0-based object ids per group
        self.all_objects: List[int] = []
        self.frame_id_to_permanent_mem_idx: Dict[int, int] = {}

        self.reset_config = True

    # -- config ------------------------------------------------------------
    def update_config(self, config: dict):
        self.reset_config = True
        self.hidden_dim = config['hidden_dim']
        self.top_k = config['top_k']
        assert self.enable_long_term == config['enable_long_term'], 'cannot update this'
        self.enable_long_term_usage = config['enable_long_term_count_usage']
        if self.enable_long_term:
            old_max_long = self.max_long_elements
            self.max_mt_frames = config['max_mid_term_frames']
            self.min_mt_frames = config['min_mid_term_frames']
            self.num_prototypes = config['num_prototypes']
            self.max_long_elements = config['max_long_term_elements']
            # Raising the long-term cap frees capacity — the production
            # moment to pull spilled rows back from host DRAM (e.g. the GUI
            # "max long-term" slider, reference gui.py:1120-1128 analog).
            if (self.spill_long_term and self.long is not None
                    and self.max_long_elements > old_max_long):
                need = self.max_long_elements + self.num_prototypes
                if self.long.capacity < need:
                    self.long = ST.grow(self.long, need,
                                        self.long.num_objects,
                                        self.long.num_groups)
                self.revive_from_archive()

    # -- helpers -----------------------------------------------------------
    @property
    def sharded(self) -> bool:
        return self.memory_mesh is not None

    def _round_shards(self, cap: int) -> int:
        """Round a capacity up so the slot axis divides the memory mesh."""
        if not self.sharded:
            return cap
        d = self.memory_shards
        return -(-cap // d) * d

    def _place_store(self, s: Optional[StoreBuffers]) -> Optional[StoreBuffers]:
        """Pin a store's buffers sharded over the `memory` axis (slot dim).
        A no-op for already-correctly-placed buffers, so calling it after
        every (rare) mutation keeps placement deterministic without copies
        in the steady state."""
        if s is None or not self.sharded:
            return s
        from jax.sharding import NamedSharding, PartitionSpec as P
        m = self.memory_mesh
        sl = NamedSharding(m, P('memory'))          # [N] / [N, Ck]
        sv = NamedSharding(m, P(None, 'memory'))    # [G, N] / [O, N, Cv]
        rep = NamedSharding(m, P())
        return StoreBuffers(
            key=jax.device_put(s.key, sl),
            shrinkage=jax.device_put(s.shrinkage, sl),
            selection=(jax.device_put(s.selection, sl)
                       if s.selection is not None else None),
            value=jax.device_put(s.value, NamedSharding(
                m, P(None, 'memory', None))),
            val_valid=jax.device_put(s.val_valid, sv),
            use_count=jax.device_put(s.use_count, sl),
            life_count=jax.device_put(s.life_count, sl),
            size=jax.device_put(s.size, rep))

    @property
    def num_groups(self) -> int:
        return len(self.obj_groups)

    @property
    def num_objects(self) -> int:
        return len(self.all_objects)

    @property
    def group_ids(self) -> Tuple[int, ...]:
        gids = [0] * self.num_objects
        for gi, group in enumerate(self.obj_groups):
            for o in group:
                gids[self.all_objects.index(o)] = gi
        return tuple(gids)

    def _ensure_dims(self, key: jnp.ndarray):
        if self.H is None or self.reset_config:
            self.reset_config = False
            self.H, self.W = key.shape[1:3]
            self.HW = self.H * self.W
            if self.enable_long_term:
                self.min_work_elements = self.min_mt_frames * self.HW
                self.max_work_elements = self.max_mt_frames * self.HW
            else:
                # without long-term memory the working store is unbounded in
                # the reference; we bucket its capacity and grow on demand
                self.min_work_elements = self.max_work_elements = None

    def _temp_capacity(self) -> int:
        if self.enable_long_term:
            return self._round_shards(self.max_work_elements + self.HW)
        # growable bucket: at least 32 frames
        need = max(self.temp_size + self.HW, 32 * self.HW)
        cap = 32 * self.HW
        while cap < need:
            cap *= 2
        return self._round_shards(cap)

    def _perm_capacity(self) -> int:
        need = max(self.perm_size + self.HW, self.perm_bucket_frames * self.HW)
        cap = self.perm_bucket_frames * self.HW
        while cap < need:
            cap *= 2
        return self._round_shards(cap)

    def _new_store(self, capacity: int) -> StoreBuffers:
        return ST.empty_store(capacity, max(self.num_objects, 1),
                              max(self.num_groups, 1), self.CK, self.CV,
                              value_dtype=self.value_dtype)

    def _ensure_stores(self):
        o, g = max(self.num_objects, 1), max(self.num_groups, 1)
        if self.temp is None:
            self.temp = self._new_store(self._temp_capacity())
        if self.perm is None:
            self.perm = self._new_store(self._perm_capacity())
        if self.enable_long_term and self.long is None:
            self.long = self._new_store(self._round_shards(
                self.max_long_elements + self.num_prototypes))

        # grow for capacity/objects/groups as needed (host-side, rare)
        def fit(s: StoreBuffers, cap: int) -> StoreBuffers:
            if s.capacity < cap or s.num_objects < o or s.num_groups < g:
                return ST.grow(s, max(s.capacity, cap), max(s.num_objects, o),
                               max(s.num_groups, g))
            return s

        self.temp = self._place_store(fit(self.temp, self._temp_capacity()))
        self.perm = self._place_store(fit(self.perm, self._perm_capacity()))
        if self.long is not None:
            self.long = self._place_store(fit(self.long, self.long.capacity))

    def _register_objects(self, objects: List[int]):
        """objects: 1-based labels as in the reference (background excluded).
        New labels form a new group (reference kv_memory_store.py:59-79)."""
        zero_based = [o - 1 for o in objects]
        remaining = [o for o in zero_based if o not in self.all_objects]
        if remaining:
            self.obj_groups.append(list(remaining))
            self.all_objects.extend(remaining)
            assert sorted(self.all_objects) == self.all_objects, \
                'Objects MUST be inserted in sorted order'

    def _group_presence(self) -> np.ndarray:
        """All currently-known groups receive data for a newly added frame."""
        return np.ones((max(self.num_groups, 1),), bool)

    # -- public API (reference parity) --------------------------------------
    def match_static_config(self, disable_usage_updates: bool = False) -> dict:
        """The static keyword set for _match_kernel at the CURRENT store
        occupancy/topology — lets callers (InferenceCore's fused frame step)
        compose the match into a larger jitted program."""
        use_long = self.enable_long_term and self.long_size > 0
        count_usage = self.enable_long_term and not disable_usage_updates
        count_long_usage = (use_long and self.enable_long_term_usage
                            and not disable_usage_updates)

        def bucket(used: int, cap: int, granule: int) -> int:
            if used >= cap:
                return cap
            return min(cap, max(granule, -(-used // granule) * granule))

        # empty stores are dropped from the match entirely — a zeroed segment
        # still costs a similarity + candidates + readout pass. Keep temp as
        # the fallback when everything is empty (degenerate, as in reference).
        use_perm = self.perm_size > 0

        used_caps = []
        if use_long:
            used_caps.append(bucket(self.long_size, self.long.capacity, 2048))
        used_caps.append(bucket(self.temp_size, self.temp.capacity,
                                4 * self.HW))
        if use_perm:
            used_caps.append(bucket(self.perm_size, self.perm.capacity,
                                    2 * self.HW))

        fused, interpret = _readout_mode()
        return dict(group_ids=self.group_ids, top_k=self.top_k,
                    use_long=use_long, count_usage=count_usage,
                    count_long_usage=count_long_usage, fused=fused,
                    interpret=interpret, used_caps=tuple(used_caps),
                    use_perm=use_perm)

    def match_memory(self, query_key: jnp.ndarray, selection: Optional[jnp.ndarray],
                     disable_usage_updates: bool = False) -> jnp.ndarray:
        """query_key/selection: [1, h, w, Ck] -> readout [1, O, h, w, Cv]."""
        h, w = query_key.shape[1:3]
        qk = query_key.reshape(-1, self.CK)
        qe = selection.reshape(-1, self.CK) if selection is not None else None

        cfg = self.match_static_config(disable_usage_updates)
        if self.sharded:
            out = self._match_sharded(qk, qe, cfg)
        else:
            out, temp, long = _match_kernel(
                self.temp, self.perm, self.long if cfg['use_long'] else None,
                qk, qe, **cfg)
            if cfg['count_usage']:
                self.temp = temp
            if cfg['count_long_usage']:
                self.long = long
        return out.reshape(self.num_objects, h, w, self.CV)[None]

    def _match_sharded(self, qk, qe, cfg):
        """Match over stores whose slot axes live sharded across the memory
        mesh: local top-k candidates -> one ICI all_gather -> identical
        global softmax stats everywhere -> local partial readouts -> psum
        (parallel/sharded_readout.sharded_topk_readout_multi; exact vs the
        single-chip path up to psum addition order). Full-capacity segments —
        validity masks already exclude dead slots, and the per-chip cost is
        capacity/D, so occupancy bucketing buys nothing here."""
        from xmem2_tpu.parallel.sharded_readout import (
            sharded_topk_readout_multi,
        )
        use_long = cfg['use_long']
        seg_stores = ([self.long] if use_long else []) + [self.temp] \
            + ([self.perm] if cfg['use_perm'] else [])
        ti = 1 if use_long else 0
        segments = [(s.key, s.shrinkage, s.value,
                     s.val_valid & s.slot_valid()[None, :])
                    for s in seg_stores]
        out, usages = sharded_topk_readout_multi(
            self.memory_mesh, segments, qk, qe, cfg['group_ids'],
            cfg['top_k'])
        if use_long and cfg['count_long_usage']:
            self.long = self._place_store(
                _update_usage_kernel(self.long, usages[0]))
        if cfg['count_usage']:
            self.temp = self._place_store(
                _update_usage_kernel(self.temp, usages[ti]))
        return out

    def add_memory(self, key, shrinkage, value, objects: List[int],
                   selection=None, permanent: bool = False,
                   ignore: bool = False, ti: Optional[int] = None):
        """key [1,h,w,Ck]; shrinkage [1,h,w,1]; value [1,O,h,w,Cv];
        objects: 1-based labels (reference add_memory, memory_manager.py:212)."""
        self._ensure_dims(key)
        self.CK = key.shape[-1]
        self.CV = value.shape[-1]
        self._register_objects(objects)
        self._ensure_stores()

        if ignore:
            return

        k = key.reshape(-1, self.CK)
        s = shrinkage.reshape(-1)
        v = value[0].reshape(self.num_objects, -1, self.CV)
        e = selection.reshape(-1, self.CK) if selection is not None else None
        presence = jnp.asarray(self._group_presence())

        if permanent:
            pos = self.perm_size // self.HW
            self.perm = self._place_store(
                _append_kernel(self.perm, k, s, e, v, presence))
            self.perm_size += self.HW
            if ti is not None:
                self.frame_id_to_permanent_mem_idx[ti] = pos
        else:
            self.temp = self._place_store(
                _append_kernel(self.temp, k, s, e, v, presence))
            self.note_temp_append()

    def note_temp_append(self):
        """Bookkeeping after one frame was appended to working memory (by
        add_memory or by the fused frame step): size mirror + overflow
        handling (eviction + consolidation, reference memory_manager.py
        :272-281)."""
        self.temp_size += self.HW
        if self.enable_long_term and self.temp_size >= self.max_work_elements:
            if self.long_size >= (self.max_long_elements - self.num_prototypes):
                max_keep = self.max_long_elements - self.num_prototypes
                if self.spill_long_term:
                    self._spill_evicted(max_keep)
                self.long = self._place_store(
                    _evict_kernel(self.long, jnp.int32(max_keep)))
                self.long_size = int(self.long.size)
            self.compress_features()

    def _spill_evicted(self, max_keep: int):
        """Archive exactly the rows the upcoming evict_by_usage will drop
        (same threshold rule as ST.evict_by_usage: survivors are strictly
        above the k-th smallest usage). Rare (once per long-term overflow);
        moves only the evicted subset host-side."""
        size = self.long_size
        n_remove = size - max_keep
        if n_remove <= 0:
            return
        use = np.asarray(self.long.use_count[:size])
        life = np.asarray(self.long.life_count[:size])
        u = use / life
        threshold = np.sort(u)[n_remove - 1]
        drop = u <= threshold                          # == NOT(kernel's keep)
        idx = np.nonzero(drop)[0]
        self.archive.archive(
            np.asarray(self.long.key[:size])[idx],
            np.asarray(self.long.shrinkage[:size])[idx],
            np.asarray(self.long.value[:, :size])[:, idx],
            np.asarray(self.long.val_valid[:, :size])[:, idx],
            u[idx])

    def revive_from_archive(self, query_key: Optional[jnp.ndarray] = None,
                            max_elements: Optional[int] = None) -> int:
        """Re-upload the most relevant archived long-term rows into free
        long-term capacity. query_key: optional [1, h, w, Ck] (or [P, Ck])
        current-frame key used for relevance scoring; without it the most
        used archived rows revive. Returns how many rows were revived."""
        if not self.spill_long_term or self.archive.empty or self.long is None:
            return 0
        free = (self.max_long_elements - self.num_prototypes) - self.long_size
        n = free if max_elements is None else min(free, max_elements)
        if n <= 0:
            return 0
        qk = None
        if query_key is not None:
            qk = np.asarray(query_key).reshape(-1, self.CK)
        rows = self.archive.take_top(n, qk)
        if rows is None:
            return 0
        key, shrinkage, value, val_valid = rows
        self.long = self._place_store(_append_kernel(
            self.long, jnp.asarray(key), jnp.asarray(shrinkage), None,
            jnp.asarray(value), jnp.asarray(val_valid)))
        self.long_size += key.shape[0]
        return int(key.shape[0])

    def compress_features(self):
        """Consolidate working memory into long-term prototypes."""
        self.temp, self.long = _consolidate_kernel(
            self.temp, self.long,
            num_prototypes=self.num_prototypes,
            min_work_elements=self.min_work_elements,
            group_ids=self.group_ids,
            use_selection=True)
        self.temp = self._place_store(self.temp)
        self.long = self._place_store(self.long)
        self.long_size = int(self.long.size)   # rare host sync (every ~50 frames)
        self.temp_size = self.min_work_elements

    def update_permanent_memory(self, frame_idx: int, key, shrinkage, value,
                                selection=None):
        saved_pos = self.frame_id_to_permanent_mem_idx[frame_idx]
        k = key.reshape(-1, self.CK)
        s = shrinkage.reshape(-1)
        v = value[0].reshape(self.num_objects, -1, self.CV)
        e = selection.reshape(-1, self.CK) if selection is not None else None
        self.perm = self._place_store(_replace_kernel(
            self.perm, jnp.int32(saved_pos * self.HW), k, s, e, v))

    def remove_from_permanent_memory(self, frame_idx: int):
        saved_pos = self.frame_id_to_permanent_mem_idx[frame_idx]
        start = saved_pos * self.HW
        self.perm = self._place_store(_remove_range_kernel(
            self.perm, jnp.int32(start), jnp.int32(start + self.HW)))
        self.perm_size -= self.HW
        del self.frame_id_to_permanent_mem_idx[frame_idx]
        # surviving frames shift down one slot
        self.frame_id_to_permanent_mem_idx = {
            fi: (pos - 1 if pos > saved_pos else pos)
            for fi, pos in self.frame_id_to_permanent_mem_idx.items()
        }

    def frame_already_saved(self, ti) -> bool:
        return ti in self.frame_id_to_permanent_mem_idx

    # -- hidden state --------------------------------------------------------
    def create_hidden_state(self, n: int, sample_key: jnp.ndarray):
        """n = TOTAL number of objects; sample_key [1, h, w, Ck]
        (reference memory_manager.py:283-294)."""
        h, w = sample_key.shape[1:3]
        if self.hidden is None:
            self.hidden = jnp.zeros((1, n, h, w, self.hidden_dim))
        elif self.hidden.shape[1] != n:
            extra = jnp.zeros((1, n - self.hidden.shape[1], h, w, self.hidden_dim))
            self.hidden = jnp.concatenate([self.hidden, extra], axis=1)
        assert self.hidden.shape[1] == n

    def set_hidden(self, hidden):
        self.hidden = hidden

    def get_hidden(self):
        return self.hidden

    # -- engagement ----------------------------------------------------------
    @property
    def work_mem_engaged(self) -> bool:
        return self.temp_size > 0 or self.perm_size > 0

    def copy_perm_mem_only(self) -> 'MemoryManager':
        """Fresh manager sharing the permanent store (FULL re-propagation,
        reference memory_manager.py:392-425)."""
        new = MemoryManager(self.config)
        if self.perm is None or self.perm_size == 0:
            return new
        new.perm = self.perm
        new.perm_size = self.perm_size
        new.frame_id_to_permanent_mem_idx = dict(self.frame_id_to_permanent_mem_idx)
        new.obj_groups = [list(g) for g in self.obj_groups]
        new.all_objects = list(self.all_objects)
        new.CK, new.CV = self.CK, self.CV
        new.H, new.W, new.HW = self.H, self.W, self.HW
        if self.enable_long_term:
            new.min_work_elements = self.min_work_elements
            new.max_work_elements = self.max_work_elements
        new.reset_config = False
        new._ensure_stores()
        sample = self.perm.key[:self.HW].reshape(1, self.H, self.W, self.CK)
        new.create_hidden_state(len(self.all_objects), sample)
        return new
