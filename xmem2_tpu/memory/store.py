"""Fixed-capacity key/value memory buffers.

The reference KeyValueMemoryStore (inference/kv_memory_store.py) grows tensors
with torch.cat on every memory frame and slices ragged per-object-group
suffixes — shapes change every call, which would force an XLA recompile per
frame. The TPU-native design replaces it with static-capacity buffers plus
masks:

  key        [cap, Ck]      shared across objects
  shrinkage  [cap]
  selection  [cap, Ck]      (kept for consolidation's potentiation step)
  value      [O, cap, Cv]   per OBJECT (objects in one group share extent)
  val_valid  [G, cap] bool  per-GROUP slot validity — this mask expresses the
                            reference's ragged "later groups only have a
                            suffix of the keys" semantics exactly
  use_count  [cap] f32      usage statistics (use/life), only meaningful for
  life_count [cap] f32      usage-counted stores
  size       scalar int32   slots [0, size) are occupied

All mutation helpers are pure jnp functions (old buffers in, new buffers out)
so the inference step can be jit-compiled end-to-end; the host keeps integer
mirrors of `size` for control flow (no device sync needed).
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

LIFE_EPS = 1e-7  # initial life count (reference kv_memory_store.py:38)


class StoreBuffers(NamedTuple):
    key: jnp.ndarray        # [cap, Ck]
    shrinkage: jnp.ndarray  # [cap]
    selection: jnp.ndarray  # [cap, Ck]
    value: jnp.ndarray      # [O, cap, Cv]
    val_valid: jnp.ndarray  # [G, cap] bool
    use_count: jnp.ndarray  # [cap]
    life_count: jnp.ndarray  # [cap]
    size: jnp.ndarray       # [] int32

    @property
    def capacity(self) -> int:
        return self.key.shape[0]

    @property
    def num_objects(self) -> int:
        return self.value.shape[0]

    @property
    def num_groups(self) -> int:
        return self.val_valid.shape[0]

    def slot_valid(self) -> jnp.ndarray:
        return jnp.arange(self.capacity) < self.size


def empty_store(capacity: int, num_objects: int, num_groups: int,
                key_dim: int, value_dim: int,
                dtype=jnp.float32, value_dtype=jnp.float32) -> StoreBuffers:
    return StoreBuffers(
        key=jnp.zeros((capacity, key_dim), dtype),
        shrinkage=jnp.zeros((capacity,), dtype),
        selection=jnp.zeros((capacity, key_dim), dtype),
        value=jnp.zeros((num_objects, capacity, value_dim), value_dtype),
        val_valid=jnp.zeros((num_groups, capacity), bool),
        use_count=jnp.zeros((capacity,), jnp.float32),
        life_count=jnp.full((capacity,), LIFE_EPS, jnp.float32),
        size=jnp.zeros((), jnp.int32),
    )


def append(store: StoreBuffers, key: jnp.ndarray, shrinkage: jnp.ndarray,
           selection: Optional[jnp.ndarray], value: jnp.ndarray,
           group_present: jnp.ndarray) -> StoreBuffers:
    """Append one frame's worth of elements at [size, size+n).

    key [n, Ck]; shrinkage [n]; selection [n, Ck] or None; value [O, n, Cv];
    group_present [G] bool — which groups have data for these slots
    (reference add(): a group's value extent covers only frames added after
    the group appeared, kv_memory_store.py:59-79).
    """
    n = key.shape[0]
    at = store.size
    if group_present.ndim == 1:
        group_present = jnp.broadcast_to(group_present[:, None],
                                         (store.num_groups, n))
    new = store._replace(
        key=jax.lax.dynamic_update_slice(store.key, key.astype(store.key.dtype), (at, 0)),
        shrinkage=jax.lax.dynamic_update_slice(
            store.shrinkage, shrinkage.astype(store.shrinkage.dtype), (at,)),
        value=jax.lax.dynamic_update_slice(
            store.value, value.astype(store.value.dtype), (0, at, 0)),
        val_valid=jax.lax.dynamic_update_slice(
            store.val_valid, group_present, (0, at)),
        use_count=jax.lax.dynamic_update_slice(
            store.use_count, jnp.zeros((n,), jnp.float32), (at,)),
        life_count=jax.lax.dynamic_update_slice(
            store.life_count, jnp.full((n,), LIFE_EPS, jnp.float32), (at,)),
        size=store.size + n,
    )
    if selection is not None:
        new = new._replace(selection=jax.lax.dynamic_update_slice(
            store.selection, selection.astype(store.selection.dtype), (at, 0)))
    return new


def replace_at(store: StoreBuffers, start: jnp.ndarray, key: jnp.ndarray,
               shrinkage: jnp.ndarray, selection: Optional[jnp.ndarray],
               value: jnp.ndarray) -> StoreBuffers:
    """Overwrite the n slots starting at `start` (permanent-memory frame
    update, reference kv_memory_store.py:105-118). Validity is unchanged."""
    new = store._replace(
        key=jax.lax.dynamic_update_slice(store.key, key.astype(store.key.dtype), (start, 0)),
        shrinkage=jax.lax.dynamic_update_slice(
            store.shrinkage, shrinkage.astype(store.shrinkage.dtype), (start,)),
        value=jax.lax.dynamic_update_slice(
            store.value, value.astype(store.value.dtype), (0, start, 0)),
    )
    if selection is not None:
        new = new._replace(selection=jax.lax.dynamic_update_slice(
            store.selection, selection.astype(store.selection.dtype), (start, 0)))
    return new


def _gather_compact(store: StoreBuffers, order: jnp.ndarray,
                    keep: jnp.ndarray, new_size: jnp.ndarray) -> StoreBuffers:
    """Reorder all buffers by `order` (an index permutation placing kept slots
    first in stable original order), masking out dropped slots."""
    keep_sorted = jnp.take(keep, order)
    return StoreBuffers(
        key=jnp.take(store.key, order, axis=0),
        shrinkage=jnp.take(store.shrinkage, order),
        selection=jnp.take(store.selection, order, axis=0),
        value=jnp.take(store.value, order, axis=1),
        val_valid=jnp.take(store.val_valid, order, axis=1) & keep_sorted[None, :],
        use_count=jnp.where(keep_sorted, jnp.take(store.use_count, order), 0.0),
        life_count=jnp.where(keep_sorted, jnp.take(store.life_count, order), LIFE_EPS),
        size=new_size,
    )


def remove_range(store: StoreBuffers, start: jnp.ndarray, end: jnp.ndarray) -> StoreBuffers:
    """Drop slots [start, end) and compact (reference sieve_by_range /
    remove_at, kv_memory_store.py:120-158 — with validity masks there is no
    min_size special case: a late group's absent prefix is already invalid)."""
    cap = store.capacity
    idx = jnp.arange(cap)
    keep = (idx < start) | ((idx >= end) & (idx < store.size))
    # stable partition: kept slots first, original order preserved
    order = jnp.argsort(jnp.where(keep, idx, idx + cap))
    return _gather_compact(store, order, keep, jnp.sum(keep).astype(jnp.int32))


def update_usage(store: StoreBuffers, usage: jnp.ndarray,
                 frames: int = 1) -> StoreBuffers:
    """use += usage per slot; life += `frames` on occupied slots
    (reference kv_memory_store.py:96-103 — life normally advances by 1 per
    readout; a BATCHED readout over k frames passes its summed usage with
    frames=k, which lands on exactly the totals k sequential updates
    produce)."""
    valid = store.slot_valid()
    return store._replace(
        use_count=store.use_count + jnp.where(valid, usage, 0.0),
        life_count=store.life_count + frames * valid.astype(jnp.float32),
    )


def usage(store: StoreBuffers) -> jnp.ndarray:
    return store.use_count / store.life_count


def evict_by_usage(store: StoreBuffers, max_size: jnp.ndarray) -> StoreBuffers:
    """Keep at most `max_size` slots, dropping the least-used (reference
    remove_obsolete_features, kv_memory_store.py:160-181: survivors are
    strictly above the k-th smallest usage; original order preserved).

    Unlike the reference (which raises NotImplementedError for >1 group),
    validity masks make multi-group eviction well-defined: group masks are
    simply carried along with the surviving slots.
    """
    cap = store.capacity
    u = jnp.where(store.slot_valid(), usage(store), -jnp.inf)
    n_remove = jnp.maximum(store.size - max_size, 0)
    sorted_u = jnp.sort(u)  # ascending; invalid (-inf) sort first
    # threshold = usage of the (#invalid + n_remove)-th smallest entry
    kth = jnp.clip((cap - store.size) + n_remove - 1, 0, cap - 1)
    threshold = jax.lax.cond(
        n_remove > 0,
        lambda: jax.lax.dynamic_index_in_dim(sorted_u, kth, keepdims=False),
        lambda: jnp.float32(-jnp.inf),
    )
    keep = store.slot_valid() & (u > threshold)
    idx = jnp.arange(cap)
    order = jnp.argsort(jnp.where(keep, idx, idx + cap))
    return _gather_compact(store, order, keep, jnp.sum(keep).astype(jnp.int32))


def grow(store: StoreBuffers, new_capacity: int, new_num_objects: int,
         new_num_groups: int) -> StoreBuffers:
    """Host-side resize to bigger capacity / more objects / more groups
    (rare: permanent-memory bucket growth, new objects entering the video).
    New group/object rows start fully invalid/zero."""
    o, cap, cv = store.value.shape
    g = store.val_valid.shape[0]
    pad_cap = new_capacity - cap

    key = jnp.pad(store.key, ((0, pad_cap), (0, 0)))
    selection = jnp.pad(store.selection, ((0, pad_cap), (0, 0)))
    shrinkage = jnp.pad(store.shrinkage, ((0, pad_cap),))
    value = jnp.pad(store.value, ((0, new_num_objects - o), (0, pad_cap), (0, 0)))
    val_valid = jnp.pad(store.val_valid, ((0, new_num_groups - g), (0, pad_cap)))
    use_count = jnp.pad(store.use_count, ((0, pad_cap),))
    life_count = jnp.pad(store.life_count, ((0, pad_cap),), constant_values=LIFE_EPS)
    return StoreBuffers(key, shrinkage, selection, value, val_valid,
                        use_count, life_count, store.size)
