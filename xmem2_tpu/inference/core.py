"""InferenceCore — per-frame orchestration of the segmentation loop.

Behavioral parity target: reference inference/inference_core.py (step :62,
put_to_permanent_memory :154, clear_memory :28, encode_frame_key :53,
remove_from_permanent_memory :181).

The host decides frame kind (memory frame / deep update / mask provided) from
integer counters — exactly the reference's logic — and dispatches to the
jit-compiled network + memory kernels. Images are channels-last [H, W, 3].
"""

from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp

from xmem2_tpu.memory.manager import MemoryManager, _match_kernel
from xmem2_tpu.inference.net import XMemNet
from xmem2_tpu.models import network as XN
from xmem2_tpu.ops.tensor import aggregate, pad_divide_by, unpad


def _stage_checksum(acc, *xs):
    """Fold a data-dependent scalar into the uint32 checksum chain — the
    truncated stage programs (stop_after) return this so a single fetch
    bounds all device work up to the cut, same rule as the full program."""
    s = jnp.float32(0)
    for x in xs:
        if x is not None:
            s = s + jnp.sum(jnp.abs(x).astype(jnp.float32))
    s = jnp.nan_to_num(s, nan=1.0, posinf=2.0, neginf=3.0)
    folded = jnp.mod(s, 65536.0).astype(jnp.uint32)
    return folded if acc is None else acc + folded


@partial(jax.jit, static_argnames=('size', 'h_out', 'dtype_name', 'group_ids',
                                   'top_k', 'use_long', 'count_usage',
                                   'count_long_usage', 'fused', 'interpret',
                                   'used_caps', 'use_perm', 'pack_hw',
                                   'mem_frame', 'deep_update',
                                   'use_selection', 'stop_after'))
def _plain_frame_step(params, image, temp, perm, long, hidden, acc=None, *,
                      size, h_out, dtype_name, group_ids, top_k, use_long,
                      count_usage, count_long_usage, fused, interpret,
                      used_caps, use_perm, pack_hw=None, mem_frame=False,
                      deep_update=False, use_selection=False,
                      stop_after=None):
    """The steady-state frame (no user mask) as ONE compiled program:
    preprocess -> pad -> encode key -> memory match -> segment -> unpad
    [-> encode value + working-memory append] [-> resize/argmax/4-bit pack].
    One dispatch per frame instead of ~6 — the per-kernel cost (multi-ms over
    a tunneled TPU, ~100us host-attached) stops dominating.

    mem_frame: every mem_every-th frame also value-encodes its prediction and
    appends it to working memory in the same program (deep_update selects the
    GRU-refreshed hidden state, reference inference_core.py:114-133).
    pack_hw: when set, the output index mask at that resolution is 4-bit
    packed in the same program (the production download path). acc: optional
    running uint32 checksum the packed mask is folded into (benchmarks fetch
    one scalar at the end to bound all device work).

    Returns (prob [1+O, H, W], temp', long', hidden', key, shrinkage,
    selection, packed-or-None, acc'-or-None)."""
    from xmem2_tpu.memory import store as ST

    dtype = jnp.bfloat16 if dtype_name == 'bfloat16' else None

    if image.dtype == jnp.uint8:
        from xmem2_tpu.inference.preprocess import preprocess_frame
        image = preprocess_frame(image, size)
    image, pad = pad_divide_by(image, 16)
    image = image[None]

    key, shrinkage, selection, f16, f8, f4 = XN.encode_key(params, image,
                                                           dtype=dtype)
    if stop_after == 'key':
        # truncated stage program (bench instrumentation): everything the key
        # stage computes feeds the checksum so none of it dead-code-eliminates
        return _stage_checksum(acc, key, shrinkage, selection)
    ck = key.shape[-1]
    qk = key.reshape(-1, ck)
    qe = selection.reshape(-1, ck) if selection is not None else None
    out, temp, long = _match_kernel(
        temp, perm, long, qk, qe,
        group_ids=group_ids, top_k=top_k, use_long=use_long,
        count_usage=count_usage, count_long_usage=count_long_usage,
        fused=fused, interpret=interpret, used_caps=used_caps,
        use_perm=use_perm)
    if stop_after == 'readout':
        return _stage_checksum(acc, key, shrinkage, selection, out)
    n_obj = out.shape[0]
    h16, w16 = key.shape[1:3]
    readout = out.reshape(n_obj, h16, w16, -1)[None]

    hidden_new, _, prob = XN.segment(params, (f16, f8, f4), readout, hidden,
                                     h_out=h_out, strip_bg=False, dtype=dtype)
    if stop_after == 'decode':
        return _stage_checksum(acc, prob, hidden_new)

    if mem_frame:
        # value-encode the prediction and append to working memory
        # (reference step :114-133); with h_out the segment's refreshed
        # hidden feeds the value encoder, as in the split path
        h_for_value = hidden_new if h_out else hidden
        value, hidden_deep = XN.encode_value(
            params, image, f16, h_for_value, prob[:, 1:],
            is_deep_update=deep_update, dtype=dtype)
        if deep_update:
            hidden_new = hidden_deep
        cv = value.shape[-1]
        presence = jnp.ones((temp.num_groups,), bool)
        temp = ST.append(temp, qk, shrinkage.reshape(-1),
                         qe if use_selection else None,
                         value[0].reshape(n_obj, -1, cv), presence)

    res = unpad(jnp.moveaxis(prob[0], 0, -1), pad)
    res = jnp.moveaxis(res, -1, 0)

    packed = None
    if pack_hw is not None:
        from xmem2_tpu.inference.postprocess import prob_to_mask_packed
        packed = prob_to_mask_packed(res, pack_hw)
        if acc is not None:
            acc = acc + jnp.sum(packed.astype(jnp.uint32))
    return res, temp, long, hidden_new, key, shrinkage, selection, packed, acc


@partial(jax.jit, static_argnames=('size', 'dtype_name', 'group_ids',
                                   'top_k', 'use_long', 'count_usage',
                                   'count_long_usage', 'fused', 'interpret',
                                   'used_caps', 'use_perm', 'pack_hw',
                                   'has_acc'))
def _chunk_frame_step(params, images, temp, perm, long, hidden, acc, *,
                      size, dtype_name, group_ids, top_k, use_long,
                      count_usage, count_long_usage, fused, interpret,
                      used_caps, use_perm, pack_hw, has_acc):
    """A run of k mask-less steady frames as ONE compiled program.

    lax.scan over the stacked frames [k, H0, W0, 3]; the carry holds only
    what a plain frame actually mutates — the hidden state, the usage
    statistics of the counted stores, and the optional checksum — while the
    big key/value buffers ride through as loop invariants (XLA keeps them
    in place, no per-iteration copies). One dispatch per k frames instead of
    one per frame: the per-dispatch cost (multi-ms over a tunneled TPU,
    ~100us host-attached) amortizes by k. A TPU-native capability with no
    reference analog (the torch loop pays Python+launch per frame,
    inference/inference_core.py:62).

    Plain frames never append or consolidate (reference step :114 runs those
    only on memory frames), so store sizes — and with them the static
    used_caps bucketing — are chunk-invariant by construction.

    Returns (packed [k, ...], temp', long', hidden', acc')."""
    from xmem2_tpu.inference.postprocess import prob_to_mask_packed
    from xmem2_tpu.inference.preprocess import preprocess_frame

    dtype = jnp.bfloat16 if dtype_name == 'bfloat16' else None

    # key encoding AND memory readout are memory-write-free on plain frames,
    # so both run OUTSIDE the scan as batch-k passes — batch=1 convs and
    # 1620-row readouts underutilize the MXU; batching the whole run recovers
    # most of that. Usage bookkeeping stays exact: use-counts are additive
    # over queries and life-counts advance by usage_frames=k, landing on the
    # same totals as k sequential readouts (affinities never read usage, and
    # plain frames never consolidate/evict, so intermediates are unobserved).
    # Only the decode (GRU hidden chain, reference updates hidden every
    # normal frame — inference_core.py:88,108) scans.
    k = images.shape[0]
    if images.dtype == jnp.uint8:
        images = jax.vmap(lambda im: preprocess_frame(im, size))(images)
    images, pad = pad_divide_by(images, 16)
    keys, _, selections, f16s, f8s, f4s = XN.encode_key(
        params, images, dtype=dtype)

    ck = keys.shape[-1]
    h16, w16 = keys.shape[1:3]
    qk = keys.reshape(-1, ck)
    qe = selections.reshape(-1, ck) if selections is not None else None
    out, temp, long = _match_kernel(
        temp, perm, long, qk, qe,
        group_ids=group_ids, top_k=top_k, use_long=use_long,
        count_usage=count_usage, count_long_usage=count_long_usage,
        fused=fused, interpret=interpret, used_caps=used_caps,
        use_perm=use_perm, usage_frames=k)
    n_obj = out.shape[0]
    readouts = jnp.moveaxis(                       # [k, O, h16, w16, Cv]
        out.reshape(n_obj, k, h16, w16, -1), 0, 1)

    def body(carry, xs):
        readout, f16, f8, f4 = xs
        hidden, acc = carry

        hidden, _, prob = XN.segment(params, (f16[None], f8[None], f4[None]),
                                     readout[None], hidden,
                                     h_out=True, strip_bg=False, dtype=dtype)

        res = unpad(jnp.moveaxis(prob[0], 0, -1), pad)
        res = jnp.moveaxis(res, -1, 0)
        packed = prob_to_mask_packed(res, pack_hw)
        if has_acc:
            acc = acc + jnp.sum(packed.astype(jnp.uint32))
        return (hidden, acc), packed

    init = (hidden, acc if has_acc else jnp.zeros((), jnp.uint32))
    # unroll=2: measured 2x on the decode chain (scripts/profile_experiments
    # .py — 4.74 -> 2.38 ms/frame on v5e). The hidden chain serializes the
    # decoder math, but unrolling lets XLA overlap each frame's input
    # slicing/pack epilogue with the next frame's decode; deeper unrolls
    # measured no better and cost compile time.
    (hidden, acc), packs = jax.lax.scan(
        body, init, (readouts, f16s, f8s, f4s),
        unroll=min(2, k))
    return packs, temp, long, hidden, (acc if has_acc else None)


class InferenceCore:
    def __init__(self, network: XMemNet, config: dict):
        self.config = config
        self.network = network
        self.size = config.get('size', -1)
        self.mem_every = config['mem_every']
        self.deep_update_every = config['deep_update_every']
        self.enable_long_term = config['enable_long_term']

        # if deep_update_every < 0, synchronize deep update with memory frames
        self.deep_update_sync = (self.deep_update_every < 0)

        self.clear_memory()
        self.all_labels: Optional[List[int]] = None

    def clear_memory(self, keep_permanent: bool = False):
        self.curr_ti = -1
        self.last_mem_ti = 0
        if not self.deep_update_sync:
            self.last_deep_update_ti = -self.deep_update_every
        if keep_permanent:
            new_memory = self.memory.copy_perm_mem_only()
        else:
            new_memory = MemoryManager(config=self.config)
        self.memory = new_memory

    def update_config(self, config: dict):
        self.mem_every = config['mem_every']
        self.deep_update_every = config['deep_update_every']
        self.enable_long_term = config['enable_long_term']
        self.deep_update_sync = (self.deep_update_every < 0)
        self.memory.update_config(config)

    def set_all_labels(self, all_labels: List[int]):
        self.all_labels = list(all_labels)

    @property
    def pack_bits(self) -> int:
        """Bit width step/step_chunk's packed masks use (derives from the
        probability map's static channel count = background + objects). Pass
        to `unpack_mask` host-side."""
        from xmem2_tpu.inference.postprocess import mask_pack_bits
        return mask_pack_bits(1 + len(self.all_labels or []))

    def encode_frame_key(self, image: jnp.ndarray):
        """image [H, W, 3] float or uint8 -> (key, shrinkage, selection)."""
        if image.dtype == jnp.uint8:
            from xmem2_tpu.inference.preprocess import preprocess_frame
            image = preprocess_frame(image, self.size)
        image, self.pad = pad_divide_by(image, 16)
        key, shrinkage, selection, *_ = self.network.encode_key(image[None])
        return key, shrinkage, selection

    def step(self, image: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
             valid_labels: Optional[List[int]] = None, end: bool = False,
             manually_curated_masks: bool = False,
             disable_memory_updates: bool = False,
             do_not_add_mask_to_memory: bool = False,
             return_key_and_stuff: bool = False,
             pack_hw=None, acc=None):
        """One frame. image: [H, W, 3] float (ImageNet-normalized) OR raw
        [H0, W0, 3] uint8 (normalize+resize then run on device);
        mask: [num_objects, H, W] or None. Returns prob [1+O, H, W]
        (background included, reference step returns unpadded probs).

        pack_hw/acc: optional production download path — the 4-bit-packed
        index mask at pack_hw (and a running checksum) are produced inside
        the same compiled program on steady-state frames; the return value
        becomes (prob, packed, acc)."""
        self.curr_ti += 1

        if manually_curated_masks:
            is_mem_frame = (mask is not None) and (not end)
        else:
            is_mem_frame = ((self.curr_ti - self.last_mem_ti >= self.mem_every)
                            or (mask is not None)) and (not end)
        is_ignore = do_not_add_mask_to_memory

        need_segment = (valid_labels is None) or (
            len(self.all_labels) != len(valid_labels))
        is_deep_update = (
            (self.deep_update_sync and is_mem_frame) or
            (not self.deep_update_sync and
             self.curr_ti - self.last_deep_update_ti >= self.deep_update_every)
        ) and (not end)
        is_normal_update = (not self.deep_update_sync or not is_deep_update) \
            and (not end)

        if disable_memory_updates:
            is_normal_update = False
            is_deep_update = False
            is_mem_frame = False

        # ---- fast path: mask-less frames as one compiled program ----------
        import os
        if (mask is None and need_segment
                and not (is_mem_frame and is_ignore)
                and self.memory.work_mem_engaged
                and self.memory.get_hidden() is not None
                and not self.memory.sharded
                and os.environ.get('XMEM2_FAST_STEP', '1') != '0'):
            mm = self.memory
            if is_mem_frame:
                mm._ensure_stores()   # room for the append (bucket growth)
            cfg = mm.match_static_config(disable_memory_updates)
            res, temp, long, hidden, key, shrinkage, selection, packed, acc = \
                _plain_frame_step(
                    self.network.params, image, mm.temp, mm.perm,
                    mm.long if cfg['use_long'] else None, mm.get_hidden(),
                    acc,
                    size=self.size, h_out=is_normal_update,
                    dtype_name=getattr(self.network.dtype, '__name__',
                                       str(self.network.dtype)),
                    pack_hw=pack_hw, mem_frame=is_mem_frame,
                    deep_update=is_deep_update,
                    use_selection=self.enable_long_term, **cfg)
            if cfg['count_usage'] or is_mem_frame:
                mm.temp = temp
            if cfg['count_long_usage']:
                mm.long = long
            if (is_normal_update or is_deep_update) and hidden is not None:
                mm.set_hidden(hidden)
            if is_mem_frame:
                mm.note_temp_append()
                self.last_mem_ti = self.curr_ti
                if is_deep_update:
                    self.last_deep_update_ti = self.curr_ti
            if disable_memory_updates:
                self.curr_ti -= 1
            if return_key_and_stuff:
                return res, key, shrinkage, selection
            if pack_hw is not None:
                return res, packed, acc
            return res
        # --------------------------------------------------------------------

        if image.dtype == jnp.uint8:
            from xmem2_tpu.inference.preprocess import preprocess_frame
            image = preprocess_frame(image, self.size)
        image, self.pad = pad_divide_by(image, 16)
        image = image[None]

        key, shrinkage, selection, f16, f8, f4 = self.network.encode_key(image)
        multi_scale_features = (f16, f8, f4)

        if disable_memory_updates:
            self.curr_ti -= 1  # do not advance the iteration further

        if need_segment:
            memory_readout = self.memory.match_memory(
                key, selection, disable_usage_updates=disable_memory_updates)
            hidden, _, pred_prob_with_bg = self.network.segment(
                multi_scale_features, memory_readout, self.memory.get_hidden(),
                h_out=is_normal_update, strip_bg=False)
            pred_prob_with_bg = pred_prob_with_bg[0]       # [1+O, H, W]
            pred_prob_no_bg = pred_prob_with_bg[1:]
            if is_normal_update:
                self.memory.set_hidden(hidden)
        else:
            pred_prob_no_bg = pred_prob_with_bg = None

        # use the input mask if provided (reference step :114-133)
        if mask is not None:
            mask, _ = pad_divide_by(mask[..., None], 16)
            mask = mask[..., 0]                             # [O, H, W]

            if pred_prob_no_bg is not None:
                # make the prediction consistent with the provided mask
                mask_regions = jnp.sum(mask, axis=0) > 0.5
                pred_prob_no_bg = jnp.where(mask_regions[None], 0.0,
                                            pred_prob_no_bg)
                mask = mask.astype(pred_prob_no_bg.dtype)
                if valid_labels is not None:
                    # non-labelled objects keep their predicted probabilities
                    shift_by_one_non_labels = [
                        i for i in range(pred_prob_no_bg.shape[0])
                        if (i + 1) not in valid_labels
                    ]
                    if shift_by_one_non_labels:
                        mask = mask.at[jnp.asarray(shift_by_one_non_labels)].set(
                            pred_prob_no_bg[jnp.asarray(shift_by_one_non_labels)])
            pred_prob_with_bg = aggregate(
                jnp.moveaxis(mask, 0, -1), axis=-1)
            pred_prob_with_bg = jnp.moveaxis(pred_prob_with_bg, -1, 0)

            if not disable_memory_updates:
                self.memory.create_hidden_state(len(self.all_labels), key)

        if is_mem_frame:
            value, hidden = self.network.encode_value(
                image, f16, self.memory.get_hidden(),
                pred_prob_with_bg[1:][None], is_deep_update=is_deep_update)
            self.memory.add_memory(
                key, shrinkage, value, self.all_labels,
                selection=selection if self.enable_long_term else None,
                ignore=is_ignore)
            self.last_mem_ti = self.curr_ti
            if is_deep_update:
                self.memory.set_hidden(hidden)
                self.last_deep_update_ti = self.curr_ti

        res = unpad(jnp.moveaxis(pred_prob_with_bg, 0, -1), self.pad)
        res = jnp.moveaxis(res, -1, 0)

        if return_key_and_stuff:
            return res, key, shrinkage, selection
        if pack_hw is not None:
            from xmem2_tpu.inference.postprocess import prob_to_mask_packed
            packed = prob_to_mask_packed(res, pack_hw)
            if acc is not None:
                acc = acc + jnp.sum(packed.astype(jnp.uint32))
            return res, packed, acc
        return res

    def plain_run_length(self) -> int:
        """How many upcoming frames are guaranteed steady-state (no memory
        append, no deep update, no mask) — the longest prefix step_chunk may
        take. 0 when the fast chunk path cannot run (memory not engaged yet).
        The caller must still stop short of the video's final frame (`end`
        semantics) and of any frame it wants to provide a mask for."""
        import os
        if (self.all_labels is None
                or not self.memory.work_mem_engaged
                or self.memory.get_hidden() is None
                or self.memory.sharded
                or os.environ.get('XMEM2_FAST_STEP', '1') == '0'):
            return 0
        nxt = self.curr_ti + 1
        next_mem = self.last_mem_ti + self.mem_every
        run_end = next_mem
        if not self.deep_update_sync:
            run_end = min(run_end,
                          self.last_deep_update_ti + self.deep_update_every)
        return max(run_end - nxt, 0)

    def step_chunk(self, images: jnp.ndarray, pack_hw, acc=None):
        """Process k consecutive steady-state frames in ONE device dispatch.

        images: [k, H, W, 3] float (normalized) or raw uint8 stack, with
        k <= plain_run_length(). Equivalent to k successive step() calls on
        plain frames; returns (packed [k, ...], acc')."""
        k = int(images.shape[0])
        avail = self.plain_run_length()
        if not (0 < k <= avail):
            raise ValueError(
                f'step_chunk of {k} frames, but only {avail} plain frames '
                f'are available before the next memory/deep-update event')
        mm = self.memory
        cfg = mm.match_static_config(False)
        packs, temp, long, hidden, acc = _chunk_frame_step(
            self.network.params, images, mm.temp, mm.perm,
            mm.long if cfg['use_long'] else None, mm.get_hidden(), acc,
            size=self.size,
            dtype_name=getattr(self.network.dtype, '__name__',
                               str(self.network.dtype)),
            pack_hw=pack_hw, has_acc=acc is not None, **cfg)
        if cfg['count_usage']:
            mm.temp = temp
        if cfg['count_long_usage']:
            mm.long = long
        mm.set_hidden(hidden)
        self.curr_ti += k
        return packs, acc

    def put_to_permanent_memory(self, image: jnp.ndarray, mask: jnp.ndarray,
                                ti: Optional[int] = None) -> bool:
        """image [H, W, 3] float or [H0, W0, 3] uint8; mask [O, H, W].
        Returns True when the frame was already in permanent memory and got
        updated in place."""
        if image.dtype == jnp.uint8:
            from xmem2_tpu.inference.preprocess import preprocess_frame
            image = preprocess_frame(image, self.size)
        image, self.pad = pad_divide_by(image, 16)
        image = image[None]
        key, shrinkage, selection, f16, *_ = self.network.encode_key(image)

        mask, _ = pad_divide_by(mask[..., None], 16)
        mask = mask[..., 0]

        pred_prob_with_bg = aggregate(jnp.moveaxis(mask, 0, -1), axis=-1)
        pred_prob_with_bg = jnp.moveaxis(pred_prob_with_bg, -1, 0)
        self.memory.create_hidden_state(len(self.all_labels), key)

        value, _ = self.network.encode_value(
            image, f16, self.memory.get_hidden(),
            pred_prob_with_bg[1:][None], is_deep_update=False)

        is_update = self.memory.frame_already_saved(ti)
        if is_update:
            self.memory.update_permanent_memory(
                ti, key, shrinkage, value,
                selection=selection if self.enable_long_term else None)
        else:
            self.memory.add_memory(
                key, shrinkage, value, self.all_labels,
                selection=selection if self.enable_long_term else None,
                permanent=True, ti=ti)
        return is_update

    def remove_from_permanent_memory(self, frame_idx: int):
        self.memory.remove_from_permanent_memory(frame_idx)

    @property
    def permanent_memory_frames(self):
        return list(self.memory.frame_id_to_permanent_mem_idx.keys())
