"""XMemTrainer — multi-frame unrolled training with SPMD data parallelism.

Behavioral parity target: reference model/trainer.py (XMemTrainer :20,
do_pass :56, save/load :160-214). Differences by design:
  * DDP/NCCL -> jax.sharding.Mesh + jit with batch sharded over the 'data'
    axis; gradient all-reduce is inserted by XLA (rides ICI).
  * The torch host-side randomness (ref-frame randperm, deep-update coin) is
    jax.random driven by a per-step key, inside the compiled step.
  * BatchNorm runs in eval mode during training exactly like the reference
    (trainer.py:220 calls .eval() on the whole net), so running stats are
    frozen and no cross-replica stat sync is needed.
"""

from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from xmem2_tpu.models import network as XN
from xmem2_tpu.models.network import XMemParams
from xmem2_tpu.train.losses import compute_losses


class TrainState(NamedTuple):
    params: Any          # XMemParams
    opt_state: Any
    it: jnp.ndarray      # [] int32


def make_lr_schedule(lr: float, steps, gamma: float):
    """MultiStepLR equivalent (reference trainer.py:44)."""
    return optax.piecewise_constant_schedule(
        lr, {int(s): gamma for s in steps})


def make_optimizer(config: dict):
    return optax.adamw(
        learning_rate=make_lr_schedule(config['lr'], config.get('steps', []),
                                       config.get('gamma', 0.1)),
        weight_decay=config['weight_decay'])


def train_forward(params: XMemParams, frames, first_frame_gt, selector,
                  cls_gt, rng, it, *, num_frames: int, num_ref_frames: int,
                  deep_update_prob: float, hidden_dim: int,
                  start_warm: int, end_warm: int, dtype=None):
    """One unrolled multi-frame pass returning the scalar loss + aux dict.

    frames         [B, T, H, W, 3]
    first_frame_gt [B, 1, O, H, W]  (one-hot objects of frame 0)
    selector       [B, O]           (1 for filled object slots)
    cls_gt         [B, T, H, W]     int class indices
    (reference do_pass, trainer.py:56-117)
    """
    b, t = frames.shape[:2]
    num_objects = first_frame_gt.shape[2]

    # encode keys for all frames at once (trainer.py:74)
    flat = frames.reshape((b * t,) + frames.shape[2:])
    key, shrinkage, selection, f16, f8, f4 = XN.encode_key(params, flat,
                                                           dtype=dtype)
    unflat = lambda x: x.reshape((b, t) + x.shape[1:])
    key, shrinkage, selection = unflat(key), unflat(shrinkage), unflat(selection)
    f16, f8, f4 = unflat(f16), unflat(f8), unflat(f4)

    h16, w16 = key.shape[2:4]
    hidden = jnp.zeros((b, num_objects, h16, w16, hidden_dim))

    v16, hidden = XN.encode_value(params, frames[:, 0], f16[:, 0], hidden,
                                  first_frame_gt[:, 0], dtype=dtype)
    values = [v16]                     # list over time of [B, O, h, w, Cv]

    sel4 = selector[:, :, None, None]  # [B, O, 1, 1]
    logits_seq, masks_seq = [], []

    for ti in range(1, num_frames):
        rng, k_ref, k_deep = jax.random.split(rng, 3)

        if ti <= num_ref_frames:
            idx = jnp.broadcast_to(jnp.arange(ti)[None], (b, ti))
        else:
            # frame 0 + (num_ref_frames-1) random distinct frames from [1, ti)
            # per batch element (trainer.py:87-101)
            def sample(k):
                perm = jax.random.permutation(k, ti - 1)[:num_ref_frames - 1] + 1
                return jnp.concatenate([jnp.zeros((1,), perm.dtype), perm])
            idx = jax.vmap(sample)(jax.random.split(k_ref, b))  # [B, R]

        vals = jnp.stack(values, axis=2)          # [B, O, ti, h, w, Cv]
        take_b = jax.vmap(lambda x, i: jnp.take(x, i, axis=0))
        ref_keys = take_b(key, idx)               # [B, R, h, w, Ck]
        ref_shrinkage = take_b(shrinkage, idx)
        ref_values = jax.vmap(lambda x, i: jnp.take(x, i, axis=1))(vals, idx)

        memory_readout = XN.read_memory(
            params, key[:, ti], selection[:, ti], ref_keys,
            ref_shrinkage[..., 0], ref_values)

        h_out = ti < (num_frames - 1)
        hidden_new, logits, masks = XN.segment(
            params, (f16[:, ti], f8[:, ti], f4[:, ti]), memory_readout,
            hidden, selector=sel4, h_out=h_out, strip_bg=True, dtype=dtype)

        if h_out:
            hidden = hidden_new
            deep = jax.random.uniform(k_deep) < deep_update_prob
            v16_deep, hidden_deep = XN.encode_value(
                params, frames[:, ti], f16[:, ti], hidden, masks,
                is_deep_update=True, dtype=dtype)
            # deep update only changes the hidden state (trainer.py:111-113)
            hidden = jnp.where(deep, hidden_deep, hidden)
            values.append(v16_deep)

        logits_seq.append(logits)
        masks_seq.append(masks)

    class_valid = jnp.concatenate(
        [jnp.ones((b, 1), bool), selector.astype(bool)], axis=1)
    losses = compute_losses(logits_seq, masks_seq, cls_gt, class_valid, it,
                            start_warm, end_warm)
    return losses['total_loss'], losses


def make_train_step(config: dict, optimizer, mesh: Optional[jax.sharding.Mesh] = None,
                    dtype=None, two_phase: bool = False):
    """Build the jitted train step. With a mesh, batch/cls inputs are sharded
    over the 'data' axis and parameters are replicated.

    Default mesh path: ONE jitted program; XLA inserts the gradient
    all-reduces per parameter leaf and, on TPU, its all-reduce combiner pass
    buckets them into large ICI messages (the DDP-bucketing analog,
    reference trainer.py:28-30). The frequent small collectives are also
    what keeps this path safe on CPU-emulated meshes: each is a
    synchronization point, so partition arrival skew never accumulates.

    two_phase=True splits the step into (a) a compiled per-shard grad
    program with ZERO collectives, whose stacked output stays sharded over
    'data', a host-side barrier, then (b) a tiny compiled reduce+update
    program holding the only collective (one explicit fused pmean of the
    raveled grads). Purpose: on hosts with fewer cores than mesh devices
    (the CPU-emulated driver dryrun), partition executions serialize, so a
    single big program with a single late collective sees arrivals spread by
    the FULL serialized compute time — and XLA:CPU's in-process rendezvous
    hard-aborts the process at ~40 s of skew (not flag-configurable; the
    round-2 dryrun failure mode). With the collective isolated in a program
    whose pre-collective work is a slice view, arrival skew is dispatch
    jitter only. Semantics are identical to the default path."""

    fwd = partial(train_forward,
                  num_frames=config['num_frames'],
                  num_ref_frames=config['num_ref_frames'],
                  deep_update_prob=config['deep_update_prob'],
                  hidden_dim=config['hidden_dim'],
                  start_warm=config['start_warm'],
                  end_warm=config['end_warm'],
                  dtype=dtype)

    def grads_and_aux(params, frames, first_frame_gt, selector, cls_gt, rng,
                      it):
        def loss_fn(p):
            return fwd(p, frames, first_frame_gt, selector, cls_gt, rng, it)
        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return grads, aux

    def apply(state: TrainState, grads, aux):
        updates, opt_state = optimizer.update(
            grads.tree, state.opt_state, state.params.tree)
        new_tree = optax.apply_updates(state.params.tree, updates)
        new_params = XMemParams(new_tree, state.params.key_dim,
                                state.params.value_dim, state.params.hidden_dim,
                                state.params.single_object)
        return TrainState(new_params, opt_state, state.it + 1), aux

    def one_program_step(state: TrainState, frames, first_frame_gt, selector,
                         cls_gt, rng):
        grads, aux = grads_and_aux(state.params, frames, first_frame_gt,
                                   selector, cls_gt, rng, state.it)
        return apply(state, grads, aux)

    if mesh is None:
        return jax.jit(one_program_step, donate_argnums=(0,))

    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map
    from jax.flatten_util import ravel_pytree
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P('data'))

    if not two_phase:
        return jax.jit(
            one_program_step,
            in_shardings=(repl, data, data, data, data, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )

    # ---- two-phase: collective-free grads, host barrier, tiny reduce ------
    def per_shard_local(params, frames, first_frame_gt, selector, cls_gt,
                        rng, it):
        grads, aux = grads_and_aux(params, frames, first_frame_gt, selector,
                                   cls_gt, rng, it)
        flat, _ = ravel_pytree(grads)
        return flat[None, :], {k: jnp.reshape(v, (1,)).astype(flat.dtype)
                               for k, v in aux.items()}

    # check_vma=False is load-bearing: with the default vma checking, jax 0.9
    # inserts pvary() where the replicated params meet the sharded batch, and
    # pvary's TRANSPOSE is psum — so the backward pass all-reduces every
    # gradient leaf and this "collective-free" program actually carries
    # hundreds of collectives (the round-2 SIGABRT source). It is also a
    # numerics bug: each shard's row is then already the global SUM, so the
    # downstream mean over shards yields n_devices x the true mean grad.
    # With check_vma=False the grads are truly per-shard-local.
    grads_fn = jax.jit(
        shard_map(per_shard_local, mesh=mesh,
                  in_specs=(P(), P('data'), P('data'), P('data'), P('data'),
                            P(), P()),
                  out_specs=(P('data'), P('data')), check_vma=False),
        in_shardings=(repl, data, data, data, data, repl, repl),
        out_shardings=(data, data))

    REDUCE_CHUNKS = 8

    def reduce_shard(flat_stacked, aux_stacked):
        """Per-partition: chunked LOCKSTEP pmean of the local grad row.

        Explicit collectives, not jnp.mean over the sharded axis: the SPMD
        partitioner may lower that as all-gather + local reduce, which
        materializes the full stacked buffer per partition and re-creates
        the arrival-skew problem this path exists to avoid.

        Chunked and chained, not one big pmean: each partition stages its
        payload (a ~30 MB copy per chunk) before entering the collective;
        on a 1-core host those stagings serialize across partitions, so ONE
        220 MB pmean accumulates 8x-the-full-copy-time of arrival skew —
        observed 20-80 s, intermittently past XLA:CPU's 40 s rendezvous
        abort. With 8 chained chunks the skew per barrier is one chunk's
        staging (~seconds), and every barrier resynchronizes the
        partitions. The scalar data-dependence (`link`) stops the scheduler
        from hoisting all stagings above the first collective."""
        keys = sorted(aux_stacked)
        row = flat_stacked[0]
        d = row.shape[0]
        bounds = [d * i // REDUCE_CHUNKS for i in range(REDUCE_CHUNKS + 1)]
        outs = []
        link = jnp.zeros((), row.dtype)
        for i in range(REDUCE_CHUNKS):
            seg = row[bounds[i]:bounds[i + 1]] + link * 0
            seg = jax.lax.pmean(seg, 'data')
            link = seg[0]
            outs.append(seg)
        auxv = jax.lax.pmean(
            jnp.concatenate([aux_stacked[k] for k in keys]) + link * 0,
            'data')
        return jnp.concatenate(outs), auxv

    reduce_sm = shard_map(reduce_shard, mesh=mesh,
                          in_specs=(P('data'), P('data')), out_specs=P())

    def _unflatten_apply(state: TrainState, flat, auxv, keys):
        """Replicated flat grads + aux vector -> optimizer update. No
        collectives; unflattens along the same tree order ravel_pytree
        used."""
        leaves, treedef = jax.tree.flatten(state.params)
        parts, off = [], 0
        for leaf in leaves:
            n = leaf.size
            parts.append(flat[off:off + n].reshape(leaf.shape).astype(
                leaf.dtype))
            off += n
        grads = jax.tree.unflatten(treedef, parts)
        aux = {k: auxv[i] for i, k in enumerate(keys)}
        return apply(state, grads, aux)

    def reduce_apply(state: TrainState, flat_stacked, aux_stacked):
        keys = sorted(aux_stacked)
        flat, auxv = reduce_sm(flat_stacked, aux_stacked)
        return _unflatten_apply(state, flat, auxv, keys)

    reduce_fn = jax.jit(reduce_apply,
                        in_shardings=(repl, data, data),
                        out_shardings=(repl, repl),
                        donate_argnums=(0, 1))

    # Fallback reduction: mean on HOST, then a collective-FREE apply
    # program. XLA:CPU's 40 s rendezvous abort makes even the chunked
    # in-program reduce a (small) process-kill risk under heavy host load;
    # XMEM2_TWO_PHASE_HOST_REDUCE=1 removes every collective from the step
    # (dryrun_multichip's retry engages it). Numerically identical.
    apply_fn = jax.jit(_unflatten_apply,
                       in_shardings=(repl, repl, repl),
                       out_shardings=(repl, repl),
                       donate_argnums=(0,),
                       static_argnums=(3,))

    import os
    import time as _time
    debug = os.environ.get('XMEM2_TWO_PHASE_DEBUG') == '1'
    host_reduce = os.environ.get('XMEM2_TWO_PHASE_HOST_REDUCE') == '1'
    seq_grads = os.environ.get('XMEM2_SEQ_GRADS') == '1'

    # XMEM2_SEQ_GRADS=1: compute the per-shard grads as ONE vmapped
    # single-device program instead of one 8-partition SPMD program. Each
    # vmap lane computes exactly the gradient device d would produce from
    # its own shard (the grads program is collective-free, so this is
    # semantically identical lane-for-lane) — but a single vectorized
    # program sidesteps the n-runnable-threads-on-1-core futex/fault churn
    # of concurrent partition execution (observed: 300 s wall, ~95% system
    # time, for 8 partitions of the tiny dryrun step) AND the ~8x thunk
    # dispatch overhead of running the shards back-to-back. Only for
    # CPU-emulated meshes (the driver dryrun); on real multi-chip hardware
    # partitions run on their own chips for free.
    def _all_shards_local(params, frames, first_frame_gt, selector, cls_gt,
                          rng, it):
        """inputs stacked [n_shards, rows_per_shard, ...] -> per-shard flat
        grad rows [n_shards, D] and aux columns [n_shards]."""
        def one(fr, gt, sel, cg):
            flat, aux = per_shard_local(params, fr, gt, sel, cg, rng, it)
            return flat[0], {k: v[0] for k, v in aux.items()}
        return jax.vmap(one)(frames, first_frame_gt, selector, cls_gt)

    local_grads = jax.jit(_all_shards_local)

    def _seq_shard_grads(state: TrainState, frames, first_frame_gt, selector,
                         cls_gt, rng):
        n = int(np.prod(list(mesh.shape.values())))
        params0 = jax.tree.map(
            lambda x: x.addressable_shards[0].data, state.params)
        it0 = np.asarray(state.it)

        def shard_rows(x):
            if isinstance(x, jax.Array) and len(x.sharding.device_set) > 1:
                shards = sorted(x.addressable_shards,
                                key=lambda s: s.index[0].start or 0)
                return np.stack([np.asarray(s.data) for s in shards])
            x = np.asarray(x)
            return x.reshape((n, x.shape[0] // n) + x.shape[1:])

        cols = [shard_rows(a)
                for a in (frames, first_frame_gt, selector, cls_gt)]
        flat, auxs = local_grads(params0, cols[0], cols[1], cols[2], cols[3],
                                 rng, it0)
        flat = np.asarray(flat)
        auxs = {k: np.asarray(v) for k, v in auxs.items()}
        return flat, auxs

    def step(state: TrainState, frames, first_frame_gt, selector, cls_gt,
             rng):
        t0 = _time.perf_counter()
        if seq_grads:
            flat, auxs = _seq_shard_grads(state, frames, first_frame_gt,
                                          selector, cls_gt, rng)
        else:
            flat, auxs = grads_fn(state.params, frames, first_frame_gt,
                                  selector, cls_gt, rng, state.it)
            if debug:
                print(f'[two_phase] grads dispatched '
                      f'+{_time.perf_counter()-t0:.1f}s', flush=True)
            # hard host barrier: the reduce program's collectives must see
            # all partitions launch together (see docstring)
            jax.block_until_ready(flat)
        if debug:
            print(f'[two_phase] grads done +{_time.perf_counter()-t0:.1f}s',
                  flush=True)
        if host_reduce:
            keys = tuple(sorted(auxs))
            mean = np.asarray(flat).mean(axis=0)
            auxv = np.stack([np.asarray(auxs[k]).mean() for k in keys])
            out = apply_fn(state, jnp.asarray(mean), jnp.asarray(auxv), keys)
        else:
            out = reduce_fn(state, flat, auxs)
        if debug:
            jax.block_until_ready(out)
            print(f'[two_phase] reduce done +{_time.perf_counter()-t0:.1f}s',
                  flush=True)
        return out

    return step


class XMemTrainer:
    """Host-side training wrapper (reference XMemTrainer surface)."""

    def __init__(self, config: dict, params: XMemParams,
                 mesh: Optional[jax.sharding.Mesh] = None, logger=None,
                 save_path: Optional[str] = None, dtype=None,
                 two_phase: bool = False):
        self.config = config
        self.logger = logger
        self.save_path = save_path
        self.optimizer = make_optimizer(config)
        self.mesh = mesh
        self.step_fn = make_train_step(config, self.optimizer, mesh, dtype,
                                       two_phase=two_phase)
        if mesh is None:
            params = jax.device_put(params)  # pin weights on-device once
        else:
            from xmem2_tpu.parallel.mesh import replicated
            params = jax.device_put(params, replicated(mesh))
        self.state = TrainState(
            params=params,
            opt_state=self.optimizer.init(params.tree),
            it=jnp.zeros((), jnp.int32))
        self.log_text_interval = config.get('log_text_interval', 100)
        self.save_network_interval = config.get('save_network_interval', 25000)
        self.save_checkpoint_interval = config.get('save_checkpoint_interval', 50000)

    def do_pass(self, data: Dict[str, np.ndarray], it: int = 0,
                rng: Optional[jax.Array] = None):
        """data: dict with 'rgb' [B,T,H,W,3], 'first_frame_gt' [B,1,O,H,W],
        'selector' [B,O], 'cls_gt' [B,T,H,W]."""
        if rng is None:
            rng = jax.random.PRNGKey(it)
        if self.mesh is not None:
            from xmem2_tpu.parallel.mesh import shard_batch
            data = shard_batch(self.mesh, data)
        self.state, aux = self.step_fn(
            self.state, jnp.asarray(data['rgb']),
            jnp.asarray(data['first_frame_gt']),
            jnp.asarray(data['selector']), jnp.asarray(data['cls_gt']), rng)
        if self.logger is not None and it % self.log_text_interval == 0:
            for k, v in aux.items():
                self.logger.log_scalar(f'train/{k}', float(v), it)
        if self.save_path is not None:
            if it % self.save_network_interval == 0 and it != 0:
                self.save_network(it)
            if it % self.save_checkpoint_interval == 0 and it != 0:
                self.save_checkpoint(it)
        return aux

    # -- checkpointing (reference trainer.py:160-202) -----------------------
    def save_network(self, it: int):
        from xmem2_tpu.bridge.torch_params import save_params
        import os
        os.makedirs(os.path.dirname(self.save_path), exist_ok=True)
        path = f'{self.save_path}_{it}.npz'
        save_params(self.state.params, path)
        print(f'Network saved to {path}.')

    def save_checkpoint(self, it: int):
        import os
        import pickle
        os.makedirs(os.path.dirname(self.save_path), exist_ok=True)
        path = f'{self.save_path}_checkpoint_{it}.pkl'
        payload = {
            'it': it,
            'network': jax.tree.map(np.asarray, self.state.params.tree),
            'optimizer': jax.tree.map(np.asarray, self.state.opt_state),
            'meta': (self.state.params.key_dim, self.state.params.value_dim,
                     self.state.params.hidden_dim,
                     self.state.params.single_object),
        }
        with open(path, 'wb') as f:
            pickle.dump(payload, f)
        print(f'Checkpoint saved to {path}.')

    def load_checkpoint(self, path: str) -> int:
        import pickle
        with open(path, 'rb') as f:
            payload = pickle.load(f)
        params = XMemParams(payload['network'], *payload['meta'])
        self.state = TrainState(
            params=params,
            opt_state=jax.tree.map(jnp.asarray, payload['optimizer']),
            it=jnp.asarray(payload['it'], jnp.int32))
        print('Network weights, optimizer states, and iteration loaded.')
        return payload['it']

    def load_network_in_memory(self, params: XMemParams):
        self.state = TrainState(params, self.optimizer.init(params.tree),
                                self.state.it)
        print('Network weight loaded from memory.')
