"""Cumulative in-context stage costs of the chunk program.

    python3 scripts/profile_cumulative.py [k]

Times jit(enc), jit(enc+match), jit(enc+match+scan-decode),
jit(enc+match+scan-decode+usage-writeback) — i.e. the REAL chunk program
truncated at successive points, sharing inputs — so stage costs are the
successive differences as they schedule in context (isolated-stage timings
have proven misleading: XLA schedules the full program differently).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', str(
    Path(__file__).resolve().parent.parent / '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)

import bench
from xmem2_tpu.inference.core import (InferenceCore, pad_divide_by,
                                      _match_kernel, unpad)
from xmem2_tpu.models import network as XN
from xmem2_tpu.inference.preprocess import preprocess_frame
from xmem2_tpu.inference.postprocess import prob_to_mask_packed


def timed(fn, iters=10, warmup=3):
    acc = jnp.zeros((), jnp.uint32)
    for _ in range(warmup):
        acc = fn(acc)
    int(acc)
    acc = jnp.zeros((), jnp.uint32)
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = fn(acc)
    int(acc)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    unroll = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cfg, net, samples, msk0, labels = bench.build()
    cfg['mem_every'] = 10_000
    cfg['deep_update_every'] = -1
    proc = InferenceCore(net, config=dict(cfg))
    proc.set_all_labels(labels)
    m0 = jnp.asarray(msk0)
    frames = [jnp.asarray(s.rgb_u8) for s in samples]
    nsrc = len(frames)
    hw = tuple(samples[0].shape)
    proc.step(frames[0], m0, labels, pack_hw=hw)
    for ti in range(1, 5):
        proc.step(frames[ti], pack_hw=hw)

    params = net.params
    dt = jnp.bfloat16
    mm = proc.memory
    mcfg = mm.match_static_config(False)
    stack = jnp.stack([frames[5 + i % (nsrc - 5)] for i in range(k)])
    hidden0 = mm.get_hidden()
    size = cfg['size']

    def enc_part(stack):
        ims = jax.vmap(lambda im: preprocess_frame(im, size))(stack)
        ims, pad = pad_divide_by(ims, 16)
        return XN.encode_key(params, ims, dtype=dt), pad

    def match_part(keys, selections):
        ck = keys.shape[-1]
        qk = keys.reshape(-1, ck)
        qe = selections.reshape(-1, ck) if selections is not None else None
        out, temp, long = _match_kernel(
            mm.temp, mm.perm, mm.long if mcfg['use_long'] else None,
            qk, qe, usage_frames=k, **mcfg)
        return out, temp, long

    def dec_part(out, keys, f16s, f8s, f4s, hidden, acc, pad):
        h16, w16 = keys.shape[1:3]
        n_obj = out.shape[0]
        readouts = jnp.moveaxis(out.reshape(n_obj, k, h16, w16, -1), 0, 1)

        def body(carry, xs):
            readout, f16, f8, f4 = xs
            hidden, acc = carry
            hidden, _, prob = XN.segment(
                params, (f16[None], f8[None], f4[None]), readout[None],
                hidden, h_out=True, strip_bg=False, dtype=dt)
            res = unpad(jnp.moveaxis(prob[0], 0, -1), pad)
            res = jnp.moveaxis(res, -1, 0)
            packed = prob_to_mask_packed(res, hw)
            acc = acc + jnp.sum(packed.astype(jnp.uint32))
            return (hidden, acc), packed

        (hidden, acc), packs = jax.lax.scan(
            body, (hidden, acc), (readouts, f16s, f8s, f4s),
            unroll=min(unroll, k))
        return acc

    @jax.jit
    def c_enc(stack, a):
        (keys, _, sels, *_), _ = enc_part(stack)
        return a + jnp.sum(keys.astype(jnp.float32)).astype(jnp.uint32)

    @jax.jit
    def c_match(stack, a):
        (keys, _, sels, *_), _ = enc_part(stack)
        out, temp, long = match_part(keys, sels)
        return a + jnp.sum(out.astype(jnp.float32)).astype(jnp.uint32)

    @jax.jit
    def c_dec(stack, hidden, a):
        (keys, _, sels, f16s, f8s, f4s), pad = enc_part(stack)
        out, temp, long = match_part(keys, sels)
        return dec_part(out, keys, f16s, f8s, f4s, hidden, a, pad)

    @jax.jit
    def c_full(stack, hidden, a):
        (keys, _, sels, f16s, f8s, f4s), pad = enc_part(stack)
        out, temp, long = match_part(keys, sels)
        a = dec_part(out, keys, f16s, f8s, f4s, hidden, a, pad)
        # usage writeback folded in (chunk returns temp')
        return a + jnp.sum(temp.use_count).astype(jnp.uint32)

    names = ['enc', '+match', '+dec', '+usage']
    fns = [lambda a: c_enc(stack, a),
           lambda a: c_match(stack, a),
           lambda a: c_dec(stack, hidden0, a),
           lambda a: c_full(stack, hidden0, a)]
    prev = 0.0
    for name, fn in zip(names, fns):
        ms = timed(fn)
        print(f'{name:8s} cum {ms / k:7.3f} ms/frame  (marginal '
              f'{(ms - prev) / k:7.3f})  total {ms:7.2f}', flush=True)
        prev = ms


if __name__ == '__main__':
    main()
