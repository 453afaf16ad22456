"""Targeted chunk-program experiments on the real chip.

    python3 scripts/profile_experiments.py

1. dense (jnp) match vs fused Pallas match at bench memory occupancy
2. scanned decode with unroll in {1, 2, 4, 8}
3. batched key encode vs unrolled per-frame encodes inside one jit
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
                                      _match_kernel)
from xmem2_tpu.models import network as XN
from xmem2_tpu.inference.preprocess import preprocess_frame


def timed(fn, iters=30, warmup=3):
    acc = jnp.zeros((), jnp.float32)
    for _ in range(warmup):
        acc = acc + fn()
    float(acc)
    acc = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = acc + fn()
    float(acc)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    k = 8
    cfg, net, samples, msk0, labels = bench.build()
    cfg['mem_every'] = 10_000
    cfg['deep_update_every'] = -1
    proc = InferenceCore(net, config=dict(cfg))
    proc.set_all_labels(labels)
    m0 = jnp.asarray(msk0)
    frames = [jnp.asarray(s.rgb_u8) for s in samples]
    hw = tuple(samples[0].shape)
    proc.step(frames[0], m0, labels, pack_hw=hw)
    for ti in range(1, 5):
        proc.step(frames[ti], pack_hw=hw)

    params = net.params
    dt = jnp.bfloat16
    mm = proc.memory
    mcfg = mm.match_static_config(False)
    print('used_caps:', mcfg['used_caps'], flush=True)

    stack = jnp.stack(frames[5:5 + k])
    ims = jax.vmap(lambda im: preprocess_frame(im, cfg['size']))(stack)
    ims, pad = pad_divide_by(ims, 16)
    keys, _, selections, f16s, f8s, f4s = XN.encode_key(params, ims, dtype=dt)
    ck = keys.shape[-1]
    qk = keys.reshape(-1, ck)
    qe = selections.reshape(-1, ck) if selections is not None else None
    qk1, qe1 = qk[:1620], (qe[:1620] if qe is not None else None)

    s32 = lambda x: jnp.sum(x.astype(jnp.float32))

    # ------------------------------------------------ 1. dense vs fused match
    for name, fused in (('fused', True), ('dense', False)):
        for qn, qq, ee in (('1f', qk1, qe1), (f'{k}f', qk, qe)):
            m2 = dict(mcfg)
            m2['fused'] = fused
            jfn = jax.jit(lambda q, e, m2=m2: s32(_match_kernel(
                mm.temp, mm.perm, mm.long if m2['use_long'] else None,
                q, e, usage_frames=1, **m2)[0]))
            ms = timed(lambda: jfn(qq, ee))
            print(f'match {name} {qn}: {ms:7.3f} ms', flush=True)

    # ------------------------------------------------ 2. scan unroll sweep
    out, _, _ = _match_kernel(mm.temp, mm.perm,
                              mm.long if mcfg['use_long'] else None,
                              qk, qe, usage_frames=k, **mcfg)
    h16, w16 = keys.shape[1:3]
    n_obj = out.shape[0]
    readouts = jnp.moveaxis(out.reshape(n_obj, k, h16, w16, -1), 0, 1)
    hidden = mm.get_hidden()
    from xmem2_tpu.inference.postprocess import prob_to_mask_packed

    for unroll in (1, 2, 4, 8):
        @jax.jit
        def dec(readouts, f16s, f8s, f4s, hidden):
            def body(carry, xs):
                h, a = carry
                readout, f16, f8, f4 = xs
                h, _, prob = XN.segment(
                    params, (f16[None], f8[None], f4[None]),
                    readout[None], h, h_out=True, strip_bg=False, dtype=dt)
                packed = prob_to_mask_packed(prob[0], hw)
                return (h, a + jnp.sum(packed.astype(jnp.float32))), None
            (h, a), _ = jax.lax.scan(body, (hidden, jnp.float32(0)),
                                     (readouts, f16s, f8s, f4s),
                                     unroll=unroll)
            return a

        ms = timed(lambda: dec(readouts, f16s, f8s, f4s, hidden), iters=10)
        print(f'dec scan unroll={unroll}: {ms / k:7.3f} ms/frame '
              f'({ms:7.2f} total)', flush=True)

    # ------------------------------------------------ 3. enc batched vs unrolled
    @jax.jit
    def enc_batched(stack):
        ims = jax.vmap(lambda im: preprocess_frame(im, cfg['size']))(stack)
        ims, _ = pad_divide_by(ims, 16)
        out = XN.encode_key(params, ims, dtype=dt)
        return s32(out[0]) + s32(out[3])

    @jax.jit
    def enc_unrolled(stack):
        a = jnp.float32(0)
        for i in range(k):
            im = preprocess_frame(stack[i], cfg['size'])
            im, _ = pad_divide_by(im, 16)
            out = XN.encode_key(params, im[None], dtype=dt)
            a = a + s32(out[0]) + s32(out[3])
        return a

    ms = timed(lambda: enc_batched(stack), iters=10)
    print(f'enc batched   k={k}: {ms / k:7.3f} ms/frame ({ms:7.2f} total)',
          flush=True)
    ms = timed(lambda: enc_unrolled(stack), iters=10)
    print(f'enc unrolled  k={k}: {ms / k:7.3f} ms/frame ({ms:7.2f} total)',
          flush=True)

    @jax.jit
    def enc1(im):
        im = preprocess_frame(im, cfg['size'])
        im, _ = pad_divide_by(im, 16)
        out = XN.encode_key(params, im[None], dtype=dt)
        return s32(out[0]) + s32(out[3])

    ms = timed(lambda: enc1(frames[5]), iters=30)
    print(f'enc single dispatch: {ms:7.3f} ms/frame', flush=True)


if __name__ == '__main__':
    main()
