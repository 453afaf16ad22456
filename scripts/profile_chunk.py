"""Stage-level timing of the chunked steady-frame program on the real chip.

Answers one question: where does _chunk_frame_step (batched key encode +
batched readout + lax.scan decode) spend its per-frame time, compared to the
fused per-frame program (_plain_frame_step)?  Run on the TPU:

    python3 scripts/profile_chunk.py [k ...]

Prints per-frame ms for: the fused plain step, the whole chunk step at each
k, and the chunk's internal stages (batched encode, batched readout, scanned
decode) timed in isolation.
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
from xmem2_tpu.inference.core import InferenceCore, pad_divide_by
from xmem2_tpu.models import network as XN
from xmem2_tpu.inference.preprocess import preprocess_frame


def timed(fn, iters=20, warmup=3):
    """fn(acc) -> acc' (a device scalar folding in all the work of the call).
    The timed loop chains acc through every iteration and closes with ONE
    host fetch — the same honesty rule as bench.py's staged_loop."""
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
    ks = [int(a) for a in sys.argv[1:]] or [4, 9, 16]
    cfg, net, samples, msk0, labels = bench.build()
    cfg['mem_every'] = 10_000           # keep plain_run_length large
    cfg['deep_update_every'] = -1
    proc = InferenceCore(net, config=dict(cfg))
    proc.set_all_labels(labels)
    m0 = jnp.asarray(msk0)
    frames = [jnp.asarray(s.rgb_u8) for s in samples]
    nsrc = len(frames)
    hw = tuple(samples[0].shape)
    acc = jnp.zeros((), jnp.uint32)
    _, _, acc = proc.step(frames[0], m0, labels, pack_hw=hw, acc=acc)
    for ti in range(1, 4):
        _, _, acc = proc.step(frames[ti], pack_hw=hw, acc=acc)
    jax.block_until_ready(acc)

    def plain(a):
        a = proc.step(frames[5], pack_hw=hw, acc=a)[2]
        proc.curr_ti -= 1
        return a

    ms_plain = timed(plain)
    print(f'plain fused step:        {ms_plain:7.3f} ms/frame', flush=True)

    for k in ks:
        stack = jnp.stack([frames[5 + i % (nsrc - 5)] for i in range(k)])

        def chunk(a):
            a = proc.step_chunk(stack, pack_hw=hw, acc=a)[1]
            proc.curr_ti -= k
            return a

        ms = timed(chunk, iters=max(24 // k, 3))
        print(f'chunk step k={k:<3d}:        {ms / k:7.3f} ms/frame '
              f'({ms:7.2f} ms total)', flush=True)

    import os
    if os.environ.get('XMEM2_PROFILE_STAGES', '1') == '0':
        return
    print('(stages below timed in isolation, per frame)', flush=True)
    mm = proc.memory
    mcfg = mm.match_static_config(False)
    from xmem2_tpu.inference.core import _match_kernel

    for k in [1] + ks:
        stack = jnp.stack([frames[5 + i % (nsrc - 5)] for i in range(k)])

        @jax.jit
        def enc(stack, a):
            ims = jax.vmap(lambda im: preprocess_frame(im, cfg['size']))(
                stack)
            ims, _ = pad_divide_by(ims, 16)
            out = XN.encode_key(proc.network.params, ims,
                                dtype=jnp.bfloat16)
            a = a + jnp.sum(out[0].astype(jnp.float32)).astype(jnp.uint32)
            return out, a

        (keys, _, selections, f16s, f8s, f4s), _ = enc(
            stack, jnp.zeros((), jnp.uint32))
        ms_enc = timed(lambda a: enc(stack, a)[1], iters=max(24 // k, 3))

        ck = keys.shape[-1]
        qk = keys.reshape(-1, ck)
        qe = selections.reshape(-1, ck) if selections is not None else None

        @jax.jit
        def match(a):
            out, _, _ = _match_kernel(
                mm.temp, mm.perm,
                mm.long if mcfg['use_long'] else None, qk, qe,
                usage_frames=k, **mcfg)
            return out, a + jnp.sum(out.astype(jnp.float32)).astype(
                jnp.uint32)

        out, _ = match(jnp.zeros((), jnp.uint32))
        ms_match = timed(lambda a: match(a)[1], iters=max(24 // k, 3))

        # scanned decode alone
        n_obj = out.shape[0]
        h16, w16 = keys.shape[1:3]
        readouts = jnp.moveaxis(out.reshape(n_obj, k, h16, w16, -1), 0, 1)
        hidden = mm.get_hidden()

        @jax.jit
        def dec(readouts, f16s, f8s, f4s, hidden, a):
            from xmem2_tpu.inference.postprocess import prob_to_mask_packed

            def body(carry, xs):
                h, a = carry
                readout, f16, f8, f4 = xs
                h, _, prob = XN.segment(
                    proc.network.params, (f16[None], f8[None], f4[None]),
                    readout[None], h, h_out=True, strip_bg=False,
                    dtype=jnp.bfloat16)
                packed = prob_to_mask_packed(prob[0], hw)
                return (h, a + jnp.sum(packed.astype(jnp.uint32))), None
            (h, a), _ = jax.lax.scan(body, (hidden, a),
                                     (readouts, f16s, f8s, f4s))
            return a

        ms_dec = timed(lambda a: dec(readouts, f16s, f8s, f4s, hidden, a),
                       iters=max(24 // k, 3))
        print(f'  k={k:<3d}: enc {ms_enc / k:7.3f}  match {ms_match / k:7.3f}'
              f'  dec {ms_dec / k:7.3f} ms/frame '
              f'(totals {ms_enc:6.2f} / {ms_match:6.2f} / {ms_dec:6.2f})',
              flush=True)


if __name__ == '__main__':
    main()
