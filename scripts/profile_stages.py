"""Roofline accounting per stage: measured ms vs XLA cost-analysis FLOPs.

    python3 scripts/profile_stages.py

Times (on the real chip) each piece of the steady frame — resnet key
encoder, key projection, memory match/readout, decoder fuser, upsample
blocks, pred+hidden update, final resize+softmax+pack — and prints each
stage's achieved TFLOPS vs the chip peak, so the furthest-from-roofline
stage is obvious.
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
from xmem2_tpu.inference.core import InferenceCore, pad_divide_by, _match_kernel
from xmem2_tpu.models import network as XN
from xmem2_tpu.models import modules as M
from xmem2_tpu.nn import functional as F
from xmem2_tpu.inference.preprocess import preprocess_frame


def bench_fn(jfn, *args, iters=30):
    """Returns (ms, gflops) for one call of jitted jfn(*args) -> scalar."""
    lowered = jfn.lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    gflops = (ca or {}).get('flops', 0.0) / 1e9
    acc = jnp.zeros((), jnp.float32)
    for _ in range(3):
        acc = acc + jfn(*args)
    float(acc)
    acc = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = acc + jfn(*args)
    float(acc)
    ms = (time.perf_counter() - t0) / iters * 1e3
    return ms, gflops


def main():
    cfg, net, samples, msk0, labels = bench.build()
    cfg['mem_every'] = 10_000
    cfg['deep_update_every'] = -1
    proc = InferenceCore(net, config=dict(cfg))
    proc.set_all_labels(labels)
    m0 = jnp.asarray(msk0)
    frames = [jnp.asarray(s.rgb_u8) for s in samples]
    hw = tuple(samples[0].shape)
    proc.step(frames[0], m0, labels, pack_hw=hw)
    for ti in range(1, 4):
        proc.step(frames[ti], pack_hw=hw)

    params = net.params
    dt = jnp.bfloat16
    img = jax.vmap(lambda im: preprocess_frame(im, cfg['size']))(
        jnp.stack(frames[5:6]))
    img, pad = pad_divide_by(img, 16)
    key, shrinkage, selection, f16, f8, f4 = XN.encode_key(
        params, img, dtype=dt)
    mm = proc.memory
    mcfg = mm.match_static_config(False)
    ck = key.shape[-1]
    qk = key.reshape(-1, ck)
    qe = selection.reshape(-1, ck) if selection is not None else None
    out, _, _ = _match_kernel(mm.temp, mm.perm,
                              mm.long if mcfg['use_long'] else None,
                              qk, qe, usage_frames=1, **mcfg)
    h16, w16 = key.shape[1:3]
    n_obj = out.shape[0]
    readout = out.reshape(1, n_obj, h16, w16, -1)
    hidden = mm.get_hidden()

    rows = []

    def add(name, jfn, *args, **kw):
        ms, gf = bench_fn(jfn, *args, **kw)
        rows.append((name, ms, gf))
        tf = gf / ms if ms > 0 else 0.0
        print(f'{name:28s} {ms:7.3f} ms  {gf:8.2f} GF  {tf:7.1f} TFLOPS',
              flush=True)

    s32 = lambda x: jnp.sum(x.astype(jnp.float32))

    # --- whole encoder and its halves
    add('resnet+keyproj (encode_key)',
        jax.jit(lambda im: s32(XN.encode_key(params, im, dtype=dt)[0])
                + s32(XN.encode_key(params, im, dtype=dt)[3])), img)

    # --- match kernel
    add('match/readout (tiny mem)',
        jax.jit(lambda q, e: s32(_match_kernel(
            mm.temp, mm.perm, mm.long if mcfg['use_long'] else None,
            q, e, usage_frames=1, **mcfg)[0])), qk, qe)

    # --- decoder pieces
    p = params.tree['decoder']
    cat = jnp.concatenate([readout, hidden.astype(readout.dtype)], axis=-1)
    add('fuser (feature_fusion)',
        jax.jit(lambda f, c: s32(M.feature_fusion(f, c, p['fuser'],
                                                  dtype=dt))), f16, cat)
    g16 = M.feature_fusion(f16, cat, p['fuser'], dtype=dt)
    add('up_16_8',
        jax.jit(lambda a, b: s32(M.upsample_block(a, b, p['up_16_8'],
                                                  dtype=dt))), f8, g16)
    g8 = M.upsample_block(f8, g16, p['up_16_8'], dtype=dt)
    add('up_8_4',
        jax.jit(lambda a, b: s32(M.upsample_block(a, b, p['up_8_4'],
                                                  dtype=dt))), f4, g8)
    g4 = M.upsample_block(f4, g8, p['up_8_4'], dtype=dt)

    b, n = 1, n_obj
    flat_g4 = jax.nn.relu(g4.reshape((b * n,) + g4.shape[2:]))
    add('pred conv',
        jax.jit(lambda x: s32(F.conv2d(x, p['pred'], padding=1, dtype=dt))),
        flat_g4)

    add('segment (whole decoder)',
        jax.jit(lambda f16, f8, f4, ro, h: s32(XN.segment(
            params, (f16, f8, f4), ro, h, h_out=True, strip_bg=False,
            dtype=dt)[2])), f16, f8, f4, readout, hidden)

    # --- full plain frame for reference
    from xmem2_tpu.inference.core import _plain_frame_step
    cfgm = mcfg

    def full(a):
        r = _plain_frame_step(
            params, frames[5], mm.temp, mm.perm,
            mm.long if cfgm['use_long'] else None, mm.get_hidden(), a,
            size=proc.size, h_out=True,
            dtype_name='bfloat16', pack_hw=hw, mem_frame=False,
            deep_update=False, use_selection=proc.enable_long_term,
            stop_after=None, **cfgm)
        return r[-1]

    acc = jnp.zeros((), jnp.uint32)
    for _ in range(3):
        acc = full(acc)
    int(acc)
    acc = jnp.zeros((), jnp.uint32)
    t0 = time.perf_counter()
    for _ in range(30):
        acc = full(acc)
    int(acc)
    ms = (time.perf_counter() - t0) / 30 * 1e3
    print(f'{"FULL plain frame":28s} {ms:7.3f} ms')
    tot = sum(r[1] for r in rows[:2]) + rows[-1][1]
    print(f'(enc + match + segment = {rows[0][1] + rows[1][1] + rows[-1][1]:.3f} ms)')


if __name__ == '__main__':
    main()
