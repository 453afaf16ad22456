"""Bisect the key-encoder cost on the real chip.

    python3 scripts/profile_encoder.py [k]

Cumulative jits: preprocess | +stem | +layer1 | +layer2 | +layer3 | +keyproj.
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
from xmem2_tpu.inference.core import pad_divide_by
from xmem2_tpu.models import resnet, modules as M
from xmem2_tpu.inference.preprocess import preprocess_frame


def timed(fn, iters=15, warmup=3):
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
    cfg, net, samples, msk0, labels = bench.build()
    frames = [jnp.asarray(s.rgb_u8) for s in samples]
    stack = jnp.stack(frames[5:5 + k])
    params = net.params
    p = params.tree
    dt = jnp.bfloat16
    size = cfg['size']

    def s32(x):
        return jnp.sum(x.astype(jnp.float32)).astype(jnp.uint32)

    def pre(stack):
        ims = jax.vmap(lambda im: preprocess_frame(im, size))(stack)
        ims, _ = pad_divide_by(ims, 16)
        return ims

    pe = p['key_encoder']

    stages = {
        'preprocess': lambda x: pre(x),
        '+stem': lambda x: resnet.stem(pre(x), pe, dtype=dt),
        '+layer1': lambda x: resnet.layer(
            resnet.stem(pre(x), pe, dtype=dt),
            pe['res2'] if 'res2' in pe else pe['layer1'],
            resnet.bottleneck_block, 3, stride=1, dtype=dt),
    }

    def upto(n):
        def f(x):
            h = resnet.stem(pre(x), pe, dtype=dt)
            f4 = resnet.layer(h, pe['res2'] if 'res2' in pe else pe['layer1'],
                              resnet.bottleneck_block, 3, stride=1, dtype=dt)
            if n == 1:
                return f4
            f8 = resnet.layer(f4, pe['layer2'], resnet.bottleneck_block, 4,
                              stride=2, dtype=dt)
            if n == 2:
                return f8
            f16 = resnet.layer(f8, pe['layer3'], resnet.bottleneck_block, 6,
                               stride=2, dtype=dt)
            if n == 3:
                return f16
            key, sk, ek = M.key_projection(f16, p['key_proj'], True, True,
                                           dtype=dt)
            return key
        return f

    stages['+layer2'] = upto(2)
    stages['+layer3'] = upto(3)
    stages['+keyproj'] = upto(4)

    prev = 0.0
    for name, fn in stages.items():
        jf = jax.jit(lambda x, a, fn=fn: a + s32(fn(x)))
        ms = timed(lambda a: jf(stack, a))
        print(f'{name:12s} cum {ms / k:7.3f} ms/frame (marginal '
              f'{(ms - prev) / k:7.3f})  total {ms:7.2f}', flush=True)
        prev = ms


if __name__ == '__main__':
    main()
