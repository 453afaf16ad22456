"""Capture a jax.profiler device trace of the chunk program.

    python3 scripts/trace_chunk.py [k] [outdir]
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
from xmem2_tpu.inference.core import InferenceCore


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    outdir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/xmem2_trace'
    cfg, net, samples, msk0, labels = bench.build()
    cfg['mem_every'] = 10_000
    cfg['deep_update_every'] = -1
    proc = InferenceCore(net, config=dict(cfg))
    proc.set_all_labels(labels)
    m0 = jnp.asarray(msk0)
    frames = [jnp.asarray(s.rgb_u8) for s in samples]
    nsrc = len(frames)
    hw = tuple(samples[0].shape)
    acc = jnp.zeros((), jnp.uint32)
    _, _, acc = proc.step(frames[0], m0, labels, pack_hw=hw, acc=acc)
    for ti in range(1, 5):
        _, _, acc = proc.step(frames[ti], pack_hw=hw, acc=acc)
    int(acc)

    stack = jnp.stack([frames[5 + i % (nsrc - 5)] for i in range(k)])

    def chunk(a):
        a = proc.step_chunk(stack, pack_hw=hw, acc=a)[1]
        proc.curr_ti -= k
        return a

    a = jnp.zeros((), jnp.uint32)
    for _ in range(3):
        a = chunk(a)
    int(a)

    with jax.profiler.trace(outdir):
        a = jnp.zeros((), jnp.uint32)
        for _ in range(5):
            a = chunk(a)
        int(a)
    print('trace written to', outdir)


if __name__ == '__main__':
    main()
