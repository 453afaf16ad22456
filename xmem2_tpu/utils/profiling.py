"""Tracing/profiling hooks (SURVEY §5.1).

The reference instruments with perf_counter + CUDA events + a final FPS /
max-memory report (eval.py:180-249, run_on_video.py:106-226). This module
adds the TPU-native layer on top of the same surfaces: `jax.profiler` device
traces viewable in TensorBoard/Perfetto, plus a lightweight stage timer for
host-side breakdowns.

Usage:
    with device_trace('/tmp/trace'):          # no-op when dir is None/empty
        ... per-frame loop ...

    timer = StageTimer()
    with timer.stage('encode'):
        ...
    print(timer.report())

eval.py --profile_dir and bench.py XMEM2_TRACE_DIR wire these up.
"""

import contextlib
import time
from collections import defaultdict
from typing import Optional


@contextlib.contextmanager
def device_trace(trace_dir: Optional[str]):
    """jax.profiler trace of everything inside the context; writes a
    TensorBoard/Perfetto-compatible trace to trace_dir. No-op without a dir
    (so call sites can pass the flag through unconditionally)."""
    if not trace_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print(f'jax.profiler trace written to {trace_dir} '
              f'(view: tensorboard --logdir {trace_dir})')


class StageTimer:
    """Host-side wall-clock accumulation per stage (the perf_counter layer of
    the reference's instrumentation, run_on_video.py:106-113)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            t, c = self.totals[name], self.counts[name]
            lines.append(f'{name}: {t:.3f}s total, {t / max(c, 1) * 1000:.2f}'
                         f' ms/call over {c} calls')
        return '\n'.join(lines)


def annotate(name: str):
    """Named region visible in device traces (jax.profiler.TraceAnnotation)."""
    import jax
    return jax.profiler.TraceAnnotation(name)
