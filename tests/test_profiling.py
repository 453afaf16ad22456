"""Tracing/profiling hooks (SURVEY 5.1): jax.profiler device traces and the
host-side stage timer."""

import os

import jax.numpy as jnp

from xmem2_tpu.utils.profiling import StageTimer, annotate, device_trace


def test_stage_timer_report():
    t = StageTimer()
    for _ in range(3):
        with t.stage('encode'):
            pass
    with t.stage('match'):
        pass
    rep = t.report()
    assert 'encode' in rep and '3 calls' in rep
    assert 'match' in rep and '1 calls' in rep


def test_device_trace_noop_without_dir():
    with device_trace(None):
        pass
    with device_trace(''):
        pass


def test_device_trace_writes_files(tmp_path):
    with device_trace(str(tmp_path)):
        with annotate('matmul'):
            x = jnp.ones((32, 32))
            (x @ x).block_until_ready()
    files = [f for _, _, fs in os.walk(tmp_path) for f in fs]
    assert files, 'no trace files written'
