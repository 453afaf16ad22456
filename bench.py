"""Benchmark: 480p inference FPS on example_videos/chair.

Mirrors the reference's headline number (30+ FPS interactive 480p
segmentation on an RTX 3090, reference README.md:63). Runs the real per-frame
pipeline — raw-frame upload, on-device normalize/resize, key encode, memory
readout (permanent + working + consolidation), decode, on-device resize-back
+ argmax, 4-bit-packed mask download — over all 60 chair frames at size=480
with randomly initialized weights (weights do not change the compute graph),
reporting steady-state FPS after a full warmup pass.

Two captured metrics:
  * chair_480p_device_fps (primary): the same per-frame pipeline, but each
    frame's packed mask is folded into a running device-side checksum and a
    single scalar fetch ends the timed region. The fetched value depends on
    every frame's output, so the wall time provably covers all device work —
    immune to axon's async block_until_ready AND to the ~5 MB/s d2h dev
    tunnel. This is the per-chip rate a production (host-attached) deployment
    sees; north star >= 60 FPS/chip (BASELINE.md).
  * chair_480p_e2e_fps: full end-to-end including per-frame packed-mask
    downloads (6-frame async window). On the tunneled dev TPU this is
    d2h-bound (~5-10 MB/s); on host-attached hardware it converges to the
    device rate.
  * chair_480p_device_fps_chunked: steady-state runs scanned in one dispatch
    (InferenceCore.step_chunk); the primary metric takes the best of the
    per-frame and chunked pipelines.
  * caps_2obj_480p_device_fps: 2-object multi-group matching/decoding.
  * chair_480p_p50_frame_latency_ms: depth-1-pipeline per-frame latency
    (BASELINE.md rebuild target); tunnel-RTT-bound on the dev chip.
  * longvideo_480p_device_fps: 300-frame consolidation/eviction regime.

Prints ONE JSON line; the primary metric fills {"metric", "value", "unit",
"vs_baseline"} and the secondary ride in "extra_metrics".

Artifact capture: the driver records only the TAIL of stdout, so the final
stdout line must stay compact — r03's single giant line (notes + stage
breakdown inline) got head-truncated and parsed as null (ADVICE.md r3). The
FULL result (notes, stage breakdown, perf analysis) is therefore written to
BENCH_FULL.json next to this script and pretty-printed to stderr; the last
stdout line carries every metric name/value/unit/vs_baseline but no prose.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_FPS = 30.0  # reference README.md:63 (RTX 3090)
CHAIR = '/root/reference/example_videos/chair'
CAPS = '/root/reference/example_videos/caps'


def build(size=480, video=CHAIR):
    import jax.numpy as jnp
    from xmem2_tpu.config import VIDEO_INFERENCE_CONFIG
    from xmem2_tpu.models.init import init_params
    from xmem2_tpu.inference.net import XMemNet
    from xmem2_tpu.inference.core import InferenceCore
    from xmem2_tpu.inference.data.video_reader import VideoReader
    from xmem2_tpu.inference.data.mask_mapper import MaskMapper

    cfg = VIDEO_INFERENCE_CONFIG.copy()
    cfg['size'] = size
    cfg['compute_dtype'] = 'bfloat16'        # the reference benches under fp16
    cfg['value_store_dtype'] = 'bfloat16'    # autocast (run_on_video.py:75)
    params = init_params(seed=0)
    net = XMemNet(params, compute_dtype=jnp.bfloat16)
    reader = VideoReader('', f'{video}/JPEGImages', f'{video}/Annotations',
                         size=size, use_all_masks=False)
    samples = [reader[i] for i in range(len(reader))]

    mapper = MaskMapper()
    msk0, labels = mapper.convert_mask(samples[0].mask, exhaustive=True)
    msk0 = reader.resize_mask(msk0)
    return cfg, net, samples, msk0, list(mapper.remappings.values())


def run_video(net, cfg, samples, msk0, labels, window=16):
    """Full per-frame pipeline: raw uint8 frame upload, on-device
    normalize/resize, encode, memory read, decode, on-device resize-back +
    argmax, and the uint8 mask download. Downloads are pipelined with a
    deep async in-flight window (the reference's DataLoader/image-saver
    processes overlap the same way); on the ~5 MB/s dev tunnel the window
    must cover several frames' RTT for the downloads to overlap compute."""
    from collections import deque
    import jax.numpy as jnp
    from xmem2_tpu.inference.core import InferenceCore
    from xmem2_tpu.inference.postprocess import unpack_mask
    proc = InferenceCore(net, config=dict(cfg))
    proc.set_all_labels(labels)
    m0 = jnp.asarray(msk0)
    inflight = deque()
    results = []
    for ti, s in enumerate(samples):
        rgb = jnp.asarray(s.rgb_u8)
        hw = tuple(s.shape)
        if ti == 0:
            _, mask, _ = proc.step(rgb, m0, labels,
                                   end=(ti == len(samples) - 1), pack_hw=hw)
        else:
            _, mask, _ = proc.step(rgb, end=(ti == len(samples) - 1),
                                   pack_hw=hw)
        mask.copy_to_host_async()
        inflight.append((mask, s.shape[1]))
        if len(inflight) > window:
            m, w = inflight.popleft()
            results.append(unpack_mask(m, w, proc.pack_bits))
    while inflight:
        m, w = inflight.popleft()
        results.append(unpack_mask(m, w, proc.pack_bits))
    return results


_STAGED = {}


def _staged_frames(samples):
    """Device-resident raw frames, staged once per process: the device metric
    measures the chip pipeline, not per-frame host transfers (the reference's
    DataLoader workers pre-stage frames the same way). Normalize/resize still
    run on device inside each frame's program."""
    key = id(samples)
    if key not in _STAGED:
        import jax.numpy as jnp
        stack = jnp.asarray(np.stack([s.rgb_u8 for s in samples]))
        _STAGED[key] = [stack[i] for i in range(stack.shape[0])]
    return _STAGED[key]


def run_video_device(net, cfg, samples, msk0, labels):
    """Device-pipeline pass: identical per-frame compute, but instead of
    downloading masks, every frame's packed mask is reduced and added into a
    running device scalar; one final fetch of that scalar closes the timing.
    The result depends on every frame, so the elapsed wall time bounds ALL
    device work from above — no async-timing escape hatch."""
    import jax.numpy as jnp
    from xmem2_tpu.inference.core import InferenceCore
    proc = InferenceCore(net, config=dict(cfg))
    proc.set_all_labels(labels)
    m0 = jnp.asarray(msk0)
    frames = _staged_frames(samples)
    acc = jnp.zeros((), jnp.uint32)
    for ti, s in enumerate(samples):
        rgb = frames[ti]
        hw = tuple(s.shape)
        if ti == 0:
            _, _, acc = proc.step(rgb, m0, labels,
                                  end=(ti == len(samples) - 1),
                                  pack_hw=hw, acc=acc)
        else:
            _, _, acc = proc.step(rgb, end=(ti == len(samples) - 1),
                                  pack_hw=hw, acc=acc)
    return int(acc)  # the data-dependent fetch that ends the timed region


def run_video_device_chunked(net, cfg, samples, msk0, labels):
    """Device-pipeline pass with chunked steady-state stepping: runs of plain
    frames between memory events execute as ONE lax.scan program
    (InferenceCore.step_chunk), so the per-dispatch cost amortizes by the
    chunk length. Same checksum-chain timing as run_video_device; the frame
    stacks are pre-staged once per process (chunk boundaries are
    deterministic for a fixed config)."""
    import jax.numpy as jnp
    from xmem2_tpu.inference.core import InferenceCore
    proc = InferenceCore(net, config=dict(cfg))
    proc.set_all_labels(labels)
    m0 = jnp.asarray(msk0)
    frames = _staged_frames(samples)
    stacks = _STAGED.setdefault(('chunks', id(samples)), {})
    acc = jnp.zeros((), jnp.uint32)
    n = len(samples)
    ti = 0
    while ti < n:
        hw = tuple(samples[ti].shape)
        if ti == 0:
            _, _, acc = proc.step(frames[ti], m0, labels, end=(n == 1),
                                  pack_hw=hw, acc=acc)
            ti += 1
            continue
        k = min(proc.plain_run_length(), n - 1 - ti)
        if k > 1:
            if (ti, k) not in stacks:
                stacks[(ti, k)] = jnp.stack(frames[ti:ti + k])
            _, acc = proc.step_chunk(stacks[(ti, k)], pack_hw=hw, acc=acc)
            ti += k
        else:
            _, _, acc = proc.step(frames[ti], end=(ti == n - 1),
                                  pack_hw=hw, acc=acc)
            ti += 1
    return int(acc)


def run_video_device_latency(net, cfg, samples, msk0, labels, depth=1):
    """Per-frame latency at a given pipeline depth.

    depth=1: each frame's checksum is fetched before the next frame is
    submitted — on the tunneled dev chip this is dominated by the ~25-30 ms
    host<->device round-trip; on host-attached hardware it converges to
    per-frame device time. depth>1 keeps `depth` frames in flight and
    fetches the oldest before submitting the next, so the RTT amortizes over
    `depth` frames and the figure approaches per-frame DEVICE time even over
    the tunnel. Returns the list of per-frame seconds (steady-state frames
    only, first 10 skipped)."""
    from collections import deque
    import jax.numpy as jnp
    from xmem2_tpu.inference.core import InferenceCore
    proc = InferenceCore(net, config=dict(cfg))
    proc.set_all_labels(labels)
    m0 = jnp.asarray(msk0)
    frames = _staged_frames(samples)
    acc = jnp.zeros((), jnp.uint32)
    inflight = deque()
    times = []
    for ti, s in enumerate(samples):
        hw = tuple(s.shape)
        t0 = time.perf_counter()
        if ti == 0:
            _, _, acc = proc.step(frames[ti], m0, labels,
                                  end=(ti == len(samples) - 1),
                                  pack_hw=hw, acc=acc)
        else:
            _, _, acc = proc.step(frames[ti], end=(ti == len(samples) - 1),
                                  pack_hw=hw, acc=acc)
        inflight.append(acc)
        if len(inflight) >= depth:
            int(inflight.popleft())      # data-dependent fetch
        times.append(time.perf_counter() - t0)
    while inflight:
        int(inflight.popleft())
    return times[10:]


def measure_transport_floor(samples, pack_bits=1, reps=6):
    """Per-frame transport floor of the e2e path on THIS link (ms/frame).

    The production loop uploads one raw u8 frame and downloads one
    bit-packed index mask per frame — nothing else crosses the link
    (run_on_video.py:271-279; IoU/overlay/palette work runs host-side on the
    unpacked mask). This measures h2d and d2h bandwidth with transfers of
    exactly those sizes and returns
    (floor_ms, up_ms, down_ms, up_bytes, down_bytes): the wall each frame
    must pay even with infinite compute, pipelining aside. If measured e2e
    ms/frame ~ floor_ms, the e2e gap vs device FPS is the link, not the
    code."""
    import jax
    import jax.numpy as jnp
    h, w = samples[0].shape
    up_bytes = h * w * 3
    down_bytes = h * ((w * pack_bits + 7) // 8)

    fetch = jax.jit(lambda x: jnp.sum(x.astype(jnp.uint32)) % 7)
    bump = jax.jit(lambda x, i: x + i)
    up_host = np.ones((h, w, 3), np.uint8)
    down_dev = jax.device_put(np.ones((h, (w * pack_bits + 7) // 8), np.uint8))
    scalar_dev = jax.device_put(np.ones((1,), np.uint8))
    int(fetch(jax.device_put(up_host)))        # warm compiles + link
    np.asarray(bump(down_dev, np.uint8(0)))
    int(fetch(bump(scalar_dev, np.uint8(0))))

    def best(f):
        # fresh values each rep: jax caches np.asarray results on the Array
        # and may dedupe repeated device_put of an identical host buffer
        b = float('inf')
        for i in range(reps):
            t0 = time.perf_counter()
            f(i)
            b = min(b, time.perf_counter() - t0)
        return b

    rtt = best(lambda i: int(fetch(bump(scalar_dev, np.uint8(i)))))
    up = max(best(lambda i: int(fetch(jax.device_put(up_host + np.uint8(i)))))
             - rtt, 0.0)
    down = max(best(lambda i: np.asarray(bump(down_dev, np.uint8(i)))) - rtt,
               0.0)
    return ((up + down) * 1e3, up * 1e3, down * 1e3, up_bytes, down_bytes)


def sharded_readout_overhead(iters=20):
    """Single-chip cost model for --memory_shards (SURVEY §2.9 CP-analog):
    the fused local readout vs the shard_map path on a 1-device 'memory'
    mesh over the SAME bank. The shard_map path at D=1 pays its exact-top-k
    candidate merge + psum structure with zero ICI work, so the ratio is the
    pure software overhead a deployment accepts per shard; on real multi-chip
    meshes the bank (and its HBM traffic) divides by D against this constant.
    Returns (local_ms, sharded_ms) per readout, timed with a data-dependent
    scan chain + one scalar fetch (honest over the tunnel)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from xmem2_tpu.ops.readout_kernel import fused_topk_readout_multi
    from xmem2_tpu.parallel.sharded_readout import (
        shard_memory_bank, sharded_topk_readout_multi)

    rng = np.random.default_rng(0)
    n, p, ck, cv, top_k = 1280, 1620, 64, 512, 30   # chair steady-state scale
    mk = jnp.asarray(rng.standard_normal((n, ck)).astype(np.float32))
    ms = jnp.asarray(np.abs(rng.standard_normal((n,))).astype(np.float32) + 1)
    qk0 = jnp.asarray(rng.standard_normal((p, ck)).astype(np.float32))
    qe = jnp.asarray(np.abs(rng.standard_normal((p, ck))).astype(np.float32))
    values = jnp.asarray(rng.standard_normal((1, n, cv)).astype(np.float32))
    valid = jnp.ones((1, n), bool)

    mesh = Mesh(np.array(jax.devices()[:1]), ('memory',))
    sharded_bank = shard_memory_bank(mesh, mk, ms, values, valid)

    def chain(readout_fn):
        @jax.jit
        def run(qk_in):
            def body(q, _):
                out = readout_fn(q)
                s = jnp.sum(out) * jnp.float32(1e-9)
                return qk_in + s, s          # data-dependence between iters
            q, ss = jax.lax.scan(body, qk_in, None, length=iters)
            return jnp.sum(ss)
        return run

    interp = jax.default_backend() == 'cpu'   # pallas needs interpret on CPU
    local = chain(lambda q: fused_topk_readout_multi(
        [(mk, ms, values, valid)], q, qe, (0,), top_k, interpret=interp)[0])
    sharded = chain(lambda q: sharded_topk_readout_multi(
        mesh, [sharded_bank], q, qe, (0,), top_k)[0])

    res = {}
    for name, fn in (('local', local), ('sharded', sharded)):
        float(fn(qk0))                         # compile + warm
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(qk0))
            best = min(best, (time.perf_counter() - t0) / iters)
        res[name] = best * 1e3
    return res['local'], res['sharded']


def measure_dispatch_rtt(n=40):
    """Bare dispatch round-trip: submit one trivial jitted op and fetch its
    scalar result. On a host-attached TPU this is ~100us; over the axon dev
    tunnel it is tens of ms and dominates any depth-1 per-frame latency. The
    p50 of this probe decomposes the depth-1 frame latency into
    (transport RTT) + (device compute): the residual p50_frame - p50_rtt is
    what a production host-attached deployment would observe."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def tick(x):
        return x + 1

    x = jnp.zeros((), jnp.uint32)
    for _ in range(5):                      # warm: compile + staging
        x = tick(x)
        int(x)
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        x = tick(x)
        int(x)                              # data-dependent fetch
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def run_long_video_device(net, cfg, samples, msk0, labels, n_frames=300):
    """expand_long_vid-style stress: the chair frames ping-ponged to n_frames
    with the default memory config, so working memory saturates and
    consolidation feeds the long-term store — the regime where the fused
    readout kernel's no-dense-affinity design pays. Same checksum-chain
    timing as run_video_device."""
    import jax.numpy as jnp
    from xmem2_tpu.inference.core import InferenceCore
    proc = InferenceCore(net, config=dict(cfg))
    proc.set_all_labels(labels)
    m0 = jnp.asarray(msk0)
    frames = _staged_frames(samples)
    k = len(frames)
    order = list(range(k)) + list(range(k - 2, 0, -1))   # ping-pong
    acc = jnp.zeros((), jnp.uint32)
    for ti in range(n_frames):
        s_i = order[ti % len(order)]
        hw = tuple(samples[s_i].shape)
        if ti == 0:
            _, _, acc = proc.step(frames[s_i], m0, labels,
                                  end=(ti == n_frames - 1),
                                  pack_hw=hw, acc=acc)
        else:
            _, _, acc = proc.step(frames[s_i], end=(ti == n_frames - 1),
                                  pack_hw=hw, acc=acc)
    lt = proc.memory.long_size
    return int(acc), lt


def stage_breakdown(net, cfg, samples, msk0, labels, iters=40):
    """Per-stage device timings (ms/frame) for the steady-state pipeline.

    Times NESTED truncated frame programs (`_plain_frame_step(...,
    stop_after='key'/'readout'/'decode'/None)`): each truncated program runs
    the real frame pipeline up to the cut and folds everything it computed
    into the checksum, so a single data-dependent fetch bounds all device
    work up to that point (same honesty rule as the FPS metrics). Stage costs
    are successive differences, so by construction
    key + readout + decode + pack_resize = full_frame. Value encode
    (ResNet-18, runs once per mem_every frames) is reported separately."""
    import jax
    import jax.numpy as jnp
    from xmem2_tpu.inference.core import InferenceCore, _plain_frame_step
    proc = InferenceCore(net, config=dict(cfg))
    proc.set_all_labels(labels)
    m0 = jnp.asarray(msk0)
    frames = _staged_frames(samples)
    hw = tuple(samples[0].shape)
    proc.step(frames[0], m0, labels, pack_hw=hw)
    for ti in range(1, 12):        # engage memory incl. one mem frame
        proc.step(frames[ti % len(frames)], pack_hw=hw,
                  acc=jnp.zeros((), jnp.uint32))

    mm = proc.memory
    cfgm = mm.match_static_config(False)

    def staged_loop(stop_after):
        acc = jnp.zeros((), jnp.uint32)
        for i in range(iters):
            r = _plain_frame_step(
                net.params, frames[13 + (i % 10)], mm.temp, mm.perm,
                mm.long if cfgm['use_long'] else None, mm.get_hidden(), acc,
                size=proc.size, h_out=True,
                dtype_name=getattr(net.dtype, '__name__', str(net.dtype)),
                pack_hw=hw, mem_frame=False, deep_update=False,
                use_selection=proc.enable_long_term, stop_after=stop_after,
                **cfgm)
            acc = r if stop_after else r[-1]
        return int(acc)

    cum = {}
    for stop in ('key', 'readout', 'decode', None):
        staged_loop(stop)                      # warm/compile
        best = float('inf')
        for _ in range(2):
            t0 = time.perf_counter()
            staged_loop(stop)
            best = min(best, (time.perf_counter() - t0) / iters)
        cum[stop or 'full'] = best * 1e3

    timings = {
        'key_encode': round(cum['key'], 3),
        'memory_readout': round(cum['readout'] - cum['key'], 3),
        'decode': round(cum['decode'] - cum['readout'], 3),
        'pack_resize': round(cum['full'] - cum['decode'], 3),
        'full_frame': round(cum['full'], 3),
    }

    @jax.jit
    def value_loop(img, f16, hidden, mask):
        def body(c, _):
            v, h = net.encode_value(img, f16, hidden, mask)
            return c + jnp.sum(v) * 1e-6, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    f16 = net.encode_key(jnp.zeros((1, 480, 864, 3)))[3]
    hidden = mm.get_hidden()
    n_obj = hidden.shape[1]   # value encoder runs per object group member
    mask1 = jnp.zeros((1, n_obj, 480, 864))
    try:
        img0 = jnp.zeros((1, 480, 864, 3))
        float(value_loop(img0, f16, hidden, mask1))      # warm/compile
        best = float('inf')
        for _ in range(2):
            t0 = time.perf_counter()
            float(value_loop(img0, f16, hidden, mask1))
            best = min(best, (time.perf_counter() - t0) / iters)
        timings['value_encode_per_memframe'] = round(best * 1e3, 3)
    except Exception:
        timings['value_encode_per_memframe'] = None
    return timings


def synth_multiobj_mask(msk0, n_obj):
    """N-object one-hot first-frame mask: n_obj vertical strips spanning the
    frame (PUMaVOS-realistic object counts; the strips keep every object
    non-empty so all groups engage)."""
    h, w = np.asarray(msk0).shape[-2:]
    m = np.zeros((n_obj, h, w), np.float32)
    for i in range(n_obj):
        m[i, :, i * w // n_obj:(i + 1) * w // n_obj] = 1.0
    return m


def frame_flops(net, cfg, samples, msk0, labels):
    """FLOPs of the steady-state single-dispatch frame program via XLA cost
    analysis (None when the backend does not report it)."""
    import jax.numpy as jnp
    from xmem2_tpu.inference.core import InferenceCore, _plain_frame_step
    proc = InferenceCore(net, config=dict(cfg))
    proc.set_all_labels(labels)
    m0 = jnp.asarray(msk0)
    frames = _staged_frames(samples)
    hw = tuple(samples[0].shape)
    proc.step(frames[0], m0, labels, pack_hw=hw)
    for ti in range(1, 3):   # engage working memory -> fast path
        proc.step(frames[ti], pack_hw=hw, acc=jnp.zeros((), jnp.uint32))
    mm = proc.memory
    cfgm = mm.match_static_config(False)
    try:
        lowered = _plain_frame_step.lower(
            net.params, frames[3], mm.temp, mm.perm,
            mm.long if cfgm['use_long'] else None, mm.get_hidden(),
            jnp.zeros((), jnp.uint32),
            size=proc.size, h_out=True,
            dtype_name=getattr(net.dtype, '__name__', str(net.dtype)),
            pack_hw=hw, mem_frame=False, deep_update=False,
            use_selection=proc.enable_long_term, **cfgm)
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca['flops']) if ca and 'flops' in ca else None
    except Exception:
        return None


# bf16 peak TFLOP/s per chip by device kind (public specs); keys are matched
# against the space-stripped lowercase device_kind, most specific first
_PEAK_TFLOPS = (('v6e', 918.0), ('v5p', 459.0), ('v5lite', 197.0),
                ('v5e', 197.0), ('v4', 275.0))


def peak_tflops():
    import os
    env = os.environ.get('XMEM2_PEAK_TFLOPS')
    if env:
        return float(env)
    try:
        import jax
        kind = jax.devices()[0].device_kind.lower().replace(' ', '')
        for k, v in _PEAK_TFLOPS:
            if k in kind:
                return v
    except Exception:
        pass
    return None


def _compact(result: dict) -> dict:
    """The tail-capture-safe stdout form: every metric kept, prose dropped."""
    keep = ('metric', 'value', 'unit', 'vs_baseline', 'checksum_ok')
    slim = {k: v for k, v in result.items()
            if k in keep + ('frame_gflops', 'mfu_pct')}
    slim['extra_metrics'] = [
        {k: v for k, v in m.items() if k in keep}
        for m in result.get('extra_metrics', ())
    ]
    slim['detail'] = 'BENCH_FULL.json'
    return slim


def emit(result: dict):
    """Persist the full result and print the compact headline line LAST."""
    full = json.dumps(result, indent=1)
    path = os.environ.get('XMEM2_BENCH_FULL') or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), 'BENCH_FULL.json')
    try:
        with open(path, 'w') as f:
            f.write(full + '\n')
    except OSError as e:  # read-only checkout: stderr still carries the full
        print(f'could not write {path}: {e}', file=sys.stderr)
    print(full, file=sys.stderr)
    print(json.dumps(_compact(result)))


def main():
    # persistent compile cache: the full sweep compiles dozens of frame-kind
    # variants (chair/caps/4obj/8obj/staged/long); caching them makes repeat
    # bench runs start timing in seconds instead of tens of minutes
    import jax
    jax.config.update('jax_compilation_cache_dir', os.path.join(
        os.path.dirname(os.path.abspath(__file__)), '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)

    cfg, net, samples, msk0, labels = build()
    # two warmup passes: the first compiles every frame-kind variant, the
    # second drains per-executable staging costs (the first few executions
    # of a fresh program are ~10x slower on the tunneled runtime)
    run_video_device(net, cfg, samples, msk0, labels)
    run_video_device(net, cfg, samples, msk0, labels)

    # best of 3 timed passes (the dev tunnel's latency/bandwidth wobble);
    # XMEM2_TRACE_DIR wraps them in a jax.profiler device trace
    from xmem2_tpu.utils.profiling import device_trace
    device_fps, checksum = 0.0, None
    with device_trace(os.environ.get('XMEM2_TRACE_DIR')):
        for _ in range(3):
            t0 = time.perf_counter()
            checksum = run_video_device(net, cfg, samples, msk0, labels)
            dt = time.perf_counter() - t0
            device_fps = max(device_fps, len(samples) / dt)

    run_video_device_chunked(net, cfg, samples, msk0, labels)  # warm
    run_video_device_chunked(net, cfg, samples, msk0, labels)
    chunked_fps, chunked_sum = 0.0, None
    for _ in range(3):
        t0 = time.perf_counter()
        chunked_sum = run_video_device_chunked(net, cfg, samples, msk0, labels)
        dt = time.perf_counter() - t0
        chunked_fps = max(chunked_fps, len(samples) / dt)
    # packed-mask sums may differ by a few boundary pixels (scan vs unrolled
    # fusion changes float summation order); large drift means a real bug,
    # so the chunked rate may only become the headline metric when the drift
    # is within tolerance — and any mismatch is carried in the JSON output.
    chunked_drift = abs((chunked_sum or 0) - (checksum or 0)) / max(
        abs(checksum or 0), 1)
    chunked_ok = chunked_drift <= 1e-3
    if chunked_sum != checksum:
        import sys
        print(f'chunked checksum {chunked_sum} != per-frame {checksum} '
              f'(drift {chunked_drift:.2e}, ok={chunked_ok})',
              file=sys.stderr)

    run_video(net, cfg, samples, msk0, labels)  # warm the download pipeline
    e2e_fps = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        run_video(net, cfg, samples, msk0, labels)
        dt = time.perf_counter() - t0
        e2e_fps = max(e2e_fps, len(samples) / dt)

    # transport floor of the e2e loop on this link: one u8 frame up + one
    # bit-packed mask down per frame is ALL that crosses (run_on_video.py)
    try:
        floor_ms, up_ms, down_ms, up_b, down_b = measure_transport_floor(
            samples, pack_bits=1)
    except Exception:
        floor_ms = up_ms = down_ms = up_b = down_b = None

    def best_device_fps(bnet, bcfg, bsamples, bmsk0, blabels, passes=2):
        """Best of the per-frame and chunked device pipelines (chunked
        stepping is the production default), gated on checksum agreement —
        the same rule as the chair headline metric."""
        run_video_device(bnet, bcfg, bsamples, bmsk0, blabels)  # warm
        run_video_device(bnet, bcfg, bsamples, bmsk0, blabels)
        fps, ck = 0.0, None
        for _ in range(passes):
            t0 = time.perf_counter()
            ck = run_video_device(bnet, bcfg, bsamples, bmsk0, blabels)
            fps = max(fps, len(bsamples) / (time.perf_counter() - t0))
        run_video_device_chunked(bnet, bcfg, bsamples, bmsk0, blabels)  # warm
        cfps, cck = 0.0, None
        for _ in range(passes):
            t0 = time.perf_counter()
            cck = run_video_device_chunked(bnet, bcfg, bsamples, bmsk0,
                                           blabels)
            cfps = max(cfps, len(bsamples) / (time.perf_counter() - t0))
        drift = abs((cck or 0) - (ck or 0)) / max(abs(ck or 0), 1)
        return max(fps, cfps) if drift <= 1e-3 else fps

    # multi-object (2 caps, 87 frames): distinct group structure — the
    # reference headline is multi-object interactive segmentation
    mcfg, mnet, msamples, mmsk0, mlabels = build(video=CAPS)
    multi_fps = best_device_fps(mnet, mcfg, msamples, mmsk0, mlabels)

    # N-object scaling (VERDICT r2 #7): 4 and 8 synthetic objects on the
    # chair frames — PUMaVOS-realistic object counts; measures multi-group
    # matching + decoding scaling beyond caps' 2 objects
    nobj_metrics = []
    for n_obj in (4, 8):
        nm = synth_multiobj_mask(msk0, n_obj)
        nlabels = list(range(1, n_obj + 1))
        nobj_metrics.append(
            (n_obj, best_device_fps(net, cfg, samples, nm, nlabels)))

    # whole-dataset throughput: every chair + caps frame back-to-back
    t0 = time.perf_counter()
    run_video_device(net, cfg, samples, msk0, labels)
    run_video_device(mnet, mcfg, msamples, mmsk0, mlabels)
    dt = time.perf_counter() - t0
    dataset_fps = (len(samples) + len(msamples)) / dt

    lat = run_video_device_latency(net, cfg, samples, msk0, labels)
    p50_ms = float(np.median(lat) * 1e3)
    lat4 = run_video_device_latency(net, cfg, samples, msk0, labels, depth=4)
    p50_d4_ms = float(np.median(lat4) * 1e3)
    rtt_ms = measure_dispatch_rtt() * 1e3
    p50_resid_ms = max(p50_ms - rtt_ms, 1e-6)

    flops = frame_flops(net, cfg, samples, msk0, labels)
    peak = peak_tflops()
    mfu_pct = None
    try:
        breakdown = stage_breakdown(net, cfg, samples, msk0, labels)
    except Exception:
        import traceback
        traceback.print_exc()
        breakdown = None

    try:
        shard_local_ms, shard_map_ms = sharded_readout_overhead()
    except Exception:
        import traceback
        traceback.print_exc()
        shard_local_ms = shard_map_ms = None

    n_long = 300
    run_long_video_device(net, cfg, samples, msk0, labels, n_long)  # warm
    long_fps, long_lt = 0.0, 0
    for _ in range(2):
        t0 = time.perf_counter()
        _, long_lt = run_long_video_device(net, cfg, samples, msk0, labels,
                                           n_long)
        dt = time.perf_counter() - t0
        long_fps = max(long_fps, n_long / dt)

    # real-weights accuracy gate: runs automatically the moment trained
    # weights appear at saves/XMem.{pth,npz}; otherwise writes an explicit
    # SKIPPED artifact (ACCURACY.json) instead of silence
    accuracy = None
    try:
        from pathlib import Path
        sys.path.insert(0, str(Path(__file__).parent / 'scripts'))
        import accuracy_gate
        weights = accuracy_gate.find_weights()
        accuracy = (accuracy_gate.run_gate(weights) if weights is not None
                    else {'status': 'SKIPPED',
                          'reason': 'no trained weights at saves/XMem.{pth,npz}',
                          'pass': None})
        accuracy_gate.ARTIFACT.write_text(
            json.dumps(accuracy, indent=1) + '\n')
    except Exception:
        import traceback
        traceback.print_exc()

    best_fps = max(device_fps, chunked_fps) if chunked_ok else device_fps
    if flops is not None and peak is not None:
        mfu_pct = round(100.0 * flops * best_fps / (peak * 1e12), 2)
    emit({
        'metric': 'chair_480p_device_fps',
        'value': round(best_fps, 2),
        'unit': 'frames/sec',
        'vs_baseline': round(best_fps / BASELINE_FPS, 3),
        'extra_metrics': [{
            'metric': 'chair_480p_device_fps_chunked',
            'value': round(chunked_fps, 2),
            'unit': 'frames/sec',
            'vs_baseline': round(chunked_fps / BASELINE_FPS, 3),
            'checksum_ok': chunked_ok,
            'note': 'steady-state runs scanned in one dispatch '
                    '(InferenceCore.step_chunk); per-frame rate = '
                    f'{round(device_fps, 2)}',
        }, {
            'metric': 'chair_480p_e2e_fps',
            'value': round(e2e_fps, 2),
            'unit': 'frames/sec',
            'vs_baseline': round(e2e_fps / BASELINE_FPS, 3),
            'note': 'd2h-bound on the ~5MB/s dev tunnel; converges to '
                    'device_fps on host-attached TPUs',
        }, {
            'metric': 'e2e_transport_floor_ms_per_frame',
            'value': round(floor_ms, 2) if floor_ms is not None else None,
            'unit': 'ms',
            'vs_baseline': None,
            'note': (f'link floor for the e2e loop: {up_b}B frame up '
                     f'({up_ms:.1f}ms) + {down_b}B packed mask down '
                     f'({down_ms:.1f}ms) per frame — nothing else crosses '
                     f'the link (run_on_video.py:271-279). When measured '
                     f'e2e ms/frame ~ this floor, the e2e-vs-device gap is '
                     f'the dev tunnel, not the code; host-attached TPUs '
                     f'have >10GB/s links and the floor vanishes'
                     ) if floor_ms is not None else 'measurement failed',
        }, {
            'metric': 'caps_2obj_480p_device_fps',
            'value': round(multi_fps, 2),
            'unit': 'frames/sec',
            'vs_baseline': round(multi_fps / BASELINE_FPS, 3),
            'note': '2-object caps video (87 frames) — multi-object group '
                    'matching and decoding',
        }, {
            'metric': 'chair_4obj_480p_device_fps',
            'value': round(nobj_metrics[0][1], 2),
            'unit': 'frames/sec',
            'vs_baseline': round(nobj_metrics[0][1] / BASELINE_FPS, 3),
            'note': '4 synthetic objects (one group) on the chair frames',
        }, {
            'metric': 'chair_8obj_480p_device_fps',
            'value': round(nobj_metrics[1][1], 2),
            'unit': 'frames/sec',
            'vs_baseline': round(nobj_metrics[1][1] / BASELINE_FPS, 3),
            'note': '8 synthetic objects (one group) on the chair frames',
        }, {
            'metric': 'dataset_throughput_fps',
            'value': round(dataset_fps, 2),
            'unit': 'frames/sec',
            'vs_baseline': round(dataset_fps / BASELINE_FPS, 3),
            'note': 'all chair + caps frames back-to-back (147 frames, '
                    'two videos, fresh memory each)',
        }, {
            'metric': 'chair_480p_p50_frame_latency_ms',
            'value': round(p50_ms, 2),
            'unit': 'ms',
            'vs_baseline': round((1000.0 / BASELINE_FPS) / p50_ms, 3),
            'note': 'depth-1 pipeline (fetch every frame); dominated by the '
                    'dev tunnel round-trip here, converges to per-frame '
                    'device time on host-attached TPUs',
        }, {
            'metric': 'dispatch_rtt_p50_ms',
            'value': round(rtt_ms, 2),
            'unit': 'ms',
            'vs_baseline': None,
            'note': 'bare jitted-noop round-trip (submit + scalar fetch): '
                    'the transport floor under any depth-1 latency figure',
        }, {
            'metric': 'chair_480p_p50_frame_latency_minus_rtt_ms',
            'value': round(p50_resid_ms, 2),
            'unit': 'ms',
            'vs_baseline': round((1000.0 / BASELINE_FPS) / p50_resid_ms, 3),
            'note': 'depth-1 p50 with the measured dispatch RTT subtracted: '
                    'the per-frame latency a host-attached deployment sees',
        }, {
            'metric': 'chair_480p_p50_frame_latency_depth4_ms',
            'value': round(p50_d4_ms, 2),
            'unit': 'ms',
            'vs_baseline': round((1000.0 / BASELINE_FPS) / p50_d4_ms, 3),
            'note': '4 frames in flight: the tunnel RTT amortizes and this '
                    'approaches true per-frame device time',
        }, {
            'metric': 'sharded_readout_overhead_ms',
            'value': (round(shard_map_ms - shard_local_ms, 3)
                      if shard_map_ms is not None else None),
            'unit': 'ms',
            'vs_baseline': None,
            'note': (f'shard_map memory readout at D=1 vs fused local on the '
                     f'same bank (local {shard_local_ms:.3f}ms, sharded '
                     f'{shard_map_ms:.3f}ms/readout): the per-shard software '
                     f'cost of --memory_shards with zero ICI work; on real '
                     f'multi-chip meshes the bank and its HBM traffic divide '
                     f'by D against this constant (SURVEY 2.9 CP-analog)'
                     ) if shard_map_ms is not None else 'measurement failed',
        }, {
            'metric': 'longvideo_480p_device_fps',
            'value': round(long_fps, 2),
            'unit': 'frames/sec',
            'vs_baseline': round(long_fps / BASELINE_FPS, 3),
            'note': f'{n_long} ping-ponged frames, default memory config, '
                    f'long-term store engaged ({long_lt} elements) — the '
                    f'fused-readout (no dense affinity) regime',
        }],
        'timing_method': 'device_fps fetches one scalar that every frame\'s '
                         'packed mask feeds into; wall time therefore covers '
                         'all device work (checksum=%d)' % checksum,
        'frame_gflops': round(flops / 1e9, 2) if flops else None,
        'mfu_pct': mfu_pct,
        'stage_breakdown_ms': breakdown,
        'perf_note': (
            'top per-frame sinks: ' + ', '.join(
                f'{k}={v}ms' for k, v in sorted(
                    ((k, v) for k, v in breakdown.items()
                     if k != 'full_frame' and v), key=lambda kv: -kv[1])[:3])
            + '; batch-1 conv inference is latency- not FLOP-bound, so the '
              'next rung is cross-frame batching (step_chunk already scans '
              'runs) and bf16 end-to-end'
        ) if breakdown else None,
    })


if __name__ == '__main__':
    # transient tunnel/runtime errors shouldn't zero the benchmark
    for attempt in range(3):
        try:
            main()
            break
        except Exception as e:
            import sys
            import traceback
            traceback.print_exc()
            print(f'bench attempt {attempt + 1} failed; retrying',
                  file=sys.stderr)
    else:
        raise SystemExit(1)
