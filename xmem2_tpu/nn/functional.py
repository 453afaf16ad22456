"""Functional NN primitives, NHWC-native for TPU.

Parameter trees are nested dicts whose leaf names mirror the torch state-dict
conventions of the reference model ('weight', 'bias', 'running_mean',
'running_var') with layouts already converted for XLA:
  conv weight:   HWIO  (torch OIHW is transposed by the bridge)
  linear weight: [in, out]
Everything here is shape-static and jit-friendly. Convs run on the MXU; use
`dtype=jnp.bfloat16` for the fast path (accumulation stays f32).
"""

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

_CONV_DIMS = ('NHWC', 'HWIO', 'NHWC')

# f32 operands go through the MXU at full precision (XLA's default CPU/TPU conv
# is allowed to downcast); bf16 operands — the TPU fast path — are unaffected,
# they are native MXU inputs with f32 accumulation either way.
_PRECISION = jax.lax.Precision.HIGHEST


def conv2d(
    x: jnp.ndarray,
    params: dict,
    stride: Union[int, Tuple[int, int]] = 1,
    padding: Union[int, Tuple[int, int]] = 0,
    dilation: Union[int, Tuple[int, int]] = 1,
    groups: int = 1,
    dtype=None,
) -> jnp.ndarray:
    """2D convolution. x: [N, H, W, Cin], params['weight']: [kh, kw, Cin/groups, Cout].
    groups > 1 gives grouped/depthwise convolution (torch groups semantics)."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    w = params['weight']
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        rhs_dilation=dilation,
        dimension_numbers=_CONV_DIMS,
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
        precision=_PRECISION,
    )
    if 'bias' in params and params['bias'] is not None:
        out = out + params['bias'].astype(out.dtype)
    if dtype is not None:
        out = out.astype(dtype)
    return out


def batch_norm(x: jnp.ndarray, params: dict, eps: float = 1e-5) -> jnp.ndarray:
    """Inference batch norm with running statistics (torch nn.BatchNorm2d eval).

    Computed in f32 regardless of x dtype, result cast back.
    """
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(params['running_var'].astype(jnp.float32) + eps)
    scale = params['weight'].astype(jnp.float32) * inv
    shift = params['bias'].astype(jnp.float32) - params['running_mean'].astype(jnp.float32) * scale
    return (x32 * scale + shift).astype(dt)


def batch_norm_train(
    x: jnp.ndarray, params: dict, eps: float = 1e-5, axis_name: Optional[str] = None,
):
    """Training batch norm: normalizes with batch statistics computed over
    (N, H, W); when `axis_name` is given the statistics are additionally
    all-reduced across that mesh axis (TPU-native SyncBN — the reference's
    CUDA syncbn kernels, fbrs csrc/cuda/bn_cuda.cu, reduce to a pmean here).

    Returns (out, batch_mean, batch_var) so the caller can maintain running
    statistics functionally.
    """
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(0, 1, 2))
    mean_sq = jnp.mean(x32 * x32, axis=(0, 1, 2))
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
        mean_sq = jax.lax.pmean(mean_sq, axis_name)
    var = mean_sq - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    out = (x32 - mean) * inv * params['weight'].astype(jnp.float32) + params['bias'].astype(jnp.float32)
    return out.astype(x.dtype), mean, var


def linear(x: jnp.ndarray, params: dict, dtype=None) -> jnp.ndarray:
    """x: [..., in]; params['weight']: [in, out]."""
    w = params['weight']
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    out = jnp.matmul(x, w, preferred_element_type=jnp.float32,
                     precision=_PRECISION)
    if 'bias' in params and params['bias'] is not None:
        out = out + params['bias'].astype(out.dtype)
    return out


def max_pool(x: jnp.ndarray, window: int = 3, stride: int = 2, padding: int = 1) -> jnp.ndarray:
    """Max pooling over H, W of an NHWC array (torch nn.MaxPool2d semantics).

    The init value must be the literal -inf: XLA only attaches a reverse-mode
    gradient rule to reduce_window-max when it pattern-matches a max-pool.
    """
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def avg_pool(x: jnp.ndarray, window: int, stride: Optional[int] = None) -> jnp.ndarray:
    """Average pooling (used for torch F.interpolate(mode='area') with integer
    downscale factors, and CBAM global pooling when window == H)."""
    if stride is None:
        stride = window
    s = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding='VALID',
    )
    return (s / (window * window)).astype(x.dtype)


def _upsample_axis_int(x32: jnp.ndarray, r: int, axis: int) -> jnp.ndarray:
    """Exact integer-factor bilinear upsample along one axis via shifted adds.

    For out = r*in with align_corners=False the source coordinate of output
    o = r*i + j is i + (j+0.5)/r - 0.5: every output phase j is a FIXED convex
    combination of x[i] and one clamped neighbor. Two edge-replicated shifts
    plus elementwise blends replace the gather-based formulation — pure VPU
    work that XLA fuses, no gathers on the TPU hot path (decoder 2x/4x
    upsamples, reference model/modules.py:178-191 F.interpolate)."""
    n = x32.shape[axis]

    def take1(i):
        return jax.lax.slice_in_dim(x32, i, i + 1, axis=axis)

    x_m1 = jnp.concatenate(
        [take1(0), jax.lax.slice_in_dim(x32, 0, n - 1, axis=axis)], axis=axis)
    x_p1 = jnp.concatenate(
        [jax.lax.slice_in_dim(x32, 1, n, axis=axis), take1(n - 1)], axis=axis)
    phases = []
    for j in range(r):
        coord = (j + 0.5) / r - 0.5
        if coord < 0:
            f = coord + 1.0                      # lo = i-1, hi = i
            phases.append(x_m1 * (1.0 - f) + x32 * f)
        else:
            f = coord                            # lo = i, hi = i+1
            phases.append(x32 * (1.0 - f) + x_p1 * f)
    stacked = jnp.stack(phases, axis=axis + 1 if axis >= 0
                        else x32.ndim + axis + 1)
    new_shape = list(x32.shape)
    new_shape[axis] = n * r
    return stacked.reshape(new_shape)


def resize_bilinear(x: jnp.ndarray, out_hw: Tuple[int, int],
                    align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize matching torch F.interpolate(mode='bilinear') for both
    align_corners conventions, no antialiasing (jax.image.resize antialiases
    on downscale, so we hand-roll).

    x: [..., H, W, C].
    """
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    dt = x.dtype
    x32 = x.astype(jnp.float32)

    if not align_corners and oh % h == 0 and ow % w == 0 \
            and (oh > h or ow > w):
        if oh > h:
            x32 = _upsample_axis_int(x32, oh // h, x32.ndim - 3)
        if ow > w:
            x32 = _upsample_axis_int(x32, ow // w, x32.ndim - 2)
        return x32.astype(dt)

    def axis_weights(in_size, out_size):
        if align_corners:
            scale = (in_size - 1) / max(out_size - 1, 1)
            coord = jnp.arange(out_size, dtype=jnp.float32) * scale
        else:
            scale = in_size / out_size
            coord = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
        coord = jnp.clip(coord, 0.0, in_size - 1)
        lo = jnp.floor(coord).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, in_size - 1)
        frac = coord - lo.astype(jnp.float32)
        return lo, hi, frac

    hlo, hhi, hf = axis_weights(h, oh)
    wlo, whi, wf = axis_weights(w, ow)

    top = jnp.take(x32, hlo, axis=-3)
    bot = jnp.take(x32, hhi, axis=-3)
    rows = top + (bot - top) * hf.reshape((oh, 1, 1))
    left = jnp.take(rows, wlo, axis=-2)
    right = jnp.take(rows, whi, axis=-2)
    out = left + (right - left) * wf.reshape((ow, 1))
    return out.astype(dt)


def resize_nearest(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Nearest resize matching torch F.interpolate(mode='nearest'):
    src = floor(dst * in/out). x: [..., H, W, C]."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    hi = jnp.floor(jnp.arange(oh) * (h / oh)).astype(jnp.int32)
    wi = jnp.floor(jnp.arange(ow) * (w / ow)).astype(jnp.int32)
    return jnp.take(jnp.take(x, hi, axis=-3), wi, axis=-2)


def interpolate_area_down(x: jnp.ndarray, ratio: float) -> jnp.ndarray:
    """torch F.interpolate(mode='area') for integer downscale factors
    (the decoder uses ratios 1/2 and 1/4 — exact average pooling)."""
    factor = int(round(1.0 / ratio))
    assert abs(1.0 / ratio - factor) < 1e-6, 'area resize only supports integer factors'
    lead = x.shape[:-3]
    h, w, c = x.shape[-3:]
    xf = x.reshape((-1, h, w, c))
    out = avg_pool(xf, factor)
    return out.reshape(lead + out.shape[1:])


def relu(x):
    return jnp.maximum(x, 0)


def sigmoid(x):
    return jax.nn.sigmoid(x)
