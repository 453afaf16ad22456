"""SyncBN parity: the C++ reference ops (nn/csrc/syncbn_ref.cpp — the
reference's CUDA bn_cuda.cu semantics on CPU) vs the TPU-native layer
(nn.functional.batch_norm_train, whose cross-replica variant is one
lax.pmean) and vs jax autodiff for the backward."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from xmem2_tpu.nn import functional as F
from xmem2_tpu.nn import syncbn_ref as SB

if SB.load_native() is None:
    pytest.skip('no C++ toolchain for the native SyncBN reference',
                allow_module_level=True)

EPS = 1e-5


def case(seed=0, n=3, c=5, h=6, w=7):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, c, h, w)).astype(np.float32)
    weight = rng.standard_normal((c,)).astype(np.float32)
    bias = rng.standard_normal((c,)).astype(np.float32)
    dz = rng.standard_normal((n, c, h, w)).astype(np.float32)
    return x, weight, bias, dz


def test_sum_sqsum_and_forward_match_jax():
    x, weight, bias, _ = case()
    s, ss = SB.sum_sqsum(x)
    count = x.shape[0] * x.shape[2] * x.shape[3]
    mean = s / count
    var = ss / count - mean ** 2

    z = SB.forward(x, weight, bias, mean, var, eps=EPS)

    x_nhwc = jnp.asarray(np.moveaxis(x, 1, -1))
    out, jmean, jvar = F.batch_norm_train(
        x_nhwc, {'weight': jnp.asarray(weight), 'bias': jnp.asarray(bias)},
        eps=EPS)
    np.testing.assert_allclose(mean, np.asarray(jmean), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(var, np.asarray(jvar), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(z, np.moveaxis(np.asarray(out), -1, 1),
                               rtol=1e-4, atol=1e-4)


def test_backward_matches_jax_autodiff():
    x, weight, bias, dz = case(1)
    count = x.shape[0] * x.shape[2] * x.shape[3]
    s, ss = SB.sum_sqsum(x)
    mean = s / count
    var = ss / count - mean ** 2

    sum_dz, sum_dz_xhat = SB.backward_xhat(dz, x, mean, var, eps=EPS)
    dx, dw, db = SB.backward(dz, x, weight, mean, var,
                             sum_dz / count, sum_dz_xhat / count, eps=EPS)

    def f(xn, w, b):
        return F.batch_norm_train(xn, {'weight': w, 'bias': b}, eps=EPS)[0]

    x_nhwc = jnp.asarray(np.moveaxis(x, 1, -1))
    _, vjp = jax.vjp(f, x_nhwc, jnp.asarray(weight), jnp.asarray(bias))
    jdx, jdw, jdb = vjp(jnp.asarray(np.moveaxis(dz, 1, -1)))

    np.testing.assert_allclose(dx, np.moveaxis(np.asarray(jdx), -1, 1),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(dw, np.asarray(jdw), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(db, np.asarray(jdb), rtol=1e-3, atol=1e-3)


def test_cross_replica_pmean_equals_global_batch():
    """The production SyncBN: per-shard stats pmean'd across a mesh axis must
    equal single-device whole-batch statistics (the reference's CUDA kernels
    exist to compute exactly this across GPUs)."""
    if len(jax.devices()) < 4:
        pytest.skip('needs virtual devices')
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    x, weight, bias, _ = case(2, n=8)
    x_nhwc = jnp.asarray(np.moveaxis(x, 1, -1))
    params = {'weight': jnp.asarray(weight), 'bias': jnp.asarray(bias)}

    ref, rmean, rvar = F.batch_norm_train(x_nhwc, params, eps=EPS)

    mesh = Mesh(np.array(jax.devices()[:4]), ('data',))
    fn = shard_map(
        lambda xs: F.batch_norm_train(xs, params, eps=EPS,
                                      axis_name='data')[0],
        mesh=mesh, in_specs=P('data'), out_specs=P('data'))
    out = fn(x_nhwc)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
