"""Reshape-form max pool (layers.py) + exact jaxpr FLOP counter
(utils/flops.py) — the surfaces behind probe25's honest-MFU readout."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instance_nerf_tpu.models.layers import max_pool_3d
from instance_nerf_tpu.utils.flops import count_flops


@pytest.mark.parametrize("shape", [(2, 8, 8, 8, 3), (1, 7, 9, 5, 4),
                                   (1, 10, 6, 13, 2)])
@pytest.mark.parametrize("window", [1, 2, 3])
def test_reshape_pool_matches_reduce_window(shape, window):
    x = jnp.asarray(np.random.default_rng(0).normal(size=shape), jnp.float32)
    a = max_pool_3d(x, window=window, stride=2, impl="reshape")
    b = max_pool_3d(x, window=window, stride=2, impl="reduce_window")
    assert a.shape == b.shape
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("window", [2, 3])
def test_reshape_pool_gradient_matches(window):
    # tie-free random input: both backward forms route grad to the argmax
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, 8, 6, 10, 3)), jnp.float32)

    def loss(impl):
        return lambda y: jnp.sum(
            max_pool_3d(y, window=window, stride=2, impl=impl) ** 2)

    ga = jax.grad(loss("reshape"))(x)
    gb = jax.grad(loss("reduce_window"))(x)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-5)


def test_reshape_pool_bf16():
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(1, 6, 6, 6, 2)), jnp.bfloat16)
    a = max_pool_3d(x, window=3, stride=2, impl="reshape")
    b = max_pool_3d(x, window=3, stride=2, impl="reduce_window")
    np.testing.assert_array_equal(
        np.asarray(a, np.float32), np.asarray(b, np.float32))


def test_count_flops_dot_and_conv():
    a = jnp.zeros((64, 128))
    b = jnp.zeros((128, 32))
    assert count_flops(lambda x, y: x @ y, a, b) == 2 * 64 * 128 * 32

    x = jnp.zeros((2, 16, 16, 8))
    k = jnp.zeros((3, 3, 8, 4))

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    assert count_flops(conv, x, k) == 2 * 2 * 16 * 16 * 4 * 8 * 9


def test_count_flops_scan_and_grad():
    x = jnp.zeros((2, 16, 16, 8))
    k = jnp.zeros((3, 3, 8, 4))

    def conv(kk):
        return jax.lax.conv_general_dilated(
            x, kk, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    one = count_flops(lambda kk: jnp.sum(conv(kk)), k)

    def scanned(kk):
        def body(c, _):
            return c + jnp.sum(conv(kk)), None
        c, _ = jax.lax.scan(body, 0.0, None, length=5)
        return c

    assert count_flops(scanned, k) == 5 * one
    # grad wrt kernel only: fwd conv + grad-weight conv = 2x (no
    # grad-input conv since x is not differentiated)
    assert count_flops(jax.grad(lambda kk: jnp.sum(conv(kk) ** 2)), k) == 2 * one
    # jitted callables recurse through the pjit eqn
    assert count_flops(jax.jit(scanned), k) == 5 * one


def test_count_flops_grouped_conv():
    x = jnp.zeros((1, 8, 8, 16))
    k = jnp.zeros((3, 3, 4, 16))  # feature_group_count=4

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", feature_group_count=4,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    assert count_flops(conv, x, k) == 2 * 1 * 8 * 8 * 16 * 4 * 9
