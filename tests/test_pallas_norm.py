"""Pallas fused InstanceNorm+LeakyReLU vs the XLA composition
(interpret mode on CPU; the same kernel compiles on TPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from se_unet_airseg_tpu.ops import instance_norm, leaky_relu
from se_unet_airseg_tpu.ops.pallas_norm import (
    instance_norm_leaky_ndhwc,
    instance_norm_leaky_s2d,
)
from se_unet_airseg_tpu.ops.s2d import instance_norm_s2d


def _x(shape, seed=0, scale=3.0, shift=1.0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape).astype(np.float32)
        * scale + shift
    )


def test_forward_matches_xla():
    x = _x((2, 6, 6, 6, 16))
    want = leaky_relu(instance_norm(x))
    got = instance_norm_leaky_ndhwc(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_forward_s2d_grouping():
    x = _x((1, 4, 4, 4, 24), seed=1)  # 8 sub-positions x 3 channels
    want = leaky_relu(instance_norm_s2d(x))
    got = instance_norm_leaky_s2d(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_gradient_matches_xla():
    x = _x((1, 5, 5, 5, 8), seed=2)

    def loss_ref(x):
        return jnp.sum(jnp.sin(leaky_relu(instance_norm(x))))

    def loss_new(x):
        return jnp.sum(jnp.sin(instance_norm_leaky_ndhwc(x)))

    g_ref = jax.grad(loss_ref)(x)
    g_new = jax.grad(loss_new)(x)
    np.testing.assert_allclose(
        np.asarray(g_new), np.asarray(g_ref), rtol=1e-4, atol=1e-6
    )


def test_uneven_chunking():
    # S = 7*9*5 = 315 (prime-ish) exercises the chunk-divisor search
    x = _x((1, 7, 9, 5, 8), seed=3)
    want = leaky_relu(instance_norm(x))
    got = instance_norm_leaky_ndhwc(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)
