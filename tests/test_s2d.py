"""Algebraic-exactness tests for the space-to-depth fast-path rewrites."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from se_unet_airseg_tpu.ops import conv3d, instance_norm, max_pool3d, upsample_trilinear
from se_unet_airseg_tpu.ops.s2d import (
    bias_to_s2d,
    conv3_weight_to_s2d,
    depth_to_space,
    from_polyphase,
    grouped_pointwise,
    instance_norm_s2d,
    max_pool_s2d,
    se_gate_s2d,
    space_to_depth,
    to_polyphase,
    upsample_to_s2d,
)


def _rand(*shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape).astype(np.float32)
    )


def test_s2d_roundtrip():
    x = _rand(2, 8, 8, 8, 3)
    np.testing.assert_array_equal(np.asarray(depth_to_space(space_to_depth(x))), np.asarray(x))


def test_block_conv_matches_plain_conv():
    x = _rand(1, 12, 12, 12, 4, seed=1)
    w = _rand(3, 3, 3, 4, 6, seed=2) * 0.2
    b = _rand(6, seed=3) * 0.1
    want = conv3d(x, w, b, padding=1)
    got = depth_to_space(
        conv3d(space_to_depth(x), conv3_weight_to_s2d(w), bias_to_s2d(b), padding=1)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_polyphase_matches_dilated_conv():
    x = _rand(2, 12, 12, 12, 4, seed=4)
    w = _rand(3, 3, 3, 4, 6, seed=5) * 0.2
    b = _rand(6, seed=6) * 0.1
    want = conv3d(x, w, b, padding=2, dilation=2)
    got = depth_to_space(
        from_polyphase(conv3d(to_polyphase(space_to_depth(x)), w, b, padding=1))
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_phased_conv_matches_plain_conv():
    from se_unet_airseg_tpu.ops.s2d import conv3_s2d_phased

    x = _rand(1, 12, 12, 12, 4, seed=20)
    w = _rand(3, 3, 3, 4, 6, seed=21) * 0.2
    b = _rand(6, seed=22) * 0.1
    want = conv3d(x, w, b, padding=1)
    got = depth_to_space(conv3_s2d_phased(space_to_depth(x), w, b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_grouped_pointwise_matches_1x1_conv():
    x = _rand(1, 8, 8, 8, 5, seed=7)
    w = _rand(1, 1, 1, 5, 3, seed=8)
    want = conv3d(x, w)
    got = depth_to_space(grouped_pointwise(space_to_depth(x), w[0, 0, 0]))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_instance_norm_s2d_matches():
    x = _rand(2, 8, 8, 8, 3, seed=9)
    want = instance_norm(x)
    got = depth_to_space(instance_norm_s2d(space_to_depth(x)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_se_gate_s2d_matches():
    x = _rand(1, 8, 8, 8, 6, seed=10)
    w_se = _rand(1, 1, 1, 6, 1, seed=11)
    gate = jax.nn.sigmoid(conv3d(x, w_se))
    want = x * gate
    got = depth_to_space(se_gate_s2d(space_to_depth(x), w_se[0, 0, 0]))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_max_pool_s2d_matches():
    x = _rand(2, 8, 8, 8, 3, seed=12)
    want = max_pool3d(x)
    got = max_pool_s2d(space_to_depth(x))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_max_pool_s2d_down_matches_composition():
    from se_unet_airseg_tpu.ops.s2d import (
        max_pool_s2d_down,
        max_pool_s2d_down_bm,
        space_to_depth_bm,
    )

    x = _rand(2, 16, 16, 16, 3, seed=14)
    xs = space_to_depth(x)
    want = space_to_depth(max_pool_s2d(xs))
    got = max_pool_s2d_down(xs)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # bm: same values in (D, H, W, B, C) order
    xs_bm = space_to_depth_bm(jnp.transpose(x, (1, 2, 3, 0, 4)))
    got_bm = max_pool_s2d_down_bm(xs_bm)
    np.testing.assert_array_equal(
        np.asarray(jnp.transpose(got_bm, (3, 0, 1, 2, 4))), np.asarray(want)
    )


def test_upsample_to_s2d_matches():
    for scale, m in [(2, 8), (4, 4), (8, 2)]:
        x = _rand(1, m, m, m, 2, seed=13 + scale)
        want = space_to_depth(upsample_trilinear(x, scale))
        got = upsample_to_s2d(x, scale)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5,
            err_msg=f"scale {scale}",
        )


def test_instance_norm_s2d_one_pass_precision():
    """The one-pass var = E[x^2] - E[x]^2 formulation must stay
    accurate even when the mean dominates the spread (the cancellation
    regime) — f32 accumulation gives ~7 digits, and mean/std ratios in
    conv activations stay far below the ~1e3 that would break it."""
    import numpy as np
    import jax.numpy as jnp

    from se_unet_airseg_tpu.ops.s2d import instance_norm_s2d

    rng = np.random.default_rng(0)
    x = (rng.standard_normal((1, 8, 8, 8, 16)) * 0.1 + 50.0).astype(
        np.float32
    )  # mean/std = 500
    y = np.asarray(instance_norm_s2d(jnp.asarray(x)))
    # reference two-pass in f64
    xr = x.reshape(1, 8, 8, 8, 8, 2).astype(np.float64)
    m = xr.mean(axis=(1, 2, 3, 4), keepdims=True)
    v = ((xr - m) ** 2).mean(axis=(1, 2, 3, 4), keepdims=True)
    ref = ((xr - m) / np.sqrt(v + 1e-5)).reshape(x.shape)
    np.testing.assert_allclose(y, ref, rtol=2e-2, atol=2e-2)


def test_max_pool_s2d_custom_vjp_grads():
    """max_pool_s2d's manual backward (one fat 8C-lane concat) equals
    the maximum-tree chain rule on tie-free inputs."""
    from se_unet_airseg_tpu.ops.s2d import _max_pool_s2d_fwd_tree

    x = _rand(2, 8, 8, 8, 24, seed=40)
    g0 = jax.grad(lambda t: jnp.sum(jnp.sin(_max_pool_s2d_fwd_tree(t))))(x)
    g1 = jax.grad(lambda t: jnp.sum(jnp.sin(max_pool_s2d(t))))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-6, atol=1e-7)


def test_max_pool_s2d_bwd_modes_agree():
    """All three POOL_BWD emissions of the pool backward (fat
    broadcast-where, Pallas mask pass, round-4 concat) produce the
    same cotangent, including on deliberate ties."""
    from se_unet_airseg_tpu.ops.s2d import _max_pool_s2d_vjp_bwd

    x = _rand(2, 8, 8, 8, 128, seed=41)
    # quantize to force ties among sub-positions
    x = jnp.round(x * 4) / 4
    g = _rand(2, 8, 8, 8, 16, seed=42)
    got = {}
    try:
        for mode in ("concat", "fat", "pallas"):
            os.environ["POOL_BWD"] = mode
            (got[mode],) = _max_pool_s2d_vjp_bwd((x,), g)
    finally:
        os.environ.pop("POOL_BWD", None)
    for mode in ("fat", "pallas"):
        np.testing.assert_allclose(
            np.asarray(got[mode]), np.asarray(got["concat"]),
            rtol=1e-6, atol=1e-7, err_msg=mode)
