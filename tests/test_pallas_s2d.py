"""Parity of the fused Pallas phased-conv+stats kernel against the
XLA composition it replaces (interpret mode on CPU — the same kernel
code path the TPU compiles)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from se_unet_airseg_tpu.ops.s2d import (
    conv3_s2d_phased,
    instance_norm_from_stats,
    instance_norm_s2d,
    phased_conv_weights,
)
from se_unet_airseg_tpu.ops.pallas_s2d import phased_conv_stats


def _mk(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape, np.float32)
    )


@pytest.mark.parametrize("n,ci,co", [(8, 2, 4), (16, 4, 4)])
def test_phased_conv_stats_matches_xla(n, ci, co):
    x = _mk((2, n, n, n, 8 * ci))
    w = _mk((3, 3, 3, ci, co), 1) * 0.2
    b = _mk((co,), 2) * 0.1

    ref = conv3_s2d_phased(x, w, b)
    w_all, b_all = phased_conv_weights(w, b)
    y, s1, s2 = phased_conv_stats(
        x, w_all.reshape(8, 8 * ci, 8 * co), b_all
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    reff = np.asarray(ref, np.float64)
    np.testing.assert_allclose(
        np.asarray(s1), reff.sum((1, 2, 3)), rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(s2), (reff ** 2).sum((1, 2, 3)), rtol=1e-4, atol=1e-3
    )


def test_phased_conv_stats_plain_concat():
    n, co = 8, 4
    xa, xb = _mk((1, n, n, n, 16), 3), _mk((1, n, n, n, 8), 4)
    w = _mk((3, 3, 3, 3, co), 5) * 0.2
    b = _mk((co,), 6) * 0.1
    x = jnp.concatenate([xa, xb], axis=-1)
    splits = (2, 1)

    ref = conv3_s2d_phased(x, w, b, in_splits=splits)
    w_all, b_all = phased_conv_weights(w, b, in_splits=splits)
    y, _, _ = phased_conv_stats(x, w_all.reshape(8, 24, 8 * co), b_all)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_instance_norm_from_stats_matches_direct():
    y = _mk((2, 8, 8, 8, 32), 7)
    yf = np.asarray(y, np.float32)
    s1 = jnp.asarray(yf.sum((1, 2, 3)))
    s2 = jnp.asarray((yf ** 2).sum((1, 2, 3)))
    out = instance_norm_from_stats(y, s1, s2)
    ref = instance_norm_s2d(y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_phased_conv_stats_grads_match_composition():
    n, ci, co = 8, 2, 2
    x = _mk((1, n, n, n, 8 * ci), 8)
    w = _mk((3, 3, 3, ci, co), 9) * 0.2
    b = _mk((co,), 10) * 0.1
    w_all, b_all = phased_conv_weights(w, b)
    w8 = w_all.reshape(8, 8 * ci, 8 * co)

    def loss_pallas(x, w8, b_all):
        y, s1, s2 = phased_conv_stats(x, w8, b_all)
        return jnp.sum(y * y) + jnp.sum(s1) * 0.1 + jnp.sum(s2) * 0.01

    def loss_ref(x, w, b):
        y = conv3_s2d_phased(x, w, b)
        yf = y.astype(jnp.float32)
        s1 = jnp.sum(yf, axis=(1, 2, 3))
        s2 = jnp.sum(yf ** 2, axis=(1, 2, 3))
        return jnp.sum(y * y) + jnp.sum(s1) * 0.1 + jnp.sum(s2) * 0.01

    gx_p, gw8_p, gb_p = jax.grad(loss_pallas, (0, 1, 2))(x, w8, b_all)
    gx_r = jax.grad(loss_ref, 0)(x, w, b)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-4)
    assert np.isfinite(np.asarray(gw8_p)).all()
    assert np.isfinite(np.asarray(gb_p)).all()


def test_dil2_conv_stats_matches_polyphase():
    from se_unet_airseg_tpu.ops.pallas_s2d import dil2_conv_stats
    from se_unet_airseg_tpu.ops.s2d import from_polyphase, to_polyphase
    from se_unet_airseg_tpu.ops import conv3d

    n, ci, co = 8, 2, 3
    x = _mk((2, n, n, n, 8 * ci), 11)
    w = _mk((3, 3, 3, ci, co), 12) * 0.2
    b = _mk((co,), 13) * 0.1

    ref = from_polyphase(conv3d(to_polyphase(x), w, b, padding=1))
    y, s1, s2 = dil2_conv_stats(x, w, b)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    reff = np.asarray(ref, np.float64)
    np.testing.assert_allclose(np.asarray(s1), reff.sum((1, 2, 3)),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(s2), (reff ** 2).sum((1, 2, 3)),
                               rtol=1e-4, atol=1e-3)

    def loss_pallas(x):
        y, s1, s2 = dil2_conv_stats(x, w, b)
        return jnp.sum(y * y) + 0.1 * jnp.sum(s1) + 0.01 * jnp.sum(s2)

    def loss_ref(x):
        y = from_polyphase(conv3d(to_polyphase(x), w, b, padding=1))
        yf = y.astype(jnp.float32)
        return (jnp.sum(y * y) + 0.1 * jnp.sum(yf.sum((1, 2, 3)))
                + 0.01 * jnp.sum((yf ** 2).sum((1, 2, 3))))

    gp = jax.grad(loss_pallas)(x)
    gr = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                               rtol=1e-4, atol=1e-4)


def test_apply_fast_pallas_matches_xla_path():
    """The full model forward with use_pallas=True (interpret-mode
    kernels) must match the tested XLA fast path."""
    from se_unet_airseg_tpu.models.se_unet import (
        SEUNetConfig, apply_fast, init_params,
    )

    params = init_params(jax.random.key(0), SEUNetConfig())
    x = _mk((1, 16, 16, 16, 2), 20)
    cfg_x = SEUNetConfig(use_pallas=False)
    cfg_p = SEUNetConfig(use_pallas=True)
    en_x, de_x = apply_fast(params, x, cfg=cfg_x)
    en_p, de_p = apply_fast(params, x, cfg=cfg_p)
    np.testing.assert_allclose(np.asarray(en_p), np.asarray(en_x),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(de_p), np.asarray(de_x),
                               rtol=1e-3, atol=1e-4)
