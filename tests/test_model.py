"""SE-UNet model tests: shape contract, determinism, DropLayer, and
numerical parity against the reference PyTorch implementation when the
reference checkout is available (used strictly as a test oracle)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from se_unet_airseg_tpu.models import SEUNetConfig, init_params, num_params, se_unet_apply
from se_unet_airseg_tpu.models.torch_import import params_from_state_dict

REFERENCE = "/root/reference"


def test_forward_shapes_and_determinism():
    cfg = SEUNetConfig()
    params = init_params(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (1, 32, 32, 32, 2), jnp.float32)
    en, de = jax.jit(lambda p, x: se_unet_apply(p, x, cfg=cfg))(params, x)
    assert en.shape == (1, 32, 32, 32, 1)
    assert de.shape == (1, 32, 32, 32, 1)
    en2, de2 = jax.jit(lambda p, x: se_unet_apply(p, x, cfg=cfg))(params, x)
    np.testing.assert_array_equal(np.asarray(en), np.asarray(en2))
    assert np.isfinite(np.asarray(en)).all() and np.isfinite(np.asarray(de)).all()


def test_param_count_nontrivial():
    params = init_params(jax.random.key(0))
    n = num_params(params)
    # 28 conv blocks + 2 heads; exact count is locked by the torch-parity
    # test below; here just a sanity band.
    assert 300_000 < n < 3_000_000


def test_droplayer_train_vs_eval():
    cfg = SEUNetConfig()
    params = init_params(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 16, 2), jnp.float32)
    eval_out = se_unet_apply(params, x, cfg=cfg, train=False)
    tr1 = se_unet_apply(params, x, cfg=cfg, train=True, rng=jax.random.key(7))
    tr2 = se_unet_apply(params, x, cfg=cfg, train=True, rng=jax.random.key(8))
    # different dropout keys -> different outputs; eval is deterministic
    assert not np.allclose(np.asarray(tr1[0]), np.asarray(tr2[0]))
    assert np.isfinite(np.asarray(eval_out[0])).all()
    with pytest.raises(ValueError):
        se_unet_apply(params, x, cfg=cfg, train=True)


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference not mounted")
def test_parity_with_reference_pytorch():
    """Same weights, same input -> same logits (eval mode) as the
    reference net (reference SE_UNet.py:99-238), tolerance 2e-3."""
    import sys

    import torch

    sys.path.insert(0, REFERENCE)
    try:
        from SE_UNet import SE_UNet  # oracle only; never shipped
    finally:
        sys.path.remove(REFERENCE)

    torch.manual_seed(0)
    net = SE_UNet(in_channel=2, n_classes=1).eval()
    params = params_from_state_dict(net.state_dict())
    # every torch parameter must have landed somewhere
    n_torch = sum(p.numel() for p in net.parameters())
    assert num_params(params) == n_torch

    x = np.random.default_rng(3).standard_normal((1, 2, 32, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want_en, want_de = net(torch.from_numpy(x))
    got_en, got_de = se_unet_apply(
        params, jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))
    )
    # With Precision.HIGHEST convs the measured drift is ~2e-6 max
    for got, want in ((got_en, want_en), (got_de, want_de)):
        g = np.asarray(got)[..., 0]
        w = want.numpy()[:, 0]
        np.testing.assert_allclose(g, w, atol=1e-4)
        assert np.mean(np.abs(g - w)) < 1e-5
