"""Unit parity tests: our XLA ops vs PyTorch-CPU reference semantics.

These lock the bit-faithful behaviors SURVEY.md §7 flags as hard part 2
(align_corners upsampling, InstanceNorm defaults, LeakyReLU slope,
dilated conv padding) against torch itself, independent of the
reference repo.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from se_unet_airseg_tpu.ops import (
    conv3d,
    hu_dual_window,
    instance_norm,
    leaky_relu,
    lib_weight_map,
    max_pool3d,
    upsample_trilinear,
)


def _rand(*shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def _to_ndhwc(x_ncdhw):
    return np.transpose(x_ncdhw, (0, 2, 3, 4, 1))


def _to_ncdhw(x_ndhwc):
    return np.transpose(x_ndhwc, (0, 4, 1, 2, 3))


@pytest.mark.parametrize("scale", [2, 4, 8])
def test_upsample_matches_torch_align_corners(scale):
    x = _rand(2, 3, 4, 5, 6)  # NCDHW
    want = F.interpolate(
        torch.from_numpy(x), scale_factor=scale, mode="trilinear", align_corners=True
    ).numpy()
    got = _to_ncdhw(np.asarray(upsample_trilinear(jnp.asarray(_to_ndhwc(x)), scale)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_instance_norm_matches_torch_defaults():
    x = _rand(2, 5, 6, 7, 8, seed=1)
    want = F.instance_norm(torch.from_numpy(x)).numpy()
    got = _to_ncdhw(np.asarray(instance_norm(jnp.asarray(_to_ndhwc(x)))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_leaky_relu_slope():
    x = jnp.asarray([-2.0, -0.5, 0.0, 3.0])
    np.testing.assert_allclose(
        np.asarray(leaky_relu(x)), [-0.02, -0.005, 0.0, 3.0], rtol=1e-6
    )


def test_max_pool_matches_torch():
    x = _rand(1, 3, 8, 8, 8, seed=2)
    want = F.max_pool3d(torch.from_numpy(x), 2, 2).numpy()
    got = _to_ncdhw(np.asarray(max_pool3d(jnp.asarray(_to_ndhwc(x)))))
    np.testing.assert_allclose(got, want)


@pytest.mark.parametrize("dilation", [1, 2])
def test_conv3d_matches_torch(dilation):
    x = _rand(1, 4, 10, 10, 10, seed=3)
    w = _rand(6, 4, 3, 3, 3, seed=4) * 0.1
    b = _rand(6, seed=5) * 0.1
    want = F.conv3d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        padding=dilation, dilation=dilation,
    ).numpy()
    w_dhwio = np.transpose(w, (2, 3, 4, 1, 0))
    got = _to_ncdhw(
        np.asarray(
            conv3d(
                jnp.asarray(_to_ndhwc(x)), jnp.asarray(w_dhwio), jnp.asarray(b),
                padding=dilation, dilation=dilation,
            )
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_conv1x1_matches_torch():
    x = _rand(2, 8, 6, 6, 6, seed=6)
    w = _rand(3, 8, 1, 1, 1, seed=7)
    want = F.conv3d(torch.from_numpy(x), torch.from_numpy(w)).numpy()
    got = _to_ncdhw(
        np.asarray(
            conv3d(jnp.asarray(_to_ndhwc(x)), jnp.asarray(np.transpose(w, (2, 3, 4, 1, 0))))
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_hu_dual_window_formulas():
    # reference data.py:286-299 — two window transforms of the same CT.
    hu = jnp.asarray([-2000.0, -1024.0, -1000.0, 0.0, 500.0, 1024.0, 3000.0])
    out = np.asarray(hu_dual_window(hu))
    np.testing.assert_allclose(
        out[..., 0], [0.0, 0.0, 24 / 2048, 0.5, 1524 / 2048, 1.0, 1.0], rtol=1e-6
    )
    np.testing.assert_allclose(
        out[..., 1], [0.0, 0.0, 0.0, 1000 / 1500, 1.0, 1.0, 1.0], rtol=1e-6
    )


def test_lib_weight_matches_scipy_mirror():
    from scipy import ndimage

    rng = np.random.default_rng(8)
    label = (rng.random((12, 13, 14)) > 0.7).astype(np.float32)
    dens = ndimage.convolve(label, np.ones((7, 7, 7), np.float32), mode="mirror") / 343.0
    dens[dens == 0] = 1
    want = -np.log10(dens) * label
    got = np.asarray(lib_weight_map(jnp.asarray(label)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
