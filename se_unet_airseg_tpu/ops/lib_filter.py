"""LIB (local-intensity-bias) prior-weight map on device.

The reference computes a local density of the airway label with a
7x7x7 ones convolution / 343, replaces zeros with 1, takes -log10, and
masks by the label (reference lib_weight.py:12-17, 36-53). The host
version uses scipy.ndimage.convolve; here it is an XLA
`reduce_window` sum — a single fused bandwidth-bound pass on TPU.

The stored artifact is float16 (`./data/LIB_weight/<case>.npy`); the
random power `w ** (U[0,1)+2)` is applied at *sample* time, not here
(reference data.py:386).
"""

import jax
import jax.numpy as jnp
from jax import lax


@jax.jit
def lib_weight_map(label: jnp.ndarray) -> jnp.ndarray:
    """Per-voxel -log10(local label density) * label for a (D,H,W) mask."""
    x = label.astype(jnp.float32)
    # scipy.ndimage.convolve(mode='mirror') == reflect-about-edge padding.
    xp = jnp.pad(x, 3, mode="reflect")
    dens = lax.reduce_window(
        xp,
        jnp.float32(0),
        lax.add,
        window_dimensions=(7, 7, 7),
        window_strides=(1, 1, 1),
        padding="VALID",
    ) / 343.0
    dens = jnp.where(dens == 0.0, 1.0, dens)
    return (-jnp.log10(dens)) * x
