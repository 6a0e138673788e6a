"""Instance normalization and LeakyReLU with PyTorch-default semantics.

Reference blocks use `nn.InstanceNorm3d(C)` with torch defaults —
affine=False, track_running_stats=False, eps=1e-5, biased variance —
followed by `nn.LeakyReLU()` (slope 0.01) (reference SE_UNet.py:17-18,
43-44, 59-60). Statistics are computed per (sample, channel) over the
spatial volume.

Statistics are always accumulated in float32 even for bfloat16
activations: a 128**3 spatial reduction loses too much precision in
bf16 and breaks checkpoint-level parity.
"""

import jax.numpy as jnp
from jax import lax


def instance_norm(x: jnp.ndarray, eps: float = 1e-5,
                  batch_minor: bool = False) -> jnp.ndarray:
    """Per-(N,C) normalization of an NDHWC tensor over D,H,W
    (`batch_minor`: the tensor is (D,H,W,N,C))."""
    dtype = x.dtype
    axes = (0, 1, 2) if batch_minor else (1, 2, 3)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=axes, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    return y.astype(dtype)


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.01) -> jnp.ndarray:
    """LeakyReLU, torch default slope 0.01."""
    return jnp.where(x >= 0, x, x * jnp.asarray(negative_slope, x.dtype))
