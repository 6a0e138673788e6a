"""3-D max pooling via XLA reduce_window.

The reference downsamples both features and the raw input image with
`nn.MaxPool3d(kernel_size=2, stride=2)` between encoder levels
(reference SE_UNet.py:131-133, 188-189, 197-198).
"""

import jax.numpy as jnp
from jax import lax


def max_pool3d(x: jnp.ndarray, window: int = 2, stride: int | None = None,
               batch_minor: bool = False) -> jnp.ndarray:
    """Max pool an NDHWC tensor over D,H,W. Defaults to 2^3/stride 2.
    `batch_minor`: the tensor is (D,H,W,N,C)."""
    if stride is None:
        stride = window
    # NOTE: the init value must be the literal -inf (not a materialized
    # array) for JAX to recognize the max monoid and attach the
    # select-based VJP to the reduce_window primitive.
    init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    w = ((window,) * 3 + (1, 1)) if batch_minor else ((1,) + (window,) * 3 + (1,))
    s = ((stride,) * 3 + (1, 1)) if batch_minor else ((1,) + (stride,) * 3 + (1,))
    return lax.reduce_window(
        x,
        init,
        lax.max,
        window_dimensions=w,
        window_strides=s,
        padding="VALID",
    )
