"""3-D convolution in TPU-native NDHWC layout.

Wraps `lax.conv_general_dilated` with the dimension numbers the TPU
backend prefers (NDHWC activations, DHWIO weights). The reference's
convs are all 3x3x3 (optionally dilation 2, SAME-style padding
`pad = dilation`) or 1x1x1 (reference SE_UNet.py:15-16, 42, 57-58).

Accumulation uses `preferred_element_type=float32` so bfloat16
activations still accumulate at full precision on the MXU.
"""

import jax.numpy as jnp
from jax import lax

_DIMNUMS = lax.conv_dimension_numbers(
    (1, 1, 1, 1, 1), (1, 1, 1, 1, 1), ("NDHWC", "DHWIO", "NDHWC")
)
# batch-minor: spatial dims major, batch in sublanes, channels in
# lanes — the layout the TPU conv emitter natively tiles ((d,h,w,B,C)
# row-major IS its preferred {4,0,3,2,1} physical layout of NDHWC, so
# no relayout copies are inserted around the conv)
_DIMNUMS_BM = lax.conv_dimension_numbers(
    (1, 1, 1, 1, 1), (1, 1, 1, 1, 1), ("DHWNC", "DHWIO", "DHWNC")
)


def conv3d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    *,
    stride: int = 1,
    padding: int | str = 0,
    dilation: int = 1,
    groups: int = 1,
    batch_minor: bool = False,
) -> jnp.ndarray:
    """Conv over NDHWC `x` with DHWIO `kernel` (`batch_minor`: `x` and
    the result are (D,H,W,N,C) instead).

    `padding` is a symmetric per-axis voxel count (the reference always
    uses `padding = 1 * dilation` for 3^3 kernels and 0 for 1^3).
    """
    if isinstance(padding, int):
        pad = [(padding, padding)] * 3
    else:
        pad = padding
    # Precision.HIGHEST: with bf16 inputs this is the native single-pass
    # MXU bf16xbf16 with f32 internal accumulation (free); with f32
    # inputs it forbids the DEFAULT bf16 down-conversion, giving true
    # fp32 for parity testing. NOTE: preferred_element_type is
    # deliberately NOT set — with bf16 inputs it would make the
    # primitive's output f32 and break the conv transpose in the vjp
    # (jax feeds the f32 cotangent against bf16 residuals).
    y = lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(stride, stride, stride),
        padding=pad,
        rhs_dilation=(dilation, dilation, dilation),
        dimension_numbers=_DIMNUMS_BM if batch_minor else _DIMNUMS,
        feature_group_count=groups,
        precision=lax.Precision.HIGHEST,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y.astype(x.dtype)
