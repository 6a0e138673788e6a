"""Device ops: the XLA/Pallas building blocks of the compute path."""

from .conv import conv3d
from .norms import instance_norm, leaky_relu
from .pool import max_pool3d
from .resize import upsample_trilinear
from .windowing import hu_dual_window
from .lib_filter import lib_weight_map

__all__ = [
    "conv3d",
    "instance_norm",
    "leaky_relu",
    "max_pool3d",
    "upsample_trilinear",
    "hu_dual_window",
    "lib_weight_map",
]
