"""se_unet_airseg_tpu — TPU-native airway-segmentation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Beryl2000/SE-UNet-AirSeg ("Progressive Curriculum Learning with
Scale-Enhanced U-Net for Continuous Airway Segmentation",
arXiv 2410.18456). The compute path is pure JAX (jit / pjit /
shard_map over TPU meshes, Pallas kernels for hot ops); host-side
post-processing (connected components, skeletonization, tree parsing)
is C++ with ctypes bindings and NumPy/SciPy fallbacks.

Layout convention: all device tensors are channels-last NDHWC
(batch, depth, height, width, channel) — the TPU-native layout —
whereas the PyTorch reference is NCDHW. Weight-import utilities
transpose accordingly.
"""

__version__ = "0.1.0"
