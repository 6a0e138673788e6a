"""Import reference PyTorch SE-UNet checkpoints into our param pytree.

The reference trains with `torch.save(model.module.state_dict(), ...)`
per epoch (reference train.py:322-324, 510-512, 625-627) and reloads
with `strict=False`. This module maps that state_dict naming onto our
functional parameter tree so a user can bring trained reference
weights straight onto TPU, and so parity tests can compare forwards.

Name mapping (reference SE_UNet.py:108-153 -> models/se_unet.py):
  <blk>.conv1.{weight,bias}   -> <blk>.conv.{w,b}     (3x3x3)
  <blk>.conv2.{weight,bias}   -> <blk>.side.{w,b}     (1x1x1 side head)
  <blk>.conv_se.weight        -> <blk>.se0.w
  <blk>.conv_se2.weight       -> <blk>.se1.w
  <cat>.conv1.weight          -> <cat>.conv.w
  dc0_0.{weight,bias}         -> head_en.{w,b}
  dc0_1.{weight,bias}         -> head_de.{w,b}

Torch Conv3d weights are (O, I, kD, kH, kW); ours are DHWIO.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

_RENAME = {"dc0_0": "head_en", "dc0_1": "head_de"}
_LEAF = {
    "conv1.weight": ("conv", "w"),
    "conv1.bias": ("conv", "b"),
    "conv2.weight": ("side", "w"),
    "conv2.bias": ("side", "b"),
    "conv_se.weight": ("se0", "w"),
    "conv_se2.weight": ("se1", "w"),
}


def _to_dhwio(w: np.ndarray) -> np.ndarray:
    if w.ndim == 5:
        return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))
    return w


def params_from_state_dict(state_dict: Mapping[str, Any]) -> dict:
    """Convert a reference state_dict (tensors or ndarrays) to params."""
    params: dict = {}
    for key, val in state_dict.items():
        arr = np.asarray(getattr(val, "numpy", lambda: val)()).astype(np.float32)
        block, _, leaf = key.partition(".")
        block = _RENAME.get(block, block)
        if block in ("head_en", "head_de"):
            params.setdefault(block, {})["w" if leaf == "weight" else "b"] = (
                _to_dhwio(arr)
            )
        elif leaf in _LEAF:
            sub, name = _LEAF[leaf]
            params.setdefault(block, {}).setdefault(sub, {})[name] = _to_dhwio(arr)
        # InstanceNorm has no parameters (affine=False); Upsample/pool none.
    return params


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference `.pth` state_dict file into our params."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return params_from_state_dict(sd)
