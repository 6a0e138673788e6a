"""Checkpointing: per-epoch weight snapshots + cross-stage handoff.

The reference saves a bare state_dict every epoch per stage
(`saved_model/stage_*/SE_UNet_<ep>.pth`, reference train.py:322-324,
510-512, 625-627) and resumes across stages with strict=False loads.
We keep the same cadence and naming (`SE_UNet_<ep>.msgpack`), store
the pure param pytree via flax serialization, and additionally accept
reference `.pth` files via the torch importer — so trained reference
checkpoints drop straight onto TPU.

Unlike the reference, `save_state` can also persist optimizer state +
step for true resume (the reference restarts optimizer state on every
resume — SURVEY.md §5.4); stage handoff uses `load_params` only,
matching reference behavior.
"""

from __future__ import annotations

import os

import flax.serialization
import jax
import numpy as np


def save_params(params, model_dir: str, epoch: int) -> str:
    os.makedirs(model_dir, exist_ok=True)
    path = os.path.join(model_dir, f"SE_UNet_{epoch}.msgpack")
    host = jax.tree.map(np.asarray, params)
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(host))
    return path


def load_params(path: str, template=None):
    """Load a checkpoint: .msgpack (ours) or .pth (reference)."""
    if path.endswith(".pth"):
        from ..models.torch_import import load_torch_checkpoint

        return load_torch_checkpoint(path)
    with open(path, "rb") as f:
        data = f.read()
    if template is None:
        return flax.serialization.msgpack_restore(data)
    return flax.serialization.from_bytes(template, data)


def save_state(state, model_dir: str, epoch: int) -> str:
    """Full TrainState (params + optimizer + step) for exact resume."""
    os.makedirs(model_dir, exist_ok=True)
    path = os.path.join(model_dir, f"state_{epoch}.msgpack")
    host = jax.tree.map(np.asarray, state)
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(host))
    return path


def load_state(path: str, template):
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(template, f.read())
