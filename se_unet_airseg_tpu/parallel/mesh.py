"""Device mesh and sharding layout for the framework.

The reference's only parallelism is single-process data parallelism
via torch DataParallel over NCCL (reference train.py:197, 396, 577) —
scatter a batch of 128^3 crops across GPUs, gather logits. The
TPU-native design (SURVEY.md §2.10, §5.8) is single-controller SPMD:

  * axis "data"  — batch/crop/tile parallelism. Gradients and the
    global-sum losses reduce over ICI with XLA-inserted psums; nothing
    is hand-scattered.
  * axis "space" — spatial partitioning of the volume depth axis, the
    domain's analog of sequence/context parallelism (SURVEY.md §5.7).
    XLA SPMD inserts conv halo exchanges automatically for convs whose
    inputs are sharded along D, and psums for the InstanceNorm spatial
    reductions.

All losses in the framework are written as *global* sums, so any
sharding of the batch/spatial axes yields the same math — the layout
is purely a performance decision.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshAxes:
    data: str = "data"
    space: str = "space"


AXES = MeshAxes()


def make_mesh(n_data: int | None = None, n_space: int = 1, devices=None) -> Mesh:
    """Build a (data, space) mesh. Defaults to all devices on `data`."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_space
    n = n_data * n_space
    if n > len(devices):
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(n_data, n_space)
    return Mesh(arr, (AXES.data, AXES.space))


def batch_sharding(mesh: Mesh, shard_space: bool = False) -> NamedSharding:
    """Sharding for an NDHWC crop batch: batch over `data`, optionally
    depth over `space`."""
    if shard_space:
        return NamedSharding(mesh, P(AXES.data, AXES.space, None, None, None))
    return NamedSharding(mesh, P(AXES.data, None, None, None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
