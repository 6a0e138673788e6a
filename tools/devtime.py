"""Precise device-time measurement for jitted functions via xplane
traces (wall time over the tunneled axon TPU is dominated by transfer
noise; XLA op durations are not)."""

import glob
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def device_time_ms(fn, iters: int = 5) -> float:
    """Total on-device XLA-op time per call of `fn`, in ms."""
    import jax

    def sync(o):
        leaf = jax.tree.leaves(o)[0]
        return np.asarray(leaf.ravel()[0])

    sync(fn())  # compile + warm
    logdir = tempfile.mkdtemp(prefix="devtime_")
    try:
        with jax.profiler.trace(logdir):
            for _ in range(iters):
                out = fn()
            sync(out)
        return _parse_total_ms(logdir) / iters
    finally:
        shutil.rmtree(logdir, ignore_errors=True)


def _parse_total_ms(logdir: str) -> float:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    xs = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xs.ParseFromString(f.read())
    total_ps = 0
    for plane in xs.planes:
        if "TPU" not in plane.name or "device" not in plane.name.lower():
            continue
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                total_ps += ev.duration_ps
    return total_ps / 1e9
