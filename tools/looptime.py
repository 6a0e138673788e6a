"""Profiler-free device timing over tunneled TPU hosts.

Wall-clock of a single dispatch is dominated by ~50-200 ms tunnel
latency; jax.profiler sessions can wedge. Instead: run the op K times
CHAINED inside one jit (a fori_loop whose carry feeds a ~0 perturbation
into the next input, preventing hoisting/CSE), for two values of K —
the slope is the pure on-device time per op."""

import time

import numpy as np


def _loop_fn(op, x, k: int):
    import jax
    import jax.numpy as jnp

    def body(i, carry):
        y = op(x + carry.astype(x.dtype))
        # ~0 scalar that still depends on the output
        first = jax.tree.leaves(y)[0]
        return (first.ravel()[0] * jnp.asarray(1e-30, first.dtype)).astype(
            jnp.float32
        )

    return jax.jit(
        lambda x: jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
    )


def op_time_ms(op, x, k1: int = 2, k2: int = 12, reps: int = 3) -> float:
    """Per-op device time in ms: (t(k2) - t(k1)) / (k2 - k1)."""
    import jax

    f1 = _loop_fn(op, x, k1)
    f2 = _loop_fn(op, x, k2)

    def timed(f):
        float(f(x))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(x))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = timed(f1), timed(f2)
    return max((t2 - t1) / (k2 - k1) * 1e3, 0.0)
