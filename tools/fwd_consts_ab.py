"""Quantify the in-trace-constants cost: apply_fast forward at 128^3
with fast_params=None (transforms + numpy lift constants inside the
trace, as the train step does) vs precomputed device-resident
fast_params (as inference does).

Usage: python tools/fwd_consts_ab.py [B]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from se_unet_airseg_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from se_unet_airseg_tpu.models import SEUNetConfig, init_params
    from se_unet_airseg_tpu.models.se_unet import (
        apply_fast,
        prepare_fast_params,
    )

    bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    cfg = SEUNetConfig(compute_dtype=jnp.bfloat16)
    params = init_params(jax.random.key(0), cfg)
    x = jnp.asarray(
        np.random.default_rng(0).random((bsz, 128, 128, 128, 2), np.float32)
    )
    fp = prepare_fast_params(params, cfg, n=64)

    variants = {
        "fp=None ": jax.jit(
            lambda p, v: apply_fast(p, v, cfg=cfg, train=False)[1]
        ),
        "fp=given": jax.jit(
            lambda p, f, v: apply_fast(
                p, v, cfg=cfg, train=False, fast_params=f
            )[1]
        ),
    }
    for name, fn in variants.items():
        args = (params, x) if "None" in name else (params, fp, x)
        t0 = time.perf_counter()
        o = fn(*args)
        float(jnp.sum(o.astype(jnp.float32)))
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f} s",
              flush=True)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            o = fn(*args)
            float(jnp.sum(o.astype(jnp.float32)))
            times.append(time.perf_counter() - t0)
        times.sort()
        print(f"{name}: p50 {times[2]*1e3:.0f} ms  min {times[0]*1e3:.0f} ms",
              flush=True)


if __name__ == "__main__":
    main()
