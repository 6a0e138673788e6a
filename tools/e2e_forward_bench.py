"""End-to-end apply_fast timing: Pallas kernels vs XLA composition.

Usage: python tools/e2e_forward_bench.py [pallas|xla] [B] [cube]
One chained-K jit; prints ms/forward and tiles/s.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from se_unet_airseg_tpu.models.se_unet import (
        SEUNetConfig, apply_fast, init_params,
    )

    variant = sys.argv[1] if len(sys.argv) > 1 else "pallas"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cube = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    K = int(os.environ.get("QB_K", "4"))

    cfg = SEUNetConfig(
        compute_dtype=jnp.bfloat16, use_pallas=(variant == "pallas")
    )
    params = init_params(jax.random.key(0), cfg)
    x = jnp.asarray(
        np.random.default_rng(0).random((B, cube, cube, cube, 2), np.float32)
    ).astype(jnp.bfloat16)

    def fwd(x):
        en, de = apply_fast(params, x, cfg=cfg)
        return de

    def loop(x):
        def body(i, c):
            de = fwd(x + c.astype(x.dtype))
            return (de.ravel()[0] * jnp.asarray(1e-30, de.dtype)).astype(
                jnp.float32
            )

        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    print(f"[{variant}] compiling B={B} cube={cube}...", flush=True)
    t0 = time.time()
    g = jax.jit(loop)
    float(g(x))
    print(f"[{variant}] compiled+warm in {time.time()-t0:.0f}s", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(g(x))
        best = min(best, time.perf_counter() - t0)
    ms = best / K * 1e3
    print(f"[{variant}] {ms:8.1f} ms/forward  ({B / (ms / 1e3):.1f} tiles/s)",
          flush=True)


if __name__ == "__main__":
    main()
