"""Full-model parity of the fused Pallas epilogue path vs the default
fast path, on the real backend (Mosaic-compiled kernels, bf16).

Usage: python tools/parity_epi.py [n]   (default 64)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from se_unet_airseg_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from se_unet_airseg_tpu.models import SEUNetConfig, init_params
    from se_unet_airseg_tpu.models.se_unet import apply_fast, prepare_fast_params

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    cfg = SEUNetConfig(compute_dtype=jnp.bfloat16)
    cfg_epi = SEUNetConfig(compute_dtype=jnp.bfloat16, use_pallas_epi=True)
    params = init_params(jax.random.key(0), cfg)
    x = jnp.asarray(
        np.random.default_rng(0).random((2, n, n, n, 2), np.float32)
    )

    fp = prepare_fast_params(params, cfg)
    fp_epi = prepare_fast_params(params, cfg_epi)

    a = jax.jit(
        lambda p, f, v: apply_fast(p, v, cfg=cfg, train=False, fast_params=f)
    )(params, fp, x)
    b = jax.jit(
        lambda p, f, v: apply_fast(
            p, v, cfg=cfg_epi, train=False, fast_params=f
        )
    )(params, fp_epi, x)
    for i, (ya, yb) in enumerate(zip(a, b)):
        ya = np.asarray(ya, np.float32)
        yb = np.asarray(yb, np.float32)
        d = np.abs(ya - yb)
        den = np.maximum(np.abs(ya), 1e-3)
        print(
            f"head {i}: max_abs={d.max():.3e} mean_abs={d.mean():.3e} "
            f"max_rel={np.max(d / den):.3e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
