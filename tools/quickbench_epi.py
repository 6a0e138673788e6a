"""Compile + time the fused Pallas epilogue (phased_gated_block) vs
the XLA composition at the model's phased-block shapes.

Usage: python tools/quickbench_epi.py [dc6|dc5|ec4|dc4|all]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES = {
    # name: (B, n, ci_list (s2d channels), co_orig, n_gates)
    "dc6": (8, 64, (256,), 16, 1),
    "dc5": (8, 64, (256, 256), 32, 1),
    "dc4": (8, 32, (512,), 32, 2),
    "ec4": (8, 32, (256,), 64, 2),
}


def main():
    import jax
    import jax.numpy as jnp

    from se_unet_airseg_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from se_unet_airseg_tpu.ops.pallas_s2d import (
        _xla_gated_composition,
        phased_gated_block,
    )
    from se_unet_airseg_tpu.ops.s2d import phased_conv_weights, se_gate_weights

    which = sys.argv[1] if len(sys.argv) > 1 else "dc6"
    names = list(SHAPES) if which == "all" else [which]

    def sync(x):
        return float(x.ravel()[0])

    for name in names:
        B, n, cis, co, gates = SHAPES[name]
        r = np.random.default_rng(0)
        ci_orig = sum(cis) // 8
        w_all, b_all = phased_conv_weights(
            jnp.asarray(r.standard_normal((3, 3, 3, ci_orig, co),
                                          np.float32) * 0.1),
            jnp.asarray(r.standard_normal(co, np.float32) * 0.1),
            tuple(c // 8 for c in cis) if len(cis) > 1 else None,
        )
        w_all = w_all.astype(jnp.bfloat16)
        b_all = b_all.astype(jnp.bfloat16)
        xs = tuple(
            jnp.asarray(r.standard_normal((B, n, n, n, c), np.float32),
                        jnp.bfloat16)
            for c in cis
        )
        wgs, oh = [], None
        for g in range(gates):
            wse = jnp.asarray(r.standard_normal((co, 1), np.float32) * 0.1)
            wg, oh_ = se_gate_weights(wse, jnp.bfloat16)
            wgs.append(jnp.pad(wg, ((0, 0), (0, 128 - wg.shape[1]))))
            oh = jnp.pad(oh_, ((0, 128 - oh_.shape[0]), (0, 0)))
        wgs = jnp.stack(wgs)

        for tag, fn in (
            ("xla", jax.jit(lambda *a: _xla_gated_composition(a[:len(cis)],
                                                              *a[len(cis):]))),
            ("epi", jax.jit(lambda *a: phased_gated_block(a[:len(cis)],
                                                          *a[len(cis):]))),
        ):
            args = (*xs, w_all, b_all, wgs, oh)
            t0 = time.perf_counter()
            o = fn(*args)
            sync(o)
            compile_s = time.perf_counter() - t0
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                o = fn(*args)
                sync(o)
                times.append(time.perf_counter() - t0)
            print(f"{name} {tag}: {min(times)*1e3:7.2f} ms "
                  f"(compile {compile_s:.1f} s)", flush=True)


if __name__ == "__main__":
    main()
