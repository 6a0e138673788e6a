"""A/B the FULL batch-minor phased block (phased_gated_block_bm: Pallas
conv to the ungathered y_ext + XLA stats + streamed phased_finalize_bm)
against (a) the pure-XLA bm composition and (b) the same block with the
Pallas conv disabled (XLA conv + phased_finalize_bm), at the model's
phased-block shapes. This is the unit the model actually calls, so it
also legality-probes phased_finalize_bm on the real TPU.

Usage: python tools/quickbench_pblock_bm.py [dc6|dc5|ec4|dc4|all] \
           [xla|fin|full|allv]
One Mosaic compile per (shape, variant) — run one at a time when the
relay queue is congested.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES = {
    # name: (B, n, ci_list (s2d lanes), co_orig, n_gates)
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
        _xla_phased_gated_composition_bm,
        phased_gated_block_bm,
    )
    from se_unet_airseg_tpu.ops.s2d import phased_conv_weights, se_gate_weights

    which = sys.argv[1] if len(sys.argv) > 1 else "ec4"
    names = list(SHAPES) if which == "all" else [which]
    variant = sys.argv[2] if len(sys.argv) > 2 else "allv"

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
        # batch-minor inputs (n, n, n, B, lanes)
        xs = tuple(
            jnp.asarray(r.standard_normal((n, n, n, B, c), np.float32),
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

        def run(tag, fn, env=None):
            old = {}
            if env:
                for k, v in env.items():
                    old[k] = os.environ.get(k)
                    os.environ[k] = v
            try:
                jf = jax.jit(fn)
                args = (*xs, w_all, b_all, wgs, oh)
                t0 = time.perf_counter()
                try:
                    o = jf(*args)
                    sync(o)
                except Exception as e:
                    print(f"{name} {tag}: FAILED {type(e).__name__}: "
                          f"{str(e)[:140]}", flush=True)
                    return None
                compile_s = time.perf_counter() - t0
                times = []
                for _ in range(7):
                    t0 = time.perf_counter()
                    o = jf(*args)
                    sync(o)
                    times.append(time.perf_counter() - t0)
                times.sort()
                print(f"{name} {tag:4s}: p50 {times[3]*1e3:7.2f} min "
                      f"{times[0]*1e3:7.2f} ms (compile {compile_s:.1f} s)",
                      flush=True)
                return np.asarray(o, np.float32)
            finally:
                for k, v in old.items():
                    if v is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = v

        nk = len(cis)
        outs = {}
        if variant in ("xla", "allv"):
            outs["xla"] = run(
                "xla",
                lambda *a: _xla_phased_gated_composition_bm(
                    a[:nk], *a[nk:]))
        if variant in ("fin", "allv"):
            # XLA conv + Pallas finalize (PALLAS_PCONV_BM off)
            outs["fin"] = run(
                "fin",
                lambda *a: phased_gated_block_bm(a[:nk], *a[nk:]),
                env={"PALLAS_PCONV_BM": "0", "PALLAS_PFIN_BM": "1"})
        if variant in ("full", "allv"):
            outs["full"] = run(
                "full",
                lambda *a: phased_gated_block_bm(a[:nk], *a[nk:]),
                env={"PALLAS_PCONV_BM": "1", "PALLAS_PFIN_BM": "1"})
        ref = outs.get("xla")
        if ref is not None:
            for tag in ("fin", "full"):
                if outs.get(tag) is not None:
                    print(f"{name} max|xla-{tag}| = "
                          f"{np.abs(ref - outs[tag]).max():.3e}", flush=True)


if __name__ == "__main__":
    main()
