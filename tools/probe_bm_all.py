"""One-process Mosaic legality probe for ALL batch-minor kernels that
have never compiled on the real TPU, at the cheapest production shapes:

  1. dil2_gated_block_bm  @ ec5 (n=32, 256->256 lanes)
     -> compiles _dil2_kernel_bm + the bm gathered finalize
  2. phased_gated_block_bm @ ec4 (n=32, 256->512 lanes, 2 gates)
     -> compiles _pconv_kernel_bm + _pfin_kernel_bm
     (on failure retries with PALLAS_PCONV_BM=0 to isolate the conv)
  3. gated_norm_block_bm  @ n=64, 128 lanes (the most-used epilogue)

Writes /tmp/bm_knobs.env with the env knobs that make the whole-model
FASTPATH_BM=1 compile avoid any kernel that failed, so the queued
model stage can `source` it and still measure the best legal config.
Always exits 0 — failures are information.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KNOBS_PATH = "/tmp/bm_knobs.env"


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from se_unet_airseg_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from se_unet_airseg_tpu.ops.pallas_s2d import (
        dil2_gated_block_bm,
        gated_norm_block_bm,
        phased_gated_block_bm,
    )
    from se_unet_airseg_tpu.ops.s2d import (
        dil2_dense_weight,
        phased_conv_weights,
        se_gate_weights,
    )

    r = np.random.default_rng(0)

    def gates_for(co, n_gates):
        wgs, oh = [], None
        for _ in range(n_gates):
            wse = jnp.asarray(r.standard_normal((co, 1), np.float32) * 0.1)
            g_, oh_ = se_gate_weights(wse, jnp.bfloat16)
            wgs.append(jnp.pad(g_, ((0, 0), (0, 128 - g_.shape[1]))))
            oh = jnp.pad(oh_, ((0, 128 - oh_.shape[0]), (0, 0)))
        return jnp.stack(wgs), oh

    def attempt(tag, fn, args, env=None):
        old = {}
        for k, v in (env or {}).items():
            old[k] = os.environ.get(k)
            os.environ[k] = v
        try:
            t0 = time.time()
            out = jax.jit(fn)(*args)
            s = float(jnp.sum(out.astype(jnp.float32)))
            print(f"{tag}: OK compile+first {time.time()-t0:.1f} s "
                  f"sum={s:.3f}", flush=True)
            ts = []
            for _ in range(5):
                t0 = time.time()
                float(jnp.sum(jax.jit(fn)(*args).astype(jnp.float32)))
                ts.append(time.time() - t0)
            ts.sort()
            print(f"{tag}: p50 {ts[2]*1e3:.1f} ms", flush=True)
            return True
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:400]}",
                  flush=True)
            return False
        finally:
            for k, v in old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    knobs = {}

    # ---- 1. fused dil-2 block @ ec5 ----
    B, n, ci, co = 8, 32, 32, 32
    w = jnp.asarray(r.standard_normal((3, 3, 3, ci, co), np.float32) * 0.1,
                    jnp.bfloat16)
    wd = dil2_dense_weight(w, jnp.bfloat16)
    bg = jnp.tile(jnp.asarray(r.standard_normal(co, np.float32) * 0.1,
                              jnp.bfloat16), 8)
    x = jnp.asarray(r.standard_normal((n, n, n, B, 8 * ci), np.float32),
                    jnp.bfloat16)
    wgs, oh = gates_for(co, 2)
    if not attempt("dil2_ec5", dil2_gated_block_bm, (x, wd, bg, wgs, oh)):
        knobs["PALLAS_DIL2BM"] = "0"

    # ---- 2. full phased block @ ec4 ----
    B, n, ci_orig, co = 8, 32, 32, 64
    w_all, b_all = phased_conv_weights(
        jnp.asarray(r.standard_normal((3, 3, 3, ci_orig, co),
                                      np.float32) * 0.1),
        jnp.asarray(r.standard_normal(co, np.float32) * 0.1),
        None,
    )
    w_all = w_all.astype(jnp.bfloat16)
    b_all = b_all.astype(jnp.bfloat16)
    xs = (jnp.asarray(r.standard_normal((n, n, n, B, 8 * ci_orig),
                                        np.float32), jnp.bfloat16),)
    wgs, oh = gates_for(co, 2)
    ok_full = attempt("pblock_ec4_full",
                      lambda a, w, b, g, o: phased_gated_block_bm(
                          (a,), w, b, g, o),
                      (xs[0], w_all, b_all, wgs, oh),
                      env={"PALLAS_PCONV_BM": "1", "PALLAS_PFIN_BM": "1"})
    if not ok_full:
        # isolate: XLA conv + Pallas finalize
        ok_fin = attempt("pblock_ec4_fin",
                         lambda a, w, b, g, o: phased_gated_block_bm(
                             (a,), w, b, g, o),
                         (xs[0], w_all, b_all, wgs, oh),
                         env={"PALLAS_PCONV_BM": "0", "PALLAS_PFIN_BM": "1"})
        knobs["PALLAS_PCONV_BM"] = "0"
        if not ok_fin:
            knobs["PALLAS_PFIN_BM"] = "0"

    # ---- 3. gathered gated epilogue @ n=64, 128 lanes ----
    n, co, b = 64, 16, 8
    y = jnp.asarray(r.standard_normal((n, n, n, b, 8 * co)).astype(np.float32),
                    jnp.bfloat16)
    wgs, oh = gates_for(co, 1)
    if not attempt("gathered_n64", gated_norm_block_bm, (y, wgs, oh)):
        # the bm epilogue family is the load-bearing kernel; without it
        # run bm with the XLA epilogue composition
        knobs["PALLAS_EPI"] = "0"

    with open(KNOBS_PATH, "w") as f:
        for k, v in knobs.items():
            f.write(f"export {k}={v}\n")
    print(f"knobs -> {KNOBS_PATH}: {knobs or 'all kernels legal'}",
          flush=True)


if __name__ == "__main__":
    main()
