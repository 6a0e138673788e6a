"""Microbenchmark of s2d conv formulations at the model's hot shapes.

Each variant computes the SAME math (up to fp reassociation) as the
current ops; the question is which formulation XLA compiles without
layout copies. Run on the real TPU."""

import os
import sys
from functools import partial
from itertools import product

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.looptime import op_time_ms  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from se_unet_airseg_tpu.ops import conv3d
    from se_unet_airseg_tpu.ops.s2d import (
        conv3_s2d_phased,
        from_polyphase,
        to_polyphase,
        _phase_lift_tensor,
    )

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    def mk(shape):
        return jnp.asarray(rng.random(shape, np.float32)).astype(dt)

    # ---------------- phased dense conv variants ----------------
    def phased_current(x, w, b):
        return conv3_s2d_phased(x, w, b)

    def phased_asym(x, w, b):
        """8 separate VALID convs with per-phase asymmetric padding,
        channel-concat."""
        ci, co = w.shape[3], w.shape[4]
        outs = []
        for a, bb, c in product(range(2), repeat=3):
            m = jnp.asarray(_phase_lift_tensor(a, bb, c), w.dtype)
            wq = jnp.einsum("ZYXpdef,defio->ZYXpio", m, w).reshape(
                2, 2, 2, 8 * ci, co
            )
            pad = [(1 - a, a), (1 - bb, bb), (1 - c, c)]
            y = conv3d(x, wq, b, padding=pad)
            outs.append(y)
        return jnp.concatenate(outs, axis=-1)

    def phased_asym_6d(x, w, b):
        ci, co = w.shape[3], w.shape[4]
        outs = []
        for a, bb, c in product(range(2), repeat=3):
            m = jnp.asarray(_phase_lift_tensor(a, bb, c), w.dtype)
            wq = jnp.einsum("ZYXpdef,defio->ZYXpio", m, w).reshape(
                2, 2, 2, 8 * ci, co
            )
            pad = [(1 - a, a), (1 - bb, bb), (1 - c, c)]
            outs.append(conv3d(x, wq, b, padding=pad))
        y = jnp.stack(outs, axis=-2)  # (B,n,n,n,8,Co)
        bsh = y.shape
        return y.reshape(*bsh[:-2], bsh[-2] * bsh[-1])

    def phased_onehot(x, w, b):
        """one conv producing (B,n+1,...,8Co) like current but gather
        the phases with a strided reshape trick instead of slices."""
        return conv3_s2d_phased(x, w, b)  # placeholder

    # ---------------- dil-2 conv variants ----------------
    def poly_current(x, w, b):
        xp = to_polyphase(x)
        y = conv3d(xp, w, b, padding=1)
        return from_polyphase(y)

    def poly_grouped(x, w, b):
        """feature_group_count=8 on the interleaved s2d tensor."""
        ci, co = w.shape[3], w.shape[4]
        # group p occupies input channels [p*ci,(p+1)*ci) and output
        # channels [p*co,(p+1)*co): kernel stacks w per group on axis -1
        wg = jnp.concatenate([w] * 8, axis=-1)  # (3,3,3,ci,8co)
        y = conv3d(x, wg, None, padding=1, groups=8)
        if b is not None:
            y = y + jnp.tile(b, 8).astype(y.dtype)
        return y

    cases = []
    # dc5-like: full-res decoder phased conv (orig 64->32 at 128^3)
    cases.append(("L1dec 64ch 64^3 s2d", (8, 64, 64, 64, 512), (3, 3, 3, 64, 32),
                  [("phased_cur", phased_current), ("phased_asym", phased_asym),
                   ("phased_6d", phased_asym_6d)]))
    # ec4-like: L2 encoder phased conv (orig 32->32 at 64^3)
    cases.append(("L2enc 32ch 32^3 s2d", (8, 32, 32, 32, 256), (3, 3, 3, 32, 32),
                  [("phased_cur", phased_current), ("phased_asym", phased_asym),
                   ("phased_6d", phased_asym_6d)]))
    # ec1-like: L1 dense via block lift is separate; skip
    # ec3-like: L1 dil-2 (orig 16->32 at 128^3)
    cases.append(("L1 dil2 16->32", (8, 64, 64, 64, 128), (3, 3, 3, 16, 32),
                  [("poly_cur", poly_current), ("poly_grouped", poly_grouped)]))
    # ec5-like: L2 dil-2 (orig 32->32 at 64^3)
    cases.append(("L2 dil2 32->32", (8, 32, 32, 32, 256), (3, 3, 3, 32, 32),
                  [("poly_cur", poly_current), ("poly_grouped", poly_grouped)]))
    # ec6-like: L2 dil-2 (orig 32->64 at 64^3)
    cases.append(("L2 dil2 32->64", (8, 32, 32, 32, 256), (3, 3, 3, 32, 64),
                  [("poly_cur", poly_current), ("poly_grouped", poly_grouped)]))

    only = os.environ.get("MB_ONLY")
    for label, xshape, wshape, variants in cases:
        if only and only not in label:
            continue
        x = mk(xshape)
        w = mk(wshape)
        b = mk((wshape[-1],))
        print(f"\n== {label}: x{xshape} w{wshape} ==", flush=True)
        ref = None
        for name, fn in variants:
            # correctness on a downsampled fingerprint (full downloads
            # are minutes over the tunnel): corner slice, eager
            f = jax.jit(lambda x, fn=fn: fn(x, w, b))
            try:
                y = f(x)
                corner = np.asarray(
                    y[0, :4, :4, :4, :].astype(jnp.float32)
                )
                del y
                ms = op_time_ms(lambda x, fn=fn: fn(x, w, b), x)
            except Exception as e:
                print(f"  {name:14s} FAILED: {str(e)[:140]}", flush=True)
                continue
            if ref is None:
                ref = corner
                err = 0.0
            else:
                err = float(np.max(np.abs(corner - ref)))
            print(f"  {name:14s} {ms:8.3f} ms   corner_diff={err:.4f}",
                  flush=True)


if __name__ == "__main__":
    main()
