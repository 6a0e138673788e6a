"""Per-op TPU profile of the inference forward (and optionally the
engine step): traces with jax.profiler, parses the xplane proto, and
aggregates device time by op category (convolution / fusion / copy /
reduce / ...). This is the measurement tool behind the ROADMAP perf
items — run on the real chip.

Usage:
  python tools/profile_forward.py [forward|engine|step] [--top N]
"""

import collections
import glob
import os
import re
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _trace(fn, logdir, iters=3):
    import jax

    def sync(o):
        # force a device round-trip: on the tunneled axon platform
        # block_until_ready can return before execution finishes.
        # Slice ON DEVICE first — fetching the full array would drag
        # a ~100 MB volume through the ~7 MB/s tunnel and swamp wall
        import jax.numpy as jnp

        leaf = jax.tree.leaves(o)[0]
        return float(jnp.ravel(leaf)[0])

    sync(fn())  # compile + warm
    t0 = time.perf_counter()
    out = fn()
    sync(out)
    wall = time.perf_counter() - t0
    with jax.profiler.trace(logdir):
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
    return wall


def parse_xplane(logdir, iters=3, top=40):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    xs = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xs.ParseFromString(f.read())

    per_op = collections.Counter()  # name -> total ps
    per_cat = collections.Counter()
    for plane in xs.planes:
        if "TPU" not in plane.name or "device" not in plane.name.lower():
            continue
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, "?")
                per_op[name] += ev.duration_ps
    # async copy-start/done spans cover the compute they overlap —
    # summing them double-counts; report them separately, not in the
    # busy total or the ranking. Match the DEFINED op (lhs of " = ")
    # only: matching the whole text also caught every fusion with a
    # %copy-done operand and silently halved the busy total (r4 bug —
    # it made the train step look 50% wait-bound when the timeline is
    # actually gapless compute).
    def _is_async_copy(n):
        lhs = n.split(" = ")[0]
        return "copy-start" in lhs or "copy-done" in lhs
    async_ps = sum(ps for n, ps in per_op.items() if _is_async_copy(n))
    for name in list(per_op):
        if _is_async_copy(name):
            del per_op[name]
    for name, ps in per_op.items():
        cat = categorize(name)
        per_cat[cat] += ps

    total = sum(per_op.values())
    print(f"\n== device busy (sync ops): {total/1e12/iters*1e3:.2f} ms/iter;"
          f" async copy spans (overlapped): {async_ps/1e12/iters*1e3:.2f}"
          f" ms/iter ({iters} iters traced) ==")
    print("\n-- by category --")
    for cat, ps in per_cat.most_common():
        print(f"  {cat:28s} {ps/1e12/iters*1e3:8.2f} ms  {100*ps/total:5.1f}%")
    print(f"\n-- top {top} ops --")
    for name, ps in per_op.most_common(top):
        print(f"  {ps/1e12/iters*1e3:8.3f} ms  {100*ps/total:5.1f}%  {name[:110]}")
    return per_op, per_cat, total


def categorize(name: str) -> str:
    # Classify by the RESULT name (lhs) — operand names routinely
    # contain copy.N / transpose.N and classifying on the whole line
    # binned conv fusions with a copied operand as copy/layout
    # (round-4: the "55% copy" forward was really conv-at-peak).
    n = name.lower()
    lhs = n.split(" = ")[0]
    if "conv" in lhs and "fusion" not in lhs:
        return "convolution"
    if "conv_general_dilated" in n and "fusion" in lhs:
        # conv fusion identified via its op_name metadata
        return "convolution(fusion)"
    if "copy" in lhs:
        return "copy/layout"
    if "transpose" in lhs and "fusion" not in lhs:
        return "transpose"
    if "all-reduce" in lhs or "all-gather" in lhs or "collective" in lhs:
        return "collective"
    if "dynamic-update-slice" in lhs or "dynamic-slice" in lhs:
        return "dynamic-slice"
    if "reduce" in lhs:
        return "reduce"
    if "fusion" in lhs:
        m = re.match(r"%?(loop_|input_|output_)?fusion", lhs)
        return "fusion(elementwise/mixed)" if m else "fusion(other)"
    if "convert" in lhs:
        return "convert"
    if "infeed" in lhs or "outfeed" in lhs:
        return "infeed/outfeed"
    return "other"


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "forward"
    top = 40
    if "--top" in sys.argv:
        top = int(sys.argv[sys.argv.index("--top") + 1])

    import jax
    import jax.numpy as jnp

    from se_unet_airseg_tpu.models import SEUNetConfig, init_params
    from se_unet_airseg_tpu.models.se_unet import apply_fast
    from se_unet_airseg_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    cfg = SEUNetConfig(compute_dtype=jnp.bfloat16)
    params = init_params(jax.random.key(0), cfg)
    logdir = tempfile.mkdtemp(prefix="jaxprof_")
    iters = 3

    if what == "forward":
        B = int(os.environ.get("PROF_B", "8"))
        S = int(os.environ.get("PROF_S", "128"))
        x = jnp.asarray(
            np.random.default_rng(0).random((B, S, S, S, 2), np.float32)
        )

        fwd = jax.jit(lambda p, x: apply_fast(p, x, cfg=cfg, train=False))

        def run():
            return fwd(params, x)

        wall = _trace(run, logdir, iters)
        print(f"forward B={B} {S}^3: {wall*1e3:.1f} ms wall "
              f"({B/wall:.1f} tiles/s)")
    elif what == "engine":
        from se_unet_airseg_tpu.infer import SlidingWindowRunner
        from se_unet_airseg_tpu.infer.sliding_window import (
            BLOCKS_PER_CHUNK,
            make_chunk_fetcher,
        )

        runner = SlidingWindowRunner(params, cfg, batch=8)
        vol = (np.random.default_rng(0).random((320, 256, 320)) * 1400.0
               + 24.0).astype(np.int16)

        def run():
            # the bench's production dispatch+fetch (block-constant
            # trit codec; host pulls summary + mixed-block chunks)
            summary, chunks, payload, padded_shape, _ = (
                runner.predict_trits_summary_device(
                    vol, h_thresh=0.5, l_thresh=0.35, hu_shift=-1024.0))
            s = np.asarray(summary, np.uint8)
            mixed = np.flatnonzero((s >> 2) != (s & 3))
            need = np.unique(mixed // BLOCKS_PER_CHUNK)
            f = make_chunk_fetcher(s, chunks, payload)
            for c in need:
                f(int(c))
            return summary

        wall = _trace(run, logdir, iters)
        from se_unet_airseg_tpu.data import pad_positions_to_batch, tile_positions
        n = len(pad_positions_to_batch(tile_positions(vol.shape), 8))
        print(f"engine {vol.shape}: {wall:.2f} s wall, {n} tiles, "
              f"{n/wall:.2f} tiles/s")
    elif what == "batch":
        # ONE production tile-batch step (gather -> window -> forward ->
        # scatter-add), prepared fast params, jitted standalone — the
        # per-op numbers here are the engine's per-batch cost without
        # the whole-volume while wrapper double-counting its body
        from se_unet_airseg_tpu.infer import SlidingWindowRunner

        runner = SlidingWindowRunner(params, cfg, batch=8)
        vol = (np.random.default_rng(0).random((320, 256, 320)) * 1400.0
               + 24.0).astype(np.int16)
        vol_j = jnp.asarray(vol)
        pred0 = jnp.zeros(vol.shape, jnp.float32)
        pos = jnp.asarray(
            [[0, 0, 0], [64, 0, 0], [128, 0, 0], [0, 64, 0],
             [64, 64, 0], [0, 0, 64], [64, 0, 64], [0, 64, 64]],
            jnp.int32,
        )
        step = jax.jit(runner._step_fn_logic())
        rng = jax.random.key(0)
        shift = jnp.float32(-1024.0)

        def run():
            return step(runner.params, runner.fast_params, vol_j, pred0,
                        pos, rng, shift)

        wall = _trace(run, logdir, iters)
        print(f"batch step B=8: {wall*1e3:.0f} ms ({8/wall:.1f} tiles/s)")
    elif what == "step":
        from se_unet_airseg_tpu.train.step import (
            create_train_state, make_optimizer, make_train_step)

        cfg = SEUNetConfig(compute_dtype=jnp.bfloat16, remat=True)
        params = init_params(jax.random.key(0), cfg)
        opt, _ = make_optimizer()
        state = create_train_state(params, opt)
        stage = int(os.environ.get("STAGE", "1"))  # 1 = the bench step
        step = make_train_step(opt, cfg, stage=stage)
        B = int(os.environ.get("PROF_B", "2"))
        rng = np.random.default_rng(0)
        batch = {
            "image": rng.random((B, 128, 128, 128, 2), np.float32),
            "label": (rng.random((B, 128, 128, 128)) > 0.7).astype(np.float32),
        }
        if stage >= 2:
            batch["weight"] = rng.random((B, 128, 128, 128)).astype(np.float32)
        if stage >= 3:
            batch["skel"] = batch["label"]
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        key = jax.random.key(1)

        holder = {"state": state}

        def run():
            holder["state"], aux = step(holder["state"], batch, key)
            return aux["loss"]

        wall = _trace(run, logdir, iters)
        print(f"train step B={B}: {wall*1e3:.0f} ms")
    else:
        raise SystemExit(f"unknown target {what}")

    parse_xplane(logdir, iters=iters, top=top)


if __name__ == "__main__":
    main()
