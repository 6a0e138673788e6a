"""Source-line attribution for a train-step (or forward) TPU profile.

Joins two artifacts the relay CAN produce (xla_dump_to is scrubbed by
the remote compile helper, so classic HLO dumps don't work here):
  1. the xplane trace (op result name -> device time), via
     profile_forward's parser;
  2. lowered.compile().as_text() — the optimized HLO with per-op
     metadata (op_name="jit(step_fn)/transpose(jvp(...))/..."
     source_file=... source_line=...).

Aggregates device time by (phase, source_file:line) where phase is
fwd / bwd / opt, read off the op_name prefix (jvp -> forward value,
transpose(jvp) -> backward). Remat recomputes carry .remat in the HLO
result name and are reported as their own phase.

Usage: PROF_B=8 STAGE=1 python tools/profile_attrib.py [--top N]
"""

import collections
import os
import re
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_forward import _trace, parse_xplane  # noqa: E402


def build_step():
    import jax
    import jax.numpy as jnp

    from se_unet_airseg_tpu.models import SEUNetConfig, init_params
    from se_unet_airseg_tpu.train.step import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    cfg = SEUNetConfig(compute_dtype=jnp.bfloat16, remat=True)
    params = init_params(jax.random.key(0), cfg)
    opt, _ = make_optimizer()
    state = create_train_state(params, opt)
    stage = int(os.environ.get("STAGE", "1"))
    step = make_train_step(opt, cfg, stage=stage)
    B = int(os.environ.get("PROF_B", "8"))
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(
            rng.random((B, 128, 128, 128, 2), np.float32)),
        "label": jnp.asarray(
            (rng.random((B, 128, 128, 128)) > 0.7).astype(np.float32)),
    }
    if stage >= 2:
        batch["weight"] = jnp.asarray(
            rng.random((B, 128, 128, 128), np.float32))
    if stage >= 3:
        batch["skel"] = batch["label"]
    return step, state, batch, B


_META = re.compile(
    r"%([\w.\-]+) = .*?metadata=\{op_name=\"([^\"]*)\""
    r"(?:[^}]*?source_file=\"([^\"]*)\")?(?:[^}]*?source_line=(\d+))?"
)


def hlo_metadata(txt: str):
    """result name -> (op_name, file:line)."""
    out = {}
    for m in _META.finditer(txt):
        name, op_name, f, ln = m.groups()
        loc = f"{os.path.basename(f)}:{ln}" if f else "?"
        out[name] = (op_name, loc)
    return out


def phase_of(result_name: str, op_name: str) -> str:
    if ".remat" in result_name:
        return "remat"
    if "transpose(jvp" in op_name:
        return "bwd"
    if "jvp(" in op_name:
        return "fwd"
    if any(k in op_name for k in ("adamw", "scale_by", "add_decayed",
                                  "apply_updates", "inject")):
        return "opt"
    return "other"


def main():
    top = 40
    if "--top" in sys.argv:
        top = int(sys.argv[sys.argv.index("--top") + 1])

    import jax

    from se_unet_airseg_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    step, state, batch, B = build_step()
    key = jax.random.key(1)
    txt = step.lower(state, batch, key).compile().as_text()
    meta = hlo_metadata(txt)
    print(f"HLO ops with metadata: {len(meta)}")

    holder = {"state": state}

    def run():
        holder["state"], aux = step(holder["state"], batch, key)
        return aux["loss"]

    logdir = tempfile.mkdtemp(prefix="prof_attrib_")
    iters = 3
    wall = _trace(run, logdir, iters)
    print(f"train step B={B}: {wall*1e3:.0f} ms")
    per_op, _, total = parse_xplane(logdir, iters=iters, top=0)

    by_phase = collections.Counter()
    by_line = collections.Counter()
    by_phase_line = collections.Counter()
    unmatched = 0.0
    for name, ps in per_op.items():
        lhs = name.split(" = ")[0].lstrip("%")
        m = meta.get(lhs)
        if m is None:
            unmatched += ps
            continue
        op_name, loc = m
        ph = phase_of(lhs, op_name)
        by_phase[ph] += ps
        by_line[loc] += ps
        by_phase_line[(ph, loc)] += ps

    def ms(ps):
        return ps / 1e12 / iters * 1e3

    print(f"\nunmatched: {ms(unmatched):.1f} ms")
    print("\n-- by phase --")
    for ph, ps in by_phase.most_common():
        print(f"  {ph:8s} {ms(ps):8.1f} ms {100*ps/total:5.1f}%")
    print(f"\n-- top {top} source lines --")
    for loc, ps in by_line.most_common(top):
        phs = {p: ms(by_phase_line[(p, loc)])
               for p in ("fwd", "bwd", "remat", "opt", "other")
               if by_phase_line.get((p, loc))}
        detail = " ".join(f"{p}={v:.1f}" for p, v in phs.items())
        print(f"  {ms(ps):8.1f} ms {100*ps/total:5.1f}%  {loc:42s} {detail}")

    # drill-down: top individual ops whose source line matches --line
    # (the special value UNMATCHED lists ops with no HLO metadata)
    if "--line" in sys.argv:
        want = sys.argv[sys.argv.index("--line") + 1]
        rows = []
        for name, ps in per_op.items():
            lhs = name.split(" = ")[0].lstrip("%")
            m = meta.get(lhs)
            if want == "UNMATCHED":
                if m is None:
                    rows.append((ps, name, "?"))
                continue
            if m and want in m[1]:
                rows.append((ps, name, m[0]))
        rows.sort(reverse=True)
        print(f"\n-- top ops at {want} --")
        for ps, name, op_name in rows[:top]:
            print(f"  {ms(ps):7.2f} ms  {name[:100]}")
            print(f"             {op_name[-110:]}")


if __name__ == "__main__":
    main()
