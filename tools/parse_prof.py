"""Aggregate an engine xplane trace into actionable buckets.

Excludes control-flow spans (while/conditional, which cover their
bodies) and async copy-start/done spans; groups every remaining op by
a coarse (kind, dominant-shape) signature so the long tail of layout
copies shows up as pools instead of vanishing below top-N.

Usage: python tools/parse_prof.py <logdir> [iters]
"""
import re
import sys
from collections import Counter

from tensorflow.tsl.profiler.protobuf import xplane_pb2
import glob


def load_xspace(logdir):
    paths = glob.glob(f"{logdir}/plugins/profile/*/*.xplane.pb")
    xs = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs


SHAPE_RE = re.compile(r"(bf16|f32|s32|u32|s16|u8|pred|s8)\[([0-9,]*)\]")

DTSIZE = {"bf16": 2, "f32": 4, "s32": 4, "u32": 4, "s16": 2, "u8": 1,
          "pred": 1, "s8": 1}


def op_kind(name):
    n = name.lower()
    if "copy-start" in n:
        return "copy-start"
    if "copy-done" in n:
        return "copy-done"
    if n.startswith("%while") or n.startswith("%conditional"):
        return None  # covers body
    for k in ("slice_maximum_fusion", "convert_reduce_fusion",
              "compare_select_fusion", "convolution", "closed_call",
              "custom-call", "dynamic-update-slice", "dynamic-slice",
              "slice-start", "slice-done", "copy", "reshape", "bitcast",
              "transpose", "add", "fusion", "reduce", "select", "step",
              "multiply", "concatenate", "pad", "sigmoid", "broadcast"):
        if k in n:
            return k
    return "other"


def main():
    logdir = sys.argv[1]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    xs = load_xspace(logdir)
    per_bucket = Counter()
    per_name = Counter()
    total = 0
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue  # skip module/step/async lines
            for ev in line.events:
                name = meta.get(ev.metadata_id, "?")
                kind = op_kind(name)
                if kind is None:
                    continue
                # dominant output shape
                m = SHAPE_RE.search(name)
                sig = ""
                if m:
                    dt, dims = m.group(1), m.group(2)
                    nelt = 1
                    for d in dims.split(","):
                        if d:
                            nelt *= int(d)
                    mb = nelt * DTSIZE[dt] / 1e6
                    sig = f"{dt}[{dims}] {mb:7.1f}MB"
                per_bucket[(kind, sig)] += ev.duration_ps
                per_name[name.split(" = ")[0]] += ev.duration_ps
                total += ev.duration_ps

    print(f"total (sync, non-controlflow): {total/1e12/iters*1e3:.1f} ms/iter")
    print("\n-- buckets --")
    for (kind, sig), ps in per_bucket.most_common(60):
        print(f"  {ps/1e12/iters*1e3:8.2f} ms  {kind:26s} {sig}")


if __name__ == "__main__":
    main()
