"""Find execution-timeline gaps in an xplane trace: sort XLA ops by
start time, list the largest inter-op gaps and the op that ran after
each gap (i.e., what the device was waiting to start).

Usage: python tools/prof_gaps.py <logdir> [top]
"""
import glob
import sys


def main():
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    logdir, top = sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 30
    paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    xs = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xs.ParseFromString(f.read())

    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        print(f"== plane: {plane.name} ==")
        for line in plane.lines:
            evs = []
            for ev in line.events:
                name = meta.get(ev.metadata_id, "?")
                if name.startswith("%while") or name.startswith("%conditional"):
                    continue
                evs.append((ev.offset_ps, ev.duration_ps, name))
            if not evs:
                continue
            evs.sort()
            span = (evs[-1][0] + evs[-1][1] - evs[0][0]) / 1e12
            busy = sum(d for _, d, _ in evs) / 1e12
            print(f"-- line: {line.name}: {len(evs)} events, span {span:.3f}s,"
                  f" busy {busy:.3f}s ({100*busy/max(span,1e-9):.0f}%)")
            if "op" not in line.name.lower():
                continue
            gaps = []
            end = evs[0][0]
            for off, dur, name in evs:
                if off > end:
                    gaps.append((off - end, name))
                end = max(end, off + dur)
            gaps.sort(reverse=True)
            tot = sum(g for g, _ in gaps) / 1e12
            print(f"   total gap {tot:.3f}s over {len(gaps)} gaps")
            for g, name in gaps[:top]:
                print(f"   {g/1e9:9.3f} ms gap before {name[:110]}")


if __name__ == "__main__":
    main()
