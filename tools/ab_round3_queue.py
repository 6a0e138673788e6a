"""Serial TPU A/B queue for the round-3 batch-minor kernel stack.

Runs the kernel-level probes ONE AT A TIME (the axon relay serves
compiles serially; concurrent clients wedge the queue) and logs
everything to stdout. Stops BEFORE any whole-model compile — those are
chosen by hand from these results.

Order is by expected payoff: the three dil-2 blocks cost ~17 of the
32.6 ms/tile under XLA (the fused kernel projects ~6-9), then the
full phased blocks (which also legality-probe phased_finalize_bm and
phased_conv_ext_bm), then the dc3 k-grid conv.

Each stage gets a generous timeout; on a timeout we STOP the queue
entirely (a killed client does NOT cancel the server-side compile —
continuing would pile onto a wedged queue).
"""
import subprocess
import sys
import time

HERE = "/root/repo/tools"
PY = sys.executable

STAGES = [
    ("probe_bm", [PY, f"{HERE}/probe_bm_kernel.py"], 2400, None),
    ("dil2 ec3", [PY, f"{HERE}/quickbench_dil2_bm.py", "ec3"], 5400, None),
    ("dil2 ec5", [PY, f"{HERE}/quickbench_dil2_bm.py", "ec5"], 5400, None),
    ("dil2 ec6", [PY, f"{HERE}/quickbench_dil2_bm.py", "ec6"], 5400, None),
    ("pblock ec4", [PY, f"{HERE}/quickbench_pblock_bm.py", "ec4"], 7200, None),
    ("pblock dc6", [PY, f"{HERE}/quickbench_pblock_bm.py", "dc6"], 7200, None),
    ("pblock dc5", [PY, f"{HERE}/quickbench_pblock_bm.py", "dc5"], 7200, None),
    ("pblock dc4", [PY, f"{HERE}/quickbench_pblock_bm.py", "dc4"], 7200, None),
    ("pconv dc3", [PY, f"{HERE}/quickbench_pconv_bm.py", "dc3"], 5400, None),
    # model-level (run explicitly: `ab_round3_queue.py model-bm ...`);
    # each is a whole-model compile — long, one at a time
    ("model-bm", [PY, f"{HERE}/voltime.py"], 14400,
     {"FASTPATH_BM": "1"}),
    ("model-bm-ec12p", [PY, f"{HERE}/voltime.py"], 14400,
     {"FASTPATH_BM": "1", "FASTPATH_EC12_PHASED": "1"}),
    ("model-control", [PY, f"{HERE}/voltime.py"], 14400, {}),
    ("model-bm-b12", [PY, f"{HERE}/voltime.py"], 14400,
     {"FASTPATH_BM": "1", "BATCH": "12"}),
]


def main():
    import os

    only = set(sys.argv[1:])
    for name, cmd, tmo, env in STAGES:
        if env is not None and not only:
            continue  # model-level stages never run implicitly
        # exact-name match: a substring ("model-bm") must not also
        # launch "model-bm-ec12p"/"model-bm-b12" — each model stage is
        # a whole-model compile on the serial relay queue
        if only and name not in only:
            continue
        print(f"=== {time.strftime('%H:%M:%S')} stage {name} ===", flush=True)
        t0 = time.time()
        try:
            r = subprocess.run(cmd, timeout=tmo, text=True,
                               capture_output=True,
                               env={**os.environ, **(env or {})})
        except subprocess.TimeoutExpired as e:
            print(f"STAGE {name} TIMED OUT after {tmo}s — queue likely "
                  f"wedged; STOPPING (do not pile on).", flush=True)
            if e.stdout:
                print(e.stdout[-2000:], flush=True)
            return 1
        dur = time.time() - t0
        print(r.stdout, flush=True)
        if r.returncode != 0:
            print(f"stage {name} rc={r.returncode} after {dur:.0f}s",
                  flush=True)
            print((r.stderr or "")[-3000:], flush=True)
            # legality failures are information, not queue problems —
            # keep going
        else:
            print(f"stage {name} ok in {dur:.0f}s", flush=True)
    print("QUEUE DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
