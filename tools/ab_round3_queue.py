"""Serial TPU A/B queue for the round-3 batch-minor kernel stack.

Runs the kernel-level probes ONE AT A TIME (the axon relay serves
compiles serially; concurrent clients wedge the queue) and logs
everything to stdout. Stops BEFORE any whole-model compile — those are
chosen by hand from these results.

Stages:
  1. probe_bm_kernel          — bm gathered-epilogue legality/timing
  2. quickbench_pconv_bm ec4, dc4, dc6, dc5, dc3   (cheap -> expensive)
  3. quickbench_dil2_bm  ec3, ec5, ec6

Each stage gets a generous timeout; on a timeout we STOP the queue
entirely (a killed client does NOT cancel the server-side compile —
continuing would pile onto a wedged queue).
"""
import subprocess
import sys
import time

HERE = "/root/repo/tools"

STAGES = [
    ("probe_bm", [sys.executable, f"{HERE}/probe_bm_kernel.py"], 2400),
    ("pconv ec4", [sys.executable, f"{HERE}/quickbench_pconv_bm.py", "ec4"], 3600),
    ("pconv dc4", [sys.executable, f"{HERE}/quickbench_pconv_bm.py", "dc4"], 3600),
    ("pconv dc6", [sys.executable, f"{HERE}/quickbench_pconv_bm.py", "dc6"], 3600),
    ("pconv dc5", [sys.executable, f"{HERE}/quickbench_pconv_bm.py", "dc5"], 5400),
    ("pconv dc3", [sys.executable, f"{HERE}/quickbench_pconv_bm.py", "dc3"], 5400),
    ("dil2 ec3", [sys.executable, f"{HERE}/quickbench_dil2_bm.py", "ec3"], 5400),
    ("dil2 ec5", [sys.executable, f"{HERE}/quickbench_dil2_bm.py", "ec5"], 3600),
    ("dil2 ec6", [sys.executable, f"{HERE}/quickbench_dil2_bm.py", "ec6"], 3600),
]


def main():
    for name, cmd, tmo in STAGES:
        print(f"=== {time.strftime('%H:%M:%S')} stage {name} ===", flush=True)
        t0 = time.time()
        try:
            r = subprocess.run(cmd, timeout=tmo, text=True,
                               capture_output=True)
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
