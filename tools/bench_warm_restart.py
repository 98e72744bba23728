#!/usr/bin/env python
"""Restart-to-first-audio for the serving process (round-2 ask 4, closed in
round 4): how long after a server restart until the first generation is
delivered, with the persistent XLA compile cache warm.

Runs the exact serve.py startup path (enable_compile_cache ->
MirageService -> one generate_wav at the production 150+100 config) in N
consecutive FRESH processes. Process 1 may pay residual compiles; the
steady state is every later process — that's the restart number a
production operator sees. Prints one JSON line with both.

Usage:  python tools/bench_warm_restart.py [--procs 3] [--steps 150]
"""
import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

CHILD = r"""
import time, sys
t0 = time.time()
from audio_algebra_tpu.utils.profiling import enable_compile_cache
enable_compile_cache()
from audio_algebra_tpu.serve import MirageService
svc = MirageService(model_choice="22s", half=True)
wav, meta = svc.generate_wav({"text": ["warm restart probe"],
                              "steps": %(steps)d, "outer_steps": 100,
                              "batch_size": 1})
assert len(wav) > 44, "no audio produced"
print("FIRST_AUDIO_S %%.2f" %% (time.time() - t0), flush=True)
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=3)
    ap.add_argument("--steps", type=int, default=150)
    args = ap.parse_args()

    times = []
    for i in range(args.procs):
        t0 = time.time()
        out = subprocess.run([sys.executable, "-c", CHILD % dict(steps=args.steps)],
                             capture_output=True, text=True, timeout=3600,
                             cwd=str(REPO))
        wall = time.time() - t0
        first = None
        for line in out.stdout.splitlines():
            if line.startswith("FIRST_AUDIO_S"):
                first = float(line.split()[1])
        if first is None:
            raise RuntimeError(f"proc {i} failed:\n{out.stdout[-400:]}\n"
                               f"{out.stderr[-800:]}")
        times.append(first)
        print(f"# restart {i+1}/{args.procs}: first audio in {first:.1f}s "
              f"(process wall {wall:.1f}s)", file=sys.stderr)

    warm = times[1:] if len(times) > 1 else times
    print(json.dumps({
        "metric": "serve_restart_to_first_audio_s",
        "value": round(min(warm), 1), "unit": "s",
        "all_runs_s": [round(t, 1) for t in times],
        "note": f"persistent compile cache; run 1 may pay residual "
                f"compiles, steady state = later runs; "
                f"{args.steps}+100-step production config"}))


if __name__ == "__main__":
    main()
