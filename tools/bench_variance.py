#!/usr/bin/env python
"""Measurement protocol for training-step benches (round-4 verdict item 4).

The r3 driver's BENCH run measured train_aa_mixer_step_ms = 323.1 ms while
the builder's same-session run said 285.4 ms — a 13% gap, outside the
documented "~±5% axon-relay variance". This script characterises the real
run-to-run band: N independent *process-level* repeats (fresh process =
fresh relay session = the thing that varies), each reporting its own
ms/step median over --iters in-process steps. Prints per-run values plus
median / min / max / spread, machine-readable JSON on the last line.

Usage:  python tools/bench_variance.py --only mixer --runs 5 --iters 5
"""
import argparse
import json
import statistics
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def one_run(only: str, batch_flag: str, batch: int, iters: int) -> dict:
    cmd = [sys.executable, str(REPO / "tools" / "bench_train.py"),
           "--only", only, batch_flag, str(batch), "--iters", str(iters),
           "--skip-encode"]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600,
                         cwd=str(REPO))
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no metric line from {' '.join(cmd)}:\n"
                       f"{out.stdout[-500:]}\n{out.stderr[-500:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="mixer", choices=["mixer", "clapdae"])
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--batch", type=int, default=None)
    args = ap.parse_args()

    batch_flag = "--mixer-batch" if args.only == "mixer" else "--clapdae-batch"
    batch = args.batch or (128 if args.only == "mixer" else 16)

    vals, mfus = [], []
    for i in range(args.runs):
        r = one_run(args.only, batch_flag, batch, args.iters)
        vals.append(r["value"])
        if "train_mfu" in r:
            mfus.append(r["train_mfu"])
        print(f"# run {i+1}/{args.runs}: {r['value']} ms/step "
              f"(mfu {r.get('train_mfu', '—')}) [{r['note']}]",
              file=sys.stderr)

    med = statistics.median(vals)
    lo, hi = min(vals), max(vals)
    spread_pct = 100.0 * (hi - lo) / med if med else 0.0
    print(json.dumps({
        "metric": f"train_{args.only}_step_ms_median_of_{args.runs}",
        "value": round(med, 1), "unit": "ms_per_step",
        "runs_ms": vals, "min": lo, "max": hi,
        "spread_pct_of_median": round(spread_pct, 1),
        "mfu_median": round(statistics.median(mfus), 3) if mfus else None,
        "note": f"{args.runs} fresh-process runs x {args.iters} steps, "
                f"batch={batch}"}))


if __name__ == "__main__":
    main()
