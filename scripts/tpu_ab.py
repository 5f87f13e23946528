#!/usr/bin/env python
"""TPU A/B harness for the sampler optimizations.

Runs bench.py as subprocesses under controlled env combinations and prints a
markdown table of maps/min/chip.  Each variant is a fresh process so
import-time flags (CAMELS_PALLAS_STEP) and jit caches can't leak between
runs.  Results are committed to ARCHITECTURE.md.

Usage: python scripts/tpu_ab.py [--batch 128] [--timesteps 1500]
       python scripts/tpu_ab.py --quick   (batch 32, T=300 — smoke on CPU)
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VARIANTS = [
    # (label, env overrides)
    ("baseline r1 (no fold, XLA GN, XLA step)", {"BENCH_NO_FOLD": "1"}),
    ("+ BN fold", {}),
    ("+ BN fold + Pallas GN", {"BENCH_PALLAS_GN": "1"}),
    ("+ BN fold + Pallas step", {"CAMELS_PALLAS_STEP": "1"}),
    (
        "+ BN fold + Pallas GN + Pallas step",
        {"BENCH_PALLAS_GN": "1", "CAMELS_PALLAS_STEP": "1"},
    ),
]


def run_variant(env_overrides, batch, timesteps):
    env = dict(os.environ)
    env.update(env_overrides)
    env["BENCH_BATCH"] = str(batch)
    env["BENCH_TIMESTEPS"] = str(timesteps)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(
        f"bench produced no JSON.\nstdout:\n{out.stdout}\nstderr:\n{out.stderr[-2000:]}"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--timesteps", type=int, default=1500)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    batch, timesteps = args.batch, args.timesteps
    if args.quick:
        batch, timesteps = 32, 300

    rows = []
    for label, env in VARIANTS:
        try:
            r = run_variant(env, batch, timesteps)
            rows.append((label, r["value"], r["seconds_per_run"]))
            print(f"# {label}: {r['value']} maps/min", file=sys.stderr)
        except Exception as e:
            rows.append((label, None, None))
            print(f"# {label}: FAILED {e}", file=sys.stderr)

    print(f"\n| Variant | maps/min/chip | s/run (batch {batch}, T={timesteps}) |")
    print("|---|---|---|")
    for label, v, s in rows:
        print(f"| {label} | {v if v is not None else 'FAILED'} | {s} |")
    print("\n" + json.dumps({"batch": batch, "timesteps": timesteps,
                             "rows": rows}))


if __name__ == "__main__":
    main()
