"""Fresh-session A/B measurement harness (VERDICT r6 tasks #2/#6).

The q199 lesson: a best-of-3 taken inside ONE warm session can lie —
r6 measured a shape 1.9-2.0x faster, shipped it, and the next full
bench measured the shipped shape at 40 s.  Any perf-motivated shape
change must therefore be justified by measurements from AT LEAST TWO
independent JVM sessions (round_gate enforces this via
PERF_CLAIMS_r{N}.json — see round_gate.py).

This tool is the measurement instrument: for each requested query it
spawns ``--sessions`` fresh Python/JVM subprocesses; each subprocess
builds the same tuned session bench.py uses, warms codegen with the
q03 flagship, then times every requested query ``--reps`` times via
the no-op sink.  One JSON line per session is APPENDED to
``bench_sessions.jsonl`` with the JVM fingerprint (pid, uptime, GC),
so provenance survives and accumulates across rounds.

Usage:
    python tools/ab_measure.py [--sf-dir DIR] [--sessions 3] [--reps 2] \
        [--label free-text] q55_grouping_sets q315_dbscan_core_labels ...

    # internal: one child session (invoked by the parent)
    python tools/ab_measure.py --one-session --sf-dir DIR --reps 2 q...

Summary on stdout: per query, the min within each session and the
cross-session spread — the honest point estimate is the min of mins,
and "real regression" requires ALL sessions to agree it is high.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SESSIONS_LOG = os.path.join(ROOT, "bench_sessions.jsonl")


def one_session(sf_dir: str, reps: int, names: list[str]) -> dict:
    from bench import execute, session_fingerprint
    from health_data_transformation_spark.plans.analytics import REGISTRY
    from health_data_transformation_spark.session import get_spark

    spark = get_spark(app_name="hdt-ab-measure")
    spark.sparkContext.setLogLevel("ERROR")
    execute(REGISTRY["q03_pricing_summary"].fn(spark, sf_dir))  # warm codegen

    out: dict = {
        "sf_dir": sf_dir,
        "fingerprint": session_fingerprint(spark),
        "queries": {},
    }
    for name in names:
        runs = []
        for _ in range(reps):
            t0 = time.time()
            execute(REGISTRY[name].fn(spark, sf_dir))
            runs.append(round(time.time() - t0, 3))
        out["queries"][name] = runs
    spark.stop()
    return out


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--sessions", type=int, default=3)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--label", default="")
    ap.add_argument("--one-session", action="store_true")
    args = ap.parse_args()

    if args.one_session:
        print(json.dumps(one_session(args.sf_dir, args.reps, args.queries)))
        return 0

    sessions: list[dict] = []
    for i in range(args.sessions):
        proc = subprocess.run(
            [
                sys.executable, os.path.abspath(__file__), "--one-session",
                "--sf-dir", args.sf_dir, "--reps", str(args.reps),
                *args.queries,
            ],
            capture_output=True, text=True, cwd=ROOT,
        )
        # Spark writes progress noise to stdout in some configs: the
        # payload is the LAST parseable JSON line.
        payload = None
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                payload = json.loads(line)
                break
            except json.JSONDecodeError:
                continue
        if payload is None:
            print(f"session {i}: FAILED (rc={proc.returncode})",
                  file=sys.stderr)
            print(proc.stderr[-2000:], file=sys.stderr)
            return 1
        payload["label"] = args.label
        sessions.append(payload)
        with open(SESSIONS_LOG, "a") as fh:
            fh.write(json.dumps(payload, sort_keys=True) + "\n")
        mins = {q: min(r) for q, r in payload["queries"].items()}
        print(f"session {i}: {json.dumps(mins, sort_keys=True)}")

    print("\n=== cross-session summary (min per session) ===")
    for q in args.queries:
        per = [min(s["queries"][q]) for s in sessions]
        lo, hi = min(per), max(per)
        spread = hi / lo if lo > 0 else float("inf")
        print(f"{q}: min={lo:.2f}s max={hi:.2f}s spread={spread:.2f}x "
              f"sessions={['%.2f' % p for p in per]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
