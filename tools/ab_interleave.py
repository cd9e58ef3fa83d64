"""Interleaved A/B measurement across two working trees (r12).

The r12 measurement finding: this box's throughput oscillates in
multi-minute waves (host CPU-steal bursts — /proc/stat steal
accumulates in spikes), so two back-to-back ``ab_measure`` runs land
in different speed regimes and a 2x "regression" can be pure drift.
This tool removes the time confound by interleaving the arms:

    A B  A B  A B ...   (one fresh JVM session per arm per round)

where arm A runs against a *separate checkout* (e.g. a ``git worktree``
of the pre-change commit) and arm B against the current repo.  The
report pairs arms per round (same speed regime) and gives per-round
ratios plus min-of-rounds per arm.

Usage:
    git worktree add /tmp/hdt_before HEAD    # or any baseline ref
    python tools/ab_interleave.py --before /tmp/hdt_before \
        [--rounds 3] [--reps 2] [--label xyz] \
        [--env-a K=V] [--env-b K=V] q313_... q199_...

Arms can also differ only by env (same tree): pass --before ROOT and
--env-a/--env-b.  Sessions are appended to bench_sessions.jsonl with
labels ``<label>-A`` / ``<label>-B`` so the perf-claims gate sees both
shapes.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SESSIONS_LOG = os.path.join(ROOT, "bench_sessions.jsonl")


def run_arm(tree: str, sf_dir: str, reps: int, queries: list[str],
            env_extra: dict[str, str]) -> dict | None:
    env = dict(os.environ)
    env.update(env_extra)
    proc = subprocess.run(
        [
            sys.executable, os.path.join(tree, "tools", "ab_measure.py"),
            "--one-session", "--sf-dir", sf_dir, "--reps", str(reps),
            *queries,
        ],
        capture_output=True, text=True, cwd=tree, env=env,
    )
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    print(f"arm in {tree} FAILED rc={proc.returncode}", file=sys.stderr)
    print(proc.stderr[-2000:], file=sys.stderr)
    return None


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--before", required=True,
                    help="checkout dir for arm A (baseline)")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--label", default="ab-interleave")
    ap.add_argument("--env-a", action="append", default=[])
    ap.add_argument("--env-b", action="append", default=[])
    args = ap.parse_args()

    env_a = dict(kv.split("=", 1) for kv in args.env_a)
    env_b = dict(kv.split("=", 1) for kv in args.env_b)

    rounds: list[tuple[dict, dict]] = []
    for r in range(args.rounds):
        a = run_arm(args.before, args.sf_dir, args.reps, args.queries, env_a)
        b = run_arm(ROOT, args.sf_dir, args.reps, args.queries, env_b)
        if a is None or b is None:
            return 1
        for payload, suffix in ((a, "A"), (b, "B")):
            payload["label"] = f"{args.label}-{suffix}"
            with open(SESSIONS_LOG, "a") as fh:
                fh.write(json.dumps(payload, sort_keys=True) + "\n")
        rounds.append((a, b))
        amins = {q: min(v) for q, v in a["queries"].items()}
        bmins = {q: min(v) for q, v in b["queries"].items()}
        print(f"round {r}: A={json.dumps(amins, sort_keys=True)}")
        print(f"round {r}: B={json.dumps(bmins, sort_keys=True)}")

    print("\n=== interleaved summary (per-round paired ratios B/A) ===")
    for q in args.queries:
        pa = [min(a["queries"][q]) for a, _ in rounds]
        pb = [min(b["queries"][q]) for _, b in rounds]
        ratios = [b / a if a > 0 else float("inf") for a, b in zip(pa, pb)]
        geo = 1.0
        for x in ratios:
            geo *= x
        geo **= 1.0 / len(ratios)
        print(
            f"{q}: minA={min(pa):.2f} minB={min(pb):.2f} "
            f"ratios={['%.2f' % x for x in ratios]} geomean={geo:.2f}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
