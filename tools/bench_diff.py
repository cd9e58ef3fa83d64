#!/usr/bin/env python
"""Per-query bench regression gate.

Diffs two bench detail files (``{"queries": {name: sec}, ...}`` — the
shape ``bench.py`` writes to ``bench_detail.json`` and the driver
records as ``BENCH_r{N}.json``) and fails when any query regressed by
more than ``--factor`` (default 2x) AND more than ``--floor`` seconds
(default 1.0 s — sub-second jitter is scheduler noise on local[32],
not a plan change).  This is the gate that would have caught the q105
double-evaluation regression (3.3 s -> 18.3 s between rounds) at
commit time instead of at judging time.

Usage:
    python tools/bench_diff.py OLD.json NEW.json [--factor 2.0] [--floor 1.0]

Exit 0: no regression.  Exit 1: regressions listed on stdout.
New queries (absent from OLD) and removed queries are reported but
never fail the gate.
"""

from __future__ import annotations

import argparse
import json
import sys


def load_queries(path: str) -> dict[str, float]:
    with open(path) as fh:
        data = json.load(fh)
    qs = data.get("queries", data)
    return {
        str(k): float(v)
        for k, v in qs.items()
        if isinstance(v, (int, float))
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--factor", type=float, default=2.0,
                    help="fail when new >= factor * old (default 2.0)")
    ap.add_argument("--floor", type=float, default=1.0,
                    help="ignore regressions smaller than this many "
                         "seconds of absolute growth (default 1.0)")
    args = ap.parse_args()

    old, new = load_queries(args.old), load_queries(args.new)
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))

    regressions: list[tuple[str, float, float, float]] = []
    improved = 0
    for name in sorted(set(old) & set(new)):
        o, n = old[name], new[name]
        if n < o:
            improved += 1
        if o > 0 and n >= args.factor * o and (n - o) >= args.floor:
            regressions.append((name, o, n, n / o))

    if added:
        print(f"new queries ({len(added)}): {', '.join(added[:10])}"
              + (" ..." if len(added) > 10 else ""))
    if removed:
        print(f"removed queries ({len(removed)}): {', '.join(removed)}")
    print(f"compared {len(set(old) & set(new))} queries; "
          f"{improved} improved; {len(regressions)} regressed "
          f">= {args.factor}x (+{args.floor}s floor)")

    for name, o, n, ratio in sorted(regressions, key=lambda r: -r[3]):
        print(f"REGRESSION {name}: {o:.2f}s -> {n:.2f}s ({ratio:.1f}x)")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
