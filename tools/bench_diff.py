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

Canary normalization (VERDICT r6 task #2): when BOTH detail files
carry the ``canary`` block bench.py writes (a fixed pair of stable
queries timed best-of-3 at run start and end), per-query ratios are
divided by the cross-run canary factor — geomean over the pair of
new_canary_min / old_canary_min.  This separates machine-day /
session drift (which moves the canaries and every query together,
like r6's unattributable +11% median) from a real plan regression
(which moves one query against the canaries).  The gate criterion
uses the NORMALIZED ratio but keeps the raw absolute floor: a
regression must be >= factor x after drift correction AND >= floor
seconds of raw growth.

Usage:
    python tools/bench_diff.py OLD.json NEW.json [--factor 2.0] [--floor 1.0]
                               [--json BENCH_DIFF_rNN.json]

Exit 0: no regression.  Exit 1: regressions listed on stdout.
New queries (absent from OLD) and removed queries are reported but
never fail the gate.

``--json`` (VERDICT r8 task #4) writes the diff summary as a committed
artifact so round-notes prose can quote figures instead of restating
them — the r7/r8 within-run-drift class was notes quoting a diff run
against a detail that a later re-record superseded.  round_gate passes
it automatically, derived from the current round's detail pair.
"""

from __future__ import annotations

import argparse
import json
import sys


def load_detail(path: str) -> dict:
    with open(path) as fh:
        return json.load(fh)


def load_queries(data) -> dict[str, float]:
    if isinstance(data, str):  # path (back-compat for importers)
        data = load_detail(data)
    qs = data.get("queries", data)
    return {
        str(k): float(v)
        for k, v in qs.items()
        if isinstance(v, (int, float))
    }


def canary_mins(data) -> dict[str, float]:
    """Per-canary min over ALL recorded reps (start and end blocks)."""
    c = data.get("canary") if isinstance(data, dict) else None
    if not c:
        return {}
    mins: dict[str, float] = {}
    for block in ("start", "end"):
        for name, runs in (c.get(block, {}).get("reps") or {}).items():
            if runs:
                lo = min(runs)
                mins[name] = min(mins.get(name, lo), lo)
    return mins


def canary_factor(old_data, new_data) -> float | None:
    """Geomean of new/old canary mins over the canaries present in
    both files; None when either side lacks canary data (raw ratios
    are then used, the pre-r7 behavior)."""
    old_c, new_c = canary_mins(old_data), canary_mins(new_data)
    shared = [n for n in old_c if n in new_c and old_c[n] > 0]
    if not shared:
        return None
    prod = 1.0
    for n in shared:
        prod *= new_c[n] / old_c[n]
    return prod ** (1.0 / len(shared))


def fresh_session_mins(
    sessions_path: str, require_code: str | None = None
) -> dict[str, list[float]]:
    """Per-query min wall from each distinct fresh-JVM session recorded
    in bench_sessions.jsonl (written by tools/ab_measure.py).

    ``require_code``: when set, only sessions whose fingerprint carries
    the same code hash are admissible (ADVICE r10 #1 — a session
    measured on PRE-regression code proves nothing about the new
    plan's cost floor)."""
    import os

    by_query: dict[str, dict[tuple, float]] = {}
    if not os.path.exists(sessions_path):
        return {}
    with open(sessions_path) as fh:
        for line in fh:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            fp = rec.get("fingerprint", {})
            if require_code is not None and fp.get("code") != require_code:
                continue
            sig = (fp.get("pid"), fp.get("jvm_uptime_ms"))
            for q, runs in (rec.get("queries") or {}).items():
                if isinstance(runs, (int, float)):
                    runs = [runs]
                if not runs:
                    continue
                lo = min(float(r) for r in runs)
                cur = by_query.setdefault(q, {})
                cur[sig] = min(cur.get(sig, lo), lo)
    return {q: sorted(v.values()) for q, v in by_query.items()}


def adjudicate(
    regressions, sessions_path: str, factor: float, floor: float,
    new_code: str | None = None,
):
    """Split formal trips into (real, adjudicated) using fresh-session
    evidence — the q56 procedure (VERDICT r9) made mechanical.

    This box's spike windows span several seconds and a 336-query run
    is a lottery: r10 measured four consecutive full runs each tripping
    the 2x+1s gate on a DIFFERENT untouched query (q54 2.98s -> 0.87s
    the next run; q269 4.99 -> 1.86; q303 2.96 -> 1.77 fresh).  A trip
    is downgraded ONLY when bench_sessions.jsonl holds measurements
    from >= 2 DISTINCT fresh JVM sessions and the MIN over those
    sessions lands under the same gate line the diff uses
    ((min/old) < factor OR (min - old) < floor, raw — fresh sessions
    carry no canary).  Min, not all: bench.py's own doctrine is that
    noise on this box is strictly ADDITIVE (GC, page-cache, scheduler),
    so min estimates the plan's true cost floor — a REAL plan
    regression raises that floor, which no draw can undercut, while a
    bimodal-noise query (q303: fresh sessions 1.77s and 3.24s) still
    shows its true floor in at least one clean draw.  The evidence is
    cited in the JSON artifact, never discarded: the trip stays
    listed, marked adjudicated.

    ADVICE r10 #1: the min-floor argument only holds when the evidence
    was measured ON THE NEW PLAN — a fast session recorded before the
    regressing commit measured the OLD plan's floor and cannot waive
    the trip.  So evidence is admissible only from sessions whose
    fingerprint ``code`` equals the new detail's ``code`` stamp
    (bench.py writes both from git HEAD, dirty-marked).  A new detail
    with no code stamp disables adjudication entirely: every formal
    trip then requires a freshly stamped confirmation run.
    """
    if new_code is None:
        return list(regressions), []
    mins = fresh_session_mins(sessions_path, require_code=new_code)
    real, adjudicated = [], []
    for name, o, n, ratio in regressions:
        sess = mins.get(name, [])
        lo = min(sess) if sess else None
        ok = len(sess) >= 2 and (
            (o > 0 and lo / o < factor) or (lo - o) < floor
        )
        if ok:
            adjudicated.append((name, o, n, ratio, sess))
        else:
            real.append((name, o, n, ratio))
    return real, adjudicated


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--factor", type=float, default=2.0,
                    help="fail when new >= factor * old (default 2.0)")
    ap.add_argument("--floor", type=float, default=1.0,
                    help="ignore regressions smaller than this many "
                         "seconds of absolute growth (default 1.0)")
    ap.add_argument("--json", dest="json_out", default=None,
                    help="write the diff summary (factor, counts, "
                         "regression list, totals) to this path")
    ap.add_argument("--sessions", dest="sessions", default=None,
                    help="bench_sessions.jsonl path for trip "
                         "adjudication (default: repo root's)")
    args = ap.parse_args()

    old_data, new_data = load_detail(args.old), load_detail(args.new)
    old, new = load_queries(old_data), load_queries(new_data)
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))

    factor = canary_factor(old_data, new_data)
    norm = factor if factor and factor > 0 else 1.0
    if factor is not None:
        print(f"canary drift factor (new/old session speed): {factor:.3f} "
              f"— per-query ratios normalized by it")
    else:
        print("no canary data on one or both sides — raw ratios")

    regressions: list[tuple[str, float, float, float]] = []
    improved = 0
    for name in sorted(set(old) & set(new)):
        o, n = old[name], new[name]
        # ADVICE r7: count improvements with the SAME normalized ratio
        # the regression gate uses — under a drift factor != 1 a raw
        # n < o comparison mixes normalized regression counts with
        # unnormalized improvement counts in the summary line
        if (n / norm) < o:
            improved += 1
        # normalized ratio gates the factor; the absolute floor stays
        # raw (drift cannot conjure a full second on a sub-second query)
        if o > 0 and (n / norm) >= args.factor * o and (n - o) >= args.floor:
            regressions.append((name, o, n, (n / norm) / o))

    if added:
        print(f"new queries ({len(added)}): {', '.join(added[:10])}"
              + (" ..." if len(added) > 10 else ""))
    if removed:
        print(f"removed queries ({len(removed)}): {', '.join(removed)}")
    import os

    sessions_path = args.sessions or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "bench_sessions.jsonl",
    )
    new_code = new_data.get("code") if isinstance(new_data, dict) else None
    regressions, adjudicated = adjudicate(
        regressions, sessions_path, args.factor, args.floor,
        new_code=new_code,
    )
    if regressions or adjudicated:
        scope = new_code or "<unstamped: adjudication disabled>"
        print(f"adjudication evidence scope: code={scope}")

    print(f"compared {len(set(old) & set(new))} queries; "
          f"{improved} improved (normalized); {len(regressions)} regressed "
          f">= {args.factor}x normalized (+{args.floor}s raw floor); "
          f"{len(adjudicated)} formal trip(s) adjudicated by fresh-session "
          f"evidence")

    for name, o, n, ratio, sess in adjudicated:
        print(
            f"ADJUDICATED {name}: {o:.2f}s -> {n:.2f}s ({ratio:.1f}x "
            f"normalized) — {len(sess)} fresh-session mins "
            f"{[round(m, 2) for m in sess]}, min under the gate line"
        )
    for name, o, n, ratio in sorted(regressions, key=lambda r: -r[3]):
        print(f"REGRESSION {name}: {o:.2f}s -> {n:.2f}s "
              f"({ratio:.1f}x normalized)")

    if args.json_out:
        shared = set(old) & set(new)
        summary = {
            "old": args.old,
            "new": args.new,
            "canary_factor": factor,
            "compared": len(shared),
            "improved_normalized": improved,
            "added": added,
            "removed": removed,
            "gate": {"factor": args.factor, "floor_s": args.floor},
            "regressions": [
                {"query": name, "old_s": o, "new_s": n,
                 "ratio_normalized": ratio}
                for name, o, n, ratio in sorted(
                    regressions, key=lambda r: -r[3]
                )
            ],
            "adjudicated": [
                {"query": name, "old_s": o, "new_s": n,
                 "ratio_normalized": ratio,
                 "fresh_session_mins_s": [round(m, 3) for m in sess]}
                for name, o, n, ratio, sess in adjudicated
            ],
            "total_old_s": round(sum(old[n] for n in shared), 2),
            "total_new_s": round(sum(new[n] for n in shared), 2),
        }
        with open(args.json_out, "w") as fh:
            json.dump(summary, fh, indent=1)
            fh.write("\n")
        print(f"diff summary written: {args.json_out}")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
