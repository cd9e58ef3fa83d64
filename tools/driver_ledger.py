"""Driver-coverage ledger (r4 verdict task #6): diff every committed
CORRECTNESS_r*.json against the live registry and report, per query,
which rounds the DRIVER verified it green — so each round's 50-query
prefix rotation is chosen from data, not memory.

A query counts as driver-verified in a round iff its artifact row has
rows_match & schema_match & (hash_match true OR absent-with-no-err —
the weaker rows-only check for non-SQL-expressible ops) and err null.

Usage:
  python tools/driver_ledger.py            # summary + never-verified list
  python tools/driver_ledger.py --stale    # + full rotation order (the
                                           #   prefix builder's input once
                                           #   never-count is 0)
  python tools/driver_ledger.py --json P   # also write machine ledger
Exit 1 iff the q169 prefix-pin assertion fails (round_gate gates on it).
"""

from __future__ import annotations

import glob
import json
import re
import sys
from pathlib import Path

ROOT = Path("/root/repo")


def round_of(path: str) -> int:
    m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
    return int(m.group(1)) if m else -1


def green(row: dict) -> bool:
    if row.get("err"):
        return False
    if not row.get("rows_match") or not row.get("schema_match"):
        return False
    hm = row.get("hash_match")
    return hm is not False  # None => rows-only check, still a pass


def slot_justified(name: str, ledger: dict[str, list[int]]) -> bool:
    """Prefix-slot justification, POST-ROUND STABLE (VERDICT r10 wrong #1).

    A rotation slot is legitimate iff, under EITHER ledger view, it is
    never-verified, first-verified-by-the-newest-round, or stale-tier
    (latest evidence within one round of the global oldest tier):

      view 1: the full committed ledger — this is the as-built state
              MID-ROUND (the prefix for round R is constructed against
              CORRECTNESS_{<=R-1}, which is all that exists then);
      view 2: the ledger EXCLUDING the newest committed round — this is
              the as-built state POST-ROUND, after the round-R driver
              artifact lands on top of the round-R prefix.

    The r10 failure mode: q15 was rotated in as r2-stale, the driver
    verified it in r10, and the single-view derivation then saw
    evidence [2, 10] — neither first-verified-here nor stale.  View 2
    strips the r10 row and recovers the state the rotation was chosen
    against.  A genuinely unjustified slot (e.g. mid-tier evidence
    [5, 10] when the oldest tier is r2) fails BOTH views.
    """

    def _view_ok(view: dict[str, list[int]], latest: int) -> bool:
        mine = view.get(name) or []
        if not mine:
            return True  # never-verified as of this view
        oldest = min((min(rs) for rs in view.values() if rs), default=0)
        return min(mine) == latest or max(mine) <= oldest + 1

    newest = max((r for rs in ledger.values() for r in rs), default=0)
    stripped = {
        n: [r for r in rs if r != newest] for n, rs in ledger.items()
    }
    # View 2's first-verified anchor is newest-1 (the committed round the
    # prefix was built against), NOT the stripped view's own max — using
    # the max would retro-justify any slot first verified in some old
    # round as soon as newer evidence is stripped.
    return _view_ok(ledger, newest) or _view_ok(stripped, newest - 1)


def build_ledger() -> dict[str, list[int]]:
    sys.path.insert(0, str(ROOT))
    import __spark_entry__ as e

    registry = list(e.queries().keys())
    ledger: dict[str, list[int]] = {name: [] for name in registry}
    for path in sorted(glob.glob(str(ROOT / "CORRECTNESS_r*.json"))):
        rnd = round_of(path)
        if rnd < 0:
            continue
        data = json.loads(Path(path).read_text())
        rows = data.get("queries", data)  # tolerate either artifact shape
        for name, row in rows.items():
            if name in ledger and isinstance(row, dict) and green(row):
                ledger[name].append(rnd)
    return ledger


def main() -> None:
    json_out = None
    if "--json" in sys.argv:
        json_out = sys.argv[sys.argv.index("--json") + 1]
    ledger = build_ledger()
    never = sorted(n for n, rounds in ledger.items() if not rounds)
    verified = {n: r for n, r in ledger.items() if r}
    print(
        f"registry: {len(ledger)} queries; driver-verified at least "
        f"once: {len(verified)}; NEVER driver-verified: {len(never)}"
    )
    for name in never:
        print(f"  never: {name}")
    # VERDICT r9 task #6: staleness rotation.  The full rotation order
    # (never-verified first, then oldest-evidence ascending) is what
    # each round's prefix builder consumes after never-count reaches 0,
    # so every entry's driver proof stays <= ~5 rounds old (49
    # rotating slots / ~330 entries ~= 7 rounds full cycle; the 50th
    # slot is the q169 pin).
    stale_all = sorted(
        ((max(r), n) for n, r in verified.items()), key=lambda t: (t[0], t[1])
    )
    newest = max((max(r) for r in verified.values()), default=0)
    if stale_all:
        oldest_rnd = stale_all[0][0]
        n_oldest = sum(1 for rnd, _ in stale_all if rnd == oldest_rnd)
        print(
            f"\nmax staleness: r{oldest_rnd} "
            f"({newest - oldest_rnd} rounds behind r{newest}; "
            f"{n_oldest} queries at that age)"
        )
    print("oldest driver evidence (round, query):")
    for rnd, name in stale_all[:15]:
        print(f"  r{rnd}: {name}")
    if "--stale" in sys.argv:
        print("\nrotation order (never first, then oldest evidence):")
        for name in never:
            print(f"  never {name}")
        for rnd, name in stale_all:
            print(f"  r{rnd}    {name}")
    if json_out:
        Path(json_out).write_text(
            json.dumps(
                {"rounds_verified": ledger, "never": never},
                indent=1,
                sort_keys=True,
            )
        )
        print(f"\nwrote {json_out}")

    # VERDICT r5 task #3: COVERAGE.md's header count is GENERATED
    # evidence, not prose — assert it equals the live registry size and
    # that every registry entry is mentioned (by its qNNN prefix) in at
    # least one COVERAGE row.  round_gate fails on this exit code.
    cov = (ROOT / "COVERAGE.md").read_text()
    m = re.search(r"All (\d+) registered queries", cov)
    if not m or int(m.group(1)) != len(ledger):
        print(
            f"LEDGER FAIL: COVERAGE.md header says "
            f"{m.group(1) if m else '<missing>'} queries, registry has "
            f"{len(ledger)} — regenerate the header"
        )
        sys.exit(1)
    mentioned = set(re.findall(r"\bq\d+[ab]?", cov))
    unmentioned = sorted(
        n for n in ledger if re.match(r"(q\d+[ab]?)", n).group(1) not in mentioned
    )
    if unmentioned:
        print(f"LEDGER FAIL: registry queries with no COVERAGE.md row: {unmentioned}")
        sys.exit(1)
    print(f"coverage ok: header count {len(ledger)}, all registry queries mentioned")

    # VERDICT r5 task #6: the S4-S8 ingest anchor must be PINNED in the
    # driver's 50-query prefix every round — an assertion, not a
    # convention.  round_gate fails on this exit code.
    import __spark_entry__ as e

    prefix = list(e.queries().keys())[:50]
    if "q169_ingest_lifecycle" not in prefix:
        print("LEDGER FAIL: q169_ingest_lifecycle not pinned in the 50-query prefix")
        sys.exit(1)
    print("prefix pin ok: q169_ingest_lifecycle in driver prefix")


if __name__ == "__main__":
    main()
