"""Driver-coverage ledger (r4 verdict task #6): diff every committed
CORRECTNESS_r*.json against the live registry and report, per query,
which rounds the DRIVER verified it green — so each round's 50-query
prefix rotation is chosen from data, not memory.

A query counts as driver-verified in a round iff its artifact row has
rows_match & schema_match & (hash_match true OR absent-with-no-err —
the weaker rows-only check for non-SQL-expressible ops) and err null.

Usage:
  python tools/driver_ledger.py            # summary + never-verified list
  python tools/driver_ledger.py --json P   # also write machine ledger
Exit 0 always (informational; the rotation test enforces policy).
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
    stale = sorted(
        ((max(r), n) for n, r in verified.items()), key=lambda t: (t[0], t[1])
    )[:15]
    print("\noldest driver evidence (round, query):")
    for rnd, name in stale:
        print(f"  r{rnd}: {name}")
    if json_out:
        Path(json_out).write_text(
            json.dumps(
                {"rounds_verified": ledger, "never": never},
                indent=1,
                sort_keys=True,
            )
        )
        print(f"\nwrote {json_out}")


if __name__ == "__main__":
    main()
