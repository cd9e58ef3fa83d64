"""Dump `.explain("formatted")` for registered queries to files.

Usage:
    python tools/dump_explain.py --out plans/r12 --suffix _before.txt q313_... q76_...

Driver-side only (plans are never executed); safe to run alongside
other work.  One file per query: <out>/<name><suffix>.
"""

from __future__ import annotations

import argparse
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="plans/r12")
    ap.add_argument("--suffix", default="_before.txt")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from health_data_transformation_spark.plans.analytics import REGISTRY
    from health_data_transformation_spark.session import get_spark

    spark = get_spark(app_name="hdt-explain", cpus=4)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(os.path.join(ROOT, args.out), exist_ok=True)
    for name in args.queries:
        df = REGISTRY[name].fn(spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(ROOT, args.out, name + args.suffix)
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
