"""Dump .explain('formatted') for a set of registry queries to files.

Usage: python tools/plan_dump.py --out plans/r14 --suffix _before [names...]
Default name set: the bench HEADLINE list. Pure plan construction only —
no checksum action is run (impure builders still pay their build-time
side effects, as they would under the driver).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="plans/r14")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from big_data_science_project_spark.session import get_spark
    spark = get_spark("plan_dump")
    import __spark_entry__ as entry
    from bench import HEADLINE
    queries = entry.queries()
    names = args.names or list(HEADLINE)
    os.makedirs(args.out, exist_ok=True)
    for name in names:
        try:
            df = queries[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # noqa: BLE001 — record, keep dumping
            plan = f"ERROR: {type(e).__name__}: {e}"
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan)} chars -> {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
