"""Capture `.explain("formatted")` for declared queries into text files.

Usage:
    python tools/capture_plans.py <out_dir> <suffix> [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each named query (default: the
bench HEADLINE list).  Pure plan capture — no actions are executed, so
it is safe to run alongside other work; plans show the AQE initial
plan (isFinalPlan=false), which is what the optimizer rules shape.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as E
    from juliadb_jl_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark("capture_plans", cpus=cpus, shuffle_partitions=cpus)
    qs = E.queries()
    if not names:
        from bench import HEADLINE
        names = list(HEADLINE)
    for name in names:
        fn = qs[name]
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange)")


if __name__ == "__main__":
    main()
