#!/usr/bin/env python3
"""Capture .explain("formatted") for bench queries into plans/<round>/ (default r14; override with $SPARK_GRAFT_PLANS_ROUND).

Usage: python tools/capture_plans.py <suffix> [query ...]
  suffix: 'before' or 'after' (file name suffix)
  query:  optional subset; default = every bench.py query.

Plans are captured at $SPARK_GRAFT_SF_DIR (default sf0.1) with the same
session config as bench.py, so Exchange counts / join strategies /
PushedFilters in the committed files match what the bench actually ran.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    from bench import BENCH_QUERIES
    from gfe_db_spark.queries import all_queries
    from gfe_db_spark.session import get_spark

    names = sys.argv[2:] or list(BENCH_QUERIES)
    spark = get_spark("gfe_db_spark_plans")
    specs = all_queries()
    out_dir = Path(_REPO) / "plans" / os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14")
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        if name not in specs:
            print(f"skip {name}: not registered")
            continue
        try:
            df = specs[name].fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # capture the failure instead of dying
            plan = f"ERROR capturing plan: {exc!r}"
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
