#!/usr/bin/env python
"""Capture .explain("formatted") for registered queries into plans/<tag>/.

Usage:
    python scripts/capture_plans.py <suffix> [query ...]

Writes plans/r13/<query>_<suffix>.txt for each named query (default: the
bench headliners). The suffix is normally "before" or "after". Plans are
captured from a fresh session at $SPARK_GRAFT_SF_DIR (default sf0.1) —
the same surface the bench times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
)


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    from bench import HEADLINE
    from collector_spark import registry
    from collector_spark.session import get_spark

    registry.load_all()
    names = sys.argv[2:] or [n for n in HEADLINE if n in registry.REGISTRY]
    spark = get_spark("collector_spark_plan_capture")
    registry.prepare(spark, SF_DIR)
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        q = registry.REGISTRY[name]
        df = q.spark_fn(spark)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
