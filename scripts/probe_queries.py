#!/usr/bin/env python
"""Time registered queries via the bench protocol (noop sink, N runs each)
in ONE fresh session; print one JSON line with all runs + loadavg. Used for
interleaved tree A/Bs of focused query lists (copy this file into the
other tree's worktree — it is measurement tooling, not query code).

Usage: python scripts/probe_queries.py q1,q2,... [n_runs]
Special name: pipeline_export_corpus (the unregistered export ACTION,
timed exactly as bench.py times it)."""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    names = sys.argv[1].split(",")
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    with open("/proc/loadavg") as f:
        la0 = f.read().split()[:3]

    from collector_spark import registry
    from collector_spark.session import get_spark

    registry.load_all()
    spark = get_spark("collector_spark_probe")
    registry.prepare(spark, SF_DIR)
    spark.table("lineitem").limit(1000).write.mode("overwrite").format("noop").save()
    spark.sql("CACHE TABLE log_raw")
    spark.table("log_raw").write.mode("overwrite").format("noop").save()

    out: dict[str, list[float]] = {}
    for name in names:
        runs: list[float] = []
        for _ in range(n_runs):
            if name == "pipeline_export_corpus":
                from collector_spark.ml.export import export_corpus

                out_dir = tempfile.mkdtemp(prefix="probe_export_")
                try:
                    t0 = time.perf_counter()
                    export_corpus(spark, out_dir).write.mode("overwrite").format(
                        "noop"
                    ).save()
                    runs.append(round(time.perf_counter() - t0, 3))
                finally:
                    shutil.rmtree(out_dir, ignore_errors=True)
            else:
                q = registry.REGISTRY[name]
                t0 = time.perf_counter()
                q.spark_fn(spark).write.mode("overwrite").format("noop").save()
                runs.append(round(time.perf_counter() - t0, 3))
        out[name] = runs
    with open("/proc/loadavg") as f:
        la1 = f.read().split()[:3]
    print(
        json.dumps(
            {"queries": out, "loadavg_start": la0, "loadavg_end": la1}
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
