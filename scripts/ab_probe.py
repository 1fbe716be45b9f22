#!/usr/bin/env python
"""Interleaved A/B timing probe — noise-resistant measurement on a shared
host. Alternates noop-sink executions of named DataFrame builders inside ONE
session so external load drift hits all variants equally; reports per-variant
all runs, min and median, plus /proc/loadavg before and after.

Usage (import from a driver snippet):

    from scripts.ab_probe import probe
    probe(spark, {"old": lambda: old_df(spark), "new": lambda: new_df(spark)},
          rounds=5)

Only ever used for measurement — never part of a query path.
"""

from __future__ import annotations

import time


def _loadavg() -> str:
    with open("/proc/loadavg") as f:
        return f.read().split()[0:3].__repr__()


def probe(spark, builders: dict, rounds: int = 5, warmup: bool = True) -> dict:
    print(f"loadavg before: {_loadavg()}")
    times: dict[str, list[float]] = {n: [] for n in builders}
    if warmup:
        for name, build in builders.items():
            spark.sparkContext.setJobDescription(f"warmup:{name}")
            build().write.mode("overwrite").format("noop").save()
    for r in range(rounds):
        for name, build in builders.items():
            spark.sparkContext.setJobDescription(f"probe:{name}:r{r}")
            t0 = time.perf_counter()
            build().write.mode("overwrite").format("noop").save()
            times[name].append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    out = {}
    for name, ts in times.items():
        s = sorted(ts)
        out[name] = {
            "min": round(s[0], 3),
            "med": round(s[len(s) // 2], 3),
            "all": [round(t, 3) for t in ts],
        }
        print(f"{name}: min={out[name]['min']} med={out[name]['med']} all={out[name]['all']}")
    print(f"loadavg after: {_loadavg()}")
    return out
