#!/usr/bin/env python
"""Interleaved same-host A/B of two TREES (VERDICT r12 item 1).

Runs bench.py from each tree in alternating order (ABBA ABBA ...), each in a
fresh subprocess, recording /proc/loadavg before and after every run.  The
comparison statistic is the per-side MIN over the shared query set (min is
robust against one-sided contention noise on this shared host).

Usage: python scripts/ab_trees.py <treeA> <treeB> <n_pairs> <out.json>
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def loadavg() -> str:
    with open("/proc/loadavg") as f:
        return f.read().split()[0:3].__repr__()


def run_bench(tree: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.1"
    env["SPARK_GRAFT_CPUS"] = "32"
    la0 = loadavg()
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=tree,
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    wall = time.time() - t0
    la1 = loadavg()
    line = ""
    for ln in p.stdout.splitlines():
        if ln.startswith("{"):
            line = ln
    parsed = json.loads(line) if line else {}
    return {
        "tree": tree,
        "rc": p.returncode,
        "wall": round(wall, 1),
        "loadavg_start": la0,
        "loadavg_end": la1,
        "queries": parsed.get("queries", {}),
    }


def main() -> int:
    tree_a, tree_b, n_pairs, out_path = (
        sys.argv[1],
        sys.argv[2],
        int(sys.argv[3]),
        sys.argv[4],
    )
    runs: list[dict] = []
    # ABBA ordering so slow drift hits both sides symmetrically
    order: list[str] = []
    for i in range(n_pairs):
        order += [tree_a, tree_b] if i % 2 == 0 else [tree_b, tree_a]
    for i, tree in enumerate(order):
        r = run_bench(tree)
        runs.append(r)
        with open(out_path, "w") as f:
            json.dump(runs, f, indent=1)
        print(
            f"[{i + 1}/{len(order)}] {os.path.basename(tree)} rc={r['rc']} "
            f"wall={r['wall']} load {r['loadavg_start']}->{r['loadavg_end']}",
            flush=True,
        )

    # summarize: per-side min over the shared query set
    sides: dict[str, list[dict]] = {}
    for r in runs:
        if r["rc"] == 0 and r["queries"]:
            sides.setdefault(r["tree"], []).append(r["queries"])
    if len(sides) == 2:
        qsets = [set(q for qs in v for q in qs) for v in sides.values()]
        shared = sorted(qsets[0] & qsets[1])
        summary = {"shared_n": len(shared), "per_side": {}}
        for tree, qlist in sides.items():
            per_q = {
                q: min(qs[q] for qs in qlist if q in qs) for q in shared
            }
            summary["per_side"][tree] = {
                "min_total_shared": round(sum(per_q.values()), 2),
                "per_query_min": per_q,
            }
        with open(out_path, "w") as f:
            json.dump({"runs": runs, "summary": summary}, f, indent=1)
        print(json.dumps({k: v["min_total_shared"] for k, v in summary["per_side"].items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
