#!/usr/bin/env python
"""Identical-code A/B across two git trees — the attribution standard
BENCH_VARIANCE.md established for telling machine epoch from code
regression (r07: d22, s02).

For each named registry entry, measure tree A and tree B ALTERNATELY in
fresh sessions (one subprocess each), so a session-phase or epoch shift
lands on both trees symmetrically.  A code regression shows as tree B
consistently slower than tree A; an epoch shift elevates both equally.

Usage:
    git worktree add /tmp/r06tree <sha>   # once
    python scripts/ab_trees.py /tmp/r06tree /root/repo q1 q2 ... [--iters 4]

Prints per-query medians for both trees and the B/A ratio.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

PAYLOAD = r"""
import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, ".")
from spj_query_engine_spark.session import get_spark
from spj_query_engine_spark.workload import REGISTRY

name = sys.argv[1]
spark = get_spark(app_name="ab", master="local[32]", shuffle_partitions=32)
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
fn = REGISTRY[name].fn
runs = []
for i in range(3):
    t0 = time.time()
    fn(spark, sf).write.format("noop").mode("overwrite").save()
    runs.append(round(time.time() - t0, 3))
    spark.catalog.clearCache()
    gc.collect()
print(
    "ABRESULT "
    + json.dumps(
        {"name": name, "runs": runs, "med": round(statistics.median(runs[1:]), 3)}
    )
)
"""


def measure(tree: str, name: str) -> dict | None:
    env = dict(os.environ)
    env["PYTHONPATH"] = tree
    r = subprocess.run(
        [sys.executable, "-c", PAYLOAD, name],
        cwd=tree,
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    for line in r.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    print(f"  !! {tree} {name} produced no result\n{r.stderr[-1500:]}",
          file=sys.stderr)
    return None


def main() -> None:
    import argparse

    # argparse (not a hand-rolled startswith scan): space-separated
    # `--iters 4` previously left the bare `4` in the positional list, so
    # every iteration also ran a doomed subprocess for a "query" named 4.
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("tree_a")
    ap.add_argument("tree_b")
    ap.add_argument("names", nargs="+")
    ap.add_argument("--iters", type=int, default=4)
    ns = ap.parse_args()
    tree_a, tree_b, names, iters = ns.tree_a, ns.tree_b, ns.names, ns.iters
    out: dict[str, dict] = {}
    for name in names:
        meds = {"a": [], "b": []}
        for i in range(iters):
            # alternate which tree goes first: with a monotone machine
            # drift (observed live in r08: both trees degraded 8x in
            # lockstep over 3 iterations) a fixed order makes the
            # second-place tree look slower than it is
            order = (("a", tree_a), ("b", tree_b))
            if i % 2:
                order = order[::-1]
            for key, tree in order:
                res = measure(tree, name)
                if res:
                    meds[key].append(res["med"])
                    print(f"  iter {i} {key}={tree.split('/')[-1]} {name}: "
                          f"runs {res['runs']} med {res['med']}", flush=True)
        med_a = statistics.median(meds["a"]) if meds["a"] else None
        med_b = statistics.median(meds["b"]) if meds["b"] else None
        out[name] = {
            "tree_a": tree_a, "meds_a": meds["a"], "med_a": med_a,
            "tree_b": tree_b, "meds_b": meds["b"], "med_b": med_b,
            "b_over_a": round(med_b / med_a, 3) if med_a and med_b else None,
        }
        print(f"{name}: A med {med_a} vs B med {med_b} "
              f"(B/A {out[name]['b_over_a']})", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
