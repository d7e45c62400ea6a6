"""Operator-level scaling diagnostics.

Runs the flagship at a given num_cpus and reports per-operator remote
wall/cpu totals parsed from ``ds.stats()``.  Used to corroborate the
scaling-pair interpretation in BASELINE.md: if the same task set costs
materially more REMOTE CPU time at higher concurrency, the wall-clock
gap is hardware contention (vCPU oversubscription / memory bandwidth),
not scheduler queueing — queueing would instead show operator wall
time far above (remote total / num_cpus).

Usage: python tools/opmetrics.py <num_cpus> [replicate]
Prints one JSON line: {num_cpus, pages, wall_s, operators: [{name,
wall_total_s, cpu_total_s}], sum_cpu_s}.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_stats(stats: str):
    """Extract per-operator total remote wall/cpu seconds from the
    ds.stats() text block."""
    ops = []
    cur = None
    for line in stats.splitlines():
        m = re.match(r"Operator (\d+) (.+?): \d+ tasks executed", line)
        if m:
            cur = {"name": m.group(2)[:70], "wall_total_s": None, "cpu_total_s": None}
            ops.append(cur)
            continue
        if cur is None:
            continue
        for key, field in (("Remote wall time", "wall_total_s"),
                           ("Remote cpu time", "cpu_total_s")):
            if key in line:
                t = re.search(r"([\d.]+)(us|ms|s|min) total", line)
                if t:
                    val = float(t.group(1))
                    unit = t.group(2)
                    if unit == "us":
                        val /= 1_000_000.0
                    elif unit == "ms":
                        val /= 1000.0
                    elif unit == "min":
                        val *= 60.0
                    cur[field] = round(val, 3)
    return ops


def main():
    ncpu = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else int(
        os.environ.get("GRAFT_BENCH_REPLICATE", "256"))
    sf = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    from filda_ray.pipelines.flagship import detect_pipeline

    t0 = time.time()
    det = detect_pipeline(sf, replicate=replicate, materialize_narrow=False)
    mat = det.materialize()  # execute + retain stats for the full chain
    n = mat.count()
    wall = round(time.time() - t0, 2)
    ops = parse_stats(mat.stats())
    out = {
        "num_cpus": ncpu,
        "replicate": replicate,
        "pages": int(n),
        "wall_s": wall,
        "operators": ops,
        "sum_cpu_s": round(sum(o["cpu_total_s"] or 0 for o in ops), 1),
        "sum_wall_s": round(sum(o["wall_total_s"] or 0 for o in ops), 1),
    }
    ray.shutdown()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
