"""Per-query profiler for optimization work: times registry queries in
the bench's warm-isolated mode (caches drained first) and reports
job/stage counts, task time, shuffle bytes and the slowest stages from
the Spark UI REST API — the measurement loop of guide §1.

Usage:
    python tools/profile_query.py q_name [q_name ...] [--repeat N]
    python tools/profile_query.py --top 20          # slowest from BENCH_DETAIL.json

Prints one line per query: wall seconds, #jobs, #stages, #tasks, task
time, shuffle read/write MB, and the 5 slowest stages with their names.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bamboo_spark import queries as _q
from bamboo_spark.operators import release_caches
from bamboo_spark.session import get_spark


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path) as r:
        return json.load(r)


def profile(names, sf_dir, repeat=1):
    spark = get_spark("bamboo_profile", ui=True)
    registry = _q._queries_raw()
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = "%s/api/v1/applications/%s" % (ui, app_id)

    # warmup (same as bench.py): absorb process-global JVM costs
    for wq in ("q1_pricing_summary", "simhash_signatures", "pack_chunks"):
        try:
            registry[wq](spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception:
            pass
    release_caches()

    results = {}
    for name in names:
        best = None
        for _ in range(repeat):
            release_caches()
            jobs_before = {j["jobId"] for j in _api(base, "/jobs")}
            stages_before = {
                (s["stageId"], s["attemptId"]) for s in _api(base, "/stages")
            }
            spark.sparkContext.setJobDescription("profile:" + name)
            t0 = time.perf_counter()
            df = registry[name](spark, sf_dir)
            t_build = time.perf_counter() - t0
            df.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
            jobs = [j for j in _api(base, "/jobs") if j["jobId"] not in jobs_before]
            stages = [
                s
                for s in _api(base, "/stages")
                if (s["stageId"], s["attemptId"]) not in stages_before
            ]
            n_tasks = sum(s.get("numCompleteTasks", 0) for s in stages)
            task_ms = sum(s.get("executorRunTime", 0) for s in stages)
            sh_r = sum(s.get("shuffleReadBytes", 0) for s in stages)
            sh_w = sum(s.get("shuffleWriteBytes", 0) for s in stages)
            slowest = sorted(
                stages,
                key=lambda s: -(
                    s.get("completionTime") is not None
                    and s.get("executorRunTime", 0)
                    or 0
                ),
            )[:6]
            rec = {
                "wall_s": round(wall, 2),
                "build_s": round(t_build, 2),
                "jobs": len(jobs),
                "stages": len(stages),
                "tasks": n_tasks,
                "task_time_s": round(task_ms / 1000.0, 1),
                "shuffle_read_mb": round(sh_r / 1e6, 1),
                "shuffle_write_mb": round(sh_w / 1e6, 1),
                "slow_stages": [
                    (
                        round(s.get("executorRunTime", 0) / 1000.0, 1),
                        s.get("numCompleteTasks", 0),
                        (s.get("description") or s.get("name", ""))[:90],
                    )
                    for s in slowest
                ],
            }
            if best is None or rec["wall_s"] < best["wall_s"]:
                best = rec
        results[name] = best
        print(
            "%-32s wall=%6.2fs build=%5.2fs jobs=%3d stages=%4d tasks=%5d "
            "taskT=%7.1fs shR=%7.1fMB shW=%7.1fMB"
            % (
                name,
                best["wall_s"],
                best["build_s"],
                best["jobs"],
                best["stages"],
                best["tasks"],
                best["task_time_s"],
                best["shuffle_read_mb"],
                best["shuffle_write_mb"],
            ),
            flush=True,
        )
        for st in best["slow_stages"]:
            print("      stage %6.1fs tasks=%-4d %s" % st, flush=True)
    release_caches()
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = list(args.names)
    if args.top:
        detail = json.load(
            open(os.path.join(os.path.dirname(__file__), "..", "BENCH_DETAIL.json"))
        )
        ranked = sorted(detail["queries"].items(), key=lambda kv: -kv[1])
        names += [k for k, _ in ranked[: args.top] if k not in names]
    res = profile(names, sf_dir, repeat=args.repeat)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(res, fh, indent=1)


if __name__ == "__main__":
    main()
