"""Per-query profiler for the optimization round (guide §1).

For each named registry query: capture ``explain("formatted")``, run
warm reps against the noop sink (computes every column, no sink cost —
guide §1.4), and pull per-job/stage shuffle metrics from the UI REST
API so the wall can be attributed to jobs/stages/exchange bytes.

Usage:
    python scripts/profile_query.py [--reps 3] [--plans-dir DIR]
        [--count] name [name ...]

Writes plans to ``<plans-dir>/<name>.txt`` when --plans-dir is given;
prints one summary line per query: warm-min, warm-median, #jobs,
#stages, #tasks, shuffle read/write bytes (of the LAST warm rep).
"""

from __future__ import annotations

import argparse
import contextlib
import gc
import io
import json
import os
import sys
import time
import urllib.request

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from c4_5decisiontreebasedonmapreduce_spark import get_spark, registry


def _rest(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.load(r)


def _jobs_since(base: str, app_id: str, t0_job_id: int):
    jobs = _rest(base, f"/api/v1/applications/{app_id}/jobs?status=succeeded")
    return [j for j in jobs if j["jobId"] > t0_job_id]


def _max_job_id(base: str, app_id: str) -> int:
    jobs = _rest(base, f"/api/v1/applications/{app_id}/jobs")
    return max((j["jobId"] for j in jobs), default=-1)


def _stage_metrics(base: str, app_id: str, stage_ids):
    sread = swrite = tasks = 0
    in_bytes = 0
    for sid in stage_ids:
        try:
            stages = _rest(base, f"/api/v1/applications/{app_id}/stages/{sid}")
        except Exception:
            continue
        for st in stages:
            if st.get("status") not in ("COMPLETE", "SKIPPED"):
                continue
            sread += st.get("shuffleReadBytes", 0)
            swrite += st.get("shuffleWriteBytes", 0)
            in_bytes += st.get("inputBytes", 0)
            tasks += st.get("numCompleteTasks", 0)
    return sread, swrite, in_bytes, tasks


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument(
        "--count", action="store_true",
        help="time .count() (the bench's action) instead of the noop sink",
    )
    ap.add_argument(
        "--plans-only", action="store_true",
        help="dump static explain('formatted') without executing",
    )
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="c45-profile",
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.range(1000).count()
    sc = spark.sparkContext
    base = sc.uiWebUrl
    app_id = sc.applicationId
    qs = registry.queries()

    for name in args.names:
        if name not in qs:
            print(f"{name}: NOT IN REGISTRY", flush=True)
            continue
        if name in ("c45_train", "level_stats"):
            registry.reset_caches()
        df = qs[name](spark, sf_dir)
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.plans_dir, f"{name}.txt"), "w") as f:
                f.write(buf.getvalue())
        if args.plans_only:
            print(f"{name}: plan dumped", flush=True)
            continue

        def run_once():
            # mirror bench._run exactly: the timer wraps the query BUILD
            # too — eager work (localCheckpoints, driver-side training /
            # connected-components loops) happens at build time and is
            # part of what the bench measures
            if name in ("c45_train", "level_stats"):
                registry.reset_caches()
            gc.collect()
            t0 = time.perf_counter()
            d = qs[name](spark, sf_dir)
            if args.count:
                d.count()
            else:
                d.write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        sc.setJobDescription(f"profile:{name}")
        run_once()  # cold
        times = []
        j0 = _max_job_id(base, app_id)
        for _ in range(args.reps):
            times.append(run_once())
        jobs = _jobs_since(base, app_id, j0)
        stage_ids = sorted({s for j in jobs for s in j.get("stageIds", [])})
        sread, swrite, in_bytes, tasks = _stage_metrics(
            base, app_id, stage_ids
        )
        times.sort()
        n_reps = max(1, args.reps)
        print(
            f"{name}: warm-min {times[0]:.3f}s med "
            f"{times[len(times) // 2]:.3f}s | jobs/rep "
            f"{len(jobs) / n_reps:.1f} stages/rep "
            f"{len(stage_ids) / n_reps:.1f} tasks/rep {tasks / n_reps:.0f} | "
            f"shufR {sread / n_reps / 1e6:.1f}MB shufW "
            f"{swrite / n_reps / 1e6:.1f}MB input "
            f"{in_bytes / n_reps / 1e6:.1f}MB (over {args.reps} reps)",
            flush=True,
        )
        sc.setJobDescription(None)

    spark.stop()


if __name__ == "__main__":
    main()
