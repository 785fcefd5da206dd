"""Plain-session per-query prober: bench.py's exact action (build +
count) and warm-min methodology WITHOUT the profiler's UI listener.

scripts/profile_query.py enables spark.ui for REST attribution; that
listener measurably inflates queries that build relations from a
driver-side thread pool (contamination_audit read 2-3x its bench wall
with the UI on — see OPTIMIZATION_r12.md "methodology caveat"). Use
this prober when the question is "what will bench.py read", and the
profiler only when job/stage/byte attribution is worth the skew.

Usage: python scripts/bench_probe.py [--reps N] name [name ...]
"""

from __future__ import annotations

import argparse
import gc
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from c4_5decisiontreebasedonmapreduce_spark import get_spark, registry


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="c45-bench-probe")
    spark.range(1000).count()
    qs = registry.queries()

    for name in args.names:
        if name not in qs:
            print(f"{name}: NOT IN REGISTRY", flush=True)
            continue

        def run_once() -> float:
            if name in ("c45_train", "level_stats"):
                registry.reset_caches()
            gc.collect()
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            return time.perf_counter() - t0

        run_once()  # cold
        times = sorted(run_once() for _ in range(args.reps))
        print(
            f"{name}: warm-min {times[0]:.3f}s med "
            f"{times[len(times) // 2]:.3f}s max {times[-1]:.3f}s",
            flush=True,
        )

    spark.stop()


if __name__ == "__main__":
    main()
