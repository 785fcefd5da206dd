"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from c4_5decisiontreebasedonmapreduce_spark import get_spark, registry

# headline set: the reference-derived hot path + relational surface +
# LLM-pipeline extension ops
BENCH_QUERIES = [
    # C4.5 statistics/training (the reference's entire computation)
    "scan_training",
    "groupby_contingency_numeric",
    "gain_ratio",
    "numeric_best_split",
    "level_stats",
    "argmax_per_group",
    "c45_train",
    "c45_predict",
    # relational surface
    "q1_pricing_summary",
    "q3_shipping_priority",
    "join_broadcast",
    "window_funcs",
    "asof_join",
    "event_windows",
    "sessionize",
    # LLM-pipeline extensions
    "tokenize",
    "tfidf",
    "dedup_exact",
    "dedup_minhash",
    "similarity_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1
    spark = get_spark(app_name="c45-bench")
    spark.range(1000).count()  # JVM warm-up, exclude startup from timings

    qs = registry.queries()
    times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        if name not in qs:
            continue
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        n = df.count()
        times[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {times[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
