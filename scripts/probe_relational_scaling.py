"""Scaling probe for the relational + statistics headline: wall time as
the fact tables multiply.

Builds K-times-multiplied copies of lineitem / orders / events under a
scratch sf_dir (key columns offset per copy so joins and groupings stay
well-formed: copy i shifts orderkeys by i*100M and event users by i*1M;
dimension tables are symlinked verbatim). This extends the c45_train 10×
probe (SURVEY §7) and the dedup probe (`probe_dedup_scaling.py`) to the
query surface the judge benchmarks: aggregation (q1), multi-joins
(q3/q5), windows (window_funcs), sessionization, event windows, and the
two statistics pipelines (level_stats, numeric_best_split).

Per query and K: one cold run then WARM_REPS warm runs; the JSON line
records cold, warm minimum, and result rows — warm-min is the
load-spike-resistant number (`BASELINE.md` methodology).

Usage: python scripts/probe_relational_scaling.py [K ...]  (default 1 3 10)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from c4_5decisiontreebasedonmapreduce_spark import get_spark, registry  # noqa: E402
from c4_5decisiontreebasedonmapreduce_spark.sources.parquet import (  # noqa: E402
    load_table,
)

PROBE_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q18_large_volume",
    "q4_order_priority",
    "q10_returned_items",
    "agg_grouping_sets",
    "window_funcs",
    "event_windows",
    "sessionize",
    "level_stats",
    "numeric_best_split",
    "merge_cdc",
    # round-9 TPC-H shapes: the K-multiplied fact tables are exactly
    # what they stress (q21's semi/anti self-joins stay per-order-key
    # local because copies carry disjoint orderkeys; q16/q2's pair
    # aggregates grow with lineitem; q22's anti-join probes K× orders)
    "q12_priority_class",
    "q14_promo_revenue",
    "q16_supplier_cnt",
    "q19_disjunctive_revenue",
    "q21_sole_returner",
    "q22_dormant_customers",
    "q7_volume_shipping",
    "q2_min_cost_supplier",
    "q13_customer_distribution",
    "q17_small_qty_revenue",
    "q11_important_stock",
    "q15_top_supplier",
    # round-11 (r10 VERDICT #6): the full training loop at K — the
    # model must be IDENTICAL to K=1 (counts scale uniformly, so every
    # gain ratio is unchanged; pinned in tests/test_round11_ops.py) and
    # the wall sub-linear (one exchange per level regardless of K)
    "c45_train",
]

WARM_REPS = 2

# (table, [(key column, per-copy offset)]) — offsets keep copies disjoint
# where the workload should GROW (orders, lineitems, users) and shared
# where it should not (custkeys: a customer simply owns K× orders)
_MULTIPLIED = {
    "lineitem": [("l_orderkey", 100_000_000)],
    "orders": [("o_orderkey", 100_000_000)],
    "events": [("event_id", 100_000_000), ("user_id", 1_000_000)],
}
_VERBATIM = [
    "region", "nation", "customer", "supplier", "part",
    "documents", "embeddings",
]


def build_multiplied(spark, sf_dir: str, k: int, out_dir: str) -> None:
    for name, keys in _MULTIPLIED.items():
        d = load_table(spark, sf_dir, name)
        cols = d.columns
        parts = [d]
        for i in range(1, k):
            p = d
            for col, off in keys:
                p = p.withColumn(col, F.col(col) + F.lit(i * off))
            parts.append(p.select(cols))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
    for name in _VERBATIM:
        os.symlink(
            os.path.abspath(f"{sf_dir}/{name}.parquet"),
            os.path.join(out_dir, f"{name}.parquet"),
        )


def probe(spark, sf_dir: str, k: int) -> dict:
    tmp = tempfile.mkdtemp(prefix=f"rel_probe_x{k}_")
    try:
        build_multiplied(spark, sf_dir, k, tmp)
        rec: dict = {"k": k}
        rec["lineitem_rows"] = load_table(spark, tmp, "lineitem").count()
        rec["event_rows"] = load_table(spark, tmp, "events").count()
        qs = registry.queries()
        # $SPARK_GRAFT_PROBE_QUERIES (comma-separated) subsets the list —
        # the K=100 runs probe the judge-named core without paying the
        # full 25-query wall at 100x data
        subset = os.environ.get("SPARK_GRAFT_PROBE_QUERIES", "")
        tracked = (
            [n for n in subset.split(",") if n] if subset else PROBE_QUERIES
        )
        for name in tracked:
            times = []
            for rep in range(1 + WARM_REPS):
                registry.reset_caches()
                t0 = time.perf_counter()
                n = qs[name](spark, tmp).count()
                times.append(time.perf_counter() - t0)
            rec[f"{name}_rows"] = n
            rec[f"{name}_cold_sec"] = round(times[0], 2)
            rec[f"{name}_warm_sec"] = round(min(times[1:]), 2)
        return rec
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ks = [int(a) for a in sys.argv[1:]] or [1, 3, 10]
    spark = get_spark(app_name="relational-scaling-probe")
    spark.range(1000).count()
    for k in ks:
        print(json.dumps({"sf_dir": sf_dir, **probe(spark, sf_dir, k)}))
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
