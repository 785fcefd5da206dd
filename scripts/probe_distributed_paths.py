"""Wall-time probe for the FORCED-DISTRIBUTED fallback paths (VERDICT r6
item 5). The size-guarded driver-side shortcuts — the Arrow contingency
collect in c45_train (`tree.py::_driver_level_stats`, guarded by
`driver_stats_max_rows`) and the union-find in dedup_cluster (guarded by
`driver_max_edges`) — have pytest-pinned EQUIVALENT distributed paths;
this probe records what those distributed paths actually COST at the
bench scale factor, so the 100 TB execution path's wall time is a
recorded artifact (BASELINE.md), not only an equivalence test.

Usage: python scripts/probe_distributed_paths.py [sf_dir]
Prints one JSON line; per-path lines go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from c4_5decisiontreebasedonmapreduce_spark import get_spark  # noqa: E402
from c4_5decisiontreebasedonmapreduce_spark.operators import (  # noqa: E402
    dedup as D,
)
from c4_5decisiontreebasedonmapreduce_spark.operators import (  # noqa: E402
    tree as Tr,
)
from c4_5decisiontreebasedonmapreduce_spark.operators.training import (  # noqa: E402
    LINEITEM_TRAINING_SCHEMA,
    lineitem_training,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark(app_name="probe-distributed-paths")
    spark.range(1000).count()  # JVM warm-up

    out: dict = {"sf_dir": sf_dir}
    df = lineitem_training(spark, sf_dir)
    df.count()  # warm the scan so both variants start equal

    for label, kw in (
        ("driver", {}),
        ("distributed", {"driver_stats_max_rows": 0}),
    ):
        t0 = time.perf_counter()
        model = Tr.train(
            df, LINEITEM_TRAINING_SCHEMA, max_depth=4, min_rows=50, **kw
        )
        dt = round(time.perf_counter() - t0, 3)
        out[f"c45_train_{label}_sec"] = dt
        out[f"c45_train_{label}_rules"] = len(model.rules)
        print(f"# c45_train[{label}]: {dt}s, {len(model.rules)} rules",
              file=sys.stderr)

    for label, kw in (
        ("driver", {}),
        ("distributed", {"driver_max_edges": 0}),
    ):
        t0 = time.perf_counter()
        n = D.dedup_cluster(spark, sf_dir, **kw).count()
        dt = round(time.perf_counter() - t0, 3)
        out[f"dedup_cluster_{label}_sec"] = dt
        out[f"dedup_cluster_{label}_rows"] = n
        print(f"# dedup_cluster[{label}]: {dt}s, {n} rows", file=sys.stderr)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
