"""Scaling probe for the fractional-routing trainer: wall time and
routed-row growth as the null fraction rises.

The fractional router explodes ONLY rows whose split attribute is null
(each fans out to the split's children); everything else is a
projection. So wall time should track the standard trainer's with a
margin that grows with the null fraction — not with corpus size — and
the level-1 routed-row count should be
    rows + nulls_on_split_attr × (children − 1).

Usage: python scripts/probe_fractional.py [sf_dir]
Prints one JSON line per null fraction.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from c4_5decisiontreebasedonmapreduce_spark import get_spark, registry as RG  # noqa: E402
from c4_5decisiontreebasedonmapreduce_spark.functions.hashing import (  # noqa: E402
    md5_long,
)
from c4_5decisiontreebasedonmapreduce_spark.operators import tree as Tr  # noqa: E402


def poisoned(spark, sf_dir, ppm: int):
    """Deterministically null `l_discount`/`l_linestatus` on ~ppm/1e6 of
    rows (portable hash of the feature tuple — engine-independent)."""
    df = RG.lineitem_training(spark, sf_dir)
    key = md5_long(F.concat_ws("|", *[F.col(c) for c in df.columns]))
    mark = (key % 1_000_000) < ppm
    return df.withColumn(
        "l_discount", F.when(mark, None).otherwise(F.col("l_discount"))
    ).withColumn(
        "l_linestatus",
        F.when((key % 1_000_000) >= (1_000_000 - ppm), None).otherwise(
            F.col("l_linestatus")
        ),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark(app_name="fractional-probe")
    spark.range(1000).count()
    # baseline: the standard trainer on clean data
    t0 = time.perf_counter()
    base = Tr.train(
        RG.lineitem_training(spark, sf_dir),
        RG.LINEITEM_TRAINING_SCHEMA,
        max_depth=3,
        min_rows=50,
    )
    print(
        json.dumps(
            {
                "mode": "standard_clean",
                "sec": round(time.perf_counter() - t0, 2),
                "n_rules": len(base.rules),
            }
        )
    )
    for ppm in (0, 10_000, 50_000, 200_000):
        df = poisoned(spark, sf_dir, ppm)
        t0 = time.perf_counter()
        m = Tr.train(
            df,
            RG.LINEITEM_TRAINING_SCHEMA,
            max_depth=3,
            min_rows=50,
            nulls="fractional",
        )
        total_mass = sum(float(r.n) for r in m.rules)
        print(
            json.dumps(
                {
                    "mode": "fractional",
                    "null_ppm": ppm,
                    "sec": round(time.perf_counter() - t0, 2),
                    "n_rules": len(m.rules),
                    "total_mass": round(total_mass, 3),
                }
            )
        )
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
