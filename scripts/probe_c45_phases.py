"""Phase-level attribution for the C4.5 training-path queries (guide
§1): where do c45_train / level_stats / numeric_best_split spend their
wall at sf0.1?

Usage: python scripts/probe_c45_phases.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from c4_5decisiontreebasedonmapreduce_spark import get_spark, registry
from c4_5decisiontreebasedonmapreduce_spark.operators import c45_stats as S
from c4_5decisiontreebasedonmapreduce_spark.operators import tree as Tr
from c4_5decisiontreebasedonmapreduce_spark.registry import (
    CAT_FEATS,
    LABEL,
    NUM_FEATS,
    _frontier_level,
)


def t(label, fn, reps=3):
    fn()
    best = min(
        (lambda t0: (fn(), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(reps)
    )
    print(f"{label}: {best:.3f}s", flush=True)
    return best


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="c45-phases")
    spark.range(100).count()

    # --- level_stats phases
    level = _frontier_level(spark, sf, root=False)
    t("level build+count (rid filter only)", lambda: level.count())
    melted = S.melt_mixed(level, CAT_FEATS, NUM_FEATS, LABEL)
    t("melt_mixed noop", lambda: melted.write.format("noop")
      .mode("overwrite").save())
    cont = S.mixed_contingency(melted)
    t("mixed_contingency count", lambda: cont.count())
    ck = cont.localCheckpoint()
    print("contingency rows:", ck.count(), flush=True)

    def full():
        registry.reset_caches()
        registry.queries()["level_stats"](spark, sf).count()

    t("level_stats full", full)

    # numeric branch alone over the checkpointed contingency
    info = S.node_info(
        ck.where(F.col(S.AID) == S.CC_AID).select(S.RID, S.CLASS, S.CNT)
    )
    num_cont = ck.where(F.col(S.AID).isin(NUM_FEATS)).select(
        S.RID, S.AID, F.col("value_d").alias(S.VALUE), S.CLASS, S.CNT
    )
    from c4_5decisiontreebasedonmapreduce_spark.registry import CLASSES

    t("numeric_best_split (bucketed) over ckpt cont",
      lambda: S.numeric_best_split(num_cont, info, CLASSES, 0.1).count())
    t("numeric_best_split (plain window) over ckpt cont",
      lambda: S.numeric_best_split(
          num_cont, info, CLASSES, 0.1, bucketed=False).count())

    # --- c45_train: total + per-level attribution via the model build
    def train_full():
        registry.reset_caches()
        registry.queries()["c45_train"](spark, sf).count()

    t("c45_train full", train_full)

    spark.stop()


if __name__ == "__main__":
    main()
