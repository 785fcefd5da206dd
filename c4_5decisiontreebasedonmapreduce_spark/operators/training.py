"""Flagship training table: C4.5 features projected from `lineitem`.

FIXTURES.md §2: numeric features ``l_quantity, l_extendedprice,
l_discount, l_tax``; categorical ``l_linestatus`` (domain O/F); label
``l_returnflag`` (domain R/A/N). This replaces the reference's
TSV + attributes-side-file pair (`/root/reference/src/program/Main.java:137-166`)
with a parquet projection plus a declared :class:`TrainingSchema`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from c4_5decisiontreebasedonmapreduce_spark.sources.parquet import load_table
from c4_5decisiontreebasedonmapreduce_spark.sources.tsv import (
    CATEGORICAL,
    NUMERIC,
    AttributeSpec,
    TrainingSchema,
)

LINEITEM_TRAINING_SCHEMA = TrainingSchema(
    features=(
        AttributeSpec("l_quantity", NUMERIC),
        AttributeSpec("l_extendedprice", NUMERIC),
        AttributeSpec("l_discount", NUMERIC),
        AttributeSpec("l_tax", NUMERIC),
        AttributeSpec("l_linestatus", CATEGORICAL, ("O", "F")),
    ),
    label="l_returnflag",
    label_domain=("R", "A", "N"),
)


def lineitem_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = LINEITEM_TRAINING_SCHEMA
    cols = [a.name for a in s.features] + [s.label]
    return load_table(spark, sf_dir, "lineitem").select(*cols)


HOLDOUT_MOD = 5  # 1/5 of rows held out (~20%)


def lineitem_holdout_split(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Deterministic (train, holdout) split of the training table.

    The split is a pure function of each row's natural key
    ``(l_orderkey, l_linenumber)`` through the engine-portable MD5 hash
    — the same contract as `sampling.sample_stratified`: re-runs,
    repartitioning, and backfills reproduce the identical split, with
    no shuffle, no global count, and no persisted split column. The
    reference has no evaluation path at all (no prediction, SURVEY
    §2.D); this supplies the holdout harness a real training pipeline
    needs."""
    from pyspark.sql import functions as F

    from c4_5decisiontreebasedonmapreduce_spark.functions.hashing import (
        md5_long,
    )

    s = LINEITEM_TRAINING_SCHEMA
    cols = [a.name for a in s.features] + [s.label]
    li = load_table(spark, sf_dir, "lineitem")
    key = md5_long(
        F.concat_ws(
            "|",
            F.lit("split"),
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
        )
    )
    holdout = (key % HOLDOUT_MOD) == 0
    return (
        li.where(~holdout).select(*cols),
        li.where(holdout).select(*cols),
    )
