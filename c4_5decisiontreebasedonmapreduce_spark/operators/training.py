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
