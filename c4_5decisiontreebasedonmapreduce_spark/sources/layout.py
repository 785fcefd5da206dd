"""Table layout for scale: partitioned writes and partition-pruned scans.

The reference writes flat text part-files and re-reads them whole
(`/root/reference/src/program/MyReducer.java:106,204`,
`Main.java:224-228`) — every consumer pays a full scan. At 100 TB the
single highest-leverage storage decision is the DIRECTORY LAYOUT: a
fact table written ``partitionBy(<date>)`` lets any time-scoped query
skip every other partition at file-listing time (Catalyst partition
pruning — the filter never even reaches the parquet footers), and
``sortWithinPartitions(<key>)`` gives parquet row-group min/max stats
that skip pages WITHIN the day for key-scoped predicates.

``test_scale_plans.py::test_partitioned_scan_prunes`` pins both halves:
the written layout is hive-partitioned by day, and a day-filtered scan's
input files all come from that single day's directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from c4_5decisiontreebasedonmapreduce_spark.sources.parquet import load_table


def write_events_partitioned(
    spark: SparkSession,
    sf_dir: str,
    path: str,
    sort_col: str = "user_id",
) -> None:
    """Write the events fact table hive-partitioned by event day.

    ``repartition(day)`` puts each day's rows on one task so every
    (task × day) combination doesn't emit its own small file — the
    classic partitioned-write small-files blowup (tasks × partitions
    files; at 1000 executors × 365 days that is ~365k files per write).
    ``sortWithinPartitions`` then clusters each day file by ``sort_col``
    for row-group stats pruning. On a cluster with heavy single days,
    trade the one-file-per-day bound for parallelism by salting the
    repartition key — the layout contract is unchanged.
    """
    events = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    (
        events.repartition("event_date")
        # the partition column leads the sort: the dynamic-partition
        # writer requires task rows ordered by partition columns (one
        # open file at a time) and re-sorts by THEM ALONE otherwise,
        # which would destroy the secondary sort_col clustering
        .sortWithinPartitions("event_date", sort_col)
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(path)
    )


def scan_events_day(spark: SparkSession, path: str, day: str) -> DataFrame:
    """Day-scoped scan of the partitioned events table. The equality
    predicate on the partition column resolves at file listing — no
    other day's files are opened (pinned by the layout plan test)."""
    return spark.read.parquet(path).where(F.col("event_date") == F.lit(day))
