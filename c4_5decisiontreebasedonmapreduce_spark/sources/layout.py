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


def write_facts_bucketed(
    spark: SparkSession,
    sf_dir: str,
    path_prefix: str,
    n_buckets: int = 8,
    orders_table: str = "orders_by_orderkey",
    lineitem_table: str = "lineitem_by_orderkey",
) -> tuple[DataFrame, DataFrame]:
    """Fact-to-fact co-location: ``orders`` and ``lineitem`` written
    BUCKETED BY their orderkey into the SAME bucket count.

    The orders⋈lineitem join is the one join in the schema where
    NEITHER side is broadcastable at 100 TB — executed naively it
    shuffles both full fact tables on every query. Bucketing both
    tables by the join key once at ingest makes every subsequent
    orderkey equi-join between them shuffle-free: each side's scan
    already satisfies the join's required hash distribution, so the
    plan carries ZERO Exchange nodes (pinned by
    ``test_scale_plans.py::test_bucketed_fact_join_no_shuffle``).

    ``repartition(n_buckets, key)`` before the write uses the same
    murmur3-mod hashing as the bucket assignment, so each task holds
    exactly one bucket → ONE file per bucket (the bucketed-write analog
    of the partitioned-write small-files guard above), and ``sortBy``
    keeps each bucket file ordered by the key for merge-join reads and
    row-group stats pruning on key predicates.
    """
    from c4_5decisiontreebasedonmapreduce_spark.sources.parquet import (
        load_table as _load,
    )

    for name, key, table in (
        ("orders", "o_orderkey", orders_table),
        ("lineitem", "l_orderkey", lineitem_table),
    ):
        (
            _load(spark, sf_dir, name)
            .repartition(n_buckets, F.col(key))
            .write.mode("overwrite")
            .bucketBy(n_buckets, key)
            .sortBy(key)
            .option("path", f"{path_prefix}/{table}")
            .saveAsTable(table)
        )
    return spark.table(orders_table), spark.table(lineitem_table)


def compact_files(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a fragmented parquet directory into
    ~``target_file_bytes`` files. The perennial 100 TB operational task —
    streaming sinks, per-batch ingests, and over-parallel writes leave
    thousands of KB-sized files whose per-file open/footer/listing cost
    dominates scans (and whose row groups are too small for stats
    pruning to bite).

    The file count comes from the SOURCE's actual on-disk bytes (driver
    file listing — metadata only, never data), so compaction is one
    shuffle-free-scan → repartition → write; content is preserved
    row-for-row (pinned by test_compact_files_preserves_rows_and_bounds).
    Returns the number of files written."""
    import os

    def parquet_files(path: str) -> list[str]:
        return [
            os.path.join(root, f)
            for root, _dirs, files in os.walk(path)
            for f in files
            if f.endswith(".parquet")
        ]

    total = sum(os.path.getsize(f) for f in parquet_files(src))
    n_files = max(1, -(-total // target_file_bytes))  # ceil
    spark.read.parquet(src).repartition(n_files).write.mode(
        "overwrite"
    ).parquet(dst)
    return len(parquet_files(dst))
