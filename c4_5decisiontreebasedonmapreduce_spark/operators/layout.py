"""Storage-layout operators: hive-partitioned writes with partition-pruned
rescans, and small-file compaction.

Extension surface (SURVEY.md §2.C). At 100 TB the file layout under a
table often dominates the query plan above it: an unpartitioned corpus
forces full scans for per-slice work, and a long-running ingest pipeline
(every micro-batch writing a few files) degenerates into millions of
KB-sized files — each one a scheduler task and a listing/metadata entry.
The reference engine has neither concern (it reads one HDFS text file,
`/root/reference/src/program/Main.java:200`); these operators make layout
a first-class, oracle-checked operation of the engine.

The family:

- :func:`write_partitioned` + :func:`pruned_stats` — write the documents
  table hive-partitioned by ``lang`` and rescan one language. Catalyst
  turns the ``lang = 'x'`` predicate into a PartitionFilter: directories
  for the other languages are never listed, never opened
  (plan-pinned and file-pinned in tests/test_round10_ops.py). This is
  the layout that makes per-language curation (the pipeline_* family)
  O(slice), not O(corpus).
- :func:`compact_files` — read a fragmented directory, size it via the
  filesystem, and rewrite it as ``ceil(bytes / target_file_bytes)``
  balanced files (round-robin ``repartition`` — a full shuffle, chosen
  over shuffle-free ``coalesce`` because coalesce merges whole input
  partitions and inherits their skew; compaction's entire point is
  uniform output files). Correctness is identity: the rescan must be
  row-for-row the source (the registry entry hashes doc rows with an
  md5 of the text against the original table).
- :func:`write_clustered` + :func:`clustered_range_stats` — sort-based
  data skipping for HIGH-cardinality keys (where directory partitioning
  would explode): range-repartition + in-partition sort gives each file
  a disjoint key span and each row group tight min/max stats, so range
  predicates prune inside the scan.
- :func:`layout_advise` — the measurement half: per candidate column,
  exact cardinality + heaviest-value share + a partition-worthiness
  verdict (the profile_skew → join_salted wiring pattern, applied to
  layout).

Both write through the normal DataFrame writer, so on a real cluster the
same code lands on HDFS/S3 with whatever committer the session
configures; nothing here is local-mode-only.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from c4_5decisiontreebasedonmapreduce_spark.operators.text import (
    DOCS_SQL,
    docs,
)

COMPACT_TARGET_FILE_BYTES = 128 * 1024 * 1024  # the classic HDFS block
FRAGMENT_N_FILES = 64  # the simulated small-file problem


def write_partitioned(
    spark: SparkSession,
    sf_dir: str,
    path: str,
    partition_by: tuple[str, ...] = ("lang",),
) -> None:
    """Write documents hive-partitioned. One shuffle-free pass: the
    writer splits rows into per-partition-value directories; at scale
    you'd repartition by the partition columns first to get one file
    per (task, value) instead of one per task per value — that option
    belongs to the caller's ingest job, not the layout op."""
    docs(spark, sf_dir).write.mode("overwrite").partitionBy(
        *partition_by
    ).parquet(path)


def pruned_stats(
    spark: SparkSession, path: str, lang: str = "en"
) -> DataFrame:
    """Per-source stats for ONE language off the partitioned layout.
    The ``lang`` predicate prunes at the directory level — the scan's
    PartitionFilters carry it and ``inputFiles()`` lists only the
    ``lang=<x>/`` subtree (both pinned in tests)."""
    scanned = spark.read.parquet(path).where(F.col("lang") == lang)
    return scanned.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum("doc_id").alias("sum_doc_id"),
    )


PRUNED_STATS_SQL = f"""
SELECT lang, source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
FROM {DOCS_SQL}
WHERE lang = 'en'
GROUP BY 1, 2"""


def _dir_bytes(spark: SparkSession, df: DataFrame) -> int:
    """Total size of the files behind a scan, via the JVM Hadoop
    FileSystem (works for any scheme the session can read — local,
    HDFS, s3a). Falls back to 0 only if the listing is empty."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    total = 0
    for f in df.inputFiles():
        p = jvm.org.apache.hadoop.fs.Path(f)
        fs = p.getFileSystem(conf)
        total += fs.getFileStatus(p).getLen()
    return total


def fragment(
    spark: SparkSession,
    sf_dir: str,
    path: str,
    n_files: int = FRAGMENT_N_FILES,
) -> None:
    """Deliberately produce the small-file problem: the documents table
    as ``n_files`` round-robin fragments (what a naive per-micro-batch
    ingest leaves behind)."""
    docs(spark, sf_dir).repartition(n_files).write.mode(
        "overwrite"
    ).parquet(path)


def compact_files(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = COMPACT_TARGET_FILE_BYTES,
) -> int:
    """Rewrite ``src_path`` as ``ceil(total_bytes / target_file_bytes)``
    balanced parquet files at ``dst_path``; returns the file count it
    chose. The sizing reads filesystem metadata only — no data pass
    before the single rewrite shuffle."""
    src = spark.read.parquet(src_path)
    total = _dir_bytes(spark, src)
    n_out = max(1, math.ceil(total / target_file_bytes))
    src.repartition(n_out).write.mode("overwrite").parquet(dst_path)
    return n_out


def rescan_checksum(spark: SparkSession, path: str) -> DataFrame:
    """Row-level identity proof of a relaid-out table: every row with an
    md5 of its text (the driver hash-compares this against the original
    documents table, so any row lost/duplicated/mangled by the rewrite
    mismatches)."""
    return spark.read.parquet(path).select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.md5(F.col("text")).alias("text_md5"),
    )


RESCAN_CHECKSUM_SQL = f"""
SELECT doc_id, lang, source, n_chars, MD5(text) AS text_md5
FROM {DOCS_SQL}"""


# ---------------------------------------------------------------------------
# range-clustered layout (sort-based data skipping)


CLUSTER_N_FILES = 8
# the graded range predicate: the middle ~10% of the doc_id key space
CLUSTER_RANGE_LO_PCT = 0.45
CLUSTER_RANGE_HI_PCT = 0.55


def write_clustered(
    spark: SparkSession,
    sf_dir: str,
    path: str,
    col: str = "doc_id",
    n_files: int = CLUSTER_N_FILES,
) -> None:
    """Range-cluster the documents table on ``col``: one range
    repartition (sampled range boundaries → each output file owns a
    contiguous, disjoint key span) + an in-partition sort (row groups
    within a file are also key-ordered). Parquet then stores tight
    min/max stats per row group, so a range predicate prunes at the
    ROW-GROUP level inside the scan — the sort-based half of data
    skipping, complementing :func:`write_partitioned`'s directory-level
    half (which needs a low-cardinality column; clustering works on
    high-cardinality keys). Spans pinned disjoint via the parquet
    footers in tests/test_round10_ops.py."""
    docs(spark, sf_dir).repartitionByRange(
        n_files, F.col(col)
    ).sortWithinPartitions(col).write.mode("overwrite").parquet(path)


def clustered_range_stats(
    spark: SparkSession, path: str, lo: int, hi: int
) -> DataFrame:
    """Per-lang stats for one key range off the clustered layout. The
    BETWEEN predicate reaches the scan (PushedFilters), where the
    key-ordered row groups' min/max stats skip everything outside the
    range — at 100 TB the scan reads ~range-fraction of the table, not
    all of it."""
    scanned = spark.read.parquet(path).where(
        (F.col("doc_id") >= lo) & (F.col("doc_id") <= hi)
    )
    return scanned.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum("doc_id").alias("sum_doc_id"),
    )


def cluster_range_bounds(spark: SparkSession, sf_dir: str) -> tuple[int, int]:
    """The graded query's deterministic range: percentiles of doc_id
    computed from the table itself (doc_ids are dense from 0 here, but
    deriving bounds from data keeps the op correct on any key set)."""
    row = (
        docs(spark, sf_dir)
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .collect()[0]
    )
    span = row.hi - row.lo
    # floor() in BOTH engines: DuckDB's CAST(double AS BIGINT) rounds
    # half-away while Python's int() truncates — FLOOR is the one
    # spelling with identical semantics
    return (
        row.lo + int(math.floor(span * CLUSTER_RANGE_LO_PCT)),
        row.lo + int(math.floor(span * CLUSTER_RANGE_HI_PCT)),
    )


CLUSTERED_RANGE_STATS_SQL = f"""
WITH b AS (
  SELECT MIN(doc_id) AS mn,
         MIN(doc_id) + CAST(FLOOR((MAX(doc_id) - MIN(doc_id))
                            * {CLUSTER_RANGE_LO_PCT}) AS BIGINT) AS lo,
         MIN(doc_id) + CAST(FLOOR((MAX(doc_id) - MIN(doc_id))
                            * {CLUSTER_RANGE_HI_PCT}) AS BIGINT) AS hi
  FROM {DOCS_SQL}
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
FROM {DOCS_SQL}, b
WHERE doc_id >= b.lo AND doc_id <= b.hi
GROUP BY 1"""


# ---------------------------------------------------------------------------
# partition-column advisor


ADVISE_MAX_PARTITIONS = 1024
ADVISE_MAX_TOP_SHARE = 0.5
ADVISE_MIN_ROWS_PER_PARTITION = 16
ADVISE_COLUMNS = ("lang", "source", "doc_id", "n_chars")


def layout_advise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which column should partition the documents table? The
    measurement half of :func:`write_partitioned`, the way profile_skew
    is the measurement half of join_salted (and join_auto the wiring):
    per candidate column — exact distinct count, the heaviest value's
    row share, and the verdict

    ``recommend = 2 <= n_distinct <= 1024
                  AND n_distinct * 16 <= rows AND top_share <= 0.5``

    (enough values to prune, few enough to not drown the metastore /
    produce empty-file partitions, and no value so hot the layout
    inherits its skew). One melt + one grouped count — the same
    stack-shaped single-exchange plan as the C4.5 contingency melt.

    At 100 TB you'd feed a sampled slice; the decision rule is
    share-based so it is sample-stable. Exact counts here keep the op
    oracle-gradable (approx_count_distinct's HLL has no DuckDB twin)."""
    d = docs(spark, sf_dir)
    stack = ", ".join(
        f"'{c}', CAST({c} AS STRING)" for c in ADVISE_COLUMNS
    )
    melted = d.select(
        F.expr(f"stack({len(ADVISE_COLUMNS)}, {stack}) AS (col, val)")
    )
    per_val = melted.groupBy("col", "val").agg(F.count("*").alias("cnt"))
    per_col = per_val.groupBy("col").agg(
        F.count("*").alias("n_distinct"),
        F.max("cnt").alias("top_cnt"),
        F.sum("cnt").alias("n_rows"),
    )
    top_share = F.round(
        F.col("top_cnt") / F.col("n_rows").cast("double"), 6
    )
    # rows-per-partition floor as a pure-integer comparison
    # (n_distinct * min_rows <= n_rows): no division, so Spark and the
    # DuckDB oracle agree exactly (CAST-of-double rounds in DuckDB but
    # truncates in Spark — the cluster_range_bounds FLOOR lesson); the
    # share gate compares the 6dp-ROUNDED value in both engines
    return per_col.select(
        "col",
        "n_distinct",
        top_share.alias("top_share"),
        (
            (F.col("n_distinct") >= 2)
            & (F.col("n_distinct") <= ADVISE_MAX_PARTITIONS)
            & (
                F.col("n_distinct") * ADVISE_MIN_ROWS_PER_PARTITION
                <= F.col("n_rows")
            )
            & (top_share <= ADVISE_MAX_TOP_SHARE)
        ).alias("recommend"),
    )


_ADVISE_MELT_SQL = " UNION ALL ".join(
    f"SELECT '{c}' AS col, CAST({c} AS VARCHAR) AS val FROM {DOCS_SQL}"
    for c in ADVISE_COLUMNS
)

LAYOUT_ADVISE_SQL = f"""
WITH melted AS ({_ADVISE_MELT_SQL}),
per_val AS (SELECT col, val, COUNT(*) AS cnt FROM melted GROUP BY 1, 2),
per_col AS (
  SELECT col, COUNT(*) AS n_distinct, MAX(cnt) AS top_cnt,
         CAST(SUM(cnt) AS BIGINT) AS n_rows
  FROM per_val GROUP BY 1
)
SELECT col, n_distinct,
       ROUND(top_cnt / CAST(n_rows AS DOUBLE), 6) AS top_share,
       (n_distinct >= 2
        AND n_distinct <= {ADVISE_MAX_PARTITIONS}
        AND n_distinct * {ADVISE_MIN_ROWS_PER_PARTITION} <= n_rows
        AND ROUND(top_cnt / CAST(n_rows AS DOUBLE), 6)
            <= {ADVISE_MAX_TOP_SHARE})
       AS recommend
FROM per_col"""
