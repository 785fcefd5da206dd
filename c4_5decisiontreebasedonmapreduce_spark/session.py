"""SparkSession factory.

Defaults are chosen for oracle parity and local benchmarking, but every
knob is overridable for cluster deployment:

- ``spark.sql.session.timeZone=UTC`` — DuckDB timestamps are UTC-naive;
  pinning the session TZ makes window/date results comparable.
- AQE on (coalesce partitions + skew-join) — at 100 TB the runtime
  re-plan is what keeps shuffle partition counts and skewed joins sane.
- ``spark.sql.shuffle.partitions`` defaults to 2× local cores (the static
  value only matters pre-AQE; AQE coalesces down afterwards).
- Arrow enabled — every Pandas UDF in this engine moves data via Arrow.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # driver testdata stores event timestamps as parquet TIMESTAMP(NANOS),
    # which Spark's reader rejects; read as long and convert (sources/parquet.py)
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # 128 MB parquet split targets: the right granularity both locally and
    # on a 1000-executor cluster (Spark's own default; restated for clarity).
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "c45-spark-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` resolves from ``$SPARK_GRAFT_MASTER`` then ``local[N]`` with
    ``N = $SPARK_GRAFT_CPUS`` (default all cores). On a real cluster pass
    ``master=None`` after setting the env var, or configure via spark-submit.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = os.environ.get(
            "SPARK_GRAFT_MASTER", f"local[{cpus}]" if cpus else "local[*]"
        )
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = 2 * (int(cpus) if cpus else (os.cpu_count() or 8))

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(DEFAULT_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if master.startswith("local"):
        # local mode runs driver + all executor threads in ONE JVM;
        # Spark's 1g default heap is sized for a cluster driver, not a
        # 32-thread single-process engine. No effect if a JVM already
        # exists (getOrCreate reuses it) or on a real cluster master.
        conf.setdefault(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
