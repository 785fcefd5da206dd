"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (SURVEY.md §7 minimum slice): the full
root-node C4.5 split-selection pipeline (melt → contingency → entropy /
gain-ratio → numeric best-split → argmax) on the sf0.001 lineitem
training projection.

``queries()`` / ``oracle_sql()`` — the operator inventory from SURVEY.md
§2, maintained in ``c4_5decisiontreebasedonmapreduce_spark.registry``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# robust to being loaded as a file from another working directory
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from c4_5decisiontreebasedonmapreduce_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    sf_dir = "/root/testdata/sf0.001"
    return registry.queries()["level_stats"](spark, sf_dir)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
