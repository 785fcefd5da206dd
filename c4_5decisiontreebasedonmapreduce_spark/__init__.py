"""PySpark-native analytics engine with the capability surface of the
reference C4.5-decision-tree-on-MapReduce project, re-expressed Spark-first.

The reference (studied at /root/reference, see SURVEY.md) is a Hadoop
MapReduce C4.5 trainer: one MR job per tree level computing gain-ratio
statistics for every (frontier-node, attribute) pair. This package rebuilds
that capability — and a broader LLM-data-pipeline operator set (dedup,
similarity search, text analysis, multimodal columns, event windows) — on
the Spark DataFrame/SQL engine so Catalyst/Tungsten own the physical plan.

Layout:
  session        SparkSession factory (UTC, AQE, local-friendly shuffle size)
  sources/       parquet table loaders + the reference's TSV/attributes format
  functions/     reusable Column-expression helpers (entropy, hashing, vectors)
  operators/     C4.5 statistics & tree trainer, dedup, similarity, text, windows
  streaming/     Structured Streaming variants of the windowed operators
"""

from c4_5decisiontreebasedonmapreduce_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
