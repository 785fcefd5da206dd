"""Deterministic hash-based sampling for corpus curation.

A 100 TB training-data pipeline rebalances its language/source mix by
SAMPLING, and the sample must be (a) deterministic — re-running the
pipeline, or backfilling one partition, must select the SAME documents —
and (b) driver-free — no global count or sort, just a per-row predicate
that pushes all the way down next to the scan. Bernoulli hash sampling
gives both: keep a row iff ``h(doc_id) mod M < rate·M`` where ``h`` is
the engine-portable MD5 hash (`functions/hashing.py`), so the decision
is a pure function of the row key and the configured per-stratum rate.

This replaces nothing in the reference (sampling is absent there — the
closest analog is its 10% minimum-side guard, ``MyReducer.java:34``);
it is part of the LLM-pipeline extension surface (SURVEY §2.C).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from c4_5decisiontreebasedonmapreduce_spark.functions.hashing import (
    md5_long,
    md5_long_sql,
)
from c4_5decisiontreebasedonmapreduce_spark.operators.text import DOCS_SQL, docs

# per-language Bernoulli keep rates: downsample the dominant language,
# keep the tail. At cluster scale this dict is a tiny broadcast dim
# joined to the fact side (never a shuffle of the corpus).
STRATA_RATES: dict[str, float] = {
    "en": 0.25,
    "de": 0.5,
    "es": 0.5,
    "fr": 0.5,
    "zh": 1.0,
}

_MOD = 1_000_000
_SEED = "sample|"


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic Bernoulli sample of ``documents``.

    The rate table is broadcast; the keep predicate is a scalar
    expression on (doc_id, rate), so the plan is scan → broadcast hash
    join → filter — no exchange of the corpus, no state, and stable
    under re-runs and repartitioning. Languages without a configured
    rate are dropped (inner join): an unconfigured stratum reaching the
    sampler is a pipeline bug better surfaced as absence than silently
    passed through at full rate.
    """
    rates = spark.createDataFrame(
        sorted(STRATA_RATES.items()), "lang string, rate double"
    )
    u = md5_long(F.concat(F.lit(_SEED), F.col("doc_id").cast("string"))) % _MOD
    return (
        docs(spark, sf_dir)
        .join(F.broadcast(rates), "lang")
        .where(u < (F.col("rate") * _MOD).cast("long"))
        .select("doc_id", "lang", "source")
    )


_RATES_VALUES = ", ".join(
    f"('{k}', {v})" for k, v in sorted(STRATA_RATES.items())
)

SAMPLE_STRATIFIED_SQL = f"""
WITH rates(lang, rate) AS (VALUES {_RATES_VALUES})
SELECT documents.doc_id, documents.lang, documents.source
FROM {DOCS_SQL} JOIN rates ON documents.lang = rates.lang
WHERE {md5_long_sql("CONCAT('" + _SEED + "', CAST(documents.doc_id AS VARCHAR))")}
      % {_MOD} < CAST(rates.rate * {_MOD} AS BIGINT)"""
