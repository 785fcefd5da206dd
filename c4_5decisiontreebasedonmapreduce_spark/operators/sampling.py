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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from c4_5decisiontreebasedonmapreduce_spark.functions.hashing import (
    md5_long,
    md5_long_sql,
)
from c4_5decisiontreebasedonmapreduce_spark.operators.text import (
    DOCS_SQL,
    _tokens_sql,
    docs,
    tokens_col,
)

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


def sample_coverage(
    spark: SparkSession, sf_dir: str, d: DataFrame | None = None
) -> DataFrame:
    """Stratum-coverage audit for :func:`sample_stratified` (ADVICE r6):
    one row per language with the corpus count, whether a keep rate is
    configured, and how many documents the sampler keeps. An
    UNCONFIGURED stratum — which the sampler's inner join silently drops
    — surfaces here as ``configured = false, n_kept = 0``, so a missing
    rate fails LOUDLY (alert on any unconfigured row) instead of
    shrinking the corpus unnoticed. Same scale shape as the sampler:
    one corpus scan, broadcast rate dim (left join), one per-language
    aggregation. Pass ``d`` to audit an arbitrary documents relation
    (tests inject an unconfigured stratum)."""
    rates = spark.createDataFrame(
        sorted(STRATA_RATES.items()), "lang string, rate double"
    )
    if d is None:
        d = docs(spark, sf_dir)
    u = md5_long(F.concat(F.lit(_SEED), F.col("doc_id").cast("string"))) % _MOD
    return (
        d.join(F.broadcast(rates), "lang", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.bool_or(F.col("rate").isNotNull()).alias("configured"),
            F.count(
                F.when(
                    F.col("rate").isNotNull()
                    & (u < (F.col("rate") * _MOD).cast("long")),
                    1,
                )
            ).alias("n_kept"),
        )
    )


_RATES_VALUES = ", ".join(
    f"('{k}', {v})" for k, v in sorted(STRATA_RATES.items())
)

SAMPLE_COVERAGE_SQL = f"""
WITH rates(lang, rate) AS (VALUES {_RATES_VALUES})
SELECT documents.lang, COUNT(*) AS n_docs,
       BOOL_OR(rates.rate IS NOT NULL) AS configured,
       COUNT(CASE WHEN rates.rate IS NOT NULL
                   AND {md5_long_sql("CONCAT('" + _SEED + "', CAST(documents.doc_id AS VARCHAR))")}
                       % {_MOD} < CAST(rates.rate * {_MOD} AS BIGINT)
                  THEN 1 END) AS n_kept
FROM {DOCS_SQL} LEFT JOIN rates ON documents.lang = rates.lang
GROUP BY documents.lang"""

SAMPLE_STRATIFIED_SQL = f"""
WITH rates(lang, rate) AS (VALUES {_RATES_VALUES})
SELECT documents.doc_id, documents.lang, documents.source
FROM {DOCS_SQL} JOIN rates ON documents.lang = rates.lang
WHERE {md5_long_sql("CONCAT('" + _SEED + "', CAST(documents.doc_id AS VARCHAR))")}
      % {_MOD} < CAST(rates.rate * {_MOD} AS BIGINT)"""


# per-source token budget for the domain-mixing sampler. 500 keeps the
# budget BINDING at every test scale factor (per-source totals run
# ~1.2k tokens at sf0.001 and grow with sf), so the rates are real
# fractions, not a wall of 1.0s.
TOKEN_BUDGET = 500
_TB_SEED = "tokbudget|"


def sample_token_budget(
    spark: SparkSession, sf_dir: str, budget: int = TOKEN_BUDGET
) -> DataFrame:
    """Domain MIXING by token budget: cap each source's expected
    contribution at ``budget`` tokens — the training-mix knob every LLM
    data pipeline turns (upweight scarce domains, cap dominant ones) —
    with ``rate_s = min(1, budget / total_tokens_s)`` and the same
    deterministic portable-hash keep predicate as
    :func:`sample_stratified`.

    Scale shape: one scan computes per-doc token counts; the per-source
    totals aggregate is sources-sized (tiny) and broadcast back, so the
    corpus is never shuffled and the keep decision stays a scalar
    predicate next to the scan. Deterministic end-to-end: totals are a
    pure function of the data, the hash of the row key — so re-runs and
    backfills keep the SAME documents. The truncation to the hash
    threshold is an explicit FLOOR (Spark's cast truncates, DuckDB's
    rounds — the floor pins both engines to identical keep sets)."""
    from c4_5decisiontreebasedonmapreduce_spark.operators.text import (
        tokens_col,
    )

    d = docs(spark, sf_dir).select(
        "doc_id",
        "source",
        F.size(tokens_col(F.col("text"))).alias("n_tokens"),
    )
    totals = d.groupBy("source").agg(
        F.sum("n_tokens").alias("total_tokens")
    )
    rate = F.least(
        F.lit(1.0), F.lit(float(budget)) / F.col("total_tokens")
    )
    rated = F.broadcast(totals.select("source", rate.alias("rate")))
    u = (
        md5_long(F.concat(F.lit(_TB_SEED), F.col("doc_id").cast("string")))
        % _MOD
    )
    return (
        d.join(rated, "source")
        .where(u < F.floor(F.col("rate") * _MOD).cast("long"))
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.round(F.col("rate"), 6).alias("rate"),
        )
    )


# target mixture for epoch-aware resampling, in integer PER-MILLE so
# `weight_pm * budget * 1000` stays exact integer arithmetic in BOTH
# engines (a float weight like 0.3 is decimal-exact in DuckDB VALUES but
# binary-inexact as a Spark double — the ppm threshold could round apart
# at a floor boundary). Sources absent from the dict are deliberately
# excluded: a mixture IS the explicit allowlist of what trains.
MIXTURE_WEIGHTS_PM: dict[str, int] = {
    "src0": 500,
    "src1": 300,
    "src2": 200,
}
MIX_TOKEN_BUDGET = 10_000
_MIX_SEED = "mix|"


def sample_mixture(
    spark: SparkSession,
    sf_dir: str,
    budget: int = MIX_TOKEN_BUDGET,
    keep_text: bool = False,
) -> DataFrame:
    """Epoch-aware mixture resampling: hit a target per-source token
    MIX (``MIXTURE_WEIGHTS_PM``, per-mille of ``budget``) where scarce
    domains may need MORE than one pass over their data — the
    "2.3 epochs of Wikipedia" knob of an LLM training mix, which
    :func:`sample_token_budget` (pure downsampling, rate ≤ 1) cannot
    express. ``rate_s = weight_s · budget / total_tokens_s`` may exceed
    1: each document is emitted ``floor(rate)`` times (full epochs) plus
    one more iff ``h(doc_id) mod M < frac(rate)·M`` — the same
    deterministic portable-hash Bernoulli as the rest of this module, so
    the expected token mass per source is exactly ``weight_s · budget``
    and re-runs/backfills reproduce the SAME (doc, epoch) rows.

    Scale shape: one corpus scan; the per-source totals aggregate is
    sources-sized and broadcast back; the epoch fan-out is a generated
    column (``explode(sequence)``) next to the scan — no shuffle of the
    corpus, no driver loop. The rate is carried as an integer
    ppm (``floor(weight_pm · budget · 1000 / total)``) so the
    full-epoch/fractional split is engine-exact (no float equality at
    the floor boundary).

    The reference has no sampling (SURVEY §2.C extension surface); the
    epoch fan-out reuses its expand-candidates explode shape
    (MyMapper.java:61-78) pointed at corpus repetition.
    """
    from c4_5decisiontreebasedonmapreduce_spark.operators.text import (
        tokens_col,
    )

    text_cols = ["text"] if keep_text else []
    from c4_5decisiontreebasedonmapreduce_spark.operators.text import (
        spread_if_heavy,
    )

    # size-adaptive spread (r13): serial at sf0.1 where it regressed
    # 0.85→0.96 s (r12 revert), spread at the ×10 probe scale where the
    # token-count projection read 1.75→1.23 s.
    d = spread_if_heavy(docs(spark, sf_dir)).select(
        "doc_id",
        "source",
        F.size(tokens_col(F.col("text"))).alias("n_tokens"),
        *text_cols,
    )
    weights = spark.createDataFrame(
        sorted(MIXTURE_WEIGHTS_PM.items()), "source string, weight_pm long"
    )
    totals = d.groupBy("source").agg(F.sum("n_tokens").alias("total_tokens"))
    rate_ppm = F.floor(
        (F.col("weight_pm") * budget * 1000).cast("double")
        / F.col("total_tokens")
    ).cast("long")
    rates = F.broadcast(
        totals.join(F.broadcast(weights), "source")
        .select("source", rate_ppm.alias("rate_ppm"))
    )
    u = (
        md5_long(F.concat(F.lit(_MIX_SEED), F.col("doc_id").cast("string")))
        % _MOD
    )
    n_copies = (
        F.expr(f"rate_ppm div {_MOD}")
        + F.when(u < F.col("rate_ppm") % _MOD, 1).otherwise(0)
    ).cast("long")
    return (
        d.join(rates, "source")
        .select(
            "doc_id",
            "source",
            "n_tokens",
            n_copies.alias("n_copies"),
            *text_cols,
        )
        .where(F.col("n_copies") >= 1)
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.explode(
                F.sequence(F.lit(1).cast("long"), F.col("n_copies"))
            ).alias("epoch"),
            *text_cols,
        )
    )


def mixture_prelude_sql(
    budget: int = MIX_TOKEN_BUDGET, prefix: str = ""
) -> str:
    """The mixture oracle's CTE chain (``{prefix}toks`` /
    ``{prefix}rates`` / ``{prefix}j`` — prefix the names when embedding
    into a query with its own CTEs), emitted from ONE builder so the
    registered `sample_mixture` oracle and every composed pipeline
    oracle (e.g. `pipeline_mixture_pack`) pin the SAME rate/Bernoulli
    arithmetic — a second hand-kept copy could silently drift."""
    from c4_5decisiontreebasedonmapreduce_spark.operators.text import (
        _tokens_sql,
    )

    t, r, j = f"{prefix}toks", f"{prefix}rates", f"{prefix}j"
    w = f"{prefix}w"
    w_values = ", ".join(
        f"('{k}', {v})" for k, v in sorted(MIXTURE_WEIGHTS_PM.items())
    )
    u = md5_long_sql(
        "CONCAT('" + _MIX_SEED + f"', CAST({t}.doc_id AS VARCHAR))"
    )
    return f"""{t} AS (
  SELECT doc_id, source, LEN({_tokens_sql('text')}) AS n_tokens
  FROM {DOCS_SQL}
),
{w}(source, weight_pm) AS (VALUES {w_values}),
{r} AS (
  SELECT {t}.source,
         CAST(FLOOR(CAST(CAST({w}.weight_pm AS BIGINT) * {budget} * 1000
                         AS DOUBLE)
                    / SUM({t}.n_tokens)) AS BIGINT) AS rate_ppm
  FROM {t} JOIN {w} USING (source) GROUP BY {t}.source, {w}.weight_pm
),
{j} AS (
  SELECT {t}.doc_id, {t}.source, {t}.n_tokens,
         {r}.rate_ppm // {_MOD}
         + CASE WHEN {u} % {_MOD} < {r}.rate_ppm % {_MOD}
                THEN 1 ELSE 0 END AS n_copies
  FROM {t} JOIN {r} USING (source)
)"""


def _sample_mixture_sql(budget: int = MIX_TOKEN_BUDGET) -> str:
    return f"""
WITH {mixture_prelude_sql(budget)}
SELECT doc_id, source, n_tokens,
       CAST(UNNEST(generate_series(1, n_copies)) AS BIGINT) AS epoch
FROM j WHERE n_copies >= 1"""


SAMPLE_MIXTURE_SQL = _sample_mixture_sql()


def _sample_token_budget_sql(budget: int = TOKEN_BUDGET) -> str:
    from c4_5decisiontreebasedonmapreduce_spark.operators.text import (
        _tokens_sql,
    )

    u = md5_long_sql(
        "CONCAT('" + _TB_SEED + "', CAST(toks.doc_id AS VARCHAR))"
    )
    return f"""
WITH toks AS (
  SELECT doc_id, source, LEN({_tokens_sql('text')}) AS n_tokens
  FROM {DOCS_SQL}
),
tot AS (
  SELECT source, LEAST(1.0, {budget}.0 / SUM(n_tokens)) AS rate
  FROM toks GROUP BY source
)
SELECT toks.doc_id, toks.source, toks.n_tokens, ROUND(tot.rate, 6) AS rate
FROM toks JOIN tot USING (source)
WHERE {u} % {_MOD} < CAST(FLOOR(tot.rate * {_MOD}) AS BIGINT)"""


SAMPLE_TOKEN_BUDGET_SQL = _sample_token_budget_sql()


# temperature-scaled mixture (UNIMAX / mT5-style): per-source shares
# derived FROM THE DATA, p_s ∝ total_tokens_s^(1/τ), instead of a
# hand-configured weight dict. τ is fixed at 2 so the scaling power is
# SQRT — the one non-trivial power that IEEE 754 requires correctly
# rounded, making floor(sqrt(T)) bit-identical across engines (a
# general POW(x, 1/τ) may differ in the last ulp between libm
# implementations, which could flip an integer-ppm floor boundary).
TEMP_TOKEN_BUDGET = 40_000
_TEMP_SEED = "temp|"


def sample_temperature(
    spark: SparkSession, sf_dir: str, budget: int = TEMP_TOKEN_BUDGET
) -> DataFrame:
    """Temperature-scaled mixture resampling: like
    :func:`sample_mixture`, but the per-source shares are DERIVED from
    the corpus instead of configured — ``p_s ∝ total_tokens_s^(1/2)``
    (temperature τ = 2), the standard multilingual-pretraining move
    (mT5/UNIMAX) that upweights scarce sources toward uniform without
    hand-tuning a weight per source. Each document is emitted
    ``floor(rate_s)`` full epochs plus one more iff
    ``h(doc_id) mod M < frac(rate_s)·M`` — deterministic, so re-runs
    and backfills reproduce the SAME (doc, epoch) rows.

    Engine-exact arithmetic: ``w_s = floor(sqrt(T_s))`` (IEEE sqrt is
    correctly rounded — identical in Spark and DuckDB), ``W = Σ w_s``
    (integer, order-independent), and
    ``rate_ppm = ((budget·10⁶·w_s) div W) div T_s`` — the nested
    integer floor-div equals ``floor(budget·10⁶·w_s / (W·T_s))``
    without ever forming the denominator product, so nothing overflows
    int64 below ~10¹³ tokens per source (≫ 100 TB of text).

    Scale shape: one corpus scan; the per-source totals aggregate is
    sources-sized, the share normalization is a window over that tiny
    aggregated relation (sources × 1 rows — never the corpus), and the
    epoch fan-out is ``explode(sequence)`` next to the scan."""
    from pyspark.sql import Window

    from c4_5decisiontreebasedonmapreduce_spark.operators.text import (
        tokens_col,
    )

    d = docs(spark, sf_dir).select(
        "doc_id",
        "source",
        F.size(tokens_col(F.col("text"))).alias("n_tokens"),
    )
    w = F.floor(F.sqrt(F.col("total_tokens"))).cast("long")
    totals = (
        d.groupBy("source")
        .agg(F.sum("n_tokens").alias("total_tokens"))
        .select("source", "total_tokens", w.alias("w"))
        # normalizer over the sources-sized aggregate only (tiny)
        .withColumn(
            "w_sum", F.sum("w").over(Window.partitionBy(F.lit(1)))
        )
    )
    rate_ppm = F.expr(
        f"(({budget}L * 1000000L * w) div w_sum) div total_tokens"
    )
    rates = F.broadcast(
        totals.select("source", rate_ppm.alias("rate_ppm"))
    )
    u = (
        md5_long(F.concat(F.lit(_TEMP_SEED), F.col("doc_id").cast("string")))
        % _MOD
    )
    n_copies = (
        F.expr(f"rate_ppm div {_MOD}")
        + F.when(u < F.col("rate_ppm") % _MOD, 1).otherwise(0)
    ).cast("long")
    return (
        d.join(rates, "source")
        .select("doc_id", "source", "n_tokens", n_copies.alias("n_copies"))
        .where(F.col("n_copies") >= 1)
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.explode(
                F.sequence(F.lit(1).cast("long"), F.col("n_copies"))
            ).alias("epoch"),
        )
    )


def _sample_temperature_sql(budget: int = TEMP_TOKEN_BUDGET) -> str:
    from c4_5decisiontreebasedonmapreduce_spark.operators.text import (
        _tokens_sql,
    )

    u = md5_long_sql(
        "CONCAT('" + _TEMP_SEED + "', CAST(toks.doc_id AS VARCHAR))"
    )
    return f"""
WITH toks AS (
  SELECT doc_id, source, LEN({_tokens_sql('text')}) AS n_tokens
  FROM {DOCS_SQL}
),
tot AS (
  SELECT source, SUM(n_tokens) AS total_tokens,
         CAST(FLOOR(SQRT(SUM(n_tokens))) AS BIGINT) AS w
  FROM toks GROUP BY source
),
rates AS (
  SELECT source,
         ((CAST({budget} AS BIGINT) * 1000000 * w) // SUM(w) OVER ())
           // total_tokens AS rate_ppm
  FROM tot
),
j AS (
  SELECT toks.doc_id, toks.source, toks.n_tokens,
         CAST(rates.rate_ppm // {_MOD}
              + CASE WHEN {u} % {_MOD} < rates.rate_ppm % {_MOD}
                     THEN 1 ELSE 0 END AS BIGINT) AS n_copies
  FROM toks JOIN rates USING (source)
)
SELECT doc_id, source, n_tokens,
       CAST(UNNEST(generate_series(1, n_copies)) AS BIGINT) AS epoch
FROM j WHERE n_copies >= 1"""


SAMPLE_TEMPERATURE_SQL = _sample_temperature_sql()


# soft dedup (SemDeDup-style keep-one-in-expectation): instead of hard
# survivor selection, keep each member of a duplicate cluster with
# probability 1/|cluster| — expected ONE survivor per cluster, but the
# survivor varies by hash, which preserves intra-cluster diversity
# across re-mixes while still collapsing duplicate mass.
_SOFT_SEED = "softdedup|"


def sample_softdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-mass downweighting as SAMPLING: every document in a
    near-dup cluster (``dedup_cluster``'s connected components) keeps
    with probability ``1/cluster_size`` via the deterministic
    portable-hash predicate ``u < floor(M / size)`` (exact integer
    threshold — no float boundary), unclustered documents always keep.
    Expected survivors per cluster = 1, like hard dedup, but the kept
    member varies by hash instead of always min-doc_id — the
    "soft dedup" curation move that keeps duplicate-cluster DIVERSITY
    in the mix while collapsing its mass.

    Scale shape: the cluster relation is near-dup-sized (small next to
    the corpus); its size rollup is cluster-count-sized. Neither join
    is broadcast-HINTED (a 100 TB near-dup relation can be large) —
    AQE broadcasts at small scale, and the corpus-side join key is
    doc_id, so a doc_id-bucketed persisted cluster table would make the
    big join shuffle-free on the corpus side (the same amortization as
    the persisted dedup corpora). Deterministic end-to-end."""
    from c4_5decisiontreebasedonmapreduce_spark.operators.dedup import (
        dedup_cluster,
    )

    cluster = dedup_cluster(spark, sf_dir)
    sizes = cluster.groupBy("cluster_rep").agg(
        F.count("*").alias("cluster_size")
    )
    member = cluster.join(sizes, "cluster_rep").select(
        "doc_id", "cluster_size"
    )
    u = (
        md5_long(F.concat(F.lit(_SOFT_SEED), F.col("doc_id").cast("string")))
        % _MOD
    )
    return (
        docs(spark, sf_dir)
        .select("doc_id")
        .join(member, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("cluster_size"), F.lit(1))
            .cast("long")
            .alias("cluster_size"),
        )
        .where(u < F.expr(f"{_MOD} div cluster_size"))
    )


SAMPLE_SOFTDEDUP_SQL_TEMPLATE = """
WITH cluster AS ({cluster_sql}
),
sizes AS (
  SELECT cluster_rep, COUNT(*) AS cluster_size
  FROM cluster GROUP BY cluster_rep
),
member AS (
  SELECT cluster.doc_id, sizes.cluster_size
  FROM cluster JOIN sizes USING (cluster_rep)
),
scored AS (
  SELECT documents.doc_id,
         CAST(COALESCE(member.cluster_size, 1) AS BIGINT) AS cluster_size
  FROM {docs_sql} LEFT JOIN member ON documents.doc_id = member.doc_id
)
SELECT doc_id, cluster_size FROM scored
WHERE {u} % {mod} < {mod} // cluster_size"""


def _sample_softdedup_sql() -> str:
    from c4_5decisiontreebasedonmapreduce_spark.operators.dedup import (
        DEDUP_CLUSTER_SQL,
    )

    return SAMPLE_SOFTDEDUP_SQL_TEMPLATE.format(
        cluster_sql=DEDUP_CLUSTER_SQL.strip(),
        docs_sql=DOCS_SQL,
        u=md5_long_sql(
            "CONCAT('" + _SOFT_SEED + "', CAST(doc_id AS VARCHAR))"
        ),
        mod=_MOD,
    )


SAMPLE_SOFTDEDUP_SQL = _sample_softdedup_sql()


# -- deterministic train/validation/test split --------------------------------
#
# Evaluation hygiene at corpus scale: the split must be (a) reproducible
# from nothing but the row's identity (no persisted assignment table to
# keep in sync), (b) stable under corpus growth — appending documents
# NEVER moves an existing one across splits, so yesterday's test set is
# still disjoint from today's training set — and (c) uniform within
# every stratum. A hash of doc_id gives all three; a random() or
# row_number() split gives none.
_SPLIT_SEED = "split|"
SPLIT_BOUNDS = (9000, 9500)  # /10000: 90% train, 5% validation, 5% test


def split_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document to train/validation/test by the portable
    doc_id hash: ``u = md5(seed‖doc_id) mod 10000`` → train < 9000 ≤
    validation < 9500 ≤ test. Emits ``(doc_id, source, lang, split)``.

    Scale shape: one projection over the corpus — no shuffle, no state,
    no sampling pass; the assignment is recomputable anywhere (a trainer
    shard and an eval job agree without coordination). Per-stratum
    uniformity is pinned in tests (each source's split fractions track
    90/5/5)."""
    u = (
        md5_long(
            F.concat(F.lit(_SPLIT_SEED), F.col("doc_id").cast("string"))
        )
        % 10000
    )
    lo, hi = SPLIT_BOUNDS
    return docs(spark, sf_dir).select(
        "doc_id",
        "source",
        "lang",
        F.when(u < lo, "train")
        .when(u < hi, "validation")
        .otherwise("test")
        .alias("split"),
    )


def _split_sql() -> str:
    u = md5_long_sql(
        "CONCAT('" + _SPLIT_SEED + "', CAST(doc_id AS VARCHAR))"
    )
    lo, hi = SPLIT_BOUNDS
    return f"""
SELECT doc_id, source, lang,
       CASE WHEN {u} % 10000 < {lo} THEN 'train'
            WHEN {u} % 10000 < {hi} THEN 'validation'
            ELSE 'test' END AS split
FROM {DOCS_SQL}"""


SPLIT_TRAIN_EVAL_SQL = _split_sql()


# -- DSIR: data selection with importance resampling --------------------------
#
# Xie et al. 2023 ("Data Selection for Language Models via Importance
# Resampling"): score every raw document by how much more likely its
# hashed n-gram features are under a TARGET distribution than under the
# RAW corpus distribution; resample the corpus by that importance
# weight to shift its mixture toward the target domain without training
# a classifier. Features are hashed unigrams (the paper's hashed n-gram
# generative model with add-one smoothing); both distributions are
# bucket-count tables of fixed size B, so the model is O(B) regardless
# of corpus size.
_DSIR_SEED = "dsir|"
DSIR_BUCKETS = 1024
DSIR_TARGET_LANG = "en"


def sample_dsir(
    spark: SparkSession,
    sf_dir: str,
    target_lang: str = DSIR_TARGET_LANG,
    n_buckets: int = DSIR_BUCKETS,
    d: DataFrame | None = None,
) -> DataFrame:
    """Per-document DSIR importance log-weight against an in-corpus
    target slice (documents whose ``lang`` equals ``target_lang`` stand
    in for the paper's high-quality target corpus). For each hash
    bucket b: ``llr(b) = ln((ct_b+1)/(Nt+B)) - ln((cr_b+1)/(Nr+B))``
    (add-one-smoothed unigram log-likelihood ratio); a document's
    weight is the MEAN llr of its tokens (length-normalized, so long
    documents don't dominate the resample). Emits ``(doc_id, lang,
    source, n_tokens, dsir_logweight)``; feed the weight into the
    existing temperature/mixture samplers to realize the resample.

    Scale shape: BOTH bucket-count tables come from ONE pass over the
    exploded corpus (conditional aggregation — the target is a slice of
    raw, so no second tokenize); the result is B rows, broadcast back
    onto a second exploded pass whose per-doc mean carries map-side
    partials. Two corpus scans total, exchanges bounded by B and
    doc-count. No Python, no window. Pass ``d`` to score an injected
    relation (tests construct a corpus with a genuinely distinct target
    vocabulary — the driver's synthetic documents share one vocabulary
    across lang tags, so separation there is sampling noise)."""
    if d is None:
        d = docs(spark, sf_dir)
    # spread-if-narrow: BOTH token-explode passes (bucket build and
    # scoring) re-evaluate tokenize+explode over this relation — on the
    # sf0.1 single-split scan each ran as a ~0.6 s single-task job
    # (measured, sweep r12). No-op at cluster scale (scan already wide).
    par = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < par:
        d = d.repartition(par)
    tok = d.select(
        "doc_id", "lang", F.explode(tokens_col(F.col("text"))).alias("t")
    )
    bucket = (
        md5_long(F.concat(F.lit(_DSIR_SEED), F.col("t"))) % n_buckets
    ).alias("b")
    counts = (
        tok.select(bucket, "lang")
        .groupBy("b")
        .agg(
            F.count("*").alias("cr"),
            F.sum(
                F.when(F.col("lang") == target_lang, 1).otherwise(0)
            ).alias("ct"),
        )
    )
    totals = counts.agg(
        F.sum("cr").alias("nr"), F.sum("ct").alias("nt")
    )
    llr = counts.crossJoin(F.broadcast(totals)).select(
        "b",
        (
            F.log((F.col("ct") + 1) / (F.col("nt") + n_buckets))
            - F.log((F.col("cr") + 1) / (F.col("nr") + n_buckets))
        ).alias("llr"),
    )
    scored = (
        tok.select("doc_id", bucket)
        .join(F.broadcast(llr), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg("llr"), 6).alias("dsir_logweight"),
        )
    )
    return d.select("doc_id", "lang", "source").join(
        scored, "doc_id"
    ).select("doc_id", "lang", "source", "n_tokens", "dsir_logweight")


def _dsir_sql() -> str:
    b = md5_long_sql("CONCAT('" + _DSIR_SEED + "', t)")
    B = DSIR_BUCKETS
    return f"""
WITH tok AS (
  SELECT doc_id, lang, UNNEST({_tokens_sql("text")}) AS t FROM {DOCS_SQL}
),
counts AS (
  SELECT {b} % {B} AS b, COUNT(*) AS cr,
         SUM(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END) AS ct
  FROM tok GROUP BY 1
),
totals AS (SELECT SUM(cr) AS nr, SUM(ct) AS nt FROM counts),
llr AS (
  SELECT b, LN((ct + 1) / CAST(nt + {B} AS DOUBLE))
            - LN((cr + 1) / CAST(nr + {B} AS DOUBLE)) AS llr
  FROM counts CROSS JOIN totals
),
scored AS (
  SELECT doc_id, COUNT(*) AS n_tokens, ROUND(AVG(llr), 6) AS dsir_logweight
  FROM (SELECT doc_id, {b} % {B} AS b FROM tok) dt
  JOIN llr USING (b)
  GROUP BY doc_id
)
SELECT documents.doc_id, lang, source, n_tokens, dsir_logweight
FROM {DOCS_SQL} JOIN scored ON documents.doc_id = scored.doc_id"""


SAMPLE_DSIR_SQL = _dsir_sql()


def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The evaluation-hygiene audit that composes the split with
    near-dedup: which NEAR-DUPLICATE pairs straddle the
    train/validation/test boundary? A doc_id-hash split is disjoint by
    id but says nothing about near-identical *content* landing on both
    sides — exactly the leak that inflates eval scores. Emits one row
    per unordered split-pair cell: ``(split_a, split_b, n_pairs,
    max_jaccard, is_leak)`` with ``is_leak`` true off the diagonal;
    a clean corpus shows leak cells with n_pairs = 0 absent.

    Scale shape: the pair relation is `dedup_ngram_jaccard`'s (near-dup-
    sized, shingle-equi-join candidates — never corpus²); the split
    assignment is a projection computable ON the pair relation's id
    columns directly (no join against the corpus at all — the same
    recompute-anywhere property that makes the split coordination-free);
    the rollup is ≤ 6 cells."""
    from c4_5decisiontreebasedonmapreduce_spark.operators.dedup import (
        dedup_ngram_jaccard,
    )

    lo, hi = SPLIT_BOUNDS

    def split_of(idc: Column) -> Column:
        u = md5_long(F.concat(F.lit(_SPLIT_SEED), idc.cast("string"))) % 10000
        return (
            F.when(u < lo, "train")
            .when(u < hi, "validation")
            .otherwise("test")
        )

    pairs = dedup_ngram_jaccard(spark, sf_dir).select(
        split_of(F.col("doc_a")).alias("sa"),
        split_of(F.col("doc_b")).alias("sb"),
        "jaccard",
    )
    return (
        pairs.select(
            F.least("sa", "sb").alias("split_a"),
            F.greatest("sa", "sb").alias("split_b"),
            "jaccard",
        )
        .groupBy("split_a", "split_b")
        .agg(
            F.count("*").alias("n_pairs"),
            F.max("jaccard").alias("max_jaccard"),
        )
        .withColumn("is_leak", F.col("split_a") != F.col("split_b"))
    )


def _split_leakage_sql() -> str:
    from c4_5decisiontreebasedonmapreduce_spark.operators.dedup import (
        DEDUP_NGRAM_SQL,
    )

    lo, hi = SPLIT_BOUNDS

    def split_of(expr: str) -> str:
        u = md5_long_sql(
            "CONCAT('" + _SPLIT_SEED + f"', CAST({expr} AS VARCHAR))"
        )
        return (
            f"CASE WHEN {u} % 10000 < {lo} THEN 'train'"
            f" WHEN {u} % 10000 < {hi} THEN 'validation'"
            f" ELSE 'test' END"
        )

    return f"""
WITH pairs AS ({DEDUP_NGRAM_SQL.strip()}
),
tagged AS (
  SELECT {split_of("doc_a")} AS sa, {split_of("doc_b")} AS sb, jaccard
  FROM pairs
)
SELECT LEAST(sa, sb) AS split_a, GREATEST(sa, sb) AS split_b,
       COUNT(*) AS n_pairs, MAX(jaccard) AS max_jaccard,
       LEAST(sa, sb) <> GREATEST(sa, sb) AS is_leak
FROM tagged
GROUP BY 1, 2"""


SPLIT_LEAKAGE_SQL = _split_leakage_sql()


# -- persisted DSIR model: train offline, score at ingest ----------------------
#
# The same amortization contract as text.write_lm_table and the persisted
# dedup corpora: the importance model is a pure function of the (slowly
# changing) corpus + target slice, so it is trained ONCE and every
# arriving batch is scored against the persisted table — only batch-sized
# relations are computed per ingest. The model is DENSE (all B buckets,
# B = 1024 rows): a batch token can land in a bucket the corpus never
# produced, whose smoothed llr is ln((nr+B)/(nt+B)), not 0 — densifying
# at write time keeps scoring a plain inner join with no backoff branch.
DSIR_BATCH_MOD = 10
DSIR_BATCH_REM = 7


def _dsir_llr_dense(
    spark: SparkSession,
    tok,
    target_lang: str,
    n_buckets: int,
) -> DataFrame:
    """Dense per-bucket add-one-smoothed log-likelihood-ratio table from
    a ``(doc_id, lang, t)`` token relation — one conditional aggregation
    over the exploded stream, left-joined onto the full bucket range."""
    bucket = (
        md5_long(F.concat(F.lit(_DSIR_SEED), F.col("t"))) % n_buckets
    ).alias("b")
    counts = (
        tok.select(bucket, "lang")
        .groupBy("b")
        .agg(
            F.count("*").alias("cr"),
            F.sum(
                F.when(F.col("lang") == target_lang, 1).otherwise(0)
            ).alias("ct"),
        )
    )
    totals = counts.agg(F.sum("cr").alias("nr"), F.sum("ct").alias("nt"))
    return (
        spark.range(n_buckets)
        .select(F.col("id").alias("b"))
        .join(counts, "b", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + 1)
                    / (F.col("nt") + n_buckets)
                )
                - F.log(
                    (F.coalesce(F.col("cr"), F.lit(0)) + 1)
                    / (F.col("nr") + n_buckets)
                )
            ).alias("llr"),
        )
    )


def write_dsir_model(
    spark: SparkSession,
    sf_dir: str,
    table: str = "dsir_llr",
    target_lang: str = DSIR_TARGET_LANG,
    n_buckets: int = DSIR_BUCKETS,
    path: str | None = None,
) -> DataFrame:
    """Persist the DSIR importance model trained on the CORPUS slice
    (``doc_id % {mod} != {rem}``) as the dense B-row llr table. B rows
    (kilobytes) — read + broadcast at every scoring pass; no bucketed
    layout needed."""
    d = docs(spark, sf_dir).where(
        (F.col("doc_id") % DSIR_BATCH_MOD) != DSIR_BATCH_REM
    )
    tok = d.select(
        "doc_id", "lang", F.explode(tokens_col(F.col("text"))).alias("t")
    )
    llr = _dsir_llr_dense(spark, tok, target_lang, n_buckets)
    writer = llr.write.mode("overwrite")
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
    return spark.table(table)


def sample_dsir_persisted(
    spark: SparkSession,
    sf_dir: str,
    table: str | None = None,
    target_lang: str = DSIR_TARGET_LANG,
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Score the BATCH slice (``doc_id % {mod} == {rem}`` — the arriving
    documents) against the PERSISTED importance model
    (:func:`write_dsir_model`): ingest-time domain-relevance scoring
    with the model trained offline, the DSIR counterpart of
    `lm_perplexity_persisted`.

    Scale shape: only batch-sized relations are computed — the corpus
    appears solely through the B-row persisted table, which broadcasts
    into the scoring join; one exploded pass over the batch, per-doc
    mean with map-side partials. Pass ``table=None`` to train the model
    in-memory (the untabled twin, used by the equality pin)."""
    if table is not None:
        llr = spark.table(table)
    else:
        d = docs(spark, sf_dir).where(
            (F.col("doc_id") % DSIR_BATCH_MOD) != DSIR_BATCH_REM
        )
        tok = d.select(
            "doc_id", "lang",
            F.explode(tokens_col(F.col("text"))).alias("t"),
        )
        llr = _dsir_llr_dense(spark, tok, target_lang, n_buckets)
    batch = docs(spark, sf_dir).where(
        (F.col("doc_id") % DSIR_BATCH_MOD) == DSIR_BATCH_REM
    )
    bucket = (
        md5_long(F.concat(F.lit(_DSIR_SEED), F.col("t"))) % n_buckets
    ).alias("b")
    scored = (
        batch.select(
            "doc_id", F.explode(tokens_col(F.col("text"))).alias("t")
        )
        .select("doc_id", bucket)
        .join(F.broadcast(llr), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg("llr"), 6).alias("dsir_logweight"),
        )
    )
    return (
        batch.select("doc_id", "lang", "source")
        .join(scored, "doc_id")
        .select("doc_id", "lang", "source", "n_tokens", "dsir_logweight")
    )


def _dsir_persisted_sql() -> str:
    b = md5_long_sql("CONCAT('" + _DSIR_SEED + "', t)")
    B = DSIR_BUCKETS
    return f"""
WITH tok AS (
  SELECT doc_id, lang, UNNEST({_tokens_sql("text")}) AS t FROM {DOCS_SQL}
  WHERE doc_id % {DSIR_BATCH_MOD} <> {DSIR_BATCH_REM}
),
counts AS (
  SELECT {b} % {B} AS b, COUNT(*) AS cr,
         SUM(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END) AS ct
  FROM tok GROUP BY 1
),
totals AS (SELECT SUM(cr) AS nr, SUM(ct) AS nt FROM counts),
llr AS (
  SELECT r.range AS b,
         LN((COALESCE(ct, 0) + 1) / CAST(nt + {B} AS DOUBLE))
         - LN((COALESCE(cr, 0) + 1) / CAST(nr + {B} AS DOUBLE)) AS llr
  FROM RANGE({B}) r LEFT JOIN counts ON r.range = counts.b
  CROSS JOIN totals
),
btok AS (
  SELECT doc_id, {b} % {B} AS b
  FROM (SELECT doc_id, UNNEST({_tokens_sql("text")}) AS t FROM {DOCS_SQL}
        WHERE doc_id % {DSIR_BATCH_MOD} = {DSIR_BATCH_REM}) bt
),
scored AS (
  SELECT doc_id, COUNT(*) AS n_tokens, ROUND(AVG(llr), 6) AS dsir_logweight
  FROM btok JOIN llr USING (b)
  GROUP BY doc_id
)
SELECT documents.doc_id, lang, source, n_tokens, dsir_logweight
FROM {DOCS_SQL} JOIN scored ON documents.doc_id = scored.doc_id"""


SAMPLE_DSIR_PERSISTED_SQL = _dsir_persisted_sql()


# ---------------------------------------------------------------------------
# cluster-balanced diversity sampling over embeddings

# per-centroid keep cap. 30 is BINDING at every test scale factor (500
# vectors over ~10 centroids average 50 per cluster), so the sampler
# actually truncates — not a wall of pass-throughs.
CBAL_CAP = 30
_CBAL_SEED = "cbal|"


def _nearest_assignments(e, cents) -> DataFrame:
    """Each vector's single nearest codebook centroid — ``(vec_id,
    centroid_id)``. The rank-1 specialization of dedup's multi-probe
    `_emb_assignments`: corpus × broadcast codebook, per-vector argmax
    window, payload projected away at the end."""
    from c4_5decisiontreebasedonmapreduce_spark.operators.dedup import (
        _dot_double,
    )

    c_cos = F.try_divide(
        _dot_double(F.col("emb"), F.col("c_emb")),
        F.col("norm") * F.col("c_norm"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("c_cos"), F.asc("centroid_id")
    )
    return (
        e.crossJoin(F.broadcast(cents))
        .withColumn("c_cos", c_cos)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "centroid_id")
    )


def write_cluster_assignments(
    spark: SparkSession,
    sf_dir: str,
    table: str = "cbal_assign",
    n_buckets: int = 8,
    path: str | None = None,
) -> DataFrame:
    """Persist the nearest-1 centroid assignment ``(vec_id,
    centroid_id)`` BUCKETED BY ``centroid_id`` — the artifact that makes
    :func:`sample_cluster_balanced` Exchange-FREE: the cap window's
    required hash distribution on centroid_id is exactly the table's
    bucketing, so re-sampling (any cap, any seed) is a bucketed scan +
    in-partition sort, zero shuffles (plan-pinned). The expensive part —
    the corpus × codebook assignment — runs once at write time; two
    int64s per vector, the same ~1% manifest economics as
    `write_embedding_corpus`."""
    from c4_5decisiontreebasedonmapreduce_spark.operators.dedup import (
        _emb_centroids,
        embeddings_with_norm,
    )

    e = embeddings_with_norm(spark, sf_dir).localCheckpoint()
    assign = _nearest_assignments(e, _emb_centroids(e))
    writer = (
        assign.write.mode("overwrite")
        .bucketBy(n_buckets, "centroid_id")
        .sortBy("centroid_id")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
    return spark.table(table)


def sample_cluster_balanced(
    spark: SparkSession,
    sf_dir: str,
    cap: int = CBAL_CAP,
    assign: DataFrame | None = None,
) -> DataFrame:
    """Embedding-cluster-balanced diversity sampling: assign every
    vector to its single nearest codebook centroid and keep at most
    ``cap`` per cluster — the DEDUPLICATE-BY-DIVERSITY selection (a
    dominant template cluster contributes ``cap`` examples, a rare
    cluster survives whole) that complements the per-language /
    per-source mixing samplers with a SEMANTIC axis. The within-cluster
    pick is deterministic hash order (same portable-MD5 convention as
    every sampler here), so re-runs and backfills keep the same rows.

    Returns ``(vec_id, centroid_id, rank)`` for the kept vectors.

    Scale shape: nearest-centroid assignment is the corpus against the
    tiny BROADCAST codebook (the shared deterministic pseudo-codebook,
    dedup.py `_emb_centroids`; similarity.kmeans_codebook supplies real
    centroids) — never an N×N pass; the cap window then shuffles ONLY
    the ``(vec_id, centroid_id, hash)`` projection on the centroid key
    — the embedding payload is projected away before the exchange, so
    the shuffled bytes are key-width, not vector-width. With the
    persisted centroid-bucketed assignment table
    (:func:`write_cluster_assignments`) even that exchange disappears:
    the bucketing IS the window's distribution — pass ``assign`` to
    sample from it."""
    from c4_5decisiontreebasedonmapreduce_spark.operators.dedup import (
        _emb_centroids,
        embeddings_with_norm,
    )

    if assign is None:
        # the normed relation feeds the codebook filter AND the
        # assignment crossJoin — materialize once (the dedup_embedding
        # convention; the decimal transform is the expensive part, not
        # the scan)
        e = embeddings_with_norm(spark, sf_dir).localCheckpoint()
        assign = _nearest_assignments(e, _emb_centroids(e))
    u = md5_long(
        F.concat(F.lit(_CBAL_SEED), F.col("vec_id").cast("string"))
    )
    w_rank = Window.partitionBy("centroid_id").orderBy(
        u.asc(), F.col("vec_id").asc()
    )
    return (
        assign.withColumn("rank", F.row_number().over(w_rank))
        .where(F.col("rank") <= cap)
        .select("vec_id", "centroid_id", "rank")
    )


def _cbal_sql() -> str:
    from c4_5decisiontreebasedonmapreduce_spark.operators.dedup import (
        _EMB_ELEMS_SQL,
        CENTROID_STRIDE,
    )

    u = md5_long_sql(
        f"CONCAT('{_CBAL_SEED}', CAST(vec_id AS VARCHAR))"
    )
    return f"""
WITH {_EMB_ELEMS_SQL.strip()},
vc AS (
  SELECT v.vec_id, c.vec_id AS centroid_id,
         CAST(SUM(CAST(v.x * c.x AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM elems v JOIN elems c ON v.i = c.i AND c.vec_id % {CENTROID_STRIDE} = 0
  GROUP BY 1, 2
),
assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT vc.vec_id, vc.centroid_id,
           ROW_NUMBER() OVER (
             PARTITION BY vc.vec_id
             ORDER BY vc.dot / (nv.norm * nc.norm) DESC, vc.centroid_id ASC
           ) AS rn
    FROM vc
    JOIN norms nv ON nv.vec_id = vc.vec_id
    JOIN norms nc ON nc.vec_id = vc.centroid_id)
  WHERE rn = 1
)
SELECT vec_id, centroid_id, rank FROM (
  SELECT vec_id, centroid_id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY centroid_id
           ORDER BY {u} ASC, vec_id ASC
         ) AS INT) AS rank
  FROM assign)
WHERE rank <= {CBAL_CAP}"""


SAMPLE_CLUSTER_BALANCED_SQL = _cbal_sql()


# ---------------------------------------------------------------------------
# perplexity-percentile data selection (CCNet-style)


def sample_perplexity_filter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CCNet-style perplexity data selection (Wenzek et al. 2020): keep
    the fluent half of each language — documents whose corpus-LM bits
    per bigram (:func:`~...operators.text.lm_perplexity`) are at or
    below their language's MEDIAN. The per-language cutoff makes the
    selection mix-neutral: a verbose language isn't penalized against a
    terse one, each stratum keeps its own head+middle.

    Cutoff comparison is hash-grade SAFE by construction at q=0.5:
    ``(n-1)*0.5`` is binary-exact so the PERCENTILE_CONT interpolation
    fraction is exactly 0 (cutoff == a realized value, returned exactly
    by both engines) or exactly 0.5 (cutoff strictly BETWEEN two
    adjacent realized values — a last-ulp engine difference cannot
    reclassify any document). Documents with < 2 tokens have no
    perplexity and are absent, same as the scorer.

    Scale shape: adds to lm_perplexity's one corpus pass a
    language-sized cutoff aggregate broadcast back onto the scored
    relation — the corpus is never re-shuffled; the exact per-group
    percentile sorts within language partitions (the audited-exactness
    path of `agg_percentiles`; at 100 TB swap in the approx sketch)."""
    from c4_5decisiontreebasedonmapreduce_spark.operators.text import (
        lm_perplexity,
    )

    scored = lm_perplexity(spark, sf_dir).join(
        docs(spark, sf_dir).select("doc_id", "lang"), "doc_id"
    )
    cutoffs = scored.groupBy("lang").agg(
        F.percentile("bits_per_bigram", F.lit(0.5)).alias("cutoff")
    )
    return (
        scored.join(F.broadcast(cutoffs), "lang")
        .where(F.col("bits_per_bigram") <= F.col("cutoff"))
        .select("doc_id", "lang", "n_bigrams", "bits_per_bigram")
    )


def _perplexity_filter_sql() -> str:
    from c4_5decisiontreebasedonmapreduce_spark.operators.text import (
        LM_PERPLEXITY_SQL,
    )

    return f"""
WITH ppl AS (
  SELECT * FROM ({LM_PERPLEXITY_SQL.strip()})
),
scored AS (
  SELECT ppl.doc_id, documents.lang, ppl.n_bigrams, ppl.bits_per_bigram
  FROM ppl JOIN {DOCS_SQL} ON documents.doc_id = ppl.doc_id
),
cut AS (
  SELECT lang,
         PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY bits_per_bigram)
           AS cutoff
  FROM scored GROUP BY lang
)
SELECT s.doc_id, s.lang, s.n_bigrams, s.bits_per_bigram
FROM scored s JOIN cut ON cut.lang = s.lang
WHERE s.bits_per_bigram <= cut.cutoff"""


SAMPLE_PERPLEXITY_FILTER_SQL = _perplexity_filter_sql()
