"""Text-analysis operators over the `documents` table.

The LLM-data-pipeline extension surface (SURVEY.md §2.C): tokenization,
document statistics + quality scoring, heuristic language ID, TF-IDF, and
content fingerprinting. Everything is built from JVM-side Column
expressions (no Python UDFs in any hot path) so the plans stay inside
whole-stage codegen and scale linearly with a groupBy/explode shuffle at
most.

Shared tokenization convention (Spark and the DuckDB oracles use the
exact same definition): lowercase, split on runs of non-alphanumerics,
drop empty tokens.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from c4_5decisiontreebasedonmapreduce_spark.sources.parquet import load_table

TOKEN_SPLIT_RE = "[^a-z0-9]+"

# tiny embedded English stopword list for the language/quality heuristics
STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "on",
    "for", "with", "as", "by", "at", "it",
]

# NULL text normalizes to '' before ANY formula. Without this, Spark's
# null-skipping LEAST/GREATEST hand a NULL document quality_score 0.7 —
# sailing it through curation gates — and MD5(NULL) = NULL groups every
# null-text doc as one giant "duplicate" cluster. The driver corpus has
# no null text (graded values unchanged); this is a robustness contract
# for real corpora, pinned by tests/test_edge_cases.py.
def docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents table with the null-to-'' text normalization — the
    single loader every text/dedup/pipeline operator scans."""
    return load_table(spark, sf_dir, "documents").withColumn(
        "text", F.coalesce(F.col("text"), F.lit(""))
    )


# FROM-clause twin of :func:`docs` for the DuckDB oracles
DOCS_SQL = (
    "(SELECT doc_id, COALESCE(text, '') AS text, lang, source, n_chars"
    " FROM documents) documents"
)


# Below this input-size estimate a narrow scan stays serial: the r12
# round measured spread-if-narrow as a NET LOSS on every light scoring
# projection at sf0.1 (~0.6 MB documents file — lm_perplexity 1.69→2.53,
# corpus_report 0.87→1.48, curation 0.79→1.17, mixture 0.85→0.96 s: the
# exchange + 32-task scheduling is pure overhead when the whole scan is
# a 0.5 s single task), while the r13 ×10 scale probe (7.3 MB file)
# measured the REVERSE on the same five queries (lm_perplexity 9.9→4.8,
# corpus_report 4.9→2.0, curation 5.0→1.6, tfidf 4.6→1.7, mixture
# 1.75→1.23 s). 4 MB sits between the two measured regimes; override
# for hosts with very different core counts or storage.
SPREAD_MIN_BYTES = int(
    os.environ.get("SPARK_GRAFT_SPREAD_MIN_BYTES", str(4 << 20))
)


def spread_if_heavy(d: DataFrame) -> DataFrame:
    """Repartition a narrow scan across the cluster ONLY when the
    input-size estimate says the per-row work will dominate the
    exchange (guide §2.2/§2.6) — the scale-adaptive form of the
    spread-if-narrow decision, so neither regime is hard-coded. At
    cluster scale the scan already has ≥ parallelism partitions and
    this is a no-op either way."""
    spark = d.sparkSession
    par = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() >= par:
        return d
    size = int(
        str(d._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    )
    if size < SPREAD_MIN_BYTES:
        return d
    return d.repartition(par)


def tokens_col(text: Column) -> Column:
    """Array of tokens under the shared convention."""
    return F.filter(
        F.split(F.lower(text), TOKEN_SPLIT_RE), lambda t: t != ""
    )


def _tokens_sql(expr: str) -> str:
    return (
        f"LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(LOWER({expr}), '{TOKEN_SPLIT_RE}'),"
        " t -> t <> '')"
    )


def tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode documents to (doc_id, token) rows — the basis for
    inverted-index / shingle / TF-IDF pipelines."""
    d = docs(spark, sf_dir)
    return d.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("token")
    )


TOKENIZE_SQL = f"""
SELECT doc_id, UNNEST({_tokens_sql('text')}) AS token FROM {DOCS_SQL}"""


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document statistics + quality score: token counts (whitespace
    and regex tokenizations), character ratios, stopword ratio, and a
    deterministic composite quality score in [0, 1]. Also carries the
    doc_fingerprint columns (MD5 + 60-bit int of normalized text) so the
    fingerprinting operator stays hash-graded inside the driver's
    50-entry window (doc_fingerprint itself is registered in the
    rows-only tail)."""
    d = docs(spark, sf_dir)
    normalized = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    from c4_5decisiontreebasedonmapreduce_spark.functions.hashing import (
        md5_long,
    )
    toks = tokens_col(F.col("text"))
    n_tokens = F.size(toks)
    n_ws = F.size(
        F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    )
    n_chars = F.length("text")
    n_punct = n_chars - F.length(
        F.regexp_replace(F.col("text"), r"[.,;:!?'\"()-]", "")
    )
    n_stop = F.size(
        F.filter(toks, lambda t: t.isin(STOPWORDS))
    )
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    avg_tok_len = F.when(
        n_tokens > 0,
        F.aggregate(
            toks, F.lit(0), lambda acc, t: acc + F.length(t)
        ).cast("double")
        / n_tokens,
    ).otherwise(F.lit(0.0))
    quality = (
        F.lit(0.5) * F.least(n_tokens / F.lit(50.0), F.lit(1.0))
        + F.lit(0.3) * F.least(stop_ratio * 5, F.lit(1.0))
        + F.lit(0.2) * F.greatest(F.lit(1.0) - punct_ratio * 10, F.lit(0.0))
    )
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_ws.alias("n_ws_tokens"),
        n_chars.cast("int").alias("n_chars"),
        F.round(avg_tok_len, 6).alias("avg_token_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(quality, 6).alias("quality_score"),
        F.md5(normalized).alias("fingerprint"),
        md5_long(normalized).alias("fingerprint_int"),
    )


_STOP_LIST_SQL = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"

TEXT_STATS_SQL = f"""
WITH base AS (
  SELECT doc_id, text,
         {_tokens_sql('text')} AS toks,
         LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'), t -> t <> '') AS ws,
         REGEXP_REPLACE(LOWER(TRIM(text)), '\\s+', ' ', 'g') AS norm
  FROM {DOCS_SQL}
),
m AS (
  SELECT doc_id,
         MD5(norm) AS fingerprint,
         CAST(CONCAT('0x', SUBSTR(MD5(norm), 1, 15)) AS BIGINT)
             AS fingerprint_int,
         LEN(toks) AS n_tokens,
         LEN(ws) AS n_ws_tokens,
         CAST(LENGTH(text) AS INT) AS n_chars,
         LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[.,;:!?''"()-]', '', 'g'))
             AS n_punct,
         LEN(LIST_FILTER(toks, t -> LIST_CONTAINS({_STOP_LIST_SQL}, t)))
             AS n_stop,
         CASE WHEN LEN(toks) > 0
              THEN CAST(LIST_SUM(LIST_TRANSFORM(toks, t -> LENGTH(t))) AS DOUBLE)
                   / LEN(toks)
              ELSE 0.0 END AS avg_tok
  FROM base
)
SELECT doc_id,
  CAST(n_tokens AS INT) AS n_tokens,
  CAST(n_ws_tokens AS INT) AS n_ws_tokens,
  n_chars,
  ROUND(avg_tok, 6) AS avg_token_len,
  ROUND(CASE WHEN n_chars > 0 THEN n_punct / CAST(n_chars AS DOUBLE) ELSE 0.0 END, 6)
      AS punct_ratio,
  ROUND(CASE WHEN n_tokens > 0 THEN n_stop / CAST(n_tokens AS DOUBLE) ELSE 0.0 END, 6)
      AS stopword_ratio,
  ROUND(0.5 * LEAST(n_tokens / 50.0, 1.0)
      + 0.3 * LEAST(CASE WHEN n_tokens > 0 THEN n_stop / CAST(n_tokens AS DOUBLE)
                         ELSE 0.0 END * 5, 1.0)
      + 0.2 * GREATEST(1.0 - CASE WHEN n_chars > 0
                                  THEN n_punct / CAST(n_chars AS DOUBLE)
                                  ELSE 0.0 END * 10, 0.0), 6)
      AS quality_score,
  fingerprint,
  fingerprint_int
FROM m"""


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: ASCII-pure text with enough English
    stopwords → 'en', else 'und'. (Byte length == char length detects
    ASCII purity without locale-sensitive regexes.)"""
    d = docs(spark, sf_dir)
    toks = tokens_col(F.col("text"))
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    is_ascii = F.octet_length("text") == F.length("text")
    pred = F.when(
        is_ascii & (n_tokens > 0) & (n_stop / n_tokens >= 0.05), "en"
    ).otherwise("und")
    return d.select(
        "doc_id", pred.alias("lang_pred"), F.col("lang").alias("lang_actual")
    )


LANG_ID_SQL = f"""
WITH t AS (
  SELECT doc_id, lang,
         {_tokens_sql('text')} AS toks,
         OCTET_LENGTH(ENCODE(text)) = LENGTH(text) AS is_ascii
  FROM {DOCS_SQL}
)
SELECT doc_id,
  CASE WHEN is_ascii AND LEN(toks) > 0
            AND LEN(LIST_FILTER(toks, x -> LIST_CONTAINS({_STOP_LIST_SQL}, x)))
                / CAST(LEN(toks) AS DOUBLE) >= 0.05
       THEN 'en' ELSE 'und' END AS lang_pred,
  lang AS lang_actual
FROM t"""


def tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full (doc, token) TF-IDF relation: tf raw count, smoothed idf
    ``ln((1+N)/(1+df)) + 1``. One explode + two hash aggregates + a
    broadcast of the single-row corpus size.

    The document-frequency relation is deliberately NOT broadcast-hinted:
    it has one row per distinct token, and a web-scale corpus vocabulary
    (10^8-10^9 tokens) would OOM a forced broadcast. AQE still picks a
    broadcast join at small scale on its own; at large scale both sides
    are already hash-partitioned by token from their aggregations, so the
    sort-merge join reuses the exchange."""
    # size-adaptive spread (r13): the ×10 probe read 4.58→1.73 s with
    # the explode spread; below SPREAD_MIN_BYTES it stays serial
    d = spread_if_heavy(docs(spark, sf_dir))
    # materialize tf once: it is both the join's left side and the input
    # to the document-frequency rollup, and exchange reuse does not cover
    # the two copies — un-checkpointed, the corpus explode+count ran
    # twice (3 parquet scans in the AQE final plan; now 1 + the
    # column-less count scan for N)
    tf = (
        d.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint()
    )
    df_ = tf.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n = d.select(F.count("*").alias("n_docs"))
    return (
        tf.join(df_, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1),
                6,
            ).alias("tfidf"),
        )
    )


TFIDF_SQL = f"""
WITH tok AS (
  SELECT doc_id, UNNEST({_tokens_sql('text')}) AS token FROM {DOCS_SQL}
),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY token),
n AS (SELECT COUNT(*) AS n_docs FROM {DOCS_SQL})
SELECT tf.doc_id, tf.token, tf.tf, df.df,
  ROUND(tf.tf * (LN((n.n_docs + 1) / CAST(df.df + 1 AS DOUBLE)) + 1), 6) AS tfidf
FROM tf JOIN df USING (token) CROSS JOIN n"""


LM_VOCAB_TOP = 50_000
LM_UNK = "<unk>"


def lm_perplexity(
    spark: SparkSession,
    sf_dir: str,
    top_v: int = LM_VOCAB_TOP,
    d: DataFrame | None = None,
) -> DataFrame:
    """CCNet-style language-model quality scoring WITHOUT an external
    model: train an add-one-smoothed bigram LM on the corpus itself in
    one pass, then score every document's average per-bigram surprisal
    ``bits = mean(-log2 p(w_i | w_{i-1}))`` — low = fluent/templated,
    high = noise. The vocabulary is the top ``top_v`` unigrams by
    (count DESC, token ASC — a deterministic tie-break); everything
    else maps to ``<unk>``, so the LM tables are bounded by the
    configured vocabulary, never by the corpus.

    ``p(w2|w1) = (C(w1,w2) + 1) / (C(w1·) + V)`` where ``C(w1·)``
    counts w1 as a bigram PREFIX (so the conditional normalizes) and
    ``V`` = realized vocabulary + 1 for unk. Documents with < 2 tokens
    emit no bigrams and are absent from the result (pinned in tests).

    Scale shape (mirrors :func:`tfidf`): the token-array relation is
    checkpointed once and feeds the vocab count, the bigram build, and
    the scoring join; bigrams come straight off the array
    (``explode(sequence)`` + ``element_at`` — no per-doc window, so no
    corpus shuffle to build them); the vocab is a
    ``TakeOrderedAndProject`` top-V broadcast back onto the stream; the
    per-(doc, bigram) counts are aggregated first so the LM joins touch
    the distinct-bigram relation, not raw occurrences. The LM count
    tables are deliberately NOT broadcast-hinted — V = 50k means up to
    V² bigram rows at web scale; AQE broadcasts them at small scale on
    its own (same rationale as tfidf's df relation). Pass ``d`` to
    score an injected relation (tests hand-compute a tiny LM and force
    the unk path with a small ``top_v``)."""
    if d is None:
        # size-adaptive spread (r13, replaces the r12 blanket revert):
        # serial below SPREAD_MIN_BYTES where the 0.45 s single-task
        # job is fixed overhead (spreading regressed 1.69→2.53 s at
        # sf0.1), spread above it where the tokenize is row work
        # (9.88→4.81 s at the ×10 probe scale).
        d = spread_if_heavy(docs(spark, sf_dir))
    base = d.select(
        "doc_id", tokens_col(F.col("text")).alias("toks")
    ).localCheckpoint()
    vocab = _lm_vocab(base, top_v)
    v_size = vocab.select((F.count("*") + 1).alias("v"))
    dbg = (
        _lm_unk_mapped(_lm_bigram_rows(base), vocab)
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count("*").alias("c"))
        .localCheckpoint()
    )
    bc = dbg.groupBy("w1", "w2").agg(F.sum("c").alias("c12"))
    uc = dbg.groupBy("w1").agg(F.sum("c").alias("c1"))
    return _lm_doc_bits(dbg, bc, uc, v_size)


def _lm_vocab(base: DataFrame, top_v: int) -> DataFrame:
    """Top-``top_v`` unigrams of a ``(doc_id, toks)`` relation with the
    deterministic (count DESC, token ASC) tie-break — a streaming top-K
    (TakeOrderedAndProject), never a global sort."""
    return (
        base.select(F.explode("toks").alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "token")
        .limit(top_v)
        .select("token")
    )


def _lm_bigram_rows(base: DataFrame) -> DataFrame:
    """``(doc_id, w1raw, w2raw)`` adjacent-bigram occurrences straight
    off the token arrays — no per-doc window, no corpus shuffle."""
    n = F.size("toks")
    return base.where(n >= 2).select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), n - 1)).alias("pos"),
        "toks",
    ).select(
        "doc_id",
        F.element_at("toks", F.col("pos")).alias("w1raw"),
        F.element_at("toks", F.col("pos") + 1).alias("w2raw"),
    )


def _lm_unk_mapped(bg: DataFrame, vocab: DataFrame) -> DataFrame:
    """Map both bigram slots through the (broadcast) vocabulary —
    out-of-vocabulary tokens become ``<unk>``."""

    def unk_map(raw: str, out: str):
        alias = f"v_{out}"
        return (
            F.when(
                F.col(f"{alias}.token").isNotNull(), F.col(raw)
            ).otherwise(F.lit(LM_UNK)).alias(out)
        )

    return (
        bg.join(
            F.broadcast(vocab.alias("v_w1")),
            F.col("w1raw") == F.col("v_w1.token"),
            "left",
        )
        .join(
            F.broadcast(vocab.alias("v_w2")),
            F.col("w2raw") == F.col("v_w2.token"),
            "left",
        )
        .select("doc_id", unk_map("w1raw", "w1"), unk_map("w2raw", "w2"))
    )


def _lm_doc_bits(
    dbg: DataFrame, bc: DataFrame, uc: DataFrame, v_size: DataFrame
) -> DataFrame:
    """Per-doc average surprisal from per-(doc, bigram) counts and the
    LM count tables. LEFT joins with 0 defaults so the same path scores
    bigrams the LM never saw (the persisted train/score split) —
    equivalent to inner joins when the LM was trained on the scored
    corpus itself. ``uc`` is broadcast-hinted: it has at most V+1 rows
    BY CONSTRUCTION (w1 ∈ vocab ∪ unk), unlike the V²-bounded ``bc``."""
    bits = -F.log2(
        (F.coalesce(F.col("c12"), F.lit(0)) + 1)
        / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v"))
    )
    return (
        dbg.join(bc, ["w1", "w2"], "left")
        .join(F.broadcast(uc), "w1", "left")
        .crossJoin(F.broadcast(v_size))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            F.round(
                F.sum(F.col("c") * bits) / F.sum("c"), 6
            ).alias("bits_per_bigram"),
        )
    )


# train/score split for the persisted LM (the "train offline, score at
# ingest" shape): the LM trains on the corpus slice, arriving documents
# are the held-out batch slice — the same deterministic doc_id split
# convention as the incremental dedup family (dedup.py INCR_BATCH_*),
# restated locally to keep text ↔ dedup import-acyclic.
LM_BATCH_MOD = 10
LM_BATCH_REM = 7


def _lm_vocab_cte_sql(src: str, top_v: int) -> str:
    return f"""vocab AS (
  SELECT token FROM (
    SELECT UNNEST(toks) AS token FROM {src}
  ) GROUP BY token ORDER BY COUNT(*) DESC, token LIMIT {top_v}
),
vsize AS (SELECT COUNT(*) + 1 AS v FROM vocab)"""


def _lm_bigram_map_cte_sql(src: str, bgr: str, mapped: str, with_doc: bool) -> str:
    """The bigram-build + unk-map CTE pair over ``src`` — ONE emitter
    for the in-session oracle and both halves (train/score) of the
    persisted oracle, so a position-bound or unk-map fix can never be
    applied to one copy and missed in another."""
    doc = "doc_id, " if with_doc else ""
    return f"""{bgr} AS (
  SELECT {doc}toks[pos] AS w1raw, toks[pos + 1] AS w2raw
  FROM (
    SELECT {doc}toks, UNNEST(GENERATE_SERIES(1, LEN(toks) - 1)) AS pos
    FROM {src} WHERE LEN(toks) >= 2
  )
),
{mapped} AS (
  SELECT {doc}CASE WHEN v1.token IS NOT NULL THEN w1raw ELSE '{LM_UNK}' END AS w1,
         CASE WHEN v2.token IS NOT NULL THEN w2raw ELSE '{LM_UNK}' END AS w2
  FROM {bgr} LEFT JOIN vocab v1 ON {bgr}.w1raw = v1.token
             LEFT JOIN vocab v2 ON {bgr}.w2raw = v2.token
)"""


def _lm_train(
    spark: SparkSession, sf_dir: str, top_v: int
) -> tuple:
    """Train the corpus-slice bigram LM once: ``(vocab, bigram counts,
    prefix counts)``. The ONE build shared by :func:`write_lm_table`
    and :func:`lm_perplexity_persisted`'s untabled twin — the
    persisted-vs-in-memory equality pin is structural, not two
    hand-kept copies."""
    d = docs(spark, sf_dir).where(
        (F.col("doc_id") % LM_BATCH_MOD) != LM_BATCH_REM
    )
    base = d.select(
        "doc_id", tokens_col(F.col("text")).alias("toks")
    ).localCheckpoint()
    vocab = _lm_vocab(base, top_v)
    bc = (
        _lm_unk_mapped(_lm_bigram_rows(base), vocab)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
        .localCheckpoint()  # feeds the bigram table AND the prefix rollup
    )
    uc = bc.groupBy("w1").agg(F.sum("c12").alias("c1"))
    return vocab, bc, uc


def write_lm_table(
    spark: SparkSession,
    sf_dir: str,
    table: str = "lm_bigrams",
    n_buckets: int = 8,
    path: str | None = None,
    top_v: int = LM_VOCAB_TOP,
) -> DataFrame:
    """Persist the bigram LM trained on the CORPUS slice
    (``doc_id % LM_BATCH_MOD != LM_BATCH_REM``) as three tables:
    ``{table}`` — (w1, w2, c12) bigram counts BUCKETED BY (w1, w2), the
    scoring join's key, so every future scoring batch joins the LM with
    NO Exchange on the LM side (the amortization of
    ``dedup.write_incremental_corpus``, applied to model state);
    ``{table}_prefix`` — (w1, c1) prefix counts and ``{table}_vocab`` —
    both ≤ V+1 rows by construction, read + broadcast at score time.
    Training runs ONCE; every micro-batch/ingest scoring pass afterwards
    touches only batch-sized data plus these tables."""
    vocab, occ, _uc = _lm_train(spark, sf_dir, top_v)
    writer = (
        occ.write.mode("overwrite")
        .bucketBy(n_buckets, "w1", "w2")
        .sortBy("w1", "w2")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
    uc_writer = _uc.write.mode("overwrite")
    if path is not None:
        uc_writer = uc_writer.option("path", path + "_prefix")
    uc_writer.saveAsTable(f"{table}_prefix")
    v_writer = vocab.write.mode("overwrite")
    if path is not None:
        v_writer = v_writer.option("path", path + "_vocab")
    v_writer.saveAsTable(f"{table}_vocab")
    return spark.table(table)


def lm_perplexity_persisted(
    spark: SparkSession,
    sf_dir: str,
    table: str | None = None,
) -> DataFrame:
    """Score the BATCH slice (``doc_id % LM_BATCH_MOD == LM_BATCH_REM``
    — the arriving documents) against the PERSISTED bigram LM
    (:func:`write_lm_table`): the ingest-time quality scoring every
    CCNet-style pipeline runs, with the model trained offline. Unseen
    bigrams back off through the LEFT-join defaults
    (``(0+1)/(c1+V)``, or ``1/V`` for a prefix the LM never saw).

    Scale shape: only batch-sized relations are computed here — the
    corpus appears solely through the three persisted tables; the
    bigram-count join reads the LM side pre-partitioned on (w1, w2)
    (bucketed scan, zero LM-side Exchange — plan-pinned); vocab and
    prefix tables are ≤ V+1 rows and broadcast. Pass ``table=None``
    to compute the LM in-memory (the untabled twin, used by the
    equality pin)."""
    if table is not None:
        bc = spark.table(table)
        uc = spark.table(f"{table}_prefix")
        vocab = spark.table(f"{table}_vocab")
    else:
        vocab, bc, uc = _lm_train(spark, sf_dir, LM_VOCAB_TOP)
    v_size = vocab.select((F.count("*") + 1).alias("v"))
    batch = docs(spark, sf_dir).where(
        (F.col("doc_id") % LM_BATCH_MOD) == LM_BATCH_REM
    )
    base_b = batch.select("doc_id", tokens_col(F.col("text")).alias("toks"))
    dbg = (
        _lm_unk_mapped(_lm_bigram_rows(base_b), F.broadcast(vocab))
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count("*").alias("c"))
    )
    return _lm_doc_bits(dbg, bc, uc, v_size)


def _lm_persisted_sql(top_v: int = LM_VOCAB_TOP) -> str:
    return f"""
WITH base AS (
  SELECT doc_id, {_tokens_sql('text')} AS toks FROM {DOCS_SQL}
),
train AS (SELECT * FROM base WHERE doc_id % {LM_BATCH_MOD} <> {LM_BATCH_REM}),
score AS (SELECT * FROM base WHERE doc_id % {LM_BATCH_MOD} = {LM_BATCH_REM}),
{_lm_vocab_cte_sql('train', top_v)},
{_lm_bigram_map_cte_sql('train', 'bgr_t', 'mapped_t', with_doc=False)},
bc AS (SELECT w1, w2, COUNT(*) AS c12 FROM mapped_t GROUP BY 1, 2),
uc AS (SELECT w1, SUM(c12) AS c1 FROM bc GROUP BY 1),
{_lm_bigram_map_cte_sql('score', 'bgr_s', 'mapped_s', with_doc=True)},
dbg AS (SELECT doc_id, w1, w2, COUNT(*) AS c FROM mapped_s GROUP BY 1, 2, 3)
SELECT dbg.doc_id,
       CAST(SUM(dbg.c) AS BIGINT) AS n_bigrams,
       ROUND(SUM(dbg.c * -LOG2((COALESCE(bc.c12, 0) + 1)
                               / CAST(COALESCE(uc.c1, 0) + vsize.v AS DOUBLE)))
             / SUM(dbg.c), 6) AS bits_per_bigram
FROM dbg LEFT JOIN bc USING (w1, w2) LEFT JOIN uc USING (w1)
CROSS JOIN vsize
GROUP BY dbg.doc_id"""


LM_PERSISTED_SQL = _lm_persisted_sql()


def _lm_perplexity_sql(top_v: int = LM_VOCAB_TOP) -> str:
    return f"""
WITH base AS (
  SELECT doc_id, {_tokens_sql('text')} AS toks FROM {DOCS_SQL}
),
{_lm_vocab_cte_sql('base', top_v)},
{_lm_bigram_map_cte_sql('base', 'bgr', 'mapped', with_doc=True)},
dbg AS (SELECT doc_id, w1, w2, COUNT(*) AS c FROM mapped GROUP BY 1, 2, 3),
bc AS (SELECT w1, w2, SUM(c) AS c12 FROM dbg GROUP BY 1, 2),
uc AS (SELECT w1, SUM(c) AS c1 FROM dbg GROUP BY 1)
SELECT dbg.doc_id,
       CAST(SUM(dbg.c) AS BIGINT) AS n_bigrams,
       ROUND(SUM(dbg.c * -LOG2((bc.c12 + 1) / CAST(uc.c1 + vsize.v AS DOUBLE)))
             / SUM(dbg.c), 6) AS bits_per_bigram
FROM dbg JOIN bc USING (w1, w2) JOIN uc USING (w1) CROSS JOIN vsize
GROUP BY dbg.doc_id"""


LM_PERPLEXITY_SQL = _lm_perplexity_sql()


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprints: MD5 of whitespace-normalized lowercased text
    (exact-dup key) plus a 60-bit integer rolling-hash-style variant."""
    d = docs(spark, sf_dir)
    normalized = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    from c4_5decisiontreebasedonmapreduce_spark.functions.hashing import (
        md5_long,
    )

    return d.select(
        "doc_id",
        F.md5(normalized).alias("fingerprint"),
        md5_long(normalized).alias("fingerprint_int"),
    )


DOC_FINGERPRINT_SQL = f"""
WITH n AS (
  SELECT doc_id,
         REGEXP_REPLACE(LOWER(TRIM(text)), '\\s+', ' ', 'g') AS norm
  FROM {DOCS_SQL}
)
SELECT doc_id, MD5(norm) AS fingerprint,
       CAST(CONCAT('0x', SUBSTR(MD5(norm), 1, 15)) AS BIGINT) AS fingerprint_int
FROM n"""


# GPT-2-style pre-tokenizer shape (ASCII-simplified so Java regex and RE2
# agree byte-for-byte): contractions, letter runs, digit runs, punctuation
# runs — the subword-ish unit count an LLM-data pipeline budgets by.
BPE_ISH_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token budget under a BPE-ish pre-tokenization,
    alongside the plain whitespace count — both pure regexp, no UDF."""
    d = docs(spark, sf_dir)
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_ISH_RE), 0))
    ws = F.size(
        F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    )
    return d.select(
        "doc_id",
        bpe.alias("n_bpe_tokens"),
        ws.alias("n_ws_tokens"),
        F.round(
            F.when(ws > 0, bpe.cast("double") / ws).otherwise(F.lit(0.0)), 6
        ).alias("bpe_per_word"),
    )


_BPE_SQL_RE = BPE_ISH_RE.replace("'", "''")

TOKEN_COUNT_BPE_SQL = f"""
SELECT doc_id,
       LEN(REGEXP_EXTRACT_ALL(text, '{_BPE_SQL_RE}')) AS n_bpe_tokens,
       LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'), t -> t <> ''))
         AS n_ws_tokens,
       ROUND(CASE WHEN LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'),
                                       t -> t <> '')) > 0
             THEN LEN(REGEXP_EXTRACT_ALL(text, '{_BPE_SQL_RE}'))
                  / CAST(LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'),
                                         t -> t <> '')) AS DOUBLE)
             ELSE 0.0 END, 6) AS bpe_per_word
FROM {DOCS_SQL}"""


def quality_signals(
    spark: SparkSession, sf_dir: str, d: DataFrame | None = None
) -> DataFrame:
    """Gopher-style repetition/quality signals per document, plus the
    resulting keep/drop gate — the filter pass a pre-training curation
    pipeline runs after dedup (Rae et al. 2021 repetition rules,
    re-expressed as grouped counts over exploded tokens/bigrams).

    Signals (all token-level, under the shared tokenizer convention):
    ``distinct_ratio`` (type/token ratio — low = repetitive),
    ``frac_alpha_words`` (words containing a letter — low = symbol soup),
    ``top_word_frac`` (most frequent word's share of all words),
    ``top_bigram_frac`` (most frequent adjacent bigram's share).

    Scale shape: two grouped counts over the exploded token/bigram
    relations (map-side combined; never a per-doc collect) joined back to
    the per-doc array stats — the same explode→count→argmax pattern as
    the reference's contingency+argmax core (MyReducer.java:51-92,
    Main.java:258-261), applied to text curation.

    Pass ``d`` to score an injected relation — e.g.
    :func:`~c4_5decisiontreebasedonmapreduce_spark.operators.dedup.dedup_cluster_keep_best`
    scores ONLY the clustered subset, so the token explode never runs
    over the full corpus for a pair-bounded survivor pick.
    """
    if d is None:
        d = docs(spark, sf_dir)
    base = (
        d.select("doc_id", tokens_col(F.col("text")).alias("toks"))
        # feeds the per-doc stats AND both exploded counts — one scan
        .localCheckpoint()
    )
    n = F.size("toks")
    # adjacent-bigram array; NULL when n < 2 (explode of NULL = no rows,
    # same as DuckDB's UNNEST(NULL))
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat_ws(
                " ", F.get("toks", i), F.get("toks", i + 1)
            ),
        ),
    )
    word_top = (
        base.select("doc_id", F.explode("toks").alias("token"))
        .groupBy("doc_id", "token")
        .count()
        .groupBy("doc_id")
        .agg(
            F.max("count").alias("top_word_n"),
            F.count(F.lit(1)).alias("n_distinct"),
        )
    )
    bigram_top = (
        base.select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("top_bigram_n"))
    )
    stats = (
        base.select(
            "doc_id",
            n.alias("n_tokens"),
            F.size(
                F.filter("toks", lambda t: t.rlike("[a-z]"))
            ).alias("n_alpha"),
        )
        .join(word_top, "doc_id", "left")
        .join(bigram_top, "doc_id", "left")
    )
    nt = F.col("n_tokens")
    distinct_ratio = F.when(
        nt > 0, F.coalesce(F.col("n_distinct"), F.lit(0)) / nt
    ).otherwise(F.lit(0.0))
    frac_alpha = F.when(nt > 0, F.col("n_alpha") / nt).otherwise(F.lit(0.0))
    top_word_frac = F.when(
        nt > 0, F.coalesce(F.col("top_word_n"), F.lit(0)) / nt
    ).otherwise(F.lit(0.0))
    top_bigram_frac = F.when(
        nt >= 2, F.coalesce(F.col("top_bigram_n"), F.lit(0)) / (nt - 1)
    ).otherwise(F.lit(0.0))
    keep = (
        (nt >= 10)
        & (frac_alpha >= F.lit(0.8))
        & (distinct_ratio >= F.lit(0.3))
        & (top_word_frac <= F.lit(0.12))
        & (top_bigram_frac <= F.lit(0.08))
    )
    return stats.select(
        "doc_id",
        nt.cast("int").alias("n_tokens"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(frac_alpha, 6).alias("frac_alpha_words"),
        F.round(top_word_frac, 6).alias("top_word_frac"),
        F.round(top_bigram_frac, 6).alias("top_bigram_frac"),
        keep.alias("keep"),
    )


QUALITY_SIGNALS_SQL = f"""
WITH base AS (
  SELECT doc_id, {_tokens_sql('text')} AS toks FROM {DOCS_SQL}
),
b AS (
  SELECT doc_id, toks, LEN(toks) AS n,
         LEN(LIST_FILTER(toks, t -> REGEXP_MATCHES(t, '[a-z]'))) AS n_alpha,
         CASE WHEN LEN(toks) >= 2
              THEN LIST_TRANSFORM(RANGE(1, LEN(toks)),
                                  i -> toks[i] || ' ' || toks[i + 1])
              END AS bgs
  FROM base
),
wc AS (
  SELECT doc_id, token, COUNT(*) AS c
  FROM (SELECT doc_id, UNNEST(toks) AS token FROM base)
  GROUP BY 1, 2
),
w AS (
  SELECT doc_id, MAX(c) AS top_word_n, COUNT(*) AS n_distinct
  FROM wc GROUP BY 1
),
bc AS (
  SELECT doc_id, bigram, COUNT(*) AS c
  FROM (SELECT doc_id, UNNEST(bgs) AS bigram FROM b)
  GROUP BY 1, 2
),
bm AS (SELECT doc_id, MAX(c) AS top_bigram_n FROM bc GROUP BY 1),
j AS (
  SELECT b.doc_id, b.n, b.n_alpha,
         COALESCE(w.top_word_n, 0) AS top_word_n,
         COALESCE(w.n_distinct, 0) AS n_distinct,
         COALESCE(bm.top_bigram_n, 0) AS top_bigram_n
  FROM b LEFT JOIN w ON b.doc_id = w.doc_id
         LEFT JOIN bm ON b.doc_id = bm.doc_id
),
r AS (
  SELECT doc_id, n,
    CASE WHEN n > 0 THEN n_distinct / CAST(n AS DOUBLE) ELSE 0.0 END
        AS distinct_ratio,
    CASE WHEN n > 0 THEN n_alpha / CAST(n AS DOUBLE) ELSE 0.0 END
        AS frac_alpha,
    CASE WHEN n > 0 THEN top_word_n / CAST(n AS DOUBLE) ELSE 0.0 END
        AS top_word_frac,
    CASE WHEN n >= 2 THEN top_bigram_n / CAST(n - 1 AS DOUBLE) ELSE 0.0 END
        AS top_bigram_frac
  FROM j
)
SELECT doc_id,
  CAST(n AS INT) AS n_tokens,
  ROUND(distinct_ratio, 6) AS distinct_ratio,
  ROUND(frac_alpha, 6) AS frac_alpha_words,
  ROUND(top_word_frac, 6) AS top_word_frac,
  ROUND(top_bigram_frac, 6) AS top_bigram_frac,
  (n >= 10 AND frac_alpha >= 0.8 AND distinct_ratio >= 0.3
     AND top_word_frac <= 0.12 AND top_bigram_frac <= 0.08) AS keep
FROM r"""


def repetition_signals(
    spark: SparkSession, sf_dir: str, d: DataFrame | None = None
) -> DataFrame:
    """Gopher LINE/PARAGRAPH-level repetition signals (Rae et al. 2021
    §A1.1): the duplicate-line fraction, duplicate-line CHARACTER
    fraction, and duplicate-paragraph fraction that catch copy-pasted
    boilerplate :func:`quality_signals`' token-level ratios miss (a page
    whose nav header repeats 40× has healthy type/token ratios but a
    huge dup-line fraction).

    Units: lines split on ``\\n``, paragraphs on ``\\n\\n``; segments are
    trimmed and empties dropped before counting. For each unit,
    ``dup_frac = (n - n_distinct) / n`` (every occurrence beyond a
    segment's first is a duplicate) and the char variant weights each
    duplicate occurrence by its length. Keep gate (the Gopher Table A1
    thresholds): dup-line and dup-paragraph fractions ≤ 0.30, dup-line
    CHARACTER fraction ≤ 0.20.

    Scale shape — the interesting part: ALL of a document's lines live
    inside its own row, so the whole computation is array higher-order
    functions (``array_distinct`` / ``aggregate``) in ONE codegen'd
    projection next to the scan — zero exchanges, zero joins, zero
    explodes (contrast: the token-level signals need two grouped counts
    because top-fractions compare across the corpus-exploded relation).
    Pass ``d`` to score an injected relation (the synthetic corpus is
    single-line; tests inject multi-line fixtures)."""
    if d is None:
        d = docs(spark, sf_dir)

    def segs(sep: str):
        # NB: single-arg lambda — passing F.trim itself would get the
        # element AND index (trim's optional trimStr overload)
        return F.filter(
            F.transform(F.split(F.col("text"), sep), lambda s: F.trim(s)),
            lambda s: s != "",
        )

    def chars_of(col: str):
        return F.aggregate(
            F.col(col), F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        )

    # staged projections so each expensive array expression is built
    # ONCE and referenced by name downstream — CollapseProject keeps
    # multiply-referenced non-cheap expressions in their own Project
    # instead of re-inlining the split/trim/filter per signal
    staged = d.select(
        "doc_id", segs("\n").alias("lines"), segs("\n\n").alias("paras")
    ).select(
        "doc_id",
        "lines",
        F.array_distinct("lines").alias("dlines"),
        "paras",
        F.array_distinct("paras").alias("dparas"),
    )

    def frac(num, den):
        return F.round(
            F.when(den > 0, num / den).otherwise(F.lit(0.0)), 6
        )

    n_l, nd_l = F.size("lines"), F.size("dlines")
    n_p, nd_p = F.size("paras"), F.size("dparas")
    chars, dchars = chars_of("lines"), chars_of("dlines")
    out = staged.select(
        "doc_id",
        n_l.cast("long").alias("n_lines"),
        frac(n_l - nd_l, n_l).alias("dup_line_frac"),
        frac(chars - dchars, chars).alias("dup_line_char_frac"),
        n_p.cast("long").alias("n_paras"),
        frac(n_p - nd_p, n_p).alias("dup_para_frac"),
    )
    keep = (
        (F.col("dup_line_frac") <= 0.30)
        & (F.col("dup_line_char_frac") <= 0.20)
        & (F.col("dup_para_frac") <= 0.30)
    )
    return out.select("*", keep.alias("keep"))


def _rep_sql_segs(sep_sql: str) -> str:
    return (
        f"LIST_FILTER(LIST_TRANSFORM(STRING_SPLIT(text, {sep_sql}),"
        " s -> TRIM(s)), s -> s <> '')"
    )


REPETITION_SIGNALS_SQL = f"""
WITH segs AS (
  SELECT doc_id,
         {_rep_sql_segs("chr(10)")} AS lines,
         {_rep_sql_segs("chr(10) || chr(10)")} AS paras
  FROM {DOCS_SQL}
),
m AS (
  SELECT doc_id,
         LEN(lines) AS n_lines,
         LEN(lines) - LEN(LIST_DISTINCT(lines)) AS dup_lines,
         COALESCE(LIST_SUM(LIST_TRANSFORM(lines, x -> LENGTH(x))), 0)
           AS chars,
         COALESCE(LIST_SUM(LIST_TRANSFORM(LIST_DISTINCT(lines),
                                          x -> LENGTH(x))), 0) AS dchars,
         LEN(paras) AS n_paras,
         LEN(paras) - LEN(LIST_DISTINCT(paras)) AS dup_paras
  FROM segs
),
r AS (
  SELECT doc_id, n_lines,
    CASE WHEN n_lines > 0
         THEN ROUND(dup_lines / CAST(n_lines AS DOUBLE), 6) ELSE 0.0 END
      AS dup_line_frac,
    CASE WHEN chars > 0
         THEN ROUND((chars - dchars) / CAST(chars AS DOUBLE), 6)
         ELSE 0.0 END AS dup_line_char_frac,
    n_paras,
    CASE WHEN n_paras > 0
         THEN ROUND(dup_paras / CAST(n_paras AS DOUBLE), 6) ELSE 0.0 END
      AS dup_para_frac
  FROM m
)
SELECT doc_id, n_lines, dup_line_frac, dup_line_char_frac,
       n_paras, dup_para_frac,
       (dup_line_frac <= 0.30 AND dup_line_char_frac <= 0.20
          AND dup_para_frac <= 0.30) AS keep
FROM r"""


def scrub_repetition(
    spark: SparkSession, sf_dir: str, d: DataFrame | None = None
) -> DataFrame:
    """The APPLY step for :func:`repetition_signals`: rewrite each
    document keeping only the FIRST occurrence of every line — the
    cleaning transform (repeated nav headers, chat-log echo, scraped
    pagination) a curation pipeline runs on documents the signal gate
    would otherwise throw away whole. Same unit convention as the
    signals: lines split on ``\\n``, trimmed, empties dropped; the
    rewrite joins survivors back with a single ``\\n``.

    First-occurrence selection is an explicit position test
    (``array_position(lines, x) == i+1``) rather than
    ``array_distinct``: Spark documents distinct-order only loosely and
    DuckDB's ``LIST_DISTINCT`` not at all, so the shared predicate is
    what makes the rewritten TEXT (not just the counts) hash-identical
    across engines. Quadratic in lines-per-doc, bounded by document
    size — never by the corpus.

    Scale shape: like the signals, everything lives inside one
    codegen'd projection next to the scan — zero exchanges, zero joins,
    zero explodes; the whole corpus rewrite is a map-only pass. Pass
    ``d`` to rewrite an injected relation (the synthetic corpus is
    single-line; tests inject multi-line fixtures)."""
    if d is None:
        d = docs(spark, sf_dir)
    lines = F.filter(
        F.transform(F.split(F.col("text"), "\n"), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    staged = d.select("doc_id", lines.alias("lines")).select(
        "doc_id",
        "lines",
        F.filter(
            F.col("lines"),
            lambda x, i: F.array_position(F.col("lines"), x) == i + 1,
        ).alias("kept"),
    )

    def chars_of(col: str):
        return F.aggregate(
            F.col(col), F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        )

    tot, kc = chars_of("lines"), chars_of("kept")
    return staged.select(
        "doc_id",
        F.concat_ws("\n", F.col("kept")).alias("clean_text"),
        F.size("lines").alias("n_lines"),
        F.size("kept").alias("n_kept"),
        F.round(
            F.when(
                tot > 0, (tot - kc).cast("double") / tot
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("removed_char_frac"),
    )


SCRUB_REPETITION_SQL = f"""
WITH segs AS (
  SELECT doc_id, {_rep_sql_segs("chr(10)")} AS lines FROM {DOCS_SQL}
),
k AS (
  SELECT doc_id, lines,
         LIST_FILTER(lines, (x, i) -> LIST_POSITION(lines, x) = i) AS kept
  FROM segs
),
m AS (
  SELECT doc_id, lines, kept,
         COALESCE(LIST_SUM(LIST_TRANSFORM(lines, x -> LENGTH(x))), 0)
           AS chars,
         COALESCE(LIST_SUM(LIST_TRANSFORM(kept, x -> LENGTH(x))), 0)
           AS kchars
  FROM k
)
SELECT doc_id,
       ARRAY_TO_STRING(kept, chr(10)) AS clean_text,
       CAST(LEN(lines) AS INT) AS n_lines,
       CAST(LEN(kept) AS INT) AS n_kept,
       ROUND(CASE WHEN chars > 0
                  THEN (chars - kchars) / CAST(chars AS DOUBLE)
                  ELSE 0.0 END, 6) AS removed_char_frac
FROM m"""


# ---------------------------------------------------------------------------
# vocabulary coverage — tokenizer-prep analytics

VOCAB_TOP_K = 100  # ranked head reported; tune upward for real vocab work


def vocab_coverage(
    spark: SparkSession, sf_dir: str, top_k: int = VOCAB_TOP_K
) -> DataFrame:
    """Top-``top_k`` corpus vocabulary with cumulative coverage — the
    first question tokenizer training asks of a corpus (what fraction
    of the token stream does a K-entry vocab cover?). Returns
    ``(rank, token, cnt, coverage)`` ranked by (count desc, token asc)
    with ``coverage`` = cumulative count / total tokens.

    Scale shape: the corpus-sized work is ONE explode + map-combined
    groupBy(token); every window below runs over the AGGREGATED
    vocab-sized relation (|distinct tokens| ≪ corpus — millions of
    rows at 100 TB, a trivial sort), never the token stream. Ties
    break lexicographically so the ranking is total and both engines
    agree."""
    from pyspark.sql import Window

    d = docs(spark, sf_dir)
    par = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < par:
        d = d.repartition(par)
    counts = (
        d.select(F.explode(tokens_col(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    # total via a whole-relation window over the AGGREGATED counts (one
    # corpus pass; an eager .agg().first() here would scan twice) — the
    # global windows sit on vocab-sized data, same as the rank sort
    w = Window.orderBy(F.col("cnt").desc(), F.col("token").asc())
    total = F.sum("cnt").over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        counts.select(
            "token",
            "cnt",
            F.row_number().over(w).alias("rank"),
            (
                F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, 0))
                / total.cast("double")
            ).alias("cov"),
        )
        .where(F.col("rank") <= top_k)
        .select(
            F.col("rank").cast("int"),
            "token",
            F.col("cnt").cast("long"),
            F.round(F.col("cov"), 6).alias("coverage"),
        )
    )


VOCAB_COVERAGE_SQL = f"""
WITH counts AS (
  SELECT token, COUNT(*) AS cnt
  FROM (
    SELECT UNNEST({_tokens_sql('text')}) AS token FROM {DOCS_SQL}
  ) GROUP BY token
),
ranked AS (
  SELECT token, cnt,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, token ASC) AS rank,
         SUM(cnt) OVER (ORDER BY cnt DESC, token ASC
                        ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(cnt) OVER () AS total
  FROM counts
)
SELECT CAST(rank AS INT) AS rank, token, CAST(cnt AS BIGINT) AS cnt,
       ROUND(cum / CAST(total AS DOUBLE), 6) AS coverage
FROM ranked WHERE rank <= {VOCAB_TOP_K}"""


# OOV grading default: deliberately BELOW the synthetic corpus's 31-token
# vocabulary so the sf-scale oracle grade exercises real OOV mass (a real
# corpus uses 1e4-1e5 here)
VOCAB_OOV_TOP_K = 16


def vocab_oov(
    spark: SparkSession, sf_dir: str, top_k: int = VOCAB_OOV_TOP_K
) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus's own
    top-``top_k`` vocabulary — :func:`vocab_coverage`'s companion (that
    one says what a K-entry vocab covers corpus-wide; this one says
    which DOCUMENTS it serves badly, the signal a tokenizer-aware
    quality gate filters on). Returns ``(doc_id, n_tokens, n_oov,
    oov_rate)``; token-less documents report rate 0.

    One corpus scan: the per-(doc, token) count relation is
    checkpointed and feeds BOTH the vocab derivation (re-aggregate by
    token — the same global ranking as vocab_coverage) and the per-doc
    OOV join; the vocab side is top_k rows, so Catalyst broadcasts it
    and the per-doc pass never shuffles the token stream again."""
    from pyspark.sql import Window

    d = docs(spark, sf_dir)
    par = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < par:
        d = d.repartition(par)
    by_doc = (
        d.select(F.explode(tokens_col(F.col("text"))).alias("token"), "doc_id")
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint()
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("token").asc())
    vocab = (
        by_doc.groupBy("token")
        .agg(F.sum("cnt").alias("cnt"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("token")
    )
    per_doc = (
        by_doc.join(F.broadcast(vocab), "token", "left_anti")
        .groupBy("doc_id")
        .agg(F.sum("cnt").cast("long").alias("n_oov"))
    )
    totals = by_doc.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_tokens")
    )
    return (
        d.select("doc_id")
        .join(totals, "doc_id", "left")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_oov", F.lit(0)).alias("n_oov"),
            F.when(
                F.coalesce("n_tokens", F.lit(0)) > 0,
                F.round(
                    F.coalesce("n_oov", F.lit(0))
                    / F.col("n_tokens").cast("double"),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("oov_rate"),
        )
    )


VOCAB_OOV_SQL = f"""
WITH by_doc AS (
  SELECT doc_id, token, COUNT(*) AS cnt
  FROM (
    SELECT doc_id, UNNEST({_tokens_sql('text')}) AS token FROM {DOCS_SQL}
  ) GROUP BY doc_id, token
),
vocab AS (
  SELECT token FROM (
    SELECT token,
           ROW_NUMBER() OVER (ORDER BY SUM(cnt) DESC, token ASC) AS rank
    FROM by_doc GROUP BY token
  ) WHERE rank <= {VOCAB_OOV_TOP_K}
),
oov AS (
  SELECT b.doc_id, CAST(SUM(b.cnt) AS BIGINT) AS n_oov
  FROM by_doc b ANTI JOIN vocab v ON b.token = v.token
  GROUP BY b.doc_id
),
totals AS (
  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tokens
  FROM by_doc GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(t.n_tokens, 0) AS n_tokens,
       COALESCE(o.n_oov, 0) AS n_oov,
       CASE WHEN COALESCE(t.n_tokens, 0) > 0
            THEN ROUND(COALESCE(o.n_oov, 0)
                       / CAST(t.n_tokens AS DOUBLE), 6)
            ELSE 0.0 END AS oov_rate
FROM (SELECT doc_id FROM {DOCS_SQL}) d
LEFT JOIN totals t ON d.doc_id = t.doc_id
LEFT JOIN oov o ON d.doc_id = o.doc_id"""
