"""End-to-end training-data curation pipelines, each as ONE composed
query.

The individual operators (`dedup.dedup_exact`, `text.text_stats`,
`text.lang_id`, `pii.scrub_pii`, `packing.pack`) are each oracle-graded
standalone; a real corpus curation run composes them. Joining their
DataFrames would scan `documents` several times and shuffle repeatedly
just to reunite per-row columns that all derive from the same row — so
the pipelines instead FUSE the per-row formulas into a single scan.
The fingerprint/quality/lang formulas exist ONCE in this module
(:func:`_scored_cols` / :func:`_scored_ctes`), mirroring text_stats'
and lang_id's definitions, so the two pipelines cannot drift apart.

`curation_pipeline` (dedup → quality gate → language rollup) needs
exactly two exchanges regardless of corpus size:

1. one window over ``fingerprint`` for the deterministic min-doc_id
   dedup survivor (the same survivor rule `dedup.dedup_exact` grades);
2. one tiny grouped aggregate over (language, quality-gate) cells.

`pretraining_pipeline` (scrub → dedup → quality gate → packing
manifest) needs two as well: the fingerprint window plus the per-shard
packing prefix sum (its per-shard rollup reuses the shard
partitioning). At 100 TB that is: one cold scan, two hash-partitioned
exchanges, a combiner-backed rollup of a handful of cells. No
reference analog (the reference is training-only); the fused formulas
are pinned per-operator by the standalone oracle entries and
end-to-end by each query's own oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from c4_5decisiontreebasedonmapreduce_spark.operators.packing import (
    N_SHARDS,
    SEQ_LEN,
    _SHARD_SEED,
)
from c4_5decisiontreebasedonmapreduce_spark.operators.text import (
    _STOP_LIST_SQL,
    DOCS_SQL,
    STOPWORDS,
    docs,
    spread_if_heavy,
    tokens_col,
)

QUALITY_GATE = 0.5

# packing geometry is the packing module's, by reference — retuning
# SEQ_LEN/N_SHARDS there keeps the pipeline manifest in sync
PT_SEQ_LEN = SEQ_LEN
PT_SHARDS = N_SHARDS


def _scored_cols() -> tuple[Column, Column, Column, Column]:
    """``(fingerprint, n_tokens, quality_score, lang_pred)`` Column
    expressions over the current ``text`` column — text_stats' quality
    formula and lang_id's heuristic, verbatim, defined once for both
    pipelines."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    toks = tokens_col(F.col("text"))
    n_tokens = F.size(toks)
    n_chars = F.length("text")
    n_punct = n_chars - F.length(
        F.regexp_replace(F.col("text"), r"[.,;:!?'\"()-]", "")
    )
    n_stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    quality = F.round(
        F.lit(0.5) * F.least(n_tokens / F.lit(50.0), F.lit(1.0))
        + F.lit(0.3) * F.least(stop_ratio * 5, F.lit(1.0))
        + F.lit(0.2) * F.greatest(F.lit(1.0) - punct_ratio * 10, F.lit(0.0)),
        6,
    )
    is_ascii = F.octet_length("text") == F.length("text")
    lang_pred = F.when(
        is_ascii & (n_tokens > 0) & (n_stop / n_tokens >= 0.05), "en"
    ).otherwise("und")
    return F.md5(norm), n_tokens, quality, lang_pred


def _tokens_sql(expr: str) -> str:
    from c4_5decisiontreebasedonmapreduce_spark.operators.text import (
        _tokens_sql as t,
    )

    return t(expr)


def _scored_ctes(from_clause: str) -> str:
    """The shared ``enriched``/``scored`` CTE pair (SQL twin of
    :func:`_scored_cols`) over ``from_clause`` — a relation exposing
    ``doc_id`` and ``text``."""
    return f"""enriched AS (
  SELECT doc_id,
         MD5(REGEXP_REPLACE(LOWER(TRIM(text)), '\\s+', ' ', 'g'))
             AS fingerprint,
         LEN({_tokens_sql('text')}) AS n_tokens,
         LEN(LIST_FILTER({_tokens_sql('text')},
                         t -> LIST_CONTAINS({_STOP_LIST_SQL}, t))) AS n_stop,
         LENGTH(text) AS n_chars,
         LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[.,;:!?''"()-]', '', 'g'))
             AS n_punct,
         OCTET_LENGTH(ENCODE(text)) = LENGTH(text) AS is_ascii
  FROM {from_clause}
),
scored AS (
  SELECT doc_id, fingerprint, n_tokens,
         ROUND(0.5 * LEAST(n_tokens / 50.0, 1.0)
             + 0.3 * LEAST(CASE WHEN n_tokens > 0
                                THEN n_stop / CAST(n_tokens AS DOUBLE)
                                ELSE 0.0 END * 5, 1.0)
             + 0.2 * GREATEST(1.0 - CASE WHEN n_chars > 0
                                         THEN n_punct / CAST(n_chars AS DOUBLE)
                                         ELSE 0.0 END * 10, 0.0), 6)
             AS quality_score,
         CASE WHEN is_ascii AND n_tokens > 0
                   AND n_stop / CAST(n_tokens AS DOUBLE) >= 0.05
              THEN 'en' ELSE 'und' END AS lang_pred
  FROM enriched
)"""


def curation_pipeline(
    spark: SparkSession, sf_dir: str, quality_gate: float = QUALITY_GATE
) -> DataFrame:
    """Per (predicted language, quality-gate outcome): surviving-doc
    count, total regex tokens, and mean quality score after exact
    dedup. ``passed`` rows are what a tokenizer run would consume."""
    # size-adaptive spread (r13): serial at sf0.1 where it regressed
    # 0.79→1.17 s (r12 revert), spread at the ×10 probe scale where the
    # scoring projection read 4.96→1.56 s.
    d = spread_if_heavy(docs(spark, sf_dir))
    fingerprint, n_tokens, quality, lang_pred = _scored_cols()
    enriched = d.select(
        "doc_id",
        fingerprint.alias("fingerprint"),
        n_tokens.alias("n_tokens"),
        quality.alias("quality_score"),
        lang_pred.alias("lang_pred"),
    )
    # dedup.dedup_exact's survivor rule: min doc_id per content hash
    # (window column first, then filter — Spark disallows window fns
    # directly inside WHERE)
    keep_id = F.min("doc_id").over(Window.partitionBy("fingerprint"))
    return (
        enriched.withColumn("keep_id", keep_id)
        .where(F.col("doc_id") == F.col("keep_id"))
        .select(
            "lang_pred",
            (F.col("quality_score") >= quality_gate).alias("passed"),
            "n_tokens",
            "quality_score",
        )
        .groupBy("lang_pred", "passed")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            # quality is rounded to 6 decimals, so summing the 1e6-scaled
            # integers is EXACT — a double SUM's result depends on
            # accumulation order and flips the rounded mean's last digit
            # between engines when it lands on a rounding boundary
            F.round(
                F.sum(F.round(F.col("quality_score") * 1e6, 0).cast("long"))
                / F.lit(1e6)
                / F.count("*"),
                6,
            ).alias("avg_quality"),
        )
    )


CURATION_PIPELINE_SQL = f"""
WITH {_scored_ctes(DOCS_SQL)},
survivors AS (
  SELECT * FROM (
    SELECT s.*, MIN(doc_id) OVER (PARTITION BY fingerprint) AS keep_id
    FROM scored s
  ) WHERE doc_id = keep_id
)
SELECT lang_pred,
       quality_score >= {QUALITY_GATE} AS passed,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       ROUND(SUM(CAST(ROUND(quality_score * 1e6, 0) AS BIGINT)) / 1e6
             / COUNT(*), 6) AS avg_quality
FROM survivors
GROUP BY lang_pred, passed"""


def curation_best_pipeline(
    spark: SparkSession, sf_dir: str, quality_gate: float = QUALITY_GATE
) -> DataFrame:
    """:func:`curation_pipeline` upgraded with the round-12 cleaning and
    selection steps composed end-to-end — what a production curation
    run actually looks like:

    1. NEAR-dup survivors by QUALITY (`dedup_cluster_keep_best`): every
       clustered document that is not its cluster's quality-argmax is
       dropped (the base pipeline only exact-dedups, and exact-dup
       members are byte-identical so a quality pick would be vacuous
       there — near-dup clusters are where the argmax bites);
    2. intra-doc repetition CLEANING (`scrub_repetition`): scoring and
       fingerprinting run on the rewritten text, so a doc whose bulk is
       a repeated nav header is gated on its real content;
    3. the shared exact-dedup + quality-gate rollup, unchanged.

    Scale shape: the loser set is pair-bounded → broadcast left-anti
    onto the one corpus scan; the rewrite + scoring stay one codegen'd
    projection on that same pass; the only data-sized exchanges are the
    keep-best machinery's own (audited separately) plus the fingerprint
    window and the tiny rollup — nothing new moves the corpus."""
    from c4_5decisiontreebasedonmapreduce_spark.operators.dedup import (
        dedup_cluster_keep_best,
    )
    from c4_5decisiontreebasedonmapreduce_spark.operators.text import (
        scrub_repetition,
    )

    losers = (
        dedup_cluster_keep_best(spark, sf_dir)
        .where(~F.col("survivor"))
        .select("doc_id")
    )
    d = docs(spark, sf_dir).join(F.broadcast(losers), "doc_id", "left_anti")
    cleaned = scrub_repetition(spark, sf_dir, d=d).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    fingerprint, n_tokens, quality, lang_pred = _scored_cols()
    enriched = cleaned.select(
        "doc_id",
        fingerprint.alias("fingerprint"),
        n_tokens.alias("n_tokens"),
        quality.alias("quality_score"),
        lang_pred.alias("lang_pred"),
    )
    keep_id = F.min("doc_id").over(Window.partitionBy("fingerprint"))
    return (
        enriched.withColumn("keep_id", keep_id)
        .where(F.col("doc_id") == F.col("keep_id"))
        .select(
            "lang_pred",
            (F.col("quality_score") >= quality_gate).alias("passed"),
            "n_tokens",
            "quality_score",
        )
        .groupBy("lang_pred", "passed")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.round(
                F.sum(F.round(F.col("quality_score") * 1e6, 0).cast("long"))
                / F.lit(1e6)
                / F.count("*"),
                6,
            ).alias("avg_quality"),
        )
    )


def _curation_best_sql() -> str:
    from c4_5decisiontreebasedonmapreduce_spark.operators.dedup import (
        DEDUP_CLUSTER_KEEP_BEST_SQL,
    )
    from c4_5decisiontreebasedonmapreduce_spark.operators.text import (
        _rep_sql_segs,
    )

    return f"""
WITH kb AS (
  SELECT * FROM ({DEDUP_CLUSTER_KEEP_BEST_SQL.strip()})
),
kept AS (
  SELECT doc_id, text FROM {DOCS_SQL}
  WHERE doc_id NOT IN (SELECT doc_id FROM kb WHERE NOT survivor)
),
segs AS (
  SELECT doc_id, {_rep_sql_segs("chr(10)")} AS lines FROM kept
),
clean AS (
  SELECT doc_id,
         ARRAY_TO_STRING(
           LIST_FILTER(lines, (x, i) -> LIST_POSITION(lines, x) = i),
           chr(10)) AS text
  FROM segs
),
{_scored_ctes("clean")},
survivors AS (
  SELECT * FROM (
    SELECT s.*, MIN(doc_id) OVER (PARTITION BY fingerprint) AS keep_id
    FROM scored s
  ) WHERE doc_id = keep_id
)
SELECT lang_pred,
       quality_score >= {QUALITY_GATE} AS passed,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       ROUND(SUM(CAST(ROUND(quality_score * 1e6, 0) AS BIGINT)) / 1e6
             / COUNT(*), 6) AS avg_quality
FROM survivors
GROUP BY lang_pred, passed"""


CURATION_BEST_SQL = _curation_best_sql()


# ---------------------------------------------------------------------------
# pretraining pipeline: scrub → dedup → quality gate → sequence packing


def pretraining_pipeline(
    spark: SparkSession,
    sf_dir: str,
    quality_gate: float = QUALITY_GATE,
    seq_len: int = PT_SEQ_LEN,
    n_shards: int = PT_SHARDS,
) -> DataFrame:
    """The WHOLE pre-training data prep as one declarative query: PII
    scrub → exact dedup → quality gate → concat-then-chunk packing →
    per-shard manifest ``(shard, n_docs, n_tokens, n_windows,
    n_full_windows)``. What a user points at a raw corpus to get
    training shards out.

    Scale shape: ONE corpus scan; the scrub/fingerprint/quality
    formulas (shared with the standalone operators via
    :func:`_scored_cols`) fuse into the scan projection; then exactly
    TWO data-sized exchanges at any scale — the fingerprint window for
    the dedup survivor and the shard window for the packing prefix sum
    (the final per-shard rollup reuses the shard partitioning,
    Catalyst-verified in test_scale_plans.py). The per-stage semantics
    are each pinned by their standalone oracle entries; the
    composition is pinned by this query's own oracle."""
    from c4_5decisiontreebasedonmapreduce_spark.functions.hashing import (
        md5_long,
    )
    from c4_5decisiontreebasedonmapreduce_spark.operators.pii import scrub_pii

    d = scrub_pii(docs(spark, sf_dir)).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    par = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < par:
        d = d.repartition(par)
    return _manifest_from(d, quality_gate, seq_len, n_shards)


def pretraining_pipeline_bpe(
    spark: SparkSession,
    sf_dir: str,
    quality_gate: float = QUALITY_GATE,
    seq_len: int = PT_SEQ_LEN,
    n_shards: int = PT_SHARDS,
) -> DataFrame:
    """:func:`pretraining_pipeline` with the packing half counted in
    RELEASED-tokenizer BPE symbols (`operators.bpe.fixed_merges` over
    the SCRUBBED text — the text that actually ships): the manifest's
    ``n_tokens``/``n_windows`` are what a trainer with this tokenizer
    consumes. The scrub/dedup/quality-gate half keeps the shared
    whitespace scoring (same survivors as the whitespace pipeline,
    pinned in tests); the symbol count is one more codegen'd
    replace-chain expression riding the SAME single corpus scan — plan
    shape unchanged (one scan, two data-sized exchanges)."""
    from c4_5decisiontreebasedonmapreduce_spark.operators.bpe import (
        bpe_symbol_count_col,
    )
    from c4_5decisiontreebasedonmapreduce_spark.operators.pii import scrub_pii

    d = scrub_pii(docs(spark, sf_dir)).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    par = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < par:
        d = d.repartition(par)
    return _manifest_from(
        d,
        quality_gate,
        seq_len,
        n_shards,
        window_tokens=bpe_symbol_count_col(F.col("text")),
    )


def pretraining_pipeline_unigram(
    spark: SparkSession,
    sf_dir: str,
    quality_gate: float = QUALITY_GATE,
    seq_len: int = PT_SEQ_LEN,
    n_shards: int = PT_SHARDS,
) -> DataFrame:
    """:func:`pretraining_pipeline` with the packing half counted in
    RELEASED unigram-LM pieces (`operators.unigram.fixed_vocab` over
    the SCRUBBED text). Unlike BPE's closed-form replace chain, the
    Viterbi piece count is a ``(doc_id, wtok)`` relation (one
    vocab-sized Arrow pass over distinct words + an equi-join rollup),
    so the manifest pays ONE extra user-bounded join — scrub, dedup,
    gate, and the per-shard prefix sum are byte-identical to the
    whitespace pipeline."""
    from c4_5decisiontreebasedonmapreduce_spark.operators.pii import scrub_pii
    from c4_5decisiontreebasedonmapreduce_spark.operators.unigram import (
        unigram_piece_counts,
    )

    d = scrub_pii(docs(spark, sf_dir)).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    par = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < par:
        d = d.repartition(par)
    # the scrubbed projection feeds TWO consumers (the piece-count
    # relation and the manifest's scoring projection); checkpoint it so
    # the regex scrub chain runs once per query, not once per consumer —
    # the same single-corpus-scan treatment the decontam pipeline gives
    # its scrubbed projection (guide §5; r13 A/B below). eager=False:
    # one fewer blocking driver job, identical reuse.
    d = d.localCheckpoint(eager=False)
    return _manifest_from(
        d,
        quality_gate,
        seq_len,
        n_shards,
        window_counts=unigram_piece_counts(d),
    )


def _manifest_from(
    d: DataFrame,
    quality_gate: float = QUALITY_GATE,
    seq_len: int = PT_SEQ_LEN,
    n_shards: int = PT_SHARDS,
    window_tokens=None,
    window_counts: DataFrame | None = None,
) -> DataFrame:
    """dedup → quality gate → packing manifest over a ``(doc_id, text)``
    relation — the tail of :func:`pretraining_pipeline`, shared with
    the decontaminating variant. ``window_tokens`` (a Column over
    ``text``) overrides the unit the PACKING half counts — the BPE
    pipeline passes the released-tokenizer symbol count so windows are
    what a trainer consumes, while the dedup/quality gate keeps the
    shared whitespace scoring semantics (its formulas are pinned by
    the standalone quality oracles and must not drift per tokenizer).
    ``window_counts`` is the relation-valued alternative for tokenizers
    whose counting is not a Column (unigram Viterbi): a ``(doc_id,
    wtok)`` DataFrame joined on doc_id — one extra user-bounded
    equi-join, everything else identical."""
    from c4_5decisiontreebasedonmapreduce_spark.functions.hashing import (
        md5_long,
    )

    fingerprint, n_tokens, quality, _ = _scored_cols()
    cols = [
        "doc_id",
        fingerprint.alias("fingerprint"),
        n_tokens.alias("n_tokens"),
        quality.alias("quality_score"),
    ]
    if window_tokens is not None:
        cols.append(window_tokens.cast("long").alias("wtok"))
    enriched = d.select(*cols)
    if window_counts is not None:
        if window_tokens is not None:
            raise ValueError(
                "window_tokens and window_counts are mutually exclusive"
            )
        enriched = enriched.join(
            window_counts.select(
                "doc_id", F.col("wtok").cast("long").alias("wtok")
            ),
            "doc_id",
        )
        window_tokens = True  # downstream: count by the wtok column
    keep_id = F.min("doc_id").over(Window.partitionBy("fingerprint"))
    gated = (
        enriched.withColumn("keep_id", keep_id)
        .where(
            (F.col("doc_id") == F.col("keep_id"))
            & (F.col("quality_score") >= quality_gate)
            & (F.col("n_tokens") > 0)
        )
        .withColumn(
            "shard",
            (
                md5_long(
                    F.concat(
                        F.lit(_SHARD_SEED), F.col("doc_id").cast("string")
                    )
                )
                % n_shards
            ).cast("int"),
        )
    )
    w = Window.partitionBy("shard").orderBy("doc_id")
    count_col = "wtok" if window_tokens is not None else "n_tokens"
    spans = gated.withColumn(
        "tok_end", F.sum(count_col).over(w).cast("long")
    )
    return spans.groupBy("shard").agg(
        F.count("*").cast("int").alias("n_docs"),
        F.max("tok_end").alias("n_tokens"),
        F.ceil(F.max("tok_end") / F.lit(seq_len))
        .cast("int")
        .alias("n_windows"),
        F.floor(F.max("tok_end") / F.lit(seq_len))
        .cast("int")
        .alias("n_full_windows"),
    )


def pretraining_decontam_pipeline(
    spark: SparkSession,
    sf_dir: str,
    quality_gate: float = QUALITY_GATE,
    seq_len: int = PT_SEQ_LEN,
    n_shards: int = PT_SHARDS,
    min_overlap: float | None = None,
    window_tokens=None,
    unigram_counts: bool = False,
) -> DataFrame:
    """:func:`pretraining_pipeline` with the eval-leak scrub in the
    chain: PII scrub → benchmark DECONTAMINATION (the shingle-
    containment flagging of `dedup.decontaminate`, run over the
    SCRUBBED text, whole-flagged-document removal; benchmark docs are
    excluded from training output by definition) → exact dedup →
    quality gate → packing manifest. The full pre-training prep,
    decontamination included, as one composed query.

    Scale shape: the scrubbed projection is materialized ONCE and feeds
    both the shingle branch and the manifest tail, so the corpus still
    pays a single scan; decontamination adds its df-capped asymmetric
    candidate join (never corpus²) and ONE broadcast anti-join of the
    leak-sized flagged relation — the corpus is never shuffled for the
    subtraction. Stage semantics are pinned by the standalone
    `scrub_pii` / `decontaminate` / `pipeline_pretraining` oracles; the
    composition by this query's own oracle."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import dedup as D
    from c4_5decisiontreebasedonmapreduce_spark.operators.pii import scrub_pii

    if min_overlap is None:
        min_overlap = D.DECONTAM_MIN_OVERLAP
    d = scrub_pii(docs(spark, sf_dir)).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    par = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < par:
        d = d.repartition(par)
    d = d.localCheckpoint()  # ONE scan: shingle branch + manifest tail
    is_bench = (
        F.col("doc_id") % D.DECONTAM_BENCH_MOD == D.DECONTAM_BENCH_REM
    )
    # both decontamination sides slice one shingle relation (derived
    # from the checkpointed scrubbed projection) → windowed-df core,
    # one exchange of it; the core materializes its own windowed
    # relation, so no second checkpoint here (dedup.py r12)
    flagged = D._decontaminate_core_win(
        D.shingle_rows(d), is_bench, min_overlap=min_overlap
    ).select("doc_id")
    corpus = d.where(~is_bench).join(
        F.broadcast(flagged), "doc_id", "left_anti"
    )
    window_counts = None
    if unigram_counts:
        # unigram pieces must count the text that actually ships — the
        # scrubbed, decontaminated corpus
        from c4_5decisiontreebasedonmapreduce_spark.operators.unigram import (
            unigram_piece_counts,
        )

        window_counts = unigram_piece_counts(corpus)
    return _manifest_from(
        corpus,
        quality_gate,
        seq_len,
        n_shards,
        window_tokens=window_tokens,
        window_counts=window_counts,
    )


def _pretraining_sql(
    quality_gate: float = QUALITY_GATE,
    seq_len: int = PT_SEQ_LEN,
    n_shards: int = PT_SHARDS,
    decontam: bool = False,
    bpe: bool = False,
    unigram: bool = False,
) -> str:
    from c4_5decisiontreebasedonmapreduce_spark.functions.hashing import (
        md5_long_sql,
    )
    from c4_5decisiontreebasedonmapreduce_spark.operators.dedup import (
        DECONTAM_BENCH_MOD,
        DECONTAM_BENCH_REM,
        DECONTAM_MIN_OVERLAP,
        SHINGLE_K,
    )
    from c4_5decisiontreebasedonmapreduce_spark.operators.pii import (
        EMAIL_RE,
        EMAIL_TOKEN,
        IP_RE,
        IP_TOKEN,
        PHONE_RE,
        PHONE_TOKEN,
    )

    shard = md5_long_sql(
        "CONCAT('" + _SHARD_SEED + "', CAST(g.doc_id AS VARCHAR))"
    )
    toks = (
        "LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(LOWER(text),"
        " '[^a-z0-9]+'), t -> t <> '')"
    )
    # the decontamination stage over the SCRUBBED text: shingles of
    # `clean`, corpus×benchmark containment, whole-doc removal — the
    # same formulas as DECONTAM_SQL with `clean` as the source
    decontam_ctes = f""",
sh AS (
  SELECT doc_id, UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
           GENERATE_SERIES(1, GREATEST(LEN({toks}) - {SHINGLE_K - 1}, 0)),
           i -> ARRAY_TO_STRING(LIST_SLICE({toks}, i, i + {SHINGLE_K - 1}), ' '))))
         AS shingle
  FROM clean
),
common AS (
  SELECT c.doc_id AS doc_id, b.doc_id AS bench_id, COUNT(*) AS common
  FROM sh c JOIN sh b ON c.shingle = b.shingle
  WHERE b.doc_id % {DECONTAM_BENCH_MOD} = {DECONTAM_BENCH_REM}
    AND c.doc_id % {DECONTAM_BENCH_MOD} <> {DECONTAM_BENCH_REM}
  GROUP BY 1, 2
),
flagged AS (
  SELECT DISTINCT doc_id FROM common
  JOIN (SELECT doc_id, COUNT(*) AS sz FROM sh
        WHERE doc_id % {DECONTAM_BENCH_MOD} <> {DECONTAM_BENCH_REM}
        GROUP BY doc_id) s USING (doc_id)
  WHERE ROUND(common / CAST(s.sz AS DOUBLE), 6) >= {DECONTAM_MIN_OVERLAP}
),
corpus AS (
  SELECT doc_id, text FROM clean
  WHERE doc_id % {DECONTAM_BENCH_MOD} <> {DECONTAM_BENCH_REM}
    AND doc_id NOT IN (SELECT doc_id FROM flagged)
)"""
    source = "corpus" if decontam else "clean"
    inner = (
        "SELECT s.*, MIN(doc_id) OVER (PARTITION BY fingerprint)"
        " AS keep_id\n    FROM scored s"
    )
    unigram_ctes = ""
    if unigram:
        from c4_5decisiontreebasedonmapreduce_spark.operators.unigram import (
            _tokens_sql,
            unigram_vit_prelude_sql,
        )

        # the Viterbi piece-count relation over the SCRUBBED text (the
        # words the trainer actually sees), joined BEFORE the dedup
        # keep-window — mirroring _manifest_from's window_counts join
        # order exactly
        unigram_ctes = f""",
{unigram_vit_prelude_sql(source)}doc_wtok AS (
  SELECT t.doc_id, SUM(v.n_p) AS wtok
  FROM (SELECT doc_id, UNNEST({_tokens_sql('text')}) AS word
        FROM {source}) t
  JOIN vit v USING (word)
  GROUP BY 1
)"""
        inner = (
            "SELECT s.*, dw.wtok,\n"
            "           MIN(s.doc_id) OVER (PARTITION BY fingerprint)"
            " AS keep_id\n"
            "    FROM scored s JOIN doc_wtok dw ON dw.doc_id = s.doc_id"
        )
        wtok_select = ",\n         CAST(g.wtok AS BIGINT) AS wtok"
        wtok_join = ""
        count_expr = "wtok"
    elif bpe:
        from c4_5decisiontreebasedonmapreduce_spark.operators.bpe import (
            bpe_symbol_count_sql,
        )

        # the packing unit joins back to the (scrubbed) text source —
        # `scored` deliberately does not carry text
        wtok_select = (
            ",\n         CAST("
            + bpe_symbol_count_sql("src.text")
            + " AS BIGINT) AS wtok"
        )
        wtok_join = f"\n  JOIN {source} src ON src.doc_id = g.doc_id"
        count_expr = "wtok"
    else:
        wtok_select = ""
        wtok_join = ""
        count_expr = "n_tokens"
    return f"""
WITH clean AS (
  SELECT doc_id,
         REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(text,
           '{EMAIL_RE}', '{EMAIL_TOKEN}', 'g'),
           '{IP_RE}', '{IP_TOKEN}', 'g'),
           '{PHONE_RE}', '{PHONE_TOKEN}', 'g') AS text
  FROM {DOCS_SQL}
){decontam_ctes if decontam else ""}{unigram_ctes},
{_scored_ctes(source)},
gated AS (
  SELECT g.doc_id, g.n_tokens{wtok_select},
         CAST({shard} % {n_shards} AS INT) AS shard
  FROM (
    {inner}
  ) g{wtok_join}
  WHERE g.doc_id = keep_id AND quality_score >= {quality_gate}
        AND g.n_tokens > 0
),
spans AS (
  SELECT shard, doc_id, n_tokens,
         SUM({count_expr}) OVER (PARTITION BY shard ORDER BY doc_id)
           AS tok_end
  FROM gated
)
SELECT shard,
       CAST(COUNT(*) AS INT) AS n_docs,
       CAST(MAX(tok_end) AS BIGINT) AS n_tokens,
       CAST(CEIL(MAX(tok_end) / {seq_len}.0) AS INT) AS n_windows,
       CAST(FLOOR(MAX(tok_end) / {seq_len}.0) AS INT) AS n_full_windows
FROM spans GROUP BY shard"""


PRETRAINING_PIPELINE_SQL = _pretraining_sql()
PRETRAINING_DECONTAM_SQL = _pretraining_sql(decontam=True)
PRETRAINING_BPE_SQL = _pretraining_sql(bpe=True)
PRETRAINING_UNIGRAM_SQL = _pretraining_sql(unigram=True)


# batch twin of streaming.windows.streaming_quality_gate: the gate
# WITHOUT the dedup survivor filter (not streamable; see that docstring)
QUALITY_GATE_ROLLUP_SQL = f"""
WITH {_scored_ctes(DOCS_SQL)}
SELECT lang_pred,
       quality_score >= {QUALITY_GATE} AS passed,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM scored
GROUP BY lang_pred, passed"""


def corpus_report(
    spark: SparkSession, sf_dir: str, d: DataFrame | None = None
) -> DataFrame:
    """The corpus-health dashboard in ONE query — the first thing an
    operator of a 100 TB ingest looks at each morning: per source, the
    document/token volumes, mean quality and gate pass count (the SAME
    shared scoring projection the curation pipelines grade), exact-dup
    document count (docs whose normalized fingerprint appears ≥ 2×
    anywhere in the corpus — duplicates cross sources, so the
    fingerprint rollup is global), and the predicted-English count.

    Scale shape: one corpus scan computes every per-doc signal
    (checkpointed — it feeds the global fingerprint rollup AND the
    per-source report); the fingerprint join is the one data-sized
    exchange (dup detection is inherently fingerprint-keyed); the
    report itself is a sources-sized aggregate with map-side partials.
    Pass ``d`` to report on an injected relation (tests pin the
    cross-source dup semantics)."""
    fp, n_tokens, quality, lang_pred = _scored_cols()
    if d is None:
        # size-adaptive spread (r13): serial at sf0.1 where it
        # regressed 0.87→1.48 s (r12 revert), spread at the ×10 probe
        # scale where the report read 4.88→2.04 s.
        d = spread_if_heavy(docs(spark, sf_dir))
    else:
        # honor the module's null contract for injected relations too:
        # without this, MD5(NULL) = NULL falls out of the inner
        # fingerprint join and the document silently vanishes
        d = d.withColumn("text", F.coalesce(F.col("text"), F.lit("")))
    d = d.select(
        "doc_id",
        "source",
        fp.alias("fingerprint"),
        n_tokens.alias("n_tokens"),
        quality.alias("quality_score"),
        lang_pred.alias("lang_pred"),
    ).localCheckpoint()
    fpc = d.groupBy("fingerprint").agg(F.count("*").alias("fp_count"))
    return (
        d.join(fpc, "fingerprint")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.round(F.avg("quality_score"), 6).alias("avg_quality"),
            F.count(
                F.when(F.col("quality_score") >= QUALITY_GATE, 1)
            ).alias("n_pass"),
            F.count(F.when(F.col("fp_count") >= 2, 1)).alias("n_exact_dup"),
            F.count(F.when(F.col("lang_pred") == "en", 1)).alias("n_en"),
        )
    )


CORPUS_REPORT_SQL = f"""
WITH {_scored_ctes(DOCS_SQL)},
src AS (SELECT doc_id, source FROM {DOCS_SQL}),
fpc AS (SELECT fingerprint, COUNT(*) AS fp_count FROM scored GROUP BY 1)
SELECT src.source,
       COUNT(*) AS n_docs,
       CAST(SUM(scored.n_tokens) AS BIGINT) AS n_tokens,
       ROUND(AVG(scored.quality_score), 6) AS avg_quality,
       COUNT(CASE WHEN scored.quality_score >= {QUALITY_GATE} THEN 1 END)
           AS n_pass,
       COUNT(CASE WHEN fpc.fp_count >= 2 THEN 1 END) AS n_exact_dup,
       COUNT(CASE WHEN scored.lang_pred = 'en' THEN 1 END) AS n_en
FROM scored
JOIN src USING (doc_id)
JOIN fpc USING (fingerprint)
GROUP BY src.source"""


def finetuning_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fine-tuning/domain-adaptation data prep as one declarative query,
    composing the round-9 curation stages: the deterministic TRAIN split
    (`sampling.split_train_eval` — eval slices never leak into the
    output by construction) → DSIR importance gate (keep training docs
    whose hashed-unigram log-weight against the target slice is at or
    above the train-slice mean — self-calibrating, no magic threshold)
    → sliding-window chunking (`chunking.chunks_from`) → per-source
    manifest ``(source, n_docs, n_chunks, n_tokens)``.

    Scale shape: DSIR contributes its two token-explode passes (bucket
    build + scoring, exchanges bounded by B and doc count); the split is
    a free projection predicate; the mean gate is one 1-row broadcast
    (exact decimal sum / count, so both engines make the identical
    double comparison); chunking of the survivors is one shuffle-free
    projection; the manifest is a source-sized aggregate. The corpus is
    never shuffled whole — only doc-count-sized relations move."""
    from c4_5decisiontreebasedonmapreduce_spark.operators.chunking import (
        chunks_from,
    )
    from c4_5decisiontreebasedonmapreduce_spark.operators.sampling import (
        sample_dsir,
        split_train_eval,
    )

    train_ids = (
        split_train_eval(spark, sf_dir)
        .where(F.col("split") == "train")
        .select("doc_id")
    )
    # materialize the scored train slice ONCE (doc-count-sized:
    # doc_id + weight per training doc): it feeds both the broadcast
    # threshold build and the survivor filter, and un-checkpointed each
    # consumer re-ran DSIR's two token-explode corpus passes — the
    # pipeline's dominant cost — in full (r12, guide §5 caching rule:
    # reused AND expensive to recompute).
    train = (
        sample_dsir(spark, sf_dir)
        .join(train_ids, "doc_id")
        .select("doc_id", "dsir_logweight")
        .localCheckpoint()
    )
    thr = train.agg(
        (
            F.sum(F.col("dsir_logweight").cast("decimal(18,6)")).cast(
                "double"
            )
            / F.count("*")
        ).alias("mu")
    )
    kept = (
        train.crossJoin(F.broadcast(thr))
        .where(F.col("dsir_logweight") >= F.col("mu"))
        .select("doc_id")
    )
    chunks = chunks_from(
        docs(spark, sf_dir).join(kept, "doc_id", "left_semi"),
        carry=("source",),
    )
    return chunks.groupBy("source").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count("*").alias("n_chunks"),
        F.sum("n_chunk_tokens").alias("n_tokens"),
    )


def _finetuning_sql() -> str:
    from c4_5decisiontreebasedonmapreduce_spark.operators.chunking import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
    )
    from c4_5decisiontreebasedonmapreduce_spark.operators.sampling import (
        SAMPLE_DSIR_SQL,
        SPLIT_TRAIN_EVAL_SQL,
    )

    return f"""
WITH dsir AS ({SAMPLE_DSIR_SQL.strip()}
),
sp AS ({SPLIT_TRAIN_EVAL_SQL.strip()}
),
train AS (
  SELECT dsir.doc_id, dsir.dsir_logweight
  FROM dsir JOIN sp ON dsir.doc_id = sp.doc_id
  WHERE sp.split = 'train'
),
thr AS (
  SELECT CAST(SUM(CAST(dsir_logweight AS DECIMAL(18,6))) AS DOUBLE)
           / COUNT(*) AS mu
  FROM train
),
kept AS (
  SELECT doc_id FROM train CROSS JOIN thr WHERE dsir_logweight >= mu
),
arr AS (
  SELECT doc_id, source, {_tokens_sql("text")} AS toks
  FROM {DOCS_SQL}
  WHERE doc_id IN (SELECT doc_id FROM kept)
),
chunks AS (
  SELECT doc_id, source, LEN(toks) AS n,
         UNNEST(RANGE(0, GREATEST(LEN(toks), 0), {CHUNK_STRIDE}))
           AS chunk_start
  FROM arr
)
SELECT source,
       COUNT(DISTINCT doc_id) AS n_docs,
       COUNT(*) AS n_chunks,
       CAST(SUM(LEAST({CHUNK_SIZE}, n - chunk_start)) AS BIGINT)
         AS n_tokens
FROM chunks
GROUP BY source"""


FINETUNING_PIPELINE_SQL = _finetuning_sql()
