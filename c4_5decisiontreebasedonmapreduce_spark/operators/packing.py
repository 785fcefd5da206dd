"""Sequence packing — concat-then-chunk layout of documents into
fixed-length training windows.

The last step of every LLM pre-training pipeline: documents are
concatenated in a deterministic order and the token stream is cut into
fixed ``seq_len`` windows (the GPT-lineage "packing" that turns a
curated corpus into same-shape training examples). The reference
engine has no notion of this (its sink is a rule list,
``Main.java:128-131``); this is extension surface per SURVEY.md §2.C.

Scale shape — the part that matters at 100 TB: a single global
concatenation order would funnel the prefix sum through one window
partition. Instead the corpus is split into ``n_shards`` deterministic
portable-hash shards FIRST (the same md5 convention as the samplers,
so re-runs and the DuckDB oracle see identical shards), and the
cumulative token position is computed per shard — ``n_shards``
independent window partitions running in parallel, each a
partial-aggregate-sized task. At cluster scale you set ``n_shards`` to
a few thousand (≈ your training-file count) and every shard packs
independently; no stage ever sees a global order. Real trainers pack
per output shard for exactly this reason.

Everything is Column expressions + one explode + one groupBy: the only
Python is plan construction.
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

SEQ_LEN = 512  # tokens per packed training window
N_SHARDS = 8  # deterministic hash shards; thousands at cluster scale
_SHARD_SEED = "packshard|"


def _chunk_overlaps(
    docs_df: DataFrame, seq_len: int, n_shards: int
) -> DataFrame:
    """Shared core of :func:`pack` / :func:`pack_assignments`: tokenize,
    shard, per-shard prefix sum, and explode each document to the 1+
    windows its token range [tok_start, tok_end) overlaps (linear in
    CEIL(n_tokens / seq_len), not corpus²). Token-less documents drop
    (they contribute nothing to the stream)."""
    d = (
        docs_df.select(
            "doc_id",
            F.size(tokens_col(F.col("text"))).alias("n_tokens"),
        )
        .where(F.col("n_tokens") > 0)
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
    spans = d.withColumn(
        "tok_end", F.sum("n_tokens").over(w).cast("long")
    ).withColumn("tok_start", F.col("tok_end") - F.col("n_tokens"))
    return spans.withColumn(
        "chunk_id",
        F.explode(
            F.sequence(
                F.floor(F.col("tok_start") / seq_len),
                F.floor((F.col("tok_end") - 1) / seq_len),
            )
        ),
    )


def pack(
    docs_df: DataFrame, seq_len: int = SEQ_LEN, n_shards: int = N_SHARDS
) -> DataFrame:
    """Pack ``docs_df`` (needs ``doc_id``, ``text``) into fixed
    ``seq_len`` token windows, per deterministic shard. Returns one row
    per packed window: ``(shard, chunk_id, n_docs, n_tokens,
    n_split_docs, first_doc, last_doc)`` where ``n_split_docs`` counts
    documents that cross into this window from an adjacent one.
    Within a shard every window except the final one holds exactly
    ``seq_len`` tokens (pinned in tests); token-less documents are
    dropped (they contribute nothing to the stream).

    Plan: one scan computes token counts → per-shard running sum
    (window over ``n_shards`` independent partitions) → each document
    explodes to the 1+ windows its token range [start, end) overlaps
    (linear in CEIL(n_tokens / seq_len), not corpus²) → one groupBy
    per (shard, window)."""
    chunks = _chunk_overlaps(docs_df, seq_len, n_shards)
    take = F.least(
        F.col("tok_end"), (F.col("chunk_id") + 1) * seq_len
    ) - F.greatest(F.col("tok_start"), F.col("chunk_id") * seq_len)
    return (
        chunks.withColumn("take", take)
        .groupBy("shard", "chunk_id")
        .agg(
            F.count("*").cast("int").alias("n_docs"),
            F.sum("take").cast("long").alias("n_tokens"),
            F.sum((F.col("take") < F.col("n_tokens")).cast("int"))
            .cast("int")
            .alias("n_split_docs"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`pack` over the `documents` table at the module defaults."""
    d = docs(spark, sf_dir)
    par = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < par:
        d = d.repartition(par)
    return pack(d)


def _pack_sql(seq_len: int = SEQ_LEN, n_shards: int = N_SHARDS) -> str:
    shard = md5_long_sql(
        "CONCAT('" + _SHARD_SEED + "', CAST(doc_id AS VARCHAR))"
    )
    return f"""
WITH toks AS (
  SELECT doc_id,
         CAST(LEN({_tokens_sql('text')}) AS BIGINT) AS n_tokens,
         CAST({shard} % {n_shards} AS INT) AS shard
  FROM {DOCS_SQL}
),
spans AS (
  SELECT doc_id, n_tokens, shard,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
           AS tok_end
  FROM toks WHERE n_tokens > 0
),
chunks AS (
  SELECT shard, doc_id, n_tokens,
         tok_end - n_tokens AS tok_start, tok_end,
         UNNEST(GENERATE_SERIES(
           CAST(FLOOR((tok_end - n_tokens) / {seq_len}) AS BIGINT),
           CAST(FLOOR((tok_end - 1) / {seq_len}) AS BIGINT)
         )) AS chunk_id
  FROM spans
),
contrib AS (
  SELECT shard, chunk_id, doc_id, n_tokens,
         LEAST(tok_end, (chunk_id + 1) * {seq_len})
           - GREATEST(tok_start, chunk_id * {seq_len}) AS take
  FROM chunks
)
SELECT shard, chunk_id,
       CAST(COUNT(*) AS INT) AS n_docs,
       CAST(SUM(take) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN take < n_tokens THEN 1 ELSE 0 END) AS INT)
         AS n_split_docs,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM contrib GROUP BY shard, chunk_id"""


PACK_SEQUENCES_SQL = _pack_sql()


def pack_assignments(
    docs_df: DataFrame, seq_len: int = SEQ_LEN, n_shards: int = N_SHARDS
) -> DataFrame:
    """The token-level packing layout beneath :func:`pack`'s manifest:
    one row per (document, window) overlap — ``(shard, chunk_id,
    doc_id, slice_start, slice_len)`` where ``slice_start`` is the
    1-based token offset INSIDE the document and ``slice_len`` how many
    of its tokens land in that window. This is the relation a shard
    writer joins back to the token stream to emit physical training
    files; every document appears in CEIL(n_tokens / seq_len) + 0/1
    rows, so the relation is ~corpus-sized, never quadratic."""
    chunks = _chunk_overlaps(docs_df, seq_len, n_shards)
    lo = F.greatest(F.col("tok_start"), F.col("chunk_id") * seq_len)
    hi = F.least(F.col("tok_end"), (F.col("chunk_id") + 1) * seq_len)
    return chunks.select(
        "shard",
        "chunk_id",
        "doc_id",
        (lo - F.col("tok_start") + 1).cast("long").alias("slice_start"),
        (hi - lo).cast("long").alias("slice_len"),
    )


def dedup_pack_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`pack_assignments` over the `documents` table."""
    d = docs(spark, sf_dir)
    par = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < par:
        d = d.repartition(par)
    return pack_assignments(d)


def _pack_assignments_sql(
    seq_len: int = SEQ_LEN, n_shards: int = N_SHARDS
) -> str:
    shard = md5_long_sql(
        "CONCAT('" + _SHARD_SEED + "', CAST(doc_id AS VARCHAR))"
    )
    return f"""
WITH toks AS (
  SELECT doc_id,
         CAST(LEN({_tokens_sql('text')}) AS BIGINT) AS n_tokens,
         CAST({shard} % {n_shards} AS INT) AS shard
  FROM {DOCS_SQL}
),
spans AS (
  SELECT doc_id, n_tokens, shard,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
           AS tok_end
  FROM toks WHERE n_tokens > 0
),
chunks AS (
  SELECT shard, doc_id,
         tok_end - n_tokens AS tok_start, tok_end,
         UNNEST(GENERATE_SERIES(
           CAST(FLOOR((tok_end - n_tokens) / {seq_len}) AS BIGINT),
           CAST(FLOOR((tok_end - 1) / {seq_len}) AS BIGINT)
         )) AS chunk_id
  FROM spans
)
SELECT shard, chunk_id, doc_id,
       CAST(GREATEST(tok_start, chunk_id * {seq_len}) - tok_start + 1
            AS BIGINT) AS slice_start,
       CAST(LEAST(tok_end, (chunk_id + 1) * {seq_len})
            - GREATEST(tok_start, chunk_id * {seq_len}) AS BIGINT)
         AS slice_len
FROM chunks"""


PACK_ASSIGNMENTS_SQL = _pack_assignments_sql()


def write_packed_shards(
    spark: SparkSession,
    sf_dir: str,
    path: str,
    seq_len: int = SEQ_LEN,
    n_shards: int = N_SHARDS,
) -> DataFrame:
    """Materialize the packing layout as the on-disk training artifact:
    the assignments joined back to each document's token slice, written
    ``partitionBy(shard)`` with rows sorted by (chunk_id, doc_id)
    inside each shard — a trainer streams one shard directory per data-
    parallel rank and concatenates ``slice_text`` in file order to get
    exactly the packed token stream. Slicing reuses the already-computed
    token array (one ``slice()`` per assignment row, linear); the write
    shuffles once on shard (the partition column), nothing else.
    Returns the rescanned relation."""
    d = docs(spark, sf_dir)
    par = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < par:
        d = d.repartition(par)
    toks = d.select(
        "doc_id", tokens_col(F.col("text")).alias("toks")
    )
    asg = pack_assignments(d, seq_len=seq_len, n_shards=n_shards)
    sliced = asg.join(toks, "doc_id").select(
        "shard",
        "chunk_id",
        "doc_id",
        "slice_start",
        "slice_len",
        F.array_join(
            F.slice(
                F.col("toks"),
                F.col("slice_start").cast("int"),
                F.col("slice_len").cast("int"),
            ),
            " ",
        ).alias("slice_text"),
    )
    (
        sliced.repartition("shard")
        .sortWithinPartitions("chunk_id", "doc_id")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    return spark.read.parquet(path)


# ---------------------------------------------------------------------------
# incremental packing — continue the packed stream at ingest

# batch = the top tenth of the doc_id space (ingest appends AFTER the
# corpus in every shard's doc_id order, which is what makes incremental
# packing well-defined: packing is order-sensitive, so only a batch
# that sorts after the existing stream can extend it without rewriting
# it — exactly how a real ingest pipeline assigns fresh monotonically
# increasing ids)
_INCR_NUM, _INCR_DEN = 9, 10


def pack_incremental(
    spark: SparkSession,
    sf_dir: str,
    shard_state: DataFrame | None = None,
    seq_len: int = SEQ_LEN,
    n_shards: int = N_SHARDS,
) -> DataFrame:
    """Ingest-time packing: extend each shard's packed token stream
    with the batch (docs above the threshold) WITHOUT touching the
    corpus — the per-shard work is one prefix sum over batch rows plus
    a broadcast join against ``shard_state``, the ``(shard,
    base_tokens)`` relation holding each shard's already-packed token
    total (``n_shards`` rows — at 100 TB this is the persisted manifest
    tail, kilobytes, while the corpus is never re-read). Returns the
    batch's assignment rows, IDENTICAL to the full run's
    ``pack_assignments`` restricted to batch docs (the oracle pins
    this), including windows that straddle the corpus/batch boundary —
    the base offset lands the first batch token mid-window exactly
    where the full run puts it. ``shard_state=None`` recomputes the
    state from the corpus slice (the pytest pin passes a precomputed
    one and asserts equality)."""
    d = docs(spark, sf_dir)
    par = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < par:
        d = d.repartition(par)
    thr = (
        d.agg(F.max("doc_id")).first()[0] * _INCR_NUM // _INCR_DEN
    )
    toks = d.select(
        "doc_id",
        F.size(tokens_col(F.col("text"))).alias("n_tokens"),
    ).where(F.col("n_tokens") > 0)
    sharded = toks.withColumn(
        "shard",
        (
            md5_long(
                F.concat(F.lit(_SHARD_SEED), F.col("doc_id").cast("string"))
            )
            % n_shards
        ).cast("int"),
    )
    if shard_state is None:
        shard_state = (
            sharded.where(F.col("doc_id") <= thr)
            .groupBy("shard")
            .agg(F.sum("n_tokens").cast("long").alias("base_tokens"))
        )
    batch = sharded.where(F.col("doc_id") > thr)
    w = Window.partitionBy("shard").orderBy("doc_id")
    spans = (
        batch.withColumn(
            "rel_end", F.sum("n_tokens").over(w).cast("long")
        )
        .join(F.broadcast(shard_state), "shard", "left")
        .withColumn(
            "tok_end",
            F.col("rel_end") + F.coalesce("base_tokens", F.lit(0)),
        )
        .withColumn("tok_start", F.col("tok_end") - F.col("n_tokens"))
    )
    chunks = spans.withColumn(
        "chunk_id",
        F.explode(
            F.sequence(
                F.floor(F.col("tok_start") / seq_len),
                F.floor((F.col("tok_end") - 1) / seq_len),
            )
        ),
    )
    lo = F.greatest(F.col("tok_start"), F.col("chunk_id") * seq_len)
    hi = F.least(F.col("tok_end"), (F.col("chunk_id") + 1) * seq_len)
    return chunks.select(
        "shard",
        "chunk_id",
        "doc_id",
        (lo - F.col("tok_start") + 1).cast("long").alias("slice_start"),
        (hi - lo).cast("long").alias("slice_len"),
    )


PACK_INCREMENTAL_SQL = f"""
SELECT * FROM ({PACK_ASSIGNMENTS_SQL}
)
WHERE doc_id > (SELECT (MAX(doc_id) * {_INCR_NUM}) // {_INCR_DEN}
                FROM documents)"""
