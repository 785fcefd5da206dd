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
# second, independent hash: the within-shard RANDOM concatenation /
# training order (shuffle_deterministic and pack_shuffled share it)
_ORDER_SEED = "shuffleord|"


def _sharded_tokens(
    docs_df: DataFrame,
    n_shards: int,
    with_tokens: bool = False,
    keep_empty: bool = False,
) -> DataFrame:
    """``(doc_id, n_tokens, shard[, toks])`` for every non-empty doc —
    the deterministic portable-hash shard assignment every packing
    entry point shares. ``with_tokens=True`` carries the token array
    itself (the writer slices it in place, no re-tokenize join). A
    precomputed ``n_tokens`` column on ``docs_df`` is used as-is when
    only counts are needed — the mixture pipeline threads
    ``sample_mixture``'s counts through so an upsampled document's
    epoch copies are never re-tokenized per copy.

    ``keep_empty=True`` defers the empty-doc drop to the caller: the
    ``n_tokens > 0`` predicate is pushed below the caller's spread
    Exchange with the whole tokenizer expression substituted back in
    (PushPredicateThroughNonJoin sees through both the Project alias
    and the repartition), so for an expensive token counter (the BPE
    replace chain) the filter re-evaluates the chain serially on the
    single-partition scan — measured 1.27 s of pack_sequences_bpe's
    1.87 s at sf0.1. `_chunk_overlaps` instead filters AFTER its
    window (a non-partition-key predicate cannot cross a Window),
    where empty docs have already contributed 0 to the prefix sum."""
    if not with_tokens and "n_tokens" in docs_df.columns:
        cols = ["doc_id", F.col("n_tokens").cast("int").alias("n_tokens")]
    else:
        toks = tokens_col(F.col("text"))
        cols = ["doc_id", F.size(toks).alias("n_tokens")]
        if with_tokens:
            cols.append(toks.alias("toks"))
    out = docs_df.select(*cols)
    if not keep_empty:
        out = out.where(F.col("n_tokens") > 0)
    return (
        out
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


def _explode_chunks(spans: DataFrame, seq_len: int) -> DataFrame:
    """Explode each document (carrying ``tok_start``/``tok_end``) to the
    1+ windows its token range overlaps — linear in
    CEIL(n_tokens / seq_len), not corpus²."""
    return spans.withColumn(
        "chunk_id",
        F.explode(
            F.sequence(
                F.floor(F.col("tok_start") / seq_len),
                F.floor((F.col("tok_end") - 1) / seq_len),
            )
        ),
    )


def _slice_bounds(seq_len: int) -> tuple:
    """(lo, hi) token positions of a doc's contribution to chunk_id."""
    lo = F.greatest(F.col("tok_start"), F.col("chunk_id") * seq_len)
    hi = F.least(F.col("tok_end"), (F.col("chunk_id") + 1) * seq_len)
    return lo, hi


def _chunk_overlaps(
    docs_df: DataFrame,
    seq_len: int,
    n_shards: int,
    with_tokens: bool = False,
    shuffled: bool = False,
) -> DataFrame:
    """Shared core of every packing entry point: tokenize, shard,
    per-shard prefix sum, chunk explode. Token-less documents drop
    (they contribute nothing to the stream). ``shuffled=True``
    concatenates within each shard in the reproducible RANDOM order
    (:func:`shuffle_deterministic`'s second hash, doc_id tie-break)
    instead of doc_id order — the order production actually packs, so
    corpus-adjacent documents don't share training windows."""
    d = _sharded_tokens(
        docs_df, n_shards, with_tokens=with_tokens, keep_empty=True
    )
    if shuffled:
        order_h = md5_long(
            F.concat(F.lit(_ORDER_SEED), F.col("doc_id").cast("string"))
        )
        w = Window.partitionBy("shard").orderBy(order_h, "doc_id")
    else:
        w = Window.partitionBy("shard").orderBy("doc_id")
    # empty-doc drop AFTER the window, not in _sharded_tokens: a
    # zero-n_tokens row adds nothing to the running sum (every other
    # row's span is bit-identical), and here the predicate cannot be
    # pushed below the spread Exchange — see _sharded_tokens'
    # keep_empty docstring for the measured serial-scan pathology.
    spans = (
        d.withColumn("tok_end", F.sum("n_tokens").over(w).cast("long"))
        .where(F.col("n_tokens") > 0)
        .withColumn("tok_start", F.col("tok_end") - F.col("n_tokens"))
    )
    return _explode_chunks(spans, seq_len)


def pack(
    docs_df: DataFrame,
    seq_len: int = SEQ_LEN,
    n_shards: int = N_SHARDS,
    shuffled: bool = False,
) -> DataFrame:
    """Pack ``docs_df`` (needs ``doc_id``, ``text``) into fixed
    ``seq_len`` token windows, per deterministic shard. Returns one row
    per packed window: ``(shard, chunk_id, n_docs, n_tokens,
    n_split_docs, first_doc, last_doc)`` where ``n_split_docs`` counts
    documents that cross into this window from an adjacent one.
    Within a shard every window except the final one holds exactly
    ``seq_len`` tokens (pinned in tests).

    Plan: one scan computes token counts → per-shard running sum
    (window over ``n_shards`` independent partitions) → chunk explode →
    one groupBy per (shard, window) that REUSES the shard
    partitioning (no post-window exchange, plan-pinned)."""
    chunks = _chunk_overlaps(docs_df, seq_len, n_shards, shuffled=shuffled)
    lo, hi = _slice_bounds(seq_len)
    return (
        chunks.withColumn("take", hi - lo)
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


def pack_sequences_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`pack` with windows counted in REAL subword tokens: per-doc
    token counts come from the released BPE tokenizer
    (`operators/bpe.py::fixed_merges`, the committed `data/bpe_merges.tsv`
    artifact) instead of the whitespace-regex convention — a "512-token
    window" here is 512 BPE symbols, which is what a trainer actually
    consumes. The symbol count is one whole-stage-codegen replace-chain
    projection riding the corpus scan (`bpe_symbol_count_col`): NO
    explode, NO vocab join, NO Python — the plan is byte-identical in
    shape to :func:`pack_sequences` (same per-shard prefix sum, same
    no-global-funnel pin), only the ``n_tokens`` expression differs."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import bpe as B

    d = docs(spark, sf_dir)
    par = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < par:
        d = d.repartition(par)
    vd = d.select(
        "doc_id",
        B.bpe_symbol_count_col(F.col("text")).cast("int").alias("n_tokens"),
    )
    return pack(vd)


def pack_sequences_unigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`pack` with windows counted in RELEASED unigram-LM pieces
    (`operators/unigram.py::fixed_vocab`, the committed
    `data/unigram_vocab.tsv` artifact) — the unigram twin of
    :func:`pack_sequences_bpe`. Viterbi segmentation is a sequential
    per-word DP (not a Column chain like BPE's replace replay), so the
    piece counts come from ONE vocab-sized Arrow pass over the corpus's
    distinct words + an equi-join per-doc rollup
    (`unigram.unigram_piece_counts`); the packing half is byte-identical
    in shape to :func:`pack_sequences` (same per-shard prefix sum, same
    no-global-funnel pin). Registered ORACLE-PAIRED via the
    recursive-CTE Viterbi twin (`unigram.unigram_vit_prelude_sql`,
    `registry.PACK_SEQUENCES_UNIGRAM_SQL`); the independent pure-Python
    Viterbi pin in tests/test_round11_ops.py remains as an additional
    check on the segmentation itself."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import (
        unigram as UG,
    )

    d = docs(spark, sf_dir)
    par = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < par:
        d = d.repartition(par)
    vd = UG.unigram_piece_counts(d).select(
        "doc_id", F.col("wtok").cast("int").alias("n_tokens")
    )
    return pack(vd)


def _pack_sequences_bpe_sql() -> str:
    from c4_5decisiontreebasedonmapreduce_spark.operators import bpe as B

    return _pack_sql(
        n_tokens_sql=f"CAST({B.bpe_symbol_count_sql('text')} AS BIGINT)"
    )


def pack_shuffled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`pack` over `documents` in the reproducible RANDOM
    concatenation order — :func:`shuffle_deterministic`'s manifest made
    physical: within each hash shard documents concatenate by the
    second independent hash instead of doc_id, so corpus-adjacent
    documents (same crawl/site/dump) don't co-occupy training windows.
    Same plan shape as :func:`pack_sequences` (the order key is one
    more scalar hash column riding the existing per-shard window sort);
    per-shard window counts and token totals are IDENTICAL to the
    doc_id-ordered pack (pinned) — only the composition changes."""
    d = docs(spark, sf_dir)
    par = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < par:
        d = d.repartition(par)
    return pack(d, shuffled=True)


def _shuffled_order_sql() -> str:
    h = md5_long_sql(
        "CONCAT('" + _ORDER_SEED + "', CAST(doc_id AS VARCHAR))"
    )
    return f"{h}, doc_id"


def _pack_sql(
    seq_len: int = SEQ_LEN,
    n_shards: int = N_SHARDS,
    source_sql: str = DOCS_SQL,
    prelude: str = "",
    n_tokens_sql: str | None = None,
    order_sql: str = "doc_id",
) -> str:
    """``prelude`` inserts extra CTEs ahead of the pack chain (the
    mixture pipeline prepends its virtual-document CTEs and points
    ``source_sql`` at them); defaults reproduce PACK_SEQUENCES_SQL
    byte-for-byte."""
    shard = md5_long_sql(
        "CONCAT('" + _SHARD_SEED + "', CAST(doc_id AS VARCHAR))"
    )
    count = n_tokens_sql or f"CAST(LEN({_tokens_sql('text')}) AS BIGINT)"
    return f"""
WITH {prelude}toks AS (
  SELECT doc_id,
         {count} AS n_tokens,
         CAST({shard} % {n_shards} AS INT) AS shard
  FROM {source_sql}
),
spans AS (
  SELECT doc_id, n_tokens, shard,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY {order_sql})
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
PACK_SHUFFLED_SQL = _pack_sql(order_sql=_shuffled_order_sql())


def pack_assignments(
    docs_df: DataFrame, seq_len: int = SEQ_LEN, n_shards: int = N_SHARDS
) -> DataFrame:
    """The token-level packing layout beneath :func:`pack`'s manifest:
    one row per (document, window) overlap — ``(shard, chunk_id,
    doc_id, slice_start, slice_len)`` where ``slice_start`` is the
    1-based token offset INSIDE the document and ``slice_len`` how many
    of its tokens land in that window. This is the relation a shard
    writer materializes into physical training files; every document
    appears in CEIL(n_tokens / seq_len) + 0/1 rows, so the relation is
    ~corpus-sized, never quadratic."""
    chunks = _chunk_overlaps(docs_df, seq_len, n_shards)
    lo, hi = _slice_bounds(seq_len)
    return chunks.select(
        "shard",
        "chunk_id",
        "doc_id",
        (lo - F.col("tok_start") + 1).cast("long").alias("slice_start"),
        (hi - lo).cast("long").alias("slice_len"),
    )


def pack_assignments_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`pack_assignments` over the `documents` table (registry
    wrapper)."""
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


def packed_slices(
    docs_df: DataFrame, seq_len: int = SEQ_LEN, n_shards: int = N_SHARDS
) -> DataFrame:
    """The writer's relation: assignments with each ``slice_text`` cut
    in place from the token array riding the per-shard window exchange
    — one scan, one exchange, zero joins (plan-pinned)."""
    chunks = _chunk_overlaps(docs_df, seq_len, n_shards, with_tokens=True)
    lo, hi = _slice_bounds(seq_len)
    slice_start = (lo - F.col("tok_start") + 1).cast("long")
    slice_len = (hi - lo).cast("long")
    return chunks.select(
        "shard",
        "chunk_id",
        "doc_id",
        slice_start.alias("slice_start"),
        slice_len.alias("slice_len"),
        F.array_join(
            F.slice(
                F.col("toks"),
                slice_start.cast("int"),
                slice_len.cast("int"),
            ),
            " ",
        ).alias("slice_text"),
    )


def write_packed_shards(
    spark: SparkSession,
    sf_dir: str,
    path: str,
    seq_len: int = SEQ_LEN,
    n_shards: int = N_SHARDS,
) -> DataFrame:
    """Materialize the packing layout as the on-disk training artifact,
    written ``partitionBy(shard)`` with rows sorted by
    (shard, chunk_id, doc_id) — a trainer streams one shard directory
    per data-parallel rank and concatenates ``slice_text`` in file
    order to get exactly the packed token stream.

    Plan honesty: the token ARRAYS ride the one per-shard window
    exchange (``_chunk_overlaps(with_tokens=True)``) and each slice is
    cut in place with ``slice()`` — there is NO re-tokenize join and no
    second corpus-sized exchange; the sort includes the partition
    column so the dynamic-partition writer adds no sort of its own and
    each shard file is a single contiguous (chunk_id, doc_id) run.
    Returns the rescanned relation."""
    d = docs(spark, sf_dir)
    par = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < par:
        d = d.repartition(par)
    (
        packed_slices(d, seq_len, n_shards)
        .sortWithinPartitions("shard", "chunk_id", "doc_id")
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


def extend_with_state(
    sharded_batch: DataFrame, shard_state: DataFrame, seq_len: int
) -> DataFrame:
    """Shared batch-packing tail of :func:`pack_incremental` and the
    streaming ingest loop: per-shard prefix sum over the batch, base
    offsets from the broadcast ``(shard, base_tokens)`` state, chunk
    explode, assignment select."""
    w = Window.partitionBy("shard").orderBy("doc_id")
    spans = (
        sharded_batch.withColumn(
            "rel_end", F.sum("n_tokens").over(w).cast("long")
        )
        .join(F.broadcast(shard_state), "shard", "left")
        .withColumn(
            "tok_end",
            F.col("rel_end") + F.coalesce("base_tokens", F.lit(0)),
        )
        .withColumn("tok_start", F.col("tok_end") - F.col("n_tokens"))
    )
    chunks = _explode_chunks(spans, seq_len)
    lo, hi = _slice_bounds(seq_len)
    return chunks.select(
        "shard",
        "chunk_id",
        "doc_id",
        (lo - F.col("tok_start") + 1).cast("long").alias("slice_start"),
        (hi - lo).cast("long").alias("slice_len"),
    )


def pack_incremental(
    spark: SparkSession,
    sf_dir: str,
    shard_state: DataFrame | None = None,
    threshold: int | None = None,
    seq_len: int = SEQ_LEN,
    n_shards: int = N_SHARDS,
) -> DataFrame:
    """Ingest-time packing: extend each shard's packed token stream
    with the batch (docs above ``threshold``) — one prefix sum over
    BATCH rows plus a broadcast join against ``shard_state``, the
    ``(shard, base_tokens)`` relation holding each shard's
    already-packed token total (``n_shards`` rows — at 100 TB this is
    the persisted manifest tail, kilobytes). Returns the batch's
    assignment rows, IDENTICAL to the full run's
    :func:`pack_assignments` restricted to batch docs (the oracle pins
    this), including windows that straddle the corpus/batch boundary —
    the base offset lands the first batch token mid-window exactly
    where the full run puts it.

    A real ingest passes BOTH ``threshold`` (the corpus high-water
    doc_id) and ``shard_state`` from persisted metadata — then the only
    source read is the batch slice (``doc_id > threshold`` pushes into
    the scan; plan-pinned single-scan + broadcast). The registry/demo
    defaults derive both from the corpus: ``threshold=None`` costs one
    eager MAX(doc_id) aggregate (parquet column stats make it a
    metadata-weight scan) and ``shard_state=None`` recomputes the
    per-shard totals from the corpus slice."""
    d = docs(spark, sf_dir)
    par = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < par:
        d = d.repartition(par)
    if threshold is None:
        threshold = (
            d.agg(F.max("doc_id")).first()[0] * _INCR_NUM // _INCR_DEN
        )
    sharded = _sharded_tokens(d, n_shards)
    if shard_state is None:
        shard_state = (
            sharded.where(F.col("doc_id") <= threshold)
            .groupBy("shard")
            .agg(F.sum("n_tokens").cast("long").alias("base_tokens"))
        )
    batch = sharded.where(F.col("doc_id") > threshold)
    return extend_with_state(batch, shard_state, seq_len)


PACK_INCREMENTAL_SQL = f"""
SELECT * FROM ({PACK_ASSIGNMENTS_SQL}
)
WHERE doc_id > (SELECT (MAX(doc_id) * {_INCR_NUM}) // {_INCR_DEN}
                FROM documents)"""


# ---------------------------------------------------------------------------
# deterministic training-order shuffle


def shuffle_deterministic(
    spark: SparkSession, sf_dir: str, n_shards: int = N_SHARDS
) -> DataFrame:
    """Reproducible RANDOM training order — the global shuffle every
    pre-training run does before packing so adjacent/corpus-ordered
    documents (same crawl, same site, same dump file) don't land in the
    same batch. The packing family deliberately concatenates in doc_id
    order WITHIN its hash shards (:func:`_chunk_overlaps`); this
    operator produces the randomized manifest you'd feed it instead:
    shard by one portable hash, order within each shard by a SECOND
    independent hash (doc_id as the final tie-break), and number the
    positions per shard.

    Scale shape: the per-shard ``row_number`` runs over ``n_shards``
    independent window partitions — one exchange on shard, per-shard
    in-memory sorts, never a global sort or single-partition funnel
    (thousands of shards at cluster scale, same knob as packing).
    Deterministic end-to-end: both hashes are pure functions of doc_id,
    so re-runs, backfills, and the DuckDB oracle reproduce the SAME
    (shard, pos) for every document."""
    d = docs(spark, sf_dir)
    shard_h = md5_long(
        F.concat(F.lit(_SHARD_SEED), F.col("doc_id").cast("string"))
    )
    order_h = md5_long(
        F.concat(F.lit(_ORDER_SEED), F.col("doc_id").cast("string"))
    )
    w = Window.partitionBy("shard").orderBy("order_h", "doc_id")
    return (
        d.select(
            "doc_id",
            (shard_h % n_shards).cast("int").alias("shard"),
            order_h.alias("order_h"),
        )
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select("doc_id", "shard", "pos")
    )


def _shuffle_deterministic_sql(n_shards: int = N_SHARDS) -> str:
    shard = md5_long_sql(
        "CONCAT('" + _SHARD_SEED + "', CAST(doc_id AS VARCHAR))"
    )
    order_h = md5_long_sql(
        "CONCAT('" + _ORDER_SEED + "', CAST(doc_id AS VARCHAR))"
    )
    return f"""
WITH keyed AS (
  SELECT doc_id,
         CAST({shard} % {n_shards} AS INT) AS shard,
         {order_h} AS order_h
  FROM {DOCS_SQL}
)
SELECT doc_id, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard
                               ORDER BY order_h, doc_id) AS BIGINT) AS pos
FROM keyed"""


SHUFFLE_DETERMINISTIC_SQL = _shuffle_deterministic_sql()


# ---------------------------------------------------------------------------
# mixture → pack: the domain-weighted corpus-to-shards pipeline

# virtual-document key: doc_id·1000 + epoch. Collision needs ≥ 1000
# epochs of one document (a mixture rate of 10⁹ ppm·1000 — no real
# config) and int64 overflow needs doc_id > 9.2e15; both are documented
# bounds, not runtime checks.
_EPOCH_KEY_BASE = 1000


def pipeline_mixture_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end domain-weighted pipeline: epoch-aware mixture
    resampling (``sampling.sample_mixture`` — scarce sources repeat,
    dominant ones downsample) feeding :func:`pack` — i.e. "2.3 epochs
    of Wikipedia" flowing all the way into fixed-length training
    windows. Each (doc, epoch) emission becomes a VIRTUAL document
    (key ``doc_id·1000 + epoch``), so repeated epochs of one document
    land in different hash shards and different stream positions —
    repetition spreads across the training run instead of clumping.

    Scale shape: the mixture half never shuffles the corpus (broadcast
    rates + explode next to the scan; its per-source totals aggregate is
    the second of the plan's TWO corpus scans — the same audited budget
    as `sample_mixture` itself); the packing half is the standard
    per-shard prefix sum over ``n_shards`` independent window
    partitions."""
    from c4_5decisiontreebasedonmapreduce_spark.operators.sampling import (
        sample_mixture,
    )

    m = sample_mixture(spark, sf_dir)
    vdocs = m.select(
        (F.col("doc_id") * _EPOCH_KEY_BASE + F.col("epoch")).alias("doc_id"),
        "n_tokens",  # precomputed — epoch copies are never re-tokenized
    )
    return pack(vdocs)


def _mixture_pack_sql() -> str:
    from c4_5decisiontreebasedonmapreduce_spark.operators.sampling import (
        mixture_prelude_sql,
    )

    # mixture CTEs come from sampling's ONE builder (prefixed "m" to
    # avoid the pack chain's own `toks`), so the pipeline oracle can
    # never drift from the registered sample_mixture oracle; vdocs
    # carries the mixture's n_tokens so epoch copies aren't re-counted
    prelude = f"""{mixture_prelude_sql(prefix="m")},
vdocs AS (
  SELECT doc_id * {_EPOCH_KEY_BASE}
           + CAST(UNNEST(generate_series(1, n_copies)) AS BIGINT) AS doc_id,
         n_tokens
  FROM mj WHERE n_copies >= 1
),
"""
    return _pack_sql(
        source_sql="vdocs",
        prelude=prelude,
        n_tokens_sql="CAST(n_tokens AS BIGINT)",
    )


PIPELINE_MIXTURE_PACK_SQL = _mixture_pack_sql()


def _pack_sequences_unigram_sql() -> str:
    """DuckDB oracle for :func:`pack_sequences_unigram` — Viterbi as a
    RECURSIVE CTE, so the released-unigram packing is hash-graded like
    the BPE twin instead of rows-only.

    The per-word DP carries the last four dp values (and piece counts)
    as columns; iteration i computes ``dp[i+1] = max over L in 1..4 of
    dp[i+1-L] + logprob(substr(word, i+2-L, L))`` with the
    longest-final-piece tie rule implemented by checking L=4 first.
    Cross-engine float determinism: both engines parse the SAME
    6dp-rounded logprob literals from the committed artifact and add
    them in the SAME DP order, so every dp value is bit-identical and
    every comparison resolves identically (the score_terms decimal-sum
    argument, applied to a DP). Unsegmentable words (dp stays at the
    -1e308 floor) fall back to their character count, matching
    `unigram_piece_counts`."""
    from c4_5decisiontreebasedonmapreduce_spark.operators.unigram import (
        unigram_vit_prelude_sql,
    )

    prelude = f"""{unigram_vit_prelude_sql()}
doc_wtok AS (
  SELECT t.doc_id, SUM(v.n_p) AS wtok
  FROM (SELECT doc_id, UNNEST({_tokens_sql('text')}) AS word
        FROM {DOCS_SQL}) t
  JOIN vit v USING (word)
  GROUP BY 1
),
"""
    return _pack_sql(
        prelude=prelude,
        source_sql="doc_wtok",
        n_tokens_sql="CAST(CAST(wtok AS INT) AS BIGINT)",
    )


PACK_SEQUENCES_UNIGRAM_SQL = _pack_sequences_unigram_sql()
