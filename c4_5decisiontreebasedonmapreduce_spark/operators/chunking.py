"""Sliding-window document chunking for context-window preparation.

A pretraining/RAG pipeline rarely feeds whole documents to a model: it
cuts each document into fixed-size token windows with a stride (overlap
keeps boundary context; retrieval indexes chunk embeddings, trainers
pack chunks). The reference engine has no analogue — this is engine
extension surface in the spirit of SURVEY §2.C, sitting between the
tokenizer (`text.tokens_col`, the shared convention every text op uses)
and the packer (`packing.pack_sequences`, which consumes arbitrary
(id, n_tokens) streams and therefore composes with chunks unchanged).

Scale shape: chunking is embarrassingly parallel — ONE projection over
the corpus (tokenize, `explode(sequence)` of window starts, slice), no
exchange, no window function, no Python. Output size is
corpus_tokens × (size/stride) in the worst case, which is why the
stride is a parameter and not hardcoded overlap-heavy.

Determinism: window starts are `sequence(0, n-1, stride)` — purely a
function of the document's token count, so re-chunking a grown corpus
never moves existing chunks (chunk_id is stable), the same
append-stability contract as the hash-based sampling ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from c4_5decisiontreebasedonmapreduce_spark.operators.text import (
    DOCS_SQL,
    _tokens_sql,
    docs,
    tokens_col,
)

CHUNK_SIZE = 64
CHUNK_STRIDE = 48


def chunk_documents(
    spark: SparkSession,
    sf_dir: str,
    size: int = CHUNK_SIZE,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """Cut every document into ``size``-token windows every ``stride``
    tokens (trailing window may be short; empty documents produce no
    chunks). Emits ``(doc_id, chunk_id, chunk_start, n_chunk_tokens,
    chunk_text)`` — chunk_id numbers windows within the doc, chunk_start
    is the 0-based token offset.

    One projection: tokenize → explode the start sequence → slice. The
    only data-sized cost is the output itself; there is no shuffle at
    all (plan-pinned in test_scale_plans)."""
    return chunks_from(docs(spark, sf_dir), size=size, stride=stride)


def chunk_documents_bpe(
    spark: SparkSession,
    sf_dir: str,
    size: int = CHUNK_SIZE,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """:func:`chunk_documents` in REAL subword units: windows and
    strides count BPE symbols of the released tokenizer
    (`operators/bpe.py::fixed_merges`) instead of whitespace-regex
    tokens, and ``chunk_text`` is the space-joined symbol slice — the
    context-window view a model with this tokenizer actually sees.
    Same zero-exchange single-projection plan (the symbol array is one
    codegen'd replace-chain per row, no explode/join/Python)."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import bpe as B

    # spread-if-narrow: the sf0.1 corpus is one parquet split, and the
    # replace-chain projection is the whole cost of this query — on the
    # unspread scan it ran as a 1.25 s single-task stage (the exchange
    # moves only the raw docs bytes; at cluster scale the scan is
    # already wide and the guard makes this a no-op).
    d = docs(spark, sf_dir)
    par = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < par:
        d = d.repartition(par)
    return chunks_from(
        d,
        size=size,
        stride=stride,
        toks=B.bpe_symbols_col(F.col("text")),
    )


def chunks_from(
    d,
    size: int = CHUNK_SIZE,
    stride: int = CHUNK_STRIDE,
    carry: tuple[str, ...] = (),
    toks=None,
) -> DataFrame:
    """The chunking projection over an arbitrary ``(doc_id, text, …)``
    relation; ``carry`` columns ride through unchanged (the composed
    pipelines carry ``source``). ``toks`` overrides the tokenizer
    column (default: the shared whitespace-regex convention)."""
    toks = tokens_col(F.col("text")) if toks is None else toks
    base = d.select("doc_id", *carry, toks.alias("toks")).withColumn(
        "n", F.size("toks")
    )
    starts = F.when(
        F.col("n") > 0,
        F.sequence(F.lit(0), F.col("n") - 1, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    return (
        base.select(
            "doc_id",
            *carry,
            "n",
            "toks",
            F.explode(starts).alias("chunk_start"),
        )
        .select(
            "doc_id",
            *carry,
            (F.col("chunk_start") / stride).cast("bigint").alias("chunk_id"),
            F.col("chunk_start").cast("bigint").alias("chunk_start"),
            F.least(F.lit(size), F.col("n") - F.col("chunk_start"))
            .cast("bigint")
            .alias("n_chunk_tokens"),
            F.array_join(
                F.slice(F.col("toks"), F.col("chunk_start") + 1, size), " "
            ).alias("chunk_text"),
        )
    )


CHUNK_SQL_TEMPLATE = """
WITH t AS (
  SELECT doc_id, {tokens} AS toks FROM {docs}
), e AS (
  SELECT doc_id, toks, LEN(toks) AS n,
         UNNEST(RANGE(0, GREATEST(LEN(toks), 0), {stride})) AS chunk_start
  FROM t
)
SELECT doc_id,
       CAST(chunk_start / {stride} AS BIGINT) AS chunk_id,
       CAST(chunk_start AS BIGINT) AS chunk_start,
       CAST(LEAST({size}, n - chunk_start) AS BIGINT) AS n_chunk_tokens,
       ARRAY_TO_STRING(toks[chunk_start + 1 : chunk_start + {size}], ' ')
         AS chunk_text
FROM e"""

CHUNK_SQL = CHUNK_SQL_TEMPLATE.format(
    tokens=_tokens_sql("text"),
    docs=DOCS_SQL,
    stride=CHUNK_STRIDE,
    size=CHUNK_SIZE,
)


def chunk_bpe_sql() -> str:
    """Oracle for :func:`chunk_documents_bpe` — the SAME chunk chain
    over the DuckDB twin of the BPE symbol array."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import bpe as B

    return CHUNK_SQL_TEMPLATE.format(
        tokens=B.bpe_symbols_sql("text"),
        docs=DOCS_SQL,
        stride=CHUNK_STRIDE,
        size=CHUNK_SIZE,
    )
