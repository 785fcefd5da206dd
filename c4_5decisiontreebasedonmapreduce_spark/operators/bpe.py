"""Distributed BPE merge training over the `documents` table.

The engine already counts GPT-2-shaped pre-tokens (`text.py:token_count_bpe`)
and ranks a corpus vocabulary (`text.py:vocab_coverage`); this module LEARNS
the merges — the iterative pair-count/argmax/merge loop of byte-pair
encoding (Sennrich et al. 2016), the tokenizer-training step of every LLM
data pipeline. The reference has no text surface at all; this extends the
same level-synchronous iterate-until-done shape as its C4.5 loop
(`Main.java:110-131` — per-iteration grouped statistics, a driver-side
argmax, broadcast of the decision) to tokenizer training.

Scale design — the corpus is touched ONCE:

1. One scan + one shuffle builds the distinct-word frequency table
   ``(word, freq)``. By Heaps' law this is vocab-sized (≪ corpus-sized);
   every BPE iteration afterwards runs on the word table only, so
   per-iteration cost is bounded by the vocabulary, NOT the corpus —
   the probe in tests pins that a 10× corpus with the same vocabulary
   leaves the iteration input byte-identical.
2. When the word table fits the driver bound (≤ ``BPE_DRIVER_MAX_WORDS``,
   same pattern as tree.py's ``_driver_level_stats``), the merge loop
   runs in-process over Arrow-collected counts with incremental
   pair-count maintenance (only words containing the merged pair are
   rewritten — the standard tokenizer-trainer algorithm).
3. Above the bound, :func:`_train_distributed` runs the SAME loop
   level-synchronously on the cluster: per-iteration adjacent-pair
   explode → grouped sum → argmax (count DESC, pair ASC — deterministic
   tie-break) → broadcast the winning pair into a left-to-right greedy
   fold over each word's symbol array; the symbol table is
   localCheckpointed every few iterations to truncate lineage (the
   NodeIdCache move from the tree trainer). Both paths are pinned equal
   in tests/test_bpe.py.

Merge-apply semantics (identical in both paths and the naive test
reference): scan the symbol sequence left-to-right, merging the FIRST of
any overlapping occurrences — ``aaa`` under merge ``(a,a)`` becomes
``(aa, a)``. Pair counts weight by word frequency and count overlapping
occurrences per position (``aaa`` contributes 2·freq to ``(a,a)``).
Training stops after ``n_merges`` or when the best pair's count < 2
(merging a once-seen pair never compresses anything).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from c4_5decisiontreebasedonmapreduce_spark.operators import text as TX
from c4_5decisiontreebasedonmapreduce_spark.operators.text import tokens_col

#: driver-side word-table bound (rows). A 4M-row (word, freq) Arrow
#: transfer is tens of MB; beyond it the distributed loop takes over.
BPE_DRIVER_MAX_WORDS = 4_000_000

#: merges learned by the registry query — small enough for a pinned
#: oracle, large enough to exercise multi-character merge chains.
BPE_N_MERGES = 64

MERGES_SCHEMA = (
    "merge_rank int, lhs string, rhs string, merged string,"
    " pair_count bigint"
)


def word_counts(d: DataFrame) -> DataFrame:
    """The ONE corpus-sized stage: ``(word, freq)`` under the shared
    lowercase/alnum tokenizer. Map-side combined grouped count — the
    same shape as every contingency in this engine."""
    return (
        d.select(F.explode(tokens_col(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _merge_word(syms: tuple, left: str, right: str) -> tuple:
    """Left-to-right greedy merge of (left, right) in one symbol tuple."""
    out = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _pair_iter(syms: tuple):
    return zip(syms, syms[1:])


def _train_driver(
    rows: list[tuple[str, int]], n_merges: int
) -> list[tuple[int, str, str, str, int]]:
    """The in-process merge loop over the collected word table, with
    incremental pair-count maintenance: a pair→word index means each
    iteration rewrites ONLY the words containing the winning pair and
    adjusts counts by their before/after delta — the standard
    tokenizer-trainer algorithm, O(affected words) per iteration."""
    words: list[tuple] = []
    freqs: list[int] = []
    for w, f in rows:
        words.append(tuple(w))
        freqs.append(int(f))
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for idx, (syms, f) in enumerate(zip(words, freqs)):
        for p in _pair_iter(syms):
            pair_counts[p] = pair_counts.get(p, 0) + f
            pair_words.setdefault(p, set()).add(idx)
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(n_merges):
        if not pair_counts:
            break
        # deterministic argmax: count DESC, then lexicographic pair ASC
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        if cnt < 2:
            break
        merges.append((rank, left, right, left + right, cnt))
        for idx in list(pair_words.get((left, right), ())):
            old, f = words[idx], freqs[idx]
            new = _merge_word(old, left, right)
            words[idx] = new
            for p in _pair_iter(old):
                c = pair_counts[p] - f
                if c:
                    pair_counts[p] = c
                else:
                    del pair_counts[p]
                    pair_words.pop(p, None)
                s = pair_words.get(p)
                if s is not None:
                    s.discard(idx)
            for p in _pair_iter(new):
                pair_counts[p] = pair_counts.get(p, 0) + f
                pair_words.setdefault(p, set()).add(idx)
    return merges


def _train_distributed(
    wc: DataFrame, n_merges: int, checkpoint_every: int = 8
) -> list[tuple[int, str, str, str, int]]:
    """The level-synchronous cluster twin: symbol arrays stay
    distributed; each iteration is one grouped pair count (vocab-sized
    exchange), a 1-row argmax collect, and a broadcast greedy fold —
    exactly c45_train's per-level shape. Lineage is truncated every
    ``checkpoint_every`` merges."""
    syms = wc.select(
        F.split(F.col("word"), "").alias("syms"), "freq"
    ).localCheckpoint()
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(n_merges):
        pairs = (
            syms.where(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("syms") - 1),
                        lambda i: F.struct(
                            F.element_at("syms", i).alias("l"),
                            F.element_at("syms", i + 1).alias("r"),
                        ),
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
        )
        top = pairs.orderBy(F.desc("cnt"), "l", "r").limit(1).collect()
        if not top or top[0]["cnt"] < 2:
            break
        left, right, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        merges.append((rank, left, right, left + right, cnt))
        l_lit, r_lit = F.lit(left), F.lit(right)
        # left-to-right greedy merge as a fold: the accumulator starts
        # with the first symbol (never empty, tokens are non-empty), and
        # each step either fuses into the accumulator's tail or appends.
        # A just-fused tail equals left+right, not left, so overlapping
        # occurrences resolve exactly like _merge_word.
        merged = F.aggregate(
            F.slice(F.col("syms"), 2, F.greatest(F.size("syms") - 1, F.lit(0))),
            F.array(F.element_at("syms", 1)),
            lambda acc, s: F.when(
                (F.element_at(acc, -1) == l_lit) & (s == r_lit),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(F.concat(l_lit, r_lit)),
                ),
            ).otherwise(F.concat(acc, F.array(s))),
        )
        syms = syms.select(merged.alias("syms"), "freq")
        if (rank + 1) % checkpoint_every == 0:
            syms = syms.localCheckpoint()
    return merges


def bpe_train_rel(
    d: DataFrame,
    n_merges: int = BPE_N_MERGES,
    driver_max_words: int = BPE_DRIVER_MAX_WORDS,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges over a ``(doc_id, text)`` relation;
    returns the merge table ``(rank, left, right, merged, pair_count)``
    in learned order. One corpus scan; see the module docstring for the
    two iteration paths."""
    spark = d.sparkSession
    wc = word_counts(d).localCheckpoint()
    merges = train_merges(wc, n_merges, driver_max_words)
    return spark.createDataFrame(merges, MERGES_SCHEMA)


def bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`bpe_train_rel` over the `documents` table (spread like
    the other text operators — a single-file scan must not serialize
    the tokenize pass onto one core)."""
    d = TX.docs(spark, sf_dir)
    par = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < par:
        d = d.repartition(par)
    return bpe_train_rel(d)


def train_merges(
    wc: DataFrame,
    n_merges: int = BPE_N_MERGES,
    driver_max_words: int = BPE_DRIVER_MAX_WORDS,
) -> list[tuple[int, str, str, str, int]]:
    """Learn merges from a materialized ``(word, freq)`` table — the
    shared core of :func:`bpe_train_rel` and :func:`bpe_encode_rel`."""
    if wc.count() <= driver_max_words:
        rows = [(r["word"], r["freq"]) for r in wc.collect()]
        return _train_driver(rows, n_merges)
    return _train_distributed(wc, n_merges)


def bpe_segment_words(
    wc: DataFrame, merges: list[tuple[int, str, str, str, int]]
) -> DataFrame:
    """Segment every DISTINCT word by replaying the learned merges in
    rank order — ``(word, symbols array<string>)``.

    The replay is an inherently sequential per-word loop (merge i's
    output feeds merge i+1), so this is the engine's documented
    Pandas-UDF escape hatch: an Arrow-batched ``mapInPandas`` over the
    VOCAB-SIZED word table (never the corpus — by Heaps' law the words
    relation is what stays small at 100 TB), with the merge list (a
    tokenizer artifact, broadcast-sized by definition) captured in the
    closure. Corpus-sized work then reduces to an equi-join against
    this relation."""
    pairs = [(l, r) for _, l, r, _, _ in merges]

    def seg(batches):
        for pdf in batches:
            out = []
            for w in pdf["word"]:
                syms: tuple = tuple(w)
                for left, right in pairs:
                    if len(syms) < 2:
                        break
                    syms = _merge_word(syms, left, right)
                out.append(list(syms))
            yield pdf.assign(symbols=out)[["word", "symbols"]]

    return wc.select("word").mapInPandas(
        seg, "word string, symbols array<string>"
    )


def bpe_encode_rel(
    d: DataFrame, n_merges: int = BPE_N_MERGES
) -> DataFrame:
    """ENCODE the corpus under its own learned BPE: per document,
    ``(doc_id, n_words, n_chars, n_bpe_symbols, chars_per_symbol)`` —
    the compression signal a tokenizer-budget pipeline reads.

    Scale shape: train touches the corpus once (see
    :func:`word_counts`); segmentation runs on the distinct-word table
    (:func:`bpe_segment_words`); the corpus-sized remainder is one
    token explode, one equi-join on the word against the vocab-sized
    segmentation, and one per-doc rollup — the tokenize-family shape,
    nothing quadratic."""
    wc = word_counts(d).localCheckpoint()
    merges = train_merges(wc, n_merges)
    seg = bpe_segment_words(wc, merges).withColumn(
        "n_sym", F.size("symbols")
    ).select("word", "n_sym")
    toks = d.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("word")
    )
    return (
        toks.join(seg, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum(F.length("word")).cast("long").alias("n_chars"),
            F.sum("n_sym").cast("long").alias("n_bpe_symbols"),
        )
        .withColumn(
            "chars_per_symbol",
            F.round(
                F.col("n_chars") / F.col("n_bpe_symbols").cast("double"), 6
            ),
        )
    )


# ---------------------------------------------------------------------------
# the RELEASED tokenizer: a committed merge artifact + closed-form apply
#
# Real pipelines do not retrain the tokenizer per corpus slice — they train
# it once (on a sample) and ship the merge list with the model. The
# committed artifact `data/bpe_merges.tsv` is bpe_train's output at the
# driver's grading scale (sf0.01), pinned reproducible in tests. Everything
# downstream (BPE-aware packing/chunking) applies this FIXED merge list.
#
# Apply without Python: greedy left-to-right merge replay is expressible as
# a chain of literal string REPLACEs over a slash-delimited symbol string.
# A word's symbols are joined as `//c//a//t//` (every boundary is `//`);
# merge (l, r) is `replace(s, '/l//r/', '/lr/')` — the pattern consumes one
# slash of each outer boundary and the replacement restores it, so symbol
# boundaries survive, and because literal replace scans left-to-right
# without revisiting its own output, overlapping occurrences resolve
# EXACTLY like `_merge_word` (`//a//a//a//` + (a,a) → `//aa//a//`).
# Spark's `replace` and DuckDB's `REPLACE` share these semantics, so the
# same construction is both the JVM-codegen Column path and the oracle SQL
# — no mapInPandas, no golden pinning. Words inside one document are
# joined with a 4-slash boundary (`t////d`), which no `/l//r/` pattern can
# ever match across, so merges never cross word boundaries.

from pathlib import Path as _Path

BPE_MERGES_PATH = (
    _Path(__file__).resolve().parent.parent.parent / "data" / "bpe_merges.tsv"
)

_FIXED_MERGES: list[tuple[int, str, str, str, int]] | None = None


def fixed_merges() -> list[tuple[int, str, str, str, int]]:
    """The committed tokenizer artifact, parsed once per process."""
    global _FIXED_MERGES
    if _FIXED_MERGES is None:
        rows = []
        for ln in BPE_MERGES_PATH.read_text().splitlines():
            if not ln or ln.startswith("#"):
                continue
            rank, lhs, rhs, merged, cnt = ln.split("\t")
            rows.append((int(rank), lhs, rhs, merged, int(cnt)))
        _FIXED_MERGES = rows
    return _FIXED_MERGES


def _doc_symbol_string(text) -> "F.Column":
    """The whole document as one delimited symbol string: each token's
    characters joined by ``//``, tokens joined by ``////``."""
    per_word = F.transform(
        tokens_col(text),
        lambda w: F.concat(F.lit("//"), F.regexp_replace(w, "(.)", r"$1//")),
    )
    return F.array_join(per_word, "")


def _apply_merges_col(s, merges) -> "F.Column":
    for _, left, right, merged, _ in merges:
        s = F.replace(
            s, F.lit(f"/{left}//{right}/"), F.lit(f"/{merged}/")
        )
    return s


def bpe_symbol_count_col(
    text, merges: list[tuple[int, str, str, str, int]] | None = None
) -> "F.Column":
    """Per-document BPE symbol count under the fixed merge list — one
    whole-stage-codegen projection (build the delimited string, chain
    one literal replace per merge rank, count ``/+``-separated
    segments). NULL-token-free by construction; a token-less document
    counts 0. The corpus is touched exactly once and nothing shuffles."""
    merges = fixed_merges() if merges is None else merges
    s = _apply_merges_col(_doc_symbol_string(text), merges)
    # segments of '/+'-split: ['', sym1, ..., symN, ''] → size-2;
    # an empty string splits to [''] (size 1), so clamp at 0
    return F.greatest(F.size(F.split(s, "/+")) - 2, F.lit(0))


def bpe_symbols_col(
    text, merges: list[tuple[int, str, str, str, int]] | None = None
) -> "F.Column":
    """The document's BPE symbol ARRAY under the fixed merge list —
    the same replace chain, split on ``/+`` (word boundaries collapse
    with symbol boundaries; only the leading/trailing segments are
    empty, so one filter strips them)."""
    merges = fixed_merges() if merges is None else merges
    s = _apply_merges_col(_doc_symbol_string(text), merges)
    return F.filter(F.split(s, "/+"), lambda t: t != "")


def _apply_merges_sql(expr: str, merges) -> str:
    s = (
        "ARRAY_TO_STRING(LIST_TRANSFORM("
        f"{_tokens_sql_ref(expr)}, "
        "w -> '//' || REGEXP_REPLACE(w, '(.)', '\\1//', 'g')), '')"
    )
    for _, left, right, merged, _ in merges:
        s = f"REPLACE({s}, '/{left}//{right}/', '/{merged}/')"
    return s


def bpe_symbol_count_sql(
    expr: str, merges: list[tuple[int, str, str, str, int]] | None = None
) -> str:
    """DuckDB twin of :func:`bpe_symbol_count_col` — identical REPLACE
    chain, so the oracle computes the count independently from the same
    committed artifact."""
    merges = fixed_merges() if merges is None else merges
    s = _apply_merges_sql(expr, merges)
    return (
        f"GREATEST(LEN(REGEXP_SPLIT_TO_ARRAY({s}, '/+')) - 2, 0)"
    )


def bpe_symbols_sql(
    expr: str, merges: list[tuple[int, str, str, str, int]] | None = None
) -> str:
    """DuckDB twin of :func:`bpe_symbols_col`."""
    merges = fixed_merges() if merges is None else merges
    s = _apply_merges_sql(expr, merges)
    return (
        f"LIST_FILTER(REGEXP_SPLIT_TO_ARRAY({s}, '/+'), t -> t <> '')"
    )


def _tokens_sql_ref(expr: str) -> str:
    from c4_5decisiontreebasedonmapreduce_spark.operators.text import (
        _tokens_sql,
    )

    return _tokens_sql(expr)


def bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`bpe_encode_rel` over the `documents` table. Rows-only in
    the registry (merge replay is not SQL-expressible); segmentation
    correctness is pinned differentially in tests/test_bpe.py."""
    d = TX.docs(spark, sf_dir)
    par = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < par:
        d = d.repartition(par)
    return bpe_encode_rel(d)
