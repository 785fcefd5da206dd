"""Unigram-LM (SentencePiece-style) tokenizer training over `documents`.

The second tokenizer-training family next to BPE (`operators/bpe.py`):
where BPE grows a vocabulary bottom-up by merging the most frequent
adjacent pair, the unigram LM starts from an overcomplete seed of
candidate pieces and alternates Viterbi segmentation (E) with count
re-estimation and pruning (M) — Kudo 2018's hard-EM variant. The
reference engine has no text surface (it is a C4.5 trainer); this module
lives on the engine's extension north star and reuses BPE's scale
architecture wholesale:

1. The corpus is touched ONCE: the distinct-word frequency table
   ``(word, freq)`` is vocab-sized by Heaps' law; every EM iteration
   runs on it, never the corpus.
2. The SEED — all substrings up to :data:`UNIGRAM_MAX_PIECE_LEN` chars,
   weighted by word frequency and overlap-counted — is pure relational
   algebra (explode positions × lengths → grouped sum → ranked top-N),
   so `unigram_seed_vocab` is ORACLE-PAIRED: Spark's nested
   transform/flatten explode vs DuckDB's UNNEST(GENERATE_SERIES), both
   hash-graded.
3. Viterbi segmentation is an inherently sequential per-word DP — the
   engine's documented Pandas-UDF escape hatch (`bpe_segment_words`
   precedent): an Arrow ``mapInPandas`` over the VOCAB-SIZED word
   table, piece log-probs (the model — broadcast-sized by definition)
   captured in the closure; the M-step is one grouped sum over the
   emitted pieces. When the word table fits
   :data:`UNIGRAM_DRIVER_MAX_WORDS`, the whole loop runs in-process
   over one Arrow collect (tree.py's ``_driver_level_stats`` pattern);
   both paths are pinned output-equal in tests/test_round10_ops.py.
4. Encoding the corpus (`unigram_encode`) reduces to the tokenize-
   family shape: segment DISTINCT words once, then one explode + one
   equi-join + one per-doc rollup. Nothing corpus-sized ever crosses
   the Python boundary.

Determinism: ties are resolved identically everywhere by construction —
the Viterbi tie-break (equal score → prefer the longer final piece) and
the ranking tie-break (count DESC, piece ASC) are fixed rules, and the
driver and distributed paths execute the SAME ``_viterbi`` function, so
float equality is bit-identical.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from c4_5decisiontreebasedonmapreduce_spark.operators.bpe import word_counts
from c4_5decisiontreebasedonmapreduce_spark.operators.text import (
    DOCS_SQL,
    _tokens_sql,
    docs,
    tokens_col,
)

UNIGRAM_MAX_PIECE_LEN = 4
#: multi-character seed pieces kept (all single characters always stay —
#: they guarantee every word remains segmentable)
UNIGRAM_SEED_MULTI = 64
UNIGRAM_N_ITERS = 3
#: driver-side word-table bound (rows), the BPE_DRIVER_MAX_WORDS twin
UNIGRAM_DRIVER_MAX_WORDS = 4_000_000

VOCAB_SCHEMA = "piece string, piece_len int, cnt bigint, logprob double, rank int"


# ---------------------------------------------------------------------------
# seed vocabulary (oracle-paired)


def _substring_counts(wc: DataFrame) -> DataFrame:
    """Overlap-counted substring totals: each occurrence position of a
    ≤ L-char substring contributes the word's corpus frequency. JVM-side
    nested transform + flatten + explode — no Python."""
    pieces = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(
                        F.lit(UNIGRAM_MAX_PIECE_LEN),
                        F.length("word") - i + 1,
                    ),
                ),
                lambda l: F.col("word").substr(i, l),
            ),
        )
    )
    return (
        wc.select(F.explode(pieces).alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
    )


def seed_vocab_rel(wc: DataFrame) -> DataFrame:
    """The EM seed: ALL single characters plus the top
    :data:`UNIGRAM_SEED_MULTI` multi-character substrings by
    (count DESC, piece ASC). Output ranked over the whole seed."""
    counted = _substring_counts(wc).withColumn(
        "piece_len", F.length("piece").cast("int")
    )
    # top-N as orderBy+limit → TakeOrderedAndProject (a distributed
    # per-partition top-N + driver merge), NOT a single-partition
    # row_number over the full substring relation — that relation is
    # O(vocab × word_len × L) and would funnel at web scale
    multi = (
        counted.where(F.col("piece_len") >= 2)
        .orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(UNIGRAM_SEED_MULTI)
    )
    seed = counted.where(F.col("piece_len") == 1).unionByName(multi)
    # the final rank window runs over the SELECTED seed only (≤ N_multi
    # + alphabet rows — model-sized by construction)
    w_all = Window.partitionBy(F.lit(1)).orderBy(
        F.desc("cnt"), F.asc("piece")
    )
    return seed.select(
        "piece",
        "piece_len",
        "cnt",
        F.row_number().over(w_all).cast("int").alias("rank"),
    )


def unigram_seed_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    return seed_vocab_rel(word_counts(docs(spark, sf_dir)))


UNIGRAM_SEED_SQL = f"""
WITH wc AS (
  SELECT word, COUNT(*) AS freq FROM (
    SELECT UNNEST({_tokens_sql('text')}) AS word FROM {DOCS_SQL}) t
  GROUP BY 1
),
e AS (
  SELECT word, freq, UNNEST(GENERATE_SERIES(1, LEN(word))) AS i FROM wc
),
e2 AS (
  SELECT word, freq, i,
         UNNEST(GENERATE_SERIES(
             1, LEAST({UNIGRAM_MAX_PIECE_LEN}, LEN(word) - i + 1))) AS l
  FROM e
),
counted AS (
  SELECT SUBSTR(word, CAST(i AS INT), CAST(l AS INT)) AS piece,
         CAST(SUM(freq) AS BIGINT) AS cnt
  FROM e2 GROUP BY 1
),
sized AS (SELECT piece, CAST(LEN(piece) AS INT) AS piece_len, cnt FROM counted),
multi AS (
  SELECT piece, piece_len, cnt FROM (
    SELECT *, ROW_NUMBER() OVER (ORDER BY cnt DESC, piece ASC) AS r
    FROM sized WHERE piece_len >= 2)
  WHERE r <= {UNIGRAM_SEED_MULTI}
),
seed AS (
  SELECT piece, piece_len, cnt FROM sized WHERE piece_len = 1
  UNION ALL SELECT piece, piece_len, cnt FROM multi
)
SELECT piece, piece_len, cnt,
       CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, piece ASC) AS INT) AS rank
FROM seed"""


# ---------------------------------------------------------------------------
# hard-EM training


def _viterbi(word: str, logp: dict) -> list[str]:
    """Max-logprob segmentation of one word over the piece set. DP over
    prefixes; on equal score the LONGER final piece wins (smaller j) —
    a fixed rule shared by every execution path."""
    n = len(word)
    neg = float("-inf")
    dp = [neg] * (n + 1)
    dp[0] = 0.0
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        # strict `>` + ascending j IS the tie rule: the smallest j
        # (longest final piece) reaches each score first and later
        # equal-score candidates never overwrite it
        for j in range(max(0, i - UNIGRAM_MAX_PIECE_LEN), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None or dp[j] == neg:
                continue
            score = dp[j] + lp
            if score > dp[i]:
                dp[i] = score
                back[i] = j
    out = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    out.reverse()
    return out


def _logprobs(counts: dict) -> dict:
    total = sum(counts.values())
    return {p: math.log(c / total) for p, c in counts.items() if c > 0}


def _em_counts_driver(words: list, logp: dict) -> dict:
    counts: dict = {}
    for w, f in words:
        for piece in _viterbi(w, logp):
            counts[piece] = counts.get(piece, 0) + f
    return counts


def _em_counts_distributed(wc: DataFrame, logp: dict) -> dict:
    """One E+M round on the cluster: Arrow-segment the vocab-sized word
    table with the broadcast-in-closure model, grouped-sum the emitted
    pieces. The collect is bounded by the piece set, not the corpus."""
    import pandas as pd

    def seg(batches):
        for pdf in batches:
            out_p, out_c = [], []
            for w, f in zip(pdf["word"], pdf["freq"]):
                for piece in _viterbi(w, logp):
                    out_p.append(piece)
                    out_c.append(int(f))
            yield pd.DataFrame({"piece": out_p, "c": out_c})

    rows = (
        wc.mapInPandas(seg, "piece string, c long")
        .groupBy("piece")
        .agg(F.sum("c").alias("cnt"))
        .collect()
    )
    return {r.piece: r.cnt for r in rows}


def train_vocab(
    wc: DataFrame,
    n_iters: int = UNIGRAM_N_ITERS,
    driver_max_words: int = UNIGRAM_DRIVER_MAX_WORDS,
) -> list[tuple[str, int, int, float, int]]:
    """Run hard-EM from the seed; returns the final vocabulary as
    ``(piece, piece_len, cnt, logprob, rank)`` with cnt > 0. Pieces
    never chosen by any Viterbi path are pruned after each iteration
    (single characters are kept DURING EM for reachability and only
    dropped from the final output if unused)."""
    seed = {r.piece: r.cnt for r in seed_vocab_rel(wc).collect()}
    logp = _logprobs(seed)

    n_words = wc.count()
    words = None
    if n_words <= driver_max_words:
        words = [(r.word, r.freq) for r in wc.collect()]

    counts = seed
    for _ in range(n_iters):
        counts = (
            _em_counts_driver(words, logp)
            if words is not None
            else _em_counts_distributed(wc, logp)
        )
        # prune: multi-char pieces with zero Viterbi mass vanish; single
        # chars stay reachable with a floor of their seed presence
        keep = {p: c for p, c in counts.items() if c > 0}
        for p in logp:
            if len(p) == 1 and p not in keep:
                keep[p] = 0
        logp = _logprobs({p: c for p, c in keep.items() if c > 0})
        # 0-count singles stay in the DP alphabet via a tiny epsilon so
        # words containing them remain segmentable
        floor = (
            math.log(0.5 / max(sum(c for c in keep.values()), 1))
        )
        for p, c in keep.items():
            if c == 0:
                logp[p] = floor
        counts = keep

    total = sum(c for c in counts.values() if c > 0)
    final = sorted(
        ((p, c) for p, c in counts.items() if c > 0),
        key=lambda t: (-t[1], t[0]),
    )
    return [
        (p, len(p), c, round(math.log(c / total), 6), i + 1)
        for i, (p, c) in enumerate(final)
    ]


def unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained unigram vocabulary as a relation. Iterative EM is not
    SQL-expressible — registered rows-only; graded by the independent
    pure-Python reference equality + driver/distributed parity pins in
    tests/test_round10_ops.py (the bpe_train grading pattern)."""
    wc = word_counts(docs(spark, sf_dir)).localCheckpoint()
    return spark.createDataFrame(train_vocab(wc), VOCAB_SCHEMA)


# ---------------------------------------------------------------------------
# corpus encoding


def segment_words(wc: DataFrame, vocab) -> DataFrame:
    """Viterbi-segment every DISTINCT word under the final vocabulary —
    ``(word, pieces array<string>)``; vocab-sized Arrow pass."""
    import pandas as pd

    logp = {p: lp for p, _len, _c, lp, _r in vocab}

    def seg(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "pieces": [list(_viterbi(w, logp)) for w in pdf["word"]],
                }
            )

    return wc.select("word").mapInPandas(
        seg, "word string, pieces array<string>"
    )


def unigram_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram encoding statistics ``(doc_id, n_words,
    n_chars, n_pieces, chars_per_piece)`` — the compression signal,
    `bpe_encode`'s shape exactly: train once, segment distinct words,
    then one explode + equi-join + per-doc rollup."""
    d = docs(spark, sf_dir)
    wc = word_counts(d).localCheckpoint()
    vocab = train_vocab(wc)
    seg = (
        segment_words(wc, vocab)
        .withColumn("n_p", F.size("pieces"))
        .select("word", "n_p")
    )
    toks = d.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("word")
    )
    return (
        toks.join(seg, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum(F.length("word")).cast("long").alias("n_chars"),
            F.sum("n_p").cast("long").alias("n_pieces"),
        )
        .withColumn(
            "chars_per_piece",
            F.round(
                F.col("n_chars") / F.col("n_pieces").cast("double"), 6
            ),
        )
    )


# ---------------------------------------------------------------------------
# the RELEASED unigram tokenizer (round 11): committed vocab artifact +
# downstream composition, mirroring BPE's `data/bpe_merges.tsv` /
# `fixed_merges()` / `pack_sequences_bpe` treatment (r10 VERDICT #7).
# Real pipelines ship the tokenizer with the model; everything below
# applies the FIXED artifact — no retraining per corpus slice.

from pathlib import Path as _Path

UNIGRAM_VOCAB_PATH = (
    _Path(__file__).resolve().parent.parent.parent
    / "data"
    / "unigram_vocab.tsv"
)

_FIXED_VOCAB: list[tuple[str, int, int, float, int]] | None = None


def fixed_vocab() -> list[tuple[str, int, int, float, int]]:
    """The committed tokenizer artifact (`unigram_train`'s output at the
    driver's grading scale, sf0.01), parsed once per process."""
    global _FIXED_VOCAB
    if _FIXED_VOCAB is None:
        rows = []
        for ln in UNIGRAM_VOCAB_PATH.read_text().splitlines():
            if not ln or ln.startswith("#"):
                continue
            piece, plen, cnt, lp, rank = ln.split("\t")
            # pieces are interpolated verbatim into DuckDB VALUES
            # literals (`unigram_vit_prelude_sql`); a quote/backslash
            # would silently corrupt the oracle SQL, so reject at parse
            # time rather than escape downstream
            if not re.fullmatch(r"[a-z0-9]+", piece):
                raise ValueError(
                    f"unigram vocab piece {piece!r} outside [a-z0-9]+; "
                    "regenerate data/unigram_vocab.tsv or extend the "
                    "SQL-literal escaping in unigram_vit_prelude_sql"
                )
            rows.append((piece, int(plen), int(cnt), float(lp), int(rank)))
        _FIXED_VOCAB = rows
    return _FIXED_VOCAB


def unigram_piece_counts(d: DataFrame) -> DataFrame:
    """Per-document piece count ``(doc_id, wtok)`` under the RELEASED
    vocabulary: Viterbi-segment the corpus's DISTINCT words once (the
    vocab-sized Arrow pass, `segment_words`), then one equi-join + one
    per-doc rollup — `unigram_encode`'s shape with the fixed artifact
    instead of a retrain. A word containing a character absent from the
    artifact's alphabet is unsegmentable under the model; it falls back
    to its character count (every real tokenizer's byte/char fallback)
    so document totals stay conservation-checkable.

    `d` is evaluated exactly ONCE (guide §1.2 step 1): the
    ``(doc_id, word, freq)`` relation is checkpointed and feeds BOTH
    the distinct-word Viterbi input and the per-doc rollup. The r12
    shape exploded `d` twice (a distinct-word pass AND a per-occurrence
    join probe), which re-ran the caller's upstream — the pretraining
    pipeline's regex scrub chain — per explode; the rollup now joins at
    (doc, word) granularity (pairs ≤ occurrences) and weights by
    ``freq``, an identical integer total."""
    dwc = (
        d.select(
            "doc_id", F.explode(tokens_col(F.col("text"))).alias("word")
        )
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("freq"))
        # eager=False: materializes inside the consumer's first action
        # instead of as a separate blocking driver job (both the
        # distinct-word Viterbi input and the rollup read the same
        # checkpointed relation either way)
        .localCheckpoint(eager=False)
    )
    # unsegmentable words come back from _viterbi as ONE whole-word
    # pseudo-piece that is not in the vocabulary — detect by membership,
    # not emptiness
    vocab_pieces = [p for p, *_ in fixed_vocab()]
    seg = segment_words(
        dwc.select("word").distinct(), fixed_vocab()
    ).select(
        "word",
        F.when(
            F.forall("pieces", lambda p: p.isin(vocab_pieces)),
            F.size("pieces"),
        )
        .otherwise(F.length("word"))
        .alias("n_p"),
    )
    return dwc.join(seg, "word").groupBy("doc_id").agg(
        F.sum(F.col("n_p") * F.col("freq")).cast("long").alias("wtok")
    )


def unigram_vit_prelude_sql(source_sql: str | None = None) -> str:
    """Shared DuckDB CTE prelude: the released-vocab Viterbi DP as a
    RECURSIVE CTE ending in ``vit(word, n_p)`` — per distinct corpus
    word, its piece count under the committed artifact (char-count
    fallback for unsegmentable words, `unigram_piece_counts`'s rule).
    The per-word DP carries the last four dp values (and piece counts)
    as columns; iteration i computes ``dp[i+1] = max over L in 1..4 of
    dp[i+1-L] + logprob(substr(word, i+2-L, L))`` with the
    longest-final-piece tie rule via L=4-first CASE ordering.
    Cross-engine float determinism: both engines parse the SAME
    6dp-rounded logprob literals and add them in the SAME DP order, so
    every dp value is bit-identical and every comparison resolves
    identically (the score_terms decimal-sum argument, applied to a
    DP). Consumers append their own CTEs: the packing oracle adds
    doc_wtok, the encode oracle adds per-doc stats. ``source_sql``
    overrides the ``(doc_id, text)`` relation the words come from
    (default: the raw documents table) — the pretraining pipeline
    passes its scrubbed ``clean`` CTE so pieces are counted over the
    text that actually ships."""
    assert UNIGRAM_MAX_PIECE_LEN == 4, "SQL DP carries exactly 4 lanes"
    if source_sql is None:
        source_sql = DOCS_SQL
    vocab_rows = ",\n    ".join(
        f"('{p}', {lp!r})" for p, _l, _c, lp, _r in fixed_vocab()
    )
    neg = "-1e308"
    # candidate for final piece of length L ending at position i+1
    # (1-based SUBSTR start i+2-L); dp{0..3} = dp[i], dp[i-1], ...
    cand = {
        L: (
            f"CASE WHEN i + 1 >= {L} AND dp{L - 1} > -1e300 AND "
            f"v{L}.logprob IS NOT NULL "
            f"THEN dp{L - 1} + v{L}.logprob ELSE {neg} END"
        )
        for L in (1, 2, 3, 4)
    }
    joins = "\n    ".join(
        f"LEFT JOIN vocab v{L} ON v{L}.piece = "
        f"SUBSTR(word, CAST(i + 2 - {L} AS INT), {L})"
        for L in (1, 2, 3, 4)
    )
    return f"""vocab(piece, logprob) AS (VALUES
    {vocab_rows}
),
words AS (
  SELECT word, COUNT(*) AS freq FROM (
    SELECT doc_id, UNNEST({_tokens_sql('text')}) AS word
    FROM {source_sql}) t
  GROUP BY 1
),
vit AS (
  -- per-word DP state after i characters: dp0=dp[i] .. dp3=dp[i-3],
  -- cnt0..cnt3 the piece counts of those prefixes
  WITH RECURSIVE r(word, i, dp0, dp1, dp2, dp3,
                   cnt0, cnt1, cnt2, cnt3) AS (
    -- seed types pin the recursion's column types: without the DOUBLE
    -- casts DuckDB infers DECIMAL(2,1) from `0.0` and the -1e308 floor
    -- overflows on the union coercion
    SELECT word, 0, CAST(0.0 AS DOUBLE), CAST({neg} AS DOUBLE),
           CAST({neg} AS DOUBLE), CAST({neg} AS DOUBLE), 0, 0, 0, 0
    FROM words
    UNION ALL
    SELECT word, i + 1,
      GREATEST({cand[1]}, {cand[2]}, {cand[3]}, {cand[4]}),
      dp0, dp1, dp2,
      CASE GREATEST({cand[1]}, {cand[2]}, {cand[3]}, {cand[4]})
        WHEN {neg} THEN 0
        WHEN {cand[4]} THEN cnt3 + 1
        WHEN {cand[3]} THEN cnt2 + 1
        WHEN {cand[2]} THEN cnt1 + 1
        ELSE cnt0 + 1 END,
      cnt0, cnt1, cnt2
    FROM r
    {joins}
    WHERE i < LEN(word)
  )
  SELECT word, CASE WHEN dp0 > -1e300 THEN cnt0
                    ELSE LEN(word) END AS n_p
  FROM r WHERE i = LEN(word)
),
"""


def unigram_encode_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`unigram_encode` under the RELEASED vocabulary (the committed
    artifact, no retrain): per-document ``(doc_id, n_words, n_chars,
    n_pieces, chars_per_piece)`` — the compression signal a production
    pipeline computes with its SHIPPED tokenizer. Same plan shape as
    `unigram_encode` (segment distinct words once in one vocab-sized
    Arrow pass, then explode + equi-join + per-doc rollup); ORACLE-
    PAIRED via the recursive-CTE Viterbi (`unigram_vit_prelude_sql`);
    per-word counts shared with `unigram_piece_counts` (same
    char-count fallback)."""
    d = docs(spark, sf_dir)
    wc = (
        d.select(F.explode(tokens_col(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .localCheckpoint()
    )
    vocab_pieces = [p for p, *_ in fixed_vocab()]
    seg = segment_words(wc, fixed_vocab()).select(
        "word",
        F.when(
            F.forall("pieces", lambda p: p.isin(vocab_pieces)),
            F.size("pieces"),
        )
        .otherwise(F.length("word"))
        .alias("n_p"),
    )
    toks = d.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("word")
    )
    return (
        toks.join(seg, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum(F.length("word")).cast("long").alias("n_chars"),
            F.sum("n_p").cast("long").alias("n_pieces"),
        )
        .withColumn(
            "chars_per_piece",
            F.round(
                F.col("n_chars") / F.col("n_pieces").cast("double"), 6
            ),
        )
    )


UNIGRAM_ENCODE_FIXED_SQL = f"""
WITH {unigram_vit_prelude_sql()}
toks AS (
  SELECT doc_id, UNNEST({_tokens_sql('text')}) AS word FROM {DOCS_SQL}
)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(LEN(word)) AS BIGINT) AS n_chars,
       CAST(SUM(v.n_p) AS BIGINT) AS n_pieces,
       ROUND(CAST(SUM(LEN(word)) AS DOUBLE) / SUM(v.n_p), 6)
         AS chars_per_piece
FROM toks t JOIN vit v USING (word)
GROUP BY 1"""
