"""BPE merge training: differential vs an independent naive reference,
driver/distributed path equality, deterministic tie-breaks, and the
corpus-linearity probe (iterations run on the vocab-sized word table,
so a corpus that grows without new vocabulary changes nothing but the
counts)."""

from pyspark.sql import functions as F

from c4_5decisiontreebasedonmapreduce_spark.operators import bpe as B
from c4_5decisiontreebasedonmapreduce_spark.operators import text as TXX


def _naive_bpe(word_freqs: dict[str, int], n_merges: int):
    """Independent reference: recount every pair from scratch each
    iteration (no incremental index, no shared code path beyond the
    single-word merge helper's SPEC, reimplemented here)."""
    words = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for rank in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in words.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < 2:
            break
        merges.append((rank, l, r, l + r, c))
        new_words: dict[tuple, int] = {}
        for syms, f in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_words[t] = new_words.get(t, 0) + f
        words = new_words
    return merges


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


FIXTURE = [
    "the cat sat on the mat",
    "the thin cat ate the rat",
    "thethethe aaa bb aaa",
    "lower lowest newer newest wider widest",
]


def test_bpe_matches_naive_reference(spark):
    d = _docs(spark, FIXTURE)
    wf = {
        r["word"]: r["freq"] for r in B.word_counts(d).collect()
    }
    expected = _naive_bpe(wf, 24)
    got = [tuple(r) for r in B.bpe_train_rel(d, n_merges=24).collect()]
    assert got == expected
    assert len(got) > 8  # the fixture sustains a real merge chain


def test_bpe_overlapping_pair_semantics(spark):
    """'aaa' under merge (a, a): left-to-right greedy gives (aa, a) and
    the initial count is 2 per instance — the spec both paths and the
    naive reference must share."""
    d = _docs(spark, ["aaa aaa"])
    got = [tuple(r) for r in B.bpe_train_rel(d, n_merges=3).collect()]
    assert got[0] == (0, "a", "a", "aa", 4)
    # after (a,a): every word is (aa, a) → pair (aa, a) count 2
    assert got[1] == (1, "aa", "a", "aaa", 2)
    assert len(got) == 2  # nothing left worth merging


def test_bpe_distributed_twin_equal(spark, sf_small):
    """The level-synchronous cluster path must learn the identical
    merge sequence as the driver loop — on the hand fixture AND on the
    real documents table (truncated for runtime)."""
    for d in (_docs(spark, FIXTURE), TXX.docs(spark, sf_small)):
        wc = B.word_counts(d).localCheckpoint()
        driver = B._train_driver(
            [(r["word"], r["freq"]) for r in wc.collect()], 12
        )
        dist = B._train_distributed(wc, 12, checkpoint_every=4)
        assert dist == driver


def test_bpe_corpus_linear_probe(spark):
    """Iteration cost is bound to the VOCABULARY: duplicating the corpus
    10× leaves the word table's row count — the input of every
    iteration — unchanged, and the learned merges identical with
    exactly 10× the counts. The corpus touches only the one word-count
    scan."""
    d1 = _docs(spark, FIXTURE)
    d10 = _docs(spark, FIXTURE * 10)
    wc1, wc10 = B.word_counts(d1), B.word_counts(d10)
    assert wc1.count() == wc10.count()  # vocab-sized, not corpus-sized
    m1 = [tuple(r) for r in B.bpe_train_rel(d1, n_merges=16).collect()]
    m10 = [tuple(r) for r in B.bpe_train_rel(d10, n_merges=16).collect()]
    assert [(r, l, rr, m) for r, l, rr, m, _ in m1] == [
        (r, l, rr, m) for r, l, rr, m, _ in m10
    ]
    assert [c * 10 for *_, c in m1] == [c for *_, c in m10]


def test_bpe_no_pairs_is_empty(spark):
    """Single-character words only → no adjacent pairs → empty merge
    table with the declared schema."""
    out = B.bpe_train_rel(_docs(spark, ["a b c d", "e f g"]))
    assert out.columns == [
        "merge_rank", "lhs", "rhs", "merged", "pair_count"
    ]
    assert out.count() == 0


def test_bpe_merges_reconstruct_segmentation(spark):
    """Applying the learned merges to a training word reproduces a
    segmentation whose concatenation is the word — merges are a
    lossless segmentation refinement."""
    d = _docs(spark, FIXTURE)
    merges = [tuple(r) for r in B.bpe_train_rel(d, n_merges=24).collect()]
    for word in ("newest", "thethethe", "cat"):
        syms = tuple(word)
        for _, l, r, _, _ in merges:
            syms = B._merge_word(syms, l, r)
        assert "".join(syms) == word
        assert len(syms) >= 1


def test_bpe_segment_words_matches_replay(spark):
    """The Arrow mapInPandas segmentation must equal a driver-side
    replay of _merge_word over the same merge list, word for word —
    and concatenating any word's symbols reproduces the word."""
    d = _docs(spark, FIXTURE)
    wc = B.word_counts(d).localCheckpoint()
    merges = B.train_merges(wc, 24)
    seg = {r["word"]: r["symbols"] for r in B.bpe_segment_words(wc, merges).collect()}
    for w in (r["word"] for r in wc.collect()):
        syms = tuple(w)
        for _, l, r, _, _ in merges:
            if len(syms) < 2:
                break
            syms = B._merge_word(syms, l, r)
        assert seg[w] == list(syms), w
        assert "".join(seg[w]) == w


def test_bpe_encode_bounds_and_totals(spark, sf_small):
    """Per doc: n_words ≤ n_bpe_symbols ≤ n_chars (merges only ever
    shorten the char segmentation, never below one symbol per word),
    and the corpus actually compresses (symbols < chars overall)."""
    out = B.bpe_encode_rel(TXX.docs(spark, sf_small)).collect()
    assert len(out) > 0
    for r in out:
        assert r["n_words"] <= r["n_bpe_symbols"] <= r["n_chars"], tuple(r)
    assert sum(r["n_bpe_symbols"] for r in out) < sum(
        r["n_chars"] for r in out
    )
