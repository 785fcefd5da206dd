"""Round-10 operators: BPE-tokenizer-composed packing/chunking (the
released-tokenizer path — verdict r9 item 1), plus the supporting
replace-chain segmentation identity.

Oracle parity for `pack_sequences_bpe` / `chunk_documents_bpe` is covered
by tests/test_oracle_parity.py over the full registry; here live the
semantic pins: the closed-form replace-chain segmentation must equal the
sequential merge replay, the packing invariants must hold in BPE units,
and the committed tokenizer artifact must be reproducible by bpe_train.
"""

import re

import pytest
from pyspark.sql import functions as F

from c4_5decisiontreebasedonmapreduce_spark.operators import bpe as B
from c4_5decisiontreebasedonmapreduce_spark.operators import packing as PK


def _replay_count(text: str, merges) -> int:
    """Independent reference: tokenize, replay merges sequentially per
    word via the trainer's own _merge_word, count symbols."""
    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    total = 0
    for w in toks:
        syms = tuple(w)
        for _, left, right, _m, _c in merges:
            if len(syms) < 2:
                break
            syms = B._merge_word(syms, left, right)
        total += len(syms)
    return total


def _replay_symbols(text: str, merges) -> list[str]:
    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    out: list[str] = []
    for w in toks:
        syms = tuple(w)
        for _, left, right, _m, _c in merges:
            if len(syms) < 2:
                break
            syms = B._merge_word(syms, left, right)
        out.extend(syms)
    return out


def test_artifact_parses_and_is_well_formed():
    merges = B.fixed_merges()
    assert len(merges) == B.BPE_N_MERGES
    for rank, (r, left, right, merged, cnt) in enumerate(merges):
        assert r == rank
        assert merged == left + right
        assert cnt >= 2
        assert re.fullmatch(r"[a-z0-9]+", merged), merged  # no '/' ever


def test_replace_chain_matches_sequential_replay(spark):
    """The closed-form replace-chain segmentation (the JVM/SQL path) must
    equal the sequential per-word merge replay on adversarial inputs:
    overlapping merge chains, degenerate repeats, punctuation, case,
    empties."""
    merges = B.fixed_merges()
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "err error errer rerere ererer ererererererererer",
        "aaa aa a aaaa",
        "in inn inning winnow owner throw shower",
        "Mixed CASE, punct!! and 123 numbers... e r er",
        "",
        "   \t  ",
        "e",
        "er er er",
    ]
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {
        r.doc_id: (r.n, r.syms)
        for r in d.select(
            "doc_id",
            B.bpe_symbol_count_col(F.col("text")).alias("n"),
            B.bpe_symbols_col(F.col("text")).alias("syms"),
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i][0] == _replay_count(t, merges), t
        assert got[i][1] == _replay_symbols(t, merges), t


def test_replace_chain_fuzz(spark):
    """Hypothesis fuzz over an alphabet rich in merge-participating
    characters; Spark replace-chain vs the pure-Python replay."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    merges = B.fixed_merges()

    @settings(max_examples=6, deadline=None)
    @given(
        st.lists(
            st.text(alphabet="erinowast !.", min_size=0, max_size=40),
            min_size=1,
            max_size=8,
        )
    )
    def run(texts):
        d = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
        )
        got = {
            r.doc_id: r.n
            for r in d.select(
                "doc_id", B.bpe_symbol_count_col(F.col("text")).alias("n")
            ).collect()
        }
        for i, t in enumerate(texts):
            assert got[i] == _replay_count(t, merges), t

    run()


def test_pack_bpe_invariants(spark, sf_small):
    """The packing invariants in BPE units: every non-final window per
    shard holds exactly SEQ_LEN symbols, and the packed symbol total
    equals the per-doc symbol-count total (conservation — nothing lost
    or duplicated by the window arithmetic)."""
    from c4_5decisiontreebasedonmapreduce_spark.operators.text import docs

    out = PK.pack_sequences_bpe(spark, sf_small).collect()
    per_shard: dict[int, list] = {}
    for r in out:
        per_shard.setdefault(r.shard, []).append(r)
    for shard, rows in per_shard.items():
        rows.sort(key=lambda r: r.chunk_id)
        assert [r.chunk_id for r in rows] == list(range(len(rows))), shard
        for r in rows[:-1]:
            assert r.n_tokens == PK.SEQ_LEN, (shard, r)
        assert 0 < rows[-1].n_tokens <= PK.SEQ_LEN

    total = sum(r.n_tokens for r in out)
    corpus_total = (
        docs(spark, sf_small)
        .select(B.bpe_symbol_count_col(F.col("text")).alias("n"))
        .agg(F.sum("n"))
        .first()[0]
    )
    assert total == corpus_total


def test_pack_bpe_differs_from_whitespace_pack(spark, sf_small):
    """The composition is real: BPE windows hold MORE documents'
    whitespace-tokens-worth of text per window only if the symbol
    counts differ from whitespace counts — assert the two packs
    disagree on total token count (subword symbols > word tokens for
    any real corpus, since unmerged characters dominate)."""
    ws = sum(
        r.n_tokens for r in PK.pack_sequences(spark, sf_small).collect()
    )
    bpe = sum(
        r.n_tokens
        for r in PK.pack_sequences_bpe(spark, sf_small).collect()
    )
    assert bpe != ws
    assert bpe > ws  # 64 merges cannot compress below one symbol/word


def test_chunk_bpe_slices_are_symbol_slices(spark, sf_small):
    """Every chunk's text, split on spaces, must be exactly the claimed
    slice of the document's BPE symbol stream."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import (
        chunking as CH,
    )
    from c4_5decisiontreebasedonmapreduce_spark.operators.text import docs

    merges = B.fixed_merges()
    texts = {
        r.doc_id: r.text
        for r in docs(spark, sf_small).limit(2000).collect()
    }
    chunks = CH.chunk_documents_bpe(spark, sf_small).collect()
    seen_docs = set()
    for r in chunks:
        if r.doc_id not in texts:
            continue
        syms = _replay_symbols(texts[r.doc_id], merges)
        want = syms[r.chunk_start : r.chunk_start + CH.CHUNK_SIZE]
        got = r.chunk_text.split(" ") if r.chunk_text else []
        assert got == want, (r.doc_id, r.chunk_id)
        assert r.n_chunk_tokens == len(want)
        seen_docs.add(r.doc_id)
    assert seen_docs  # the fixture actually exercised documents


@pytest.mark.skipif(
    "0.01" not in __import__("os").environ.get("SPARK_GRAFT_SF_ORACLE", "sf0.01"),
    reason="artifact is pinned to the sf0.01 training corpus",
)
def test_bpe_artifact_reproducible(spark, sf_oracle):
    """The committed tokenizer artifact IS bpe_train's output at the
    driver's grading scale — guards artifact drift."""
    live = [
        (r.merge_rank, r.lhs, r.rhs, r.merged, r.pair_count)
        for r in B.bpe_train(spark, sf_oracle).collect()
    ]
    assert live == B.fixed_merges()


# -- adaptive Bloom prefilter (r9 verdict item 4) ---------------------------


def _write_probe_corpus(spark, out_dir, disjoint: bool, n_docs: int = 700):
    """Tiny twin of scripts/probe_bloom_decontam.py's builder: corpus
    docs draw from a web vocabulary that is either DISJOINT from the
    benchmark slice's (deployment shape — prefilter drops nearly all)
    or IDENTICAL to it (the driver-synthetic shape — prefilter keeps
    nearly all)."""
    import os

    from c4_5decisiontreebasedonmapreduce_spark.operators import dedup as D

    d = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    is_bench = (
        F.col("doc_id") % D.DECONTAM_BENCH_MOD == D.DECONTAM_BENCH_REM
    )

    def text_of(prefix, vocab, salt):
        return F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(39)),
                lambda i: F.concat(
                    F.lit(prefix),
                    (
                        F.abs(F.xxhash64(F.col("doc_id"), i, F.lit(salt)))
                        % vocab
                    ).cast("string"),
                ),
            ),
            " ",
        )

    # shared shape: EVERYTHING (bench + corpus) draws 3-gram shingles
    # from an 8-word vocabulary — 512 possible shingles, all of them in
    # the benchmark slice, so the prefilter keeps ~every corpus row.
    # disjoint shape: the corpus vocabulary never appears in the
    # benchmark, so only FP noise (and the leaks) survive the bitmap.
    bench_vocab = 300 if disjoint else 8
    web = (
        text_of("web", 5000, "w")
        if disjoint
        else text_of("bench", bench_vocab, "w")
    )
    # contamination both fixtures must flag: some non-bench docs quote a
    # benchmark document verbatim (the probe script's leak construction)
    leak_src = (F.col("doc_id") % 13) * 7 + 2
    leak_text = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(39)),
            lambda i: F.concat(
                F.lit("bench"),
                (
                    F.abs(F.xxhash64(leak_src, i, F.lit("b"))) % bench_vocab
                ).cast("string"),
            ),
        ),
        " ",
    )
    is_leak = (~is_bench) & (F.col("doc_id") % 25 == 1)
    docs = d.select(
        "doc_id",
        F.when(is_bench, text_of("bench", bench_vocab, "b"))
        .when(is_leak, leak_text)
        .otherwise(web)
        .alias("text"),
        F.lit("en").alias("lang"),
        F.lit("probe").alias("source"),
        F.lit(0).cast("long").alias("n_chars"),
    )
    docs.write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )
    return out_dir


def test_bloom_auto_decision_and_bit_identity(spark, tmp_path):
    """The auto mode's cost decision on both corpus shapes: disjoint
    vocabulary → keep rate ~FP-only → bloom stays ON; shared vocabulary
    → keep rate near 1 → prefilter skipped. In BOTH cases the output is
    bit-identical to the exact op."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import dedup as D

    for disjoint, expect_bloom in ((True, True), (False, False)):
        sf = _write_probe_corpus(
            spark, str(tmp_path / ("dis" if disjoint else "shared")), disjoint
        )
        is_bench = (
            F.col("doc_id") % D.DECONTAM_BENCH_MOD == D.DECONTAM_BENCH_REM
        )
        sh = (
            D._shingles_df(spark, sf)
            .withColumn("_bloom_h", D._bloom_hash(F.col("shingle")))
            .localCheckpoint()
        )
        bench = sh.where(is_bench).select(
            F.col("doc_id").alias("bench_id"), "shingle"
        )
        corp = sh.where(~is_bench)
        bitmap = D.build_shingle_bloom(bench, 1 << 17, D.BLOOM_K)
        import numpy as np

        lit_map = F.lit(np.asarray(bitmap, dtype=np.int64))
        keep = D._bloom_keep_rate(corp, bitmap, 1 << 17, D.BLOOM_K, lit_map)
        assert (keep <= D.BLOOM_AUTO_MAX_KEEP) == expect_bloom, (
            disjoint,
            keep,
        )
        exact = sorted(map(tuple, D.decontaminate(spark, sf).collect()))
        auto = sorted(
            map(tuple, D.decontaminate_bloom(spark, sf, mode="auto").collect())
        )
        always = sorted(
            map(tuple, D.decontaminate_bloom(spark, sf).collect())
        )
        assert auto == exact == always, disjoint
        assert exact  # fixtures contain real containment hits


def test_bloom_cache_invalidates_on_rewrite(spark, tmp_path):
    """ADVICE r9: a rewritten documents table under the same sf_dir must
    rebuild the bitmap (file-level fingerprint in the cache key), not
    silently reuse a stale one (missed contamination)."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import dedup as D

    sf = _write_probe_corpus(spark, str(tmp_path / "rw"), disjoint=True)
    D.decontaminate_bloom(spark, sf).collect()
    keys_before = [k for k in D._BLOOM_CACHE if k[1] == sf]
    assert len(keys_before) == 1
    # rewrite with different content (more docs → different benchmark)
    _write_probe_corpus(spark, sf, disjoint=True, n_docs=1400)
    out = D.decontaminate_bloom(spark, sf).collect()
    keys_after = [k for k in D._BLOOM_CACHE if k[1] == sf]
    assert len(keys_after) == 1 and keys_after != keys_before
    exact = D.decontaminate(spark, sf).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, exact))


# -- ingest-time embedding dedup (r9 verdict item 5) -------------------------


def test_dedup_embedding_incremental_equals_full_subset(spark, sf_small):
    """The incremental op must be EXACTLY the full dedup_embedding
    (IVF path) run's batch-touching subset, remapped to ingest
    direction — same contract the minhash/exact/span incrementals pin."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import dedup as D

    full = D.dedup_embedding(spark, sf_small).collect()
    expect = set()
    for r in full:
        a_b = r.vec_a % D.INCR_BATCH_MOD == D.INCR_BATCH_REM
        b_b = r.vec_b % D.INCR_BATCH_MOD == D.INCR_BATCH_REM
        if not (a_b or b_b):
            continue
        if b_b:
            expect.add((r.vec_b, r.vec_a, r.cosine))
        else:
            expect.add((r.vec_a, r.vec_b, r.cosine))
    got = {
        (r.vec_new, r.dup_of, r.cosine)
        for r in D.dedup_embedding_incremental(spark, sf_small).collect()
    }
    assert got == expect
    assert got  # non-vacuous: the slice contains real near-dups


def test_dedup_embedding_persisted_matches_inmemory(spark, sf_small, tmp_path):
    from c4_5decisiontreebasedonmapreduce_spark.operators import dedup as D

    table = "emb_corpus_eq_test"
    corpus = D.write_embedding_corpus(
        spark, sf_small, table=table, path=str(tmp_path / "emb_corpus")
    )
    try:
        a = sorted(
            map(
                tuple,
                D.dedup_embedding_incremental(spark, sf_small).collect(),
            )
        )
        b = sorted(
            map(
                tuple,
                D.dedup_embedding_incremental(
                    spark, sf_small, corpus_assign=corpus
                ).collect(),
            )
        )
        assert a == b and a
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


# -- cost-based join regime chooser (r9 verdict item 8) ----------------------


def test_join_auto_picks_each_regime(spark, sf_small):
    """The three regimes on their right fixtures, with the plan pinned:
    small dim → broadcast; big dim + skewed fact → salted (join key
    carries the salt); big dim + uniform fact → plain shuffle join."""
    import contextlib
    import io

    from c4_5decisiontreebasedonmapreduce_spark.operators import (
        relational as R,
    )
    from c4_5decisiontreebasedonmapreduce_spark.registry import load_table

    def plan_of(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    # 1. broadcast: customer is dim-sized at every sf
    orders = load_table(spark, sf_small, "orders")
    cust = load_table(spark, sf_small, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    regime, ev = R.join_auto_decision(orders, cust, "o_custkey")
    assert regime == "broadcast", ev
    p = plan_of(R.join_auto(orders, cust, "o_custkey", "c_custkey"))
    assert "BroadcastHashJoin" in p, p

    # big dim shared by the two other fixtures (> AUTO_BROADCAST_MAX_ROWS)
    dim = spark.range(R.AUTO_BROADCAST_MAX_ROWS + 1_000).select(
        F.col("id").alias("d_key"), (F.col("id") % 100).alias("d_attr")
    )

    # 2. salted: 60% of fact rows share one key
    skewed = spark.range(20_000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 5 < 3, F.lit(7)).otherwise(F.col("id")).alias(
            "f_key"
        ),
    )
    regime, ev = R.join_auto_decision(skewed, dim, "f_key")
    assert regime == "salted", ev
    salted = R.join_auto(skewed, dim, "f_key", "d_key")
    p = plan_of(salted)
    assert "salt" in p, p  # the (key, salt) join condition is physical
    # identity with the plain join, the salted_join contract
    plain = skewed.join(dim, skewed["f_key"] == dim["d_key"])
    assert sorted(
        (r.row_id, r.d_key) for r in salted.collect()
    ) == sorted((r.row_id, r.d_key) for r in plain.collect())

    # 3. shuffle: same sizes, uniform keys. Catalyst may still broadcast
    # the small FACT side of the plain join on this fixture — that's its
    # call, not join_auto's; disable auto-broadcast so the pin isolates
    # the regime choice (no salt, no forced broadcast → SortMergeJoin).
    uniform = spark.range(20_000).select(
        F.col("id").alias("row_id"), F.col("id").alias("f_key")
    )
    regime, ev = R.join_auto_decision(uniform, dim, "f_key")
    assert regime == "shuffle", ev
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = plan_of(R.join_auto(uniform, dim, "f_key", "d_key"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "salt" not in p and "BroadcastHashJoin" not in p, p
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p, p


# -- asset near-dup dedup (r9 verdict item 7) --------------------------------


def test_dedup_assets_identical_payloads_score_one(spark):
    """Two assets with byte-identical payloads must pair at cosine 1.0
    (the stub encoder is content-deterministic); unrelated assets stay
    below threshold except hash near-collisions."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import dedup as D
    from c4_5decisiontreebasedonmapreduce_spark.operators import (
        multimodal as M,
    )

    rows = [(i, f"unique text {i} " * 3) for i in range(200)]
    rows[150] = (150, rows[50][1])  # exact duplicate payload of doc 50
    d = spark.createDataFrame(rows, "doc_id long, text string")
    assets = d.select(
        "doc_id",
        F.lit("image/fake").alias("mime"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
    feats = M.feature_extract(assets)
    # the engine's ×10⁶-scaled integer representation (see
    # dedup._emb_decimal) — same quantization, exact long folds
    dec = F.transform(
        F.col("feature"),
        lambda x: (x.cast("decimal(10,6)") * F.lit(1000000)).cast("long"),
    )
    e = (
        feats.select(F.col("doc_id").alias("vec_id"), dec.alias("emb"))
        .withColumn(
            "norm", F.sqrt(D._dot_double(F.col("emb"), F.col("emb")))
        )
        .localCheckpoint()
    )
    pairs = {
        (r.vec_a, r.vec_b): r.cosine
        for r in D._ivf_cosine_pairs(
            e, M.ASSET_COSINE_THRESHOLD
        ).collect()
    }
    assert pairs.get((50, 150)) == 1.0, pairs


def test_dedup_assets_single_python_pass(spark, sf_small):
    """Payloads cross Python exactly once: the returned plan is fed
    entirely from the feature checkpoint — zero Arrow/Python eval nodes
    and zero parquet re-scans downstream (the multimodal_frames
    contract)."""
    import contextlib
    import io

    from c4_5decisiontreebasedonmapreduce_spark.operators import (
        multimodal as M,
    )

    df = M.dedup_assets(spark, sf_small)
    df.collect()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p, p
    assert "FlatMapGroupsInPandas" not in p and "MapInPandas" not in p, p
    assert p.count(") Scan parquet") == 0, p


# -- K=100 curation-chain linearity (r9 verdict item 6) ----------------------


def test_k100_candidate_and_output_linearity(spark, sf_small, tmp_path):
    """Two decades of scaling, pinned: on a 100×-multiplied corpus
    (copy-tagged tokens — copies mutually non-duplicate, per-copy
    structure preserved; the probe script's construction) the jaccard
    candidate relation, the span detector's output, and the
    decontamination flag set must each be EXACTLY 100.00× the K=1 run.
    Anything superlinear is the pipeline bending, not the data. The
    sf0.1 twin of this run (with wall times) lives in BASELINE.md."""
    import importlib.util
    import os

    from c4_5decisiontreebasedonmapreduce_spark.operators import dedup as D

    spec = importlib.util.spec_from_file_location(
        "probe_dedup_scaling",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
            "probe_dedup_scaling.py",
        ),
    )
    probe = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(probe)

    counts = {}
    for k in (1, 100):
        out = str(tmp_path / f"x{k}")
        probe.build_multiplied(spark, sf_small, k, out)
        sh = D._shingles_df(spark, out).localCheckpoint()
        counts[k] = {
            "cand": D._jaccard_candidates(sh).count(),
            "spans": D.dedup_spans(spark, out).count(),
            "decontam": D.decontaminate(spark, out).count(),
        }
        sh.unpersist()
    assert counts[1]["cand"] > 0
    for key in ("cand", "spans", "decontam"):
        assert counts[100][key] == 100 * counts[1][key], (key, counts)


def test_replace_chain_consistent_with_bpe_encode(spark, sf_small):
    """Cross-path consistency: the closed-form replace chain evaluated
    with the LIVE-trained merges must count exactly what bpe_encode's
    Arrow distinct-word replay counts, per document — two independent
    implementations of the same segmentation (JVM string replaces vs
    Python _merge_word over the vocab) agreeing over the whole corpus."""
    from c4_5decisiontreebasedonmapreduce_spark.operators.text import docs

    d = docs(spark, sf_small).select("doc_id", "text")
    merges = B.train_merges(B.word_counts(d).localCheckpoint())
    chain = {
        r.doc_id: r.n
        for r in d.select(
            "doc_id",
            B.bpe_symbol_count_col(F.col("text"), merges=merges).alias("n"),
        ).collect()
    }
    replay = {
        r.doc_id: r.n_bpe_symbols for r in B.bpe_encode_rel(d).collect()
    }
    # bpe_encode drops token-less docs at the join; the chain counts 0
    assert replay and all(chain[k] == v for k, v in replay.items())
    for k in set(chain) - set(replay):
        assert chain[k] == 0, k


# -- BPE-counted pretraining pipeline (r10 second wave) ----------------------


def test_pipeline_bpe_same_survivors_bigger_windows(spark, sf_small):
    """The BPE pipeline must keep the whitespace pipeline's EXACT
    survivor set per shard (the gate/dedup semantics are shared and
    must not drift per tokenizer) while its token totals count subword
    symbols — strictly more than whitespace tokens, with the window
    arithmetic consistent."""
    import math

    from c4_5decisiontreebasedonmapreduce_spark.operators import (
        pipeline as PL,
    )

    ws = {r.shard: r for r in PL.pretraining_pipeline(spark, sf_small).collect()}
    bp = {
        r.shard: r
        for r in PL.pretraining_pipeline_bpe(spark, sf_small).collect()
    }
    assert set(ws) == set(bp) and ws
    for shard, w in ws.items():
        b = bp[shard]
        assert b.n_docs == w.n_docs, shard
        assert b.n_tokens > w.n_tokens, shard
        assert b.n_windows == math.ceil(b.n_tokens / PL.PT_SEQ_LEN), shard
        assert b.n_full_windows == b.n_tokens // PL.PT_SEQ_LEN, shard


def test_pipeline_bpe_plan_shape_unchanged(spark, sf_small):
    """The symbol count is one more scan-side expression: same ONE
    parquet scan, same two data-sized exchanges, still zero Python."""
    import contextlib
    import io

    from c4_5decisiontreebasedonmapreduce_spark import registry

    df = registry.queries()["pipeline_pretraining_bpe"](spark, sf_small)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert p.count(") Scan parquet") == 1
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "CartesianProduct" not in p
    assert p.count("hashpartitioning(") == 2, p


def test_streaming_chunk_bpe_drained_equals_batch(spark, sf_small):
    """The streaming BPE chunk ingest drained over the bounded source
    equals the batch twin row-for-row."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import (
        chunking as CH,
    )
    from c4_5decisiontreebasedonmapreduce_spark.streaming.windows import (
        streaming_chunk_bpe_ingest,
    )

    got = sorted(
        map(tuple, streaming_chunk_bpe_ingest(spark, sf_small).collect())
    )
    want = sorted(
        map(tuple, CH.chunk_documents_bpe(spark, sf_small).collect())
    )
    assert got == want and got


def test_cli_curate_bpe_tokenizer(spark, tmp_path, capsys):
    """`curate --tokenizer bpe` writes the BPE-counted manifest."""
    import json
    import os

    from c4_5decisiontreebasedonmapreduce_spark.__main__ import cli
    from c4_5decisiontreebasedonmapreduce_spark.operators import (
        pipeline as PL,
    )

    sf = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
    out = str(tmp_path / "curated_bpe")
    rc = cli(["curate", sf, out, "--tokenizer", "bpe"], spark=spark)
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert summary["tokenizer"] == "bpe"
    rows = spark.read.parquet(out + "/manifest").collect()
    expect = sorted(
        map(tuple, PL.pretraining_pipeline_bpe(spark, sf).collect())
    )
    assert sorted(map(tuple, rows)) == expect


# ---------------------------------------------------------------------------
# round-10 second wave: ranked retrieval + storage layout


def test_bm25_shape_and_determinism(spark, sf_small):
    """Every query gets at most top_k results, ranks are 1..k dense, and
    ordering is reproducible (rounded-score + doc_id tie-break)."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import (
        retrieval as RV,
    )

    out = RV.bm25_topk(spark, sf_small).collect()
    assert out, "query slice produced no results"
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
        assert r.doc_id % RV.BM25_QUERY_MOD != RV.BM25_QUERY_REM, (
            "a query document retrieved itself or another query doc"
        )
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= RV.BM25_TOP_K
        # pin the tie-break directly: strictly descending score, and on
        # equal (rounded) score strictly ascending doc_id — no or-escape
        for hi, lo in zip(rows, rows[1:]):
            assert hi.score > lo.score or (
                hi.score == lo.score and hi.doc_id < lo.doc_id
            ), f"rank order violates (score desc, doc_id asc) for q{qid}"
    again = RV.bm25_topk(spark, sf_small).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_bm25_no_cartesian_and_df_cap(spark, sf_small):
    """The score join is an inverted-index token equi-join — the only
    nested-loop in the plan is the broadcast of the 1-row stats
    relation; a df_cap drops saturated terms (here: the whole 31-token
    synthetic vocabulary, so the result empties — proving the cap binds
    on posting-list length)."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import (
        retrieval as RV,
    )

    df = RV.bm25_topk(spark, sf_small)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    capped = RV.bm25_topk(spark, sf_small, df_cap=1)
    assert capped.count() == 0


def test_layout_partition_prune_reads_only_one_lang(spark, sf_small, tmp_path):
    """The lang predicate must prune at the DIRECTORY level: the scan's
    file list contains only the lang=en/ subtree and the plan carries it
    as a PartitionFilter, not a post-scan Filter."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import layout as LY

    path = str(tmp_path / "part")
    LY.write_partitioned(spark, sf_small, path)
    pruned = spark.read.parquet(path).where(F.col("lang") == "en")
    # inputFiles() lists the relation PRE-pruning; the files actually
    # opened are what input_file_name() stamps on the surviving rows
    files = [
        r[0]
        for r in pruned.select(F.input_file_name()).distinct().collect()
    ]
    assert files and all("lang=en" in f for f in files)
    all_files = spark.read.parquet(path).inputFiles()
    assert len(files) < len(all_files)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "lang" in plan.split(
        "PartitionFilters:"
    )[1].split("]")[0], plan
    # and the per-source stats off the pruned scan match a direct filter
    got = sorted(map(tuple, LY.pruned_stats(spark, path).collect()))
    from c4_5decisiontreebasedonmapreduce_spark.operators.text import docs

    want = sorted(
        map(
            tuple,
            docs(spark, sf_small)
            .where(F.col("lang") == "en")
            .groupBy("lang", "source")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("n_chars").alias("sum_chars"),
                F.sum("doc_id").alias("sum_doc_id"),
            )
            .collect(),
        )
    )
    assert got == want


def test_layout_compaction_identity_and_file_count(spark, sf_small, tmp_path):
    """64 fragments compact to the byte-budgeted file count (1 at this
    scale) and the rescan is row-for-row the source table."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import layout as LY
    from c4_5decisiontreebasedonmapreduce_spark.operators.text import docs

    frag = str(tmp_path / "frag")
    LY.fragment(spark, sf_small, frag, n_files=64)
    frag_files = spark.read.parquet(frag).inputFiles()
    assert len(frag_files) == 64
    dst = str(tmp_path / "compact")
    n_out = LY.compact_files(spark, frag, dst)
    got_files = spark.read.parquet(dst).inputFiles()
    assert len(got_files) == n_out < len(frag_files)
    # identity: the checksum rescan equals the same projection of source
    got = sorted(
        map(tuple, LY.rescan_checksum(spark, dst).collect())
    )
    want = sorted(
        map(
            tuple,
            docs(spark, sf_small)
            .select(
                "doc_id",
                "lang",
                "source",
                "n_chars",
                F.md5(F.col("text")).alias("text_md5"),
            )
            .collect(),
        )
    )
    assert got == want
    # a tiny byte budget forces multi-file output — the sizing is real,
    # not a constant
    dst2 = str(tmp_path / "compact2")
    n_small = LY.compact_files(spark, frag, dst2, target_file_bytes=16 * 1024)
    assert n_small > 1
    assert len(spark.read.parquet(dst2).inputFiles()) == n_small


def test_layout_cluster_disjoint_spans_and_pushdown(spark, sf_small, tmp_path):
    """Range clustering must leave each file a disjoint doc_id span with
    tight row-group min/max footers (the stats the reader's row-group
    skipping runs on), and the range predicate must reach the scan as a
    PushedFilter. A fragmented (round-robin) layout is the negative
    control: every file spans ~the whole key range."""
    import pyarrow.parquet as pq

    from c4_5decisiontreebasedonmapreduce_spark.operators import layout as LY

    path = str(tmp_path / "clustered")
    LY.write_clustered(spark, sf_small, path)

    def spans(p):
        out = []
        for f in spark.read.parquet(p).inputFiles():
            local = f.removeprefix("file:")
            meta = pq.ParquetFile(local).metadata
            idx = list(meta.schema.names).index("doc_id")
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(idx).statistics
                out.append((st.min, st.max))
        return out

    clustered = sorted(spans(path))
    assert len(clustered) >= LY.CLUSTER_N_FILES
    for (alo, ahi), (blo, _bhi) in zip(clustered, clustered[1:]):
        # STRICT: doc_id is unique, so range partitions must not share
        # even a boundary key across files
        assert ahi < blo, f"overlapping clustered spans {ahi} vs {blo}"
    # negative control: round-robin fragments all span ~everything
    frag = str(tmp_path / "frag")
    LY.fragment(spark, sf_small, frag, n_files=8)
    global_span = max(h for _, h in clustered) - min(l for l, _ in clustered)
    wide = [(l, h) for l, h in spans(frag) if (h - l) > 0.9 * global_span]
    assert wide, "round-robin fragments should span the key range"
    narrow = [
        (l, h) for l, h in clustered if (h - l) <= global_span / 4
    ]
    assert len(narrow) == len(clustered), (
        f"clustered spans not tight: {clustered}"
    )
    # the graded rescan pushes the range predicate into the scan
    lo, hi = LY.cluster_range_bounds(spark, sf_small)
    df = LY.clustered_range_stats(spark, path, lo, hi)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters:" in plan
    pushed = plan.split("PushedFilters:")[1].split("]")[0]
    assert "GreaterThanOrEqual(doc_id" in pushed and (
        "LessThanOrEqual(doc_id" in pushed
    ), pushed


def test_layout_advise_verdicts(spark, sf_small):
    """The advisor must recommend the genuinely partitionable columns
    (lang: 5 values, source: 20) and reject the key column (doc_id —
    one row per partition) and the near-unique numeric (n_chars)."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import layout as LY

    rows = {r.col: r for r in LY.layout_advise(spark, sf_small).collect()}
    assert set(rows) == set(LY.ADVISE_COLUMNS)
    assert rows["lang"].recommend and rows["source"].recommend
    assert not rows["doc_id"].recommend
    assert rows["doc_id"].n_distinct > rows["source"].n_distinct
    assert 0 < rows["lang"].top_share <= 0.5


def test_funnel_matches_bruteforce(spark, sf_small):
    """The chained-min funnel must equal a per-user brute-force replay
    of the ordered-stage definition over the collected event log."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import (
        relational as R,
    )
    from c4_5decisiontreebasedonmapreduce_spark.sources.parquet import (
        load_table,
    )

    events = (
        load_table(spark, sf_small, "events")
        .select("user_id", "event_type", "ts")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in events:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_type))
    expect = {}
    for uid, evs in by_user.items():
        evs.sort()
        t1 = min((t for t, e in evs if e == "view"), default=None)
        t2 = (
            min((t for t, e in evs if e == "click" and t > t1), default=None)
            if t1
            else None
        )
        t3 = (
            min(
                (t for t, e in evs if e == "purchase" and t > t2),
                default=None,
            )
            if t2
            else None
        )
        stage = 3 if t3 else 2 if t2 else 1 if t1 else 0
        expect[uid] = (t1, t2, t3, stage)
    got = {
        r.user_id: (r.t1, r.t2, r.t3, r.stage_reached)
        for r in R.funnel_conversion(spark, sf_small).collect()
    }
    assert got == expect
    # latency is exact microseconds for full conversions only
    for r in R.funnel_conversion(spark, sf_small).collect():
        if r.stage_reached == 3:
            want = int((r.t3 - r.t1).total_seconds() * 1_000_000)
            assert abs(r.convert_micros - want) <= 1
        else:
            assert r.convert_micros is None


def test_diff_snapshots_statuses_by_construction(spark, sf_small):
    """Every diff row's status must match the v2 construction rules, and
    unchanged documents must be absent."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import (
        relational as R,
    )

    rows = R.diff_snapshots(spark, sf_small).collect()
    assert rows
    seen = {r.doc_id: r for r in rows}
    assert len(seen) == len(rows), "one row per doc_id"
    n_status = {"added": 0, "removed": 0, "changed": 0}
    for r in rows:
        n_status[r.status] += 1
        if r.status == "removed":
            assert r.doc_id % R.DIFF_REMOVED_MOD == R.DIFF_REMOVED_REM
            assert r.new_md5 is None and r.old_md5
        elif r.status == "added":
            assert r.doc_id >= R.DIFF_ADDED_OFFSET
            assert (
                r.doc_id - R.DIFF_ADDED_OFFSET
            ) % R.DIFF_ADDED_MOD == R.DIFF_ADDED_REM
            assert r.old_md5 is None and r.new_md5
        else:
            assert r.doc_id % R.DIFF_CHANGED_MOD == R.DIFF_CHANGED_REM
            assert r.doc_id % R.DIFF_REMOVED_MOD != R.DIFF_REMOVED_REM
            assert r.old_md5 and r.new_md5 and r.old_md5 != r.new_md5
    assert all(v > 0 for v in n_status.values()), n_status
    # unchanged docs are absent: a doc in neither slice never appears
    for r in rows:
        base = (
            r.doc_id - R.DIFF_ADDED_OFFSET
            if r.status == "added"
            else r.doc_id
        )
        assert base < R.DIFF_ADDED_OFFSET


# -- unigram-LM tokenizer (r10 second wave) ---------------------------------


def _unigram_reference(texts):
    """Independent pure-Python replay of the unigram hard-EM spec:
    word counts -> overlap-counted substring seed (all singles + top-64
    multi by count desc, piece asc) -> N_ITERS of Viterbi (equal score:
    longer final piece wins) + count re-estimation with zero-mass
    pruning -> ranked final vocab."""
    import math
    from collections import Counter

    from c4_5decisiontreebasedonmapreduce_spark.operators import (
        unigram as UG,
    )

    wc = Counter()
    for t in texts:
        for w in re.split(r"[^a-z0-9]+", (t or "").lower()):
            if w:
                wc[w] += 1
    sub = Counter()
    for w, f in wc.items():
        for i in range(len(w)):
            for L in range(1, min(UG.UNIGRAM_MAX_PIECE_LEN, len(w) - i) + 1):
                sub[w[i : i + L]] += f
    multi = sorted(
        ((p, c) for p, c in sub.items() if len(p) >= 2),
        key=lambda t: (-t[1], t[0]),
    )[: UG.UNIGRAM_SEED_MULTI]
    seed = {p: c for p, c in sub.items() if len(p) == 1}
    seed.update(dict(multi))

    def viterbi(word, logp):
        # Independent of the production DP's iteration order: j runs
        # DESCENDING here, so the longest-final-piece tie rule must be
        # enforced by the explicit `j < back` arm (in production the
        # ascending scan makes strict `>` sufficient). Same rule, two
        # code paths — a real differential pin.
        n = len(word)
        neg = float("-inf")
        dp = [neg] * (n + 1)
        dp[0] = 0.0
        back = [0] * (n + 1)
        for i in range(1, n + 1):
            # (dp[i] starts at -inf, so the equality arm can only fire
            # after a real candidate set back[i] — no init-0 footgun)
            for j in range(i - 1, max(0, i - UG.UNIGRAM_MAX_PIECE_LEN) - 1, -1):
                lp = logp.get(word[j:i])
                if lp is None or dp[j] == neg:
                    continue
                s = dp[j] + lp
                if s > dp[i] or (s == dp[i] and j < back[i]):
                    dp[i], back[i] = s, j
        out, i = [], n
        while i > 0:
            out.append(word[back[i] : i])
            i = back[i]
        return out[::-1]

    def logprobs(counts):
        tot = sum(counts.values())
        return {p: math.log(c / tot) for p, c in counts.items() if c > 0}

    logp = logprobs(seed)
    counts = seed
    for _ in range(UG.UNIGRAM_N_ITERS):
        nxt = Counter()
        for w, f in wc.items():
            for p in viterbi(w, logp):
                nxt[p] += f
        keep = {p: c for p, c in nxt.items() if c > 0}
        for p in logp:
            if len(p) == 1 and p not in keep:
                keep[p] = 0
        logp = logprobs({p: c for p, c in keep.items() if c > 0})
        floor = math.log(0.5 / max(sum(keep.values()), 1))
        for p, c in keep.items():
            if c == 0:
                logp[p] = floor
        counts = keep

    tot = sum(c for c in counts.values() if c > 0)
    final = sorted(
        ((p, c) for p, c in counts.items() if c > 0),
        key=lambda t: (-t[1], t[0]),
    )
    return [
        (p, len(p), c, round(math.log(c / tot), 6), i + 1)
        for i, (p, c) in enumerate(final)
    ]


def test_unigram_train_matches_reference(spark, sf_small):
    """The production trainer (Spark seed + driver EM) must equal the
    independent pure-Python replay exactly — counts, logprobs, ranks."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import (
        unigram as UG,
    )
    from c4_5decisiontreebasedonmapreduce_spark.operators.text import docs

    texts = [r.text for r in docs(spark, sf_small).collect()]
    want = _unigram_reference(texts)
    got = [
        (r.piece, r.piece_len, r.cnt, r.logprob, r.rank)
        for r in UG.unigram_train(spark, sf_small)
        .orderBy("rank")
        .collect()
    ]
    assert got == want


def test_unigram_driver_equals_distributed(spark, sf_small):
    """Forcing the distributed E-step (driver bound 0) must produce the
    identical vocabulary — same floats, same ranks."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import (
        bpe as B2,
    )
    from c4_5decisiontreebasedonmapreduce_spark.operators import (
        unigram as UG,
    )
    from c4_5decisiontreebasedonmapreduce_spark.operators.text import docs

    wc = B2.word_counts(docs(spark, sf_small)).localCheckpoint()
    a = UG.train_vocab(wc)
    b = UG.train_vocab(wc, driver_max_words=0)
    assert a == b


def test_unigram_encode_partitions_words(spark, sf_small):
    """Segmentations must PARTITION each word (concat == word) and the
    per-doc stats must be conserved: n_words <= n_pieces <= n_chars and
    n_chars equals the corpus's own character total per doc."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import (
        bpe as B2,
    )
    from c4_5decisiontreebasedonmapreduce_spark.operators import (
        unigram as UG,
    )
    from c4_5decisiontreebasedonmapreduce_spark.operators.text import docs

    d = docs(spark, sf_small)
    wc = B2.word_counts(d).localCheckpoint()
    vocab = UG.train_vocab(wc)
    for r in UG.segment_words(wc, vocab).collect():
        assert "".join(r.pieces) == r.word, r
    enc = UG.unigram_encode(spark, sf_small).collect()
    assert enc
    for r in enc:
        assert r.n_words <= r.n_pieces <= r.n_chars, r
