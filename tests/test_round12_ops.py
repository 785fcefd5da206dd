"""Round-12 hygiene + operators: same-key persisted-artifact disposal
(ADVICE r11), the engine-independent Zipf rank table, and the round's
new operator families (embedding decontamination, bucketed events)."""

import os

from pyspark.sql import functions as F

from c4_5decisiontreebasedonmapreduce_spark import registry as REG

# ---------------------------------------------------------------------------
# persisted-artifact cache: same-key disposal (ADVICE r11)


def _assert_same_key_disposal(spark, sf_small, cache, query_fn):
    """Build once, simulate a fresh Spark session (drop the catalog
    tables, keep the process-level cache), rebuild — the first build's
    temp dirs must be disposed, not abandoned, and the cache must hold
    exactly one entry for the sf_dir."""
    query_fn(spark, sf_small)
    key = REG._layout_cache_key(sf_small)
    tables1, dirs1 = cache[key]
    for p in dirs1:
        assert os.path.isdir(p), f"first build missing artifact {p}"
    for t in tables1:
        spark.sql(f"DROP TABLE IF EXISTS {t}")

    query_fn(spark, sf_small)
    tables2, dirs2 = cache[key]
    assert set(tables2).isdisjoint(tables1)
    for p in dirs1:
        assert not os.path.exists(os.path.dirname(p)), (
            f"stale artifact dir leaked after same-key rebuild: {p}"
        )
    for p in dirs2:
        assert os.path.isdir(p)
    for t in tables2:
        assert spark.catalog.tableExists(t)
    assert [k for k in cache if k[0] == key[0]] == [key]


def test_bm25_persisted_same_key_disposal(spark, sf_small):
    _assert_same_key_disposal(
        spark, sf_small,
        REG._BM25_POSTINGS_TABLES, REG._bm25_topk_persisted_query,
    )


def test_snapshot_persisted_same_key_disposal(spark, sf_small):
    _assert_same_key_disposal(
        spark, sf_small,
        REG._SNAPSHOT_TABLES, REG._diff_snapshots_persisted_query,
    )


# ---------------------------------------------------------------------------
# Zipf rank: the Python cut-point table IS the definition (ADVICE r11)


def test_zipf_rank_matches_python_table(spark):
    """Spark's snapped rank must equal a pure-Python recomputation from
    the md5 stream + bisect over the shared cut-point table — no pow()
    in the reference path at all, so a JVM/C pow ulp difference cannot
    flip any token."""
    import bisect
    import hashlib

    from c4_5decisiontreebasedonmapreduce_spark.operators import (
        retrieval as RV,
    )

    cuts = RV._zipf_rank_cuts()
    assert cuts[0] == 0 and len(cuts) == RV.BM25_ZIPF_VOCAB + 1
    # strictly increasing over reachable ranks; unreachable tail ranks
    # share the 1000000 sentinel (m never reaches it, so bisect is
    # still unambiguous)
    assert all(
        a < b or a == b == 1000000
        for a, b in zip(cuts[:-1], cuts[1:])
    )

    ids = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    # collect_list order is not deterministic across partitions; compare
    # per-doc token MULTISETS instead of positions
    from collections import Counter

    spark_toks = {
        r.doc_id: Counter(r.toks)
        for r in RV.zipf_tokens(ids)
        .groupBy("doc_id")
        .agg(F.collect_list("token").alias("toks"))
        .collect()
    }
    for doc_id in range(200):
        n_tok = RV.BM25_ZIPF_LEN_BASE + doc_id % RV.BM25_ZIPF_LEN_MOD
        expect: Counter = Counter()
        for pos in range(1, n_tok + 1):
            h = hashlib.md5(f"zipf|{doc_id}|{pos}".encode()).hexdigest()
            m = int(h[:15], 16) % 1000000
            rank = bisect.bisect_right(cuts, m)  # count of c_r <= m
            expect[f"tz{rank}"] += 1
        assert spark_toks[doc_id] == expect, f"doc {doc_id} diverges"


# ---------------------------------------------------------------------------
# embedding-space decontamination (VERDICT r11 item 3)


def test_decontaminate_embedding_recall_vs_exact(spark, sf_small):
    """The IVF-pruned flag set must equal the exact all-pairs twin at
    test scale — multi-probe assignment keeps full recall on near
    vectors (the dedup_embedding recall argument, asymmetric)."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import (
        dedup as D,
    )

    ivf = {
        (r.doc_id, r.bench_id, r.cosine)
        for r in D.decontaminate_embedding(spark, sf_small).collect()
    }
    exact = {
        (r.doc_id, r.bench_id, r.cosine)
        for r in D.decontaminate_embedding(
            spark, sf_small, exact=True
        ).collect()
    }
    assert ivf == exact and len(exact) > 0


def test_decontaminate_embedding_persisted_matches_default(
    spark, sf_small, tmp_path
):
    from c4_5decisiontreebasedonmapreduce_spark.operators import (
        dedup as D,
    )

    bench = D.write_benchmark_embeddings(
        spark, sf_small,
        table="t_bench_emb_r12", path=str(tmp_path / "bench_emb"),
    )
    got = {
        tuple(r)
        for r in D.decontaminate_embedding(
            spark, sf_small, bench_assign=bench
        ).collect()
    }
    want = {
        tuple(r)
        for r in D.decontaminate_embedding(spark, sf_small).collect()
    }
    assert got == want and len(want) > 0
    spark.sql("DROP TABLE IF EXISTS t_bench_emb_r12")


def test_decontaminate_embedding_apply_is_exact_complement(spark, sf_small):
    """clean = corpus ids − flagged doc ids, exactly."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import (
        dedup as D,
    )
    from c4_5decisiontreebasedonmapreduce_spark.sources.parquet import (
        load_table,
    )

    corpus = {
        r.vec_id
        for r in load_table(spark, sf_small, "embeddings")
        .where(
            F.col("vec_id") % D.DECONTAM_BENCH_MOD != D.DECONTAM_BENCH_REM
        )
        .select("vec_id")
        .collect()
    }
    flagged = {
        r.doc_id
        for r in D.decontaminate_embedding(spark, sf_small).collect()
    }
    clean = {
        r.doc_id
        for r in D.decontaminate_embedding_apply(spark, sf_small).collect()
    }
    assert clean == corpus - flagged
    assert flagged <= corpus and flagged


def test_decontaminate_embedding_plan_no_cartesian(spark, sf_small):
    """The graded path's only non-equi join is the corpus × broadcast
    CODEBOOK assignment (N×C) — never a corpus × benchmark
    CartesianProduct; the benchmark side enters the candidate join as a
    broadcast."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import (
        dedup as D,
    )

    p = (
        D.decontaminate_embedding(spark, sf_small)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in p


# ---------------------------------------------------------------------------
# user_id-bucketed events layout (VERDICT r11 item 8)


def test_events_bucketed_persisted_twins_zero_user_exchange(
    spark, sf_small, tmp_path
):
    """Against the user_id-bucketed events table, the funnel and
    retention plans must contain NO shuffle Exchange keyed on user_id —
    every per-user agg/distinct/join reads pre-partitioned (broadcast
    exchanges of user-bounded relations and the tiny dates×offsets
    rollup exchanges are the only data movement left). Results must be
    identical to the raw-scan ops."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import (
        relational as R,
    )

    t = R.write_events_bucketed(
        spark, sf_small,
        table="t_events_bucketed_r12", path=str(tmp_path / "ev_bucketed"),
    )
    try:
        for op in (R.funnel_conversion, R.retention_cohorts):
            bucketed = op(spark, sf_small, events=t)
            p = (
                bucketed._jdf.queryExecution().executedPlan().toString()
            )
            assert "hashpartitioning(user_id" not in p, (op.__name__, p)
            assert "Bucketed: true" in p, (op.__name__, p)
            raw = op(spark, sf_small)
            # the raw path pays user-key shuffles the layout removes
            p_raw = raw._jdf.queryExecution().executedPlan().toString()
            assert "hashpartitioning(user_id" in p_raw
            got = sorted(map(tuple, bucketed.collect()))
            want = sorted(map(tuple, raw.collect()))
            assert got == want and len(want) > 0, op.__name__
    finally:
        spark.sql("DROP TABLE IF EXISTS t_events_bucketed_r12")


def test_streaming_decontaminate_embedding_equals_batch(spark, sf_small):
    """Drained ingest-time flags ≡ the batch op — a vector arrives
    whole, so its flag set is batch-local and the union over
    micro-batches is exactly the batch run."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import (
        dedup as D,
    )
    from c4_5decisiontreebasedonmapreduce_spark.streaming import (
        windows as SW,
    )

    drained = {
        tuple(r)
        for r in SW.streaming_decontaminate_embedding(
            spark, sf_small
        ).collect()
    }
    batch = {
        tuple(r)
        for r in D.decontaminate_embedding(spark, sf_small).collect()
    }
    assert drained == batch and len(batch) > 0


def test_contamination_audit_equals_standalone_rollups(spark, sf_small):
    """Each screen's audit rows must equal an independent rollup of its
    standalone detector — same doc set, same bench-doc counts, same max
    score — and every screen must contribute at least one row on the
    fixture."""
    from collections import defaultdict

    from c4_5decisiontreebasedonmapreduce_spark.operators import (
        dedup as D,
    )

    audit = defaultdict(dict)
    for r in D.contamination_audit(spark, sf_small).collect():
        audit[r.screen][r.doc_id] = (r.n_bench_docs, r.score)

    for screen, op, score_col in (
        ("containment", D.decontaminate, "overlap"),
        ("span", D.decontaminate_spans, "span_tokens"),
        ("embedding", D.decontaminate_embedding, "cosine"),
    ):
        want = defaultdict(lambda: (set(), 0.0))
        for r in op(spark, sf_small).collect():
            benches, mx = want[r.doc_id]
            benches.add(r.bench_id)
            want[r.doc_id] = (benches, max(mx, float(r[score_col])))
        assert len(want) > 0, screen
        got = audit[screen]
        assert set(got) == set(want), screen
        for doc_id, (benches, mx) in want.items():
            assert got[doc_id] == (len(benches), mx), (screen, doc_id)


# ---------------------------------------------------------------------------
# incremental inverted-index maintenance


def test_update_postings_equals_full_rebuild(spark, sf_small):
    """Merging the ingest batch into the pre-batch index must reproduce
    the full-corpus postings relation EXACTLY — tf, dl and the globally
    shifted df on every row, old and new."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import (
        retrieval as RV,
    )

    merged = {
        tuple(r) for r in RV.update_postings(spark, sf_small).collect()
    }
    full = {
        tuple(r) for r in RV.build_postings(spark, sf_small).collect()
    }
    assert merged == full and len(full) > 0


def test_update_postings_persisted_plan_and_identity(
    spark, sf_small, tmp_path
):
    """Against the persisted token-bucketed base index: same output,
    and the merge never shuffles the index — the df update meets the
    batch vocabulary through a BroadcastHashJoin over the bucketed
    scan, so every shuffle Exchange in the plan is batch-derived."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import (
        retrieval as RV,
    )

    t = RV.write_postings_base(
        spark, sf_small,
        table="t_bm25_base_r12", path=str(tmp_path / "bm25_base"),
    )
    try:
        df = RV.update_postings(spark, sf_small, old_postings=t)
        p = df._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in p
        assert "BroadcastHashJoin" in p
        got = {tuple(r) for r in df.collect()}
        want = {
            tuple(r)
            for r in RV.build_postings(spark, sf_small).collect()
        }
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bm25_base_r12")


def test_contamination_audit_persisted_matches_default(spark, sf_small):
    """With all three benchmark artifacts persisted, the audit must be
    row-identical to the standalone path."""
    from c4_5decisiontreebasedonmapreduce_spark import registry as REG
    from c4_5decisiontreebasedonmapreduce_spark.operators import (
        dedup as D,
    )

    got = {
        tuple(r)
        for r in REG._contamination_audit_persisted_query(
            spark, sf_small
        ).collect()
    }
    want = {
        tuple(r) for r in D.contamination_audit(spark, sf_small).collect()
    }
    assert got == want and len(want) > 0


# ---------------------------------------------------------------------------
# round-12 second wave: cleaning transforms + quality-aware selection


def test_scrub_repetition_multiline_fixture(spark, sf_small):
    """The synthetic corpus is single-line, so pin the real behavior on
    an injected multi-line fixture: first occurrence of each trimmed
    line survives IN ORDER, later occurrences drop, whitespace-only
    lines vanish, and the char fraction counts line bytes (not the
    joining newlines)."""
    from c4_5decisiontreebasedonmapreduce_spark.operators.text import (
        scrub_repetition,
    )

    d = spark.createDataFrame(
        [
            (1, "nav bar\nbody one\nnav bar\n  \nbody two\nnav bar"),
            (2, "only line"),
            (3, "   "),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in scrub_repetition(spark, sf_small, d=d).collect()
    }
    assert rows[1]["clean_text"] == "nav bar\nbody one\nbody two"
    assert (rows[1]["n_lines"], rows[1]["n_kept"]) == (5, 3)
    # 2 dropped copies of 'nav bar' = 14 of 37 line chars
    assert rows[1]["removed_char_frac"] == round(14 / 37, 6)
    assert rows[2]["clean_text"] == "only line"
    assert rows[2]["removed_char_frac"] == 0.0
    assert rows[3]["clean_text"] == "" and rows[3]["n_lines"] == 0


def test_keep_best_survivor_is_quality_argmax(spark, sf_small):
    """dedup_cluster_keep_best must pick, per cluster, the (keep DESC,
    n_tokens DESC, doc_id ASC) argmax of the INDEPENDENTLY computed
    quality signals — and must cover exactly dedup_cluster's docs with
    the same min-label cluster ids."""
    from c4_5decisiontreebasedonmapreduce_spark.operators.dedup import (
        dedup_cluster,
        dedup_cluster_keep_best,
    )
    from c4_5decisiontreebasedonmapreduce_spark.operators.text import (
        quality_signals,
    )

    out = dedup_cluster_keep_best(spark, sf_small).collect()
    base = {
        r["doc_id"]: r["cluster_rep"]
        for r in dedup_cluster(spark, sf_small).collect()
    }
    assert {r["doc_id"]: r["cluster_rep"] for r in out} == base
    q = {
        r["doc_id"]: (r["keep"], r["n_tokens"])
        for r in quality_signals(spark, sf_small).collect()
    }
    clusters = {}
    for doc_id, rep in base.items():
        clusters.setdefault(rep, []).append(doc_id)
    expected_best = {
        rep: min(
            members,
            key=lambda d: (not q[d][0], -q[d][1], d),
        )
        for rep, members in clusters.items()
    }
    for r in out:
        assert r["best_rep"] == expected_best[r["cluster_rep"]]
        assert r["survivor"] == (r["doc_id"] == r["best_rep"])
    # at least one cluster's quality pick differs from the min-doc_id
    # pick, so the op is not vacuously equal to dedup_cluster
    assert any(
        expected_best[rep] != rep for rep in clusters
    ), "fixture never exercises the quality argmax"


def test_cluster_balanced_cap_binding_and_deterministic(spark, sf_small):
    from c4_5decisiontreebasedonmapreduce_spark.operators.sampling import (
        CBAL_CAP,
        sample_cluster_balanced,
    )

    rows = sample_cluster_balanced(spark, sf_small).collect()
    per = {}
    for r in rows:
        per.setdefault(r["centroid_id"], []).append(r["rank"])
    for cid, ranks in per.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= CBAL_CAP
    # the cap must BIND somewhere at test scale (otherwise the op is a
    # pass-through and the grade is vacuous)
    assert any(len(v) == CBAL_CAP for v in per.values())
    again = sample_cluster_balanced(spark, sf_small).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_perplexity_filter_keeps_lower_half_per_lang(spark, sf_small):
    """Every kept document must score strictly below every dropped
    document of the same language, and the kept count must be the
    median split (ceil(n/2) absent boundary ties)."""
    from c4_5decisiontreebasedonmapreduce_spark.operators.sampling import (
        sample_perplexity_filter,
    )
    from c4_5decisiontreebasedonmapreduce_spark.operators.text import (
        docs,
        lm_perplexity,
    )

    kept = sample_perplexity_filter(spark, sf_small).collect()
    scored = (
        lm_perplexity(spark, sf_small)
        .join(docs(spark, sf_small).select("doc_id", "lang"), "doc_id")
        .collect()
    )
    by_lang = {}
    for r in scored:
        by_lang.setdefault(r["lang"], {})[r["doc_id"]] = r["bits_per_bigram"]
    kept_ids = {r["doc_id"] for r in kept}
    assert kept_ids <= {r["doc_id"] for r in scored}
    for lang, docs_bits in by_lang.items():
        k = [b for d, b in docs_bits.items() if d in kept_ids]
        drop = [b for d, b in docs_bits.items() if d not in kept_ids]
        assert k, f"{lang}: nothing kept"
        if drop:
            assert max(k) < min(drop)
        assert len(k) >= (len(docs_bits) + 1) // 2


def test_k100_keep_best_linearity(spark, sf_small, tmp_path):
    """Extends the K=100 decade pins to the quality-aware survivor op:
    on the 100×-multiplied corpus (copy-tagged tokens — per-copy
    structure preserved, copies mutually non-duplicate) clusters stay
    copy-local and quality signals are per-doc functions of the
    copy-injective token mapping, so BOTH the clustered-doc relation
    and its survivor subset must be EXACTLY 100.00× the K=1 run, with
    each copy's winner the offset image of the base winner."""
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

    results = {}
    for k in (1, 100):
        out = str(tmp_path / f"kb{k}")
        probe.build_multiplied(spark, sf_small, k, out)
        rows = D.dedup_cluster_keep_best(spark, out).collect()
        results[k] = rows
    base = results[1]
    assert base
    assert len(results[100]) == 100 * len(base)
    assert (
        sum(r["survivor"] for r in results[100])
        == 100 * sum(r["survivor"] for r in base)
    )
    # copy 1's winners are the offset image of copy 0's
    off = 105_000_000
    base_map = {r["doc_id"]: r["best_rep"] for r in base}
    copy1 = {
        r["doc_id"] - off: r["best_rep"] - off
        for r in results[100]
        if off <= r["doc_id"] < 2 * off
    }
    assert copy1 == base_map


def test_cluster_balanced_persisted_zero_exchange_and_identical(
    spark, sf_small, tmp_path
):
    """Against the persisted centroid-bucketed nearest-1 assignment
    table, re-sampling must be a bucketed scan + in-partition sort:
    ZERO Exchange of any kind in the plan (the window's required
    distribution IS the bucketing), with output identical to the
    in-memory op."""
    from c4_5decisiontreebasedonmapreduce_spark.operators.sampling import (
        sample_cluster_balanced,
        write_cluster_assignments,
    )

    t = write_cluster_assignments(
        spark, sf_small,
        table="t_cbal_r12", path=str(tmp_path / "cbal"),
    )
    try:
        df = sample_cluster_balanced(spark, sf_small, assign=t)
        p = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in p, p
        assert "Bucketed: true" in p, p
        got = sorted(map(tuple, df.collect()))
        want = sorted(
            map(tuple, sample_cluster_balanced(spark, sf_small).collect())
        )
        assert got == want and got
    finally:
        spark.sql("DROP TABLE IF EXISTS t_cbal_r12")


def test_streaming_scrub_repetition_equals_batch(spark, sf_small):
    """The ingest-time rewrite must drain to exactly the batch
    transform's output — stateless projection, so equality is by
    construction and this pins the plumbing (stream staging, coalesce,
    schema)."""
    from c4_5decisiontreebasedonmapreduce_spark.operators.text import (
        scrub_repetition,
    )
    from c4_5decisiontreebasedonmapreduce_spark.streaming.windows import (
        streaming_scrub_repetition,
    )

    drained = sorted(
        map(tuple, streaming_scrub_repetition(spark, sf_small).collect())
    )
    batch = sorted(map(tuple, scrub_repetition(spark, sf_small).collect()))
    assert drained == batch and drained


def test_curation_best_drops_exactly_the_cluster_losers(spark, sf_small):
    """The composed pipeline's survivor mass must be the base curation
    rollup minus EXACTLY the keep-best losers (every clustered doc that
    is not its cluster's quality-argmax) — and must differ from the
    base rollup, so the composition is not vacuous on the fixture."""
    from c4_5decisiontreebasedonmapreduce_spark.operators.dedup import (
        dedup_cluster_keep_best,
    )
    from c4_5decisiontreebasedonmapreduce_spark.operators.pipeline import (
        curation_best_pipeline,
        curation_pipeline,
    )

    best = curation_best_pipeline(spark, sf_small).collect()
    base = curation_pipeline(spark, sf_small).collect()
    n_losers = sum(
        not r["survivor"]
        for r in dedup_cluster_keep_best(spark, sf_small).collect()
    )
    assert n_losers > 0
    assert (
        sum(r["n_docs"] for r in best)
        == sum(r["n_docs"] for r in base) - n_losers
    )
    assert sorted(map(tuple, best)) != sorted(map(tuple, base))


def test_sessionize_persisted_zero_exchange_and_identical(spark, sf_small):
    """Against the user_id-bucketed events table, sessionization must be
    entirely Exchange-free: the per-user windows AND the
    (user_id, session_id) grouping all read pre-partitioned (grouping
    keys contain user_id, so the bucketing satisfies them too). Output
    identical to the raw-scan op."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import (
        relational as R,
    )

    df = REG._sessionize_persisted_query(spark, sf_small)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p, p
    assert "Bucketed: true" in p, p
    got = sorted(map(tuple, df.collect()))
    want = sorted(map(tuple, R.sessionize_events(spark, sf_small).collect()))
    assert got == want and got


def test_numeric_best_split_adaptive_paths_identical(spark, monkeypatch):
    """The r12 adaptive plain-window fallback in numeric_best_split
    (bucketed=True relations whose materialized matrix is small AND has
    enough (rid, aid) groups take one per-group window instead of the
    two-phase bucketed prefix sum) is physical-only: both paths must
    emit identical rows. 2 rids x 8 attrs = 16 groups crosses the
    group threshold, so a large bound forces the plain path and a zero
    bound forces the bucketed path on the same input."""
    import random

    from c4_5decisiontreebasedonmapreduce_spark.operators import (
        c45_stats as S,
    )

    rng = random.Random(12)
    attrs = [f"x{i}" for i in range(8)]
    rows = [
        tuple(
            [rng.randint(0, 1)]
            + [float(rng.randint(0, 30)) for _ in attrs]
            + [rng.choice("abc")]
        )
        for _ in range(400)
    ]
    df = spark.createDataFrame(
        rows,
        "rid int, " + ", ".join(f"{a} double" for a in attrs) + ", cls string",
    )
    info = S.node_info(S.node_class_counts(df, "cls"))
    cont = S.contingency(S.melt(df, attrs, "cls", numeric=True))

    def run():
        return sorted(
            map(
                tuple,
                S.numeric_best_split(
                    cont, info, ["a", "b", "c"], 0.1, bucketed=True
                ).collect(),
            )
        )

    monkeypatch.setattr(S, "NUMERIC_PLAIN_WINDOW_MAX_ROWS", 0)
    bucketed = run()
    monkeypatch.setattr(S, "NUMERIC_PLAIN_WINDOW_MAX_ROWS", 10_000_000)
    plain = run()
    assert bucketed == plain and len(bucketed) == 16
