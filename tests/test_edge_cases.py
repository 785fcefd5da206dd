"""Degenerate-input contracts: inputs a 100 TB corpus WILL contain
(null/empty text, pure or constant training tables, zero vectors) must
produce defined, documented results — not engine-dependent accidents.

Reference context: the reference crashes outright on several of these
(a pure root throws in `Rule.toString`, `/root/reference/src/type/
Rule.java:29` — quirk Q4 in SURVEY.md), so these tests pin OUR
documented divergences."""

import pytest
from pyspark.sql import functions as F

import c4_5decisiontreebasedonmapreduce_spark.operators.tree as Tr
from c4_5decisiontreebasedonmapreduce_spark.sources.tsv import (
    CATEGORICAL,
    NUMERIC,
    AttributeSpec,
    TrainingSchema,
)

SCHEMA_2F = TrainingSchema(
    features=(
        AttributeSpec("f1", CATEGORICAL, ("a", "b")),
        AttributeSpec("f2", NUMERIC),
    ),
    label="lab",
    label_domain=("yes", "no"),
)


@pytest.fixture(scope="module")
def edge_corpus(spark, tmp_path_factory):
    """documents.parquet with the degenerate text rows: empty,
    whitespace-only, NULL, punctuation-only, and one healthy doc."""
    path = str(tmp_path_factory.mktemp("edge") / "corpus")
    spark.createDataFrame(
        [
            (1, "", "en", "s", 0),
            (2, "   ", "en", "s", 3),
            (3, None, "en", "s", None),
            (4, "!!! ... ???", "en", "s", 11),
            (
                5,
                "the quick brown fox and the lazy dog in a field of grain",
                "en",
                "s",
                57,
            ),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(path + "/documents.parquet")
    return path


def test_null_text_scores_like_empty(spark, edge_corpus):
    """A NULL document must behave EXACTLY like an empty one. Without
    the coalesce in text.docs(), Spark's null-skipping LEAST/GREATEST
    hand the null doc quality_score 0.7 — above the curation gate —
    while the empty doc scores 0.2."""
    from c4_5decisiontreebasedonmapreduce_spark.operators.text import (
        lang_id,
        text_stats,
        token_count_bpe,
    )

    st = {r["doc_id"]: r.asDict() for r in text_stats(spark, edge_corpus).collect()}
    null_doc, empty_doc = st[3], st[1]
    for col in null_doc:
        if col != "doc_id":
            assert null_doc[col] == empty_doc[col], col
    assert null_doc["quality_score"] == 0.2
    # no column of any degenerate row is null
    for row in st.values():
        assert all(v is not None for v in row.values()), row

    langs = {r["doc_id"]: r["lang_pred"] for r in lang_id(spark, edge_corpus).collect()}
    assert langs[3] == "und" == langs[1]

    bpe = {r["doc_id"]: r.asDict() for r in token_count_bpe(spark, edge_corpus).collect()}
    assert bpe[3]["n_bpe_tokens"] == 0 and bpe[3]["bpe_per_word"] == 0.0


def test_null_text_dedups_with_empty(spark, edge_corpus):
    """Null and empty text normalize to the same fingerprint: one
    deterministic survivor (min doc_id), not a NULL-keyed cluster."""
    from c4_5decisiontreebasedonmapreduce_spark.operators.dedup import (
        dedup_exact,
    )

    rows = {r["fingerprint"]: r for r in dedup_exact(spark, edge_corpus).collect()}
    assert None not in rows
    # docs 1 ("" ), 2 ("   "), 3 (NULL) share the empty-text fingerprint
    empties = [r for r in rows.values() if r["n_dupes"] == 2]
    assert len(empties) == 1 and empties[0]["keep_doc_id"] == 1


def test_curation_pipeline_on_degenerate_corpus(spark, edge_corpus):
    """End-to-end: degenerate docs are counted, fail the quality gate,
    and never produce NULL aggregates."""
    from c4_5decisiontreebasedonmapreduce_spark.operators.pipeline import (
        curation_pipeline,
    )

    rows = {(r["lang_pred"], r["passed"]): r.asDict()
            for r in curation_pipeline(spark, edge_corpus).collect()}
    for r in rows.values():
        assert all(v is not None for v in r.values()), r
    # survivors: doc 1 (for 1+2+3), doc 4, doc 5; only doc 5 passes
    assert rows[("und", False)]["n_docs"] == 2
    assert rows[("en", True)]["n_docs"] == 1
    assert ("und", True) not in rows and ("en", False) not in rows


def test_train_pure_root_is_single_unconditional_rule(spark):
    """Single-class data: the root is already pure. The reference
    crashes here (`Rule.java:29`, quirk Q4); our model is one rule with
    no conditions carrying the class and the full row count."""
    df = spark.createDataFrame(
        [("a", 1.0, "yes")] * 20, "f1 string, f2 double, lab string"
    )
    m = Tr.train(df, SCHEMA_2F, max_depth=3, min_rows=2)
    assert [(len(r.conditions), r.label, r.n) for r in m.rules] == [
        (0, "yes", 20)
    ]
    pred = m.transform(df)
    assert pred.where(F.col("prediction") == "yes").count() == 20


def test_train_identical_rows_terminates(spark):
    """All feature values identical, labels split 50/50: no numeric
    boundary passes the min-side guard and the categorical split has
    SplitI == 0 (gain 1e-5 — selectable but near-worst, the reference's
    own special case `MyReducer.java:282-298`). Training must terminate
    with every leaf labeled the deterministic majority tie-break
    ('no' < 'yes'), conserving the row count."""
    df = spark.createDataFrame(
        [("a", 1.0, "yes")] * 10 + [("a", 1.0, "no")] * 10,
        "f1 string, f2 double, lab string",
    )
    m = Tr.train(df, SCHEMA_2F, max_depth=3, min_rows=2)
    assert m.rules  # terminated with a non-empty model
    assert sum(r.n for r in m.rules) == 20
    assert {r.label for r in m.rules} == {"no"}


def test_zero_norm_embedding_ranks_last(spark, tmp_path):
    """A zero vector has undefined cosine: Spark's non-ANSI division
    yields NULL, which sorts LAST under the descending rank — the zero
    vector never displaces a real neighbor and nothing crashes. (The
    graded corpus contains no zero vectors; this pins local engine
    behavior, not oracle parity — DuckDB orders NULLs first by
    default, a divergence that would matter only if real data carried
    zero embeddings.)"""
    from c4_5decisiontreebasedonmapreduce_spark.operators.similarity import (
        similarity_topk,
    )

    path = str(tmp_path / "emb")
    rows = [(i, [float((i + j) % 7 - 3) for j in range(8)], 0) for i in range(2, 30)]
    rows.append((0, [1.0] * 8, 0))  # query 0: healthy
    rows.append((1, [0.0] * 8, 0))  # query 1: zero vector
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(path + "/embeddings.parquet")

    out = similarity_topk(spark, path)
    q0 = out.where(F.col("query_id") == 0).collect()
    assert len(q0) == 5 and all(r["cosine"] is not None for r in q0)
    # the zero query still returns k rows, all with undefined (null) score
    q1 = out.where(F.col("query_id") == 1).collect()
    assert len(q1) == 5 and all(r["cosine"] is None for r in q1)
    # and the zero vector is ranked LAST as a neighbor of real queries
    zero_as_neighbor = out.where(
        (F.col("neighbor_id") == 1) & (F.col("cosine").isNotNull())
    )
    assert zero_as_neighbor.count() == 0


def test_quality_signals_degenerate(spark, edge_corpus):
    """Token-free documents (empty/whitespace/NULL/punctuation-only) get
    all-zero repetition signals and keep=False — never NULL ratios or a
    divide-by-zero — and a healthy doc's signals equal the hand-computed
    fractions."""
    from c4_5decisiontreebasedonmapreduce_spark.operators.text import (
        quality_signals,
    )

    rows = {r.doc_id: r for r in quality_signals(spark, edge_corpus).collect()}
    for d in (1, 2, 3, 4):  # doc 4 is punctuation-only: zero tokens too
        r = rows[d]
        assert r.n_tokens == 0 and r.keep is False
        assert (
            r.distinct_ratio
            == r.frac_alpha_words
            == r.top_word_frac
            == r.top_bigram_frac
            == 0.0
        )
    # doc 5: 13 tokens, "the" twice, all bigrams distinct, all alphabetic
    r = rows[5]
    assert r.n_tokens == 13
    assert r.frac_alpha_words == 1.0
    assert r.distinct_ratio == round(12 / 13, 6)
    assert r.top_word_frac == round(2 / 13, 6)
    assert r.top_bigram_frac == round(1 / 12, 6)


def test_sample_stratified_deterministic_and_monotone(
    spark, sf_small, monkeypatch
):
    """The hash-sample contract: re-running selects the SAME rows, and
    raising a stratum's rate only ADDS rows (nested samples — the
    property that makes backfills and rate retuning reproducible)."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import sampling as SMP

    first = {r.doc_id for r in SMP.sample_stratified(spark, sf_small).collect()}
    again = {r.doc_id for r in SMP.sample_stratified(spark, sf_small).collect()}
    assert first == again
    monkeypatch.setattr(
        SMP, "STRATA_RATES", {k: 1.0 for k in SMP.STRATA_RATES}
    )
    full = {r.doc_id for r in SMP.sample_stratified(spark, sf_small).collect()}
    assert first < full  # strict: rates < 1.0 drop something
    from c4_5decisiontreebasedonmapreduce_spark.operators.text import docs

    assert len(full) == docs(spark, sf_small).count()  # rate 1.0 keeps all


def test_sample_coverage_flags_unconfigured_stratum(spark, sf_small):
    """ADVICE r6: an unconfigured language must surface loudly via the
    coverage audit (configured=false, n_kept=0) instead of silently
    vanishing through the sampler's inner join — and the audit's kept
    counts must agree exactly with what the sampler actually keeps."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import sampling as SMP
    from c4_5decisiontreebasedonmapreduce_spark.operators.text import docs

    # on the fixture every language has a rate: audit says all covered
    cov = {r.lang: r for r in SMP.sample_coverage(spark, sf_small).collect()}
    assert cov and all(r.configured for r in cov.values())
    kept = (
        SMP.sample_stratified(spark, sf_small)
        .groupBy("lang")
        .count()
        .collect()
    )
    for r in kept:
        assert cov[r.lang].n_kept == r["count"]

    # inject an unconfigured stratum: it must be flagged, not dropped
    extra = spark.createDataFrame(
        [(10**9, "Heghlu'meH QaQ jajvam", "tlh", "synthetic", 21)],
        docs(spark, sf_small).schema,
    )
    cov2 = {
        r.lang: r
        for r in SMP.sample_coverage(
            spark, sf_small, d=docs(spark, sf_small).unionByName(extra)
        ).collect()
    }
    assert not cov2["tlh"].configured
    assert cov2["tlh"].n_kept == 0 and cov2["tlh"].n_docs == 1


def test_sample_mixture_epochs_and_token_mass(spark, sf_small):
    """The mixture contract: (a) upsampling really engages — at the test
    scale every configured source's rate exceeds 1, so full epochs
    appear; (b) per-doc copies are dense 1..n (floor(rate) full epochs +
    at most one Bernoulli extra, never a gap); (c) realized token mass
    per source lands near weight·budget (exp. exact; ±20% tolerates the
    fractional-Bernoulli variance at 25 docs/source); (d) deterministic:
    re-running emits the SAME (doc, epoch) rows."""
    import collections

    from c4_5decisiontreebasedonmapreduce_spark.operators import sampling as SMP

    rows = SMP.sample_mixture(spark, sf_small).collect()
    again = SMP.sample_mixture(spark, sf_small).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    per_doc = collections.defaultdict(list)
    tok = collections.Counter()
    for r in rows:
        per_doc[r.doc_id].append(r.epoch)
        tok[r.source] += r.n_tokens
    assert max(max(e) for e in per_doc.values()) >= 2  # real upsampling
    for eps in per_doc.values():
        assert sorted(eps) == list(range(1, len(eps) + 1))  # dense 1..n
    assert set(tok) == set(SMP.MIXTURE_WEIGHTS_PM)
    for src, w_pm in SMP.MIXTURE_WEIGHTS_PM.items():
        target = w_pm * SMP.MIX_TOKEN_BUDGET / 1000
        assert abs(tok[src] - target) / target < 0.20, (src, tok[src], target)


def test_sample_temperature_flattens_toward_uniform(spark, sf_small):
    """Temperature contract (τ=2, p ∝ sqrt(T)): (a) upsampling engages
    (full epochs appear at the test scale); (b) per-doc epochs are dense
    1..n; (c) realized token mass per source lands near its DERIVED
    share w_s/W · budget (±25% — 25 docs/source Bernoulli variance);
    (d) the shares are COMPRESSED relative to the natural token
    distribution — the whole point of temperature scaling: the
    max/min share ratio must sit strictly between 1 and the raw
    max/min token ratio; (e) deterministic re-run."""
    import collections
    import math

    from c4_5decisiontreebasedonmapreduce_spark.operators import sampling as SMP
    from c4_5decisiontreebasedonmapreduce_spark.operators.text import docs, tokens_col

    rows = SMP.sample_temperature(spark, sf_small).collect()
    again = SMP.sample_temperature(spark, sf_small).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    per_doc = collections.defaultdict(list)
    tok = collections.Counter()
    for r in rows:
        per_doc[r.doc_id].append(r.epoch)
        tok[r.source] += r.n_tokens
    assert max(max(e) for e in per_doc.values()) >= 2  # real upsampling
    for eps in per_doc.values():
        assert sorted(eps) == list(range(1, len(eps) + 1))  # dense 1..n
    totals = {
        r.source: r.total
        for r in docs(spark, sf_small)
        .select("source", F.size(tokens_col(F.col("text"))).alias("n"))
        .groupBy("source")
        .agg(F.sum("n").alias("total"))
        .collect()
    }
    w = {s: math.floor(math.sqrt(t)) for s, t in totals.items()}
    W = sum(w.values())
    for src, t in totals.items():
        target = w[src] / W * SMP.TEMP_TOKEN_BUDGET
        assert abs(tok[src] - target) / target < 0.25, (src, tok[src], target)
    nat_ratio = max(totals.values()) / min(totals.values())
    share_ratio = max(w.values()) / min(w.values())
    assert 1.0 < share_ratio < nat_ratio  # flattened, not uniform


def test_repetition_signals_on_multiline_fixture(spark, sf_small):
    """The synthetic corpus is single-line (all fractions 0), so the
    REAL semantics are pinned on an injected multi-line fixture:
    boilerplate nav repeated 3x (dup_line_frac = 2/4, char frac
    weighted by length), a paragraph duplicated once, trimmed/empty
    segments dropped, and an empty document scoring all-zero keep=true.
    The same fixture is cross-checked against the DuckDB oracle text
    run over a fixture `documents` view — both engines, one contract."""
    import duckdb

    from c4_5decisiontreebasedonmapreduce_spark.operators import text as TX

    rows = [
        # 4 non-empty lines: nav/nav/nav/content -> dup_line_frac=0.5;
        # chars: nav(3x9)+body(22)=49, distinct 9+22=31 -> 18/49
        (1, "home|nav|x\n  \nhome|nav|x\nhome|nav|x\nactual body text here!"),
        # paragraphs: A, B, A -> dup_para_frac=1/3; lines all distinct
        (2, "para A\n\npara B unique\n\npara A"),
        (3, ""),  # empty doc: zero segments, all fracs 0, keep
        (4, "one line only"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r for r in TX.repetition_signals(spark, "", d=d).collect()
    }
    assert got[1].n_lines == 4 and got[1].dup_line_frac == 0.5
    # "home|nav|x" is 10 chars: 4 lines = 3*10+22=52 chars, dups 20/52
    assert got[1].dup_line_char_frac == round(20 / 52, 6)
    assert not got[1].keep
    assert got[2].n_paras == 3 and got[2].dup_para_frac == round(1 / 3, 6)
    # "para A" duplicates as a LINE too (blank lines dropped): 3 lines
    assert got[2].dup_line_frac == round(1 / 3, 6) and not got[2].keep
    assert got[3].n_lines == 0 and got[3].dup_line_frac == 0.0
    assert got[3].keep and got[4].keep

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, E{v!r}, 'en', 'src0', {len(v)})" for i, v in rows
        )
        + ") t(doc_id, text, lang, source, n_chars)"
    )
    oracle = {
        r[0]: r for r in con.execute(TX.REPETITION_SIGNALS_SQL).fetchall()
    }
    for doc_id, r in got.items():
        assert tuple(r) == oracle[doc_id], (doc_id, tuple(r), oracle[doc_id])


def test_lm_perplexity_hand_computed_with_unk(spark, sf_small):
    """Pins the bigram-LM semantics on a 2-doc fixture with top_v=2 so
    the unk path engages: corpus "a b a b a" + "a c", vocab {a, b},
    c → <unk>, V = 3. Prefix counts C(a·)=3, C(b·)=2; add-one probs
    p(b|a)=3/6, p(a|b)=3/5, p(unk|a)=2/6 — doc1 averages
    (2·1 + 2·log2(5/3))/4 bits over its 4 bigrams, doc2 scores
    log2(3) on its single bigram. A third single-token document emits
    no bigrams and must be ABSENT, not zero."""
    import math

    from c4_5decisiontreebasedonmapreduce_spark.operators import text as TX

    d = spark.createDataFrame(
        [(1, "a b a b a"), (2, "a c"), (3, "solo")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r
        for r in TX.lm_perplexity(spark, "", top_v=2, d=d).collect()
    }
    assert set(got) == {1, 2}  # the 1-token doc emits no bigrams
    assert got[1].n_bigrams == 4
    assert got[1].bits_per_bigram == round(
        (2 * 1.0 + 2 * math.log2(5 / 3)) / 4, 6
    )
    assert got[2].n_bigrams == 1
    assert got[2].bits_per_bigram == round(math.log2(3), 6)


def test_shuffle_deterministic_randomizes_within_shards(spark, sf_small):
    """The training-order manifest must (a) cover every document exactly
    once, (b) number positions densely 1..n per shard, (c) actually
    RANDOMIZE — within at least one shard the hash order must disagree
    with doc_id order (a manifest that returns corpus order is the bug
    this operator exists to prevent), and (d) reproduce identically."""
    import collections

    from c4_5decisiontreebasedonmapreduce_spark.operators import packing as PK
    from c4_5decisiontreebasedonmapreduce_spark.operators.text import docs

    rows = PK.shuffle_deterministic(spark, sf_small).collect()
    again = PK.shuffle_deterministic(spark, sf_small).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    n_docs = docs(spark, sf_small).count()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs
    by_shard = collections.defaultdict(list)
    for r in rows:
        by_shard[r.shard].append((r.pos, r.doc_id))
    scrambled = 0
    for members in by_shard.values():
        members.sort()
        assert [p for p, _ in members] == list(range(1, len(members) + 1))
        ids = [d for _, d in members]
        if ids != sorted(ids):
            scrambled += 1
    assert scrambled >= 1, "hash order degenerated to corpus order"


def test_sample_softdedup_collapses_duplicate_mass(spark, sf_small):
    """Soft dedup contract: every UNclustered document keeps
    (cluster_size = 1 → threshold = M, always true); clustered documents
    keep with probability 1/size, so across the fixture's near-dup
    clusters the kept count must be strictly below full membership
    (duplicate mass actually collapses); deterministic re-run."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import sampling as SMP
    from c4_5decisiontreebasedonmapreduce_spark.operators.dedup import (
        dedup_cluster,
    )
    from c4_5decisiontreebasedonmapreduce_spark.operators.text import docs

    kept = {r.doc_id: r.cluster_size
            for r in SMP.sample_softdedup(spark, sf_small).collect()}
    again = {r.doc_id: r.cluster_size
             for r in SMP.sample_softdedup(spark, sf_small).collect()}
    assert kept == again
    clustered = {r.doc_id for r in dedup_cluster(spark, sf_small).collect()}
    all_ids = {r.doc_id for r in docs(spark, sf_small).select("doc_id").collect()}
    unclustered = all_ids - clustered
    assert unclustered <= set(kept)  # singletons always keep
    assert all(kept[d] == 1 for d in unclustered)
    kept_clustered = set(kept) & clustered
    assert len(kept_clustered) < len(clustered)  # mass collapsed
    assert all(kept[d] >= 2 for d in kept_clustered)


def test_pipeline_mixture_pack_conserves_epoch_token_mass(spark, sf_small):
    """The mixture→pack composition must pack EXACTLY the mixture's
    emitted token mass (every epoch of every sampled doc, nothing else),
    and repeated epochs of one document must be independent virtual
    documents — landing in ≥ 2 different hash shards for at least one
    upsampled doc (repetition spreads across the training run instead
    of clumping into one shard)."""
    import collections

    from c4_5decisiontreebasedonmapreduce_spark.operators import packing as PK
    from c4_5decisiontreebasedonmapreduce_spark.operators import sampling as SMP
    from c4_5decisiontreebasedonmapreduce_spark.functions.hashing import (
        md5_long,
    )

    m = SMP.sample_mixture(spark, sf_small).collect()
    mixture_tokens = sum(r.n_tokens for r in m)
    packed = PK.pipeline_mixture_pack(spark, sf_small).collect()
    assert sum(r.n_tokens for r in packed) == mixture_tokens
    # per-shard windows: all but the last hold exactly SEQ_LEN tokens
    last_chunk = collections.defaultdict(int)
    for r in packed:
        last_chunk[r.shard] = max(last_chunk[r.shard], r.chunk_id)
    assert all(
        r.n_tokens == PK.SEQ_LEN
        for r in packed
        if r.chunk_id < last_chunk[r.shard]
    )
    # an upsampled doc's epochs are distinct virtual docs in ≥ 2 shards
    epochs = collections.Counter(r.doc_id for r in m)
    multi = [d for d, n in epochs.items() if n >= 2]
    assert multi
    vkeys = spark.createDataFrame(
        [(d * PK._EPOCH_KEY_BASE + e,) for d in multi
         for e in range(1, epochs[d] + 1)],
        "doc_id long",
    ).select(
        "doc_id",
        (md5_long(F.concat(F.lit(PK._SHARD_SEED),
                           F.col("doc_id").cast("string")))
         % PK.N_SHARDS).alias("shard"),
    ).collect()
    shards_of = collections.defaultdict(set)
    for r in vkeys:
        shards_of[r.doc_id // PK._EPOCH_KEY_BASE].add(r.shard)
    assert any(len(s) >= 2 for s in shards_of.values())


def test_asof_forward_fixture_has_no_ties(spark, sf_small, sf_oracle):
    """asof_join_forward's deterministic tie-break (min event_id at an
    equal (user_id, ts)) could diverge from DuckDB's arbitrary ASOF tie
    choice — the operator's oracle parity relies on the fixtures having
    NO such ties, pinned here so a future fixture change fails loudly
    instead of flaking the hash compare."""
    from c4_5decisiontreebasedonmapreduce_spark.sources.parquet import (
        load_table,
    )

    for sf in (sf_small, sf_oracle):
        ev = load_table(spark, sf, "events").where(
            F.col("event_type") == "view"
        )
        assert (
            ev.groupBy("user_id", "ts").count().where(F.col("count") > 1)
        ).count() == 0


def test_profile_columns_approx_mode(spark, sf_small):
    """profile_columns(approx=True) — the 100 TB path (VERDICT r7 item
    7): distinct counts ride HLL++ sketches instead of exact
    count-distincts. Contract: (a) every non-distinct stat is
    byte-identical to the exact mode, (b) each approx distinct is
    within 3× the default 5% rsd of the exact count, and (c) the plan
    loses the Expand node the exact multi-column distincts force —
    that row replication IS the exact variant's scale cost."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import (
        relational as R,
    )

    exact = {r["column"]: r.asDict() for r in
             R.profile_columns(spark, sf_small).collect()}
    approx_df = R.profile_columns(spark, sf_small, approx=True)
    approx = {r["column"]: r.asDict() for r in approx_df.collect()}
    assert set(exact) == set(approx) and exact
    for col, e in exact.items():
        a = approx[col]
        for k in ("n_values", "n_nulls", "min_value", "max_value"):
            assert a[k] == e[k], (col, k)
        assert abs(a["n_distinct"] - e["n_distinct"]) <= max(
            1, 0.15 * e["n_distinct"]
        ), (col, a["n_distinct"], e["n_distinct"])
    exact_plan = R.profile_columns(spark, sf_small)._jdf.queryExecution(
    ).executedPlan().toString()
    approx_plan = approx_df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in exact_plan
    assert "Expand" not in approx_plan


# -------------------------------------------------- null-value policy


def _poisoned(spark, sf=None):
    """lineitem training slice with NULLs injected into one categorical
    and one numeric feature (deterministic rand seeds)."""
    from c4_5decisiontreebasedonmapreduce_spark import registry as RG

    df = RG.lineitem_training(spark, sf or "/root/testdata/sf0.001")
    return (
        df.withColumn(
            "l_discount",
            F.when(F.rand(42) < 0.1, None).otherwise(F.col("l_discount")),
        ).withColumn(
            "l_linestatus",
            F.when(F.rand(7) < 0.05, None).otherwise(F.col("l_linestatus")),
        ),
        RG.LINEITEM_TRAINING_SCHEMA,
    )


def test_train_rejects_nulls_by_default(spark):
    """The silent-row-loss trap closed: without an explicit policy,
    feature NULLs fail fast with per-column counts (a null in a chosen
    split attribute would otherwise drop the row mid-tree — the audit
    measured 81 of 6000 rows vanishing on this very fixture)."""
    df, schema = _poisoned(spark)
    with pytest.raises(ValueError, match="l_discount.*l_linestatus"):
        Tr.train(df, schema, max_depth=3, min_rows=50)


def test_train_missing_policy_conserves_rows(spark):
    """nulls='missing': categorical nulls branch as __missing__, numeric
    nulls are median-imputed — and the partition invariant holds again:
    every input row reaches exactly one leaf."""
    df, schema = _poisoned(spark)
    m = Tr.train(df, schema, max_depth=4, min_rows=50, nulls="missing")
    assert sum(r.n for r in m.rules) == df.count()
    # the missing branch is reachable in the model's domain: if any rule
    # conditions on l_linestatus, a __missing__ arm exists beside it
    status_vals = {
        c.value
        for r in m.rules
        for c in r.conditions
        if c.attr == "l_linestatus"
    }
    if status_vals:
        assert Tr.MISSING_CATEGORY in status_vals


def test_train_clean_data_identical_under_both_policies(spark):
    """With no nulls present the policy must be a no-op: same model,
    rule for rule, as the pre-policy trainer."""
    from c4_5decisiontreebasedonmapreduce_spark import registry as RG

    df = RG.lineitem_training(spark, "/root/testdata/sf0.001")
    a = Tr.train(df, RG.LINEITEM_TRAINING_SCHEMA, max_depth=4, min_rows=50)
    b = Tr.train(
        df,
        RG.LINEITEM_TRAINING_SCHEMA,
        max_depth=4,
        min_rows=50,
        nulls="missing",
    )
    assert a.rules == b.rules


def test_train_null_label_always_rejected(spark):
    df, schema = _poisoned(spark)
    df = df.withColumn(
        schema.label,
        F.when(F.rand(3) < 0.02, None).otherwise(F.col(schema.label)),
    )
    with pytest.raises(ValueError, match="NULL label"):
        Tr.train(df, schema, max_depth=3, nulls="missing")


def test_train_all_null_numeric_rejected(spark):
    df = spark.createDataFrame(
        [("a", None, "yes"), ("b", None, "no")] * 10,
        "f1 string, f2 double, lab string",
    )
    with pytest.raises(ValueError, match="entirely NULL"):
        Tr.train(df, SCHEMA_2F, max_depth=3, nulls="missing")


def test_corpus_report_counts_cross_source_dups(spark):
    """The exact-dup count must be GLOBAL: two identical documents in
    DIFFERENT sources are duplicates of each other, and each source's
    report row counts its member — a per-source fingerprint rollup
    would miss exactly this (the mirror-site case). Also pins that
    normalization (case/whitespace) participates in the fingerprint."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import (
        pipeline as PL,
    )

    d = spark.createDataFrame(
        [
            (1, "the quick brown fox", "src_a"),
            (2, "The  Quick   Brown Fox", "src_b"),  # same after norm
            (3, "совершенно другой текст", "src_a"),
            (4, "unique english content here", "src_b"),
            (5, None, "src_a"),  # NULL text must NOT vanish (it
            (6, "", "src_a"),    # fingerprints as '' and dups doc 6)
        ],
        "doc_id long, text string, source string",
    )
    rows = {r.source: r for r in PL.corpus_report(spark, "", d=d).collect()}
    # cross-source pair (1, 2) + the null/empty pair (5, 6) in src_a
    assert rows["src_a"].n_exact_dup == 3  # docs 1, 5, 6
    assert rows["src_b"].n_exact_dup == 1  # doc 2 (dups doc 1)
    assert rows["src_a"].n_docs == 4 and rows["src_b"].n_docs == 2
    assert rows["src_a"].n_en + rows["src_b"].n_en >= 1
