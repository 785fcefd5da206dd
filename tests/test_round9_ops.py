"""Semantic pins for the round-9 second wave: TPC-H shape queries
(oracle-graded in test_oracle_parity; here, the properties an oracle
can't see), sliding-window chunking, the deterministic train/eval
split, and DSIR importance weighting."""

import pytest
from pyspark.sql import functions as F

from c4_5decisiontreebasedonmapreduce_spark import registry
from c4_5decisiontreebasedonmapreduce_spark.operators import chunking as CH
from c4_5decisiontreebasedonmapreduce_spark.operators import sampling as SMP
from c4_5decisiontreebasedonmapreduce_spark.operators.text import (
    docs,
    tokens_col,
)

QUERIES = registry.queries()


# -- chunking ----------------------------------------------------------------


def test_chunks_reconstruct_token_stream(spark, sf_small):
    """Lossless coverage: concatenating the first `stride` tokens of
    every chunk except the last, plus the whole last chunk, must equal
    the document's full token stream — no token lost, none duplicated
    beyond the declared overlap."""
    chunks = CH.chunk_documents(spark, sf_small).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    originals = {
        r.doc_id: r.toks
        for r in docs(spark, sf_small)
        .select("doc_id", tokens_col(F.col("text")).alias("toks"))
        .collect()
    }
    n_docs_with_tokens = sum(1 for t in originals.values() if t)
    assert len(by_doc) == n_docs_with_tokens
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_id)
        # chunk ids are dense from 0; starts are stride-spaced
        assert [r.chunk_id for r in rows] == list(range(len(rows)))
        assert all(
            r.chunk_start == i * CH.CHUNK_STRIDE for i, r in enumerate(rows)
        )
        rebuilt = []
        for r in rows[:-1]:
            rebuilt.extend(r.chunk_text.split(" ")[: CH.CHUNK_STRIDE])
        rebuilt.extend(rows[-1].chunk_text.split(" "))
        assert rebuilt == originals[doc_id], doc_id


def test_chunk_sizes_and_counts(spark, sf_small):
    """Every chunk has between 1 and CHUNK_SIZE tokens; n_chunk_tokens
    matches the actual text; all but per-doc-last chunks that start
    within [n - size, n) are exactly full."""
    bad = (
        CH.chunk_documents(spark, sf_small)
        .where(
            (F.col("n_chunk_tokens") < 1)
            | (F.col("n_chunk_tokens") > CH.CHUNK_SIZE)
            | (
                F.size(F.split(F.col("chunk_text"), " "))
                != F.col("n_chunk_tokens")
            )
        )
        .count()
    )
    assert bad == 0


def test_chunk_plan_is_shuffle_free(spark, sf_small):
    """Chunking is one projection: no Exchange anywhere in the plan."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        CH.chunk_documents(spark, sf_small).explain("formatted")
    p = buf.getvalue()
    assert "Exchange" not in p, p
    assert "CartesianProduct" not in p, p


# -- train/eval split ----------------------------------------------------------


def test_split_fractions_per_stratum(spark, sf_oracle):
    """Each source's split fractions track the 90/5/5 bounds (binomial
    tolerance at 25-docs-per-source granularity is wide; assert the
    global corpus tightly and every stratum loosely)."""
    df = SMP.split_train_eval(spark, sf_oracle)
    total = df.count()
    by_split = {
        r.split: r.c
        for r in df.groupBy("split").agg(F.count("*").alias("c")).collect()
    }
    assert set(by_split) <= {"train", "validation", "test"}
    assert by_split["train"] / total == pytest.approx(0.90, abs=0.05)
    # every document appears exactly once (exhaustive, disjoint)
    assert sum(by_split.values()) == total
    per_source = (
        df.groupBy("source")
        .agg(
            F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias(
                "tr"
            ),
            F.count("*").alias("n"),
        )
        .collect()
    )
    for r in per_source:
        assert r.tr / r.n >= 0.6, (r.source, r.tr, r.n)


def test_split_append_stable(spark, sf_small):
    """Assignments depend only on doc_id: computing the split over any
    subset leaves every row's assignment unchanged — the corpus can
    grow without yesterday's test docs leaking into today's train."""
    full = {
        r.doc_id: r.split
        for r in SMP.split_train_eval(spark, sf_small).collect()
    }
    # simulate a *smaller* historical corpus: even doc_ids only
    sub = (
        SMP.split_train_eval(spark, sf_small)
        .where(F.col("doc_id") % 2 == 0)
        .collect()
    )
    assert sub, "subset must be non-empty"
    for r in sub:
        assert full[r.doc_id] == r.split


# -- DSIR ----------------------------------------------------------------------


def test_dsir_separates_target_language(spark, sf_oracle):
    """On the driver corpus the lang tags share ONE vocabulary, so only
    the self-selection direction is guaranteed (target docs contributed
    their own tokens to the target counts): target mean ≥ raw mean."""
    df = SMP.sample_dsir(spark, sf_oracle)
    means = {
        r.is_t: r.m
        for r in df.groupBy(
            (F.col("lang") == SMP.DSIR_TARGET_LANG).alias("is_t")
        )
        .agg(F.avg("dsir_logweight").alias("m"))
        .collect()
    }
    assert means[True] > means[False], means


def test_dsir_separates_distinct_vocabularies(spark, sf_small):
    """The real signal test, on an injected corpus whose target slice
    uses a DISJOINT vocabulary: every target document must outscore
    every non-target document by a wide margin — the hashed unigram
    LLR recovers the domain."""
    rows = []
    for i in range(40):
        if i % 2 == 0:
            text = f"alpha beta gamma delta epsilon tok{i % 5}"
            lang = "en"
        else:
            text = f"uno dos tres cuatro cinco tok{i % 5}"
            lang = "es"
        rows.append((i, text, lang, "srcX", len(text)))
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = SMP.sample_dsir(spark, sf_small, d=d).collect()
    t_scores = [r.dsir_logweight for r in got if r.lang == "en"]
    o_scores = [r.dsir_logweight for r in got if r.lang != "en"]
    assert min(t_scores) > max(o_scores) + 1.0, (t_scores, o_scores)


def test_dsir_weight_is_mean_token_llr(spark, sf_small):
    """Hand-recompute one document's weight in Python from the corpus
    bucket counts (independent arithmetic path, same add-one smoothing
    formula from the DSIR paper)."""
    import hashlib
    import math

    rows = docs(spark, sf_small).select("doc_id", "lang", "text").collect()
    B = SMP.DSIR_BUCKETS

    def toks(text):
        import re

        return [t for t in re.split("[^a-z0-9]+", text.lower()) if t]

    def bucket(t):
        h = hashlib.md5((SMP._DSIR_SEED + t).encode()).hexdigest()
        return int(h[:15], 16) % B

    cr, ct = {}, {}
    for r in rows:
        for t in toks(r.text or ""):
            b = bucket(t)
            cr[b] = cr.get(b, 0) + 1
            if r.lang == SMP.DSIR_TARGET_LANG:
                ct[b] = ct.get(b, 0) + 1
    nr, nt = sum(cr.values()), sum(ct.values())
    target = next(r for r in rows if toks(r.text or ""))
    llrs = [
        math.log((ct.get(bucket(t), 0) + 1) / (nt + B))
        - math.log((cr[bucket(t)] + 1) / (nr + B))
        for t in toks(target.text or "")
    ]
    expected = sum(llrs) / len(llrs)
    got = (
        SMP.sample_dsir(spark, sf_small)
        .where(F.col("doc_id") == target.doc_id)
        .collect()[0]
        .dsir_logweight
    )
    assert got == pytest.approx(expected, abs=1e-5)


def test_dsir_plan_no_cartesian(spark, sf_small):
    """The only non-equi join allowed is the 1-row totals broadcast;
    the bucket-table join onto the token stream must be a broadcast
    hash join (B=1024 rows), never a shuffle of the exploded corpus."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        SMP.sample_dsir(spark, sf_small).explain("formatted")
    p = buf.getvalue()
    assert "CartesianProduct" not in p, p
    assert "BroadcastHashJoin" in p, p


# -- Bloom-prefiltered decontamination ----------------------------------------


def test_bloom_decontaminate_equals_exact(spark, sf_oracle):
    """No false negatives by construction → output bit-identical to the
    exact op at the driver's grading scale."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import dedup as D

    a = sorted(map(tuple, D.decontaminate_bloom(spark, sf_oracle).collect()))
    b = sorted(map(tuple, D.decontaminate(spark, sf_oracle).collect()))
    assert a == b and len(a) > 0


def test_bloom_prefilter_drops_most_rows_no_false_negatives(spark, sf_oracle):
    """The point of the bloom: most corpus shingle rows never reach the
    candidate exchange (≥ 50% dropped on the driver corpus; measured
    ~87%), and every shingle truly present in the benchmark set
    survives."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import dedup as D

    is_bench = F.col("doc_id") % D.DECONTAM_BENCH_MOD == D.DECONTAM_BENCH_REM
    sh = D._shingles_df(spark, sf_oracle).localCheckpoint()
    bench = sh.where(is_bench).select(
        F.col("doc_id").alias("bench_id"), "shingle"
    )
    corp = sh.where(~is_bench)
    bitmap = D.build_shingle_bloom(bench)
    kept = D._bloom_filter_rows(
        corp, "shingle", bitmap, D.BLOOM_M_BITS, D.BLOOM_K
    )
    n_corp, n_kept = corp.count(), kept.count()
    assert n_kept < n_corp * 0.5, (n_kept, n_corp)
    # no false negatives: shingles in bench all pass the filter
    truly = corp.join(
        bench.select("shingle").distinct(), "shingle", "left_semi"
    )
    missed = truly.join(kept, ["doc_id", "shingle"], "left_anti").count()
    assert missed == 0


def test_bloom_prefilter_is_codegen_predicate(spark, sf_oracle):
    """The prefilter is a plain filter predicate — no Python evaluation,
    no extra join for the membership test (the bitmap rides in as an
    array literal)."""
    import contextlib
    import io

    from c4_5decisiontreebasedonmapreduce_spark.operators import dedup as D

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        D.decontaminate_bloom(spark, sf_oracle).explain("formatted")
    p = buf.getvalue()
    assert "EvalPython" not in p, p
    assert "CartesianProduct" not in p, p


# -- fine-tuning pipeline ------------------------------------------------------


def test_finetuning_manifest_consistency(spark, sf_oracle):
    """The manifest must reconcile with its own stages recomputed
    standalone: kept docs = train docs at/above the train-mean DSIR
    weight; chunk token totals equal the kept docs' token counts
    (chunking is lossless in token count: overlap tokens are counted
    once per chunk, so sum(n_chunk_tokens) ≥ n_tokens with equality iff
    every doc fits one chunk — here we check the exact identity by
    recomputing chunk starts)."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import (
        chunking as CHK,
    )
    from c4_5decisiontreebasedonmapreduce_spark.operators import (
        pipeline as PL,
    )

    manifest = {
        r.source: r for r in PL.finetuning_pipeline(spark, sf_oracle).collect()
    }
    train = {
        r.doc_id
        for r in SMP.split_train_eval(spark, sf_oracle)
        .where(F.col("split") == "train")
        .collect()
    }
    scored = {
        r.doc_id: r.dsir_logweight
        for r in SMP.sample_dsir(spark, sf_oracle).collect()
        if r.doc_id in train
    }
    mu = float(sum(scored.values())) / len(scored)
    kept = {d for d, w in scored.items() if w >= mu}
    srcs = {
        r.doc_id: (r.source, r.toks)
        for r in docs(spark, sf_oracle)
        .select(
            "doc_id", "source", tokens_col(F.col("text")).alias("toks")
        )
        .collect()
    }
    expect = {}
    for d in kept:
        src, toks = srcs[d]
        n = len(toks)
        starts = list(range(0, n, CHK.CHUNK_STRIDE)) if n else []
        e = expect.setdefault(src, [0, 0, 0])
        e[0] += 1
        e[1] += len(starts)
        e[2] += sum(min(CHK.CHUNK_SIZE, n - s) for s in starts)
    assert set(manifest) == set(expect)
    for src, (nd, nc, nt) in expect.items():
        m = manifest[src]
        assert (m.n_docs, m.n_chunks, m.n_tokens) == (nd, nc, nt), src


def test_finetuning_pipeline_plan_clean(spark, sf_oracle):
    """No Python stages, no cartesian beyond the 1-row mean broadcast."""
    import contextlib
    import io

    from c4_5decisiontreebasedonmapreduce_spark.operators import (
        pipeline as PL,
    )

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        PL.finetuning_pipeline(spark, sf_oracle).explain("formatted")
    p = buf.getvalue()
    assert "EvalPython" not in p, p
    assert "CartesianProduct" not in p, p


# -- split leakage audit -------------------------------------------------------


def test_split_leakage_audit_matches_composition(spark, sf_oracle):
    """Recompute the cells by hand from the standalone pair and split
    ops: every near-dup pair lands in exactly one unordered cell, and
    cross-split cells carry is_leak."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import dedup as D

    split = {
        r.doc_id: r.split
        for r in SMP.split_train_eval(spark, sf_oracle).collect()
    }
    cells = {}
    for r in D.dedup_ngram_jaccard(spark, sf_oracle).collect():
        a, b = sorted((split[r.doc_a], split[r.doc_b]))
        c = cells.setdefault((a, b), [0, 0.0])
        c[0] += 1
        c[1] = max(c[1], r.jaccard)
    got = {
        (r.split_a, r.split_b): (r.n_pairs, r.max_jaccard, r.is_leak)
        for r in SMP.split_leakage_audit(spark, sf_oracle).collect()
    }
    assert set(got) == set(cells)
    assert sum(v[0] for v in got.values()) == sum(
        v[0] for v in cells.values()
    )
    for key, (n, mx) in cells.items():
        gn, gmx, leak = got[key]
        assert (gn, gmx) == (n, mx), key
        assert leak == (key[0] != key[1]), key


# -- hypothesis fuzz: chunking vs a pure-Python reference ----------------------


def _py_tokens(text):
    import re

    return [t for t in re.split("[^a-z0-9]+", (text or "").lower()) if t]


def _py_chunks(text, size, stride):
    toks = _py_tokens(text)
    return [
        (
            s // stride,
            s,
            min(size, len(toks) - s),
            " ".join(toks[s : s + size]),
        )
        for s in range(0, len(toks), stride)
    ]


def test_chunking_fuzz_matches_python_reference(spark):
    """Random texts — unicode, punctuation runs, empty, whitespace-only,
    shorter/equal/longer than one window — chunked identically to the
    pure-Python reference (same shared tokenizer convention)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from c4_5decisiontreebasedonmapreduce_spark.operators import (
        chunking as CHK,
    )

    texts_strategy = st.lists(
        st.text(alphabet=" aB9.!\n\tç—", max_size=400), min_size=1, max_size=5
    )

    @settings(max_examples=8, deadline=None)
    @given(texts_strategy)
    def run(texts):
        rows = [
            (i, t, "en", "fz", len(t)) for i, t in enumerate(texts)
        ]
        d = spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        )
        got = {}
        for r in CHK.chunks_from(d, size=7, stride=5).collect():
            got.setdefault(r.doc_id, []).append(
                (r.chunk_id, r.chunk_start, r.n_chunk_tokens, r.chunk_text)
            )
        for i, t in enumerate(texts):
            expect = _py_chunks(t, 7, 5)
            assert sorted(got.get(i, [])) == sorted(expect), (i, t)

    run()


# -- persisted DSIR model -------------------------------------------------------


def test_dsir_persisted_equals_in_memory(spark, sf_oracle, tmp_path):
    """The persisted model path scores the batch identically to the
    in-memory twin, and the scoring plan's only parquet reads are the
    batch documents + the B-row model table (the corpus never appears)."""
    import contextlib
    import io

    SMP.write_dsir_model(
        spark, sf_oracle, table="dsir_llr_test", path=str(tmp_path / "m")
    )
    mem = sorted(
        map(tuple, SMP.sample_dsir_persisted(spark, sf_oracle).collect())
    )
    per = SMP.sample_dsir_persisted(spark, sf_oracle, table="dsir_llr_test")
    assert sorted(map(tuple, per.collect())) == mem
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        per.explain("formatted")
    p = buf.getvalue()
    scans = [
        l for l in p.splitlines() if "Location" in l and "parquet" in l
    ]
    assert all(
        "documents.parquet" in l or "dsir_llr" in l or "/m" in l
        for l in scans
    ), scans
    assert "BroadcastHashJoin" in p, p


# -- TSV ingest audit ------------------------------------------------------------


def test_tsv_audit_classifies_all_malformed_categories(spark):
    """Inject one line per malformation the reference parses silently
    (SURVEY §1.1): collapsed empty field (doubled tab — the reference's
    split('\\t+') swallows it and shifts fields left), short row, long
    row, numeric garbage in a well-shaped row; plus clean lines."""
    from c4_5decisiontreebasedonmapreduce_spark.sources import tsv as TSV

    sch = TSV.parse_attributes_lines(
        [
            "outlook:string:sunny,overcast,rainy",
            "temperature:numeric",
            "humidity:numeric",
            "windy:string:true,false",
            "play:yes,no",
        ]
    )
    lines = [
        "sunny\t85.0\t85.0\tfalse\tno",        # exact
        "rainy\t70.0\t96.0\ttrue\tyes",        # exact
        "sunny\t\t90.0\ttrue\tno\textra",      # doubled tab: runs==5, raw==6
        "overcast\t83.0\t86.0\tfalse",         # short (4 fields)
        "rainy\t68.0\t80.0\tfalse\tyes\tzz",   # long (6 raw, 6 runs)
        "sunny\tNaNo\t95.0\tfalse\tno",        # numeric garbage, shape ok
        # trailing tab: raw==5 but Java split("\t+") limit-0 DROPS the
        # trailing empty — the reference sees 4 fields, a short row
        "sunny\t85.0\t85.0\tfalse\t",
    ]
    d = spark.createDataFrame([(x,) for x in lines], "value string")
    got = {
        r.category: r.n_rows
        for r in TSV.tsv_ingest_audit(spark, "", sch, d=d).collect()
    }
    assert got == {
        "exact": 2,
        "collapsed_empty_fields": 1,
        "short_row": 2,
        "long_row": 1,
        "numeric_parse_failures": 1,
    }, got


def test_tsv_audit_fuzz_matches_python_reference(spark):
    """Random tab patterns (leading/trailing/doubled tabs, numeric
    garbage, empty-ish lines) classified identically to a pure-Python
    reference implementing the same rules."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from c4_5decisiontreebasedonmapreduce_spark.sources import tsv as TSV

    sch = TSV.parse_attributes_lines(
        [
            "a:string:x,y",
            "b:numeric",
            "c:yes,no",
        ]
    )
    n = 3

    def java_split_runs(line: str) -> list[str]:
        # Java String.split("\t+") limit 0: trailing empty strings are
        # removed; the empty string still yields [""]
        if line == "":
            return [""]
        r = re.split(r"\t+", line)
        while r and r[-1] == "":
            r.pop()
        return r

    def py_category(line: str) -> str:
        raw = line.split("\t")
        runs = java_split_runs(line)
        def num_ok() -> bool:
            try:
                float(runs[1])
                return True
            except (ValueError, IndexError):
                return False
        aligned = len(runs) == n and len(raw) == n
        if aligned and not num_ok():
            return "numeric_parse_failures"
        if aligned:
            return "exact"
        if len(runs) == n and len(raw) > n:
            return "collapsed_empty_fields"
        if len(runs) < n:
            return "short_row"
        return "long_row"

    lines_strategy = st.lists(
        st.text(alphabet="xy1.\te", min_size=1, max_size=20),
        min_size=1,
        max_size=12,
    )

    @settings(max_examples=8, deadline=None)
    @given(lines_strategy)
    def run(lines):
        d = spark.createDataFrame([(x,) for x in lines], "value string")
        got = {
            r.category: r.n_rows
            for r in TSV.tsv_ingest_audit(spark, "", sch, d=d).collect()
        }
        expect = {}
        for ln in lines:
            c = py_category(ln)
            expect[c] = expect.get(c, 0) + 1
        assert got == expect, (lines, got, expect)

    run()
