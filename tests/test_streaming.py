"""Structured Streaming semantics beyond the synchronous oracle twins:
multi-batch incremental processing, watermark-driven late-data handling,
and the stateful operator's cross-batch state."""

import os

import pytest
from pyspark.sql import functions as F

from c4_5decisiontreebasedonmapreduce_spark.sources.parquet import load_table



@pytest.fixture()
def staged_events(tmp_path, spark, sf_small):
    """events split into two files: batch 1 = on-time rows, batch 2 =
    rows more than 3 hours older than batch 1's max timestamp (late)."""
    ev = load_table(spark, sf_small, "events")
    cut = ev.agg(F.max("ts")).collect()[0][0]
    late = ev.where(F.col("ts") < F.lit(cut) - F.expr("INTERVAL 3 HOURS"))
    ontime = ev.where(F.col("ts") >= F.lit(cut) - F.expr("INTERVAL 3 HOURS"))
    d = tmp_path / "stream"
    os.makedirs(d)
    ontime.coalesce(1).write.parquet(str(d / "batch1"))
    late.coalesce(1).write.parquet(str(d / "batch2"))
    # flatten: file source wants files in one dir; order micro-batches by
    # mtime (FileStreamSource sorts by timestamp) so the late file
    # genuinely arrives AFTER the on-time one
    import time

    now = time.time()
    for i, sub in enumerate(("batch1", "batch2")):
        for f in sorted(os.listdir(d / sub)):
            if f.endswith(".parquet"):
                dst = d / f"{sub}.parquet"
                os.rename(d / sub / f, dst)
                os.utime(dst, (now - 3600 + i * 1800, now - 3600 + i * 1800))
    return str(d), ev.schema, ontime, late


def test_watermark_bounds_state(spark, staged_events):
    """The watermark CONTRACT is bounded state: windows whose end falls
    below the advanced watermark are evicted (emitted, in append mode)
    instead of accumulating forever. After draining a recent batch (which
    advances the watermark near the stream's max event time) and an old
    batch, retained state must cover only the watermark horizon — not the
    month of event-time the data spans."""
    d, schema, ontime, late = staged_events
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(d)
        .withWatermark("ts", "1 hour")
    )
    agg = stream.groupBy(F.window("ts", "1 hour").alias("w")).agg(
        F.count("*").alias("n")
    )
    name = "late_test_out"
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        progress = [p for p in q.recentProgress if p.get("stateOperators")]
    finally:
        q.stop()
    assert progress, "expected stateful progress entries"
    final_state_rows = progress[-1]["stateOperators"][0]["numRowsTotal"]
    total_windows = (
        ontime.unionByName(late)
        .select(F.window("ts", "1 hour"))
        .distinct()
        .count()
    )
    # without eviction the state would hold every touched window (~500 at
    # sf0.001); with a 1-hour watermark + 1-hour windows it may retain
    # only the horizon's worth
    assert final_state_rows <= 3, (final_state_rows, total_windows)
    assert total_windows > 100

    # deterministic eviction pin (VERDICT r5 item 7). Observed Spark 4.1
    # microbatch semantics: the late-event FILTER uses the watermark from
    # one batch behind (batch N filters with batch N-1's input watermark)
    # while EVICTION uses the current one — so the late batch, arriving
    # immediately after the watermark-advancing batch, is aggregated and
    # evicted-with-emission in the same microbatch rather than dropped
    # (a third, later-arriving batch WOULD be dropped). The emitted set
    # is therefore EXACTLY every touched window with end <= wm carrying
    # its complete cross-batch count, and the retained state exactly the
    # windows still above wm — both computable from the fixture.
    from datetime import timedelta

    allrows = ontime.unionByName(late)
    wm = ontime.agg(F.max("ts")).collect()[0][0] - timedelta(hours=1)
    expected = (
        allrows.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .where(F.col("w.end") <= F.lit(wm))
    )
    got = sorted(
        (r["w"]["start"], r["w"]["end"], r["n"])
        for r in spark.table(name).collect()
    )
    want = sorted(
        (r["w"]["start"], r["w"]["end"], r["n"])
        for r in expected.collect()
    )
    assert got == want
    assert final_state_rows == (
        allrows.select(F.window("ts", "1 hour").alias("w"))
        .where(F.col("w.end") > F.lit(wm))
        .distinct()
        .count()
    )


def test_streaming_two_batches_incremental(spark, staged_events):
    """Complete-mode aggregation over two micro-batches equals the batch
    aggregate over all rows (late data included when no watermark)."""
    d, schema, ontime, late = staged_events
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(d)
    )
    agg = stream.groupBy("event_type").agg(F.count("*").alias("n"))
    name = "two_batch_out"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["event_type"]: r["n"] for r in spark.table(name).collect()}
    want = {
        r["event_type"]: r["n"]
        for r in ontime.unionByName(late)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_stream_join_emits_across_batches(spark, sf_oracle, tmp_path):
    """VERDICT r6 item 4: the stream-stream click→purchase join across
    MULTIPLE micro-batches. Staging every click in file 1 and every
    purchase in file 2 forces each match to straddle a micro-batch
    boundary: batch 0 may only BUFFER clicks into join state, batch 1
    delivers the purchases, so every emitted row proves cross-batch
    state lookup. Then the watermark contract: the trailing no-data
    batch must evict both sides down to exactly the horizon — clicks
    still able to match a future purchase (click_ts + 30 min ≥ wm) and
    purchases still able to match a future click (purchase_ts ≥ wm),
    with wm = min(max click_ts, max purchase_ts) − 1 h (the global
    min-policy watermark over both sides' 1-hour delays)."""
    import time
    from datetime import timedelta

    from c4_5decisiontreebasedonmapreduce_spark.streaming import windows as SW

    ev = load_table(spark, sf_oracle, "events")
    d = tmp_path / "join_stream"
    os.makedirs(d)
    ev.where(F.col("event_type") != "purchase").coalesce(1).write.parquet(
        str(d / "b1")
    )
    ev.where(F.col("event_type") == "purchase").coalesce(1).write.parquet(
        str(d / "b2")
    )
    now = time.time()
    for i, sub in enumerate(("b1", "b2")):
        for f in sorted(os.listdir(d / sub)):
            if f.endswith(".parquet"):
                dst = d / f"{sub}.parquet"
                os.rename(d / sub / f, dst)
                os.utime(dst, (now - 3600 + i * 1800,) * 2)

    def src():
        return (
            spark.readStream.format("parquet")
            .schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .load(str(d))
        )

    name = "join_batches_out"
    q = (
        SW.click_purchase_joined(src(), src())
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        progress = list(q.recentProgress)
    finally:
        q.stop()

    # every match emitted exactly once, equal to the batch plan over the
    # union of all files (click_purchase_joined runs unchanged on batch
    # inputs — watermarks are a no-op there)
    got = sorted(tuple(r) for r in spark.table(name).collect())
    want = sorted(tuple(r) for r in SW.click_purchase_joined(ev, ev).collect())
    assert got == want and len(got) > 0

    # emission is genuinely cross-batch: the clicks-only first batch
    # emits nothing; a later batch emits every row
    outs = [p["sink"]["numOutputRows"] for p in progress]
    assert outs[0] == 0
    assert sum(outs[1:]) == len(got)

    # bounded state: the final (no-data) batch evicts both sides down to
    # exactly the watermark horizon, computed from the fixture
    wm = min(
        ev.where(F.col("event_type") == "click").agg(F.max("ts")).collect()[0][0],
        ev.where(F.col("event_type") == "purchase").agg(F.max("ts")).collect()[0][0],
    ) - timedelta(hours=1)
    clicks_live = (
        ev.where(F.col("event_type") == "click")
        .where(F.col("ts") + F.expr("INTERVAL 30 MINUTES") >= F.lit(wm))
        .count()
    )
    purchases_live = (
        ev.where(F.col("event_type") == "purchase")
        .where(F.col("ts") >= F.lit(wm))
        .count()
    )
    final_state = [p for p in progress if p.get("stateOperators")][-1][
        "stateOperators"
    ][0]["numRowsTotal"]
    assert final_state == clicks_live + purchases_live
    # non-vacuous: far less than the buffered peak (every click+purchase)
    assert final_state < 0.01 * (
        ev.where(F.col("event_type").isin("click", "purchase")).count()
    )


def test_parquet_sink_exactly_once_restart(spark, sf_small, tmp_path):
    """The production file-sink path: append-mode tumbling agg committed
    to parquet with a checkpoint. (1) the committed set is exactly the
    closed-window slice of the batch aggregate — every window with
    end <= final watermark (max event time − 1 h) and its complete
    counts; (2) RESTARTING the query against the same checkpoint and
    source commits nothing new (offset WAL + file commit log = exactly
    once), so the re-read is byte-identical."""
    from datetime import timedelta

    from c4_5decisiontreebasedonmapreduce_spark.streaming import windows as SW

    out_dir = str(tmp_path / "sink")
    first = SW.streaming_sink_parquet(spark, sf_small, out_dir=out_dir)
    got = sorted(tuple(r) for r in first.collect())

    ev = load_table(spark, sf_small, "events")
    wm = ev.agg(F.max("ts")).collect()[0][0] - timedelta(hours=1)
    want = sorted(
        tuple(r)
        for r in SW._tumbling_agg(ev)
        .where(
            F.col("window_start") + F.expr("INTERVAL 1 HOUR") <= F.lit(wm)
        )
        .collect()
    )
    assert got == want and len(got) > 50
    # some windows stay open past the watermark: append mode must NOT
    # have flushed them (that would be emitting unfinished aggregates)
    assert len(got) < SW._tumbling_agg(ev).count()

    # restart with the same checkpoint + (stable) staged source: the
    # offset log shows everything committed, so the restart ingests
    # ZERO rows (no re-aggregation, no state double-count) and the
    # re-read is byte-identical
    import os

    sources_log = os.path.join(out_dir, "ckpt", "sources", "0")
    offsets_before = sorted(os.listdir(sources_log))
    again = SW.streaming_sink_parquet(spark, sf_small, out_dir=out_dir)
    assert sorted(tuple(r) for r in again.collect()) == got
    assert sorted(os.listdir(sources_log)) == offsets_before


def test_upsert_sink_matches_batch_and_restart(spark, sf_small, tmp_path):
    """The update-mode upsert sink (r8): draining the source leaves the
    state table holding EVERY window's complete aggregate (= the batch
    tumbling aggregate — no closed-window wait, unlike the append
    sink), and restarting against the same checkpoint with no new data
    commits no new batch and leaves the state byte-identical."""
    from c4_5decisiontreebasedonmapreduce_spark.streaming import (
        windows as SW,
    )

    out_dir = str(tmp_path / "upsert")
    first = SW.streaming_sink_upsert(spark, sf_small, out_dir=out_dir)
    got = sorted(tuple(r) for r in first.collect())
    want = sorted(
        tuple(r)
        for r in SW._tumbling_agg(load_table(spark, sf_small, "events"))
        .collect()
    )
    assert got == want and len(got) > 50
    commits = os.path.join(out_dir, "state", "_commits")
    before = sorted(os.listdir(commits))
    again = SW.streaming_sink_upsert(spark, sf_small, out_dir=out_dir)
    assert sorted(tuple(r) for r in again.collect()) == got
    assert sorted(os.listdir(commits)) == before  # nothing re-committed


def test_upsert_merge_multibatch_idempotent(spark, sf_small, tmp_path):
    """_upsert_batch's MERGE contract across micro-batches: a window
    updated by BOTH batches ends at its full aggregate (replace, not
    append); a re-delivered batch id is skipped via the commit marker;
    and even re-applying a batch with its marker removed reproduces
    byte-identical state (the keyed replace is deterministic) — the
    at-least-once-to-exactly-once argument, pinned."""
    from c4_5decisiontreebasedonmapreduce_spark.streaming import (
        windows as SW,
    )

    ev = load_table(spark, sf_small, "events")
    state = str(tmp_path / "state")
    agg_all = SW._tumbling_agg(ev)
    # time-ordered halves: the cut lands inside some window, so that
    # window's aggregate is genuinely built up across the two merges
    cut = ev.approxQuantile("value", [0.5], 0.0)[0]
    h1 = SW._tumbling_agg(ev.where(F.col("value") <= cut))
    both = SW._tumbling_agg(ev)  # batch 2 = CURRENT aggregate per update mode
    SW._upsert_batch(h1, 0, state)
    partial = {
        (r[0], r[1]): r[2]
        for r in spark.read.parquet(state).collect()
    }
    SW._upsert_batch(both, 1, state)
    read_state = lambda: sorted(  # noqa: E731
        tuple(r)
        for r in spark.read.parquet(state)
        .select(*agg_all.columns)
        .collect()
    )
    want = sorted(tuple(r) for r in agg_all.collect())
    final = read_state()
    assert final == want
    # non-vacuity: some window's batch-1 value differed from its final
    # value, so the second merge REPLACED rather than ignored/appended
    assert any(
        partial.get((w, t)) not in (None, n) for (w, t, n, _s) in final
    )
    # re-delivery with the marker present: skipped outright
    SW._upsert_batch(h1, 0, state)
    assert read_state() == want
    # marker removed: the merge re-runs against already-merged state,
    # and the deterministic keyed replace reproduces identical rows
    os.remove(os.path.join(state, "_commits", "1"))
    SW._upsert_batch(both, 1, state)
    assert read_state() == want


def test_streaming_decontaminate_equals_batch_twin(spark, sf_small, tmp_path):
    """The stream-static scrub's drained state must equal the batch
    computation of shared-shingle counts — and feeding the STATIC side
    from the persisted bucketed benchmark table must change nothing."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import dedup as D
    from c4_5decisiontreebasedonmapreduce_spark.streaming import windows as SW

    is_bench = (
        F.col("doc_id") % D.DECONTAM_BENCH_MOD == D.DECONTAM_BENCH_REM
    )
    sh = D._shingles_df(spark, sf_small)
    batch = (
        sh.where(~is_bench)
        .join(
            sh.where(is_bench).select(
                F.col("doc_id").alias("bench_id"), "shingle"
            ),
            "shingle",
        )
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("common"))
        .where(F.col("common") >= SW.STREAM_DECONTAM_MIN_COMMON)
    )
    expected = sorted(map(tuple, batch.collect()))
    assert len(expected) > 0
    got = sorted(
        map(tuple, SW.streaming_decontaminate(spark, sf_small).collect())
    )
    assert got == expected

    table = "bench_shingles_stream_test"
    bench = D.write_benchmark_shingles(
        spark, sf_small, table=table, path=str(tmp_path / "bs")
    )
    try:
        got2 = sorted(
            map(
                tuple,
                SW.streaming_decontaminate(
                    spark, sf_small, bench_shingles=bench
                ).collect(),
            )
        )
        assert got2 == expected
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_streaming_decontaminate_state_survives_batches(
    spark, sf_small, tmp_path
):
    """Two ingest waves (documents split into two files, one micro-batch
    each): the complete-mode state table must still carry wave-1's
    flagged pairs after wave 2 processes, and the union must equal the
    single-batch drain — cross-batch state retention for the scrub."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import dedup as D
    from c4_5decisiontreebasedonmapreduce_spark.streaming import windows as SW

    single = sorted(
        map(tuple, SW.streaming_decontaminate(spark, sf_small).collect())
    )
    flagged_ids = sorted({r[0] for r in single})
    assert len(flagged_ids) >= 2  # need flagged docs in BOTH waves
    cut = flagged_ids[0]  # wave 1 gets the first flagged doc, wave 2 the rest

    docs = load_table(spark, sf_small, "documents")
    src = str(tmp_path / "waves")
    docs.where(F.col("doc_id") <= cut).coalesce(1).write.parquet(src)
    docs.where(F.col("doc_id") > cut).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    import glob

    assert len(glob.glob(f"{src}/part-*.parquet")) == 2  # two micro-batches

    staged = sorted(
        map(
            tuple,
            SW.streaming_decontaminate(
                spark, sf_small, source_dir=src
            ).collect(),
        )
    )
    assert staged == single
    # wave-1's flagged doc is still in the final state even though wave
    # 2 was the last batch processed, and wave 2 contributed too
    assert any(r[0] <= cut for r in staged)
    assert any(r[0] > cut for r in staged)


def test_streaming_quality_gate_equals_batch_gate(spark, sf_small):
    """The ingest-time gate's drained cells equal the batch scoring
    rolled up directly (no dedup — the documented difference from
    pipeline_curation), and the cell totals conserve the corpus."""
    from pyspark.sql import functions as F

    from c4_5decisiontreebasedonmapreduce_spark.operators.pipeline import (
        QUALITY_GATE,
        _scored_cols,
    )
    from c4_5decisiontreebasedonmapreduce_spark.operators.text import docs
    from c4_5decisiontreebasedonmapreduce_spark.streaming import (
        windows as SW,
    )

    got = sorted(
        map(tuple, SW.streaming_quality_gate(spark, sf_small).collect())
    )
    _, n_tokens, quality, lang_pred = _scored_cols()
    want = sorted(
        map(
            tuple,
            docs(spark, sf_small)
            .select(
                lang_pred.alias("lang_pred"),
                (quality >= QUALITY_GATE).alias("passed"),
                n_tokens.alias("n_tokens"),
            )
            .groupBy("lang_pred", "passed")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("n_tokens").cast("long").alias("total_tokens"),
            )
            .collect(),
        )
    )
    assert got == want
    assert sum(r[2] for r in got) == docs(spark, sf_small).count()


def test_streaming_pack_ingest_equals_batch_and_redelivery_idempotent(
    spark, sf_small, tmp_path
):
    """The continuous packing loop: (a) the drained union of all
    micro-batches' assignment rows equals the batch pack_assignments
    over the whole corpus, hash-exact, including windows straddling
    batch boundaries; (b) re-delivering a committed batch — marker
    removed, simulating an at-least-once restart — recomputes from the
    SAME versioned pre-state and leaves output and state byte-equal."""
    import os

    from c4_5decisiontreebasedonmapreduce_spark.operators import packing as PK
    from c4_5decisiontreebasedonmapreduce_spark.streaming import (
        windows as SW,
    )

    work = str(tmp_path / "ingest")
    got = sorted(
        map(
            tuple,
            SW.streaming_pack_ingest(spark, sf_small, work_dir=work).collect(),
        )
    )
    want = sorted(
        map(tuple, PK.pack_assignments_query(spark, sf_small).collect())
    )
    assert got == want and len(got) > 0
    # batches really were split (state versions v0..v2 exist)
    state_dir = os.path.join(work, "state")
    assert {f"v{i}" for i in range(3)} <= set(os.listdir(state_dir))
    # re-deliver batch 1: drop its marker, re-run the foreachBatch body
    # on the same staged file — output rows and post-state must not move
    out_dir = os.path.join(work, "out")
    before_rows = sorted(
        map(
            tuple,
            spark.read.parquet(os.path.join(out_dir, "batch=1")).collect(),
        )
    )
    before_state = sorted(
        map(
            tuple,
            spark.read.parquet(os.path.join(state_dir, "v1")).collect(),
        )
    )
    os.remove(os.path.join(out_dir, "_commits", "1"))
    batch1 = spark.read.parquet(os.path.join(work, "flat", "001.parquet"))
    SW._pack_ingest_batch(
        batch1, 1, state_dir, out_dir, PK.SEQ_LEN, PK.N_SHARDS
    )
    after_rows = sorted(
        map(
            tuple,
            spark.read.parquet(os.path.join(out_dir, "batch=1")).collect(),
        )
    )
    after_state = sorted(
        map(
            tuple,
            spark.read.parquet(os.path.join(state_dir, "v1")).collect(),
        )
    )
    assert after_rows == before_rows
    assert after_state == before_state


def test_streaming_pack_ingest_corpus_smaller_than_batches(
    spark, tmp_path
):
    """A corpus with fewer documents than n_batches must yield fewer
    (never overlapping) micro-batches — the bounds clamp regression:
    before it, the tail doc was delivered twice, double-counting its
    tokens in shard state."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import packing as PK
    from c4_5decisiontreebasedonmapreduce_spark.streaming import (
        windows as SW,
    )

    sf = str(tmp_path / "tiny")
    spark.createDataFrame(
        [
            (1, "a b c d e", "en", "s", 9),
            (2, "f g h i j k", "en", "s", 11),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(sf + "/documents.parquet")
    got = sorted(
        map(
            tuple,
            SW.streaming_pack_ingest(
                spark, sf, n_batches=3, work_dir=str(tmp_path / "w")
            ).collect(),
        )
    )
    want = sorted(map(tuple, PK.pack_assignments_query(spark, sf).collect()))
    assert got == want
    # no duplicate (doc, chunk) assignment rows
    assert len(got) == len({(r[2], r[1]) for r in got})


def test_streaming_pack_ingest_state_compaction(spark, sf_small, tmp_path):
    """With keep_versions=2 the state directory holds only the last two
    versions after the run, the drained result still equals the batch
    pack, the LAST batch remains re-deliverable (reads the retained
    v(n-1)), and a re-delivery of a COMPACTED batch fails loudly
    instead of silently packing from offset 0."""
    import os

    import pytest

    from c4_5decisiontreebasedonmapreduce_spark.operators import packing as PK
    from c4_5decisiontreebasedonmapreduce_spark.streaming import (
        windows as SW,
    )

    work = str(tmp_path / "w")
    got = sorted(
        map(
            tuple,
            SW.streaming_pack_ingest(
                spark, sf_small, work_dir=work, keep_versions=2
            ).collect(),
        )
    )
    want = sorted(
        map(tuple, PK.pack_assignments_query(spark, sf_small).collect())
    )
    assert got == want
    state_dir = os.path.join(work, "state")
    versions = sorted(n for n in os.listdir(state_dir) if n.startswith("v"))
    assert versions == ["v1", "v2"]
    out_dir = os.path.join(work, "out")
    flat = os.path.join(work, "flat")
    # last batch re-deliverable: marker dropped, body re-runs cleanly
    os.remove(os.path.join(out_dir, "_commits", "2"))
    batch2 = spark.read.parquet(os.path.join(flat, "002.parquet"))
    SW._pack_ingest_batch(
        batch2, 2, state_dir, out_dir, PK.SEQ_LEN, PK.N_SHARDS,
        keep_versions=2,
    )
    # compacted batch 1 (v0 gone): loud failure, no silent offset-0 pack
    os.remove(os.path.join(out_dir, "_commits", "1"))
    batch1 = spark.read.parquet(os.path.join(flat, "001.parquet"))
    with pytest.raises(RuntimeError, match="state .* missing"):
        SW._pack_ingest_batch(
            batch1, 1, state_dir, out_dir, PK.SEQ_LEN, PK.N_SHARDS,
            keep_versions=2,
        )


def test_streaming_decontaminate_spans_equals_batch(spark, sf_small):
    """The drained per-micro-batch span detection equals the same
    bench-capped relation computed in one batch pass — and every
    drained span is a true corpus×benchmark pair."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import dedup as D
    from c4_5decisiontreebasedonmapreduce_spark.streaming import windows as SW

    drained = sorted(
        map(
            tuple,
            SW.streaming_decontaminate_spans(spark, sf_small).collect(),
        )
    )
    # batch twin with the SAME bench-side-only cap semantics
    d = load_table(spark, sf_small, "documents").select(
        "doc_id", F.coalesce("text", F.lit("")).alias("text")
    )
    is_bench = (
        F.col("doc_id") % D.DECONTAM_BENCH_MOD == D.DECONTAM_BENCH_REM
    )
    bench = D._positioned_grams(d.where(is_bench))
    rare_b = bench.join(
        bench.groupBy("gh")
        .agg(F.count_distinct("doc_id").alias("bdf"))
        .where(F.col("bdf") <= D.SPAN_GRAM_DF_CAP)
        .select("gh"),
        "gh",
    )
    m = (
        D._positioned_grams(d.where(~is_bench))
        .select(
            F.col("doc_id").alias("doc_a"),
            F.col("pos").alias("pos_a"),
            "gh",
        )
        .join(
            rare_b.select(
                F.col("doc_id").alias("doc_b"),
                F.col("pos").alias("pos_b"),
                "gh",
            ),
            "gh",
        )
    )
    batch = sorted(
        map(
            tuple,
            D._island_spans(m)
            .select("doc_a", "doc_b", "start_a", "start_b", "span_tokens")
            .collect(),
        )
    )
    assert drained == batch
    assert len(drained) > 0
    for doc_id, bench_id, *_ in drained:
        assert doc_id % D.DECONTAM_BENCH_MOD != D.DECONTAM_BENCH_REM
        assert bench_id % D.DECONTAM_BENCH_MOD == D.DECONTAM_BENCH_REM


def test_streaming_decontaminate_spans_multi_batch(spark, sf_small, tmp_path):
    """Two ingest waves: spans never straddle micro-batches (a document
    arrives whole), so the two-file drain must equal the single-batch
    drain exactly, with both waves contributing."""
    from c4_5decisiontreebasedonmapreduce_spark.streaming import windows as SW

    single = sorted(
        map(
            tuple,
            SW.streaming_decontaminate_spans(spark, sf_small).collect(),
        )
    )
    ids = sorted({r[0] for r in single})
    assert len(ids) >= 2
    cut = ids[0]
    docs = load_table(spark, sf_small, "documents")
    src = str(tmp_path / "span_waves")
    docs.where(F.col("doc_id") <= cut).coalesce(1).write.parquet(src)
    docs.where(F.col("doc_id") > cut).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    staged = sorted(
        map(
            tuple,
            SW.streaming_decontaminate_spans(
                spark, sf_small, source_dir=src
            ).collect(),
        )
    )
    assert staged == single
    assert any(r[0] <= cut for r in staged)
    assert any(r[0] > cut for r in staged)


def test_streaming_bm25_drained_equals_batch(spark, sf_small):
    """The per-micro-batch BM25 scoring drains to EXACTLY the batch
    `bm25_topk` result: a document arrives whole, so its term set —
    and therefore its entire top-k — is complete within its own
    micro-batch (zero cross-batch state to get wrong)."""
    from c4_5decisiontreebasedonmapreduce_spark.operators import (
        retrieval as RV,
    )
    from c4_5decisiontreebasedonmapreduce_spark.streaming import (
        windows as SW,
    )

    drained = sorted(
        map(tuple, SW.streaming_bm25_scoring(spark, sf_small).collect())
    )
    batch = sorted(map(tuple, RV.bm25_topk(spark, sf_small).collect()))
    assert drained == batch
