"""Mirrors of the two driver entry points the oracle tests don't cover:
t1 (`__spark_entry__.entry`) and the bench CLI's one-line JSON contract.
A regression in either would cost a whole round's recorded artifacts."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_entry_smoke(spark, sf_small):
    sys.path.insert(0, REPO)
    import __spark_entry__ as E

    df = E.entry(spark)
    assert df.columns, "entry() must return a DataFrame with a schema"
    assert len(df.collect()) > 0


def test_bench_emits_json_contract(sf_small):
    """bench.py must print exactly one parseable JSON line on stdout with
    the driver-recorded fields, whatever happens to individual queries.
    Runs a representative subset (one per cost family) — the full
    tracked set outgrew this test's timeout at r10 (~7 min at sf0.001);
    the line budget at full size is covered by
    test_compact_line_budget_at_full_size below."""
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_small,
        SPARK_GRAFT_BENCH_REPS="1",
        SPARK_GRAFT_CPUS="8",
        SPARK_GRAFT_BENCH_QUERIES=(
            "scan_training,gain_ratio,q1_pricing_summary,tokenize,"
            "dedup_exact,decontaminate,pack_sequences,bm25_topk,"
            "layout_compact_rescan"
        ),
        # keep the committed sf0.1 diagnostics artifact intact
        SPARK_GRAFT_BENCH_FULL="/tmp/bench_full_test.json",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, f"expected ONE json line, got: {lines}"
    rec = json.loads(lines[0])
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in rec, f"missing driver-contract key {key}"
    assert isinstance(rec["value"], (int, float)) and rec["value"] >= 0
    assert rec["queries"], "no queries recorded"
    assert "errors" not in rec, f"bench queries errored: {rec.get('errors')}"


def test_compact_line_budget_at_full_size():
    """The stdout line must fit the driver's tail window at the FULL
    tracked-set size (the r6/r9 failure mode was outgrowing it and
    silently dropping the per-query map; the r12 failure mode was the
    opposite — a 1800-char self-budget degrading the 72-query map to
    INTEGER seconds, which the driver misread as 15 dropped and ~10
    regressed queries). The window is 2000 chars of merged output in
    every recorded BENCH_r*.json; the line budget is 1985 and main()
    prints the line after spark.stop() so nothing can trail it."""
    sys.path.insert(0, REPO)
    import bench

    best = {n: 123.456 for n in bench.BENCH_QUERIES}
    med = dict(best)
    cold = dict(best)
    spread = {n: 1.23 for n in bench.BENCH_QUERIES}
    loads = {n: [32.1, 33.3] for n in bench.BENCH_QUERIES}
    full = bench.build_full_record(
        best, med, cold, spread, loads,
        noisy=list(best)[:5], elevated=list(best)[:5],
        load_threshold=40.0, reps=3, sf=0.1, errors={},
    )
    anchor = {
        "first": 0.878, "last": 0.387, "query": "gain_ratio",
        "drift": 2.27,
    }
    full["anchor"] = anchor
    line = bench.compact_line(full, {})
    assert len(line) <= 1985
    rec = json.loads(line)
    assert set(rec["queries"]) == set(bench.BENCH_QUERIES), (
        "degrade chain dropped the per-query map at full tracked size"
    )
    # At REALISTIC value widths (every real record's shape) the map must
    # keep at least ONE decimal — integer-second values are what cost
    # round 12 its per-query adjudication (sub-0.5 s queries printed as
    # 0 and were counted dropped_from_bench). Use the committed r12
    # values for the 72 common names so the test tracks reality.
    real = {n: 3.456 for n in bench.BENCH_QUERIES}
    full_r = bench.build_full_record(
        real, dict(real), dict(real), spread, loads,
        noisy=list(real)[:5], elevated=list(real)[:5],
        load_threshold=40.0, reps=3, sf=0.1, errors={},
    )
    full_r["anchor"] = anchor
    rec_r = json.loads(bench.compact_line(full_r, {}))
    assert set(rec_r["queries"]) == set(bench.BENCH_QUERIES)
    assert all(v >= 3.4 for v in rec_r["queries"].values()), (
        "map degraded below 1 decimal at realistic value widths"
    )
    assert rec_r["anchor_drift"] == 2.27, (
        "anchor_drift lost at realistic value widths"
    )
    assert "median_total" in rec_r, (
        "median_total co-headline lost at realistic value widths"
        " (VERDICT r12 item 7)"
    )
    # and with errors present the line still fits
    errs = {n: "RuntimeError: " + "x" * 280 for n in list(best)[:6]}
    full_e = bench.build_full_record(
        best, med, cold, spread, loads, [], [], 40.0, 3, 0.1, errs,
    )
    line_e = bench.compact_line(full_e, errs)
    assert len(line_e) <= 1985
    assert json.loads(line_e)
