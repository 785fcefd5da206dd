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
    """The stdout line must fit the driver's ~1800-char tail window at
    the FULL tracked-set size (the r6/r9 failure mode was outgrowing it
    and silently dropping the per-query map). Build a worst-case record
    from the real BENCH_QUERIES names with 4-digit-second values and
    assert the degrade chain keeps `queries` while fitting the budget."""
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
    assert len(line) <= 1800
    rec = json.loads(line)
    assert set(rec["queries"]) == set(bench.BENCH_QUERIES), (
        "degrade chain dropped the per-query map at full tracked size"
    )
    # at REALISTIC value widths (1-digit seconds, the shape every real
    # record has had) the decimals degrade before the session-noise
    # provenance does: anchor_drift must survive alongside the full map
    # (r12 regression — the 72-query line shed every diagnostic while
    # the map sat untouched at 3dp). The all-123.456 worst case above
    # is allowed to sacrifice the anchor: map > anchor > everything.
    real = {n: 3.456 for n in bench.BENCH_QUERIES}
    full_r = bench.build_full_record(
        real, dict(real), dict(real), spread, loads,
        noisy=list(real)[:5], elevated=list(real)[:5],
        load_threshold=40.0, reps=3, sf=0.1, errors={},
    )
    full_r["anchor"] = anchor
    rec_r = json.loads(bench.compact_line(full_r, {}))
    assert set(rec_r["queries"]) == set(bench.BENCH_QUERIES)
    assert rec_r["anchor_drift"] == 2.27, (
        "degrade chain sacrificed anchor_drift before the map's decimals"
    )
    # and with errors present the line still fits
    errs = {n: "RuntimeError: " + "x" * 280 for n in list(best)[:6]}
    full_e = bench.build_full_record(
        best, med, cold, spread, loads, [], [], 40.0, 3, 0.1, errs,
    )
    line_e = bench.compact_line(full_e, errs)
    assert len(line_e) <= 1800
    assert json.loads(line_e)
