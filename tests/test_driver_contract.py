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
    the driver-recorded fields, whatever happens to individual queries."""
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_small,
        SPARK_GRAFT_BENCH_REPS="1",
        SPARK_GRAFT_CPUS="8",
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
