"""Property tests for the statistics operators (SURVEY.md §5.4):
window-based numeric best-split vs a brute-force reimplementation, and
entropy invariants."""

import math
import random

import pytest

from c4_5decisiontreebasedonmapreduce_spark.operators import c45_stats as S


def brute_force_best_split(pairs, min_ratio=0.1):
    """O(distinct × n) reference search mirroring the reducer's buffered
    scan (`/root/reference/src/program/MyReducer.java:132-199`)."""
    n = len(pairs)
    values = sorted({v for v, _ in pairs})

    def ent(rows):
        if not rows:
            return 0.0
        counts = {}
        for _, c in rows:
            counts[c] = counts.get(c, 0) + 1
        return -sum(
            (k / len(rows)) * math.log2(k / len(rows))
            for k in counts.values()
        )

    best = None
    for b in values[:-1]:
        le = [p for p in pairs if p[0] <= b]
        gt = [p for p in pairs if p[0] > b]
        if len(le) < min_ratio * n or len(gt) < min_ratio * n:
            continue
        entr = (len(le) * ent(le) + len(gt) * ent(gt)) / n
        if best is None or entr < best[1] - 1e-12:
            best = (b, entr, len(le), len(gt))
    if best is None:
        return None
    b, entr, nle, ngt = best
    split = -(nle / n) * math.log2(nle / n) - (ngt / n) * math.log2(ngt / n)
    info = ent(pairs)
    return b, entr, split, (info - entr) / split


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_numeric_split_matches_brute_force(spark, seed):
    rng = random.Random(seed)
    pairs = [
        (float(rng.randint(0, 15)), rng.choice("abc")) for _ in range(200)
    ]
    df = spark.createDataFrame(
        [(0, v, c) for v, c in pairs], "rid int, x double, cls string"
    )
    info = S.node_info(S.node_class_counts(df, "cls"))
    out = S.numeric_best_split(
        S.contingency(S.melt(df, ["x"], "cls", numeric=True)),
        info,
        ["a", "b", "c"],
        0.1,
    ).collect()
    expected = brute_force_best_split(pairs)
    assert expected is not None and len(out) == 1
    row = out[0]
    assert row["boundary"] == expected[0]
    assert abs(row["entr"] - expected[1]) < 1e-9
    assert abs(row["split_info"] - expected[2]) < 1e-9
    assert abs(row["gain_ratio"] - expected[3]) < 1e-9


def test_guard_rejects_all(spark):
    """A column where every split leaves <10% on one side yields no row."""
    rows = [(0, 1.0, "a")] * 99 + [(0, 2.0, "b")]
    df = spark.createDataFrame(rows, "rid int, x double, cls string")
    info = S.node_info(S.node_class_counts(df, "cls"))
    out = S.numeric_best_split(
        S.contingency(S.melt(df, ["x"], "cls", numeric=True)),
        info,
        ["a", "b"],
        0.1,
    ).collect()
    assert out == []


def test_entropy_bounds(spark):
    """0 <= entr <= info <= log2(classes); gain_ratio >= 0."""
    rng = random.Random(3)
    rows = [
        (0, rng.choice("uvw"), float(rng.randint(0, 5)), rng.choice("ab"))
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "rid int, k string, x double, cls string")
    info_df = S.node_info(S.node_class_counts(df, "cls"))
    info = info_df.collect()[0]["info"]
    assert 0.0 <= info <= 1.0 + 1e-12
    cat = S.categorical_stats(
        S.contingency(S.melt(df, ["k"], "cls")), info_df
    ).collect()[0]
    assert 0.0 <= cat["entr"] <= info + 1e-12
    assert cat["gain_ratio"] >= 0.0


def test_pure_node_zero_gain(spark):
    df = spark.createDataFrame(
        [(0, "u", "a"), (0, "v", "a"), (0, "u", "a")],
        "rid int, k string, cls string",
    )
    info_df = S.node_info(S.node_class_counts(df, "cls"))
    assert info_df.collect()[0]["info"] == 0.0
    cat = S.categorical_stats(
        S.contingency(S.melt(df, ["k"], "cls")), info_df
    ).collect()[0]
    assert cat["gain_ratio"] == 0.0
