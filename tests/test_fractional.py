"""Quinlan-fractional missing-value training (operators/fractional.py):
hand-computed goldens for the gain scaling, the unknown split-info
branch, and the weight-proportional routing; clean-data model equality
with the standard trainer; determinism under reruns."""

import pandas as pd
import pytest

from c4_5decisiontreebasedonmapreduce_spark.operators import c45_stats as S
from c4_5decisiontreebasedonmapreduce_spark.operators import fractional as FR
from c4_5decisiontreebasedonmapreduce_spark.operators import tree as Tr
from c4_5decisiontreebasedonmapreduce_spark.sources.tsv import (
    CATEGORICAL,
    NUMERIC,
    AttributeSpec,
    TrainingSchema,
)

SCHEMA_A = TrainingSchema(
    features=(AttributeSpec("a", CATEGORICAL, ("x", "y")),),
    label="lab",
    label_domain=("N", "P"),
)

SCHEMA_AB = TrainingSchema(
    features=(
        AttributeSpec("a", CATEGORICAL, ("x", "y")),
        AttributeSpec("b", CATEGORICAL, ("p", "q")),
    ),
    label="lab",
    label_domain=("N", "P"),
)

SCHEMA_V = TrainingSchema(
    features=(AttributeSpec("v", NUMERIC),),
    label="lab",
    label_domain=("A", "B"),
)


def test_fractional_routing_hand_golden(spark):
    """4×(x,P) + 4×(y,N) + one unknown P + one unknown N: knowns split
    perfectly, each unknown row's unit weight distributes 1/2–1/2 (both
    branches hold 4 of the 8 known rows), so each leaf's mass is
    exactly 4 + 2·0.5 = 5.0 — Quinlan's fractional leaf counts."""
    rows = [("x", "P")] * 4 + [("y", "N")] * 4 + [(None, "P"), (None, "N")]
    df = spark.createDataFrame(rows, "a string, lab string")
    m = Tr.train(df, SCHEMA_A, max_depth=3, min_rows=1, nulls="fractional")
    got = {
        (r.conditions[0].value): (r.label, float(r.n)) for r in m.rules
    }
    assert got == {"x": ("P", 5.0), "y": ("N", 5.0)}


def test_fractional_gain_scaling_flips_winner(spark):
    """Attribute `a` separates its KNOWN rows perfectly but is missing
    on 6 of 8; `b` is fully known and also separates perfectly. Without
    Quinlan's penalties both gain ratios are 1.0 and declaration order
    would pick `a`; with the known-fraction factor (F = 0.25) and the
    unknown pseudo-branch in split info, a's ratio drops to
    0.25 / 1.061278 ≈ 0.2356 and `b` must win."""
    rows = [
        ("x", "p", "P"),
        ("y", "q", "N"),
        (None, "p", "P"),
        (None, "p", "P"),
        (None, "q", "N"),
        (None, "q", "N"),
        (None, "p", "P"),
        (None, "q", "N"),
    ]
    df = spark.createDataFrame(rows, "a string, b string, lab string")
    m = Tr.train(df, SCHEMA_AB, max_depth=1, min_rows=1, nulls="fractional")
    assert {r.conditions[0].attr for r in m.rules} == {"b"}
    got = {r.conditions[0].value: (r.label, float(r.n)) for r in m.rules}
    assert got == {"p": ("P", 4.0), "q": ("N", 4.0)}


def test_fractional_stats_hand_numbers():
    """The scaled gain ratio itself, against a by-hand Quinlan
    computation (no Spark): 2 known rows splitting perfectly, 6
    unknown → gain = F·1.0 = 0.25, split info over branch masses
    (1, 1, 6)/8 = 1.061278, ratio = 0.235566."""
    pdf = pd.DataFrame(
        {
            S.RID: [0] * 6,
            S.AID: [S.CC_AID, S.CC_AID, "a", "a", "a", "a"],
            "value_s": [None, None, "x", "y", None, None],
            "value_d": [None] * 6,
            S.CLASS: ["P", "N", "P", "N", "P", "N"],
            "wsum": [4.0, 4.0, 1.0, 1.0, 3.0, 3.0],
        }
    )
    hist, stats, masses = FR._fractional_level_stats(
        pdf,
        cat_names=["a"],
        num_names=[],
        label_domain=["N", "P"],
        min_ratio=0.1,
    )
    assert hist[0] == {"P": 4.0, "N": 4.0}
    (st,) = stats[0]
    assert st["gain_ratio"] == pytest.approx(0.25 / 1.0612781245, abs=1e-9)
    assert masses[(0, "a")]["by_value"] == {"x": 1.0, "y": 1.0}


def test_fractional_numeric_routing(spark):
    """Numeric split with unknowns: 2 rows ≤ boundary, 2 above, 2 null →
    each null row contributes 0.5 mass per side; leaf masses 3.0/3.0."""
    rows = [(1.0, "A"), (2.0, "A"), (3.0, "B"), (4.0, "B"),
            (None, "A"), (None, "B")]
    df = spark.createDataFrame(rows, "v double, lab string")
    m = Tr.train(df, SCHEMA_V, max_depth=1, min_rows=1, nulls="fractional")
    assert len(m.rules) == 2
    ops = {r.conditions[0].op: (r.label, float(r.n)) for r in m.rules}
    assert ops["<="] == ("A", 3.0)
    assert ops[">"] == ("B", 3.0)
    # the boundary is a real known value
    assert all(r.conditions[0].value == 2.0 for r in m.rules)


def test_fractional_clean_data_equals_standard(spark):
    """With no nulls every weight stays exactly 1 (decimal), the unknown
    branch has zero mass, F = 1 — the model must equal the standard
    trainer's rule for rule."""
    from c4_5decisiontreebasedonmapreduce_spark import registry as RG

    df = RG.lineitem_training(spark, "/root/testdata/sf0.001")
    a = Tr.train(df, RG.LINEITEM_TRAINING_SCHEMA, max_depth=4, min_rows=50)
    b = Tr.train(
        df,
        RG.LINEITEM_TRAINING_SCHEMA,
        max_depth=4,
        min_rows=50,
        nulls="fractional",
    )
    assert [
        (r.conditions, r.label, float(r.n), r.depth) for r in a.rules
    ] == [(r.conditions, r.label, float(r.n), r.depth) for r in b.rules]


def test_fractional_deterministic_and_mass_conserving(spark):
    """Reruns agree exactly, and total leaf mass equals the row count —
    fractional routing redistributes weight, never creates or drops it
    (decimal arithmetic, so exact)."""
    rows = (
        [("x", "P")] * 30
        + [("y", "N")] * 25
        + [("x", "N")] * 10
        + [(None, "P")] * 7
        + [(None, "N")] * 3
    )
    df = spark.createDataFrame(rows, "a string, lab string")
    m1 = Tr.train(df, SCHEMA_A, max_depth=2, min_rows=1, nulls="fractional")
    m2 = Tr.train(df, SCHEMA_A, max_depth=2, min_rows=1, nulls="fractional")
    assert [(r.conditions, r.label, float(r.n)) for r in m1.rules] == [
        (r.conditions, r.label, float(r.n)) for r in m2.rules
    ]
    assert sum(float(r.n) for r in m1.rules) == pytest.approx(
        len(rows), abs=1e-9
    )


def test_fractional_rejects_prune(spark):
    df = spark.createDataFrame([("x", "P")], "a string, lab string")
    with pytest.raises(ValueError, match="prune"):
        Tr.train(df, SCHEMA_A, nulls="fractional", prune=True)


def test_fractional_depth2_resplit_conserves_mass(spark):
    """Rows that are ALREADY fractional (weight < 1 after a level-1
    distribution) must re-distribute correctly when the child splits
    again on a second attribute with its own unknowns — two levels of
    decimal weight multiplication, total leaf mass still exactly the
    row count."""
    rows = (
        [("x", "p", "P")] * 12
        + [("x", "q", "N")] * 9
        + [("y", "q", "N")] * 20
        + [(None, "p", "P")] * 4
        + [("x", None, "P")] * 3
        + [(None, None, "N")] * 2
    )
    df = spark.createDataFrame(rows, "a string, b string, lab string")
    m1 = Tr.train(df, SCHEMA_AB, max_depth=2, min_rows=1, nulls="fractional")
    m2 = Tr.train(df, SCHEMA_AB, max_depth=2, min_rows=1, nulls="fractional")
    got = [
        (tuple((c.attr, c.value) for c in r.conditions), r.label,
         round(float(r.n), 6))
        for r in m1.rules
    ]
    assert got == [
        ((("b", "p"),), "P", 17.777778),
        ((("b", "q"), ("a", "x")), "N", 11.388889),
        ((("b", "q"), ("a", "y")), "N", 20.833333),
    ]
    assert [(r.conditions, r.label, float(r.n)) for r in m1.rules] == [
        (r.conditions, r.label, float(r.n)) for r in m2.rules
    ]
    assert sum(float(r.n) for r in m1.rules) == pytest.approx(
        len(rows), abs=1e-9
    )
