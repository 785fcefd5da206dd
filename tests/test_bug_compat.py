"""``train(bug_compat=True)``: byte parity with the reference AS BUILT.

Every test runs the engine's bug-compat trainer AND the independent
pure-Python transliteration of the reference pipeline
(tests/reference_sim.py) on the same fixture and asserts the final
stdout rule lines agree byte-for-byte — plus a pinned golden where the
expected tree is hand-checkable. Quirk sites: Q1 `MyMapper.java:97-100`,
Q2 `Main.java:240-246`, Q3 `MyReducer.java:103-104,201-202`, Q4
`Rule.java:29`, Q5 `Main.java:85-88` / `MyReducer.java:130,200`.
"""

import random

import pytest

from c4_5decisiontreebasedonmapreduce_spark.operators import tree as Tr
from c4_5decisiontreebasedonmapreduce_spark.operators.bug_compat import (
    ReferenceCrash,
    java_double_str,
    q1_effective_predicate,
)
from c4_5decisiontreebasedonmapreduce_spark.sources.tsv import (
    parse_attributes_lines,
)
from reference_sim import reference_train_lines


def _both(spark, attr_lines, rows):
    """(engine lines, simulator lines) for one fixture; a ReferenceCrash
    from either side is returned as the exception instance so tests can
    assert crash parity too."""
    schema = parse_attributes_lines(attr_lines)
    df = spark.createDataFrame(
        [tuple(r) for r in rows], schema.spark_schema()
    )
    try:
        engine = Tr.train(df, schema, bug_compat=True).stdout_lines()
    except ReferenceCrash as e:
        engine = e
    sim_rows = [[str(v) for v in r] for r in rows]
    try:
        sim = reference_train_lines(sim_rows, schema)
    except ReferenceCrash as e:
        sim = e
    return engine, sim


def _assert_parity(engine, sim):
    if isinstance(sim, ReferenceCrash):
        assert isinstance(engine, ReferenceCrash), (
            f"simulator crashed ({sim}) but engine returned {engine}"
        )
    else:
        assert engine == sim


WEATHER_ATTRS = [
    "outlook:string:sunny,overcast,rainy",
    "temperature:numeric",
    "humidity:numeric",
    "windy:string:true,false",
    "play:yes,no",
]
WEATHER_ROWS = [
    ("sunny", 85.0, 85.0, "false", "no"),
    ("sunny", 80.0, 90.0, "true", "no"),
    ("overcast", 83.0, 86.0, "false", "yes"),
    ("rainy", 70.0, 96.0, "false", "yes"),
    ("rainy", 68.0, 80.0, "false", "yes"),
    ("rainy", 65.0, 70.0, "true", "no"),
    ("overcast", 64.0, 65.0, "true", "yes"),
    ("sunny", 72.0, 95.0, "false", "no"),
    ("sunny", 69.0, 70.0, "false", "yes"),
    ("rainy", 75.0, 80.0, "false", "yes"),
    ("sunny", 75.0, 70.0, "true", "yes"),
    ("overcast", 72.0, 90.0, "true", "yes"),
    ("overcast", 81.0, 75.0, "false", "yes"),
    ("rainy", 71.0, 91.0, "true", "no"),
]


def test_weather_golden_byte_parity(spark):
    """The canonical weather run: the reference-as-built happens to be
    bug-benign here (integer-valued numerics → Q1-surviving boundaries,
    one numeric split per level → no visible Q2 leak), so its stdout is
    the correct C4.5 tree — pinned literally AND differentially."""
    engine, sim = _both(spark, WEATHER_ATTRS, WEATHER_ROWS)
    expected = [
        "  0,overcast:yes",
        "  0,sunny&2,<=70.0:yes",
        "  0,sunny&2,>70.0:no",
        "  0,rainy&3,true:no",
        "  0,rainy&3,false:yes",
    ]
    assert engine == expected
    assert sim == expected


def test_q1_truncating_reparse_starves_children(spark):
    """A fractional winning boundary (5.25) does not survive the
    truncate→parse→re-render round-trip ("<=5.25" re-renders "<=5.2"),
    so NEITHER child matches any row and both are silently dropped (Q5):
    the model comes out EMPTY. The default trainer on the same data
    produces the two honest leaves."""
    attrs = ["x:numeric", "cls:yes,no"]
    rows = [(5.25, "yes"), (5.25, "yes"), (7.5, "no"), (7.5, "no")]
    engine, sim = _both(spark, attrs, rows)
    assert engine == [] and sim == []

    schema = parse_attributes_lines(attrs)
    df = spark.createDataFrame(rows, schema.spark_schema())
    fixed = Tr.train(df, schema, max_depth=3)
    assert sorted(r.label for r in fixed.rules) == ["no", "yes"]


def test_q2_global_boundary_leak(spark):
    """Two sibling nodes split the same numeric attribute at different
    per-node optima (70 for h=p, 80 for h=q); the reference's global
    attVal overwrite makes BOTH expand with the boundary of the last
    statistics line in key-sorted order — 80.0 leaks onto the p branch."""
    attrs = ["x:numeric", "h:string:p,q", "w:string:c", "cls:yes,no"]
    rows = [
        (10.0, "p", "c", "yes"),
        (30.0, "p", "c", "yes"),
        (50.0, "p", "c", "yes"),
        (70.0, "p", "c", "yes"),
        (90.0, "p", "c", "no"),
        (20.0, "q", "c", "no"),
        (40.0, "q", "c", "no"),
        (60.0, "q", "c", "no"),
        (80.0, "q", "c", "no"),
        (100.0, "q", "c", "yes"),
    ]
    engine, sim = _both(spark, attrs, rows)
    expected = [
        "  0,<=80.0&1,p:yes",
        "  0,>80.0&1,p:no",
        "  0,<=80.0&1,q:no",
        "  0,>80.0&1,q:yes",
    ]
    assert engine == expected
    assert sim == expected
    # the default trainer splits the p branch at its own optimum, 70
    schema = parse_attributes_lines(attrs)
    df = spark.createDataFrame(rows, schema.spark_schema())
    fixed = Tr.train(df, schema, max_depth=3)
    p_bounds = {
        c.value
        for r in fixed.rules
        for c in r.conditions
        if c.attr == "x"
        and any(d.attr == "h" and d.value == "p" for d in r.conditions)
    }
    assert p_bounds == {70.0}


def test_q3_last_seen_leaf_label(spark):
    """A zero-gain mixed node (2 yes / 2 no — exact class-attribute
    independence) becomes a leaf labelled with the LAST-arriving row's
    class ('yes' here), where the honest trainer tie-breaks to the
    lexicographically smallest label ('no')."""
    attrs = ["w:string:c,d", "g:string:a,b", "cls:yes,no"]
    rows = [
        ("c", "a", "no"),
        ("d", "a", "no"),
        ("c", "a", "yes"),
        ("d", "a", "yes"),
        ("c", "b", "yes"),
        ("d", "b", "yes"),
    ]
    engine, sim = _both(spark, attrs, rows)
    expected = ["  1,a:yes", "  1,b:yes"]
    assert engine == expected
    assert sim == expected
    schema = parse_attributes_lines(attrs)
    df = spark.createDataFrame(rows, schema.spark_schema())
    fixed = Tr.train(df, schema, max_depth=3)
    a_label = [
        r.label
        for r in fixed.rules
        if any(c.attr == "g" and c.value == "a" for c in r.conditions)
    ]
    assert a_label == ["no"]  # majority tie → lexicographic min


def test_q4_root_leaf_crash(spark):
    """A pure training set makes the root a leaf; rendering the
    condition-less rule reproduces Rule.toString's
    StringIndexOutOfBoundsException."""
    attrs = ["g:string:a,b", "w:string:c1,c2", "cls:yes,no"]
    rows = [("a", "c1", "yes"), ("b", "c2", "yes")]
    engine, sim = _both(spark, attrs, rows)
    assert isinstance(engine, ReferenceCrash)
    assert isinstance(sim, ReferenceCrash)
    # the default trainer handles root-is-leaf fine
    schema = parse_attributes_lines(attrs)
    df = spark.createDataFrame(rows, schema.spark_schema())
    fixed = Tr.train(df, schema, max_depth=3)
    assert [r.label for r in fixed.rules] == ["yes"]


def test_q5_absent_domain_value_branch_dropped(spark):
    """A declared categorical value with no matching rows ('z') expands
    into a child whose statistics never arrive; the -2 sentinel drops it
    silently — the bug-compat model has 2 rules where the honest one has
    3 (the empty branch becomes a parent-majority leaf)."""
    attrs = ["g:string:a,b,z", "w:string:c1,c2", "cls:yes,no"]
    # w must NOT have exactly-zero root gain: a gr==0 line sorted after
    # g's would sentinel the root into a leaf (Q4 crash) — itself
    # faithful reference behavior, but not what this test demonstrates
    rows = [
        ("a", "c1", "yes"),
        ("a", "c1", "yes"),
        ("b", "c2", "no"),
        ("b", "c1", "no"),
    ]
    engine, sim = _both(spark, attrs, rows)
    expected = ["  0,a:yes", "  0,b:no"]
    assert engine == expected
    assert sim == expected
    schema = parse_attributes_lines(attrs)
    df = spark.createDataFrame(rows, schema.spark_schema())
    fixed = Tr.train(df, schema, max_depth=3)
    assert len(fixed.rules) == 3  # incl. the z branch as a majority leaf


def test_java_double_str_formats():
    assert java_double_str(85.0) == "85.0"
    assert java_double_str(-1.0) == "-1.0"
    assert java_double_str(5.25) == "5.25"
    assert java_double_str(0.001) == "0.001"
    assert java_double_str(1234567.5) == "1234567.5"
    assert java_double_str(1e7) == "1.0E7"
    assert java_double_str(1.5e-5) == "1.5E-5"
    assert java_double_str(-2.5e8) == "-2.5E8"
    assert java_double_str(0.0) == "0.0"


def test_q1_effective_predicate_cases():
    # survives: trailing-.0 boundaries (truncation drops a zero)
    assert q1_effective_predicate("<=70.0") == ("<=", 70.0)
    assert q1_effective_predicate(">70.0") == (">", 70.0)
    # dead: fractional boundary whose truncation changes the value
    assert q1_effective_predicate("<=5.25") is None
    # crash: truncated text is not parseable
    with pytest.raises(ReferenceCrash):
        q1_effective_predicate("<=1.5E-5")


def test_randomized_differential_parity(spark):
    """Seeded random fixtures (1 categorical + 1 numeric attribute, with
    fractional values so Q1 fires stochastically): engine and simulator
    must agree byte-for-byte, crashes included."""
    rng = random.Random(20260814)
    for _ in range(5):
        n = rng.randint(8, 16)
        rows = [
            (
                rng.choice(["a", "b", "c"]),
                rng.choice([1.0, 2.0, 3.5, 4.25, 6.0, 7.75]),
                rng.choice(["yes", "no"]),
            )
            for _ in range(n)
        ]
        attrs = ["g:string:a,b,c", "x:numeric", "cls:yes,no"]
        engine, sim = _both(spark, attrs, rows)
        _assert_parity(engine, sim)


def test_java_double_str_roundtrips_and_bands():
    """Shortest-round-trip property: both Java and Python print the
    minimal digit string that reparses to the same double, so
    ``float(java_double_str(x)) == x`` must hold everywhere, and the
    formatting band (plain decimal on 1e-3 <= |x| < 1e7, d.dddEn
    outside) must match Double.toString's spec."""
    import random

    rng = random.Random(8)
    samples = [rng.uniform(-1e9, 1e9) for _ in range(200)]
    samples += [rng.uniform(-100, 100) for _ in range(200)]
    samples += [rng.uniform(-1e-2, 1e-2) for _ in range(100)]
    samples += [0.0, -0.0, 1e-3, 1e7 - 0.5, 1e7, -1e7, 123.0, 0.1]
    for x in samples:
        s = java_double_str(x)
        assert float(s) == x, (x, s)
        if x == 0 or 1e-3 <= abs(x) < 1e7:
            assert "E" not in s and "." in s, (x, s)
        else:
            mant, _, exp = s.partition("E")
            assert exp and "." in mant, (x, s)
            assert 1 <= abs(float(mant)) < 10, (x, s)
