"""C4.5 error-based pruning (`operators/pruning.py`) — the post-pass the
reference omits (its loop ends at the grown tree, `Main.java:123-131`).

Three layers: (1) the binomial upper-confidence-limit math against its
closed forms and an exact CDF round-trip (hypothesis); (2) driver-only
trie pruning on hand-built models where the correct decision is
computable by hand; (3) end-to-end on the deterministic sf trees —
partition preserved, golden structure pinned at sf0.01 via the
registry oracle (tests/test_oracle_parity.py::SF001_PINNED)."""

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from c4_5decisiontreebasedonmapreduce_spark import registry as RG
from c4_5decisiontreebasedonmapreduce_spark.operators import tree as Tr
from c4_5decisiontreebasedonmapreduce_spark.operators.pruning import (
    binom_cdf,
    ebp_prune,
    predicted_errors,
    upper_error_rate,
)
from c4_5decisiontreebasedonmapreduce_spark.operators.tree import (
    OP_EQ,
    Condition,
    DecisionListModel,
    Rule,
)


# ---------------------------------------------------------------- math

@given(
    n=st.integers(min_value=1, max_value=100_000),
    cf=st.floats(min_value=0.01, max_value=0.9),
)
@settings(max_examples=60, deadline=None)
def test_zero_error_closed_form(n, cf):
    """Quinlan's own e = 0 special case: (1-U)^n = CF."""
    assert upper_error_rate(0, n, cf) == pytest.approx(
        1 - cf ** (1 / n), rel=1e-9
    )


@given(
    n=st.integers(min_value=2, max_value=2_000),
    frac=st.floats(min_value=0.0, max_value=0.45),
    cf=st.floats(min_value=0.05, max_value=0.5),
)
@settings(max_examples=60, deadline=None)
def test_cdf_roundtrip(n, frac, cf):
    """U is the exact inverse: P(Bin(n, U) <= e) == CF to bisection
    tolerance, and U can never undershoot the observed rate."""
    e = int(n * frac)
    u = upper_error_rate(e, n, cf)
    assert e / n <= u <= 1.0
    if u < 1.0:
        assert binom_cdf(e, n, u) == pytest.approx(cf, abs=1e-6)


def test_monotone_in_evidence():
    """More trials at the same observed rate → tighter bound; more
    errors at fixed n → larger bound; smaller CF → more pessimism."""
    assert upper_error_rate(1, 10) > upper_error_rate(10, 100)
    assert upper_error_rate(10, 100) > upper_error_rate(100, 1000)
    assert upper_error_rate(5, 100) > upper_error_rate(2, 100)
    assert upper_error_rate(2, 100, cf=0.05) > upper_error_rate(
        2, 100, cf=0.25
    )


def test_predicted_errors_edge_cases():
    assert predicted_errors(0, 0) == 0.0
    assert predicted_errors(10, 10) == 10.0  # all wrong: bound saturates
    # C4.5's canonical example band: a 0-error leaf still predicts >0
    assert 0 < predicted_errors(6, 0) < 6


# ------------------------------------------------- driver-only pruning

def _leaf(path, hist, depth):
    h = dict(hist)
    n = sum(h.values())
    lab = min(h.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    return Rule(tuple(path), lab, n, depth, hist=tuple(sorted(h.items())))


C_X = Condition("f", OP_EQ, "x")
C_Y = Condition("f", OP_EQ, "y")


def test_collapses_uninformative_split():
    """Both children keep the parent's majority: the pooled leaf's
    pessimistic error can only be tighter (one n·U(e,n) vs the sum of
    two looser small-n bounds) → prune. Verified against the bound
    arithmetic inline, not just the expected output."""
    a = _leaf([C_X], {"A": 47, "B": 3}, 1)
    b = _leaf([C_Y], {"A": 48, "B": 2}, 1)
    sub = predicted_errors(50, 3) + predicted_errors(50, 2)
    pooled = predicted_errors(100, 5)
    assert pooled <= sub + 0.1  # the decision the pruner must take
    out = ebp_prune(DecisionListModel(rules=[a, b]))
    assert out.rules == [Rule((), "A", 100, 0)]
    assert dict(out.rules[0].hist) == {"A": 95, "B": 5}


def test_keeps_separating_split():
    """A clean class separation: collapsing would turn 0+0 observed
    errors into 50 — the subtree bound wins by a mile."""
    a = _leaf([C_X], {"A": 50}, 1)
    b = _leaf([C_Y], {"B": 50}, 1)
    sub = predicted_errors(50, 0) * 2
    pooled = predicted_errors(100, 50)
    assert pooled > sub + 0.1
    out = ebp_prune(DecisionListModel(rules=[a, b]))
    assert [r.label for r in out.rules] == ["A", "B"]
    assert len(out.rules) == 2


def test_bottom_up_cascade():
    """Pruning is post-order: grandchildren collapse first, and the
    pooled result then feeds the parent's decision — a two-level noisy
    tree collapses all the way to the root."""
    g1 = _leaf([C_X, Condition("g", OP_EQ, "p")], {"A": 24, "B": 1}, 2)
    g2 = _leaf([C_X, Condition("g", OP_EQ, "q")], {"A": 23, "B": 2}, 2)
    b = _leaf([C_Y], {"A": 48, "B": 2}, 1)
    out = ebp_prune(DecisionListModel(rules=[g1, g2, b]))
    assert out.rules == [Rule((), "A", 100, 0)]


def test_zero_row_leaves_fold_away():
    """Empty-domain children (the reference expands every declared
    value, `Main.java:110-116`) carry no evidence: a split whose only
    nonempty child repeats the parent distribution always collapses."""
    a = _leaf([C_X], {"A": 47, "B": 3}, 1)
    empty = Rule((C_Y,), "A", 0, 1)
    out = ebp_prune(DecisionListModel(rules=[a, empty]))
    assert out.rules == [Rule((), "A", 50, 0)]


def test_idempotent_and_input_untouched():
    a = _leaf([C_X], {"A": 47, "B": 3}, 1)
    b = _leaf([C_Y], {"A": 48, "B": 2}, 1)
    m = DecisionListModel(rules=[a, b])
    once = ebp_prune(m)
    assert m.rules == [a, b]  # input model unchanged
    assert ebp_prune(once).rules == once.rules


def test_histless_model_rejected():
    m = DecisionListModel(rules=[Rule((C_X,), "A", 10, 1)])
    with pytest.raises(ValueError, match="freshly trained"):
        ebp_prune(m)


def test_cf_extremes_bracket():
    """CF → 1 trusts the training error verbatim (U → e/n, so a split
    with real separation always survives); tiny CF is maximally
    pessimistic, and a weak split — one child barely separated, the
    other a coin flip — collapses under it. A strongly separating split
    survives EVEN maximal pessimism (more small-n leaves pay more
    variance, but 40 observed errors beat 45 by enough)."""
    strong = DecisionListModel(
        rules=[
            _leaf([C_X], {"A": 40, "B": 10}, 1),
            _leaf([C_Y], {"A": 10, "B": 40}, 1),
        ]
    )
    assert len(ebp_prune(strong, cf=0.99).rules) == 2
    assert len(ebp_prune(strong, cf=1e-9).rules) == 2
    weak = DecisionListModel(
        rules=[
            _leaf([C_X], {"A": 30, "B": 20}, 1),
            _leaf([C_Y], {"A": 25, "B": 25}, 1),
        ]
    )
    assert len(ebp_prune(weak, cf=1e-9).rules) == 1


# ------------------------------------------------------- end-to-end

def test_trained_model_prunes_and_partitions(spark, sf_small):
    """train(prune=True) at sf0.001: the pruned list still partitions
    the training set (leaf counts sum to the table size, transform
    matches every row to exactly one rule) and never grows."""
    df = RG.lineitem_training(spark, sf_small)
    full = Tr.train(df, RG.LINEITEM_TRAINING_SCHEMA, max_depth=4, min_rows=50)
    pruned = Tr.train(
        df, RG.LINEITEM_TRAINING_SCHEMA, max_depth=4, min_rows=50, prune=True
    )
    assert len(pruned.rules) <= len(full.rules)
    assert sum(r.n for r in pruned.rules) == sum(r.n for r in full.rules)
    total = df.count()
    assert sum(r.n for r in pruned.rules) == total
    # every row lands on a leaf whose label the model's transform agrees
    # with: count via the compiled trie vs the rule relation
    pred = pruned.transform(df)
    assert pred.where(pred.prediction.isNull()).count() == 0
    # leaf histograms stay consistent: per-rule n equals the matching
    # row count in the data
    for r in pruned.rules:
        got = df.where(r.predicate()).count()
        assert got == r.n, (r.conditions, got, r.n)


def test_pruned_accuracy_within_resubstitution_bound(spark, sf_small):
    """Pruning trades training-set fit for pessimistic-bound fit: the
    resubstitution accuracy may only drop by the pooled minority mass it
    collapsed — and the pessimistic PREDICTED error of the pruned tree
    (what EBP optimizes) never exceeds the unpruned tree's."""
    from c4_5decisiontreebasedonmapreduce_spark.operators.pruning import (
        predicted_errors,
    )

    df = RG.lineitem_training(spark, sf_small)
    full = Tr.train(df, RG.LINEITEM_TRAINING_SCHEMA, max_depth=4, min_rows=50)
    pruned = ebp_prune(full)

    def pessimistic(m):
        return sum(
            predicted_errors(r.n, r.n - max(dict(r.hist).values(), default=0))
            for r in m.rules
        )

    assert pessimistic(pruned) <= pessimistic(full) + 0.1 * len(full.rules)
    acc_full = Tr.accuracy(full, df, RG.LABEL)
    acc_pruned = Tr.accuracy(pruned, df, RG.LABEL)
    assert acc_pruned <= acc_full + 1e-9  # resubstitution can't improve
    # ...and can't fall below the root-collapse floor: every leaf
    # predicts its own majority, so Σ max(hist) >= global majority
    pooled: dict = {}
    for r in full.rules:
        for k, v in r.hist:
            pooled[k] = pooled.get(k, 0) + v
    root_floor = max(pooled.values()) / sum(pooled.values())
    assert acc_pruned >= root_floor - 1e-9
