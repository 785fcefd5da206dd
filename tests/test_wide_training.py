"""Wide-schema training stress (VERDICT r7 item 4): the bounded-
contingency estimate must exceed ``_DRIVER_STATS_MAX_ROWS`` BY THE BOUND
— no test override — and the resulting mid-train switch to the fully
distributed reduction must not change the model."""

import json

from c4_5decisiontreebasedonmapreduce_spark.operators import tree as Tr
from c4_5decisiontreebasedonmapreduce_spark.operators.training import (
    WIDE_CAT_DOMAIN,
    WIDE_N_NUMERIC,
    wide_training,
    wide_training_schema,
)


def _model_key(m):
    return sorted(
        json.dumps([[c.attr, c.op, str(c.value)] for c in r.conditions])
        + f"|{r.label}|{r.n}"
        for r in m.rules
    )


def test_wide_schema_estimate_exceeds_default_bound():
    """The static part of the contract: one 600-way categorical split
    makes the depth-1 frontier's estimate blow the 4M default while the
    root level stays under it — so the switch is driven by the shipped
    bound, not by any knob."""
    schema = wide_training_schema()
    # the estimate tree.train computes: classes × (1 + Σ|domains| + Σ|edges|)
    # with |edges| ≤ max_bins+1 per numeric attribute
    per_node = len(schema.label_domain) * (
        1 + WIDE_CAT_DOMAIN + WIDE_N_NUMERIC * 257
    )
    assert 1 * per_node <= Tr._DRIVER_STATS_MAX_ROWS  # root: driver path
    assert WIDE_CAT_DOMAIN * per_node > Tr._DRIVER_STATS_MAX_ROWS  # depth 1


def test_wide_training_switches_paths_and_models_agree(
    spark, sf_small, monkeypatch
):
    """Default train on the wide table must run driver-side stats at the
    root, switch to the distributed reduction for the 600-node depth-1
    frontier (by the bound), and produce the exact model the forced
    driver path produces."""
    schema = wide_training_schema()
    df = wide_training(spark, sf_small)

    paths = []
    orig_driver, orig_rels = Tr._driver_level_stats, Tr._level_rels

    def spy_driver(*a, **k):
        paths.append("driver")
        return orig_driver(*a, **k)

    def spy_rels(*a, **k):
        paths.append("hist" if k.get("hist_only") else "distributed")
        return orig_rels(*a, **k)

    monkeypatch.setattr(Tr, "_driver_level_stats", spy_driver)
    monkeypatch.setattr(Tr, "_level_rels", spy_rels)
    default = Tr.train(df, schema, max_depth=2)
    monkeypatch.undo()

    assert paths == ["driver", "distributed", "hist"]
    assert len(default.rules) > WIDE_CAT_DOMAIN  # depth-1 nodes really split

    forced_driver = Tr.train(
        df, schema, max_depth=2, driver_stats_max_rows=10**9
    )
    assert _model_key(default) == _model_key(forced_driver)
