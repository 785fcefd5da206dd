"""Model-based quality filtering (`operators/quality_model.py`): the
distilled logistic scorer must (a) actually learn the rule gate it is
distilled from, (b) score identically through the exported portable SQL
on DuckDB — the deployment story — and (c) stay a pure-Column scoring
path (no Python, no extra scans)."""

import math

from pyspark.sql import functions as F

from c4_5decisiontreebasedonmapreduce_spark.operators import (
    quality_model as QM,
)
from c4_5decisiontreebasedonmapreduce_spark.operators import text as TX
from tests.oracle_utils import duck_connection


def _fit(spark, sf_dir):
    signals = TX.quality_signals(spark, sf_dir).localCheckpoint()
    return signals, QM.train_quality_scorer(signals)


def test_distillation_learns_the_gate(spark, sf_small):
    """At convergence the smooth scorer reproduces the hard conjunction
    on nearly every document (the boundary cases are the point of using
    a classifier — but they must be FEW)."""
    signals, scorer = _fit(spark, sf_small)
    scored = QM.score_documents(signals, scorer).join(
        signals.select("doc_id", "keep"), "doc_id"
    )
    n = scored.count()
    agree = scored.where(F.col("keep") == F.col("model_keep")).count()
    assert n > 0
    assert agree / n >= 0.9, (agree, n)
    # scores are genuine probabilities, not saturated constants: the L2
    # term must have kept the separable fit finite
    lo, hi = scored.agg(
        F.min("quality_score"), F.max("quality_score")
    ).first()
    assert 0.0 <= lo < 0.5 < hi <= 1.0


def test_sql_export_matches_spark_scoring(spark, sf_small):
    """Cross-engine parity (the to_sql_case pattern): DuckDB evaluating
    the exported arithmetic over ITS OWN quality_signals relation equals
    Spark's Column scorer per document — same feature doubles (both
    sides round signals to 6), same repr-exact coefficients, EXP-ulp
    tolerance only."""
    signals, scorer = _fit(spark, sf_small)
    spark_scores = {
        r["doc_id"]: r["s"]
        for r in signals.select(
            "doc_id", scorer.score_column().alias("s")
        ).collect()
    }
    con = duck_connection(sf_small)
    try:
        rows = con.execute(
            f"SELECT doc_id, {scorer.to_sql_expr()} AS s"
            f" FROM ({TX.QUALITY_SIGNALS_SQL})"
        ).fetchall()
    finally:
        con.close()
    assert len(rows) == len(spark_scores)
    for doc_id, s in rows:
        assert math.isclose(
            s, spark_scores[doc_id], rel_tol=1e-9, abs_tol=1e-12
        ), doc_id


def test_sql_expr_is_selfcontained_sigmoid():
    """The exported text must evaluate standalone: literal features in,
    hand-computed sigmoid out."""
    import duckdb

    scorer = QM.QualityScorer(
        intercept=-1.5, weights=(0.01, 2.0, 1.0, -3.0, 0.0)
    )
    feats = dict(
        n_tokens=120,
        distinct_ratio=0.55,
        frac_alpha_words=0.9,
        top_word_frac=0.05,
        top_bigram_frac=0.02,
    )
    cols = ", ".join(f"{v} AS {k}" for k, v in feats.items())
    got = duckdb.execute(
        f"SELECT {scorer.to_sql_expr()} FROM (SELECT {cols})"
    ).fetchone()[0]
    z = -1.5 + 0.01 * 120 + 2.0 * 0.55 + 1.0 * 0.9 - 3.0 * 0.05
    assert math.isclose(got, 1.0 / (1.0 + math.exp(-z)), rel_tol=1e-12)
    # zero weights are elided from the text, not rendered as dead terms
    assert "top_bigram_frac" not in scorer.to_sql_expr()


def test_scoring_path_is_jvm_only(spark, sf_small):
    """The scorer is a Column: the scored plan contains no Python
    evaluation nodes and adds no scan beyond the signals relation."""
    import contextlib
    import io

    signals, scorer = _fit(spark, sf_small)
    df = QM.score_documents(signals, scorer)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert p.count(") Scan parquet") == 0  # reads the checkpoint only
