"""Model-based quality filtering: distill the rule-based quality gate
into a portable logistic scorer.

Production curation pipelines (GPT-3, LLaMA, Gopher lineage) filter
documents with a trained lightweight classifier rather than hard
thresholds: the classifier smooths the rule boundary, gives a tunable
score, and is cheap enough to run over the full corpus. The reference
has nothing of the kind (it is a training-only tree program,
`Main.java:128-131` just prints rules); this module supplies the
pattern the engine's curation surface needs on top of
:func:`operators.text.quality_signals`:

- **train**: MLlib ``LogisticRegression`` over the five signal columns,
  labeled by the existing rule gate (``keep``) — distillation, so the
  smooth scorer can replace the brittle conjunction at serving time.
  Training cost is one pass over the signals relation; at 100 TB the
  signals themselves are the expensive part and they are already a
  bench-tracked one-scan pipeline (``quality_signals``).
- **score**: a pure ``Column`` expression — sigmoid of the weighted
  signal sum — evaluated JVM-side in the same projection as the signal
  computation; no Python in the scoring path.
- **export**: :meth:`QualityScorer.to_sql_expr` renders the scorer as
  ONE ANSI-SQL arithmetic expression, the same any-engine deployment
  story as ``DecisionListModel.to_sql_case`` (cross-engine parity with
  DuckDB pinned in tests/test_quality_model.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: the signal columns of operators/text.py::quality_signals, in the
#: fixed order the coefficient vector is reported in
FEATURES = (
    "n_tokens",
    "distinct_ratio",
    "frac_alpha_words",
    "top_word_frac",
    "top_bigram_frac",
)


@dataclass(frozen=True)
class QualityScorer:
    """A fitted logistic scorer: P(keep) = sigmoid(intercept + w·x)."""

    intercept: float
    weights: tuple[float, ...]  # aligned with FEATURES

    def _z(self) -> Column:
        z = F.lit(float(self.intercept))
        for name, w in zip(FEATURES, self.weights):
            z = z + F.lit(float(w)) * F.col(name).cast("double")
        return z

    def score_column(self) -> Column:
        """P(keep) as a pure Column over the signal columns — evaluates
        inside whole-stage codegen, no Python in the scoring path."""
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-self._z()))

    def to_sql_expr(self) -> str:
        """The scorer as one portable ANSI-SQL expression over columns
        named like FEATURES. ``repr`` round-trips every float64 exactly,
        and each literal is CAST to DOUBLE — engines that read bare
        decimal literals as fixed-point DECIMAL (DuckDB) would otherwise
        overflow or truncate the coefficients."""

        def lit(x: float) -> str:
            return f"CAST({x!r} AS DOUBLE)"

        terms = " + ".join(
            f"({lit(w)} * {name})"
            for name, w in zip(FEATURES, self.weights)
            if w != 0.0
        )
        z = lit(self.intercept) + (f" + {terms}" if terms else "")
        return f"1.0 / (1.0 + EXP(-({z})))"


def train_quality_scorer(
    signals: DataFrame, label_col: str = "keep", max_iter: int = 100
) -> QualityScorer:
    """Fit the distillation logistic regression on a
    ``quality_signals`` relation (any DataFrame carrying FEATURES + a
    boolean ``label_col``). Light L2 (regParam 1e-3) keeps the
    coefficients finite when the rule gate is perfectly separable —
    without it LBFGS walks the weights toward infinity and the exported
    SQL would be all saturated 0/1 scores."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    va = VectorAssembler(inputCols=list(FEATURES), outputCol="features")
    df = signals.withColumn(
        "label", F.col(label_col).cast("double")
    ).select("label", *FEATURES)
    m = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        maxIter=max_iter,
        regParam=1e-3,
    ).fit(va.transform(df))
    return QualityScorer(
        float(m.intercept), tuple(float(c) for c in m.coefficients)
    )


def score_documents(
    signals: DataFrame, scorer: QualityScorer, threshold: float = 0.5
) -> DataFrame:
    """Score every document and gate at ``threshold``: one projection
    over the signals relation, nothing else."""
    return signals.select(
        "doc_id",
        F.round(scorer.score_column(), 6).alias("quality_score"),
        (scorer.score_column() >= F.lit(threshold)).alias("model_keep"),
    )
