"""MLlib cross-check path for tree training (SURVEY.md §5.3).

The engine's SQL-path C4.5 (operators/tree.py) reproduces the reference's
gain-ratio semantics exactly; MLlib's `DecisionTreeClassifier` is the
industrial-scale alternative (information gain + binning, level-synchronous
statistics internally — the same algorithmic shape the reference hand-rolls
on MapReduce). Trees differ in detail by design; train-set accuracy must be
comparable. Kept as a cross-check, not an oracle.
"""

from __future__ import annotations

from pyspark.ml import Pipeline
from pyspark.ml.classification import DecisionTreeClassifier
from pyspark.ml.feature import StringIndexer, VectorAssembler
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from c4_5decisiontreebasedonmapreduce_spark.sources.tsv import TrainingSchema


def mllib_tree_accuracy(
    df: DataFrame, schema: TrainingSchema, max_depth: int = 8
) -> float:
    """Fit DecisionTreeClassifier (entropy impurity) on the same training
    table; return train-set accuracy."""
    stages = []
    feature_cols = []
    for a in schema.features:
        if a.is_numeric:
            feature_cols.append(a.name)
        else:
            idx = f"{a.name}__idx"
            stages.append(
                StringIndexer(
                    inputCol=a.name, outputCol=idx, handleInvalid="keep"
                )
            )
            feature_cols.append(idx)
    stages.append(
        StringIndexer(inputCol=schema.label, outputCol="label__idx")
    )
    stages.append(
        VectorAssembler(inputCols=feature_cols, outputCol="features")
    )
    stages.append(
        DecisionTreeClassifier(
            featuresCol="features",
            labelCol="label__idx",
            impurity="entropy",
            maxDepth=max_depth,
            seed=42,
        )
    )
    model = Pipeline(stages=stages).fit(df)
    pred = model.transform(df)
    return float(
        pred.select(
            F.avg(
                (F.col("prediction") == F.col("label__idx")).cast("double")
            )
        ).collect()[0][0]
    )
