"""Cross-validation against MLlib (SURVEY.md §5.3): our SQL-path C4.5 and
MLlib's DecisionTreeClassifier must reach comparable train accuracy on the
same data (trees differ — gain ratio vs binned info gain — by design)."""

from c4_5decisiontreebasedonmapreduce_spark.operators import tree as Tr
from c4_5decisiontreebasedonmapreduce_spark.operators.mllib import (
    mllib_tree_accuracy,
)
from c4_5decisiontreebasedonmapreduce_spark.operators.training import (
    LINEITEM_TRAINING_SCHEMA,
    lineitem_training,
)


def test_sql_path_vs_mllib_accuracy(spark, sf_small):
    df = lineitem_training(spark, sf_small)
    ours = Tr.train(df, LINEITEM_TRAINING_SCHEMA, max_depth=4, min_rows=50)
    acc_ours = Tr.accuracy(ours, df, LINEITEM_TRAINING_SCHEMA.label)
    acc_mllib = mllib_tree_accuracy(df, LINEITEM_TRAINING_SCHEMA, max_depth=4)
    # both must clearly beat the majority-class baseline and be close
    majority = (
        df.groupBy(LINEITEM_TRAINING_SCHEMA.label).count().agg({"count": "max"})
    ).collect()[0][0] / df.count()
    assert acc_ours >= majority - 1e-9
    assert abs(acc_ours - acc_mllib) < 0.1, (acc_ours, acc_mllib)
