from c4_5decisiontreebasedonmapreduce_spark.functions.entropy import (
    entropy_from_counts,
    xlog2x,
)

__all__ = ["xlog2x", "entropy_from_counts"]
