"""Entropy as pure Column expressions.

The reference computes ``Info = -Σ p·log2 p`` with row-at-a-time Java loops
(`/root/reference/src/program/MyReducer.java:243-280`). Here the same
quantities are closed-form aggregates that stay inside whole-stage codegen:

    H({c_i}) = -Σ (c_i/n)·log2(c_i/n)  =  log2(n) - Σ c_i·log2(c_i) / n

so one ``groupBy().agg(sum(cnt), sum(xlog2x(cnt)))`` yields the entropy of a
group — no second pass to form probabilities, and Spark's partial
aggregation means only (group, two doubles) cross the shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def xlog2x(c: Column) -> Column:
    """``c * log2(c)`` with the information-theoretic ``0·log2(0) = 0``."""
    return F.when(c > 0, c * F.log2(c)).otherwise(F.lit(0.0))


def entropy_from_counts(total: Column, sum_xlog2x: Column) -> Column:
    """Entropy of a discrete distribution given ``n = Σc_i`` and
    ``Σ c_i·log2(c_i)``; 0 for an empty/singleton group."""
    return F.when(total > 0, F.log2(total) - sum_xlog2x / total).otherwise(
        F.lit(0.0)
    )
