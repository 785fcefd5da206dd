"""C4.5 tree induction: level-synchronous frontier loop + decision-list model.

The reference grows the tree breadth-first, one MapReduce job per level,
with the frontier shipped to mappers via the distributed cache and the
model accumulated as a queue of conjunctive rules
(`/root/reference/src/program/Main.java:59-131`, `Rule.java:7-56`). Here the
loop is driver-side Python around DataFrame jobs:

- the frontier is tiny (≤ nodes at one depth), so rule matching is a
  CASE WHEN chain compiled into the scan — no join, no shuffle; frontier
  rules partition the data, so each row gets exactly one ``rid``;
- the training DataFrame is cached once (the reference re-reads HDFS every
  level, `Main.java:200`);
- per level: contingency aggregation + gain-ratio stats (c45_stats) and a
  ``collect()`` of a ≤(|frontier|×|attrs|)-row result replaces the
  reference's HDFS file round-trip (`Main.java:218-269`).

Deliberate divergences from the reference (SURVEY.md quirk ledger):
leaf labels are honest majority votes, not last-seen class (Q3); numeric
boundaries are per-rule, never leaked across siblings (Q2); rules whose
statistics vanish or whose numeric splits all fail the 10% guard become
majority-label leaves instead of silently dropping their rows (Q5).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from c4_5decisiontreebasedonmapreduce_spark.operators import c45_stats as S
from c4_5decisiontreebasedonmapreduce_spark.sources.tsv import TrainingSchema

OP_EQ, OP_LE, OP_GT = "==", "<=", ">"


@dataclass(frozen=True)
class Condition:
    """One conjunct: categorical equality or a numeric half-space — the
    reference's ``attrId → value`` map entry with synthetic ``"<=b"``/
    ``">b"`` values (`Rule.java:7-14`, `Main.java:244-245`)."""

    attr: str
    op: str  # OP_EQ | OP_LE | OP_GT
    value: str | float

    def column(self) -> Column:
        c = F.col(self.attr)
        if self.op == OP_EQ:
            return c == F.lit(self.value)
        if self.op == OP_LE:
            return c <= F.lit(float(self.value))
        return c > F.lit(float(self.value))

    def sql(self) -> str:
        if self.op == OP_EQ:
            return f"\"{self.attr}\" = '{self.value}'"
        return f'"{self.attr}" {self.op} {float(self.value)!r}'


@dataclass
class Rule:
    """A decision-list entry: conjunction of conditions + (when finished)
    a label. ``label is None`` marks an interior/frontier rule — the
    reference's ``label == ""`` convention (`Rule.java:12-14`)."""

    conditions: tuple[Condition, ...] = ()
    label: str | None = None
    n: int = 0
    depth: int = 0

    def predicate(self) -> Column:
        col = F.lit(True)
        for c in self.conditions:
            col = col & c.column()
        return col

    def used_attrs(self) -> set[str]:
        # only categorical equality exhausts an attribute; a numeric
        # attribute may split repeatedly at different boundaries
        # (the reference's unused-attr check `MyMapper.java:36-37` excludes
        # any conditioned attr; for numerics we diverge deliberately —
        # standard C4.5 allows re-splitting numeric attrs).
        return {c.attr for c in self.conditions if c.op == OP_EQ}

    def child(self, cond: Condition) -> "Rule":
        return Rule(self.conditions + (cond,), None, 0, self.depth + 1)


@dataclass
class DecisionListModel:
    """Finished model: ordered rules, equivalent to root-to-leaf paths
    (`Main.java:39,128-131`)."""

    rules: list[Rule] = field(default_factory=list)
    label_col: str = "label"

    def prediction_column(self, default: str | None = None) -> Column:
        """Compile the decision list into one nested CASE WHEN — the
        prediction path the reference lacks entirely."""
        expr = F.lit(default)
        # later rules never overlap earlier ones (leaves partition the
        # space), so order is irrelevant; build reversed for when-chaining
        for r in reversed(self.rules):
            expr = F.when(r.predicate(), F.lit(r.label)).otherwise(expr)
        return expr

    def transform(self, df: DataFrame, out_col: str = "prediction") -> DataFrame:
        return df.withColumn(out_col, self.prediction_column())

    def to_df(self, spark) -> DataFrame:
        schema = T.StructType(
            [
                T.StructField(
                    "conditions",
                    T.ArrayType(
                        T.StructType(
                            [
                                T.StructField("attr", T.StringType()),
                                T.StructField("op", T.StringType()),
                                T.StructField("value", T.StringType()),
                            ]
                        )
                    ),
                ),
                T.StructField("label", T.StringType()),
                T.StructField("n", T.LongType()),
                T.StructField("depth", T.IntegerType()),
            ]
        )
        rows = [
            (
                [(c.attr, c.op, str(c.value)) for c in r.conditions],
                r.label,
                r.n,
                r.depth,
            )
            for r in self.rules
        ]
        return spark.createDataFrame(rows, schema)

    def to_json(self) -> str:
        return json.dumps(
            [
                {
                    "conditions": [
                        {"attr": c.attr, "op": c.op, "value": c.value}
                        for c in r.conditions
                    ],
                    "label": r.label,
                    "n": r.n,
                    "depth": r.depth,
                }
                for r in self.rules
            ]
        )


def _rid_column(frontier: list[Rule]) -> Column:
    """Compile the frontier into a single CASE WHEN producing the matching
    rule id — the Spark-side replacement for broadcasting the queue file
    and testing every rule per row (`MyMapper.java:33-35,63-85`)."""
    expr = F.lit(None).cast("int")
    for i, r in reversed(list(enumerate(frontier))):
        expr = F.when(r.predicate(), F.lit(i)).otherwise(expr)
    return expr


def train(
    df: DataFrame,
    schema: TrainingSchema,
    max_depth: int = 8,
    min_ratio: float = 0.1,
    min_rows: int = 2,
    cache: bool = True,
) -> DecisionListModel:
    """Grow a C4.5 tree level-synchronously; return the decision list.

    One pass over the (cached) data per level, statistics in ≤3 exchanges:
    melt→contingency groupBy, the numeric window, and the per-node class
    histogram. All collected results are ≤ |frontier|×|attrs| rows.
    """
    attr_order = [a.name for a in schema.features]
    cat_names = [a.name for a in schema.categorical]
    num_names = [a.name for a in schema.numeric]
    cat_domains = {a.name: list(a.domain) for a in schema.categorical}
    label_domain = list(schema.label_domain)

    base = df.select(*attr_order, schema.label)
    if cache:
        base = base.cache()

    model = DecisionListModel(rules=[], label_col=schema.label)
    frontier: list[Rule] = [Rule()]  # root: empty conjunction

    try:
        while frontier:
            level = base.withColumn(S.RID, _rid_column(frontier)).where(
                F.col(S.RID).isNotNull()
            )

            # per-node class histograms → info, majority label, purity
            cc = S.node_class_counts(level, schema.label).collect()
            hist: dict[int, dict[str, int]] = {}
            for row in cc:
                hist.setdefault(row[S.RID], {})[row[S.CLASS]] = row[S.CNT]

            # decide which nodes even need statistics
            need_stats: list[int] = []
            decided: dict[int, str] = {}
            for i, rule in enumerate(frontier):
                h = hist.get(i)
                if not h:  # no rows reached this node (empty domain value)
                    decided[i] = _majority(
                        _parent_hist(hist, frontier, i) or {}, label_domain
                    )
                    continue
                total = sum(h.values())
                if (
                    len(h) == 1
                    or total < min_rows
                    or rule.depth >= max_depth
                ):
                    decided[i] = _majority(h, label_domain)
                else:
                    need_stats.append(i)

            best_rows = []
            if need_stats:
                active = level.where(
                    F.col(S.RID).isin([int(i) for i in need_stats])
                )
                info_df = S.node_info(
                    S.node_class_counts(active, schema.label)
                )
                stats = []
                if cat_names:
                    cont_c = S.contingency(
                        S.melt(active, cat_names, schema.label)
                    )
                    stats.append(
                        S.categorical_stats(cont_c, info_df).select(
                            S.RID,
                            S.AID,
                            "gain_ratio",
                            F.lit(None).cast("double").alias("boundary"),
                        )
                    )
                if num_names:
                    cont_n = S.contingency(
                        S.melt(active, num_names, schema.label, numeric=True)
                    )
                    stats.append(
                        S.numeric_best_split(
                            cont_n, info_df, label_domain, min_ratio
                        ).select(S.RID, S.AID, "gain_ratio", "boundary")
                    )
                allstats = stats[0]
                for s in stats[1:]:
                    allstats = allstats.unionByName(s)
                # exclude attributes already exhausted by each rule
                exhausted = [
                    (int(i), a)
                    for i in need_stats
                    for a in frontier[i].used_attrs()
                ]
                if exhausted:
                    ex_df = allstats.sparkSession.createDataFrame(
                        exhausted, f"{S.RID} int, {S.AID} string"
                    )
                    allstats = allstats.join(
                        F.broadcast(ex_df), [S.RID, S.AID], "left_anti"
                    )
                best_rows = S.best_attribute(allstats, attr_order).collect()

            best = {r[S.RID]: r for r in best_rows}
            next_frontier: list[Rule] = []
            for i, rule in enumerate(frontier):
                h = hist.get(i, {})
                total = sum(h.values())
                if i in decided:
                    model.rules.append(
                        Rule(rule.conditions, decided[i], total, rule.depth)
                    )
                    continue
                b = best.get(i)
                if b is None:
                    # no attribute with positive gain (or all numeric
                    # splits failed the guard): honest majority leaf (Q5)
                    model.rules.append(
                        Rule(
                            rule.conditions,
                            _majority(h, label_domain),
                            total,
                            rule.depth,
                        )
                    )
                    continue
                aid = b[S.AID]
                if b["boundary"] is not None:
                    bd = float(b["boundary"])
                    next_frontier.append(rule.child(Condition(aid, OP_LE, bd)))
                    next_frontier.append(rule.child(Condition(aid, OP_GT, bd)))
                else:
                    for v in cat_domains[aid]:
                        next_frontier.append(rule.child(Condition(aid, OP_EQ, v)))
            frontier = next_frontier
    finally:
        if cache:
            base.unpersist()
    return model


def _majority(h: dict[str, int], label_domain: list[str]) -> str:
    """Majority class, ties broken by ascending label string — the honest,
    deterministic replacement for the reference's last-seen/first-buffered
    label (Q3, `MyReducer.java:63,103-104,201-202`). Matches the
    ``leaf_detect`` operator's (cnt desc, class asc) ordering."""
    if not h:
        return min(label_domain)
    return min(h.items(), key=lambda kv: (-kv[1], kv[0]))[0]


def _parent_hist(
    hist: dict[int, dict[str, int]], frontier: list[Rule], i: int
) -> dict[str, int] | None:
    """Fallback label source for a zero-row child: pool the histograms of
    its siblings (= the parent's distribution)."""
    sibs = [
        h
        for j, h in hist.items()
        if frontier[j].conditions[:-1] == frontier[i].conditions[:-1]
    ]
    pooled: dict[str, int] = {}
    for h in sibs:
        for k, v in h.items():
            pooled[k] = pooled.get(k, 0) + v
    return pooled or None


def accuracy(model: DecisionListModel, df: DataFrame, label: str) -> float:
    pred = model.transform(df)
    agg = pred.select(
        F.avg((F.col("prediction") == F.col(label)).cast("double")).alias("a")
    ).collect()
    return float(agg[0]["a"])
