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

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from c4_5decisiontreebasedonmapreduce_spark.operators import c45_stats as S
from c4_5decisiontreebasedonmapreduce_spark.sources.tsv import TrainingSchema

OP_EQ, OP_LE, OP_GT = "==", "<=", ">"

# Upper bound on contingency rows the driver-side stats path may collect.
# The contingency is ≤ |frontier| × (Σ_cat |domain| + Σ_num bins) × |classes|
# rows REGARDLESS of data volume (quantile binning caps numeric cardinality),
# so at ~40 bytes/row this caps driver transfer at ~160 MB — the same
# bounded-stats-collection contract MLlib's tree trainer relies on. Wider
# frontiers/schemas fall back to the fully distributed reduction.
_DRIVER_STATS_MAX_ROWS = 4_000_000


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
            v = str(self.value).replace("'", "''")
            return f"\"{self.attr}\" = '{v}'"
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
    # training class histogram at the leaf, sorted by label — carried
    # only on freshly trained models (compare=False keeps rule equality,
    # and every serde wire format, unchanged). Error-based pruning
    # (operators/pruning.py) needs it to pool sibling distributions.
    hist: tuple[tuple[str, int], ...] = field(default=(), compare=False)

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

    @property
    def majority_label(self) -> str | None:
        """Training-majority label: leaf rules partition the training
        set, so summing leaf counts per label recovers the full class
        distribution (ties break to the lexicographically smallest label
        for determinism)."""
        totals: dict[str, int] = {}
        for r in self.rules:
            if r.label is not None:
                totals[r.label] = totals.get(r.label, 0) + r.n
        if not totals:
            return None
        return min(totals.items(), key=lambda kv: (-kv[1], kv[0]))[0]

    def prediction_column(self, default: str | None = None) -> Column:
        """Compile the decision list into a TRIE of nested CASE WHENs —
        the prediction path the reference lacks entirely.

        Rules are root-to-leaf paths, so they share condition prefixes;
        compiling the shared trie keeps the expression O(tree nodes) and
        evaluates each condition once per row. A flat rule-by-rule WHEN
        chain is O(rules × depth) and overflows JVM method-size limits
        around depth 8 (codegen falls back to interpreted row scans).

        Rows no trie path matches — i.e. a categorical value outside the
        training domain — predict ``default``, which falls back to the
        training-majority label (the reference crashes/drops such rows,
        SURVEY quirk Q5; in-domain rows always reach a leaf, so their
        predictions are unaffected)."""
        if default is None:
            default = self.majority_label
        remaining = [(r.conditions, r.label) for r in self.rules]
        return self._compile_trie(remaining, default)

    @staticmethod
    def _compile_trie(
        rules: list[tuple[tuple[Condition, ...], str | None]],
        default: str | None,
    ) -> Column:
        exact = [label for conds, label in rules if not conds]
        if exact:
            # a fully-matched rule: leaves partition the space, so there
            # is at most one
            return F.lit(exact[0])
        groups: dict[Condition, list] = {}
        for conds, label in rules:
            groups.setdefault(conds[0], []).append((conds[1:], label))
        chain = None
        for cond, sub in groups.items():
            inner = DecisionListModel._compile_trie(sub, default)
            chain = (F.when if chain is None else chain.when)(
                cond.column(), inner
            )
        return chain.otherwise(F.lit(default))

    def transform(self, df: DataFrame, out_col: str = "prediction") -> DataFrame:
        return df.withColumn(out_col, self.prediction_column())

    def to_df(self, spark) -> DataFrame:
        """The model as a relation — one row per rule, ``rule_id``
        carrying the list position so a columnar roundtrip
        (:meth:`save_parquet` / :meth:`load_parquet`) reconstructs the
        decision list deterministically regardless of file/row order."""
        schema = T.StructType(
            [
                T.StructField("rule_id", T.IntegerType()),
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
                i,
                [(c.attr, c.op, str(c.value)) for c in r.conditions],
                r.label,
                r.n,
                r.depth,
            )
            for i, r in enumerate(self.rules)
        ]
        return spark.createDataFrame(rows, schema)

    def to_sql_case(self, default: str | None = None) -> str:
        """Render the model as ONE portable ANSI SQL CASE expression —
        scoring without Spark, on any SQL engine (the deployment story
        the reference's stdout print cannot offer). Flat WHEN-per-rule:
        the rules partition the feature space, so first-match ==
        only-match and flat order is semantics-free; the trie compile
        (:meth:`prediction_column`) is a Spark-codegen optimization the
        SQL text doesn't need at model sizes. Out-of-domain rows fall to
        ``default`` (training majority), matching ``transform``.
        Identifiers are double-quoted, values single-quote-escaped.
        Cross-engine parity — DuckDB executing this text equals Spark's
        ``transform`` row-for-row — is pinned by
        tests/test_tree_golden.py::test_model_sql_export_matches_transform."""
        if default is None:
            default = self.majority_label

        def lit(s: str | None) -> str:
            # an interior (label-None) rule predicts NULL in transform
            # (_compile_trie emits F.lit(None)) — the SQL must agree,
            # not substitute the default
            if s is None:
                return "NULL"
            return "'" + s.replace("'", "''") + "'"

        whens = []
        for r in self.rules:
            if not r.conditions:
                whens.append(f"WHEN TRUE THEN {lit(r.label)}")
            else:
                pred = " AND ".join(c.sql() for c in r.conditions)
                whens.append(f"WHEN {pred} THEN {lit(r.label)}")
        tail = f" ELSE {lit(default)}" if default is not None else ""
        return "CASE " + " ".join(whens) + tail + " END"

    def save_parquet(self, spark, path: str) -> None:
        """Columnar model sink (VERDICT r6 item 6): persist the decision
        list as a parquet relation via :meth:`to_df`, matching the
        engine's own sink story (`sink_model`, SURVEY §2.A #20 — the
        reference only prints rules to stdout, `Main.java:128-131`).
        One file: a model is rules-count-sized, never data-sized."""
        self.to_df(spark).coalesce(1).write.mode("overwrite").parquet(path)

    @classmethod
    def load_parquet(
        cls, spark, path: str, label_col: str = "label"
    ) -> "DecisionListModel":
        """Rebuild the model from the parquet relation, restoring list
        order from ``rule_id`` and re-typing numeric half-space
        condition values (stored as strings, same convention as the
        JSON serde)."""
        rows = spark.read.parquet(path).orderBy("rule_id").collect()
        rules = [
            Rule(
                tuple(
                    Condition(
                        c["attr"],
                        c["op"],
                        c["value"] if c["op"] == OP_EQ else float(c["value"]),
                    )
                    for c in r["conditions"]
                ),
                r["label"],
                r["n"],
                r["depth"],
            )
            for r in rows
        ]
        return cls(rules=rules, label_col=label_col)

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

    @classmethod
    def from_json(cls, text: str, label_col: str = "label") -> "DecisionListModel":
        rules = [
            Rule(
                tuple(
                    Condition(
                        c["attr"],
                        c["op"],
                        c["value"] if c["op"] == OP_EQ else float(c["value"]),
                    )
                    for c in r["conditions"]
                ),
                r["label"],
                r["n"],
                r["depth"],
            )
            for r in json.loads(text)
        ]
        return cls(rules=rules, label_col=label_col)

    def to_reference_text(self, attr_order: list[str]) -> list[str]:
        """Render the model in the reference's exact wire format, one
        rule per line: ``aid1,val1&aid2,val2&...:label``
        (`Rule.java:22-33`). Attribute ids are indices into
        ``attr_order`` (the attributes-file order, `Main.java:137-152`);
        numeric conditions render as the synthetic ``<=b`` / ``>b``
        domain values the reference's driver substitutes
        (`Main.java:244-245`). One documented divergence: the
        reference's ``Rule.toString`` crashes on a condition-less rule
        (root-is-leaf, quirk Q4 in SURVEY.md) — ours renders it as
        ``:label``.

        FORMAT CONSTRAINT (shared with the reference, which never
        validates it): ``,``/``&``/``:`` are structural delimiters, so a
        categorical value or label containing one — or an OP_EQ value
        beginning with ``<=`` / ``>``, which re-parses as a numeric
        half-space — would render a line that silently mis-parses.
        Such models raise ValueError here instead of corrupting the
        wire text (ADVICE r6)."""
        aid = {a: i for i, a in enumerate(attr_order)}
        lines = []
        for r in self.rules:
            for c in r.conditions:
                if c.op == OP_EQ:
                    v = str(c.value)
                    if any(d in v for d in ",&:"):
                        raise ValueError(
                            f"categorical value {v!r} contains a wire-"
                            "format delimiter (one of ',', '&', ':') and"
                            " cannot be rendered unambiguously"
                        )
                    if v.startswith(OP_LE) or v.startswith(OP_GT):
                        raise ValueError(
                            f"categorical value {v!r} starts with a "
                            "numeric half-space marker ('<=' or '>') and"
                            " would re-parse as a numeric condition"
                        )
            if r.label and any(d in r.label for d in ",&:"):
                raise ValueError(
                    f"label {r.label!r} contains a wire-format delimiter"
                    " (one of ',', '&', ':') and cannot be rendered"
                    " unambiguously"
                )
            conds = "&".join(
                f"{aid[c.attr]},"
                + (
                    str(c.value)
                    if c.op == OP_EQ
                    else f"{c.op}{float(c.value)!r}"
                )
                for c in r.conditions
            )
            lines.append(f"{conds}:{r.label or ''}")
        return lines

    @classmethod
    def from_reference_text(
        cls,
        lines: list[str],
        attr_order: list[str],
        label_col: str = "label",
    ) -> "DecisionListModel":
        """Parse the reference wire format back into a model
        (`Rule.java:37-56`). Numeric synthetic values ``<=b`` / ``>b``
        become proper half-space conditions, parsing the FULL boundary —
        the reference's own re-parse truncates its last character
        (quirk Q1, `MyMapper.java:97-100`), which we deliberately do
        not replicate."""
        rules = []
        for line in lines:
            conds_s, _, label = line.rpartition(":")
            conditions = []
            if conds_s:
                for item in conds_s.split("&"):
                    i, _, val = item.partition(",")
                    attr = attr_order[int(i)]
                    if val.startswith(OP_LE):
                        conditions.append(
                            Condition(attr, OP_LE, float(val[len(OP_LE):]))
                        )
                    elif val.startswith(OP_GT):
                        conditions.append(
                            Condition(attr, OP_GT, float(val[len(OP_GT):]))
                        )
                    else:
                        conditions.append(Condition(attr, OP_EQ, val))
            rules.append(Rule(tuple(conditions), label or None))
        return cls(rules=rules, label_col=label_col)

    def save(self, path: str) -> None:
        """Persist the model — the reference only prints it to stdout
        (`Main.java:128-131`)."""
        from pathlib import Path

        Path(path).write_text(self.to_json())

    @classmethod
    def load(cls, path: str, label_col: str = "label") -> "DecisionListModel":
        from pathlib import Path

        return cls.from_json(Path(path).read_text(), label_col)


#: the synthetic categorical value null features map to under
#: ``train(nulls="missing")`` — double-underscored so it cannot collide
#: with the lowercase-tokenized value space of real data
MISSING_CATEGORY = "__missing__"


def _prologue_scan(
    base: DataFrame,
    *,
    nulls: str,
    cat_names: list[str],
    num_names: list[str],
    label: str,
    cat_domains: dict[str, list[str]],
    max_bins: int,
    apply_to=None,
) -> tuple[DataFrame, dict[str, list[float]]]:
    """ONE multi-aggregate job over the training projection computing
    everything ``train()`` needs before level 0: per-column null counts
    (the missing-value audit), and per-numeric-attribute quantile split
    candidates (GK sketches via ``percentile_approx``, whose 0.5 entry
    doubles as the imputation median under ``nulls='missing'``).

    Returns ``(base', edges)`` where ``base'`` has the null policy
    applied (untouched when clean — bit-identical plan) and ``edges``
    maps each numeric attribute to ≤ max_bins+1 candidate boundaries.

    At 100 TB this is THE scan that matters: the previous design paid
    three full corpus passes before level 0 (null audit, row count,
    quantile sample/GK) — folding them into one aggregate trades a
    little per-row sketch CPU for two entire passes of I/O. Candidate
    edges only need to be representative (the stats computed AT the
    surviving candidates stay exact, see ``_snap_numeric``); sketch
    accuracy 1e4 is tighter than the old ``1/(4*max_bins)`` bound.
    Quantiles are computed over non-null values, so under
    ``nulls='missing'`` the imputed median is itself a data value that
    snapping maps to an exact candidate — no second pass needed.

    ``apply_to`` (optional zero-arg callable) supplies a DIFFERENT
    relation for the null-policy transforms to apply to — the caller's
    concurrently-materialized checkpoint of the same rows. It is
    resolved only AFTER the aggregate has run, so the caller's
    materialization job and this scan overlap. The aggregate itself
    always runs on ``base``: percentile_approx's GK sketch merge is
    partition-layout-dependent, and the model's split candidates (and
    the golden-oracle pins derived from them) are tied to the raw
    scan's layout."""
    if nulls not in ("reject", "missing", "fractional"):
        raise ValueError(
            "nulls must be 'reject', 'missing' or 'fractional', "
            f"got {nulls!r}"
        )
    cols = cat_names + num_names + [label]
    probs = sorted({i / max_bins for i in range(max_bins + 1)} | {0.5})
    med_idx = probs.index(0.5)
    aggs = [
        F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{i}")
        for i, c in enumerate(cols)
    ] + [
        F.percentile_approx(c, F.lit(probs), F.lit(10_000)).alias(
            f"__edges_{i}"
        )
        for i, c in enumerate(num_names)
    ]
    row = base.agg(*aggs).first()
    if apply_to is not None:
        base = apply_to()
    counts = {
        c: int(row[f"__nulls_{i}"] or 0) for i, c in enumerate(cols)
    }
    quants = {c: row[f"__edges_{i}"] for i, c in enumerate(num_names)}
    edges = {
        c: sorted({float(e) for e in (q or [])}) for c, q in quants.items()
    }
    if counts[label] > 0:
        raise ValueError(
            f"{counts[label]} rows have a NULL label ({label}); "
            "training cannot proceed under any nulls policy"
        )
    dirty = {c: n for c, n in counts.items() if c != label and n > 0}
    if not dirty or nulls == "fractional":
        # fractional (operators/fractional.py) keeps nulls null — the
        # router distributes their weight; edges over known values
        return base, edges
    if nulls == "reject":
        raise ValueError(
            "training features contain NULLs "
            f"({', '.join(f'{c}: {n}' for c, n in sorted(dirty.items()))}); "
            "pass train(..., nulls='missing') to branch/impute them"
        )
    cat_dirty = [c for c in cat_names if c in dirty]
    num_dirty = [c for c in num_names if c in dirty]
    if cat_dirty:
        base = base.fillna({c: MISSING_CATEGORY for c in cat_dirty})
        for c in cat_dirty:
            cat_domains[c].append(MISSING_CATEGORY)
    if num_dirty:
        empty = [c for c in num_dirty if quants[c] is None]
        if empty:
            raise ValueError(
                f"numeric feature(s) entirely NULL: {', '.join(empty)}; "
                "no median exists to impute — drop the column instead"
            )
        base = base.fillna(
            {c: float(quants[c][med_idx]) for c in num_dirty}
        )
    return base, edges


def _rid_column(frontier: list[Rule]) -> Column:
    """Compile the frontier into a single CASE WHEN producing the matching
    rule id — the Spark-side replacement for broadcasting the queue file
    and testing every rule per row (`MyMapper.java:33-35,63-85`)."""
    expr = F.lit(None).cast("int")
    for i, r in reversed(list(enumerate(frontier))):
        expr = F.when(r.predicate(), F.lit(i)).otherwise(expr)
    return expr


def _snap_numeric(
    df: DataFrame, edges_by_attr: dict[str, list[float]]
) -> DataFrame:
    """Quantile-bin numeric attributes to the given split candidates —
    the MLlib-style move that keeps per-level statistics bounded when a
    column is near-all-distinct (the reference instead buffers and scans
    every distinct value in reducer RAM, `MyReducer.java:112-205`).

    Every value is snapped UP to the smallest quantile edge ≥ it. Because
    edges are actual data values and ``v <= e  ⟺  snap(v) <= e`` for any
    edge ``e``, cumulative class counts at every surviving candidate
    boundary stay *exact* — binning only restricts the candidate set, it
    never distorts a candidate's entropy. At 100 TB this is what bounds
    the shuffle: ≤ max_bins rows per (node, attribute) regardless of data
    volume."""
    for a, uniq in edges_by_attr.items():
        arr = F.lit(uniq)  # one array literal, not max_bins scalar literals
        snapped = F.array_min(F.filter(arr, lambda e: e >= F.col(a)))
        # values above the top edge (possible only through quantile error)
        # keep their own value so ordering semantics never break
        df = df.withColumn(
            a, F.coalesce(snapped, F.col(a)).cast(dict(df.dtypes)[a])
        )
    return df


def train(
    df: DataFrame,
    schema: TrainingSchema,
    max_depth: int = 8,
    min_ratio: float = 0.1,
    min_rows: int = 2,
    cache: bool = True,
    max_bins: int = 256,
    driver_stats_max_rows: int = _DRIVER_STATS_MAX_ROWS,
    bug_compat: bool = False,
    prune: bool = False,
    prune_cf: float = 0.25,
    nulls: str = "reject",
) -> DecisionListModel:
    """Grow a C4.5 tree level-synchronously; return the decision list.

    ``bug_compat=True`` abandons this trainer's documented fixes and
    reproduces the reference AS BUILT — quirks Q1-Q5 included — via
    :func:`operators.bug_compat.train_reference_compat`, returning its
    :class:`ReferenceCompatModel` (whose ``stdout_lines()`` is byte-
    identical to the reference's final decision-list print,
    `Main.java:128-131`). All other keyword arguments are ignored in
    that mode: the reference has no depth cap, no min-rows guard beyond
    its hard-coded 10% numeric rule, and no binning.

    ``prune=True`` follows growth with C4.5's error-based pruning
    post-pass at confidence ``prune_cf`` (operators/pruning.py — the
    phase the reference omits entirely; its loop ends at the grown
    tree, `Main.java:123-131`).

    ``nulls`` is the missing-value policy. The reference has NO null
    concept (a missing TSV field shifts columns and corrupts the row,
    SURVEY §1.1); naively, a null in a chosen split attribute would
    silently drop the row mid-tree (no child predicate matches), so the
    policy is explicit: ``"reject"`` (default) fails fast with per-column
    null counts from one cheap audit aggregate; ``"missing"`` makes
    categorical nulls their own ``__missing__`` branch (appended to the
    declared domain, so the tree can SPLIT on missingness — it is often
    informative) and median-imputes numeric nulls (a null carries no
    ordering information for a threshold split); ``"fractional"``
    dispatches to :func:`operators.fractional.train_fractional` — the
    actual Quinlan C4.5 semantics: known-fraction gain scaling, an
    unknown pseudo-branch in the split information, and rows with an
    unknown split attribute routed to every child with weight
    proportional to the observed branch masses. A label null is always
    an error. With no nulls present, all three policies leave the data,
    domains, and resulting model identical (fractional: rule-for-rule,
    pinned in tests/test_fractional.py).

    One Spark action and ONE data-sized exchange per level: the mixed
    melt + grouped count; class histograms, categorical gain ratios and
    numeric best-splits all derive from that contingency. When the
    contingency's size bound (|frontier| × Σ domains/bins × |classes| ≤
    ``driver_stats_max_rows`` — data-volume-independent thanks to
    binning) permits, it is collected via Arrow and reduced in numpy
    (see :func:`_driver_level_stats`); otherwise the reduction runs
    distributed and the collected result is ≤ |frontier|×|attrs| rows.
    """
    if bug_compat:
        from c4_5decisiontreebasedonmapreduce_spark.operators.bug_compat import (
            train_reference_compat,
        )

        return train_reference_compat(df, schema)
    if nulls == "fractional":
        # true C4.5 missing-value semantics: known-fraction gain scaling,
        # unknown split-info branch, weight-proportional routing
        # (operators/fractional.py). Pruning operates on integer leaf
        # histograms, so the combination is rejected rather than wrong.
        if prune:
            raise ValueError(
                "prune=True is not supported with nulls='fractional' "
                "(EBP needs integer leaf histograms)"
            )
        from c4_5decisiontreebasedonmapreduce_spark.operators.fractional import (
            train_fractional,
        )

        return train_fractional(
            df,
            schema,
            max_depth=max_depth,
            min_ratio=min_ratio,
            min_rows=min_rows,
            cache=cache,
            max_bins=max_bins,
            driver_stats_max_rows=driver_stats_max_rows,
        )
    attr_order = [a.name for a in schema.features]
    cat_names = [a.name for a in schema.categorical]
    num_names = [a.name for a in schema.numeric]
    cat_domains = {a.name: list(a.domain) for a in schema.categorical}
    label_domain = list(schema.label_domain)

    spark = df.sparkSession
    base = df.select(*attr_order, schema.label)
    # ONE prologue scan: null audit + quantile candidates in a single
    # multi-aggregate job. The aggregate runs on the raw scan
    # (pre-repartition: the quantile sketches are layout-dependent and
    # it must not drag a shuffle through re-execution) — but with
    # cache=True it OVERLAPS the spread checkpoint's materialization:
    # the two jobs only share the source scan, and serially they cost
    # ~1.1 s + ~1.3 s at sf0.1 while overlapped they cost the max.
    # The null-policy transforms and the snap then stack on the
    # checkpoint, so level 0's eager checkpoint below reads memory
    # blocks instead of re-running scan+shuffle.
    prologue_kw = dict(
        nulls=nulls,
        cat_names=cat_names,
        num_names=num_names,
        label=schema.label,
        cat_domains=cat_domains,  # mutated: missing category appended
        max_bins=max_bins,
    )
    if cache:
        # a small parquet scan may yield very few partitions; every
        # per-level pass would then run on that many cores — spread the
        # (to-be-checkpointed) table across the cluster once
        par = spark.sparkContext.defaultParallelism
        spread = base
        if base.rdd.getNumPartitions() < par:
            spread = base.repartition(par)
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(1)
        try:
            raw_fut = pool.submit(
                lambda: spread.localCheckpoint(eager=True)
            )
            base, edges = _prologue_scan(
                base, apply_to=raw_fut.result, **prologue_kw
            )
        finally:
            pool.shutdown(wait=True)
    else:
        base, edges = _prologue_scan(base, **prologue_kw)
    base = _snap_numeric(base, edges)

    # per-level shuffles carry combined counts (≤ nodes×attrs×bins rows);
    # a handful of reduce partitions beats the session default — AQE
    # coalesces eventually, but the static setting skips the extra
    # scheduling rounds on these tiny exchanges. Restored on exit.
    shuffle_key = "spark.sql.shuffle.partitions"
    prev_shuffle = spark.conf.get(shuffle_key)

    model = DecisionListModel(rules=[], label_col=schema.label)
    frontier: list[Rule] = [Rule()]  # root: empty conjunction

    # node-id as a MATERIALIZED column updated incrementally per level
    # (MLlib's NodeIdCache pattern): each level's plan carries only that
    # level's split conditions instead of every root-to-frontier
    # conjunction — a flat frontier CASE WHEN grows with the full rule
    # set and at depth ≥8 overflows JVM method-size limits (codegen
    # fallback → interpreted row scans). The checkpoint also truncates
    # the max_bins-literal snap lineage (MLlib's iterative trainers
    # checkpoint for the same reason). Leaf rows drop out as they
    # resolve, so later levels scan strictly less data.
    level = base.withColumn(S.RID, F.lit(0).cast("int"))
    if cache:
        # eager: folding this materialization into level 0's action was
        # measured neutral-to-worse; the separate job keeps the first
        # level's timing observable
        level = level.localCheckpoint(eager=True)

    # per-node contingency row bound for the driver-side stats path:
    # classes × (1 cc pseudo-attr + Σ cat domains + Σ numeric edge
    # counts). Uses the DECLARED label domain: when data carries labels
    # outside it (possible only with a hand-written attributes file —
    # inferred schemas derive the domain from the data), the categorical
    # contingency still keeps those rows, so the realized transfer is
    # this same product with the TRUE class count — still
    # frontier × domain-sized, never data-sized; the guard's purpose
    # (bounding the Arrow collect) holds either way.
    stat_rows_per_node = len(label_domain) * (
        1
        + sum(len(d) for d in cat_domains.values())
        + sum(len(e) for e in edges.values())
    )

    try:
        spark.conf.set(shuffle_key, "8")
        _grow_levels(
            model=model,
            level=level,
            frontier=frontier,
            schema=schema,
            cat_names=cat_names,
            num_names=num_names,
            cat_domains=cat_domains,
            label_domain=label_domain,
            attr_order=attr_order,
            max_depth=max_depth,
            min_ratio=min_ratio,
            min_rows=min_rows,
            cache=cache,
            stat_rows_per_node=stat_rows_per_node,
            driver_stats_max_rows=driver_stats_max_rows,
        )
    finally:
        spark.conf.set(shuffle_key, prev_shuffle)
    if prune:
        # C4.5's error-based pruning post-pass (the reference has none —
        # operators/pruning.py): driver-side math over the finished
        # rules, zero additional Spark jobs at any scale.
        from c4_5decisiontreebasedonmapreduce_spark.operators.pruning import (
            ebp_prune,
        )

        return ebp_prune(model, cf=prune_cf)
    return model


def _level_rels(
    level: DataFrame,
    *,
    cat_names: list[str],
    num_names: list[str],
    label: str,
    label_domain: list[str],
    min_ratio: float,
    hist_only: bool,
) -> list[DataFrame]:
    """One level's statistics relations, uniformly projected to
    ``(kind, rid, aid, gain_ratio, boundary)`` so class histograms,
    categorical gain ratios and numeric best-splits all ride ONE action.

    ``hist_only`` (every node at this level is leaf-bound, i.e. the
    max-depth level) skips the attribute melt entirely: the deepest
    level has the widest frontier, so this drops the single largest
    shuffle of the whole training run down to a plain
    ``groupBy(rid, class)`` — the melt multiplies rows by |attrs|+1,
    and none of those stats can ever be used at a depth-capped node."""
    none_d = F.lit(None).cast("double")
    if hist_only:
        cc = level.groupBy(S.RID, F.col(label).alias(S.CLASS)).agg(
            F.count("*").alias(S.CNT)
        )
        return [
            cc.select(
                F.lit("cc").alias("kind"),
                S.RID,
                F.col(S.CLASS).alias(S.AID),
                F.col(S.CNT).cast("double").alias("gain_ratio"),
                none_d.alias("boundary"),
            )
        ]
    cont = S.mixed_contingency(
        S.melt_mixed(level, cat_names, num_names, label)
    )
    cc_counts = cont.where(F.col(S.AID) == S.CC_AID).select(
        S.RID, S.CLASS, S.CNT
    )
    info_df = S.node_info(cc_counts)  # broadcast — reused by both stats
    rels = [
        cc_counts.select(
            F.lit("cc").alias("kind"),
            S.RID,
            F.col(S.CLASS).alias(S.AID),
            F.col(S.CNT).cast("double").alias("gain_ratio"),
            none_d.alias("boundary"),
        )
    ]
    stats_parts = []
    if cat_names:
        cont_c = cont.where(F.col(S.AID).isin(cat_names)).select(
            S.RID, S.AID, F.col("value_s").alias(S.VALUE), S.CLASS, S.CNT
        )
        stats_parts.append(
            S.categorical_stats(cont_c, info_df).select(
                S.RID, S.AID, "gain_ratio", none_d.alias("boundary")
            )
        )
    if num_names:
        cont_n = cont.where(F.col(S.AID).isin(num_names)).select(
            S.RID, S.AID, F.col("value_d").alias(S.VALUE), S.CLASS, S.CNT
        )
        stats_parts.append(
            S.numeric_best_split(
                # binning caps groups at max_bins rows, so the plain
                # per-group window beats the bucketed prefix sum here
                cont_n, info_df, label_domain, min_ratio, bucketed=False
            ).select(S.RID, S.AID, "gain_ratio", "boundary")
        )
    stats = stats_parts[0]
    for part in stats_parts[1:]:
        stats = stats.unionByName(part)
    rels.append(
        stats.select(
            F.lit("st").alias("kind"), S.RID, S.AID, "gain_ratio", "boundary"
        )
    )
    return rels


def _decide_level(
    model: "DecisionListModel",
    frontier: list["Rule"],
    hist: dict[int, dict[str, int]],
    stats: dict[int, list],
    *,
    attr_order: list[str],
    cat_domains: dict[str, list[str]],
    label_domain: list[str],
    max_depth: int,
    min_rows: int,
    best: dict[int, tuple] | None = None,
) -> tuple[list["Rule"], list[tuple[int, list]]]:
    """Turn one level's collected statistics into leaves + splits.

    When ``best`` is given (the collected in-plan argmax) the split
    choice comes from it verbatim — the same relation that keyed the
    child level's statistics, so structure and stats can never disagree.
    Otherwise the classic driver-side argmax runs: gain_ratio > 0 only
    (the reference inits maxGR = 0, `Main.java:258-261`), skipping
    attributes exhausted by the rule, ties by declaration order."""
    next_frontier: list[Rule] = []
    splits: list[tuple[int, list[tuple[Condition, int]]]] = []
    attr_rank = {a: i for i, a in enumerate(attr_order)}
    for i, rule in enumerate(frontier):
        h = hist.get(i)
        if not h:  # no rows reached this node (empty domain value)
            label = _majority(
                _parent_hist(hist, frontier, i) or {}, label_domain
            )
            model.rules.append(Rule(rule.conditions, label, 0, rule.depth))
            continue
        total = sum(h.values())
        choice: tuple | None = None
        if best is not None:
            choice = best.get(i)
        elif not (
            len(h) == 1 or total < min_rows or rule.depth >= max_depth
        ):
            used = rule.used_attrs()
            # quantize before the argmax: the driver (numpy) and
            # distributed (JVM) stats paths agree formula-for-formula
            # but can differ in the last ulp; a raw float compare could
            # flip the winner on a near-tie depending on which path the
            # frontier-size guard picked. 1e-10 is far above ulp noise
            # and far below any genuine gain-ratio difference.
            cands = [
                (round(r["gain_ratio"], 10), r)
                for r in stats.get(i, [])
                if round(r["gain_ratio"], 10) > 0 and r[S.AID] not in used
            ]
            if cands:
                _, bst = max(
                    cands,
                    key=lambda t: (t[0], -attr_rank[t[1][S.AID]]),
                )
                choice = (bst[S.AID], bst["boundary"])
        if choice is None:
            # pure / too small / depth-capped / no positive gain (or all
            # numeric splits failed the guard): honest majority leaf (Q5)
            model.rules.append(
                Rule(
                    rule.conditions,
                    _majority(h, label_domain),
                    total,
                    rule.depth,
                    hist=tuple(sorted((k, int(v)) for k, v in h.items())),
                )
            )
            continue
        aid, bd = choice
        if bd is not None:
            bd = float(bd)
            conds = [Condition(aid, OP_LE, bd), Condition(aid, OP_GT, bd)]
        else:
            conds = [Condition(aid, OP_EQ, v) for v in cat_domains[aid]]
        children = []
        for c in conds:
            children.append((c, len(next_frontier)))
            next_frontier.append(rule.child(c))
        splits.append((i, children))
    return next_frontier, splits


def _spark_cond_sql(cond) -> str:
    """Spark-SQL text of one Condition, semantically identical to
    ``cond.column()``: backtick identifiers, ``D``-suffixed double
    literals (a bare ``3.5`` parses as DECIMAL in Spark SQL and would
    change the comparison's coercion), single-quote escaping for
    categorical values. (``Condition.sql()`` is the DuckDB dialect —
    double-quoted identifiers Spark only accepts under
    ansi.doubleQuotedIdentifiers.)"""
    attr = "`" + cond.attr.replace("`", "``") + "`"
    if cond.op == OP_EQ:
        v = str(cond.value).replace("'", "''")
        return f"{attr} = '{v}'"
    return f"{attr} {cond.op} {float(cond.value)!r}D"


def _apply_splits(
    level: DataFrame, splits: list[tuple[int, list]]
) -> DataFrame:
    """rid update: only this level's split conditions enter the plan.

    The expression is built as ONE SQL string parsed by one ``F.expr``
    call. The r12 shape built it from nested ``F.when`` Column objects —
    at 3-6 py4j round-trips per condition, a wide level's hundreds of
    conditions cost 0.7-1.1 s of pure driver latency per c45_train run
    (measured by phase-instrumentation; the numpy stats and the decide
    step are <0.06 s combined), serialized between the level actions
    exactly where VERDICT r12 item 4 saw the dispatch gaps. Parents are
    distinct, so the flat CASE is equivalent to the old
    COALESCE-of-WHENs: first matching parent wins, a parent whose child
    conditions all miss yields NULL either way, and non-parent rids
    yield NULL — dropped by the isNotNull filter as before."""
    arms = []
    for parent, children in splits:
        inner = " ".join(
            f"WHEN {_spark_cond_sql(cond)} THEN {int(cid)}"
            for cond, cid in children
        )
        arms.append(f"WHEN `{S.RID}` = {int(parent)} THEN (CASE {inner} END)")
    rid_expr = f"CAST((CASE {' '.join(arms)} END) AS INT)"
    return level.withColumn(S.RID, F.expr(rid_expr)).where(
        F.col(S.RID).isNotNull()
    )


def _xlog2x_np(a: np.ndarray) -> np.ndarray:
    """``c*log2(c)`` with 0·log2(0)=0 — numpy twin of functions.entropy."""
    out = np.zeros_like(a, dtype=np.float64)
    m = a > 0
    out[m] = a[m] * np.log2(a[m])
    return out


def _entropy_np(n: float, sum_xlog2x: float) -> float:
    """``log2(n) - Σc·log2(c)/n`` — numpy twin of entropy_from_counts."""
    return float(np.log2(n) - sum_xlog2x / n) if n > 0 else 0.0


def _gain_ratio_py(info: float, entr: float, split_info: float) -> float:
    """Python twin of :func:`c45_stats._gain_ratio_col` (incl. the
    reference's SplitI == 0 special case, `MyReducer.java:282-298`)."""
    if split_info == 0.0:
        return 0.0 if info == 0.0 else 0.00001
    return max(0.0, info - entr) / split_info


def _driver_level_stats(
    pdf,
    *,
    cat_names: list[str],
    num_names: list[str],
    label_domain: list[str],
    min_ratio: float,
) -> tuple[dict[int, dict[str, int]], dict[int, list]]:
    """Gain ratios + numeric best-splits computed driver-side from one
    level's collected contingency (``(rid, aid, value_s, value_d, class,
    cnt)`` rows, bounded — see ``_DRIVER_STATS_MAX_ROWS``).

    Numerically mirrors the distributed builders in
    :mod:`c45_stats` formula-for-formula (categorical_stats /
    numeric_best_split / node_info); ``test_tree_golden`` and the
    forced-distributed equivalence test pin the two paths to the same
    model. Returns the same ``(hist, stats)`` shapes
    :func:`_decide_level` consumes from the collected distributed rows.
    """
    classes = list(label_domain)
    cidx = {c: i for i, c in enumerate(classes)}
    k = len(classes)

    hist: dict[int, dict[str, int]] = {}
    cc = pdf[pdf[S.AID] == S.CC_AID]
    for rid, cls, cnt in zip(cc[S.RID], cc[S.CLASS], cc[S.CNT]):
        hist.setdefault(int(rid), {})[cls] = int(cnt)

    node_info: dict[int, float] = {}
    for rid, h in hist.items():
        counts = np.fromiter(h.values(), dtype=np.float64)
        node_info[rid] = _entropy_np(counts.sum(), _xlog2x_np(counts).sum())

    stats: dict[int, list] = {}

    def emit(rid: int, aid: str, gr: float, boundary) -> None:
        stats.setdefault(rid, []).append(
            {S.AID: aid, "gain_ratio": gr, "boundary": boundary}
        )

    if cat_names:
        sub = pdf[pdf[S.AID].isin(cat_names)]
        for (rid, aid), g in sub.groupby([S.RID, S.AID], sort=False):
            rid = int(rid)
            vals, inv = np.unique(g["value_s"].to_numpy(), return_inverse=True)
            # the distributed categorical path aggregates over every
            # class PRESENT (no pivot over label_domain) — mirror by
            # indexing the group's own class values, not the domain
            g_classes, gci = np.unique(g[S.CLASS].to_numpy(), return_inverse=True)
            mat = np.zeros((len(vals), len(g_classes)), dtype=np.float64)
            np.add.at(mat, (inv, gci), g[S.CNT].to_numpy(dtype=np.float64))
            nv = mat.sum(axis=1)
            with np.errstate(divide="ignore", invalid="ignore"):
                ent_v = np.where(
                    nv > 0,
                    np.log2(np.where(nv > 0, nv, 1.0))
                    - _xlog2x_np(mat).sum(axis=1) / np.where(nv > 0, nv, 1.0),
                    0.0,
                )
            n_attr = nv.sum()
            entr = float((nv * ent_v).sum() / n_attr)
            split_info = _entropy_np(n_attr, _xlog2x_np(nv).sum())
            emit(
                rid,
                aid,
                _gain_ratio_py(node_info[rid], entr, split_info),
                None,
            )

    if num_names:
        # the distributed numeric path pivots on label_domain, silently
        # dropping out-of-domain classes — mirror with the same filter
        sub = pdf[pdf[S.AID].isin(num_names) & pdf[S.CLASS].isin(cidx)]
        for (rid, aid), g in sub.groupby([S.RID, S.AID], sort=False):
            rid = int(rid)
            vals, inv = np.unique(g["value_d"].to_numpy(), return_inverse=True)
            mat = np.zeros((len(vals), k), dtype=np.float64)
            ci = np.fromiter(
                (cidx[c] for c in g[S.CLASS]), dtype=np.int64, count=len(g)
            )
            np.add.at(mat, (inv, ci), g[S.CNT].to_numpy(dtype=np.float64))
            cum = np.cumsum(mat, axis=0)
            tot = cum[-1]
            n = float(tot.sum())
            n_le = cum.sum(axis=1)
            n_gt = n - n_le
            # candidates: all distinct values except the max, then the
            # minimum-side guard (minDataRatio, `MyReducer.java:34`)
            mask = (
                (n_le < n)
                & (n_le >= min_ratio * n)
                & (n_gt >= min_ratio * n)
            )
            if not mask.any():
                continue  # reference emits gr=-1, never selected
            sum_x_le = _xlog2x_np(cum).sum(axis=1)
            sum_x_gt = _xlog2x_np(tot[None, :] - cum).sum(axis=1)
            with np.errstate(divide="ignore", invalid="ignore"):
                ent_le = np.where(
                    n_le > 0,
                    np.log2(np.where(n_le > 0, n_le, 1.0))
                    - sum_x_le / np.where(n_le > 0, n_le, 1.0),
                    0.0,
                )
                ent_gt = np.where(
                    n_gt > 0,
                    np.log2(np.where(n_gt > 0, n_gt, 1.0))
                    - sum_x_gt / np.where(n_gt > 0, n_gt, 1.0),
                    0.0,
                )
            entr = (n_le * ent_le + n_gt * ent_gt) / n
            split_info = _entropy_np_vec(n, n_le, n_gt)
            # argmin (entr, value) — values ascend, so the first index of
            # the minimal entr is the smallest boundary (struct-min twin)
            ci_mask = np.flatnonzero(mask)
            best_local = ci_mask[np.argmin(entr[ci_mask])]
            emit(
                rid,
                aid,
                _gain_ratio_py(
                    node_info[rid],
                    float(entr[best_local]),
                    float(split_info[best_local]),
                ),
                float(vals[best_local]),
            )

    return hist, stats


def _entropy_np_vec(
    n: float, n_le: np.ndarray, n_gt: np.ndarray
) -> np.ndarray:
    """Vectorized two-way split information for a fixed total ``n``."""
    if n <= 0:
        return np.zeros_like(n_le)
    return np.log2(n) - (_xlog2x_np(n_le) + _xlog2x_np(n_gt)) / n


def _grow_levels(
    *,
    model: DecisionListModel,
    level: DataFrame,
    frontier: list[Rule],
    schema: TrainingSchema,
    cat_names: list[str],
    num_names: list[str],
    cat_domains: dict[str, list[str]],
    label_domain: list[str],
    attr_order: list[str],
    max_depth: int,
    min_ratio: float,
    min_rows: int,
    cache: bool,
    stat_rows_per_node: int = 0,
    driver_stats_max_rows: int = _DRIVER_STATS_MAX_ROWS,
) -> None:
    """The level-synchronous growth loop (see :func:`train`): ONE Spark
    action per tree level (the reference's one-MR-job-per-level shape,
    `Main.java:59-123`, plus the combiner it never had).

    Level L's contingency feeds class histograms, categorical gain
    ratios and numeric best-splits, all unioned into one
    ``(kind, rid, aid, gain_ratio, boundary)`` relation so the collected
    result is ≤ |frontier|×|attrs| rows; ReuseExchange dedups the shared
    contingency child. Purity/guard decisions and the per-node argmax
    happen driver-side (:func:`_decide_level`). The terminal level
    (every node depth-capped) takes the ``hist_only`` fast path — a
    plain ``groupBy(rid, class)`` with no attribute melt, dropping the
    widest level's shuffle by a factor of |attrs|+1.

    A two-levels-per-action variant (in-plan argmax + child stats in the
    same query) was measured 28.0s vs 21.2s for this formulation at
    sf0.1: the doubled plan's analysis/codegen cost exceeds the
    scheduling it saves, so per-level it stays."""
    decide_kw = dict(
        attr_order=attr_order,
        cat_domains=cat_domains,
        label_domain=label_domain,
        max_depth=max_depth,
        min_rows=min_rows,
    )
    while frontier:
        depth = frontier[0].depth  # level-synchronous: all nodes equal
        hist_only = depth >= max_depth
        if (
            not hist_only
            and 0 < len(frontier) * stat_rows_per_node <= driver_stats_max_rows
        ):
            # bounded-contingency fast path: the level's plan is just
            # melt → grouped count (the ONE data-sized exchange); the
            # ≤ driver_stats_max_rows contingency comes back via Arrow
            # and the gain-ratio / best-split reduction runs in numpy.
            # Collapses ~10 tiny post-shuffle stages per level into 2 —
            # at local scale the scheduling/codegen of those stages WAS
            # the training time. Falls back to the fully distributed
            # reduction for wide frontiers/schemas.
            pdf = S.mixed_contingency(
                S.melt_mixed(level, cat_names, num_names, schema.label)
            ).toPandas()
            hist, stats = _driver_level_stats(
                pdf,
                cat_names=cat_names,
                num_names=num_names,
                label_domain=label_domain,
                min_ratio=min_ratio,
            )
        else:
            rels = _level_rels(
                level,
                cat_names=cat_names,
                num_names=num_names,
                label=schema.label,
                label_domain=label_domain,
                min_ratio=min_ratio,
                hist_only=hist_only,
            )
            out = rels[0]
            for r in rels[1:]:
                out = out.unionByName(r)
            collected = out.collect()

            hist = {}
            stats = {}
            for row in collected:
                if row["kind"] == "cc":
                    hist.setdefault(row[S.RID], {})[row[S.AID]] = int(
                        row["gain_ratio"]
                    )
                else:
                    stats.setdefault(row[S.RID], []).append(row)

        frontier, splits = _decide_level(
            model, frontier, hist, stats, **decide_kw
        )
        if not frontier:
            break
        level = _apply_splits(level, splits)
        # per-level: the materialization shrinks the data as leaves
        # resolve and keeps every level's first stage identical for the
        # codegen cache (a flat frontier CASE WHEN overflows JVM 64KB
        # method limits at depth ≥ 8 → interpreted fallback); measured
        # faster than interval checkpointing. eager=False folds the
        # materialization job into the next level's stats action — one
        # fewer job dispatch per level.
        if cache:
            level = level.localCheckpoint(eager=False)


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
