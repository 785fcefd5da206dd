"""True C4.5 fractional routing for missing values (Quinlan 1993 ch. 3).

``train(nulls="missing")`` approximates unknown values with a
branch-as-category / median-impute policy; THIS module implements the
actual C4.5 semantics the reference (which has no null concept at all —
SURVEY §1.1) also lacks:

- **Gain scaling**: an attribute's information gain at a node is computed
  over the rows whose value is KNOWN, then multiplied by the known
  fraction ``F = W_known / W_total`` — an attribute missing half the
  time earns half its apparent gain.
- **Split info**: the unknown rows form one extra pseudo-branch of the
  split-information entropy, further penalising attributes with many
  unknowns.
- **Fractional routing**: when a node splits on attribute ``a``, a row
  with unknown ``a`` is sent to EVERY child with weight
  ``w · W_child / W_known`` — its mass is distributed in proportion to
  the observed branch sizes, so leaf counts become fractional exactly as
  C4.5 prints them (e.g. ``(3.4/0.4)``).

Weights are DECIMAL(28,12) throughout: every per-level contingency is a
SUM of decimals, so masses are exact and order-independent — the same
portability discipline as the engine's dot products, which is what keeps
this trainer deterministic under any partitioning (pinned in
tests/test_fractional.py, including bit-equality with the standard
trainer on clean data, where every weight stays exactly 1).

Scale shape — identical to the main trainer's fast path: ONE data-sized
map-side-combined exchange per level (the weighted melt/contingency,
nulls kept as their own group so the unknown mass rides the same
shuffle), an Arrow collect bounded by frontier × Σ domains × classes
(data-volume independent), numpy reduction, and a routing projection in
which only rows whose SPLIT attribute is null are exploded (|children|
copies of just the unknown rows — linear in missing values, never
corpus-sized). The bound check fails loudly with the same message
contract as tree.py's guard; the distributed reduction fallback of the
unweighted trainer applies there because clean data dominates — a
fractional run only happens when the user explicitly opts into null
semantics, and its contingency is the same size as the clean one.

Prediction: the returned model is an ordinary :class:`DecisionListModel`
whose rule predicates test concrete values, so ``transform`` leaves rows
with a null split attribute unmatched (prediction NULL) — scoring-time
fractional class distribution is documented out of scope (training-time
routing is what shapes the model).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from c4_5decisiontreebasedonmapreduce_spark.operators import c45_stats as S
from c4_5decisiontreebasedonmapreduce_spark.operators.tree import (
    _DRIVER_STATS_MAX_ROWS,
    Condition,
    DecisionListModel,
    Rule,
    _decide_level,
    _entropy_np,
    _gain_ratio_py,
    _prologue_scan,
    _snap_numeric,
    _xlog2x_np,
)
from c4_5decisiontreebasedonmapreduce_spark.operators.training import (
    TrainingSchema,
)

W = "__w"  # the fractional weight column
_W_TYPE = "decimal(28,12)"


def _melt_weighted(
    df: DataFrame,
    cat_names: list[str],
    num_names: list[str],
    label: str,
) -> DataFrame:
    """melt_mixed's weighted sibling: ``(rid, aid, value_s, value_d,
    class, wsum)`` with NULL attribute values KEPT as their own group —
    that group's mass is the per-(node, attribute) unknown weight the
    fractional formulas need. One map-side-combined exchange."""
    entries = [f"'{S.CC_AID}', cast(null as string), cast(null as double)"]
    for a in cat_names:
        entries.append(f"'{a}', cast(`{a}` as string), cast(null as double)")
    for a in num_names:
        entries.append(f"'{a}', cast(null as string), cast(`{a}` as double)")
    stacked = df.selectExpr(
        f"`{S.RID}` as {S.RID}",
        f"stack({len(entries)}, {', '.join(entries)})"
        " as (aid, value_s, value_d)",
        f"`{label}` as {S.CLASS}",
        f"`{W}` as {W}",
    )
    return stacked.groupBy(
        S.RID, S.AID, "value_s", "value_d", S.CLASS
    ).agg(F.sum(W).alias("wsum"))


def _fractional_level_stats(
    pdf,
    *,
    cat_names: list[str],
    num_names: list[str],
    label_domain: list[str],
    min_ratio: float,
):
    """Quinlan-fractional gain ratios from one level's weighted
    contingency. Mirrors tree._driver_level_stats formula-for-formula,
    with three deliberate differences (all no-ops when nothing is
    missing, which is what makes the clean-data model bit-equal):
    per-attribute node info is computed over the KNOWN rows only, the
    gain is scaled by the known fraction F, and the unknown mass joins
    the split-info branches. Returns ``(hist, stats, masses)`` where
    ``masses[(rid, aid)]`` carries the per-branch known masses the
    router needs for the fractional distribution."""
    classes = list(label_domain)
    cidx = {c: i for i, c in enumerate(classes)}
    k = len(classes)

    hist: dict[int, dict[str, float]] = {}
    cc = pdf[pdf[S.AID] == S.CC_AID]
    for rid, cls, wsum in zip(cc[S.RID], cc[S.CLASS], cc["wsum"]):
        hist.setdefault(int(rid), {})[cls] = float(wsum)

    stats: dict[int, list] = {}
    masses: dict[tuple[int, str], dict] = {}

    def emit(rid, aid, gr, boundary):
        stats.setdefault(rid, []).append(
            {S.AID: aid, "gain_ratio": gr, "boundary": boundary}
        )

    if cat_names:
        sub = pdf[pdf[S.AID].isin(cat_names)]
        for (rid, aid), g in sub.groupby([S.RID, S.AID], sort=False):
            rid = int(rid)
            known = g[g["value_s"].notna()]
            unknown = float(g[g["value_s"].isna()]["wsum"].sum())
            if len(known) == 0:
                continue  # attribute entirely unknown here: no split
            vals, inv = np.unique(
                known["value_s"].to_numpy(), return_inverse=True
            )
            g_classes, gci = np.unique(
                known[S.CLASS].to_numpy(), return_inverse=True
            )
            mat = np.zeros((len(vals), len(g_classes)), dtype=np.float64)
            np.add.at(
                mat, (inv, gci), known["wsum"].to_numpy(dtype=np.float64)
            )
            nv = mat.sum(axis=1)
            n_known = float(nv.sum())
            f_known = n_known / (n_known + unknown)
            info_known = _entropy_np(
                n_known, _xlog2x_np(mat.sum(axis=0)).sum()
            )
            with np.errstate(divide="ignore", invalid="ignore"):
                ent_v = np.where(
                    nv > 0,
                    np.log2(np.where(nv > 0, nv, 1.0))
                    - _xlog2x_np(mat).sum(axis=1) / np.where(nv > 0, nv, 1.0),
                    0.0,
                )
            entr = float((nv * ent_v).sum() / n_known)
            branches = np.concatenate([nv, [unknown]])
            split_info = _entropy_np(
                n_known + unknown, _xlog2x_np(branches).sum()
            )
            gr = _gain_ratio_py(info_known, entr, split_info)
            emit(rid, aid, f_known * gr, None)
            masses[(rid, aid)] = {
                "kind": "cat",
                "by_value": dict(zip(vals.tolist(), nv.tolist())),
                "n_known": n_known,
            }

    if num_names:
        sub = pdf[
            pdf[S.AID].isin(num_names) & pdf[S.CLASS].isin(cidx)
        ]
        for (rid, aid), g in sub.groupby([S.RID, S.AID], sort=False):
            rid = int(rid)
            known = g[g["value_d"].notna()]
            unknown = float(g[g["value_d"].isna()]["wsum"].sum())
            if len(known) == 0:
                continue
            vals, inv = np.unique(
                known["value_d"].to_numpy(), return_inverse=True
            )
            mat = np.zeros((len(vals), k), dtype=np.float64)
            ci = np.fromiter(
                (cidx[c] for c in known[S.CLASS]),
                dtype=np.int64,
                count=len(known),
            )
            np.add.at(mat, (inv, ci), known["wsum"].to_numpy(np.float64))
            cum = np.cumsum(mat, axis=0)
            tot = cum[-1]
            n = float(tot.sum())
            f_known = n / (n + unknown)
            n_le = cum.sum(axis=1)
            n_gt = n - n_le
            mask = (
                (n_le < n)
                & (n_le >= min_ratio * n)
                & (n_gt >= min_ratio * n)
            )
            if not mask.any():
                continue
            info_known = _entropy_np(n, _xlog2x_np(tot).sum())
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
            # three-way split info: ≤, >, unknown (zero mass vanishes —
            # xlog2x(0) = 0 — which is the clean-data equality)
            total_w = n + unknown
            split_info = np.log2(total_w) - (
                _xlog2x_np(n_le)
                + _xlog2x_np(n_gt)
                + _xlog2x_np(np.full_like(n_le, unknown))
            ) / total_w
            ci_mask = np.flatnonzero(mask)
            best_local = ci_mask[np.argmin(entr[ci_mask])]
            gr = _gain_ratio_py(
                info_known,
                float(entr[best_local]),
                float(split_info[best_local]),
            )
            emit(rid, aid, f_known * gr, float(vals[best_local]))
            masses[(rid, aid)] = {
                "kind": "num",
                "values": vals.tolist(),
                "n_le": n_le.tolist(),
                "n_known": n,
            }

    return hist, stats, masses


def _route_fractional(
    level: DataFrame,
    splits: list[tuple[int, list]],
    masses: dict[tuple[int, str], dict],
) -> DataFrame:
    """The fractional router: known rows follow their branch with weight
    unchanged; a row whose split attribute is NULL fans out to every
    child with weight ``w · W_child / W_known``. Only null-attribute
    rows are exploded; everything stays a projection."""
    route_t = "array<struct<cid:int,mul:decimal(18,12)>>"
    parts = []
    for parent, children in splits:
        aid = children[0][0].attr
        m = masses[(parent, aid)]
        fracs = []
        for cond, cid in children:
            if m["kind"] == "cat":
                child_w = m["by_value"].get(cond.value, 0.0)
            elif cond.op == "<=":
                i = m["values"].index(cond.value)
                child_w = m["n_le"][i]
            else:
                i = m["values"].index(cond.value)
                child_w = m["n_known"] - m["n_le"][i]
            fracs.append((cid, round(child_w / m["n_known"], 12)))
        unknown_routes = F.array(
            *[
                F.struct(
                    F.lit(cid).cast("int").alias("cid"),
                    F.lit(f"{frac:.12f}").cast("decimal(18,12)").alias("mul"),
                )
                for cid, frac in fracs
                if frac > 0
            ]
        ).cast(route_t)
        known_cid = None
        for cond, cid in children:
            known_cid = (F.when if known_cid is None else known_cid.when)(
                cond.column(), F.lit(cid)
            )
        known_routes = F.array(
            F.struct(
                known_cid.cast("int").alias("cid"),
                F.lit(1).cast("decimal(18,12)").alias("mul"),
            )
        ).cast(route_t)
        parts.append(
            F.when(
                F.col(S.RID) == parent,
                F.when(F.col(aid).isNull(), unknown_routes).otherwise(
                    known_routes
                ),
            )
        )
    routed = level.withColumn("__routes", F.coalesce(*parts)).select(
        *[c for c in level.columns if c not in (S.RID, W)],
        F.explode("__routes").alias("__r"),
        W,
    )
    return (
        routed.select(
            *[c for c in routed.columns if c not in ("__r", W)],
            F.col("__r.cid").alias(S.RID),
            (F.col(W) * F.col("__r.mul")).cast(_W_TYPE).alias(W),
        )
        .where(F.col(S.RID).isNotNull())
    )


def train_fractional(
    df: DataFrame,
    schema: TrainingSchema,
    max_depth: int = 8,
    min_ratio: float = 0.1,
    min_rows: int = 2,
    cache: bool = True,
    max_bins: int = 256,
    driver_stats_max_rows: int = _DRIVER_STATS_MAX_ROWS,
) -> DecisionListModel:
    """Grow a C4.5 decision list with Quinlan-fractional missing-value
    semantics (module docstring). On data with no nulls the returned
    model is rule-for-rule identical to ``train(df, schema, ...)``."""
    attr_order = [a.name for a in schema.features]
    cat_names = [a.name for a in schema.categorical]
    num_names = [a.name for a in schema.numeric]
    cat_domains = {a.name: list(a.domain) for a in schema.categorical}
    label_domain = list(schema.label_domain)

    spark = df.sparkSession
    base = df.select(*attr_order, schema.label)
    # the shared one-scan prologue in audit-only mode: quantile edges
    # over known values; nulls stay null (no imputation — routing is
    # this trainer's whole point). A null LABEL is still an error.
    base, edges = _prologue_scan(
        base,
        nulls="fractional",
        cat_names=cat_names,
        num_names=num_names,
        label=schema.label,
        cat_domains=cat_domains,
        max_bins=max_bins,
    )
    if cache:
        par = spark.sparkContext.defaultParallelism
        if base.rdd.getNumPartitions() < par:
            base = base.repartition(par)
    base = _snap_numeric(base, edges)

    stat_rows_per_node = len(label_domain) * (
        1
        + sum(len(d) + 1 for d in cat_domains.values())
        + sum(len(e) + 1 for e in edges.values())
    )

    shuffle_key = "spark.sql.shuffle.partitions"
    prev_shuffle = spark.conf.get(shuffle_key)
    model = DecisionListModel(rules=[], label_col=schema.label)
    frontier: list[Rule] = [Rule()]
    level = base.withColumn(S.RID, F.lit(0).cast("int")).withColumn(
        W, F.lit(1).cast(_W_TYPE)
    )
    if cache:
        level = level.localCheckpoint(eager=True)
    decide_kw = dict(
        attr_order=attr_order,
        cat_domains=cat_domains,
        label_domain=label_domain,
        max_depth=max_depth,
        min_rows=min_rows,
    )
    try:
        spark.conf.set(shuffle_key, "8")
        while frontier:
            bound = len(frontier) * stat_rows_per_node
            if bound > driver_stats_max_rows:
                raise ValueError(
                    f"fractional trainer's level contingency bound {bound} "
                    f"exceeds driver_stats_max_rows={driver_stats_max_rows}"
                    " — raise the bound or reduce max_bins (the"
                    " distributed-reduction fallback exists only in the"
                    " standard trainer)"
                )
            pdf = _melt_weighted(
                level, cat_names, num_names, schema.label
            ).toPandas()
            pdf["wsum"] = pdf["wsum"].astype(np.float64)
            hist, stats, masses = _fractional_level_stats(
                pdf,
                cat_names=cat_names,
                num_names=num_names,
                label_domain=label_domain,
                min_ratio=min_ratio,
            )
            if frontier[0].depth >= max_depth:
                stats = {}
            frontier, splits = _decide_level(
                model, frontier, hist, stats, **decide_kw
            )
            if not frontier:
                break
            level = _route_fractional(level, splits, masses)
            if cache:
                level = level.localCheckpoint(eager=False)
    finally:
        spark.conf.set(shuffle_key, prev_shuffle)
    return model
