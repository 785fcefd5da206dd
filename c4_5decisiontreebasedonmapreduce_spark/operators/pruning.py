"""C4.5 error-based pruning (EBP) — the post-pass the reference omits.

The reference stops at the fully grown tree: `Main.java:59-123` runs the
level loop and prints the decision list as-is (`Main.java:128-131`);
there is no pruning phase anywhere in its 809 lines. Real C4.5
(Quinlan 1993, ch. 4, "Simplifying Decision Trees") follows growth with
pessimistic error-based pruning: for every internal node, compare the
predicted error of the subtree against the predicted error of the node
collapsed to a majority leaf, where "predicted error" is the binomial
UPPER confidence limit (default CF = 0.25) of the observed training
error — the pessimism that compensates for the leaf errors being
measured on the data that chose the splits. If the collapsed leaf's
predicted error is no worse (Quinlan's implementation allows +0.1
absolute slack), the subtree is replaced.

This runs entirely DRIVER-SIDE on the finished model: the decision list
is rules-count-sized (never data-sized), and every statistic pruning
needs — the per-leaf training class histogram — was already paid for by
the growth loop's contingency pass, so pruning costs ZERO additional
Spark jobs at any data scale. That is the 100 TB design: the only
cluster work is training itself; pruning is O(tree nodes) local math.

Scope: leaf-vs-subtree replacement only. Quinlan's C4.5 additionally
considers grafting the largest branch in place of the node ("subtree
raising"); that variant changes rule paths non-locally and is
documented out of scope here.
"""

from __future__ import annotations

import math

from c4_5decisiontreebasedonmapreduce_spark.operators.tree import (
    DecisionListModel,
    Rule,
    _majority,
)

DEFAULT_CF = 0.25
# Quinlan's prune.c accepts the collapsed leaf when its predicted error
# count is within +0.1 of the subtree's — public-knowledge constant from
# the C4.5 release (and restated in Quinlan 1993 ch. 4).
_SLACK = 0.1


def _log_binom_pmf(k: int, n: int, p: float) -> float:
    if p <= 0.0:
        return 0.0 if k == 0 else -math.inf
    if p >= 1.0:
        return 0.0 if k == n else -math.inf
    return (
        math.lgamma(n + 1)
        - math.lgamma(k + 1)
        - math.lgamma(n - k + 1)
        + k * math.log(p)
        + (n - k) * math.log1p(-p)
    )


def binom_cdf(e: int, n: int, p: float) -> float:
    """P(Bin(n, p) <= e), exact, log-space summed (math.lgamma — no
    scipy in this container). e is small at real leaves (the majority
    class dominates), so the e+1-term sum is cheap."""
    if e >= n:
        return 1.0
    # sum in increasing magnitude for stability
    logs = [_log_binom_pmf(k, n, p) for k in range(e + 1)]
    m = max(logs)
    if m == -math.inf:
        return 0.0
    return min(1.0, math.exp(m) * sum(math.exp(x - m) for x in logs))


def upper_error_rate(e: int, n: int, cf: float = DEFAULT_CF) -> float:
    """U_CF(e, n): the largest error rate still consistent (at
    confidence CF) with observing e errors in n trials — the smallest p
    with P(Bin(n, p) <= e) <= CF, by bisection on the exact CDF.

    Closed-form anchor (tested): for e = 0, P(X = 0) = (1-p)^n = CF
    gives U = 1 - CF^(1/n) — Quinlan's own special case."""
    if n <= 0:
        return 1.0
    if e >= n:
        return 1.0
    if not 0.0 < cf < 1.0:
        raise ValueError(f"cf must be in (0, 1), got {cf}")
    lo, hi = e / n, 1.0
    for _ in range(80):  # ~1 ulp of double precision
        mid = (lo + hi) / 2.0
        if binom_cdf(e, n, mid) > cf:
            lo = mid
        else:
            hi = mid
    return hi


def predicted_errors(n: int, e: int, cf: float = DEFAULT_CF) -> float:
    """Pessimistic predicted error COUNT for a leaf: n · U_CF(e, n)
    (equivalently e + Quinlan's AddErrs). n = 0 predicts 0."""
    if n <= 0:
        return 0.0
    return n * upper_error_rate(e, n, cf)


class _Node:
    __slots__ = ("children", "leaf")

    def __init__(self) -> None:
        self.children: dict = {}  # Condition -> _Node, insertion-ordered
        self.leaf: Rule | None = None


def _build_trie(model: DecisionListModel) -> _Node:
    root = _Node()
    for r in model.rules:
        node = root
        for c in r.conditions:
            node = node.children.setdefault(c, _Node())
        if node.leaf is not None or (node.children and r.label is not None):
            raise ValueError(
                f"rules are not disjoint root-to-leaf paths at {r.conditions}"
            )
        node.leaf = r
    return root


def _pool(hists: list[dict]) -> dict:
    out: dict = {}
    for h in hists:
        for k, v in h.items():
            out[k] = out.get(k, 0) + v
    return out


def ebp_prune(
    model: DecisionListModel, cf: float = DEFAULT_CF
) -> DecisionListModel:
    """Prune a freshly trained decision list bottom-up; returns a NEW
    model (the input is untouched). Requires leaf histograms — models
    reloaded from a serde wire format (which deliberately excludes
    ``hist``) must be pruned at training time instead.

    The pruned list is emitted in depth-first path order (children in
    split-declaration order). Rule order is semantics-free — the leaves
    partition the feature space, so first-match == only-match — and DFS
    keeps sibling groups adjacent, which is also the friendliest layout
    for :meth:`DecisionListModel.to_sql_case` readers."""
    for r in model.rules:
        if r.n > 0 and not r.hist:
            raise ValueError(
                "model has leaves without class histograms; ebp_prune "
                "must run on a freshly trained model (train(..., "
                "prune=True)) — serde formats do not carry hist"
            )
    label_domain = sorted(
        {lbl for r in model.rules for lbl, _ in r.hist}
        | {r.label for r in model.rules if r.label is not None}
    )
    root = _build_trie(model)

    def walk(node: _Node, conditions: tuple, depth: int) -> tuple:
        """-> (rules, pooled_hist, predicted_error_count)"""
        if node.leaf is not None:
            h = dict(node.leaf.hist)
            n = node.leaf.n
            e = n - max(h.values(), default=0)
            return [node.leaf], h, predicted_errors(n, e, cf)
        sub_rules: list[Rule] = []
        sub_hists: list[dict] = []
        sub_err = 0.0
        for cond, child in node.children.items():
            r, h, err = walk(child, conditions + (cond,), depth + 1)
            sub_rules.extend(r)
            sub_hists.append(h)
            sub_err += err
        pooled = _pool(sub_hists)
        n = sum(pooled.values())
        e = n - max(pooled.values(), default=0)
        leaf_err = predicted_errors(n, e, cf)
        if leaf_err <= sub_err + _SLACK:
            collapsed = Rule(
                conditions,
                _majority(pooled, label_domain),
                n,
                depth,
                hist=tuple(sorted(pooled.items())),
            )
            return [collapsed], pooled, leaf_err
        return sub_rules, pooled, sub_err

    rules, _, _ = walk(root, (), 0)
    return DecisionListModel(rules=rules, label_col=model.label_col)
