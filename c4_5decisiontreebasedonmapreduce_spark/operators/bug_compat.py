"""Reference-AS-BUILT C4.5 trainer: the five documented bugs, reproduced.

The default trainer (:func:`operators.tree.train`) deliberately fixes the
reference's five quirks (SURVEY.md quirk ledger Q1-Q5). This module is the
opposite contract — ``train(bug_compat=True)`` — for a user who wants
byte-level parity with the reference's final decision-list stdout
(`Main.java:128-131`), bugs included:

- **Q1** (`MyMapper.java:97-100`): re-parsing a numeric condition drops
  the boundary's last character (``substring(2, len-1)``), then compares
  the re-rendered string against the stored condition. A boundary whose
  Java double string does not survive truncate→parse→re-render (e.g.
  ``5.25`` → ``5.2``) therefore matches NO row on either side — both
  children starve and vanish (Q5). Boundaries ending in ``.0`` (all-
  integer columns) survive, which is why the reference "works" on the
  weather data. A truncation that is not even parseable (``"1.0E-4"`` →
  ``"1.0E-"``) throws ``NumberFormatException`` in the mapper and kills
  the job — reproduced as :class:`ReferenceCrash`.
- **Q2** (`Main.java:240-246`): each statistics line for a numeric
  attribute overwrites the attribute's GLOBAL domain with that line's
  boundary; the per-level expansion then reads the global — so every
  rule splitting that attribute at one level gets the boundary of the
  LAST line in key-sorted order, not its own (even a failed split's
  ``-1.0`` sentinel overwrites).
- **Q3** (`MyReducer.java:103-104,201-202`): a zero-gain node becomes a
  leaf labelled with the LAST-arriving row's class (categorical stats)
  or the FIRST-arriving row's class (numeric stats) — arrival order,
  not majority.
- **Q4** (`Rule.java:29`): rendering a condition-less rule calls
  ``setCharAt(-1)`` → ``StringIndexOutOfBoundsException``; a root-is-
  leaf model crashes at print time. Reproduced by
  :meth:`ReferenceCompatModel.stdout_lines`.
- **Q5** (`Main.java:85-88,100-101`; `MyReducer.java:130,200`): a rule
  none of whose statistics arrive (no matching rows), or whose every
  numeric split fails the 10% guard while no other attribute has
  positive gain, keeps its ``-2`` sentinel and is silently dropped —
  its rows become unclassifiable.

Arrival-order model: the reference runs pseudo-distributed (single-node
HDFS, `core-site.xml`), one input split and Hadoop's default single
reducer, so reducer values arrive in input-file row order. This module
pins that order with an explicit row-index column (single-partition
materialization). That — like the reference's own reducer, which buffers
whole columns in RAM (`MyReducer.java:112-128`) — makes this a FIDELITY
mode, not a 100 TB path: the per-level contingency is collected at full
distinct-value resolution (no quantile binning) and the decision logic
replays the reference's exact floating-point summation orders driver-
side. The scale path is the default trainer.

Byte parity is differentially tested against an independent pure-Python
transliteration of the reference pipeline (tests/reference_sim.py) and
pinned as a golden on the weather fixture.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from decimal import Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from c4_5decisiontreebasedonmapreduce_spark.sources.tsv import TrainingSchema

_ROW = "__row__"
_RID = "__rid__"
_CC = "__cc__"

_LOG2 = math.log(2.0)


class ReferenceCrash(RuntimeError):
    """The reference-as-built would abort here (uncaught Java exception);
    the triggering reference site is in the message."""


def java_double_str(x: float) -> str:
    """``Double.toString`` for finite doubles. Both Java and Python emit
    the SHORTEST digit string that round-trips, so the digits agree; only
    the formatting differs: Java uses plain decimal on
    ``1e-3 <= |x| < 1e7`` and ``d.dddEn`` scientific outside it
    (JLS, ``Double.toString`` spec)."""
    if math.isnan(x):
        return "NaN"
    if math.isinf(x):
        return "Infinity" if x > 0 else "-Infinity"
    if x == 0.0:
        return "-0.0" if math.copysign(1.0, x) < 0 else "0.0"
    if 1e-3 <= abs(x) < 1e7:
        # Python repr may still pick scientific inside this band for
        # values like 1e-4? (no: repr switches below 1e-4) — normalize
        # through Decimal to be safe.
        s = repr(float(x))
        if "e" not in s and "E" not in s:
            return s if "." in s else s + ".0"
    d = Decimal(repr(abs(float(x)))).normalize()  # strip trailing zeros
    sign = "-" if x < 0 else ""
    digits = "".join(str(t) for t in d.as_tuple().digits)
    exp10 = d.adjusted()
    if 1e-3 <= abs(x) < 1e7:
        # decimal band but repr was scientific: expand
        if exp10 >= 0:
            intpart = digits[: exp10 + 1].ljust(exp10 + 1, "0")
            frac = digits[exp10 + 1 :] or "0"
        else:
            intpart = "0"
            frac = "0" * (-exp10 - 1) + digits
        return f"{sign}{intpart}.{frac}"
    mant = digits[0] + "." + (digits[1:] or "0")
    return f"{sign}{mant}E{exp10}"


def java_parse_double(s: str) -> float:
    """``Double.parseDouble`` for the strings this pipeline produces.
    Java accepts a trailing ``.`` (``"85."`` → 85.0) exactly like Python
    ``float``; an empty/garbage string throws — mapped to
    :class:`ReferenceCrash` at the call sites."""
    return float(s)


def q1_effective_predicate(cond: str) -> tuple[str, float] | None:
    """The predicate a stored numeric condition ACTUALLY tests after the
    reference's truncating re-parse (`MyMapper.java:95-108`).

    Returns ``(op, boundary)`` when the condition still matches one side
    (``op`` in ``{"<=", ">"}``), ``None`` when the re-rendered comparison
    string can never equal the stored text (condition matches nothing),
    and raises :class:`ReferenceCrash` when the truncated boundary does
    not even parse (the mapper's ``NumberFormatException``)."""
    if cond.startswith("<"):
        num = cond[2:-1]  # substring(2, len-1): drops last char
    else:
        num = cond[1:-1]  # substring(1, len-1)
    try:
        cmp = java_parse_double(num)
    except ValueError:
        raise ReferenceCrash(
            f"NumberFormatException parsing {num!r} re-parsed from "
            f"condition {cond!r} (MyMapper.java:97-100)"
        ) from None
    if cond == "<=" + java_double_str(cmp):
        return ("<=", cmp)
    if cond == ">" + java_double_str(cmp):
        return (">", cmp)
    return None  # dead condition: no row can re-render to the stored text


@dataclass
class CompatRule:
    """The reference's ``Rule``: aid→value-string conditions + label
    (`Rule.java:7-14`). Values are the reference's own strings —
    categorical domain values or synthetic ``<=b`` / ``>b``."""

    conditions: dict[int, str] = field(default_factory=dict)
    label: str = ""

    def to_string(self) -> str:
        """``Rule.toString`` (`Rule.java:22-33`): ``aid1,v1&aid2,v2:label``
        with conditions in Java ``HashMap<Integer,_>`` iteration order —
        ascending aid for aids < 16 (Integer hash = value, default table
        size 16; this engine caps parity claims there). A condition-less
        rule reproduces Q4: ``setCharAt(length-1)`` on an empty builder."""
        if not self.conditions:
            raise ReferenceCrash(
                "StringIndexOutOfBoundsException: Rule.toString on a "
                "condition-less rule (root-is-leaf, Rule.java:29)"
            )
        if max(self.conditions) >= 16:
            raise ReferenceCrash(
                "HashMap iteration order is only aid-ascending below the "
                "default table size (16); parity not claimed beyond it"
            )
        conds = "&".join(
            f"{aid},{self.conditions[aid]}" for aid in sorted(self.conditions)
        )
        return f"{conds}:{self.label}"


@dataclass
class ReferenceCompatModel:
    """The finished bug-compat model: rules in the reference's model-queue
    order (`Main.java:39,102-107`)."""

    rules: list[CompatRule]
    attr_order: list[str]

    def stdout_lines(self) -> list[str]:
        """The reference's final stdout rule lines, byte-for-byte:
        ``"  " + rule.toString()`` per model rule (`Main.java:128-131`).
        Raises :class:`ReferenceCrash` exactly where the reference would
        (Q4 root-is-leaf)."""
        return ["  " + r.to_string() for r in self.rules]


def _info_ref(class_counts: list[int], data_count: int) -> float:
    """``MyReducer.Info`` (`MyReducer.java:243-252`), exact summation
    order: declared-class order, ``((-1*p)*log(p))/log(2)`` per term."""
    info = 0.0
    for i in class_counts:
        if i != 0:
            p = i / data_count
            info += (-1.0 * p) * math.log(p) / _LOG2
    return info


def _split_i_ref(val_counts: list[int], data_count: int) -> float:
    """``MyReducer.SplitI`` (`MyReducer.java:254-263`): bucket counts in
    insertion order."""
    split_i = 0.0
    for i in val_counts:
        if i != 0:
            p = i / data_count
            split_i += (-1.0 * p) * math.log(p) / _LOG2
    return split_i


def _entr_ref(
    val_counts: list[int], class_val_num: list[list[int]], data_count: int
) -> float:
    """``MyReducer.Entr`` (`MyReducer.java:265-280`): buckets in insertion
    order, classes in declared order, ``entr += tmp*weight``."""
    entr = 0.0
    for i, val_count in enumerate(val_counts):
        weight = val_count / data_count
        tmp = 0.0
        for j in class_val_num[i]:
            if j != 0:
                p = j / val_count
                tmp += (-1.0 * p) * math.log(p) / _LOG2
        entr += tmp * weight
    return entr


def _gain_ratio_ref(
    info: float,
    entr: float,
    split_i: float,
    class_counts: list[int],
    data_count: int,
) -> float:
    """``MyReducer.GainRatio`` (`MyReducer.java:282-298`), incl. the
    ``SplitI == 0`` special case: 0 for a pure node, 0.00001 otherwise."""
    if split_i == 0.0:
        return 0.0 if any(c == data_count for c in class_counts) else 0.00001
    return (info - entr) / split_i


def _categorical_line(
    values: list[tuple[str, list[int], int]],
    class_counts: list[int],
    data_count: int,
    last_class: str,
) -> tuple[float, None, str | None]:
    """One categorical reducer output (`MyReducer.java:51-109`): values
    arrive pre-aggregated but in first-appearance (arrival) order, the
    exact insertion order of the reference's linear-scan lists. Returns
    ``(gr, boundary=None, leaf_label)`` — label present iff gr == 0
    (Q3: the LAST-arriving row's class, `MyReducer.java:63,103-104`)."""
    val_counts = [sum(cv) for _, cv, _ in values]
    class_val_num = [cv for _, cv, _ in values]
    info = _info_ref(class_counts, data_count)
    entr = _entr_ref(val_counts, class_val_num, data_count)
    split_i = _split_i_ref(val_counts, data_count)
    gr = _gain_ratio_ref(info, entr, split_i, class_counts, data_count)
    return gr, None, (last_class if gr == 0 else None)


def _numeric_line(
    values: list[tuple[float, list[int], int]],
    class_counts: list[int],
    data_count: int,
    first_class: str,
) -> tuple[float, float, str | None]:
    """One numeric reducer output (`MyReducer.java:112-205`): the sorted
    distinct-value boundary scan with the 10% guard, optimizing ENTROPY
    (strict ``<``, so the smallest boundary wins ties) and reporting the
    gain ratio AT the winning boundary. ``values`` are (value,
    class-vector, first-arrival-row) ascending by value. Returns
    ``(gr, boundary, leaf_label)`` — gr=-1/boundary=-1 when every
    boundary fails the guard (`MyReducer.java:129-130,188-190`); label
    present iff gr == 0 (Q3: FIRST-arriving row's class,
    `MyReducer.java:201-202`)."""
    info = _info_ref(class_counts, data_count)
    k = len(class_counts)
    # cumulative class vectors in ascending value order
    cum: list[list[int]] = []
    run = [0] * k
    for _, cv, _ in values:
        run = [a + b for a, b in zip(run, cv)]
        cum.append(list(run))
    total = run
    opt_boundary, opt_entr, opt_gr = -1.0, 100.0, -1.0
    min_first_so_far = math.inf
    suffix_min_first = [math.inf] * (len(values) + 1)
    for i in range(len(values) - 1, -1, -1):
        suffix_min_first[i] = min(suffix_min_first[i + 1], values[i][2])
    for i, (boundary, _, first_row) in enumerate(values):
        min_first_so_far = min(min_first_so_far, first_row)
        if i == len(values) - 1:
            break  # boundary == max value: loop breaks (MyReducer.java:140)
        small = sum(cum[i])
        big = data_count - small
        if small < 0.1 * data_count or big < 0.1 * data_count:
            continue
        # bucket insertion order = which side the first-arriving row fell
        le_counts = cum[i]
        gt_counts = [t - c for t, c in zip(total, cum[i])]
        if min_first_so_far <= suffix_min_first[i + 1]:
            val_counts = [small, big]
            class_val_num = [le_counts, gt_counts]
        else:
            val_counts = [big, small]
            class_val_num = [gt_counts, le_counts]
        entr = _entr_ref(val_counts, class_val_num, data_count)
        if entr < opt_entr:
            opt_boundary = boundary
            opt_entr = entr
            split_i = _split_i_ref(val_counts, data_count)
            opt_gr = _gain_ratio_ref(
                info, entr, split_i, class_counts, data_count
            )
    return opt_gr, opt_boundary, (first_class if opt_gr == 0 else None)


def _rule_rid_column(frontier: list[CompatRule], attr_order, numeric_mask):
    """The frontier compiled to one CASE WHEN rid column — rules partition
    the rows, so first-match is exact-match. Numeric conditions go
    through the Q1 truncating re-parse; a dead condition becomes
    ``lit(False)`` (the mapper's string compare that can never pass)."""
    expr = F.lit(None).cast("int")
    for i, rule in reversed(list(enumerate(frontier))):
        pred = F.lit(True)
        for aid, val in rule.conditions.items():
            col = F.col(attr_order[aid])
            if numeric_mask[aid]:
                eff = q1_effective_predicate(val)
                if eff is None:
                    pred = F.lit(False)
                    break
                op, cmp = eff
                pred = pred & ((col <= cmp) if op == "<=" else (col > cmp))
            else:
                pred = pred & (col == F.lit(val))
        expr = F.when(pred, F.lit(i)).otherwise(expr)
    return expr


def _level_stats(
    base: DataFrame,
    frontier: list[CompatRule],
    attr_order: list[str],
    numeric_mask: list[bool],
    label: str,
):
    """ONE Spark action per level: rows matched to frontier rules, melted
    to (rid, aid, value, class) with a ``__cc__`` class-histogram
    pseudo-attribute riding along, and count/min-row/max-row aggregated.
    The collected result is (nodes × attrs × distinct values × classes)-
    bounded — the same driver-decision contract as the default trainer,
    at full distinct resolution (fidelity mode)."""
    entries = [f"'{_CC}', cast(null as string), cast(null as double)"]
    for aid, a in enumerate(attr_order):
        if numeric_mask[aid]:
            entries.append(f"'{aid}', cast(null as string), cast(`{a}` as double)")
        else:
            entries.append(f"'{aid}', cast(`{a}` as string), cast(null as double)")
    rid = _rule_rid_column(frontier, attr_order, numeric_mask)
    melted = base.withColumn(_RID, rid).where(F.col(_RID).isNotNull()).selectExpr(
        _RID,
        _ROW,
        f"stack({len(entries)}, {', '.join(entries)}) as (aid, value_s, value_d)",
        f"`{label}` as class",
    )
    return (
        melted.groupBy(_RID, "aid", "value_s", "value_d", "class")
        .agg(
            F.count("*").alias("cnt"),
            F.min(_ROW).alias("first_row"),
            F.max(_ROW).alias("last_row"),
        )
        .collect()
    )


def train_reference_compat(
    df: DataFrame, schema: TrainingSchema
) -> ReferenceCompatModel:
    """Grow the tree exactly as the reference-as-built does
    (`Main.java:59-123`): level-synchronous queue of conjunctive rules,
    one statistics pass per level (here one Spark action instead of one
    MapReduce job), then the reference's line-by-line driver selection
    (`Main.java:218-269`) and expansion (`Main.java:98-122`) replayed
    verbatim — global-domain leak, sentinel drops and all. No depth cap:
    the reference has none; growth stops when no rule can expand."""
    attr_order = [a.name for a in schema.features]
    numeric_mask = [a.is_numeric for a in schema.features]
    classes = list(schema.label_domain)
    cidx = {c: i for i, c in enumerate(classes)}
    # global per-attribute domains — the mutable state Q2 leaks through
    att_val: dict[int, list[str]] = {
        i: list(a.domain) for i, a in enumerate(schema.features)
    }

    # arrival order = input row order (single split + single reducer in
    # the reference's pseudo-distributed setup): pin it with an explicit
    # single-partition row index, materialized once.
    base = (
        df.select(*attr_order, schema.label)
        .coalesce(1)
        .withColumn(_ROW, F.monotonically_increasing_id())
        .localCheckpoint(eager=True)
    )

    model: list[CompatRule] = []
    frontier: list[CompatRule] = [CompatRule()]  # blank root rule
    while frontier:
        rows = _level_stats(base, frontier, attr_order, numeric_mask, schema.label)

        # reassemble per-(rid, aid) reducer inputs
        cc: dict[int, dict[str, tuple[int, int, int]]] = {}
        per_attr: dict[tuple[int, int], dict] = {}
        for r in rows:
            rid = int(r[_RID])
            if r["aid"] == _CC:
                if r["class"] not in cidx:
                    raise ReferenceCrash(
                        f"class {r['class']!r} outside the declared domain:"
                        " FindClass returns -1 and classCount[-1]++ throws"
                        " ArrayIndexOutOfBoundsException"
                        " (MyReducer.java:64,119,235-241)"
                    )
                cc.setdefault(rid, {})[r["class"]] = (
                    int(r["cnt"]), int(r["first_row"]), int(r["last_row"])
                )
                continue
            aid = int(r["aid"])
            val = r["value_d"] if numeric_mask[aid] else r["value_s"]
            ent = per_attr.setdefault((rid, aid), {})
            cv, first = ent.get(val, ([0] * len(classes), math.inf))
            cv = list(cv)
            cv[cidx[r["class"]]] += int(r["cnt"])
            ent[val] = (cv, min(first, int(r["first_row"])))

        # synthesize the reducer output lines, keyed "rid&aid", and sort
        # them in Hadoop's Text (byte) order — the order getOptAttIndex
        # consumes them in (`Main.java:226-265`)
        lines = []
        for i, rule in enumerate(frontier):
            h = cc.get(i)
            if not h:
                continue  # no rows reached this rule: reducer emits nothing
            class_counts = [h.get(c, (0, 0, 0))[0] for c in classes]
            data_count = sum(class_counts)
            first_class = min(h.items(), key=lambda kv: kv[1][1])[0]
            last_class = max(h.items(), key=lambda kv: kv[1][2])[0]
            for aid in range(len(attr_order)):
                if aid in rule.conditions:
                    continue  # mapper emits only unused attrs (MyMapper.java:37)
                vals = per_attr.get((i, aid))
                if not vals:
                    continue
                if numeric_mask[aid]:
                    ordered = sorted(
                        (v, cv, fr) for v, (cv, fr) in vals.items()
                    )
                    gr, boundary, leaf = _numeric_line(
                        ordered, class_counts, data_count, first_class
                    )
                else:
                    ordered = sorted(
                        ((v, cv, fr) for v, (cv, fr) in vals.items()),
                        key=lambda t: t[2],
                    )
                    gr, boundary, leaf = _categorical_line(
                        ordered, class_counts, data_count, last_class
                    )
                lines.append((f"{i}&{aid}", i, aid, gr, boundary, leaf))
        lines.sort(key=lambda t: t[0])

        # getOptAttIndex replayed line-by-line (`Main.java:218-269`):
        # Q2's global attVal.set happens on EVERY numeric line, before
        # the gr==0 / max checks; -1 sentinels included.
        max_gr = [0.0] * len(frontier)
        opt_index = [-2] * len(frontier)
        seaf_val: list[str | None] = [None] * len(frontier)
        for _, rid, aid, gr, boundary, leaf in lines:
            if numeric_mask[aid]:
                b = java_double_str(boundary)
                att_val[aid] = ["<=" + b, ">" + b]
            if gr == 0:
                seaf_val[rid] = leaf
                opt_index[rid] = -1
                continue
            if gr > max_gr[rid]:
                max_gr[rid] = gr
                opt_index[rid] = aid

        # expansion (`Main.java:98-122`): -2 drops silently (Q5), -1
        # leaves with the arrival-order label (Q3), winners expand over
        # the CURRENT global domain (Q2)
        next_frontier: list[CompatRule] = []
        for i, rule in enumerate(frontier):
            if opt_index[i] == -2:
                continue
            if opt_index[i] == -1:
                model.append(CompatRule(dict(rule.conditions), seaf_val[i]))
                continue
            for val in att_val[opt_index[i]]:
                child = CompatRule(dict(rule.conditions), "")
                child.conditions[opt_index[i]] = val
                next_frontier.append(child)
        frontier = next_frontier

    return ReferenceCompatModel(rules=model, attr_order=attr_order)
