"""Test-only DIFFERENTIAL ORACLE: a direct, row-at-a-time transliteration
of the reference pipeline's semantics (MyMapper/MyReducer/Main), used to
verify the engine's ``train(bug_compat=True)`` byte parity on arbitrary
fixtures. Deliberately naive — it mirrors the reference's control flow
(per-boundary list rebuilds, linear-scan value lookup, global mutable
attVal) instead of the engine's vectorized reconstruction, so the two
implementations share no code paths beyond the semantics themselves.

Arrival-order model: single input split + Hadoop's default single
reducer (the reference's pseudo-distributed config), so reducer values
arrive in input-file row order. Cited sites: MyMapper.java:28-116,
MyReducer.java:36-298, Main.java:41-131,218-289, Rule.java:22-33.
"""

from __future__ import annotations

import math

from c4_5decisiontreebasedonmapreduce_spark.operators.bug_compat import (
    ReferenceCrash,
    java_double_str,
)

_LOG2 = math.log(2.0)


def _is_fit_rule(rule, row, numeric):
    # MyMapper.isFitRule:89-116, incl. the Q1 truncating re-parse
    for aid, want in rule["conditions"].items():
        if numeric[aid]:
            if want[0] == "<":
                num = want[2:-1]
            else:
                num = want[1:-1]
            try:
                cmp = float(num)
            except ValueError:
                raise ReferenceCrash("NumberFormatException (MyMapper.java:98)")
            if float(row[aid]) <= cmp:
                cmp_str = "<=" + java_double_str(cmp)
            else:
                cmp_str = ">" + java_double_str(cmp)
        else:
            cmp_str = row[aid]
        if cmp_str != want:
            return False
    return True


def _info(class_count, data_count):
    info = 0.0
    for i in class_count:
        if i != 0:
            p = i / data_count
            info += (-1.0 * p) * math.log(p) / _LOG2
    return info


def _split_i(att_val_num, data_count):
    s = 0.0
    for i in att_val_num:
        if i != 0:
            p = i / data_count
            s += (-1.0 * p) * math.log(p) / _LOG2
    return s


def _entr(att_val_num, class_val_num, data_count):
    entr = 0.0
    for i, val_count in enumerate(att_val_num):
        weight = val_count / data_count
        tmp = 0.0
        for j in class_val_num[i]:
            if j != 0:
                p = j / val_count
                tmp += (-1.0 * p) * math.log(p) / _LOG2
        entr += tmp * weight
    return entr


def _gain_ratio(info, entr, split_i, class_count, data_count):
    if split_i == 0.0:
        return 0.0 if any(c == data_count for c in class_count) else 0.00001
    return (info - entr) / split_i


def _reduce_categorical(pairs, classes):
    # MyReducer.java:51-109, literal linear-scan rebuild
    class_count = [0] * len(classes)
    att_val, att_val_num, class_val_num = [], [], []
    one_class_val = ""
    data_count = 0
    for value, cls in pairs:
        data_count += 1
        one_class_val = cls
        dex = classes.index(cls)
        class_count[dex] += 1
        if value in att_val:
            i = att_val.index(value)
            att_val_num[i] += 1
            class_val_num[i][dex] += 1
        else:
            att_val.append(value)
            att_val_num.append(1)
            class_val_num.append(
                [1 if c == cls else 0 for c in classes]
            )
    gr = _gain_ratio(
        _info(class_count, data_count),
        _entr(att_val_num, class_val_num, data_count),
        _split_i(att_val_num, data_count),
        class_count,
        data_count,
    )
    return gr, None, (one_class_val if gr == 0 else None)


def _reduce_numeric(pairs, classes):
    # MyReducer.java:112-205: buffer, sort, per-boundary rebuild
    class_count = [0] * len(classes)
    vals, val_classes = [], []
    data_count = 0
    for value, cls in pairs:
        data_count += 1
        class_count[classes.index(cls)] += 1
        vals.append(float(value))
        val_classes.append(cls)
    svals = sorted(vals)
    last_boundary = -1.0
    opt_boundary, opt_entr, opt_gr = -1.0, 100.0, -1.0
    for i, boundary in enumerate(svals):
        att_val, att_val_num, class_val_num = [], [], []
        if boundary == svals[-1]:
            break
        if i != 0 and boundary == last_boundary:
            continue
        big = small = 0
        for v, cls in zip(vals, val_classes):
            dex = classes.index(cls)
            if v > boundary:
                now = ">" + java_double_str(boundary)
                big += 1
            else:
                now = "<=" + java_double_str(boundary)
                small += 1
            if now in att_val:
                j = att_val.index(now)
                att_val_num[j] += 1
                class_val_num[j][dex] += 1
            else:
                att_val.append(now)
                att_val_num.append(1)
                class_val_num.append(
                    [1 if c == cls else 0 for c in classes]
                )
        if small < 0.1 * data_count or big < 0.1 * data_count:
            continue
        last_boundary = boundary
        now_entr = _entr(att_val_num, class_val_num, data_count)
        if now_entr < opt_entr:
            opt_boundary = boundary
            opt_entr = now_entr
            opt_gr = _gain_ratio(
                _info(class_count, data_count),
                now_entr,
                _split_i(att_val_num, data_count),
                class_count,
                data_count,
            )
    return opt_gr, opt_boundary, (val_classes[0] if opt_gr == 0 else None)


def _rule_to_string(rule):
    # Rule.toString (Rule.java:22-33) incl. the Q4 crash
    if not rule["conditions"]:
        raise ReferenceCrash(
            "StringIndexOutOfBoundsException (Rule.java:29)"
        )
    parts = "&".join(
        f"{aid},{rule['conditions'][aid]}"
        for aid in sorted(rule["conditions"])  # HashMap order, aid < 16
    )
    return parts + ":" + rule["label"]


def reference_train_lines(rows, schema):
    """Run the full reference pipeline on raw string ``rows`` and return
    the final stdout rule lines (``"  " + rule.toString()``,
    Main.java:128-131). Raises :class:`ReferenceCrash` where the
    reference would abort."""
    attrs = [a.name for a in schema.features]
    numeric = [a.is_numeric for a in schema.features]
    classes = list(schema.label_domain)
    att_val = {i: list(a.domain) for i, a in enumerate(schema.features)}
    for row in rows:
        if row[len(attrs)] not in classes:
            raise ReferenceCrash(
                "ArrayIndexOutOfBoundsException: undeclared class"
                " (MyReducer.java:64,119)"
            )

    model = []
    queue = [{"conditions": {}, "label": ""}]
    while queue:
        # mapper pass: (rid&aid) -> [(value, class)...] in row order
        groups: dict[str, list] = {}
        for row in rows:
            for rid, rule in enumerate(queue):
                if _is_fit_rule(rule, row, numeric):
                    for aid in range(len(attrs)):
                        if aid not in rule["conditions"]:
                            groups.setdefault(f"{rid}&{aid}", []).append(
                                (row[aid], row[len(attrs)])
                            )
        # one reducer, keys in Text byte order
        out_lines = []
        for key in sorted(groups):
            aid = int(key.split("&")[1])
            reduce = _reduce_numeric if numeric[aid] else _reduce_categorical
            gr, boundary, leaf = reduce(groups[key], classes)
            out_lines.append((key, gr, boundary, leaf))
        # getOptAttIndex (Main.java:218-269)
        max_gr = [0.0] * len(queue)
        opt_index = [-2] * len(queue)
        seaf_val = [None] * len(queue)
        for key, gr, boundary, leaf in out_lines:
            rid, aid = (int(x) for x in key.split("&"))
            if numeric[aid]:
                b = java_double_str(boundary)
                att_val[aid] = ["<=" + b, ">" + b]
            if gr == 0:
                seaf_val[rid] = leaf
                opt_index[rid] = -1
                continue
            if gr > max_gr[rid]:
                max_gr[rid] = gr
                opt_index[rid] = aid
        # expansion (Main.java:98-122)
        new_queue = []
        for i, rule in enumerate(queue):
            if opt_index[i] == -2:
                continue
            if opt_index[i] == -1:
                model.append(
                    {"conditions": dict(rule["conditions"]),
                     "label": seaf_val[i]}
                )
                continue
            for v in att_val[opt_index[i]]:
                cond = dict(rule["conditions"])
                cond[opt_index[i]] = v
                new_queue.append({"conditions": cond, "label": ""})
        queue = new_queue

    return ["  " + _rule_to_string(r) for r in model]
