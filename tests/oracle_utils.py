"""Local mirror of the driver's t2 check: run a registry query on Spark and
its oracle SQL on DuckDB over the same parquet tables; compare row count,
column names, and the order-insensitive multiset of values."""

from __future__ import annotations

import math

import duckdb


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # guard against -0.0 and representation noise after upstream rounding
        return round(v + 0.0, 9)
    if isinstance(v, bool):
        return bool(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    names = [cols[i] for i in order]
    data = sorted(
        (tuple(_norm_cell(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )
    return names, data


def compare(spark_df, con, sql: str, name: str = "?") -> None:
    s_rows = spark_df.collect()
    s_cols = spark_df.columns
    res = con.execute(sql)
    d_cols = [c[0] for c in res.description]
    d_rows = res.fetchall()

    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    sn, sd = _normalize(s_cols, [tuple(r) for r in s_rows])
    dn, dd = _normalize(d_cols, d_rows)
    assert sn == dn, f"{name}: columns spark={sn} duckdb={dn}"
    if sd != dd:
        diffs = [
            (a, b) for a, b in zip(sd, dd) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs {diffs}")
