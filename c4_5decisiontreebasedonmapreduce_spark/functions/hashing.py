"""Engine-portable hashing primitives.

Spark's native ``xxhash64``/``hash`` have no DuckDB equivalent, so every
operator that needs deterministic, oracle-checkable hashing (minhash,
simhash, fingerprints) builds on MD5, which both engines implement
identically over UTF-8 bytes. A 15-hex-digit prefix (60 bits) of the
digest, parsed as an integer, gives a portable unsigned-ish int64 hash:

    Spark :  CAST(CONV(SUBSTRING(MD5(x), 1, 15), 16, 10) AS BIGINT)
    DuckDB:  CAST(CONCAT('0x', SUBSTR(MD5(x), 1, 15)) AS BIGINT)

MD5 is used as a mixing function, not for security.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long(col: Column) -> Column:
    """Portable 60-bit integer hash of a string column."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str) -> str:
    """DuckDB twin of :func:`md5_long`."""
    return f"CAST(CONCAT('0x', SUBSTR(MD5({expr}), 1, 15)) AS BIGINT)"
