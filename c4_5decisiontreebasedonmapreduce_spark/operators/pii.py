"""PII scrubbing — regex redaction of emails, IPv4 addresses, and
phone numbers from document text.

The redaction pass every production training-data pipeline runs before
the corpus leaves curation (C4 and the RefinedWeb/Dolma lineage all
ship one). The reference engine has no text surface at all, so this is
pure extension territory (SURVEY.md §2.C); what carries over is the
engine discipline: the whole scrub is a chain of JVM-side
``regexp_replace``/``regexp_count`` Column expressions in ONE
projection — no Python in the hot path, no shuffle, whole-stage
codegen end to end, embarrassingly parallel over document splits at
any scale.

Patterns are deliberately conservative (shared Java-regex/RE2 syntax
subset: character classes, bounded repetition, ``\\b``) so Spark and
the DuckDB oracle compile them identically. Counts are taken
SEQUENTIALLY — emails counted then masked, IPs counted on the
email-masked text, phones on the IP-masked text — so a token is never
double-counted by two pattern families and the counts always agree
with what the replacement pipeline actually removed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from c4_5decisiontreebasedonmapreduce_spark.operators.text import DOCS_SQL, docs

# Shared Spark/DuckDB regexes. Order matters and is fixed: emails first
# (their local part may contain digits and dots that the later patterns
# could nibble at), then dotted-quad IPs, then 3-3-4 phone numbers
# (whose digit runs would otherwise overlap IP octets).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Mask emails → IPs → phones in ``text_col`` and report what was
    removed. Adds ``clean_text`` plus ``n_emails``/``n_ips``/
    ``n_phones`` (counts of masked occurrences, taken sequentially as
    documented above); all other columns pass through untouched.

    One narrow projection, zero exchanges: the scrub composes with any
    scan or join without changing its plan shape."""
    t0 = F.col(text_col)
    t1 = F.regexp_replace(t0, EMAIL_RE, EMAIL_TOKEN)
    t2 = F.regexp_replace(t1, IP_RE, IP_TOKEN)
    t3 = F.regexp_replace(t2, PHONE_RE, PHONE_TOKEN)
    return df.withColumns(
        {
            "clean_text": t3,
            "n_emails": _count(t0, EMAIL_RE),
            "n_ips": _count(t1, IP_RE),
            "n_phones": _count(t2, PHONE_RE),
        }
    )


def _count(text: Column, pattern: str) -> Column:
    return F.regexp_count(text, F.lit(pattern)).cast("int")


# ---------------------------------------------------------------------------
# registry query: deterministic synthetic-PII injection + scrub
#
# The driver's synthetic documents contain no PII, so scrubbing them
# directly would grade the regexes only on the trivial all-clean case.
# The registry query therefore INJECTS deterministic synthetic PII —
# pure functions of doc_id, computed identically in Spark and in the
# DuckDB oracle — before scrubbing, so the sf-scale hash grade
# exercises real matches, replacements, and counts in both engines.

_INJ_EMAIL_MOD = 7  # doc_id % 7 == 0 → append an email
_INJ_PHONE_MOD = 11  # doc_id % 11 == 0 → append a phone number
_INJ_IP_MOD = 13  # doc_id % 13 == 0 → append an IPv4 address


def _inject(df: DataFrame) -> DataFrame:
    did = F.col("doc_id")
    email = F.concat(
        F.lit(" contact user"), did.cast("string"), F.lit("@example.com")
    )
    phone = F.concat(
        F.lit(" call 415-555-"),
        F.lpad((did % 10000).cast("string"), 4, "0"),
    )
    ip = F.concat(
        F.lit(" from 10."),
        (did % 200).cast("string"),
        F.lit(".0."),
        (did % 250).cast("string"),
    )
    dirty = F.concat(
        F.col("text"),
        F.when(did % _INJ_EMAIL_MOD == 0, email).otherwise(F.lit("")),
        F.when(did % _INJ_PHONE_MOD == 0, phone).otherwise(F.lit("")),
        F.when(did % _INJ_IP_MOD == 0, ip).otherwise(F.lit("")),
    )
    return df.withColumn("text", dirty)


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`scrub_pii` over the `documents` table with the
    deterministic synthetic-PII injection described above. Returns
    ``(doc_id, clean_text, n_emails, n_ips, n_phones)``."""
    d = _inject(docs(spark, sf_dir))
    par = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < par:
        d = d.repartition(par)
    return scrub_pii(d).select(
        "doc_id", "clean_text", "n_emails", "n_ips", "n_phones"
    )


PII_SCRUB_SQL = f"""
WITH dirty AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % {_INJ_EMAIL_MOD} = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR)
                      || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % {_INJ_PHONE_MOD} = 0
                 THEN ' call 415-555-'
                      || LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
         || CASE WHEN doc_id % {_INJ_IP_MOD} = 0
                 THEN ' from 10.' || CAST(doc_id % 200 AS VARCHAR)
                      || '.0.' || CAST(doc_id % 250 AS VARCHAR)
                 ELSE '' END AS text
  FROM {DOCS_SQL}
),
s1 AS (
  SELECT doc_id, text,
         REGEXP_REPLACE(text, '{EMAIL_RE}', '{EMAIL_TOKEN}', 'g') AS t1,
         CAST(LEN(REGEXP_EXTRACT_ALL(text, '{EMAIL_RE}')) AS INT) AS n_emails
  FROM dirty
),
s2 AS (
  SELECT doc_id, n_emails,
         REGEXP_REPLACE(t1, '{IP_RE}', '{IP_TOKEN}', 'g') AS t2,
         CAST(LEN(REGEXP_EXTRACT_ALL(t1, '{IP_RE}')) AS INT) AS n_ips
  FROM s1
)
SELECT doc_id,
       REGEXP_REPLACE(t2, '{PHONE_RE}', '{PHONE_TOKEN}', 'g') AS clean_text,
       n_emails, n_ips,
       CAST(LEN(REGEXP_EXTRACT_ALL(t2, '{PHONE_RE}')) AS INT) AS n_phones
FROM s2"""
