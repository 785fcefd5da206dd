"""Hot-shingle SKEW probe (VERDICT r7 item 5): a boilerplate corpus where
every document shares one ubiquitous preamble, so each boilerplate
shingle's document frequency equals the corpus size — the pathological
join key that would meet df² candidate pairs on one task. Measures the
candidate count and wall time WITH the df-cap (`dedup.SHINGLE_DF_CAP`
drops the hot shingles from candidate GENERATION; the residual join
still counts them toward each candidate pair's exact intersection) and
WITHOUT it (df_cap=∞ → the quadratic blowup, run at a size where that is
merely slow, not fatal). The semantic half — capped and uncapped runs
emit IDENTICAL verified pairs on such a corpus — is pytest-pinned in
tests/test_extensions.py::test_hot_shingle_df_cap_bounds_candidates.

Usage: python scripts/probe_hot_shingle_skew.py [n_docs]
Prints one JSON line; per-variant lines go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from c4_5decisiontreebasedonmapreduce_spark import get_spark  # noqa: E402
from c4_5decisiontreebasedonmapreduce_spark.operators import (  # noqa: E402
    dedup as D,
)


def build_hot_shingle_corpus(spark, out_dir: str, n_docs: int) -> None:
    """Write a documents.parquet of ``n_docs`` boilerplate documents:
    a shared 42-token preamble (→ 40 trigram shingles with df = n_docs,
    all past any realistic df-cap), pair-shared 30-token bodies (docs
    2k/2k+1 are true near-dups through RARE shingles, df=2) and a
    3-token per-doc unique tail (so pairs are near- not exact dups).
    Cross-pair Jaccard ≈ 40/112 < 0.5 threshold; within-pair ≈ 0.9."""
    bp = " ".join(f"bp{i}" for i in range(42))
    rows = []
    for d in range(n_docs):
        body = " ".join(f"p{d // 2}w{j}" for j in range(30))
        tail = f"t{d}a t{d}b t{d}c"
        text = f"{bp} {body} {tail}"
        rows.append((d, text, "en", "synthetic", len(text)))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    spark = get_spark(app_name="probe-hot-shingle-skew")
    spark.range(1000).count()  # JVM warm-up

    out_dir = tempfile.mkdtemp(prefix="hot_shingle_")
    build_hot_shingle_corpus(spark, out_dir, n_docs)
    out: dict = {"n_docs": n_docs, "expected_pairs": n_docs // 2}

    for label, cap in (
        ("capped", D.SHINGLE_DF_CAP),
        ("uncapped", 10**9),
    ):
        sh = D._shingles_df(spark, out_dir).localCheckpoint()
        t0 = time.perf_counter()
        pairs = D.dedup_ngram_jaccard(spark, out_dir, df_cap=cap)
        n_pairs = pairs.count()
        dt = round(time.perf_counter() - t0, 3)
        # candidate volume the join had to verify
        from pyspark.sql import functions as F

        rare = sh.join(
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") <= cap)
            .select("shingle"),
            "shingle",
        )
        n_cand = (
            rare.select(F.col("doc_id").alias("doc_a"), "shingle")
            .join(
                rare.select(F.col("doc_id").alias("doc_b"), "shingle"),
                "shingle",
            )
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
            .count()
        )
        out[f"{label}_sec"] = dt
        out[f"{label}_verified_pairs"] = n_pairs
        out[f"{label}_candidate_pairs"] = n_cand
        print(
            f"# {label} (df_cap={cap}): {dt}s, {n_cand} candidates,"
            f" {n_pairs} verified",
            file=sys.stderr,
        )

    print(json.dumps(out, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
