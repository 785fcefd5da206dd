"""Bloom-prefilter probe on a DEPLOYMENT-SHAPED corpus.

The driver's synthetic documents share one ~30-word vocabulary across
every doc_id, so the mod-7 "benchmark" slice covers ~74% of the corpus
shingle space at sf0.1 and a benchmark-membership prefilter cannot drop
much there (measured: 26% dropped, bloom 1.6× slower than exact — the
tax exceeds the savings). Real decontamination is the opposite shape:
the benchmark is a few eval suites whose text barely overlaps a web
corpus, membership is rare, and the prefilter's drop rate is ~100%
minus actual contamination.

This probe builds that shape: ``n_docs`` corpus documents over a large
random vocabulary, a small benchmark slice over a DISJOINT vocabulary,
and a ``leak_pct`` of corpus docs that quote a benchmark doc (the
contamination the op must still flag). It times `decontaminate` vs
`decontaminate_bloom` (both return identical rows — asserted) and
reports the drop rate.

Usage: python scripts/probe_bloom_decontam.py [n_docs] [leak_pct]
       (defaults 50000 0.01)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from c4_5decisiontreebasedonmapreduce_spark import get_spark  # noqa: E402
from c4_5decisiontreebasedonmapreduce_spark.operators import (  # noqa: E402
    dedup as D,
)


def build(spark, out_dir: str, n_docs: int, leak_pct: float) -> None:
    """Corpus docs draw 40 tokens from a 50k-word vocabulary keyed by a
    deterministic hash of (doc_id, position); benchmark docs (mod-7
    slice) draw from a disjoint 5k-word vocabulary; a leak_pct slice of
    corpus docs instead REPEAT the text of benchmark doc (doc_id mod
    something) — full containment, must flag."""
    d = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    is_bench = (
        F.col("doc_id") % D.DECONTAM_BENCH_MOD == D.DECONTAM_BENCH_REM
    )
    # 40 pseudo-random tokens per doc from the side-appropriate vocab
    def text_of(vocab_prefix: str, vocab_size: int, salt: str):
        toks = F.transform(
            F.sequence(F.lit(0), F.lit(39)),
            lambda i: F.concat(
                F.lit(vocab_prefix),
                (
                    F.abs(
                        F.xxhash64(
                            F.col("doc_id"), i, F.lit(salt)
                        )
                    )
                    % vocab_size
                ).cast("string"),
            ),
        )
        return F.array_join(toks, " ")

    # leaked corpus docs quote benchmark doc (7*(doc_id % 97) + 2) —
    # same token generator as that bench doc, so containment is total
    leak_src = (F.col("doc_id") % 97) * 7 + D.DECONTAM_BENCH_REM
    leak_text = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(39)),
            lambda i: F.concat(
                F.lit("bench"),
                (F.abs(F.xxhash64(leak_src, i, F.lit("b"))) % 5000).cast(
                    "string"
                ),
            ),
        ),
        " ",
    )
    is_leak = (~is_bench) & (
        F.col("doc_id") % int(1 / leak_pct) == 1
    )
    docs = d.select(
        "doc_id",
        F.when(is_bench, text_of("bench", 5000, "b"))
        .when(is_leak, leak_text)
        .otherwise(text_of("web", 50_000, "w"))
        .alias("text"),
        F.lit("en").alias("lang"),
        F.lit("probe").alias("source"),
        F.lit(0).cast("long").alias("n_chars"),
    )
    docs.write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    leak_pct = float(sys.argv[2]) if len(sys.argv) > 2 else 0.01
    spark = get_spark(app_name="bloom-probe")
    spark.range(1000).count()
    tmp = tempfile.mkdtemp(prefix="bloom_probe_")
    try:
        build(spark, tmp, n_docs, leak_pct)
        rec: dict = {"n_docs": n_docs, "leak_pct": leak_pct}
        # drop rate: what fraction of corpus shingle rows the filter kills
        is_bench = (
            F.col("doc_id") % D.DECONTAM_BENCH_MOD == D.DECONTAM_BENCH_REM
        )
        sh = D._shingles_df(spark, tmp).localCheckpoint()
        bench = sh.where(is_bench).select(
            F.col("doc_id").alias("bench_id"), "shingle"
        )
        corp = sh.where(~is_bench)
        bitmap = D.build_shingle_bloom(bench, 1 << 21, D.BLOOM_K)
        n_corp = corp.count()
        n_kept = D._bloom_filter_rows(
            corp, "shingle", bitmap, 1 << 21, D.BLOOM_K
        ).count()
        rec["corp_shingles"] = n_corp
        rec["kept_by_bloom"] = n_kept
        rec["drop_rate"] = round(1 - n_kept / n_corp, 4)
        for name, fn in (
            ("exact", D.decontaminate),
            ("bloom", D.decontaminate_bloom),
        ):
            times, rows = [], None
            for rep in range(3):
                t0 = time.perf_counter()
                rows = fn(spark, tmp).count()
                times.append(time.perf_counter() - t0)
            rec[f"{name}_rows"] = rows
            rec[f"{name}_cold_sec"] = round(times[0], 2)
            rec[f"{name}_warm_sec"] = round(min(times[1:]), 2)
        a = sorted(map(tuple, D.decontaminate(spark, tmp).collect()))
        b = sorted(map(tuple, D.decontaminate_bloom(spark, tmp).collect()))
        rec["identical"] = a == b
        print(json.dumps(rec))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
