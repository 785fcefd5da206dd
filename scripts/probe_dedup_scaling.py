"""Scaling probe for the dedup pipeline: candidate counts + wall time
as the corpus multiplies.

Builds K-times-multiplied copies of $SPARK_GRAFT_SF_DIR/documents.parquet.
Every copy beyond the first gets each token prefixed with a copy tag
(`c3the c3quick ...`), so copies are mutually non-duplicate in shingle
space while each copy preserves the original near-dup structure exactly —
i.e. the TRUE duplicate workload (clusters, verified pairs) scales
linearly with K, and any superlinear growth in candidate pairs or wall
time is the pipeline bending, not the data. This is the multiplied-corpus
analog of the c45_train 10x probe (SURVEY §7).

Measured per K, each in a fresh timing (cold within one session):
  - n_docs, shingle rows
  - jaccard candidate pairs (rare-shingle equi-join, SHINGLE_DF_CAP)
  - minhash candidate pairs (LSH band collisions)
  - wall time of dedup_ngram_jaccard / dedup_minhash / dedup_cluster

Usage: python scripts/probe_dedup_scaling.py [K ...]   (default: 1 3 10)
Prints one JSON line per K.
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
from c4_5decisiontreebasedonmapreduce_spark.operators import bpe as BPE  # noqa: E402
from c4_5decisiontreebasedonmapreduce_spark.operators import chunking as CH  # noqa: E402
from c4_5decisiontreebasedonmapreduce_spark.operators import dedup as D  # noqa: E402
from c4_5decisiontreebasedonmapreduce_spark.operators import packing as PK  # noqa: E402
from c4_5decisiontreebasedonmapreduce_spark.operators import pii as PII  # noqa: E402
from c4_5decisiontreebasedonmapreduce_spark.operators import pipeline as PL  # noqa: E402
from c4_5decisiontreebasedonmapreduce_spark.operators import sampling as SMP  # noqa: E402
from c4_5decisiontreebasedonmapreduce_spark.operators import retrieval as RV  # noqa: E402
from c4_5decisiontreebasedonmapreduce_spark.operators import text as TX  # noqa: E402
from c4_5decisiontreebasedonmapreduce_spark.operators import unigram as UG  # noqa: E402
from c4_5decisiontreebasedonmapreduce_spark.sources.parquet import (  # noqa: E402
    load_table,
)


def _bpe_train_probe(spark, sf_dir):
    """bpe_train at a fixed 32 merges: the multiplied corpus has a
    near-constant vocabulary (copy-tagged tokens add one tag per copy),
    so wall time should track the ONE word-count scan, not K× iteration
    cost."""
    from c4_5decisiontreebasedonmapreduce_spark.operators.text import docs

    return BPE.bpe_train_rel(docs(spark, sf_dir), n_merges=32)


def build_multiplied(spark, sf_dir: str, k: int, out_dir: str) -> None:
    """K disjoint near-copies of the documents table: copy i offsets
    doc_id and prefixes every token with ``c{i}`` (copy 0 is verbatim).
    The offset is a multiple of 70 = LCM(7, 10) so BOTH deterministic
    doc_id slices — the decontamination benchmark (mod 7) and the
    incremental-ingest batch (mod 10) — select the SAME per-copy
    membership as the original; a non-multiple would rotate the mod-7
    class per copy and make each copy a different bench/corpus split,
    turning scaling deviations into data-split noise."""
    d = load_table(spark, sf_dir, "documents")
    cols = d.columns
    parts = [d]
    for i in range(1, k):
        parts.append(
            d.withColumn(
                "doc_id", F.col("doc_id") + F.lit(i * 105_000_000)
            )
            .withColumn(
                "text", F.regexp_replace("text", r"(\S+)", f"c{i}$1")
            )
            .select(cols)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )


def probe(spark, sf_dir: str, k: int) -> dict:
    # $SPARK_GRAFT_PROBE_OPS: comma-separated op-name filter (default:
    # everything). The K=100 curation-chain run (r9 verdict item 6)
    # uses this to probe just pipeline_pretraining/decontaminate/
    # dedup_spans/dedup_ngram_jaccard without paying the full matrix.
    only = os.environ.get("SPARK_GRAFT_PROBE_OPS")
    only_set = set(only.split(",")) if only else None

    def wanted(name: str) -> bool:
        return only_set is None or name in only_set

    tmp = tempfile.mkdtemp(prefix=f"dedup_probe_x{k}_")
    try:
        build_multiplied(spark, sf_dir, k, tmp)
        rec: dict = {"k": k}
        rec["n_docs"] = load_table(spark, tmp, "documents").count()

        sh = D._shingles_df(spark, tmp).localCheckpoint()
        rec["shingle_rows"] = sh.count()
        if wanted("jaccard_candidates"):
            t0 = time.perf_counter()
            rec["jaccard_candidates"] = D._jaccard_candidates(sh).count()
            rec["jaccard_cand_sec"] = round(time.perf_counter() - t0, 2)
        if wanted("minhash_candidates"):
            shh = sh.withColumn(
                "h", D.md5_long(F.col("shingle")) % D.MINHASH_P
            ).localCheckpoint()
            t0 = time.perf_counter()
            rec["minhash_candidates"] = D._minhash_candidates(shh).count()
            rec["minhash_cand_sec"] = round(time.perf_counter() - t0, 2)
            shh.unpersist()
        # free the shingle checkpoint before the op sweep — at K=100 it
        # is hundreds of millions of rows and every op below rebuilds
        # its own relations anyway
        sh.unpersist()

        for name, fn in (
            ("ngram_jaccard", D.dedup_ngram_jaccard),
            ("minhash", D.dedup_minhash),
            ("cluster", D.dedup_cluster),
            ("incremental", D.dedup_incremental),
            ("cluster_incremental", D.dedup_cluster_incremental),
            ("exact_incremental", D.dedup_exact_incremental),
            ("spans", D.dedup_spans),
            ("spans_incremental", D.dedup_spans_incremental),
            ("spans_apply", D.dedup_spans_apply),
            ("scrub_pii", PII.pii_scrub),
            ("pack_sequences", PK.pack_sequences),
            ("pipeline_pretraining", PL.pretraining_pipeline),
            ("lm_perplexity", TX.lm_perplexity),
            ("repetition_signals", TX.repetition_signals),
            ("shuffle_deterministic", PK.shuffle_deterministic),
            ("sample_mixture", SMP.sample_mixture),
            ("sample_temperature", SMP.sample_temperature),
            ("decontaminate_apply", D.decontaminate_apply),
            ("decontaminate_spans", D.decontaminate_spans),
            ("decontaminate_spans_apply", D.decontaminate_spans_apply),
            ("bpe_train", _bpe_train_probe),
            ("bpe_encode", BPE.bpe_encode),
            ("corpus_report", PL.corpus_report),
            # round-9 second wave: bloom twin should scale like (or
            # beat) decontaminate; chunk/split are single projections
            # whose cost is the output itself; DSIR is two explode
            # passes with B-bounded exchanges; finetuning composes them
            ("decontaminate", D.decontaminate),
            ("decontaminate_bloom", D.decontaminate_bloom),
            ("chunk_documents", CH.chunk_documents),
            ("split_train_eval", SMP.split_train_eval),
            ("sample_dsir", SMP.sample_dsir),
            ("pipeline_finetuning", PL.finetuning_pipeline),
            # round-10 second wave: bm25's copy-tagged queries only
            # match same-copy docs, so posting-join output scales ~K
            # (the 105M doc_id offset rotates the mod-97 query slice per
            # copy, so counts are ~linear, not exactly — wall is the
            # signal here); unigram's word table grows K× (copy tags
            # multiply the vocabulary), probing the EM loop's
            # vocab-bound claim
            ("bm25_topk", RV.bm25_topk),
            ("unigram_encode", UG.unigram_encode),
        ):
            if not wanted(name):
                continue
            t0 = time.perf_counter()
            rec[f"{name}_rows"] = fn(spark, tmp).count()
            rec[f"{name}_sec"] = round(time.perf_counter() - t0, 2)
        return rec
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ks = [int(a) for a in sys.argv[1:]] or [1, 3, 10]
    spark = get_spark(app_name="dedup-scaling-probe")
    spark.range(1000).count()
    for k in ks:
        print(json.dumps({"sf_dir": sf_dir, **probe(spark, sf_dir, k)}))
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
