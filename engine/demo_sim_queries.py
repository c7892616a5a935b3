"""Similarity-search queries over the `embeddings` table: brute-force
cosine top-k (baseline) and random-hyperplane LSH bucketing (scale path).

All vector math is expressed with native higher-order functions
(zip_with/aggregate) — JVM-side, no Python in the hot path.  Hyperplane
weights are small-integer-valued (exact in IEEE doubles), so bucket bits
are bit-identical across engines; cosine scores are rounded before top-k
ordering with doc-id tie-breaks."""

from __future__ import annotations

from pyspark.sql import functions as F

from .demo_queries import _t

DIM = 64

# Corpus-size-adaptive plane count (round-1 fixed 4 planes / 16 buckets —
# at 100x scale each bucket is N/16 and within-bucket work goes quadratic).
# planes = clamp(ceil(log2(n / TARGET_BUCKET)), MIN, MAX), derived with
# INTEGER bit-length arithmetic (`bin()`) so Spark and DuckDB agree exactly
# (no libm log2 ulp risk).  Expected bucket width ~TARGET_BUCKET until the
# MAX_PLANES ceiling; beyond that the EMB_BUCKET_CAP skew guard bounds the
# self-join (same pattern as SIMHASH_BUCKET_CAP).
MIN_PLANES, MAX_PLANES = 4, 16
TARGET_BUCKET = 256
EMB_BUCKET_CAP = 4096

_N_PLANES_EXPR = (
    f"greatest({MIN_PLANES}, least({MAX_PLANES}, "
    f"length(bin(cast(ceil(_n / {TARGET_BUCKET}.0) as bigint) - 1))))")


def _plane(p: int) -> list[float]:
    """Deterministic integer-valued hyperplane weights: exact in doubles."""
    return [float(((p * 131 + d * 17) % 7) - 3) for d in range(DIM)]


def _dot(vec_col, weights: list[float]):
    lit = F.array(*[F.lit(w) for w in weights])
    return F.aggregate(
        F.zip_with(vec_col, lit, lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x)


def _with_adaptive_bucket(e):
    """+ `bucket` column from the corpus-size-adaptive plane count: the
    row count is one scalar agg broadcast to every row; plane p's bit only
    contributes while p < n_planes."""
    stats = (e.agg(F.count("*").alias("_n"))
             .select(F.expr(_N_PLANES_EXPR).alias("_np")))
    # nested when: the outer (cheap) plane-count guard must decide BEFORE
    # the dot product is evaluated — CaseWhen branches are lazy, so planes
    # beyond n_planes cost nothing (a single `&` conjunction computed all
    # MAX_PLANES dot products and doubled the query)
    bucket = sum(
        (F.when(F.lit(p) < F.col("_np"),
                F.when(_dot(F.col("embedding"), _plane(p)) >= 0,
                       1 << p).otherwise(0)).otherwise(0)
         for p in range(MAX_PLANES)), F.lit(0))
    return (e.crossJoin(F.broadcast(stats))
            .withColumn("bucket", bucket).drop("_np"))


def q_embedding_lsh_buckets(spark, sf_dir):
    """Random-hyperplane LSH with corpus-size-adaptive plane count;
    per-bucket stats.  The ANN scale path: at 10^12 rows the bucket id
    becomes the shuffle/partition key and candidate search stays within
    buckets whose expected width tracks TARGET_BUCKET."""
    e = _t(spark, sf_dir, "embeddings")
    return (_with_adaptive_bucket(e)
            .groupBy("bucket")
            .agg(F.count("*").alias("n_vecs"),
                 F.min("vec_id").alias("min_vec_id")))


def _sql_dot(col: str, weights: list[float]) -> str:
    lits = ", ".join(repr(w) for w in weights)
    return f"list_dot_product({col}, [{lits}])"


_SQL_N_PLANES = (
    f"GREATEST({MIN_PLANES}, LEAST({MAX_PLANES}, "
    f"LENGTH(bin(CAST(CEIL(COUNT(*) / {TARGET_BUCKET}.0) AS BIGINT) - 1))))")


def _sql_bucket_cte() -> str:
    bits = " + ".join(
        f"(CASE WHEN {p} < np.n_planes AND "
        f"{_sql_dot('embedding', _plane(p))} >= 0 THEN {1 << p} ELSE 0 END)"
        for p in range(MAX_PLANES))
    return f"""np AS (
  SELECT {_SQL_N_PLANES} AS n_planes FROM embeddings),
b AS (
  SELECT vec_id, embedding, ({bits}) AS bucket
  FROM embeddings, np)"""


SQL_EMBEDDING_LSH_BUCKETS = f"""
WITH {_sql_bucket_cte()}
SELECT bucket, COUNT(*) AS n_vecs, MIN(vec_id) AS min_vec_id
FROM b GROUP BY 1
"""


def q_embedding_topk(spark, sf_dir):
    """Brute-force cosine top-k against a fixed query vector (vec_id = 0):
    the exact baseline ANN answers are measured against."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 0).select("embedding").first()[0]
    q = [float(x) for x in q]
    qn = sum(x * x for x in q) ** 0.5
    dot = _dot(F.col("embedding"), q)
    norm = F.sqrt(F.aggregate(F.col("embedding"), F.lit(0.0),
                              lambda a, x: a + x * x))
    cos = F.round(dot / (norm * F.lit(qn)), 4)
    return (e.where(F.col("vec_id") != 0)
            .select("vec_id", cos.alias("cos_sim"))
            .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
            .limit(10))


def _sql_topk() -> str:
    return """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id,
         ROUND(list_dot_product(e.embedding, q.qv)
               / (sqrt(list_dot_product(e.embedding, e.embedding))
                  * sqrt(list_dot_product(q.qv, q.qv))), 4) AS cos_sim
  FROM embeddings e, q WHERE e.vec_id <> 0)
SELECT vec_id, cos_sim FROM scored
ORDER BY cos_sim DESC, vec_id ASC LIMIT 10
"""


SQL_EMBEDDING_TOPK = _sql_topk()


def q_embedding_centroid_dist(spark, sf_dir):
    """Per-label centroid + distance-to-centroid stats (the cluster-band
    classification analog of the reference's k-means stage, Step3:451-455,
    without iterative fitting: one agg for centroids, one join for
    distances)."""
    e = _t(spark, sf_dir, "embeddings")
    by_dim = e.select("label", F.posexplode("embedding").alias("d", "x"))
    centroids = (by_dim.groupBy("label", "d").agg(F.avg("x").alias("c"))
                 .groupBy("label")
                 .agg(F.array_sort(F.collect_list(F.struct("d", "c")))
                      .alias("pairs"))
                 .select("label", F.expr("transform(pairs, p -> p.c)").alias("centroid")))
    joined = e.join(F.broadcast(centroids), "label")
    dist = F.sqrt(F.aggregate(
        F.zip_with(F.col("embedding"), F.col("centroid"),
                   lambda x, c: (x - c) * (x - c)),
        F.lit(0.0), lambda a, x: a + x))
    return (joined.select("label", dist.alias("dist"))
            .groupBy("label")
            .agg(F.count("*").alias("n"),
                 F.round(F.avg("dist"), 3).alias("avg_dist"),
                 F.round(F.max("dist"), 3).alias("max_dist")))


SQL_EMBEDDING_CENTROID_DIST = """
WITH dims AS (
  SELECT label, vec_id, embedding[CAST(t.i AS INT)] AS x, t.i AS d
  FROM embeddings, RANGE(1, 65) t(i)),
cent AS (
  SELECT label, d, AVG(x) AS c FROM dims GROUP BY label, d),
dist AS (
  SELECT dims.label, dims.vec_id,
         SQRT(SUM((dims.x - cent.c) * (dims.x - cent.c))) AS dist
  FROM dims JOIN cent ON dims.label = cent.label AND dims.d = cent.d
  GROUP BY dims.label, dims.vec_id)
SELECT label, COUNT(*) AS n,
       ROUND(AVG(dist), 3) AS avg_dist,
       ROUND(MAX(dist), 3) AS max_dist
FROM dist GROUP BY label
"""


def q_embedding_neardup_cosine(spark, sf_dir):
    """Embedding-cosine near-dup: adaptive LSH bucket as the BLOCKING key
    (plane count scales with corpus size), bucket-width cap as the skew
    guard (a degenerate bucket wider than EMB_BUCKET_CAP is skipped rather
    than joined quadratically), then the exact-cosine VERIFY stage over
    only within-bucket candidate pairs.  Bound: per-bucket pair work is
    <= EMB_BUCKET_CAP^2/2 regardless of corpus skew; expected bucket width
    is ~TARGET_BUCKET until the MAX_PLANES ceiling.  (This synthetic table
    plants no true near-dups — max pairwise cosine ~0.51 — so the 0.35
    floor sits where candidates exist.)"""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "embeddings")
    b = _with_adaptive_bucket(e).select("vec_id", "embedding", "bucket")
    w = Window.partitionBy("bucket")
    b = (b.withColumn("_bw", F.count("*").over(w))
         .where(F.col("_bw") <= EMB_BUCKET_CAP).drop("_bw"))
    # norm per ROW, not per pair: the verify stage evaluates O(width^2/2)
    # pairs per bucket, and the naive cosine costs three O(dim) folds per
    # pair — precomputing |v| once per row leaves one fold per pair (same
    # float ops on the same values, so results are unchanged; the oracle
    # mirrors the refactor)
    b = b.withColumn("nrm", F.sqrt(F.aggregate(
        F.col("embedding"), F.lit(0.0), lambda acc, x: acc + x * x)))
    a, c = b.alias("a"), b.alias("c")
    dot = F.aggregate(F.zip_with(F.col("a.embedding"), F.col("c.embedding"),
                                 lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    cos = F.round(dot / (F.col("a.nrm") * F.col("c.nrm")), 3)
    return (a.join(c, (F.col("a.bucket") == F.col("c.bucket"))
                   & (F.col("a.vec_id") < F.col("c.vec_id")))
            .select(F.col("a.vec_id").alias("vec_a"),
                    F.col("c.vec_id").alias("vec_b"),
                    cos.alias("cos_sim"))
            .where(F.col("cos_sim") >= 0.35))


def _sql_neardup() -> str:
    cos = "list_dot_product(a.embedding, c.embedding) / (a.nrm * c.nrm)"
    return f"""
WITH {_sql_bucket_cte()},
capped AS (
  SELECT vec_id, embedding, bucket,
         sqrt(list_dot_product(embedding, embedding)) AS nrm
  FROM (
    SELECT *, COUNT(*) OVER (PARTITION BY bucket) AS bw FROM b) t
  WHERE bw <= {EMB_BUCKET_CAP})
SELECT * FROM (
  SELECT a.vec_id AS vec_a, c.vec_id AS vec_b, ROUND({cos}, 3) AS cos_sim
  FROM capped a JOIN capped c ON a.bucket = c.bucket AND a.vec_id < c.vec_id)
WHERE cos_sim >= 0.35
"""


SQL_EMBEDDING_NEARDUP_COSINE = _sql_neardup()

N_QUERIES_IVF = 5


def q_ann_ivf(spark, sf_dir):
    """IVF-style ANN: build the coarse index (per-label mean centroids, one
    agg), assign every vector to its nearest centroid cell (broadcast cross
    against the tiny centroid set), then answer the query set (vec_id <
    5) by exact cosine top-3 *within the query's cell only* — the
    IVF probe path.  Cells ~ K << N, so assignment is a broadcast
    nested-loop over K and the probe join shuffles on cell id."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "embeddings")
    by_dim = e.select("label", F.posexplode("embedding").alias("d", "x"))
    centroids = (by_dim.groupBy("label", "d").agg(F.avg("x").alias("c"))
                 .groupBy("label")
                 .agg(F.array_sort(F.collect_list(F.struct("d", "c")))
                      .alias("pairs"))
                 .select(F.col("label").alias("cell"),
                         F.expr("transform(pairs, p -> p.c)").alias("centroid")))
    dist = F.sqrt(F.aggregate(
        F.zip_with(F.col("embedding"), F.col("centroid"),
                   lambda x, c: (x - c) * (x - c)),
        F.lit(0.0), lambda acc, x: acc + x))
    assigned = (e.crossJoin(F.broadcast(centroids))
                .withColumn("dist", dist)
                .withColumn("rk", F.row_number().over(
                    Window.partitionBy("vec_id").orderBy("dist", "cell")))
                .where(F.col("rk") == 1)
                .select("vec_id", "embedding", "cell")
                # norm per row before the probe join, not per (query, cand)
                # pair — same hoist as the near-dup verify stage
                .withColumn("nrm", F.sqrt(F.aggregate(
                    F.col("embedding"), F.lit(0.0),
                    lambda acc, x: acc + x * x))))
    q = (assigned.where(F.col("vec_id") < N_QUERIES_IVF)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("qv"),
                 F.col("nrm").alias("qn"), "cell"))
    cand = assigned.select(F.col("vec_id").alias("cand_id"),
                           F.col("embedding").alias("cv"),
                           F.col("nrm").alias("cn"), "cell")
    dot = F.aggregate(F.zip_with(F.col("qv"), F.col("cv"),
                                 lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    cos = F.round(dot / (F.col("qn") * F.col("cn")), 3)
    scored = (q.join(cand, "cell")
              .where(F.col("cand_id") != F.col("query_id"))
              .select("query_id", "cand_id", cos.alias("cos_sim")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 3)
            .select("query_id", "rank", "cand_id", "cos_sim"))


SQL_ANN_IVF = f"""
WITH dims AS (
  SELECT label, vec_id, embedding[CAST(t.i AS INT)] AS x, t.i AS d
  FROM embeddings, RANGE(1, 65) t(i)),
cent AS (
  SELECT label AS cell, d, AVG(x) AS c FROM dims GROUP BY label, d),
d2 AS (
  SELECT dims.vec_id, cent.cell,
         SQRT(SUM((dims.x - cent.c) * (dims.x - cent.c))) AS dist
  FROM dims JOIN cent ON dims.d = cent.d
  GROUP BY dims.vec_id, cent.cell),
assigned AS (
  SELECT d2.vec_id, e.embedding, d2.cell,
         ROW_NUMBER() OVER (PARTITION BY d2.vec_id
                            ORDER BY d2.dist, d2.cell) AS rk
  FROM d2 JOIN embeddings e ON d2.vec_id = e.vec_id),
cells AS (SELECT vec_id, embedding, cell,
                 sqrt(list_dot_product(embedding, embedding)) AS nrm
          FROM assigned WHERE rk = 1),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         ROUND(list_dot_product(q.embedding, c.embedding)
               / (q.nrm * c.nrm), 3) AS cos_sim
  FROM cells q JOIN cells c ON q.cell = c.cell AND q.vec_id <> c.vec_id
  WHERE q.vec_id < {N_QUERIES_IVF}),
ranked AS (
  SELECT query_id, cand_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, cand_id ASC) AS rank
  FROM scored)
SELECT query_id, rank, cand_id, cos_sim FROM ranked WHERE rank <= 3
"""


QUERIES = {
    "embedding_lsh_buckets": q_embedding_lsh_buckets,
    "embedding_topk": q_embedding_topk,
    "embedding_centroid_dist": q_embedding_centroid_dist,
    "embedding_neardup_cosine": q_embedding_neardup_cosine,
    "ann_ivf": q_ann_ivf,
}

ORACLE_SQL = {
    "embedding_lsh_buckets": SQL_EMBEDDING_LSH_BUCKETS,
    "embedding_topk": SQL_EMBEDDING_TOPK,
    "embedding_centroid_dist": SQL_EMBEDDING_CENTROID_DIST,
    "embedding_neardup_cosine": SQL_EMBEDDING_NEARDUP_COSINE,
    "ann_ivf": SQL_ANN_IVF,
}
