"""Similarity search over the ``embeddings`` table (array<float>, 64-d).

Two paths:

- **exact top-k** (`similarity_topk_exact`): brute-force cosine of every
  query against every candidate, window top-k per query. The correctness
  baseline; oracle-checked. Scale shape: the candidate side stays
  partitioned, each query broadcasts (queries are small by definition),
  and Spark's WindowGroupLimit computes map-side top-k before the
  shuffle -- so cost is one pass over candidates per batch of queries.
- **LSH ANN** (`similarity_topk_ann`): random-hyperplane signatures
  bucket candidates; queries probe every bucket within hamming distance
  _PROBE_RADIUS of their own, then rerank the probed candidates
  exactly. Cost per query drops from |candidates| to the probed-bucket
  mass. Approximate by construction -- registered rows-only for the
  driver; tests/test_functions.py asserts recall@k against the exact
  baseline instead.
- **IVF ANN** (`similarity_topk_ivf`): k-means (MLlib, fixed seed)
  coarse quantizer; vectors are assigned to inverted lists by nearest
  centroid, queries search the nprobe closest lists and rerank exactly.
  The standard billion-scale layout (train centroids on a sample,
  partition the corpus by list id, probe per query).

Recall caveat, measured honestly: the synthetic test embeddings are
near-uniform on the sphere (max pairwise cosine ~0.5), which is the
information-theoretic worst case for space-partitioning ANN -- both
variants land ~0.5-0.65 recall@5 while probing 25-50% of the corpus.
On real clustered embedding corpora the same layouts probe a few
percent for >0.9 recall; the tests pin the measured floors so a
regression is visible without overclaiming.

Dot products are sequential folds over doubles (same order both
engines) so cosine values -- and therefore rankings -- are
bitwise-reproducible. Hyperplanes are a fixed seeded numpy draw
embedded as literals: no runtime randomness anywhere.
"""

from __future__ import annotations

import itertools
from typing import Callable

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.testdata import load_table
from .dedup import _dot

SparkQuery = Callable[[SparkSession, str], DataFrame]

_N_QUERIES = 8  # vec_id < 8 act as the query set
_TOP_K = 5
_N_PLANES = 5  # 32 LSH buckets
_PROBE_RADIUS = 2  # probe buckets within this hamming distance
_DIM = 64
_IVF_K = 16  # k-means lists
_IVF_NPROBE = 4  # lists searched per query

_DOT_DUCK = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
    " list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i])),"
    " (acc, x) -> acc + x)"
)

TOPK_EXACT_SQL = f"""
  WITH e AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
    FROM embeddings
  ),
  n AS (
    SELECT vec_id, v, sqrt({_DOT_DUCK.format(a="v", b="v")}) AS nrm
    FROM e
  ),
  scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           {_DOT_DUCK.format(a="q.v", b="c.v")} / (q.nrm * c.nrm) AS cosine
    FROM n q JOIN n c ON q.vec_id < {_N_QUERIES} AND c.vec_id != q.vec_id
  )
  SELECT query_id, neighbor_id, cosine, rank
  FROM (
    SELECT query_id, neighbor_id, cosine,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, neighbor_id ASC) AS rank
    FROM scored)
  WHERE rank <= {_TOP_K}
  ORDER BY query_id, rank
"""


def _normed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    return e.select("vec_id", "v", F.sqrt(_dot(F.col("v"), F.col("v"))).alias("nrm"))


def q_topk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _normed(spark, sf_dir)
    q = n.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("vq"),
        F.col("nrm").alias("nq"),
    )
    c = n.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("vc"),
        F.col("nrm").alias("nc"),
    )
    cosine = _dot(F.col("vq"), F.col("vc")) / (F.col("nq") * F.col("nc"))
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# LSH ANN: signed random projections -> bucket join -> exact rerank.
# ---------------------------------------------------------------------------


def _hyperplanes() -> np.ndarray:
    """Fixed seeded hyperplane draw; literal-embedded, no runtime RNG."""
    rng = np.random.default_rng(42)
    return rng.standard_normal((_N_PLANES, _DIM))


def _bucket_col(vec_col: str) -> F.Column:
    """LSH bucket id: sign bit per hyperplane, packed into an int."""
    planes = _hyperplanes()
    bucket = F.lit(0)
    for p in range(_N_PLANES):
        plane = F.array(*[F.lit(float(x)) for x in planes[p]])
        proj = _dot(F.col(vec_col), plane)
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def q_topk_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _normed(spark, sf_dir)
    sig = n.withColumn("bucket", _bucket_col("v"))
    cand = sig.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("vc"),
        F.col("nrm").alias("nc"),
        "bucket",
    )
    # multiprobe: every bucket within hamming distance _PROBE_RADIUS
    masks = [0] + [
        sum(1 << p for p in combo)
        for r in range(1, _PROBE_RADIUS + 1)
        for combo in itertools.combinations(range(_N_PLANES), r)
    ]
    probes = F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks])
    q = (
        sig.filter(F.col("vec_id") < _N_QUERIES)
        .withColumn("probe", F.explode(probes))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("vq"),
            F.col("nrm").alias("nq"),
            F.col("probe").alias("bucket"),
        )
    )
    cosine = _dot(F.col("vq"), F.col("vc")) / (F.col("nq") * F.col("nc"))
    scored = (
        F.broadcast(q)
        .join(cand, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine.alias("cosine"))
        .distinct()  # a candidate can match several probes
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# IVF ANN: k-means coarse quantizer -> inverted lists -> probe + rerank.
# ---------------------------------------------------------------------------


def q_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    n = _normed(spark, sf_dir).withColumn(
        "unit", F.transform("v", lambda x: x / F.col("nrm"))
    )
    feat = n.withColumn("features", array_to_vector("unit"))
    # train the coarse quantizer (at 100 TB: fit on a sample, broadcast
    # the centroids; k-means itself is MLlib's distributed Lloyd's)
    km = KMeans(k=_IVF_K, seed=42, maxIter=20).fit(feat)
    assigned = km.transform(feat).withColumnRenamed("prediction", "list_id")
    cents = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(km.clusterCenters())],
        "list_id int, cv array<double>",
    )
    q = assigned.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("unit").alias("uq")
    )
    # rank lists per query by centroid dot product, keep nprobe
    qc = q.crossJoin(F.broadcast(cents)).withColumn(
        "cdot", _dot(F.col("uq"), F.col("cv"))
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("cdot").desc(), F.col("list_id").asc()
    )
    probes = (
        qc.withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= _IVF_NPROBE)
        .select("query_id", "uq", "list_id")
    )
    cand = assigned.select(
        F.col("vec_id").alias("neighbor_id"), F.col("unit").alias("uc"), "list_id"
    )
    scored = (
        F.broadcast(probes)
        .join(cand, "list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id", _dot(F.col("uq"), F.col("uc")).alias("cosine")
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .orderBy("query_id", "rank")
    )


QUERIES_EXPORT: dict[str, tuple[SparkQuery, str | None]] = {
    "similarity_topk_exact": (q_topk_exact, TOPK_EXACT_SQL),
    # approximate by construction: rows-only for the driver, recall@k
    # asserted against the exact baseline in tests/test_functions.py
    "similarity_topk_ann": (q_topk_ann, None),
    "similarity_topk_ivf": (q_topk_ivf, None),
}
