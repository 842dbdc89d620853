"""Similarity search over the ``embeddings`` table (array<float>, 64-d).

Three paths, all sharing one scale shape: the query batch is tiny by
definition (top-k search serves a bounded set of probes per request),
so queries + index metadata are collected/broadcast to every executor,
and the CANDIDATE side — the 100 TB side — streams through
``mapInPandas`` in Arrow batches, each scored with one vectorized
numpy kernel and reduced to a per-partition top-k before the (tiny)
global top-k shuffle. Nothing ever shuffles the vectors.

- **exact top-k** (`similarity_topk_exact`): brute-force cosine of
  every query against every candidate. The correctness baseline;
  oracle-checked, so the kernel accumulates the dot product in strict
  index order (see `_seq_matmul`) — bitwise identical to the DuckDB
  oracle's sequential `list_reduce` fold. Map-side top-k means the
  shuffle carries k rows per query per partition, not |candidates|.
- **LSH ANN** (`similarity_topk_ann`): signed-random-projection
  signatures; a candidate is probed when its bucket is within hamming
  distance _PROBE_RADIUS of the query's bucket. Cost per query drops
  from |candidates| to the probed-bucket mass. Hyperplanes are a fixed
  seeded draw — no runtime randomness.
- **IVF ANN** (`similarity_topk_ivf`): k-means coarse quantizer
  (driver-side seeded Lloyd's on a bounded deterministic sample —
  the standard billion-scale layout trains centroids on a sample, not
  the corpus; MLlib's distributed k-means at query time would spend
  20 scheduler round-trips on a 16x64 model). Vectors are assigned to
  inverted lists by nearest centroid; each query searches its
  _IVF_NPROBE nearest lists and reranks exactly.

Approximate variants register their RESULT SETS rows-only for the
driver (the sets are approximate by construction), but their recall
floors are oracle-checked: ``similarity_ann_recall_contract`` computes
recall@k of every variant against the exact baseline inside Spark and
emits one boolean per variant for the driver's value-hash.
tests/test_functions.py additionally asserts the floors unit-side.

Recall caveat, measured honestly: the synthetic test embeddings are
near-uniform on the sphere (max pairwise cosine ~0.5), which is the
information-theoretic worst case for space-partitioning ANN — both
variants land ~0.5-0.65 recall@5 while probing 25-50% of the corpus.
On real clustered embedding corpora the same layouts probe a few
percent for >0.9 recall; the tests pin the measured floors so a
regression is visible without overclaiming.
"""

from __future__ import annotations

import os
import tempfile
from typing import Callable, Iterator

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.testdata import load_table

SparkQuery = Callable[[SparkSession, str], DataFrame]

_N_QUERIES = 8  # vec_id < 8 act as the query set
_TOP_K = 5
_N_PLANES = 5  # 32 LSH buckets
_PROBE_RADIUS = 2  # probe buckets within this hamming distance
_DIM = 64
_IVF_K = 16  # k-means lists
_IVF_NPROBE = 6  # lists searched per query (6/16: recall ~0.7 on the
# near-uniform synthetic corpus while still skipping 5/8 of the data;
# raised from 4 in round 5 to give the tightened 0.45 recall floor a
# real margin)
_IVF_TRAIN_SAMPLE = 16384  # quantizer training sample cap (driver-side)

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

_PAIR_SCHEMA = "query_id long, neighbor_id long, cosine double"


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))


def _seq_matmul(m: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(n, d) x (k, d) -> (n, k) dot products accumulated in strict
    index order: acc = (acc + m[:,j]*q[:,j]) for j = 0..d-1. Per-element
    this is the exact double-add sequence of the DuckDB oracle's
    ``list_reduce`` fold (numpy elementwise ops don't fuse), so scalar
    results are bitwise identical across engines while each step is a
    vectorized O(n*k) kernel instead of an interpreted lambda."""
    acc = np.zeros((m.shape[0], q.shape[0]), dtype=np.float64)
    for j in range(m.shape[1]):
        acc = acc + m[:, j : j + 1] * q[None, :, j]
    return acc


def _seq_norms(m: np.ndarray) -> np.ndarray:
    """sqrt of the sequential-fold self-dot, matching sqrt(_DOT_DUCK)."""
    acc = np.zeros(m.shape[0], dtype=np.float64)
    for j in range(m.shape[1]):
        acc = acc + m[:, j] * m[:, j]
    return np.sqrt(acc)


def _collect_queries(vecs: DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """The query batch (tiny by definition) to the driver: ids + matrix.

    An empty corpus returns a (0, _DIM) matrix -- NOT the 1-D array
    np.array([]) would give -- so norms (axis=1), bucket assignment
    (matmul) and the per-query loops all degrade to no-ops and every
    top-k variant returns an empty result instead of crashing."""
    rows = vecs.filter(F.col("vec_id") < _N_QUERIES).orderBy("vec_id").collect()
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    if not rows:
        return ids, np.empty((0, _DIM), dtype=np.float64)
    mat = np.array([r.v for r in rows], dtype=np.float64)
    return ids, mat


def _local_topk(
    ids: np.ndarray, cos: np.ndarray, qid: int, k: int
) -> "list[tuple[int, int, float]]":
    """Partition-local top-k by (cosine desc, neighbor_id asc)."""
    if len(ids) == 0:
        return []
    order = np.lexsort((ids, -cos))[:k]
    return [(qid, int(ids[i]), float(cos[i])) for i in order]


def _global_topk(scored: DataFrame) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .orderBy("query_id", "rank")
    )


def q_topk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force top-k, memoized per (session, sf_dir).

    The result is n_queries x k rows — broadcast-size by definition —
    but producing it is the family's most expensive scan (full corpus x
    query batch), and THREE same-session consumers re-derive it:
    the registered ``similarity_topk_exact`` query, ``q_knn_label``,
    and ``q_ann_recall_contract``'s baseline. The session checkpoint
    memo (round-8; same mechanism as the minhash pair feed) runs the
    scan once per session and hands every consumer the same severed
    40-row frame."""
    from ..cache import session_checkpoint_memo
    from ..source_tags import sf_content_tag

    # the content tag makes a same-session rewrite of the vectors
    # parquet MISS the memo automatically (round-8 advice) -- no
    # caller-side evict_session_memos discipline required
    return session_checkpoint_memo(
        spark,
        ("similarity_exact_topk", sf_dir, sf_content_tag(sf_dir, "embeddings")),
        lambda: _topk_exact_build(spark, sf_dir),
    )


def _topk_exact_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    vecs = _vectors(spark, sf_dir)
    q_ids, q_mat = _collect_queries(vecs)
    q_nrm = _seq_norms(q_mat)
    bc = spark.sparkContext.broadcast((q_ids, q_mat, q_nrm))

    def scan(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        qids, qmat, qnrm = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cand_ids = pdf["vec_id"].to_numpy()
            m = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            nrm = _seq_norms(m)
            # oracle spells cosine = dot / (q.nrm * c.nrm); reproduce the
            # op order exactly (multiply norms first, then divide)
            cos = _seq_matmul(m, qmat) / (qnrm[None, :] * nrm[:, None])
            out: list[tuple[int, int, float]] = []
            for qi in range(len(qids)):
                if qnrm[qi] == 0.0:
                    continue  # zero-norm query: cosine undefined, skip
                keep = (cand_ids != qids[qi]) & (nrm > 0.0)
                out.extend(
                    _local_topk(cand_ids[keep], cos[keep, qi], int(qids[qi]), _TOP_K)
                )
            yield pd.DataFrame(out, columns=["query_id", "neighbor_id", "cosine"])

    scored = vecs.mapInPandas(scan, schema=_PAIR_SCHEMA)
    return _global_topk(scored)


# ---------------------------------------------------------------------------
# LSH ANN: signed random projections -> hamming-radius probe -> exact rerank.
# ---------------------------------------------------------------------------


def _hyperplanes() -> np.ndarray:
    """Fixed seeded hyperplane draw; broadcast, no runtime RNG."""
    rng = np.random.default_rng(42)
    return rng.standard_normal((_N_PLANES, _DIM))


def _bucket_of(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """LSH bucket id per row: sign bit per hyperplane packed into an int."""
    signs = (mat @ planes.T) >= 0.0
    return (signs.astype(np.int64) << np.arange(_N_PLANES)[None, :]).sum(axis=1)


#: popcount over the 2^_N_PLANES possible xor values (buckets are 5-bit)
_POPCOUNT = np.array([bin(i).count("1") for i in range(1 << _N_PLANES)], dtype=np.int64)


def _memoized_topk(variant: str, build: SparkQuery) -> SparkQuery:
    """Session-memoize a deterministic top-k variant's ranked frame.

    Each approximate variant is consumed twice per sweep — once by its
    registered membership contract, once by the recall contract's
    union — and each consumption repeats the variant's corpus scan
    (plus, for IVF, the quantizer-training sample collect). The result
    is n_queries x k rows; the memo (round-8, same mechanism as the
    exact baseline above) checkpoints it once per (session, sf_dir).
    Determinism holds by construction: seeded hyperplanes / seeded
    Lloyd's, no runtime RNG anywhere."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from ..cache import session_checkpoint_memo
        from ..source_tags import sf_content_tag

        return session_checkpoint_memo(
            spark,
            (
                "similarity_topk",
                variant,
                sf_dir,
                sf_content_tag(sf_dir, "embeddings"),
            ),
            lambda: build(spark, sf_dir),
        )

    fn.__name__ = f"q_topk_{variant}"
    fn.__qualname__ = fn.__name__
    return fn


def _topk_ann_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    vecs = _vectors(spark, sf_dir)
    q_ids, q_mat = _collect_queries(vecs)
    q_nrm = _seq_norms(q_mat)
    planes = _hyperplanes()
    q_buckets = _bucket_of(q_mat, planes)
    bc = spark.sparkContext.broadcast((q_ids, q_mat, q_nrm, q_buckets, planes))

    def scan(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        qids, qmat, qnrm, qbuck, pl = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cand_ids = pdf["vec_id"].to_numpy()
            m = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            buckets = _bucket_of(m, pl)
            nrm = _seq_norms(m)
            out: list[tuple[int, int, float]] = []
            for qi in range(len(qids)):
                if qnrm[qi] == 0.0:
                    continue  # zero-norm query: cosine undefined, skip
                # probe = all candidates within hamming radius of the
                # query's bucket (equivalent to enumerating the probe
                # bucket set, without materializing it)
                ham = _POPCOUNT[np.bitwise_xor(buckets, qbuck[qi])]
                keep = (ham <= _PROBE_RADIUS) & (cand_ids != qids[qi]) & (nrm > 0.0)
                if not keep.any():
                    continue
                cos = _seq_matmul(m[keep], qmat[qi : qi + 1])[:, 0] / (
                    qnrm[qi] * nrm[keep]
                )
                out.extend(_local_topk(cand_ids[keep], cos, int(qids[qi]), _TOP_K))
            yield pd.DataFrame(out, columns=["query_id", "neighbor_id", "cosine"])

    scored = vecs.mapInPandas(scan, schema=_PAIR_SCHEMA)
    return _global_topk(scored)


q_topk_ann = _memoized_topk("ann", _topk_ann_build)


# ---------------------------------------------------------------------------
# IVF ANN: sample-trained k-means quantizer -> inverted lists -> probe.
# ---------------------------------------------------------------------------


def _kmeans_fit(x: np.ndarray, k: int, seed: int, iters: int = 20) -> np.ndarray:
    """Seeded Lloyd's with k-means++ init on the (unit-normalized)
    training sample. Deterministic: fixed rng, argmin ties -> lowest
    index. Returns (k, d) centroids."""
    rng = np.random.default_rng(seed)
    n = x.shape[0]
    # k-means++ seeding
    cents = [x[rng.integers(n)]]
    for _ in range(1, k):
        d2 = np.min(
            np.stack([((x - c) ** 2).sum(axis=1) for c in cents]), axis=0
        )
        probs = d2 / d2.sum() if d2.sum() > 0 else np.full(n, 1.0 / n)
        cents.append(x[rng.choice(n, p=probs)])
    c = np.stack(cents)
    for _ in range(iters):
        d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(k):
            members = x[assign == j]
            if len(members):
                c[j] = members.mean(axis=0)
    return c


def _nearest_lists(u: np.ndarray, cents: np.ndarray, n: int) -> np.ndarray:
    """Indices of the n nearest centroids (euclidean) per row: (rows, n)."""
    d2 = ((u[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return np.argsort(d2, axis=1, kind="stable")[:, :n]


def _topk_ivf_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    vecs = _vectors(spark, sf_dir)
    # bounded UNBIASED training sample for the coarse quantizer: a
    # hash-based filter (keep rows with xxhash64(vec_id) % D == 0) is
    # deterministic across runs AND uncorrelated with id order -- an
    # id-prefix (orderBy + limit) would bias the centroids whenever ids
    # correlate with content, and the full-corpus orderBy is itself a
    # scale hazard. When the cap binds, the orderBy over the (small,
    # already-filtered) sample keyed by a SECOND hash keeps the kept
    # subset deterministic and content-uncorrelated -- a bare limit
    # would take whichever partitions answered first. The quantizer
    # quality depends on sample coverage, not corpus size.
    sample = (
        vecs.filter(F.pmod(F.xxhash64("vec_id"), F.lit(4)) == 0)
        .orderBy(F.xxhash64(F.col("vec_id") + 1))
        .limit(_IVF_TRAIN_SAMPLE)
        .collect()
    )
    if not sample:
        # empty corpus: nothing to train on, nothing to search
        return _global_topk(spark.createDataFrame([], _PAIR_SCHEMA))
    x = np.array([r.v for r in sample], dtype=np.float64)
    xn = np.linalg.norm(x, axis=1, keepdims=True)
    x = x[xn[:, 0] > 0] / xn[xn[:, 0] > 0]
    cents = _kmeans_fit(x, _IVF_K, seed=42)

    q_ids, q_mat = _collect_queries(vecs)
    q_norms = np.linalg.norm(q_mat, axis=1, keepdims=True)
    q_unit = q_mat / np.where(q_norms == 0.0, 1.0, q_norms)
    probe_lists = _nearest_lists(q_unit, cents, _IVF_NPROBE)
    q_seqnrm = _seq_norms(q_mat)
    bc = spark.sparkContext.broadcast(
        (q_ids, q_mat, q_seqnrm, q_norms[:, 0], probe_lists, cents)
    )

    def scan(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        qids, qmat, qseqnrm, qnrm, probes, c = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cand_ids = pdf["vec_id"].to_numpy()
            m = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            nrm = np.linalg.norm(m, axis=1, keepdims=True)
            u = m / np.where(nrm == 0.0, 1.0, nrm)
            assign = _nearest_lists(u, c, 1)[:, 0]
            out: list[tuple[int, int, float]] = []
            for qi in range(len(qids)):
                if qnrm[qi] == 0.0:
                    continue  # zero-norm query: cosine undefined, skip
                keep = (
                    np.isin(assign, probes[qi])
                    & (cand_ids != qids[qi])
                    & (nrm[:, 0] > 0.0)
                )
                if not keep.any():
                    continue
                # probe selection is the IVF part; the reported score
                # is spelled through the same sequential-fold kernel as
                # the exact scan, so the membership contract can check
                # it bitwise (round 7 -- a BLAS unit-vector dot differs
                # in the last ulps)
                mk = m[keep]
                cos = _seq_matmul(mk, qmat[qi : qi + 1])[:, 0] / (
                    qseqnrm[qi] * _seq_norms(mk)
                )
                out.extend(_local_topk(cand_ids[keep], cos, int(qids[qi]), _TOP_K))
            yield pd.DataFrame(out, columns=["query_id", "neighbor_id", "cosine"])

    scored = vecs.mapInPandas(scan, schema=_PAIR_SCHEMA)
    return _global_topk(scored)


q_topk_ivf = _memoized_topk("ivf", _topk_ivf_build)


# ---------------------------------------------------------------------------
# Indexed LSH ANN: the *serving* layout. q_topk_ann probes by masking a
# full-corpus scan (IO = O(corpus) per query batch); this variant
# materializes the corpus ONCE as bucket-partitioned parquet and lets
# partition pruning skip every non-probed bucket's files at plan time.
# Same hyperplanes, radius and rerank as q_topk_ann, so results are
# identical -- asserted in tests -- while repeated query batches read
# only |probe| / 2^_N_PLANES of the corpus. At 100 TB the index build
# is one shuffle-free pass (bucket is computed per-row), and serving
# IO is proportional to the probed buckets, the property that makes
# repeated ANN serving viable at all.
# ---------------------------------------------------------------------------

_ANN_INDEX_ROOT = os.path.join(tempfile.gettempdir(), "spark_graft_ann_index")


def build_ann_index(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the bucket-partitioned vector index (idempotent per
    SOURCE CONTENT; rebuild = delete the directory).

    The cache key fingerprints the source file's absolute path, mtime
    and size -- not just the directory basename -- so regenerating the
    embeddings table, or two corpora that share a basename, can never
    serve a stale index (the indexed variant's contract is result
    identity with the scan-based ANN)."""
    import hashlib

    src = os.path.join(os.path.normpath(sf_dir), "embeddings.parquet")
    st = os.stat(src)
    tag = hashlib.md5(
        f"{os.path.abspath(src)}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:16]
    path = os.path.join(_ANN_INDEX_ROOT, tag)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        import pandas as pd  # noqa: F401

        vecs = _vectors(spark, sf_dir)
        bcp = spark.sparkContext.broadcast(_hyperplanes())

        def assign(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
            pl = bcp.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                m = np.stack(pdf["v"].to_numpy()).astype(np.float64)
                yield pdf.assign(bucket=_bucket_of(m, pl))

        bucketed = vecs.mapInPandas(
            assign, schema="vec_id long, v array<double>, bucket long"
        )
        # co-locate each bucket before writing: one task -> one file per
        # bucket directory, instead of (shuffle.partitions x buckets)
        # fragment files whose per-file commit overhead dominates the
        # build (and whose footer reads tax every probe)
        bucketed.repartition("bucket").write.mode("overwrite").partitionBy(
            "bucket"
        ).parquet(path)
    return path


def _topk_ann_indexed_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    vecs = _vectors(spark, sf_dir)
    q_ids, q_mat = _collect_queries(vecs)
    q_nrm = _seq_norms(q_mat)
    planes = _hyperplanes()
    q_buckets = _bucket_of(q_mat, planes)

    # the union probe set over all queries -> a partition-pruning filter
    all_b = np.arange(1 << _N_PLANES, dtype=np.int64)
    probe = sorted(
        {
            int(b)
            for qb in q_buckets
            for b in all_b[_POPCOUNT[np.bitwise_xor(all_b, qb)] <= _PROBE_RADIUS]
        }
    )
    index_path = build_ann_index(spark, sf_dir)
    # explicit schema: an empty corpus writes an index with no data
    # files, where schema inference has nothing to read
    pruned = (
        spark.read.schema("vec_id long, v array<double>, bucket long")
        .parquet(index_path)
        .filter(F.col("bucket").isin(probe))
    )

    bc = spark.sparkContext.broadcast((q_ids, q_mat, q_nrm, q_buckets))

    def scan(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        qids, qmat, qnrm, qbuck = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cand_ids = pdf["vec_id"].to_numpy()
            buckets = pdf["bucket"].to_numpy()
            m = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            nrm = _seq_norms(m)
            out: list[tuple[int, int, float]] = []
            for qi in range(len(qids)):
                if qnrm[qi] == 0.0:
                    continue
                # per-query radius *within* the union probe set (files
                # outside it were never read)
                ham = _POPCOUNT[np.bitwise_xor(buckets, qbuck[qi])]
                keep = (
                    (ham <= _PROBE_RADIUS)
                    & (cand_ids != qids[qi])
                    & (nrm > 0.0)
                )
                if not keep.any():
                    continue
                cos = _seq_matmul(m[keep], qmat[qi : qi + 1])[:, 0] / (
                    qnrm[qi] * nrm[keep]
                )
                out.extend(_local_topk(cand_ids[keep], cos, int(qids[qi]), _TOP_K))
            yield pd.DataFrame(out, columns=["query_id", "neighbor_id", "cosine"])

    scored = pruned.mapInPandas(scan, schema=_PAIR_SCHEMA)
    return _global_topk(scored)


q_topk_ann_indexed = _memoized_topk("ann_indexed", _topk_ann_indexed_build)


# ---------------------------------------------------------------------------
# kNN majority-label classification: the labeled-neighbors use of
# similarity search (label propagation / weak supervision). Reuses the
# exact top-k (bitwise cross-engine parity), joins the k neighbor ids
# to the label column, and takes the per-query majority with a
# deterministic tie-break (votes desc, label asc). The join input is k
# rows per query -- tiny -- so at scale this costs exactly one extra
# broadcast-sized join after the top-k reduction.
# ---------------------------------------------------------------------------

KNN_LABEL_SQL = f"""
  WITH topk AS ({TOPK_EXACT_SQL}),
  votes AS (
    SELECT t.query_id, e.label, COUNT(*) AS votes
    FROM topk t JOIN embeddings e ON e.vec_id = t.neighbor_id
    GROUP BY 1, 2
  )
  SELECT query_id, label AS pred_label, votes
  FROM (
    SELECT query_id, label, votes,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY votes DESC, label ASC) AS rn
    FROM votes)
  WHERE rn = 1
  ORDER BY query_id
"""


def q_knn_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    topk = q_topk_exact(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    votes = (
        topk.join(emb, topk.neighbor_id == emb.vec_id)
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("label").asc()
    )
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("label").alias("pred_label"), "votes")
    )


# ---------------------------------------------------------------------------
# ANN recall contract: the approximate variants can't be hash-compared
# against an oracle (the result set is approximate by construction),
# but their RECALL floor can be — compute recall@k of every variant
# against the exact baseline inside Spark and emit one boolean per
# variant; the oracle is three literal TRUE rows, and the driver's
# value-hash proves the floors held. Floors sit under the measured
# minima across sf0.001/0.01/0.1 (lsh 0.625-0.825; ivf ~0.7 at
# nprobe=6) with enough margin not to flake — near-uniform synthetic
# vectors are ANN's worst case, see the module docstring. Tightened in
# round 5 (lsh 0.45→0.55, ivf 0.35→0.45) so the contract actually
# binds.
# ---------------------------------------------------------------------------

_RECALL_FLOORS = {"ivf": 0.45, "lsh": 0.55, "lsh_indexed": 0.55}

ANN_RECALL_SQL = """
  SELECT 'ivf' AS variant, TRUE AS recall_floor_ok
  UNION ALL SELECT 'lsh', TRUE
  UNION ALL SELECT 'lsh_indexed', TRUE
  ORDER BY variant
"""


def q_ann_recall_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the exact pair set (n_queries * k rows — broadcast-size by
    # definition) feeds both the hit join and the in-plan denominator;
    # q_topk_exact is session-memoized (eager checkpoint), so both
    # consumers read the same severed 40-row frame and the full-corpus
    # scan runs at most once per session
    exact = q_topk_exact(spark, sf_dir).select("query_id", "neighbor_id")
    variants = [
        ("ivf", q_topk_ivf),
        ("lsh", q_topk_ann),
        ("lsh_indexed", q_topk_ann_indexed),
    ]
    tagged = None
    for name, fn in variants:
        part = fn(spark, sf_dir).select(
            F.lit(name).alias("variant"), "query_id", "neighbor_id"
        )
        tagged = part if tagged is None else tagged.unionByName(part)
    # recall = |approx ∩ exact| / |exact| per variant
    hits = (
        tagged.join(F.broadcast(exact), ["query_id", "neighbor_id"])
        .groupBy("variant")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    n_exact_df = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    # left-join from a static variant list so a zero-hit (or
    # empty-corpus) variant still emits its row instead of vanishing
    # from the groupBy; an empty corpus has no recall to miss, so it
    # passes vacuously
    base = spark.createDataFrame(
        [(n,) for n in sorted(_RECALL_FLOORS)], "variant string"
    )
    floor = F.when(
        F.col("variant") == "ivf", F.lit(_RECALL_FLOORS["ivf"])
    ).otherwise(F.lit(_RECALL_FLOORS["lsh"]))
    recall = F.coalesce(F.col("n_hits"), F.lit(0)).cast("double") / F.greatest(
        F.col("n_exact"), F.lit(1)
    )
    return (
        base.join(hits, "variant", "left")
        .crossJoin(F.broadcast(n_exact_df))  # single-row denominator
        .select(
            "variant",
            ((recall >= floor) | (F.col("n_exact") == 0)).alias(
                "recall_floor_ok"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Per-query membership contract (round-7, verdict #6): the approximate
# result SETS can't be hash-compared (which neighbors LSH/IVF surface
# is not SQL-expressible), but every structural claim each hit makes IS
# verifiable in-plan, per query:
#   k_full_ok      exactly _TOP_K hits came back (measured invariant at
#                  every test SF; a probe-radius regression that starves
#                  a query of candidates flips it),
#   distinct_ok    no neighbor repeats,
#   no_self_ok     the query vector never matches itself,
#   ids_valid_ok   every neighbor_id exists in the corpus,
#   rank_ok        ranks are exactly 1..n with cosine non-increasing,
#   cosine_exact_ok  each reported cosine bitwise-equals a recomputation
#                  from the stored vectors via the same sequential-fold
#                  kernel the exact oracle uses (no fabricated scores).
# The oracle is one literal-TRUE row per query id, derived from the
# data (vec_id < _N_QUERIES) -- the driver's value-hash then proves all
# 8x6 booleans held. Variant-level RECALL floors stay the job of
# q_ann_recall_contract. This replaces the rows-only registration the
# three variants carried through round 6.
# ---------------------------------------------------------------------------

ANN_MEMBERSHIP_SQL = f"""
  SELECT vec_id AS query_id, TRUE AS k_full_ok, TRUE AS distinct_ok,
         TRUE AS no_self_ok, TRUE AS ids_valid_ok, TRUE AS rank_ok,
         TRUE AS cosine_exact_ok
  FROM embeddings WHERE vec_id < {_N_QUERIES}
  ORDER BY query_id
"""


def _membership_contract(
    fn: SparkQuery, spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Run ``fn`` and reduce its top-k frame to the per-query membership
    contract (k_full/distinct/no_self/ids_valid/rank/cosine-exact
    booleans). Called through NAMED module-level wrappers below — the
    rotation fingerprinter resolves plain defs only, and the old
    closure-factory pattern left the three contract queries permanently
    unresolvable (no manifest entry, 3 window slots burned every
    round, r11 fix)."""
    import pandas as pd

    res = fn(spark, sf_dir)
    vecs = _vectors(spark, sf_dir)
    q_ids, q_mat = _collect_queries(vecs)
    q_nrm = _seq_norms(q_mat)
    bc = spark.sparkContext.broadcast((q_ids, q_mat, q_nrm))

    # ids_valid + cosine recompute ride one join to the corpus
    # vectors; a missing neighbor_id survives as v IS NULL.
    joined = res.join(
        vecs.select(
            F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nv")
        ),
        "neighbor_id",
        "left",
    ).select("query_id", "neighbor_id", "cosine", "rank", "nv")

    def verify(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        qids, qmat, qnrm = bc.value
        pos = {int(q): i for i, q in enumerate(qids)}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ok = np.zeros(len(pdf), dtype=bool)
            valid = pdf["nv"].notna().to_numpy()
            if valid.any():
                sub = pdf[valid]
                m = np.stack(sub["nv"].to_numpy()).astype(np.float64)
                nrm = _seq_norms(m)
                cos = _seq_matmul(m, qmat) / (qnrm[None, :] * nrm[:, None])
                qcol = np.array(
                    [pos[int(q)] for q in sub["query_id"]], dtype=np.int64
                )
                recomputed = cos[np.arange(len(sub)), qcol]
                ok[valid] = recomputed == sub["cosine"].to_numpy()
            out = pdf[["query_id", "neighbor_id", "rank", "cosine"]].copy()
            out["id_valid"] = valid
            out["cos_ok"] = ok
            yield out

    checked = joined.mapInPandas(
        verify,
        schema=(
            "query_id long, neighbor_id long, rank int, cosine double,"
            " id_valid boolean, cos_ok boolean"
        ),
    )
    w = Window.partitionBy("query_id").orderBy("rank")
    flagged = checked.withColumn(
        "order_ok",
        F.coalesce(
            F.lag("cosine").over(w) >= F.col("cosine"), F.lit(True)
        ),
    )
    return (
        flagged.groupBy("query_id")
        .agg(
            (F.count(F.lit(1)) == _TOP_K).alias("k_full_ok"),
            (
                F.count_distinct(F.col("neighbor_id"))
                == F.count(F.lit(1))
            ).alias("distinct_ok"),
            F.bool_and(F.col("neighbor_id") != F.col("query_id")).alias(
                "no_self_ok"
            ),
            F.bool_and("id_valid").alias("ids_valid_ok"),
            (
                (F.min("rank") == 1)
                & (F.max("rank") == F.count(F.lit(1)))
                & (
                    F.count_distinct(F.col("rank"))
                    == F.count(F.lit(1))
                )
                & F.bool_and("order_ok")
            ).alias("rank_ok"),
            F.bool_and("cos_ok").alias("cosine_exact_ok"),
        )
    )

def q_topk_ann_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _membership_contract(q_topk_ann, spark, sf_dir)


def q_topk_ivf_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _membership_contract(q_topk_ivf, spark, sf_dir)


def q_topk_ann_indexed_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _membership_contract(q_topk_ann_indexed, spark, sf_dir)


QUERIES_EXPORT: dict[str, tuple[SparkQuery, str | None]] = {
    "similarity_topk_exact": (q_topk_exact, TOPK_EXACT_SQL),
    "embedding_knn_label": (q_knn_label, KNN_LABEL_SQL),
    # approximate by construction: the registered entries emit the
    # per-query membership contract over the variant's result set
    # (hash-checked); the raw top-k frames stay available as
    # q_topk_ann / q_topk_ivf / q_topk_ann_indexed for API users and
    # the equality/recall tests
    "similarity_topk_ann": (q_topk_ann_contract, ANN_MEMBERSHIP_SQL),
    "similarity_topk_ivf": (q_topk_ivf_contract, ANN_MEMBERSHIP_SQL),
    # identical raw results to similarity_topk_ann (asserted in tests);
    # reads a bucket-partitioned index with partition pruning
    "similarity_topk_ann_indexed": (
        q_topk_ann_indexed_contract,
        ANN_MEMBERSHIP_SQL,
    ),
    "similarity_ann_recall_contract": (q_ann_recall_contract, ANN_RECALL_SQL),
}
