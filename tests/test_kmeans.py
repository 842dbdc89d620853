"""Unit semantics for the integer k-means family (functions/kmeans.py).

Cross-engine parity runs in tests/test_oracle_parity.py with the rest
of the registry; here the invariants a parity hash can't localize:
final assignments really are argmin over the final centroids, the
floor-mean centroid update is exact, tiny corpora (n < K) and
planted-cluster structure behave, and the memo is content-tagged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_sales_pandas_sqlserver_spark.functions.kmeans import (
    _DIM,
    _K,
    _Q,
    q_kmeans_assign,
    q_kmeans_profile,
    q_semantic_dedup,
)


def _write_embeddings(path, mat: np.ndarray) -> str:
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(mat)), pa.int64()),
            "embedding": pa.array(
                [list(map(float, row)) for row in mat],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([0] * len(mat), pa.int32()),
        }
    )
    pq.write_table(tbl, f"{path}/embeddings.parquet")
    return str(path)


@pytest.fixture()
def planted_sf(tmp_path):
    """K tight groups of 6 vectors around well-separated anchors,
    INTERLEAVED so vec_ids 0..K-1 each belong to a distinct group (the
    lowest-id init then seeds one centroid per group, and Lloyd must
    keep each group whole). vec_id i belongs to group i % K."""
    rng = np.random.default_rng(7)
    anchors = rng.standard_normal((_K, _DIM)).astype(np.float32) * 2.0
    rows = []
    for _m in range(6):
        for a in anchors:
            rows.append(a + rng.standard_normal(_DIM).astype(np.float32) * 0.01)
    return _write_embeddings(tmp_path, np.stack(rows))


def test_groups_land_in_one_cluster_each(spark, planted_sf):
    got = {
        r.vec_id: r.cluster_id for r in q_kmeans_assign(spark, planted_sf).collect()
    }
    assert len(got) == 6 * _K
    group_clusters = []
    for g in range(_K):
        members = {got[v] for v in got if v % _K == g}
        assert len(members) == 1, f"group {g} split across {members}"
        group_clusters.append(members.pop())
    # distinct groups end in distinct clusters
    assert len(set(group_clusters)) == _K


def test_assignment_is_argmin_over_final_centroids(spark, planted_sf):
    """Recompute the final centroids from the assignment (exact floor
    means of the quantized vectors) and check every row's (cluster,
    dist) is the true argmin -- closes the loop the oracle hash only
    checks end-to-end."""
    rows = (
        q_kmeans_assign(spark, planted_sf)
        .join(
            # re-quantize independently of the library code
            spark.read.parquet(f"{planted_sf}/embeddings.parquet").select(
                "vec_id", "embedding"
            ),
            "vec_id",
        )
        .collect()
    )
    e = {
        r.vec_id: np.floor(
            np.array(r.embedding, dtype=np.float64) * _Q
        ).astype(np.int64)
        for r in rows
    }
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(e[r.vec_id])
    cents = {
        c: np.stack(v).sum(axis=0) // len(v) for c, v in by_cluster.items()
    }
    for r in rows:
        dists = {
            c: int(((e[r.vec_id] - cent) ** 2).sum())
            for c, cent in cents.items()
        }
        best = min(dists.items(), key=lambda kv: (kv[1], kv[0]))
        # the row's cluster must be AN argmin (its dist equals the min);
        # ties break to the lowest id, which best already encodes
        assert dists[r.cluster_id] == best[1]
        assert r.dist == dists[r.cluster_id]


def test_corpus_smaller_than_k(spark, tmp_path):
    rng = np.random.default_rng(3)
    sf = _write_embeddings(tmp_path, rng.standard_normal((3, _DIM)).astype(np.float32))
    a = q_kmeans_assign(spark, sf).collect()
    assert len(a) == 3
    assert all(0 <= r.cluster_id < 3 for r in a)
    prof = q_kmeans_profile(spark, sf).collect()
    assert sum(r.n_members for r in prof) == 3
    assert q_semantic_dedup(spark, sf).count() >= 0  # no crash


def test_corpus_of_one(spark, tmp_path):
    """n=1: a single centroid means F.least has a single distance
    column — r9 advice caught that the 2-arg-minimum crashed here."""
    rng = np.random.default_rng(5)
    sf = _write_embeddings(tmp_path, rng.standard_normal((1, _DIM)).astype(np.float32))
    a = q_kmeans_assign(spark, sf).collect()
    assert len(a) == 1
    assert a[0].cluster_id == 0 and a[0].dist == 0
    prof = q_kmeans_profile(spark, sf).collect()
    assert len(prof) == 1 and prof[0].n_members == 1
    assert q_semantic_dedup(spark, sf).count() == 0


def test_out_of_envelope_coordinate_raises(spark, tmp_path):
    """|x| > 8 exceeds the int64 headroom envelope: Spark must raise
    loudly (assert_true) rather than wrap where DuckDB would raise."""
    mat = np.zeros((2, _DIM), dtype=np.float32)
    mat[1, 3] = 9.5
    sf = _write_embeddings(tmp_path, mat)
    with pytest.raises(Exception, match="headroom envelope"):
        q_kmeans_assign(spark, sf).collect()


def test_profile_consistent_with_assignment(spark, planted_sf):
    a = q_kmeans_assign(spark, planted_sf).collect()
    prof = {r.cluster_id: r for r in q_kmeans_profile(spark, planted_sf).collect()}
    from collections import defaultdict

    dists = defaultdict(list)
    for r in a:
        dists[r.cluster_id].append(r.dist)
    assert set(prof) == set(dists)
    for c, ds in dists.items():
        p = prof[c]
        assert p.n_members == len(ds)
        assert p.min_dist == min(ds) and p.max_dist == max(ds)
        assert p.avg_dist_floor == sum(ds) // len(ds)


def test_semantic_dedup_pairs_within_clusters_only(spark, planted_sf):
    got = {r.vec_id: r.cluster_id for r in q_kmeans_assign(spark, planted_sf).collect()}
    pairs = q_semantic_dedup(spark, planted_sf).collect()
    assert pairs, "planted tight groups must yield near-dup pairs"
    for p in pairs:
        assert p.a_id < p.b_id
        assert got[p.a_id] == got[p.b_id]
        assert 0.4 <= p.cosine <= 1.0 + 1e-12
    # every tight group of 6 contributes its 15 within-group pairs
    # (members are ~identical up to 0.5% noise, cosine ~ 1)
    assert len(pairs) >= 15 * _K
