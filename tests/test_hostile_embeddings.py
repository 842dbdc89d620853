"""Hostile embedding vectors: zero-norm, NULL elements, true NaN.

The documents table has a hostile-input suite (test_hostile_docs);
this is the embeddings twin, built after an r13 audit found the
behavior is THREE-TIERED:

1. **Zero-norm and NULL-element vectors**: every oracle-backed
   embedding consumer except the k-means trio stays Spark==DuckDB
   green — a NULL element propagates to a NULL dot/score and both
   engines drop the row the same way; a zero vector's undefined
   cosine is skipped query-side and never enters a top-k. Pinned here
   so a kernel rewrite cannot regress it silently.

2. **The k-means family crashes CRYPTICALLY on a NULL element** (a
   driver-side ``int(None)``, not the envelope guard): the quantizer's
   ``assert_true(abs(x) <= 8)`` was designed to reject out-of-envelope
   input loudly (r9 advice), but ``abs(NULL) <= 8`` is NULL and
   assert_true only raises on FALSE, so NULL elements slip through to
   a NULL cluster_id. Deliberately NOT fixed in r13: the fix stales
   the r10-vintage trio's fingerprints, and r14's window drains the
   r10 cohort anyway — respelling the guard predicate to
   ``x IS NOT NULL AND abs(x) <= 8`` is a zero-slot r14 task (see
   NOTES_r13.md). The current crash is pinned so the fix flips this
   test on purpose.

3. **True NaN is a KNOWN, DOCUMENTED cross-engine divergence** (the
   U+000B pattern from functions/tokcount.py): numpy comparisons with
   NaN are false (NaN cosines never reach a threshold or top-k), while
   DuckDB's total order ranks NaN above +inf, so ``cos >= threshold``
   PASSES for NaN pairs and the oracle emits extra rows; ANSI Spark
   additionally refuses NaN->int casts where DuckDB raises its own
   error. The driver testdata carries no NaN/NULL embedding elements
   at any scale (tripwired below, like the no-\\x0B tripwire), so the
   divergence is latent-only and pinned loudly rather than papered
   over.
"""

from __future__ import annotations

import math
import shutil

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents",
]

#: oracle-backed embedding consumers proven robust to NULL-element and
#: zero-norm vectors (tier 1)
_ROBUST = [
    "similarity_topk_exact",
    "similarity_topk_ivf",
    "dedup_embedding_cosine",
    "quantize_embeddings_int8",
    "embedding_knn_label",
    "embedding_centroid_by_group",
    "dedup_decontaminate_semantic",
]


@pytest.fixture(autouse=True)
def _driver_ansi(spark):
    """Run this module under DRIVER conditions (Spark 4 default = ANSI
    ON): the engine's tuned test session sets ansi=false, and hostile-
    input behavior can be ANSI-sensitive. Restore after."""
    before = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    yield
    spark.conf.set("spark.sql.ansi.enabled", before)


def _poisoned_dir(sf_small, tmp_path_factory, poison: str) -> str:
    tbl = pq.read_table(f"{sf_small}/embeddings.parquet")
    dim = len(tbl.column("embedding")[0])
    embs = [[v.as_py() for v in row] for row in tbl.column("embedding")]
    embs[-1] = [0.0] * dim  # zero-norm: cosine undefined
    if poison == "null":
        embs[-2] = [None] + [0.1] * (dim - 1)
    else:
        embs[-2] = [float("nan")] + [0.1] * (dim - 1)
    out = pa.table(
        {
            "vec_id": tbl.column("vec_id"),
            "embedding": pa.array(embs, pa.list_(pa.float32())),
            "label": tbl.column("label"),
        }
    )
    d = tmp_path_factory.mktemp(f"hostile_emb_{poison}")
    pq.write_table(out, str(d / "embeddings.parquet"))
    for t in _TABLES:
        shutil.copy(f"{sf_small}/{t}.parquet", str(d / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def null_sf(sf_small, tmp_path_factory) -> str:
    return _poisoned_dir(sf_small, tmp_path_factory, "null")


@pytest.fixture(scope="module")
def nan_sf(sf_small, tmp_path_factory) -> str:
    return _poisoned_dir(sf_small, tmp_path_factory, "nan")


def _oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in _TABLES + ["embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.execute(sql).df()


def _canon(df):
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    return sorted(
        [
            tuple(
                None if (isinstance(v, float) and math.isnan(v)) else v
                for v in r
            )
            for r in df.itertuples(index=False)
        ],
        key=str,
    )


@pytest.mark.parametrize("name", _ROBUST)
def test_null_and_zero_vectors_stay_oracle_green(spark, null_sf, name):
    import __spark_entry__ as e

    sdf = e.queries()[name](spark, null_sf).toPandas()
    odf = _oracle(e.oracle_sql()[name], null_sf)
    assert len(sdf) == len(odf), (name, len(sdf), len(odf))
    assert _canon(sdf) == _canon(odf), name


def test_kmeans_null_element_raises_envelope_error(spark, null_sf):
    """Tier 2 pin, flipped r14 (the NOTES_r13 plan): a NULL embedding
    element now trips the quantizer's envelope assert_true LOUDLY —
    the guard predicate is ``x IS NOT NULL AND abs(x) <= 8`` so NULL
    no longer slips through assert_true's raise-only-on-FALSE
    semantics into a NULL cluster_id / driver-side int(None)."""
    import __spark_entry__ as e

    with pytest.raises(Exception) as exc:
        e.queries()["cluster_kmeans_assign"](spark, null_sf).collect()
    assert "headroom envelope" in str(exc.value)


def test_nan_is_the_known_embedding_divergence(spark, nan_sf):
    """Tier 3 pin (the \\x0B pattern): on a NaN-poisoned corpus the
    DuckDB oracle emits MORE near-dup pairs than the engine — NaN
    passes DuckDB's total-order threshold test and never passes
    numpy's. If this ever starts agreeing, the documented divergence
    note in this module is stale."""
    import __spark_entry__ as e

    sdf = e.queries()["dedup_embedding_cosine"](spark, nan_sf).toPandas()
    odf = _oracle(e.oracle_sql()["dedup_embedding_cosine"], nan_sf)
    assert len(odf) > len(sdf)


def test_testdata_embeddings_are_finite_and_complete():
    """Tripwire (the no-\\x0B pattern): the NaN/NULL divergences above
    stay latent ONLY while the driver testdata is clean. Fires before
    any oracle mismatch could confuse a round."""
    import glob
    import os

    con = duckdb.connect()
    dirs = sorted(glob.glob("/root/testdata/sf*"))
    assert dirs, "driver testdata missing"
    for d in dirs:
        p = os.path.join(d, "embeddings.parquet")
        bad = con.execute(
            f"""
            SELECT count(*) FROM '{p}',
                   unnest(embedding) AS u(x)
            WHERE x IS NULL OR isnan(x) OR isinf(x)
            """
        ).fetchone()[0]
        assert bad == 0, f"{p}: {bad} non-finite embedding elements"
