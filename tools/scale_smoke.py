"""10x scale smoke for the heavy query families (round-7, verdict #7).

The plans are DESIGNED for linear scaling (banded LSH, deletion-
neighborhood blocking, grid-cell cosine); this measures one 10x point
to prove it and to catch an accidental quadratic candidate blow-up
(band skew, neighborhood collisions) that sf0.1 alone cannot reveal.

Data: the largest driver testdata is sf0.1, so a deterministic 10x
replica set is derived from it once (content-cached under
``.scaledata/x10/``):

- ``documents``: 10 copies, ids shifted by k*10^7; every token in
  replica k>0 gets an ``_k`` suffix, so within-replica shingle
  structure (and thus the near-dup pair/cluster distribution) is
  IDENTICAL to the original while cross-replica shingles are disjoint
  -- the ideal linear-scaling workload: 10x docs => 10x pairs.
- ``embeddings``: ids shifted; replica k>0 gets +0.5*k on the first
  component (distinct cluster sheets; query batch = replica 0).
- ``customer``: keys shifted; names in replica k>0 get a 2-char
  ``kk`` suffix so cross-replica edit distance is >=2 and the
  distance<=1 fuzzy matches stay within-replica (10x names => 10x
  matches).

Each family runs at sf0.1 and at the 10x dir in ONE fresh process;
``ratio`` is t_10x / (10 * t_sf01) -- ~<=1 means linear or better
(fixed per-query overhead deflates it), >1.5 flags superlinear.
Prints one JSON line for bench.py to merge into BENCH_DETAIL.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(REPO, ".scaledata", "x10")
REPLICAS = 10
SHIFT = 10_000_000
_GEN_VERSION = "v1"  # bump to force regeneration

FAMILIES: dict[str, list[str]] = {
    "dedup_lsh": ["dedup_minhash_lsh", "dedup_clusters"],
    "dedup_simhash": ["dedup_simhash"],
    "similarity": ["similarity_topk_exact", "similarity_topk_ann"],
    "fuzzy": ["fuzzy_join_customer_names"],
    # round-7 quadratic-risk additions: exact set-similarity joins
    # (candidate blow-up if prefixes/postings skew) and the iterative
    # graph pass (round count and per-round joins)
    "jaccard_exact": [
        "dedup_jaccard_prefix_filter",
        "dedup_containment_pairs",
    ],
    "graph": ["graph_pagerank_dup"],
}


def _fingerprint() -> str:
    stats = [
        str(os.stat(os.path.join(SRC, f"{t}.parquet")).st_mtime_ns)
        for t in ("documents", "embeddings", "customer")
    ]
    return f"{_GEN_VERSION}:{SRC}:{':'.join(stats)}"


def ensure_data() -> None:
    marker = os.path.join(OUT, ".fingerprint")
    try:
        with open(marker) as fh:
            if fh.read() == _fingerprint():
                return
    except OSError:
        pass
    os.makedirs(OUT, exist_ok=True)
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE TABLE reps AS SELECT range AS k FROM range({REPLICAS})")
    con.execute(
        f"""
        COPY (
          SELECT d.doc_id + r.k * {SHIFT} AS doc_id,
                 CASE WHEN r.k = 0 THEN d.text
                      ELSE regexp_replace(d.text, '(\\S+)', '\\1_' || r.k, 'g')
                 END AS text,
                 d.lang, d.source, d.n_chars
          FROM '{SRC}/documents.parquet' d CROSS JOIN reps r
        ) TO '{OUT}/documents.parquet' (FORMAT parquet)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT e.vec_id + r.k * {SHIFT} AS vec_id,
                 CASE WHEN r.k = 0 THEN e.embedding
                      ELSE list_prepend(e.embedding[1] + 0.5 * r.k,
                                        e.embedding[2:])
                 END::FLOAT[] AS embedding,
                 e.label
          FROM '{SRC}/embeddings.parquet' e CROSS JOIN reps r
        ) TO '{OUT}/embeddings.parquet' (FORMAT parquet)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT c.c_custkey + r.k * {SHIFT} AS c_custkey,
                 CASE WHEN r.k = 0 THEN c.c_name
                      ELSE c.c_name || r.k || r.k
                 END AS c_name,
                 c.c_nationkey, c.c_acctbal, c.c_mktsegment
          FROM '{SRC}/customer.parquet' c CROSS JOIN reps r
        ) TO '{OUT}/customer.parquet' (FORMAT parquet)
        """
    )
    with open(marker, "w") as fh:
        fh.write(_fingerprint())


def main() -> int:
    ensure_data()
    from etl_sales_pandas_sqlserver_spark.session import get_spark

    spark = get_spark(app_name="scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    q = e.queries()
    # JVM/Arrow warmup outside any timed window
    q["dedup_exact"](spark, SRC).collect()

    def run_family(names: list[str], sf_dir: str, passes: int = 2) -> float:
        # min over passes; the memoized pair feed is evicted before
        # each pass so the family cost always includes the feed build.
        # x10 runs one pass (the 36s fuzzy leg would double the smoke's
        # wall for a digit of precision the ratio doesn't need).
        best = float("inf")
        for _ in range(passes):
            spark.catalog.clearCache()
            from etl_sales_pandas_sqlserver_spark import cache

            cache.release_caches()
            # evict ALL session memos (pair feed, sales frames) so
            # every pass pays the full family cost
            cache.evict_session_memos(spark)
            t0 = time.perf_counter()
            for name in names:
                q[name](spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        return best

    result: dict[str, dict] = {}
    for fam, names in FAMILIES.items():
        t1 = run_family(names, SRC)
        t10 = run_family(names, OUT, passes=1)
        ratio = round(t10 / (REPLICAS * t1), 3) if t1 > 0 else None
        result[fam] = {
            "t_sf01": round(t1, 3),
            "t_x10": round(t10, 3),
            "ratio_vs_linear": ratio,
            "superlinear": bool(ratio and ratio > 1.5),
        }
    print(json.dumps({"scale_smoke": result}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
