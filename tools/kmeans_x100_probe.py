"""x100 scale probe for the k-means family (round-10; the r9 LSH
probe's sibling).

Two claims from functions/kmeans.py's scale story get measured points:

1. **Assignment is map-only, updates are one map-side-combinable agg
   per iteration** — so the full Lloyd build should scale LINEARLY in
   rows. Probed at x100 (200k vectors x 64 dims from the 2k sf0.1
   embeddings): ratio = t_x100 / (100 * t_x1), <=1 means linear or
   better (fixed overhead deflates it).

2. **SemDeDup's pair space is sum(n_c^2), bounded by the largest
   cluster — production picks K proportional to corpus size to cap
   it.** Probed at x10: with K FIXED the pair space grows ~x100 (each
   cluster 10x bigger), with K PROPORTIONAL (emulated by sub-grouping
   on the replica sheet, which a 10x-K clustering would separate) the
   per-cluster sizes stay at x1 levels and cost returns to ~linear.
   Both numbers are printed so the quadratic-at-fixed-K shape is a
   measured fact, not a caveat.

Replica construction: vec_id shifted by k*10^7, embedding UNCHANGED.
Identical sheets keep every coordinate inside the quantizer's |x|<=8
int64 envelope, and make the x100 Lloyd trajectory provably identical
to x1 (sums and counts both scale by the replica count, and
floor(100s/100n) = floor(s/n)), so the probe times exactly 100x the
row work on the same plan.

One-off builder tool; prints one JSON line. Not part of bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT100 = os.path.join(REPO, ".scaledata", "x100kmeans")
OUT10 = os.path.join(REPO, ".scaledata", "x10kmeans")
SHIFT = 10_000_000
_GEN_VERSION = "v1"


def _fingerprint() -> str:
    st = os.stat(os.path.join(SRC, "embeddings.parquet"))
    return f"{_GEN_VERSION}:{SRC}:{st.st_mtime_ns}:{st.st_size}"


def ensure_data() -> None:
    import duckdb

    for out, reps in ((OUT100, 100), (OUT10, 10)):
        marker = os.path.join(out, ".fingerprint")
        try:
            with open(marker) as fh:
                if fh.read() == _fingerprint():
                    continue
        except OSError:
            pass
        os.makedirs(out, exist_ok=True)
        con = duckdb.connect()
        con.execute(
            f"""
            COPY (
              SELECT e.vec_id + r.range * {SHIFT} AS vec_id,
                     e.embedding, e.label
              FROM '{SRC}/embeddings.parquet' e
              CROSS JOIN range({reps}) r
            ) TO '{out}/embeddings.parquet' (FORMAT parquet)
            """
        )
        con.close()
        with open(marker, "w") as fh:
            fh.write(_fingerprint())


def main() -> int:
    ensure_data()
    from pyspark.sql import functions as F

    from etl_sales_pandas_sqlserver_spark.functions import kmeans as km
    from etl_sales_pandas_sqlserver_spark.session import get_spark

    spark = get_spark(app_name="kmeans-x100-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def lloyd_and_profile(sf_dir: str) -> tuple[float, int]:
        """Full Lloyd build (init + 2 update aggs + final assignment)
        plus the profile agg, memo bypassed — the whole family cost."""
        t0 = time.perf_counter()
        a = km._final_assignment_build(spark, sf_dir)
        prof = (
            a.groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("n"), F.max("dist").alias("mx"))
            .collect()
        )
        return time.perf_counter() - t0, sum(int(r["n"]) for r in prof)

    # warmup (JVM + codegen for the 8 dist expressions)
    lloyd_and_profile(SRC)

    t1, n1 = min(
        (lloyd_and_profile(SRC) for _ in range(2)), key=lambda r: r[0]
    )
    t100, n100 = lloyd_and_profile(OUT100)
    assign = {
        "rows_x1": n1,
        "rows_x100": n100,
        "t_x1": round(t1, 3),
        "t_x100": round(t100, 3),
        "ratio_vs_linear": round(t100 / (100 * t1), 3),
        "superlinear": bool(t100 / (100 * t1) > 1.5),
    }

    # the REAL shipped kernel (not a copy): timing drift-proof
    pairs = km.semdedup_pair_kernel(km._SEM_THRESHOLD)
    schema = km.SEMDEDUP_PAIR_SCHEMA

    def sem(sf_dir: str, prop_k: bool) -> tuple[float, int]:
        a = km._final_assignment_build(spark, sf_dir).select(
            "vec_id", "cluster_id", "e"
        )
        if prop_k:
            # a K-proportional clustering would separate the replica
            # sheets; grouping on (cluster, sheet) emulates exactly that
            a = a.withColumn("rep", F.expr(f"vec_id div {SHIFT}"))
            keys = ["cluster_id", "rep"]
        else:
            keys = ["cluster_id"]
        t0 = time.perf_counter()
        n = a.groupBy(*keys).applyInPandas(pairs, schema=schema).count()
        return time.perf_counter() - t0, n

    sem(SRC, prop_k=False)  # warmup the applyInPandas/Arrow path
    t1s, p1 = min(
        (sem(SRC, prop_k=False) for _ in range(2)), key=lambda r: r[0]
    )
    t10_fixed, p10_fixed = sem(OUT10, prop_k=False)
    t10_prop, p10_prop = sem(OUT10, prop_k=True)
    semdedup = {
        "pairs_x1": p1,
        "t_x1": round(t1s, 3),
        "fixed_k_x10": {
            "pairs": p10_fixed,
            "t": round(t10_fixed, 3),
            "ratio_vs_linear": round(t10_fixed / (10 * t1s), 3),
        },
        "prop_k_x10": {
            "pairs": p10_prop,
            "t": round(t10_prop, 3),
            "ratio_vs_linear": round(t10_prop / (10 * t1s), 3),
            "superlinear": bool(t10_prop / (10 * t1s) > 1.5),
        },
    }
    print(
        json.dumps({"kmeans_probe": {"assign": assign, "semdedup": semdedup}}),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
