"""x100 scale probe for the exact-Jaccard join family (round-11; the
r9 LSH and r10 k-means probes' sibling).

Round 10's driver smoke flagged `jaccard_exact` superlinear at x10
(2.90x); the hardened min-of-2 smoke re-measured it at 0.79x — the
flag was the one-cold-pass protocol. This probe settles the family's
scaling with a x100 point on the same replica-sheet construction:

- `documents` replicated 100x, ids shifted by k*10^7, every token in
  replica k>0 suffixed `_k` — within-replica shingle structure (and
  thus the candidate/emitted pair distribution) is IDENTICAL to the
  original while cross-replica shingles are disjoint, so both the
  PPJoin prefix-filter candidate space and the emitted pair set scale
  by EXACTLY the replica count. Linear is the correct budget, and the
  emitted row counts printed alongside prove the work scaled 100.0x.

- measured: the registered `dedup_jaccard_prefix_filter` +
  `dedup_containment_pairs` queries (the same callables the driver
  runs), session memos evicted before every pass so each pass pays
  the full family cost. x1 leg min-of-2 warm; x100 leg is one pass
  with its row counts recorded (a second 6-minute pass buys one digit
  of a ratio the row counts already pin).

ratio = t_x100 / (100 * t_x1); <=1 linear-or-better (fixed overhead
deflates it). One-off builder tool; prints one JSON line. Not part of
bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(REPO, ".scaledata", "x100jaccard")
REPLICAS = 100
SHIFT = 10_000_000
_GEN_VERSION = "v1"

FAMILY = ["dedup_jaccard_prefix_filter", "dedup_containment_pairs"]


def _fingerprint() -> str:
    st = os.stat(os.path.join(SRC, "documents.parquet"))
    return f"{_GEN_VERSION}:{SRC}:{st.st_mtime_ns}:{st.st_size}"


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
    con.execute(
        f"""
        COPY (
          SELECT d.doc_id + r.range * {SHIFT} AS doc_id,
                 CASE WHEN r.range = 0 THEN d.text
                      ELSE regexp_replace(d.text, '(\\S+)',
                                          '\\1_' || r.range, 'g')
                 END AS text,
                 d.lang, d.source, d.n_chars
          FROM '{SRC}/documents.parquet' d
          CROSS JOIN range({REPLICAS}) r
        ) TO '{OUT}/documents.parquet' (FORMAT parquet)
        """
    )
    con.close()
    with open(marker, "w") as fh:
        fh.write(_fingerprint())


def main() -> int:
    ensure_data()
    from etl_sales_pandas_sqlserver_spark.session import get_spark

    spark = get_spark(app_name="jaccard-x100-probe")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    q = e.queries()

    def run_family(sf_dir: str, passes: int) -> tuple[float, dict[str, int]]:
        from etl_sales_pandas_sqlserver_spark import cache

        best = float("inf")
        rows: dict[str, int] = {}
        for _ in range(passes):
            spark.catalog.clearCache()
            cache.release_caches()
            cache.evict_session_memos(spark)
            t0 = time.perf_counter()
            for name in FAMILY:
                rows[name] = len(q[name](spark, sf_dir).collect())
            best = min(best, time.perf_counter() - t0)
        return best, rows

    run_family(SRC, 1)  # JVM/codegen warmup
    t1, rows1 = run_family(SRC, 2)
    t100, rows100 = run_family(OUT, 1)
    ratio = round(t100 / (REPLICAS * t1), 3)
    print(
        json.dumps(
            {
                "jaccard_x100_probe": {
                    "t_x1": round(t1, 3),
                    "t_x100": round(t100, 3),
                    "ratio_vs_linear": ratio,
                    "superlinear": bool(ratio > 1.5),
                    "rows_x1": rows1,
                    "rows_x100": rows100,
                    "row_ratio": {
                        n: round(rows100[n] / rows1[n], 2)
                        for n in FAMILY
                        if rows1[n]
                    },
                }
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
