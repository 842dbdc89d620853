"""Skewed-source probe for the band-prune rewrite (round 12).

Round 11's verdict flagged ``lm_band_prune_by_source``'s per-source
``row_number`` window: a giant skewed source serializes its rank sort
into one task. Round 12 rewrote the query onto the bounded
DISTINCT-SCORE frame (functions/rankframe.py) — the per-source window
now runs over at most 1e6+1 rows (the integer ppm score domain)
regardless of source size. This probe proves the skew immunity:

- replica sheet: the LARGEST source's documents replicated ``K=50``
  times (ids shifted by k*10^7, tokens in replica k>0 suffixed
  ``_k``), all other sources kept 1x — one source ends up holding
  ~K/(K*share+1-share) of the corpus. Suffixed tokens keep each
  replica's bigram statistics IDENTICAL to the original (replica
  bigram sets are disjoint, so every conditional count is preserved),
  hence the giant source's distinct-score SET does not grow — only
  its per-score doc counts scale. The old per-row window would sort
  K*|source| rows in ONE task; the rank frame sorts the SAME number
  of distinct-score rows as before.

- budget: LINEAR in total document count. ratio =
  t_skew / (t_base * doc_ratio); <= ~1 means the skewed giant source
  costs no more per-document than the uniform corpus — the window
  did not become the straggler.

- work pin: per-source ``n_scored`` from the query's own output —
  the replicated source's count must be exactly K x its base count.

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
OUT = os.path.join(REPO, ".scaledata", "skewprune")
K = 50
SHIFT = 10_000_000
_GEN_VERSION = "v1"

QUERY = "lm_band_prune_by_source"


def _fingerprint() -> str:
    st = os.stat(os.path.join(SRC, "documents.parquet"))
    return f"{_GEN_VERSION}:{SRC}:{st.st_mtime_ns}:{st.st_size}:{K}"


def _largest_source() -> str:
    import duckdb

    con = duckdb.connect()
    src = con.execute(
        f"SELECT source FROM '{SRC}/documents.parquet' "
        "GROUP BY source ORDER BY COUNT(*) DESC, source LIMIT 1"
    ).fetchone()[0]
    con.close()
    return src


def ensure_data(giant: str) -> None:
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
          CROSS JOIN range({K}) r
          WHERE d.source = '{giant}' OR r.range = 0
        ) TO '{OUT}/documents.parquet' (FORMAT parquet)
        """
    )
    con.close()
    with open(marker, "w") as fh:
        fh.write(_fingerprint())


def main() -> int:
    giant = _largest_source()
    ensure_data(giant)
    from etl_sales_pandas_sqlserver_spark.session import get_spark

    spark = get_spark(app_name="prune-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    fn = e.queries()[QUERY]

    def run(sf_dir: str, passes: int) -> tuple[float, dict[str, int]]:
        from etl_sales_pandas_sqlserver_spark import cache

        best = float("inf")
        scored: dict[str, int] = {}
        for _ in range(passes):
            spark.catalog.clearCache()
            cache.release_caches()
            cache.evict_session_memos(spark)
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            rows = fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
            scored = {r["source"]: r["n_scored"] for r in rows}
        return best, scored

    import duckdb

    con = duckdb.connect()
    n_base = con.execute(
        f"SELECT COUNT(*) FROM '{SRC}/documents.parquet'"
    ).fetchone()[0]
    n_skew = con.execute(
        f"SELECT COUNT(*) FROM '{OUT}/documents.parquet'"
    ).fetchone()[0]
    con.close()
    doc_ratio = n_skew / n_base

    run(SRC, 1)  # JVM/codegen warmup
    t_base, scored_base = run(SRC, 2)
    t_skew, scored_skew = run(OUT, 2)
    ratio = round(t_skew / (t_base * doc_ratio), 3)
    print(
        json.dumps(
            {
                "prune_skew_probe": {
                    "giant_source": giant,
                    "k": K,
                    "doc_ratio": round(doc_ratio, 3),
                    "t_base": round(t_base, 3),
                    "t_skew": round(t_skew, 3),
                    "ratio_vs_linear": ratio,
                    "superlinear": bool(ratio > 1.5),
                    "giant_scored_base": scored_base.get(giant),
                    "giant_scored_skew": scored_skew.get(giant),
                    "giant_scale_exact": bool(
                        scored_base.get(giant)
                        and scored_skew.get(giant)
                        == K * scored_base.get(giant)
                    ),
                }
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
