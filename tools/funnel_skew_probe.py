"""Hot-fingerprint probe for the curation funnel (round 13).

The funnel's keep-first test is spelled as a map-side-combinable
``min(doc_id)`` per fingerprint + null-safe join back, NOT a
``row_number`` window, precisely because a boilerplate fingerprint
with millions of copies is a realistic hot key at corpus scale: AQE
can skew-split a hot sort-merge-join partition but can never split a
window partition. This probe proves the claim with the most hostile
shape the stock testdata cannot produce:

- skew sheet: the sf0.1 corpus (5 000 docs) + ONE pool document
  replicated ``K=45 000`` times with IDENTICAL text (ids shifted past
  the base range, ≡1 mod 10 so every replica stays in the train
  pool) — 90% of the corpus collapses into a single fingerprint
  group, and the min-agg's partial aggregation must absorb it
  map-side.

- budget: LINEAR in total document count. ratio =
  t_skew / (t_base * doc_ratio); <= ~1 means the one-group corpus
  costs no more per-document than the organic corpus — the keep-first
  did not become the straggler.

- work pin: every replica has a doc_id greater than the base copy's,
  so ALL K replicas must be attributed ``exact_dup`` (first-fail:
  dup wins over any later gate) — the exact_dup count must grow by
  EXACTLY K and no other stage's count may shrink below its base
  value minus 0 (the base copy keeps its base attribution).

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
OUT = os.path.join(REPO, ".scaledata", "skewfunnel")
K = 45_000
SHIFT = 10_000_000
_GEN_VERSION = "v1"

QUERY = "curation_funnel_stages"


def _fingerprint() -> str:
    st = os.stat(os.path.join(SRC, "documents.parquet"))
    return f"{_GEN_VERSION}:{SRC}:{st.st_mtime_ns}:{st.st_size}:{K}"


def ensure_data() -> None:
    stamp = os.path.join(OUT, ".stamp")
    if os.path.exists(stamp) and open(stamp).read() == _fingerprint():
        return
    import duckdb

    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    src = os.path.join(SRC, "documents.parquet")
    # the lowest-id pool doc with enough tokens to pass the length
    # gate (deterministic choice; its replicas are dups regardless)
    hot = con.execute(
        f"""
        SELECT doc_id FROM '{src}'
        WHERE doc_id % 10 <> 0
          AND len(regexp_split_to_array(trim(text), '\\s+')) >= 5
        ORDER BY doc_id LIMIT 1
        """
    ).fetchone()[0]
    con.execute(
        f"""
        COPY (
          SELECT * FROM '{src}'
          UNION ALL
          SELECT {SHIFT} + 10 * g.range + 1 AS doc_id,
                 d.text, d.lang, d.source, d.n_chars
          FROM '{src}' d JOIN range({K}) g ON TRUE
          WHERE d.doc_id = {hot}
        ) TO '{OUT}/documents.parquet' (FORMAT PARQUET)
        """
    )
    with open(stamp, "w") as f:
        f.write(_fingerprint())


def main() -> int:
    ensure_data()
    from etl_sales_pandas_sqlserver_spark.session import get_spark

    spark = get_spark(app_name="funnel-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    fn = e.queries()[QUERY]
    fn(spark, SRC).collect()  # warmup

    def run(sf_dir: str, passes: int = 2):
        from etl_sales_pandas_sqlserver_spark import cache

        best = float("inf")
        rows = None
        for _ in range(passes):
            spark.catalog.clearCache()
            cache.release_caches()
            cache.evict_session_memos(spark)
            t0 = time.perf_counter()
            rows = fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        return best, {r.stage: r.n_docs for r in rows}

    t_base, base_rows = run(SRC)
    t_skew, skew_rows = run(OUT)
    n_base = sum(base_rows.values())
    n_skew = sum(skew_rows.values())
    doc_ratio = n_skew / n_base
    ratio = round(t_skew / (t_base * doc_ratio), 3)
    dup_delta = skew_rows.get("exact_dup", 0) - base_rows.get("exact_dup", 0)
    print(
        json.dumps(
            {
                "probe": "funnel_hot_fingerprint",
                "k": K,
                "t_base": round(t_base, 3),
                "t_skew": round(t_skew, 3),
                "doc_ratio": round(doc_ratio, 3),
                "ratio_vs_linear": ratio,
                "superlinear": ratio > 1.5,
                "base_stages": base_rows,
                "skew_stages": skew_rows,
                "dup_delta": dup_delta,
                "dup_delta_is_k": dup_delta == K,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
