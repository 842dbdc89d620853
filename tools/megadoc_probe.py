"""Mega-document robustness probe (r15 ad-hoc run, committed r16).

Long-document behavior is a real 100 TB ingest hazard the synthetic
testdata cannot show (driver docs are ~40-400 chars): per-word in-row
transforms (BPE pair explode, greedy merge folds, winnowing windows)
can go quadratic on one pathological document without any query being
wrong at sf0.1. This probe appends two adversarial documents to a copy
of sf0.001 and times the heaviest text families end-to-end:

- a 200 KB / 20k-word doc (wide token array: explode fan-out,
  shingle/window length), and
- a 50 KB SINGLE-WORD doc (no whitespace — the worst case for
  per-word transforms: one 50k-char token hits the pair transform and
  the K merge-fold passes as a single in-row array).

Pass criterion is qualitative, printed per family: completes, no
raise, wall seconds for eyeballing round-over-round. This corpus is
deliberately HARSHER than the r15 ad-hoc probe: the 20k-word doc has
~20k DISTINCT words (the fold runs once per distinct word), and the
single-word doc makes "zz" a top-50 pair, so the merge rules actually
FIRE inside the 50k-char token array (r15's megaword matched no rule,
so its fold was a no-op scan).

r16 baseline: bpe_top_pairs 6.4 s, text_winnow 1.7 s, minhash 2.9 s,
simhash 4.2 s, repeated_spans 0.9 s, importance_weights 3.8 s, rest
sub-second — and **bpe_apply_merges 292 s: a REAL quadratic this
probe exposed** (confirmed 4x wall per 2x word length on z*N probes:
12.5k→17 s, 25k→70 s, 50k→287 s). The greedy in-row merge fold
rebuilt the token array per consumed element, O(len^2) per pass when
merges fire densely. FIXED r17: each pass is now a single linear JVM
string replace over a sentinel-delimited char encoding
(functions/bpe.py::_one_merge_pass) — r17 reading:
**bpe_apply_merges 8.6 s ≈ bpe_top_pairs 6.9 s**, the target the r16
verdict set. A hang or a 10x jump in any family now means a new
quadratic crept into an in-row kernel.

Usage: python tools/megadoc_probe.py [sf_dir]
Prints one JSON line: {"family": sec, ...}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

#: heaviest per-word / per-char in-row text families
PROBED = [
    "bpe_top_pairs",
    "bpe_apply_merges",
    "text_winnow_fingerprints",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_repeated_spans",
    "text_repetition_scores",
    "text_fingerprint",
    "text_token_stats",
    "importance_weights_ngram",
]


def main() -> int:
    import duckdb

    d = tempfile.mkdtemp(prefix="megadoc_")
    words = " ".join(f"w{i % 977}x{i % 31}" for i in range(20_000))
    megaword = "z" * 50_000
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT * FROM '{SF}/documents.parquet'
          UNION ALL SELECT 920001, ?, 'en', 'web', {len(words)}
          UNION ALL SELECT 920002, ?, 'en', 'web', {len(megaword)}
        ) TO '{d}/documents.parquet' (FORMAT PARQUET)
        """,
        [words, megaword],
    )
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"]:
        shutil.copy(f"{SF}/{t}.parquet", f"{d}/{t}.parquet")

    from etl_sales_pandas_sqlserver_spark.session import get_spark

    spark = get_spark(app_name="megadoc-probe")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    q = e.queries()
    q["text_token_stats"](spark, SF).collect()  # warmup

    out: dict[str, float] = {}
    for name in PROBED:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        n = len(q[name](spark, d).collect())
        out[name] = round(time.perf_counter() - t0, 2)
        print(f"  {name}: {out[name]} s ({n} rows)", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
