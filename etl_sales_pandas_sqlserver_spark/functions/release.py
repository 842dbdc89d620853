"""Budgeted corpus release: water-fill → sample → token-balanced shards.

The round-11 capstone composite — the writer path a pipeline runs to
cut a training corpus release under a token budget, chaining the three
primitives end-to-end on ONE cached projection:

1. **allocate**: water-fill the global budget across sources
   (``functions/budget.py`` — discrete max-min fair, all int64);
2. **sample**: the deterministic md5 ppm gate admits each doc iff
   ``gate < funded_ppm(source)`` (the same shared gate the audit
   query reports on);
3. **shard**: the SAMPLED stream flows through the two-level chunked
   exclusive prefix sum (``functions/sharding.py``) into token-balanced output
   shards — each row of the result is one shard a copy task would
   write, with its doc/token volume and source diversity.

Like ``corpus_curation_pipeline`` for the dedup/quality side, the
value of registering the COMPOSITE (not just its stages) is that the
driver hash-verifies the stages agree end-to-end: the gate decides
membership, the prefix sum orders exactly the surviving docs, and the
DuckDB oracle recomputes the whole chain with a naive global window —
any disagreement between the staged Spark decomposition and the
straight-line semantics is a hash mismatch.

Scale: one text scan into the cached 4-int64-column projection; the
water-fill is |sources|-row windows; the gate is stateless; the shard
assignment adds the shuffles the plain manifest pays (chunk sums,
superchunk rollup, by-chunk window) — nothing new beyond the proven
stages.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cache import managed_cache
from ..sources.testdata import load_table
from .budget import _WF_CTE, _waterfill, sample_gate
from .intmath import exact_ppm_spark, exact_ppm_sql
from .sharding import _N_SHARDS, assign_token_shards
from .tokcount import N_TOKENS_SQL as _N_TOKENS_SQL
from .tokcount import n_tokens_spark

SparkQuery = Callable[[SparkSession, str], DataFrame]


def q_release_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = managed_cache(
        load_table(spark, sf_dir, "documents").select(
            "doc_id",
            "source",
            n_tokens_spark().alias("n_tok"),
            sample_gate().alias("gate"),
        )
    )
    per_source = docs.groupBy("source").agg(F.sum("n_tok").alias("avail"))
    shares = _waterfill(per_source).select(
        "source",
        F.expr(exact_ppm_spark("alloc", "avail")).alias("target_ppm"),
    )
    sampled = docs.join(
        F.broadcast(shares), "source"  # broadcast-ok: |sources|-row waterfill frame
    ).filter(F.col("gate") < F.col("target_ppm"))
    placed = assign_token_shards(sampled.select("doc_id", "n_tok", "source"))
    return (
        placed.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("tokens"),
            F.count_distinct(F.col("source")).alias("n_sources"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


RELEASE_SHARD_SQL = f"""
  {_WF_CTE},
  d AS (
    SELECT doc_id, source,
           CAST({_N_TOKENS_SQL} AS BIGINT) AS n_tok,
           CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#budget'),
                               1, 8) AS BIGINT) % 1000000 AS gate
    FROM documents
  ),
  sh AS (
    SELECT source, {exact_ppm_sql('alloc', 'avail')} AS target_ppm
    FROM alloc
  ),
  sampled AS (
    SELECT d.doc_id, d.source, d.n_tok
    FROM d JOIN sh USING (source)
    WHERE d.gate < sh.target_ppm
  ),
  c AS (
    SELECT doc_id, source, n_tok,
           CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS BIGINT)
             AS before,
           CAST(SUM(n_tok) OVER () AS BIGINT) AS total
    FROM sampled
  )
  SELECT before // GREATEST((total + {_N_SHARDS - 1}) // {_N_SHARDS},
                            CAST(1 AS BIGINT)) AS shard_id,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tok) AS BIGINT) AS tokens,
         CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
         MIN(doc_id) AS min_doc_id,
         MAX(doc_id) AS max_doc_id
  FROM c
  GROUP BY 1
  ORDER BY 1
"""

QUERIES_EXPORT: dict[str, tuple[SparkQuery, "str | None"]] = {
    "release_shard_manifest": (q_release_shard_manifest, RELEASE_SHARD_SQL),
}
