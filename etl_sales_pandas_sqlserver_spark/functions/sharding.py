"""Token-balanced output shard manifest.

Writers of training corpora emit fixed-token-budget shards (so every
data-loader worker streams a near-equal token count), assigning each
document — whole, documents are never split across shards — to the
shard where its EXCLUSIVE prefix token sum lands:

    shard_id = tokens_before(doc) div S,
    S = ceil(total_tokens / N_SHARDS)

over the deterministic global order ``doc_id`` ascending. The output
is the per-shard manifest (doc/token counts, doc-id span) a writer
would hand to N parallel copy tasks.

The global prefix sum is the scale problem: a naive
``SUM() OVER (ORDER BY doc_id)`` plans a single-partition window
(all data through one task). Here it is TWO-PHASE and fully
deterministic with no sampled boundaries (unlike range-partition
numbering, which needs a checkpoint to freeze sampled ranges):

1. fixed-width chunks ``chunk = doc_id div 4096`` — per-chunk token
   sums via one map-side-combinable groupBy;
2. chunk offsets = prefix sum over the CHUNK frame (a window over
   |id-range|/4096 rows — at 10^10 docs that is a ~2.4M-row /
   ~40 MB single sort task of (chunk, int64); a third level of the
   same construction bounds it further if ever needed), with the
   corpus total riding the same frame;
3. join the offset back on ``chunk`` (equi-join, broadcastable at
   test scale) and add the WITHIN-chunk running sum — a window
   partitioned by chunk, ≤4096 rows per partition by construction,
   so no skew and no giant task.

Everything is int64 (prefix sums of token counts wrap only past
~9.2e18 tokens, a ~40 PB corpus); the DuckDB oracle is the naive
single window, so the compare also PROVES the two-phase decomposition
exact.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..cache import managed_cache
from ..sources.testdata import load_table

SparkQuery = Callable[[SparkSession, str], DataFrame]

_N_SHARDS = 32
_CHUNK = 4096

_N_TOKENS_SQL = r"len(regexp_split_to_array(trim(text), '\s+'))"


def assign_token_shards(toks: DataFrame) -> DataFrame:
    """Add ``before`` (exclusive global prefix token sum over doc_id
    order), ``total``, and ``shard_id`` to a ``(doc_id, n_tok, ...)``
    frame via the deterministic two-phase decomposition described in
    the module docstring. The input should be a narrow cached
    projection — both the chunk-sum build and the join probe read it.
    Shared by the plain manifest and the budgeted-release pipeline
    (functions/release.py)."""
    toks = toks.withColumn("chunk", F.expr(f"doc_id div {_CHUNK}"))
    chunk_sums = toks.groupBy("chunk").agg(F.sum("n_tok").alias("c_tok"))
    w_off = Window.orderBy("chunk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_tot = Window.partitionBy()
    offsets = chunk_sums.select(
        "chunk",
        F.coalesce(F.sum("c_tok").over(w_off), F.lit(0).cast("long")).alias(
            "c_off"
        ),
        F.sum("c_tok").over(w_tot).alias("total"),
    )
    w_in = (
        Window.partitionBy("chunk")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # no broadcast hint: |chunks| = id-range/4096 is small at test
    # scale (AQE broadcasts it anyway) but NOT bounded at corpus
    # scale; as a plain equi-join the planner degrades it to a
    # shuffle join that reuses the same by-chunk partitioning the
    # within-chunk window needs
    return (
        toks.join(offsets, "chunk")
        .withColumn(
            "before",
            F.col("c_off")
            + F.coalesce(F.sum("n_tok").over(w_in), F.lit(0).cast("long")),
        )
        .withColumn(
            "shard_id",
            F.expr(
                f"before div greatest((total + {_N_SHARDS - 1}) div {_N_SHARDS},"
                f" CAST(1 AS BIGINT))"
            ),
        )
    )


def q_shard_manifest_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
        .cast("long")
        .alias("n_tok"),
    )
    # cache the 2-int64-column projection: the chunk-sum build and the
    # join probe otherwise each re-scan the full text column just to
    # recount tokens (two scans of the corpus's widest column for one
    # narrow derived frame)
    placed = assign_token_shards(managed_cache(docs))
    return (
        placed.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("tokens"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("shard_id")
    )


SHARD_MANIFEST_SQL = f"""
  WITH t AS (
    SELECT doc_id, CAST({_N_TOKENS_SQL} AS BIGINT) AS n_tok
    FROM documents
  ),
  c AS (
    SELECT doc_id, n_tok,
           CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS BIGINT)
             AS before,
           CAST(SUM(n_tok) OVER () AS BIGINT) AS total
    FROM t
  )
  SELECT before // GREATEST((total + {_N_SHARDS - 1}) // {_N_SHARDS},
                           CAST(1 AS BIGINT)) AS shard_id,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tok) AS BIGINT) AS tokens,
         MIN(doc_id) AS min_doc_id,
         MAX(doc_id) AS max_doc_id
  FROM c
  GROUP BY 1
  ORDER BY 1
"""

QUERIES_EXPORT: dict[str, tuple[SparkQuery, "str | None"]] = {
    "shard_manifest_tokens": (q_shard_manifest_tokens, SHARD_MANIFEST_SQL),
}
