"""One BPE merge-candidate round: corpus-wide adjacent-pair counts.

Byte-pair-encoding training is an iterative loop whose data-side
primitive is this single round: split text into whitespace words,
count every ADJACENT CHARACTER PAIR inside each word across the whole
corpus, and take the top candidates by count — the pair a trainer
would merge next. (The loop itself is driver-side iteration over this
primitive, like k-means over the assignment step; the primitive is
what must scale.)

Semantics (identical both engines): words = whitespace split of
``trim(lower(text))``; words shorter than 2 characters have no pairs;
pair ``i`` = the two-character substring at position ``i`` (CHARACTER
grain, so multibyte text pairs identically — substr is char-based in
both Spark and DuckDB); top 50 by count descending, pair ascending as
the deterministic tiebreak at the cutoff.

Scale shape: pairs are built INSIDE the row (transform over a position
sequence, then explode — no self-join, the same pattern as the bigram
LM build) and flow into ONE map-side-combinable hash aggregation keyed
by the pair string; the top-50 compiles to TakeOrderedAndProject
(per-partition top-k, 50 rows shuffled). Work is linear in corpus
characters; no operator's state exceeds |distinct pairs|.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import load_table

SparkQuery = Callable[[SparkSession, str], DataFrame]

_TOPK = 50


def q_bpe_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w")
    ).filter(F.length("w") >= 2)
    # sequence lower bound == 1 is guaranteed by the length filter
    # (sequence(a, b) with b < a would count DOWN)
    pairs = words.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(w) - 1),"
                " i -> substring(w, i, 2))"
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair"))
        .limit(_TOPK)
    )


BPE_TOP_PAIRS_SQL = f"""
  WITH words AS (
    SELECT UNNEST(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
    FROM documents
  ),
  pairs AS (
    SELECT UNNEST([substr(w, i, 2) for i in range(1, len(w))]) AS pair
    FROM words WHERE len(w) >= 2
  )
  SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
  FROM pairs
  GROUP BY pair
  ORDER BY n DESC, pair
  LIMIT {_TOPK}
"""

QUERIES_EXPORT: dict[str, tuple[SparkQuery, "str | None"]] = {
    "bpe_top_pairs": (q_bpe_top_pairs, BPE_TOP_PAIRS_SQL),
}
