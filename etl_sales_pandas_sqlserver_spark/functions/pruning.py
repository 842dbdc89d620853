"""Perplexity-band pruning: keep each source's mid-band by LM score.

Production curation prunes on a cheap LM signal from BOTH ends:
the lowest-perplexity (here: highest bigram-LM score) documents are
boilerplate/templates, the highest-perplexity ones are noise/garbled
text — the training value sits in the middle band (the same
observation behind perplexity-window filtering in CCNet-style
pipelines and mid-band selection in pruning studies). Like the
percentile calibration family, the band is PER SOURCE so a uniformly
"weird" source is not wiped out by a corpus-global threshold.

Exact semantics (integer-only, deterministic): rank each source's
scored docs by ``(lm_score_ppm, doc_id)`` ascending over ``n`` scored
docs; a doc is pruned-low iff ``4*rank <= n``, pruned-high iff
``4*rank > 3*n``, kept otherwise — the integer form of "keep the
(25%, 75%] rank band" with no floating quantiles. The LM score is the
SHARED spelling from functions/search.py (``lm_doc_scores`` /
``LM_SCORES_CTE``), so the ranking queries and this prune can never
drift apart. Docs with <2 tokens have no bigrams and are not scored
(identical rule both engines).

Scale: the score build is the bigram family's (int64-keyed shuffles
only); the band adds one source-partitioned window (rank + count
share the one exchange) and a map-side-combinable rollup to
|sources| rows. A skewed giant source concentrates its rank sort in
one task — same bound as any per-key window; the chunked-window
rewrite (operators/scale.py) is the escape hatch.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.testdata import load_table
from .search import LM_SCORES_CTE, lm_doc_scores

SparkQuery = Callable[[SparkSession, str], DataFrame]


def q_lm_band_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scores = lm_doc_scores(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    w_rnk = Window.partitionBy("source").orderBy("lm_score_ppm", "doc_id")
    w_src = Window.partitionBy("source")
    ranked = scores.select(
        "source",
        "lm_score_ppm",
        F.row_number().over(w_rnk).alias("rnk"),
        F.count(F.lit(1)).over(w_src).alias("n"),
    )
    low = F.col("rnk") * 4 <= F.col("n")
    high = F.col("rnk") * 4 > F.col("n") * 3
    kept = ~low & ~high
    return (
        ranked.groupBy("source")
        .agg(
            F.max("n").alias("n_scored"),
            F.sum(low.cast("long")).alias("n_pruned_low"),
            F.sum(kept.cast("long")).alias("n_kept"),
            F.sum(high.cast("long")).alias("n_pruned_high"),
            F.min(F.when(kept, F.col("lm_score_ppm"))).alias("kept_min_ppm"),
            F.max(F.when(kept, F.col("lm_score_ppm"))).alias("kept_max_ppm"),
        )
        .orderBy("source")
    )


LM_BAND_PRUNE_SQL = f"""
  WITH {LM_SCORES_CTE},
  j AS (
    SELECT s.doc_id, d.source, s.lm_score_ppm
    FROM lm_scores s JOIN documents d USING (doc_id)
  ),
  r AS (
    SELECT source, lm_score_ppm,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY lm_score_ppm, doc_id) AS rnk,
           COUNT(*) OVER (PARTITION BY source) AS n
    FROM j
  )
  SELECT source,
         CAST(MAX(n) AS BIGINT) AS n_scored,
         CAST(SUM(CASE WHEN rnk * 4 <= n THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pruned_low,
         CAST(SUM(CASE WHEN rnk * 4 > n AND rnk * 4 <= n * 3
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         CAST(SUM(CASE WHEN rnk * 4 > n * 3 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pruned_high,
         MIN(CASE WHEN rnk * 4 > n AND rnk * 4 <= n * 3
                  THEN lm_score_ppm END) AS kept_min_ppm,
         MAX(CASE WHEN rnk * 4 > n AND rnk * 4 <= n * 3
                  THEN lm_score_ppm END) AS kept_max_ppm
  FROM r
  GROUP BY source
  ORDER BY source
"""

QUERIES_EXPORT: dict[str, tuple[SparkQuery, "str | None"]] = {
    "lm_band_prune_by_source": (q_lm_band_prune, LM_BAND_PRUNE_SQL),
}
