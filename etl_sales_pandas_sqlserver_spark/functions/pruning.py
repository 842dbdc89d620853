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

Scale (r12 rewrite): the naive shape — ``row_number`` partitioned by
source — serializes a skewed giant source's sort into one task. Since
every output here depends only on rank BANDS, not the ``doc_id``
tiebreak within a tied score, it is computed instead on the bounded
DISTINCT-SCORE frame (functions/rankframe.py): counts per
(source, score), one window over ≤ 1e6+1 rows per source (the ppm
score domain), then band arithmetic —

    n_pruned_low  = n div 4           (ranks 1 .. n div 4)
    n_kept        = (3n) div 4 - n div 4
    n_pruned_high = n - (3n) div 4
    kept min/max  = extreme scores whose rank block [lo, hi]
                    intersects the kept band (n div 4, (3n) div 4]

so a source with a billion docs costs the same window as one with a
thousand. The score build is the bigram family's (int64-keyed
shuffles only); the rollup to |sources| rows is map-side combinable.
The ORACLE stays the naive per-row ``ROW_NUMBER`` window, so the
driver hash-compare proves the band arithmetic equal to the
rank-by-rank definition.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import load_table
from .rankframe import distinct_score_rank_frame
from .search import LM_SCORES_CTE, lm_doc_scores_for

SparkQuery = Callable[[SparkSession, str], DataFrame]


def q_lm_band_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # memoized corpus score feed (see search.lm_doc_scores_for)
    scores = lm_doc_scores_for(spark, sf_dir).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    framed = distinct_score_rank_frame(scores, ["source"])
    # a tied-score block [lo, hi] intersects the kept rank band
    # (n div 4, (3n) div 4] iff lo <= (3n) div 4 AND hi > n div 4
    inter = (F.col("lo") <= F.expr("(3 * n) div 4")) & (
        F.col("hi") > F.expr("n div 4")
    )
    return (
        framed.groupBy("source")
        .agg(
            F.max("n").alias("n_scored"),
            F.max(F.expr("n div 4")).alias("n_pruned_low"),
            F.max(F.expr("(3 * n) div 4 - n div 4")).alias("n_kept"),
            F.max(F.expr("n - (3 * n) div 4")).alias("n_pruned_high"),
            F.min(F.when(inter, F.col("lm_score_ppm"))).alias(
                "kept_min_ppm"
            ),
            F.max(F.when(inter, F.col("lm_score_ppm"))).alias(
                "kept_max_ppm"
            ),
        )
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
