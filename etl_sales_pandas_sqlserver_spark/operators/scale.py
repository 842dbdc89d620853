"""Scale-path join utilities: bucketed (pre-shuffled) tables and
salted joins for skewed keys.

These are the two knobs the prompt-level plan can't express and
Catalyst can't infer:

- **Bucketing** trades one up-front shuffle at write time for ZERO
  shuffles on every subsequent join/aggregation on the bucket key. At
  100 TB a fact table joined daily against another fact on the same
  key should be bucketed once, not sort-merge-shuffled per query. The
  test suite asserts the property that matters: a join of two tables
  bucketed on the same key by the same bucket count plans with NO
  Exchange on either side.
- **Salting** splits a skewed build key into N sub-keys so one hot key
  no longer lands on one task. AQE's skew-join handles *sort-merge*
  skew automatically; salting remains the tool when the skewed side
  feeds an aggregation or the join is broadcast-infeasible. The
  explode side replicates the small table N times -- bounded, explicit
  fan-out instead of an unbounded hot partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed
    table. Joins/aggs on ``bucket_cols`` against tables bucketed with
    the SAME column set and bucket count skip their shuffle (and with
    ``sort_cols`` the sort-merge sort too)."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two bucketed tables on their bucket key. With matching
    bucketing this plans shuffle-free (assert: no Exchange below the
    SortMergeJoin)."""
    return spark.table(left_table).join(spark.table(right_table), on)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Inner-join ``fact`` to ``dim`` on ``key`` with the fact side
    salted: fact rows scatter across ``n_salts`` sub-keys, the dim side
    replicates once per salt. Result equals a plain inner join on
    ``key`` (asserted in tests) while a hot key occupies ``n_salts``
    tasks instead of one.

    The salt must be deterministic for result stability AND vary
    within a hot key for skew mitigation: it hashes the FULL fact row
    (all columns), so it is stable across retries and cluster
    topologies, and a hot key's rows fan out as long as any non-key
    column varies. (``spark_partition_id()`` would be constant per
    scan split -- a hot key concentrated in one coalesced partition
    would keep a single salt and defeat the whole mechanism;
    ``monotonically_increasing_id()`` is not stable across retries.)
    Fully identical duplicate rows share a salt, which only matters if
    duplicates themselves are the skew source.
    """
    fact_salted = fact.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts)),
    )
    dim_salted = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return fact_salted.join(dim_salted, [key, "_salt"]).drop("_salt")


def salted_agg_count(
    df: DataFrame, key: str, n_salts: int = 8
) -> DataFrame:
    """Two-phase count for a skewed group key: partial count per
    (key, salt), then final sum per key. Same result as a direct
    ``groupBy(key).count()`` (asserted in tests); the partial phase
    spreads a hot key over ``n_salts`` reducers. Spark's hash
    aggregation already does map-side partials -- this pattern matters
    when the hot key's *reduce* side overflows one task (e.g.
    count-distinct or collect-style aggs downstream)."""
    partial = (
        df.withColumn("_salt", F.pmod(F.xxhash64(F.col(key)) + F.spark_partition_id(), F.lit(n_salts)))
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").alias("n"))
