"""Hive-partitioned dataset materialization for partition-pruned scans.

At 100 TB the cheapest byte is the one never read: laying a fact table
out as ``table/part_col=value/...`` directories lets Spark resolve a
predicate on the partition column at PLANNING time -- the scan lists
only the matching directories and the physical plan carries the
predicate in ``PartitionFilters`` instead of ``PushedFilters`` (no
file is even opened for excluded partitions, vs. opened-then-skipped
for row-group stats pruning). A daily-partitioned events table with a
3-day predicate reads 3/30ths of the dataset before any row filtering
happens.

Same build convention as :mod:`.bucketed`: the partitioned copy is
content-fingerprinted per source file (path + mtime + size) and
written once under the system temp dir -- queries pay partitioned-read
cost, the one-time layout build is amortized, and nothing lands in the
repo.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import Column, DataFrame, SparkSession

from .testdata import load_table

_PARTITIONED_ROOT = os.path.join(tempfile.gettempdir(), "spark_graft_partitioned")


def _tag(sf_dir: str, table: str, part_col: str) -> str:
    src = os.path.join(os.path.normpath(sf_dir), f"{table}.parquet")
    st = os.stat(src)
    return hashlib.md5(
        f"{os.path.abspath(src)}:{st.st_mtime_ns}:{st.st_size}:{part_col}".encode()
    ).hexdigest()[:16]


def partitioned_table(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    part_col: str,
    part_expr: Column,
) -> DataFrame:
    """Return ``table`` re-laid-out as a hive-partitioned parquet
    dataset on ``part_col = part_expr`` (derived from the row, e.g.
    ``F.to_date("ts")``), building the layout on first use.

    The returned frame carries the original columns plus ``part_col``;
    a filter on ``part_col`` prunes at planning time (asserted via
    ``PartitionFilters`` in tests/test_plan_shapes.py). Partition
    count at production scale is an explicit layout decision -- daily
    grain for a year is 365 directories; never partition on a
    high-cardinality key (a million directories is a metadata DoS,
    which is what bucketing is for).
    """
    path = os.path.join(
        _PARTITIONED_ROOT, f"{table}_{part_col}_{_tag(sf_dir, table, part_col)}"
    )
    if not os.path.isdir(path):
        (
            load_table(spark, sf_dir, table)
            .withColumn(part_col, part_expr)
            .write.mode("overwrite")
            .partitionBy(part_col)
            .parquet(path)
        )
    try:
        return spark.read.parquet(path)
    except Exception:
        # an EMPTY source writes no partition directories, so the read
        # cannot infer a schema; serve the (empty) source frame with
        # the partition column attached -- same schema, zero rows
        return load_table(spark, sf_dir, table).withColumn(part_col, part_expr)
