"""Table-maintenance utilities: parquet compaction and schema-evolution
reads. Neither exists in the reference (its outputs are single CSVs),
but both are table-stakes operations for a 100 TB lakehouse deployment:
streaming/incremental writers fragment tables into thousands of small
files whose per-file open/footer cost dominates scans, and long-lived
tables accumulate schema drift across ingestion eras.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a fragmented parquet directory into ~target-sized files.

    File count = ceil(total bytes / target); the rewrite is one
    shuffle-free pass when coalescing down (coalesce merges partitions
    without moving rows between executors). Returns the new file
    count. Non-atomic (reader sees the directory mid-rewrite): on a
    production lakehouse this runs under the table format's commit
    protocol; here the contract is the compaction itself.

    Why it matters at scale: a scan pays a file open + footer read per
    file; 10k x 1 MB files cost ~10k metadata round-trips for the same
    bytes 80 well-sized files serve. Compaction is the difference
    between a metadata-bound and an IO-bound scan.
    """
    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _dirs, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, -(-total // target_file_bytes))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "._compact_tmp"
    df.coalesce(n_files).write.mode("overwrite").parquet(tmp)
    # swap: read side-effect free since Spark lists files at action time
    import shutil

    shutil.rmtree(path)
    os.rename(tmp, path)
    return n_files


def read_parquet_merged_schema(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet dataset whose files carry DIFFERENT (compatible)
    schemas -- columns added over time appear as NULL for files written
    before them. mergeSchema costs one footer read per distinct file
    schema at planning; per-file pushdown and pruning still apply."""
    return spark.read.option("mergeSchema", "true").parquet(path)
