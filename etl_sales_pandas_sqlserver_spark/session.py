"""SparkSession factory.

Defaults are chosen for the dual target: correctness tests on
``local[N]`` and the same code running on a 1000-executor cluster over
~100 TB. Nothing here is local-only; the local knobs (shuffle partition
count, driver memory) are read from the environment so a cluster deploy
overrides them with spark-submit conf instead.
"""

from __future__ import annotations

import os
from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import SparkSession


@contextmanager
def shuffle_partitions(spark: SparkSession, n: int) -> Iterator[None]:
    """Temporarily pin ``spark.sql.shuffle.partitions``.

    Streaming stateful operators size their state-store count from this
    conf at plan time (a pre-repartition cannot replace it), and
    iterative drivers shrink it to match loop-state size; both must
    restore the session value even on failure. Not safe against
    concurrent planning on the same session -- single-threaded in
    tests/bench; on a shared cluster use a dedicated session.
    """
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def get_spark(
    app_name: str = "etl-sales-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    - AQE on: runtime coalescing of shuffle partitions, skew-join
      splitting, and dynamic join-strategy switches -- the scale story
      for unknown data distributions.
    - Session timezone pinned to UTC so timestamp semantics match the
      DuckDB oracle and are cluster-location independent.
    - Arrow enabled for every pandas interchange (Pandas UDFs,
      toPandas) -- the only sanctioned Python hot path.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        n = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(n) if n and n.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # testdata parquet stores timestamp[us] with no timezone; without
        # this, Spark 4 infers TIMESTAMP_NTZ, which unix_micros/watermarks
        # reject and which diverges from the DuckDB oracle's naive-as-UTC
        # reading. Reading as TIMESTAMP (LTZ) under the pinned UTC session
        # tz gives identical instants on both engines.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.ansi.enabled", "false")  # cast-to-null, see operators.numeric
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        # library default stays modest -- hosts with small RAM must not
        # inherit a 32g heap; the bench harness opts in via the env var
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
