"""Parquet loaders for the driver testdata star schema.

``events`` is read with its declared ``StructType``: the testdata
stores ``ts`` as parquet ``timestamp[us]`` with no timezone, which a
**vanilla** Spark 4 session (``spark.sql.parquet.inferTimestampNTZ.
enabled=true`` by default) infers as TIMESTAMP_NTZ -- and
``unix_micros`` / watermarks / interval arithmetic then fail with
DATATYPE_MISMATCH. Declaring TimestampType (LTZ) pins the type
regardless of which session runs the plan; the raw stored micros are
then read as UTC-epoch instants, so every epoch-microsecond output is
timezone-independent and matches DuckDB's ``epoch_us`` on the same
naive values. (Same pattern as ``streaming/queries.py``'s stream
schema, which went green under the driver in round 3.)

The other tables keep schema inference: their timestamp columns
(``o_orderdate``, ``l_shipdate``) are only compared/formatted as
*dates*, for which the driver's NTZ read is timezone-proof and has
been driver-verified green; forcing LTZ there would make date
extraction depend on the session timezone for no benefit.

We still fail loudly on column drift -- a declared-schema read
silently null-fills missing columns, so events asserts against the
footer's inferred column set first (footer-only metadata read,
negligible at any scale). The reference instead swallows errors into
an empty frame (``main.py:149-151``, ``return pd.DataFrame()``) -- an
explicit non-goal.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession

from ..schemas import TESTDATA_TABLES

#: Per-session memo of the VERIFIED read schema (a StructType — never
#: data, never results, never a plan). Every ``spark.read.parquet``
#: call runs footer-based schema inference in the JVM (~50-300 ms of
#: driver work), and a suite sweep constructs hundreds of
#: ``load_table`` plans per session, so re-inferring the identical
#: schema per query was a measurable slice of every query's wall time
#: (guide §7.3: planning/metadata is single-threaded driver work).
#: The memo stores the schema the first (inferring + column-verified)
#: read produced; later calls build a FRESH reader with that schema —
#: a fresh plan with fresh expression ids, so self-joins of two
#: ``load_table`` results stay unambiguous, and each execution still
#: scans the parquet from disk. Keyed by (sf_dir, table, file
#: mtime+size) so a same-session rewrite of the parquet (fixture-
#: mutating tests, scale smokes) misses the memo and re-verifies, and
#: weak-keyed by the session object so a new session — every driver /
#: bench process — re-infers from the files.
_SCHEMA_MEMO: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown testdata table: {name!r}")
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    try:
        # the (mtime_ns, size) change-detection key is only reliable
        # for a single regular parquet FILE: a Spark-written parquet
        # DIRECTORY can have a part file rewritten without the
        # directory stat changing, so anything else skips the memo and
        # takes the always-infer path (r17 advice)
        st = os.stat(path)
        key = (
            (sf_dir, name, st.st_mtime_ns, st.st_size)
            if os.path.isfile(path)
            else None
        )
    except OSError:
        # missing file: fall through and let spark.read raise its
        # usual error (no memo entry for a nonexistent path)
        key = None
    per = _SCHEMA_MEMO.setdefault(spark, {})
    if key is not None and key in per:
        return spark.read.schema(per[key]).parquet(path)
    df = spark.read.parquet(path)
    expected = {f.name for f in TESTDATA_TABLES[name].fields}
    got = set(df.columns)
    if not expected.issubset(got):
        raise ValueError(f"{name}: missing columns {sorted(expected - got)}")
    if name == "events":
        df = spark.read.schema(TESTDATA_TABLES[name]).parquet(path)
    if key is not None:
        per[key] = df.schema
    return df


def load_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def synth_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ``partsupp`` DERIVED from the driver's part and
    supplier tables -- the testdata ships none, which is what kept
    TPC-H Q2/Q9/Q11/Q16/Q20 unimplementable (SURVEY.md section 2.8).

    Follows the TPC-H generator's shape (4 suppliers per part):
    ``ps_suppkey = (p + p/S + i*(S/4)) mod S`` over the testdata's
    0-based keys -- the ``p/S`` rotation sits OUTSIDE the ``i``
    multiplier (TPC-H puts it inside), because with the testdata's
    small supplier counts an increment of ``S/4 + p/S`` can divide S
    and collapse the 4 suppliers onto fewer keys; ``i*(S/4)`` alone is
    collision-free for any S >= 4. availqty/supplycost are pure integer
    arithmetic on the keys: no seed state, no sampling, so a DuckDB
    oracle rebuilds the identical frame from the same base views
    (``plans/tpch_partsupp.PARTSUPP_CTE``). ``ps_supplycost`` is whole
    dollars (BIGINT) so downstream money math is exact in both engines.

    Scale: a narrow projection of ``part`` cross-joined with a
    broadcast single-row supplier count and a 4-element explode --
    shuffle-free, |partsupp| = 4x|part| regardless of SF."""
    from pyspark.sql import functions as F

    part = load_table(spark, sf_dir, "part").select("p_partkey")
    scnt = load_table(spark, sf_dir, "supplier").agg(
        F.count(F.lit(1)).alias("s_cnt")
    )
    base = part.crossJoin(F.broadcast(scnt)).select(
        F.col("p_partkey").alias("ps_partkey"),
        "s_cnt",
        F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("i"),
    )
    sk = F.expr(
        "(ps_partkey + ps_partkey DIV s_cnt + i * (s_cnt DIV 4)) % s_cnt"
    )
    return base.select("ps_partkey", sk.alias("ps_suppkey")).select(
        "ps_partkey",
        "ps_suppkey",
        ((F.col("ps_partkey") * 7 + F.col("ps_suppkey") * 3) % 9999 + 1).alias(
            "ps_availqty"
        ),
        (
            (F.col("ps_partkey") * 419 + F.col("ps_suppkey") * 263) % 999 + 1
        ).alias("ps_supplycost"),
    )
