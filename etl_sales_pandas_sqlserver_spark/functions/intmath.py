"""Shared exactness-critical integer fragments (cross-engine).

These spellings are load-bearing for the driver's Spark-vs-DuckDB
hash compare; they live in ONE module so the engine side and every
oracle twin can never silently de-sync (r10 review finding: the
next-pow2 expression had drifted into two modules, the ppm divisions
into six call sites).

- **next_pow2(n)** (n >= 2): ``1 << length(bin(n - 1))`` — binary
  string length is exact and identical in Spark and DuckDB; no log2
  (transcendentals differ across libm builds). Callers wrap their own
  small-n floor (16 for batching buckets, 1 for histograms).
- **exact ppm share**: ``floor(num * 10^6 / den)`` computed in
  int128-class arithmetic — Spark ``DECIMAL(38,0) ... div`` (div on
  decimals floors to BIGINT) and DuckDB ``HUGEINT ... //`` (true
  integer division; ``//`` on DECIMAL is float-like and NOT portable,
  verified r10). Both are exact to 38/int128 digits, so ppm shares
  never silently wrap at corpus scale the way a bare int64
  ``x * 1_000_000`` does (overflow at ~9.2e12 — a few tens of TB of
  tokens; Spark non-ANSI wraps silently while DuckDB raises, the
  r9-kmeans-advice divergence class).
"""

from __future__ import annotations

PPM = 1_000_000


def next_pow2_sql(var: str) -> str:
    """DuckDB fragment: smallest power of two >= var (var >= 2)."""
    return f"CAST(1 AS BIGINT) << length(bin({var} - 1))"


def next_pow2_spark(var: str) -> str:
    """Spark SQL fragment: smallest power of two >= var (var >= 2).
    F.shiftleft only takes a literal bit count, hence expr-level."""
    return f"shiftleft(CAST(1 AS BIGINT), length(bin({var} - 1)))"


def exact_ppm_sql(num: str, den: str) -> str:
    """DuckDB fragment: floor(num * 1e6 / den) in HUGEINT, as BIGINT."""
    return (
        f"CAST(CAST({num} AS HUGEINT) * {PPM} "
        f"// CAST({den} AS HUGEINT) AS BIGINT)"
    )


def exact_ppm_spark(num: str, den: str) -> str:
    """Spark SQL fragment: floor(num * 1e6 / den) in DECIMAL(38,0), as
    BIGINT (``div`` on decimal operands floors to BIGINT already; the
    outer cast pins the type)."""
    return (
        f"CAST(CAST({num} AS DECIMAL(38,0)) * {PPM} "
        f"div CAST({den} AS DECIMAL(38,0)) AS BIGINT)"
    )
