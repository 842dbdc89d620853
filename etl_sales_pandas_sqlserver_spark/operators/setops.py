"""Set operators (SURVEY.md section 2.5: U1)."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_by_name(dfs: list[DataFrame]) -> DataFrame:
    """U1 -- ``pd.concat(dfs, ignore_index=True)`` (reference
    main.py:141, etl_utils.py:197): aligns on column NAMES, null-fills
    columns missing from either side, and KEEPS duplicate rows (the
    goldens contain verbatim repeated rows -- union must not dedup).

    Plan-wise this is metadata-only: no shuffle, partitions of the
    inputs are concatenated."""
    if not dfs:
        raise ValueError("union_by_name needs at least one DataFrame")
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs
    )
