"""Null-handling operators (SURVEY.md section 2.2: P2, P12)."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def drop_null(df: DataFrame, *cols: str) -> DataFrame:
    """P2 -- ``df[df[c].notna()]`` (reference main.py:61,69,85,96-97).
    Catalyst collapses consecutive filters into one predicate and pushes
    it into the scan where possible."""
    out = df
    for c in cols:
        out = out.filter(F.col(c).isNotNull())
    return out


def any_null(cols: list[str]) -> Column:
    """P12 -- row-wise ``df.isnull().any(axis=1)`` (reference
    main.py:119) as a single OR'd predicate. No UDF: one codegen'd
    boolean expression regardless of column count."""
    return reduce(lambda a, b: a | b, [F.col(c).isNull() for c in cols])
