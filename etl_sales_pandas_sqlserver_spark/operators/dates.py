"""Date/time operators (SURVEY.md section 2.2: P10, P16).

``try_to_timestamp`` == pandas ``to_datetime(errors='coerce')`` (NULL on
failure, no ANSI exception). The reference accepts mixed formats via
pandas' format sniffing (main.py:92-93); the engine's coercing parse
takes an optional format list and coalesces the first success.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_timestamp_coerce(col: Column | str, formats: tuple[str, ...] = ()) -> Column:
    """P10 -- coercing multi-format timestamp parse (reference
    main.py:92-93). With no formats, Spark's default parser handles
    ISO-ish strings; each extra format is coalesced in order."""
    c = F.col(col) if isinstance(col, str) else col
    attempts = [F.try_to_timestamp(c, F.lit(fmt)) for fmt in formats]
    attempts.append(F.try_to_timestamp(c))
    return F.coalesce(*attempts) if len(attempts) > 1 else attempts[0]


def month_key(col: Column | str) -> Column:
    """P16 -- ``dt.strftime('%m/%Y')`` month key (reference main.py:164).
    NOTE the reference then sorts this LEXICOGRAPHICALLY ('01/2024' <
    '01/2025' < '02/2024') -- chronologically wrong but golden-accurate
    (SURVEY.md A2); callers that want chronological order should sort by
    a real date column instead."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "MM/yyyy")


def iso_date(col: Column | str) -> Column:
    """P16 sink variant -- ``dt.strftime('%Y-%m-%d')`` (reference
    main.py:209)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd")
