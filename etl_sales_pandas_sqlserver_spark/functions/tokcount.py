"""The corpus-wide whitespace token-count spelling, ONCE.

Token counts are the shared grain of the budgeting (functions/
budget.py), sharding (functions/sharding.py), release (functions/
release.py) and curriculum (functions/curriculum.py) families: a
water-fill level computed on one token definition and a shard
boundary computed on another would silently desync the pipeline. Both
engines' spellings live here so a change to the grain is one edit:

- ``N_TOKENS_SQL``   — the DuckDB oracle fragment;
- ``n_tokens_spark`` — the equivalent Spark Column (split on ``\\s+``
  after trim, count elements, int64).

An empty/whitespace-only ``text`` yields 1 on both engines (split of
the empty string returns one empty element) — a quirk, but an
IDENTICAL quirk, which is what the hash compare needs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

N_TOKENS_SQL = r"len(regexp_split_to_array(trim(text), '\s+'))"


def n_tokens_spark(col: str = "text") -> Column:
    """Whitespace token count of ``col`` as int64 — the Spark twin of
    :data:`N_TOKENS_SQL`."""
    return F.size(F.split(F.trim(F.col(col)), r"\s+")).cast("long")
