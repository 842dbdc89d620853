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

KNOWN, DOCUMENTED DIVERGENCE — vertical tab U+000B: Java's ``\\s``
(Spark) includes ``\\x0B``; RE2's ``\\s`` (DuckDB) does not, so a
document containing a vertical tab counts differently on the two
engines (``'a\\x0Bb'`` is 2 Spark tokens, 1 DuckDB token). The driver
testdata contains no ``\\x0B`` at any scale (pinned by
``tests/test_tokcount.py::test_testdata_contains_no_vertical_tab``)
and the divergence itself is pinned loudly by
``test_vertical_tab_is_the_known_divergence`` so it can never drift
silently. Respelling the class explicitly (``'[ \\t\\n\\f\\r]+'``) on
both engines would align them, but ``\\s+`` is embedded in the PAIRED
oracle SQL of the whole textstats/source_stats token family — the
respelling is deferred until a round with re-verification budget for
all consumers (see NOTES_r13.md).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: The EXPLICIT whitespace class — identical under Java regex (Spark)
#: and RE2 (DuckDB): proven zero-divergence over every Unicode
#: codepoint by tests/test_cross_engine_primitives.py::
#: test_explicit_ws_class_has_zero_divergence. This is the respell
#: TARGET for every ``\s+`` site: dedup's token sites moved in r14
#: (with their drain round); the remaining sites — including
#: ``N_TOKENS_SQL`` below and the fingerprint pair — move with their
#: consumers' drain rounds (site-by-round table in NOTES_r14.md). New
#: token sites must use this class from day one.
WS_CLASS = r"[ \t\n\f\r]+"

N_TOKENS_SQL = r"len(regexp_split_to_array(trim(text), '\s+'))"


def n_tokens_spark(col: str = "text") -> Column:
    """Whitespace token count of ``col`` as int64 — the Spark twin of
    :data:`N_TOKENS_SQL`."""
    return F.size(F.split(F.trim(F.col(col)), r"\s+")).cast("long")
