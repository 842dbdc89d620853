"""The corpus-wide whitespace token-count spelling, ONCE.

Token counts are the shared grain of the budgeting (functions/
budget.py), sharding (functions/sharding.py), release (functions/
release.py), curriculum (functions/curriculum.py), packing
(functions/currpack.py), funnel (functions/funnel.py) and card
(functions/dataset_cards.py, streaming/queries.py) families: a
water-fill level computed on one token definition and a shard
boundary computed on another would silently desync the pipeline. Both
engines' spellings live here so a change to the grain is one edit:

- ``N_TOKENS_SQL``   — the DuckDB oracle fragment;
- ``n_tokens_spark`` — the equivalent Spark Column (split on the
  explicit class after trim, count elements, int64).

An empty/whitespace-only ``text`` yields 1 on both engines (split of
the empty string returns one empty element) — a quirk, but an
IDENTICAL quirk, which is what the hash compare needs.

r14: the grain split on the EXPLICIT class ``WS_CLASS`` now, closing
the vertical-tab divergence this docstring used to document: Java's
``\\s`` (Spark) includes U+000B where RE2's (DuckDB) does not, so
``'a\\x0Bb'`` counted 2 Spark tokens vs 1 DuckDB token. The class is
the two-engine intersection — RE2's ``\\s`` IS exactly
``[\\t\\n\\f\\r ]``, so the oracle side of this respell is a semantic
no-op and only Spark's \\x0B behavior changed (to match the oracle).
Zero cross-engine divergence over every Unicode codepoint is proven
by tests/test_cross_engine_primitives.py::
test_explicit_ws_class_has_zero_divergence, and the fragment-level
agreement (vertical tab included) by tests/test_tokcount.py.

r16: the 8-site fingerprint spelling
(``md5(lower(trim(regexp_replace(text, WS_CLASS, ' '))))`` across
textstats/dedup/traindata/source_stats/dataset_cards/corpus_diff/
funnel), traindata's curation token gate, textstats' repetition pair
and ``_RE_TOKEN`` all interpolate this class now.

r17: the LAST ``\\s+`` family landed — ``textstats._TOKEN_SPLIT`` is
now ``WS_CLASS`` itself, flipped atomically with its paired SQL
literals (batching.py OOV_RATE_SQL, source_stats.py
CONTAMINATION_SQL). EVERY token/fingerprint site in the package is on
this one grain; a package grep for backslash-s token sites finds
none. The no-\\x0B testdata tripwire (test_tokcount) stands down to a
plain data-freshness check: with zero ``\\s`` sites it no longer
guards a latent divergence, but \\x0B-free driver data remains the
documented precondition the hostile vtab axis (tests/
test_hostile_docs_vtab.py + tools/hostile_sweep.py documents_vtab)
builds its poison corpus against.

Cross-family grain caveat (r15 ADVICE): ``shard_manifest_tokens``
excludes null-``doc_id`` documents on both engines — a manifest whose
global order IS doc_id cannot place an id-less document — while the
sibling token-grain families (token_budget_waterfill, release totals,
this module's raw counts) still include them. On data with null
doc_ids, shard-manifest token totals therefore run LOW relative to
budget/release totals by exactly the null-id documents' tokens. The
exclusion is deliberate and documented at sharding.py's query; the
same ``isNotNull`` respell is scheduled for the other doc_id-ordered
token families in their drain rounds if a single grain is wanted.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: The whitespace character SET (class interior) — shared so a
#: negated class (e.g. textstats._RE_TOKEN's "non-whitespace token
#: char") spells the same five characters as the positive split class.
WS_CHARS = r" \t\n\f\r"

#: The EXPLICIT whitespace class — identical under Java regex (Spark)
#: and RE2 (DuckDB): proven zero-divergence over every Unicode
#: codepoint. This is the respell TARGET for every ``\s+`` site; new
#: token sites must use this class from day one.
WS_CLASS = f"[{WS_CHARS}]+"

N_TOKENS_SQL = rf"len(regexp_split_to_array(trim(text), '{WS_CLASS}'))"


def n_tokens_spark(col: str = "text") -> Column:
    """Whitespace token count of ``col`` as int64 — the Spark twin of
    :data:`N_TOKENS_SQL`."""
    return F.size(F.split(F.trim(F.col(col)), WS_CLASS)).cast("long")
