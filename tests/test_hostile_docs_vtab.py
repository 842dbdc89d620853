"""Hostile vertical-tab (U+000B) documents — the whitespace-grain axis.

U+000B is THE character the two engines' ``\\s`` disagree on (Java
includes it, RE2 does not; proven codepoint-exhaustively in
test_cross_engine_primitives). The r14-r16 respells moved every
fingerprint/token spelling they covered onto the explicit
``tokcount.WS_CLASS``, where both engines agree — this module pins the
r16 sweep classification of ``tools/hostile_sweep.py documents_vtab``
(poison: one doc with \\x0B inside words, one doc differing from an
existing doc ONLY by \\x0B-vs-space):

1. **186/186 classified, zero mismatch (r17)** — the r16 fingerprint
   atomic group (exact dedup, fingerprints, curation pipeline + funnel
   audit, source dedup rate, dataset cards, corpus diff), the curation
   token gate, the repetition pair, ``_RE_TOKEN``, the r14/r15
   tokcount/bpe/array grains, AND (r17) the final
   ``textstats._TOKEN_SPLIT`` family: ``_TOKEN_SPLIT = WS_CLASS`` plus
   its paired SQL literals (batching OOV_RATE_SQL, source_stats
   CONTAMINATION_SQL) landed as one atomic set, so ``text_token_stats``,
   ``text_quality_scores``, ``text_winnow_fingerprints``,
   ``text_docfreq_quality``, ``oov_rate_by_source`` and
   ``lang_sampling_weights_sqrt`` now agree on \\x0B text. A
   representative slice (including all six) is parity-pinned below.
2. ``_KNOWN_MISMATCH`` is EMPTY — kept as the loud landing spot for
   any future token-grain site that is not born on ``WS_CLASS``.
"""

from __future__ import annotations

import math
import shutil

import duckdb
import pytest

_COPY = ["region", "nation", "customer", "supplier", "part",
         "orders", "lineitem", "events", "embeddings"]

#: representative slice of the 180 vtab-green queries: the r16
#: fingerprint atomic group + the grains flipped in earlier rounds
_ROBUST = [
    "text_fingerprint",
    "dedup_exact",
    "corpus_curation_pipeline",
    "curation_funnel_stages",
    "curation_funnel_by_source",
    "source_dedup_rate_rollup",
    "dataset_card_by_source",
    "dataset_card_global",
    "corpus_churn_by_source",
    "corpus_snapshot_diff",
    "text_repetition_scores",
    "contamination_matrix_sources",
    "token_budget_waterfill",
    "shard_manifest_tokens",
    "bpe_top_pairs",
    "bpe_apply_merges",
    "token_salience",
    # r17: the _TOKEN_SPLIT atomic respell set, flipped from
    # _KNOWN_MISMATCH when _TOKEN_SPLIT became WS_CLASS
    "text_token_stats",
    "text_quality_scores",
    "text_winnow_fingerprints",
    "text_docfreq_quality",
    "oov_rate_by_source",
    "lang_sampling_weights_sqrt",
]

#: EMPTY since r17 (the _TOKEN_SPLIT set landed): every token/
#: fingerprint site is on the explicit WS_CLASS grain. Any new entry
#: here is a regression, not a backlog item — new token sites must be
#: born on tokcount.WS_CLASS.
_KNOWN_MISMATCH: list[str] = []


@pytest.fixture(autouse=True)
def _driver_ansi(spark):
    """Match driver conditions (Spark 4 default = ANSI ON)."""
    before = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    yield
    spark.conf.set("spark.sql.ansi.enabled", before)


@pytest.fixture(scope="module")
def vtab_sf(sf_small, tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("hostile_vtab")
    con = duckdb.connect()
    # precondition (r16 ADVICE): doc 910002 is doc 1's text with
    # spaces swapped for \x0B — the collision test below is vacuous
    # (twin == original) unless doc 1 exists and contains a space.
    # Fail HERE with a clear message if testdata regeneration breaks
    # that, not downstream with a confusing fingerprint assertion.
    pre = con.execute(
        f"SELECT text FROM '{sf_small}/documents.parquet' WHERE doc_id = 1"
    ).fetchall()
    assert len(pre) == 1 and pre[0][0] and " " in pre[0][0], (
        "vtab fixture precondition: sf_small doc_id 1 must exist and "
        "contain at least one space (doc 910002 is built as its "
        "\\x0B-for-space twin)"
    )
    con.execute(
        f"""
        COPY (
          SELECT * FROM '{sf_small}/documents.parquet'
          UNION ALL SELECT 910001,
            'alpha' || chr(11) || 'beta gamma' || chr(11) ||
            'delta epsilon zeta eta theta',
            'en', 'web', 40
          UNION ALL SELECT 910002,
            (SELECT replace(text, ' ', chr(11))
             FROM '{sf_small}/documents.parquet' WHERE doc_id = 1),
            'en', 'web', 40
        ) TO '{d}/documents.parquet' (FORMAT PARQUET)
        """
    )
    for t in _COPY:
        shutil.copy(f"{sf_small}/{t}.parquet", str(d / f"{t}.parquet"))
    return str(d)


def _oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in _COPY + ["documents"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.execute(sql).df()


def _canon(df):
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    return sorted(
        [
            tuple(
                None if (isinstance(v, float) and math.isnan(v)) else v
                for v in r
            )
            for r in df.itertuples(index=False)
        ],
        key=str,
    )


@pytest.mark.parametrize("name", _ROBUST)
def test_vtab_stays_oracle_green(spark, vtab_sf, name):
    import __spark_entry__ as e

    sdf = e.queries()[name](spark, vtab_sf).toPandas()
    odf = _oracle(e.oracle_sql()[name], vtab_sf)
    assert len(sdf) == len(odf), (name, len(sdf), len(odf))
    assert _canon(sdf) == _canon(odf), name


@pytest.mark.parametrize("name", _KNOWN_MISMATCH)
def test_vtab_known_mismatch_is_pinned(spark, vtab_sf, name):
    """EMPTY since r17 — the loud landing spot: a query listed here is
    asserted to DISAGREE with its oracle on \\x0B text, so a pinned
    divergence can neither be forgotten (this fails when fixed) nor
    silently regress (the sweep axis catches new mismatches)."""
    import __spark_entry__ as e

    sdf = e.queries()[name](spark, vtab_sf).toPandas()
    odf = _oracle(e.oracle_sql()[name], vtab_sf)
    assert len(sdf) != len(odf) or _canon(sdf) != _canon(odf), (
        f"{name} now agrees on vertical-tab text — move it to _ROBUST"
    )


def test_fingerprint_vtab_collision_is_real(spark, vtab_sf):
    """The \\x0B-vs-space twin (doc 910002) must fingerprint IDENTICAL
    to doc 1 on BOTH engines? No — the OPPOSITE: \\x0B is NOT
    whitespace under WS_CLASS, so the twin does NOT collapse to doc
    1's fingerprint (the old Java-\\s+ Spark side would have collapsed
    it while the oracle did not — the exact silent-wrong-answer shape
    the r16 flip closed). Assert both engines agree the twin is a
    DISTINCT fingerprint."""
    import __spark_entry__ as e

    sdf = e.queries()["text_fingerprint"](spark, vtab_sf).toPandas()
    by_id = dict(zip(sdf["doc_id"], sdf["fingerprint"]))
    assert by_id[910002] != by_id[1]
    odf = _oracle(e.oracle_sql()["text_fingerprint"], vtab_sf)
    oby = dict(zip(odf["doc_id"], odf["fingerprint"]))
    assert oby[910002] != oby[1]
    assert by_id[910002] == oby[910002]
