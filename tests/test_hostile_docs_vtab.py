"""Hostile vertical-tab (U+000B) documents — the whitespace-grain axis.

U+000B is THE character the two engines' ``\\s`` disagree on (Java
includes it, RE2 does not; proven codepoint-exhaustively in
test_cross_engine_primitives). The r14-r16 respells moved every
fingerprint/token spelling they covered onto the explicit
``tokcount.WS_CLASS``, where both engines agree — this module pins the
r16 sweep classification of ``tools/hostile_sweep.py documents_vtab``
(poison: one doc with \\x0B inside words, one doc differing from an
existing doc ONLY by \\x0B-vs-space):

1. **180/186 green** — including the entire r16 fingerprint atomic
   group (exact dedup, fingerprints, curation pipeline + funnel audit,
   source dedup rate, dataset cards, corpus diff), the curation token
   gate, the repetition pair, ``_RE_TOKEN``, and the r14/r15 tokcount/
   bpe/array grains. A representative slice is parity-pinned below.
2. **Six queries mismatch** — the still-unflipped
   ``textstats._TOKEN_SPLIT`` family (Spark side splits Java ``\\s+``,
   counting \\x0B as a separator; the oracles' RE2 ``\\s+`` does not):
   ``text_token_stats``, ``text_quality_scores``,
   ``text_winnow_fingerprints``, ``text_docfreq_quality`` (textstats),
   ``oov_rate_by_source`` (batching imports the symbol; its SQL is a
   paired literal) and ``lang_sampling_weights_sqrt`` (source_stats,
   same shape). This is an ATOMIC set — the Spark sides share the one
   module constant — scheduled r17 with its owners' drain. When the
   respell lands, the expected-mismatch pin below FAILS loudly: flip
   the six into _ROBUST and empty _KNOWN_MISMATCH.
3. Latency guard: the no-\\x0B driver-testdata tripwire
   (test_tokcount) keeps the six invisible to the driver until r17.
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
]

#: the r17 atomic respell set — still split on Java \s+ Spark-side
_KNOWN_MISMATCH = [
    "text_token_stats",
    "text_quality_scores",
    "text_winnow_fingerprints",
    "text_docfreq_quality",
    "oov_rate_by_source",
    "lang_sampling_weights_sqrt",
]


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
def test_vtab_known_mismatch_until_r17(spark, vtab_sf, name):
    """The _TOKEN_SPLIT family still counts \\x0B as a separator
    Spark-side. A fix flips this loudly — move the query to _ROBUST
    (all six together: the set is atomic)."""
    import __spark_entry__ as e

    sdf = e.queries()[name](spark, vtab_sf).toPandas()
    odf = _oracle(e.oracle_sql()[name], vtab_sf)
    assert len(sdf) != len(odf) or _canon(sdf) != _canon(odf), (
        f"{name} now agrees on vertical-tab text — the _TOKEN_SPLIT "
        "respell landed; move the six-member set to _ROBUST"
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
