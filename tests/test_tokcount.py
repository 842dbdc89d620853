"""Direct parity pin for the shared token-count spelling: the Spark
column and the DuckDB fragment (functions/tokcount.py) must agree on
every whitespace shape — multiple spaces, tabs, newlines, unicode,
empty and whitespace-only strings (both engines count 1 there: the
regex split of an empty trim result yields one empty element). The
hostile-docs suite exercises this through whole queries; this test
pins the fragment itself so a future respelling cannot drift silently.
"""

from __future__ import annotations

import duckdb

from etl_sales_pandas_sqlserver_spark.functions.tokcount import (
    N_TOKENS_SQL,
    n_tokens_spark,
)

_CASES = [
    "one",
    "two words",
    "  leading and trailing  ",
    "tabs\tand\nnewlines\r\nmixed",
    "many     internal      spaces",
    "",
    "   ",
    "\t\n",
    "ünïcödé wörds  ここ に",
    "emoji 🙂 counts  as a token",
    "a",
]


def test_spark_and_duckdb_token_counts_agree(spark):
    sdf = spark.createDataFrame([(t,) for t in _CASES], ["text"])
    got = [
        r.n for r in sdf.select(n_tokens_spark().alias("n")).collect()
    ]
    con = duckdb.connect()
    want = [
        con.execute(
            f"SELECT CAST({N_TOKENS_SQL} AS BIGINT) FROM (SELECT ? AS text)",
            [t],
        ).fetchone()[0]
        for t in _CASES
    ]
    con.close()
    assert got == want, list(zip(_CASES, got, want))


def test_vertical_tab_agrees_after_the_r14_respell(spark):
    """Flipped r14: the token grain splits on the explicit class
    (tokcount.WS_CLASS) now, so U+000B — formerly the one whitespace
    shape the engines disagreed on (Java \\s includes it, RE2 \\s does
    not) — counts IDENTICALLY: one token on both engines (\\x0B is not
    a separator under the class). If this ever fails, one engine's
    character-class semantics drifted."""
    text = "a\x0bb"
    sdf = spark.createDataFrame([(text,)], ["text"])
    spark_n = sdf.select(n_tokens_spark().alias("n")).collect()[0].n
    con = duckdb.connect()
    duck_n = con.execute(
        f"SELECT CAST({N_TOKENS_SQL} AS BIGINT) FROM (SELECT ? AS text)",
        [text],
    ).fetchone()[0]
    con.close()
    assert spark_n == 1 == duck_n


def test_testdata_contains_no_vertical_tab():
    """STOOD DOWN to a data-freshness check (r17): with the
    _TOKEN_SPLIT family flipped onto WS_CLASS, the package has ZERO
    ``\\s`` token sites left, so no query diverges on U+000B anymore
    (the hostile vtab axis proves it corpus-wide). The check remains
    because \\x0B-free driver data is the documented precondition the
    vtab poison corpus (tests/test_hostile_docs_vtab.py,
    tools/hostile_sweep.py documents_vtab) is built against: if the
    driver ever regenerates testdata WITH vertical tabs, the hostile
    axis' green/mismatch classification needs re-deriving, and this
    fires with a clear message instead."""
    import os

    for sf in ("0.001", "0.01", "0.1"):
        path = f"/root/testdata/sf{sf}/documents.parquet"
        if not os.path.exists(path):
            continue
        n = duckdb.sql(
            "SELECT count(*) FROM read_parquet(?) "
            "WHERE text LIKE '%' || chr(11) || '%'",
            params=[path],
        ).fetchone()[0]
        assert n == 0, f"sf{sf}: {n} docs contain U+000B"


def test_all_consumers_bind_the_single_spelling():
    """The r13 hoist's invariant, pinned: batching and dataset_cards
    (and the families that always did) bind tokcount's objects, not
    copies — reintroducing a private duplicate fails here before it
    can drift."""
    from etl_sales_pandas_sqlserver_spark.functions import (
        batching,
        budget,
        curriculum,
        dataset_cards,
        release,
        sharding,
        tokcount,
    )

    assert batching._N_TOKENS_SQL is tokcount.N_TOKENS_SQL
    assert batching._n_tokens_col is tokcount.n_tokens_spark
    assert dataset_cards._N_TOKENS_SQL is tokcount.N_TOKENS_SQL
    assert dataset_cards._n_tokens_col is tokcount.n_tokens_spark
    assert budget._N_TOKENS_SQL is tokcount.N_TOKENS_SQL
    assert release._N_TOKENS_SQL is tokcount.N_TOKENS_SQL
    assert sharding.N_TOKENS_SQL is tokcount.N_TOKENS_SQL
    assert curriculum.N_TOKENS_SQL is tokcount.N_TOKENS_SQL


def test_token_split_grain_is_pinned_hardcoded():
    """r17: textstats._TOKEN_SPLIT IS WS_CLASS now (the last \\s+
    family's respell). Hardcoded on purpose, same rationale as the
    fingerprint spelling pin in test_funnel: the pin must not follow
    tokcount.WS_CLASS automatically, or a WS_CLASS edit could silently
    move every token spelling at once without any test noticing the
    grain changed."""
    from etl_sales_pandas_sqlserver_spark.functions import (
        textstats,
        tokcount,
    )

    assert textstats._TOKEN_SPLIT is tokcount.WS_CLASS
    assert tokcount.WS_CLASS == "[ \\t\\n\\f\\r]+"
