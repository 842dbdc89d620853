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
