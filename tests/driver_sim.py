"""Driver-contract simulation (the verify recipe): run every
``queries()`` entry against its ``oracle_sql()`` twin via DuckDB at
sf0.01 under a PLAIN default Spark session (ANSI on, 200 shuffle
partitions) -- the driver's conditions, not the engine's tuned session.

Usage: python tests/driver_sim.py [--only name1,name2] [--first N]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canon(df):
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None, help="comma-separated query names")
    ap.add_argument("--first", type=int, default=None, help="first N in registration order")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    print("entry rows:", len(e.entry(spark).collect()), flush=True)

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    q, o = e.queries(), e.oracle_sql()
    names = list(q)
    if args.only:
        names = [n for n in args.only.split(",") if n in q]
    if args.first:
        names = names[: args.first]
    fails = []
    for name in names:
        t0 = time.perf_counter()
        try:
            sdf = q[name](spark, args.sf).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"{name} ERROR {type(exc).__name__}: {exc}", flush=True)
            fails.append(name)
            continue
        dt = time.perf_counter() - t0
        if name not in o:
            print(f"{name} rows-only {len(sdf)} ({dt:.1f}s)", flush=True)
            continue
        odf = con.execute(o[name]).df()
        ok = (
            len(sdf) == len(odf)
            and sorted(c.lower() for c in sdf.columns)
            == sorted(c.lower() for c in odf.columns)
            and canon(sdf) == canon(odf)
        )
        print(f"{name} {ok} ({dt:.1f}s)", flush=True)
        if not ok:
            fails.append(name)
    print("FAILURES:", fails or "none", flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
