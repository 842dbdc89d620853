"""Structured Streaming surface over the ``events`` table.

The reference (AlvaroFS99/etl-sales-pandas-sqlserver) is pure batch --
nothing streams (SURVEY.md section 1.1) -- so this package is Layer B
scope: the streaming shapes a production event pipeline needs, each
runnable as a finite ``availableNow`` stream over the testdata parquet
so the driver can check results like any batch query.

- :mod:`queries` -- watermarked tumbling-window aggregation and
  arbitrary-stateful sessionization (``applyInPandasWithState``).
"""
