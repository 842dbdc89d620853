"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference ETL pipeline
(AlvaroFS99/etl-sales-pandas-sqlserver), re-expressed Spark-first.

Layout
------
- ``session``    SparkSession builder tuned for local + cluster use.
- ``schemas``    Declared StructTypes (no schema inference in engine paths).
- ``sources``    Scans (folder-CSV with filename-derived audit date, single
                 CSV, parquet testdata) and sinks (CSV, JDBC/SQL Server).
- ``operators``  The reference's operator inventory (SURVEY.md section 2) as
                 composable Column/DataFrame combinators.
- ``plans``      Composite pipelines Q1-Q4 (clean valid sales, categorize
                 invalid sales, monthly summary, date formatting).
- ``functions``  Large-scale training-data-pipeline extensions: text
                 analysis, dedup (exact / MinHash-LSH / SimHash / n-gram
                 Jaccard), embedding similarity search, multimodal columns.
- ``streaming``  Structured Streaming operators over the events stream.

Everything is lazy DataFrame-in / DataFrame-out: pipelines compose with
``df.transform(f)`` so Catalyst sees one fused plan per sink instead of the
reference's ~20 eager materializations (reference main.py:53-179).
"""

__version__ = "0.1.0"
