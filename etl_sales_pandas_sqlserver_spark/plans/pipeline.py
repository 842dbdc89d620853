"""The reference's full ETL run as one engine entry point.

``python main.py`` in the reference (main.py:184-224) does: load the
CSV folder -> three transforms (valid / invalid / monthly summary) ->
format dates -> write each table to SQL Server and to a CSV file,
logging row counts along the way. :func:`run_sales_pipeline` is that
flow Spark-first:

- ONE distributed folder scan (sources.csv_folder.read_sales_folder),
  cached because three independent sinks consume it (SURVEY.md
  section 4.1 -- plan reuse across actions is not automatic);
- the three composite transforms stay lazy until their sink write, so
  each output executes as a single fused plan;
- row counts come from ``df.observe()`` accumulators collected during
  the sink writes themselves (observability.PipelineObserver) -- the
  reference's 'filas=%d' logging (main.py:99,146,174) with zero extra
  jobs;
- sinks: single-file BOM CSVs like Resultados/*.csv (small, human
  facing -- the scale path writes partitioned directories), optional
  JDBC loads mirroring the reference's replace-mode to_sql loop
  (main.py:215-217).
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import SparkSession

from ..observability import PipelineObserver, category_counts, configure_logging
from ..sources.csv_folder import read_sales_folder
from ..sources.sinks import write_jdbc, write_single_csv
from .sales_etl import (
    categorize_invalid_sales,
    clean_valid_sales,
    format_dates_for_sink,
    monthly_summary,
)

#: output table names, exactly the reference's (main.py:192-196)
VALID_NAME = "Ventas_Validas_M"
INVALID_NAME = "Ventas_Invalidas_M"
SUMMARY_NAME = "Ventas_Resumen_Mensual"


def run_sales_pipeline(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    *,
    with_bom: bool = True,
    nan_literal: bool = True,
    jdbc: dict[str, Any] | None = None,
    logfile: str | None = None,
) -> dict[str, Any]:
    """Run the end-to-end sales ETL (reference main.py:184-224).

    Returns ``{"outputs": {name: csv_path}, "metrics": {stage: {...}}}``
    where metrics carry sink-time row counts (input / valid / invalid
    with per-Reason splits / summary) collected by ``observe()``.

    ``jdbc``: optional ``{"url": ..., "mode": "overwrite"|"append",
    "options": {...}}`` -- when given, each table is ALSO loaded over
    JDBC under its reference name, mirroring the to_sql loop
    (main.py:215-217; etl_utils.py:134-160).
    """
    logger = configure_logging(logfile)
    obs = PipelineObserver()

    raw = read_sales_folder(spark, input_dir)
    raw = obs.observe_rows(raw, "input").cache()

    valid = obs.observe_rows(clean_valid_sales(raw), "valid")
    invalid = obs.observe_rows(
        categorize_invalid_sales(raw, nan_literal=nan_literal),
        "invalid",
        *category_counts("Reason", ("N", "A", "D")),
    )
    summary = obs.observe_rows(monthly_summary(valid), "summary")

    os.makedirs(output_dir, exist_ok=True)
    tables = [(VALID_NAME, valid), (INVALID_NAME, invalid), (SUMMARY_NAME, summary)]
    outputs: dict[str, str] = {}
    for name, df in tables:
        formatted = format_dates_for_sink(df)
        if jdbc is not None:
            write_jdbc(
                formatted,
                jdbc["url"],
                name,
                mode=jdbc.get("mode", "overwrite"),
                options=jdbc.get("options"),
            )
        outputs[name] = write_single_csv(
            formatted, os.path.join(output_dir, f"{name}.csv"), with_bom=with_bom
        )

    obs.log_metrics(logger)
    raw.unpersist()
    return {"outputs": outputs, "metrics": obs.metrics()}
