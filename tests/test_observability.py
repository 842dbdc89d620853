"""End-to-end `run_sales_pipeline` (reference main.py:184-224 flow) +
observe()-based row-count metrics (reference etl_utils.py:10-31 logging,
'filas=%d' call sites main.py:99,146,174).

The CSV folder reproduces tests/test_sales_pipeline.py's fixture row
classes, partitioned into files by audit date the way the reference's
input folder is (etl_utils.py:183-190), so the whole S1 -> Q1/Q2/Q3 ->
Q4 -> S3 chain runs: expected counts are the ones the semantic tests
already pin (valid=5, invalid N=3/A=2/D=2, summary=5).
"""

from __future__ import annotations

import logging

import pandas as pd
import pytest

from etl_sales_pandas_sqlserver_spark.observability import (
    PipelineObserver,
    category_counts,
)
from etl_sales_pandas_sqlserver_spark.plans.pipeline import run_sales_pipeline
from pyspark.sql import functions as F

#: (Sale_ID, Product, Amount, Date) grouped into files by audit date --
#: same row classes as tests/test_sales_pipeline.py::FIXTURE
_FILES = {
    "2025-01-01.csv": [
        ("clean1", "KIT-A", "100.00 USD", "2024-01-05"),
        ("nullamt", "KIT-B", "", "2024-01-06"),
        ("nulldate", "KIT-C", "5.00 USD", ""),
        ("nulldate", "KIT-C", "5.00 USD", ""),
        ("nullprod", "", "549.48", "2024-02-01"),
        ("dupkey", "KIT-E", "10.00 USD", "2024-04-01"),
    ],
    "2025-02-01.csv": [
        ("overlap", "KIT-D", "224.12", "2024-03-01"),
        ("dupkey", "KIT-E", "20.00 USD", "2024-04-02"),
    ],
    "2025-03-01.csv": [
        ("eurtie", "KIT-F", "16577.10 EUR", "2024-05-01"),
        ("padded", "  kit-g  ", "30.00 USD", "2024-06-01"),
        ("baddate", "KIT-H", "40.00 USD", "not-a-date"),
    ],
}


@pytest.fixture(scope="module")
def pipeline_result(spark, tmp_path_factory):
    indir = tmp_path_factory.mktemp("sales_csv_in")
    outdir = tmp_path_factory.mktemp("sales_csv_out")
    for name, rows in _FILES.items():
        body = "Sale_ID,Product,Amount,Date\n" + "".join(
            ",".join(f'"{v}"' if "," in v else v for v in row) + "\n" for row in rows
        )
        (indir / name).write_text(body, encoding="utf-8")
    return run_sales_pipeline(spark, str(indir), str(outdir))


def test_pipeline_metrics_match_known_counts(pipeline_result):
    m = pipeline_result["metrics"]
    assert m["input"]["rows"] == 11
    assert m["valid"]["rows"] == 5
    assert m["invalid"]["rows"] == 7
    assert m["invalid"]["reason_n"] == 3
    assert m["invalid"]["reason_a"] == 2
    assert m["invalid"]["reason_d"] == 2
    assert m["summary"]["rows"] == 5


def test_pipeline_csv_outputs(pipeline_result):
    outs = pipeline_result["outputs"]
    # utf-8-sig parity with Resultados/*.csv (etl_utils.py:125)
    valid = pd.read_csv(outs["Ventas_Validas_M"], encoding="utf-8-sig")
    invalid = pd.read_csv(outs["Ventas_Invalidas_M"], encoding="utf-8-sig")
    summary = pd.read_csv(outs["Ventas_Resumen_Mensual"], encoding="utf-8-sig")
    assert len(valid) == 5 and len(invalid) == 7 and len(summary) == 5
    assert set(invalid["Reason"]) == {"N", "A", "D"}
    # dates are sink-formatted strings (Q4, main.py:201-210)
    assert valid["Date"].str.match(r"\d{4}-\d{2}-\d{2}").all()
    # BOM actually present on disk
    with open(outs["Ventas_Validas_M"], "rb") as fh:
        assert fh.read(3) == b"\xef\xbb\xbf"


def test_pipeline_logs_filas_lines(spark, tmp_path):
    """log_metrics emits the reference's 'filas=%d' shape per stage."""
    records: list[str] = []

    class _Capture(logging.Handler):
        def emit(self, record: logging.LogRecord) -> None:
            records.append(record.getMessage())

    logger = logging.getLogger("etl_sales_spark")
    handler = _Capture()
    logger.addHandler(handler)
    logger.setLevel(logging.INFO)
    try:
        obs = PipelineObserver()
        df = obs.observe_rows(
            spark.createDataFrame(
                [("x", "N"), ("y", "A")], ["id", "Reason"]
            ),
            "demo",
            *category_counts("Reason", ("N", "A", "D")),
        )
        df.write.format("noop").mode("overwrite").save()
        obs.log_metrics(logger)
    finally:
        logger.removeHandler(handler)
    assert any("demo: filas=2" in r and "reason_n=1" in r for r in records)


def test_observer_rejects_duplicate_stage(spark):
    obs = PipelineObserver()
    df = spark.range(3)
    obs.observe_rows(df, "stage")
    with pytest.raises(ValueError, match="already observed"):
        obs.observe_rows(df, "stage")


def test_observation_counts_sink_rows_not_plan_rows(spark):
    """The observed count is what the sink consumed -- a downstream
    filter after the observation point does not change it."""
    obs = PipelineObserver()
    base = obs.observe_rows(spark.range(100), "all")
    base.filter(F.col("id") < 10).write.format("noop").mode("overwrite").save()
    assert obs.metrics()["all"]["rows"] == 100
