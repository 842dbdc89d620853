"""Layer-A parity against the reference's COMMITTED golden outputs
(`/root/reference/Resultados/*.csv` -- one full materialized run,
SURVEY.md section 5.1). The raw inputs are .gitignore'd in the
reference, but:

- the golden VALID table is Q1's fixed point (already-cleaned rows pass
  through unchanged), so `clean_valid_sales(golden_valid)` must return
  it verbatim;
- Q3 consumes Q1's output, so `monthly_summary(golden_valid)` must
  reproduce the golden SUMMARY exactly (including the lexicographic
  (Mes, Producto) sort);
- the golden INVALID table carries the ORIGINAL row values (post
  ID/Product normalization), and re-categorizing exactly that subset is
  closed under the N>A>D tier rules (every member of a currency-valid
  dup group is itself invalid), so `categorize_invalid_sales` over the
  reconstructed input must reassign every Reason identically.

Also pinned: the Reason histogram 59/82/43, the valid/invalid OVERLAP
membership (PN2DKE4C, SURVEY.md section 1.5), and row counts 192/184/167.
"""

from __future__ import annotations

import math
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_sales_pandas_sqlserver_spark.plans import sales_etl

GOLDEN_DIR = "/root/reference/Resultados"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GOLDEN_DIR), reason="reference goldens not present"
)


def _golden(name: str) -> pd.DataFrame:
    return pd.read_csv(
        os.path.join(GOLDEN_DIR, name), encoding="utf-8-sig", dtype=str
    )


@pytest.fixture(scope="module")
def g_valid() -> pd.DataFrame:
    return _golden("Ventas_Validas_M.csv")


@pytest.fixture(scope="module")
def g_invalid() -> pd.DataFrame:
    return _golden("Ventas_Invalidas_M.csv")


@pytest.fixture(scope="module")
def g_summary() -> pd.DataFrame:
    return _golden("Ventas_Resumen_Mensual.csv")


def test_golden_row_counts(g_valid, g_invalid, g_summary):
    assert len(g_valid) == 192
    assert len(g_invalid) == 184
    assert len(g_summary) == 167


def test_golden_reason_histogram(g_invalid):
    assert g_invalid["Reason"].value_counts().to_dict() == {
        "A": 82,
        "N": 59,
        "D": 43,
    }


def test_golden_overlap_membership(g_valid, g_invalid):
    """SURVEY.md 1.5: valid and invalid are independent scans, not a
    partition -- PN2DKE4C is in valid AND (twice, duplicated input row)
    in invalid under Reason A."""
    v = g_valid[g_valid["Sale_ID"] == "PN2DKE4C"]
    assert len(v) == 1 and v.iloc[0]["Amount"] == "224.12"
    i = g_invalid[g_invalid["Sale_ID"] == "PN2DKE4C"]
    assert len(i) == 2 and set(i["Reason"]) == {"A"}


def _spark_df(spark, pdf: pd.DataFrame):
    cols = list(pdf.columns)
    schema = T.StructType([T.StructField(c, T.StringType()) for c in cols])
    data = [
        tuple(None if (isinstance(v, float) and math.isnan(v)) else v for v in row)
        for row in pdf.itertuples(index=False)
    ]
    return spark.createDataFrame(data, schema)


def test_clean_valid_is_identity_on_golden_valid(spark, g_valid):
    """Q1 over its own output changes nothing: all 192 rows survive
    with identical values (the golden valid table is Q1's fixed
    point)."""
    out = sales_etl.clean_valid_sales(_spark_df(spark, g_valid)).toPandas()
    assert len(out) == 192
    got = {
        (r.Sale_ID, r.Product, round(float(r.Amount), 2))
        for r in out.itertuples(index=False)
    }
    want = {
        (r.Sale_ID, r.Product, round(float(r.Amount), 2))
        for r in g_valid.itertuples(index=False)
    }
    assert got == want


def test_monthly_summary_reproduces_golden(spark, g_valid, g_summary):
    """Q3 on the golden valid table == the golden summary, row order
    included (lexicographic Mes/Producto, SURVEY.md A2)."""
    valid = _spark_df(spark, g_valid).select(
        "Sale_ID",
        "Product",
        F.col("Amount").cast("double").alias("Amount"),
        F.to_timestamp("Date").alias("Date"),
        F.to_timestamp("Audit_Date").alias("Audit_Date"),
    )
    out = sales_etl.monthly_summary(valid).toPandas()
    assert len(out) == len(g_summary) == 167
    for i, (got, want) in enumerate(
        zip(out.itertuples(index=False), g_summary.itertuples(index=False))
    ):
        assert got.Mes == want.Mes and got.Producto == want.Producto, i
        assert abs(got.Ventas_Totales - float(want.Ventas_Totales)) < 1e-6, i
        assert int(got.Numero_Transacciones) == int(want.Numero_Transacciones), i
        assert abs(got.Venta_Minima - float(want.Venta_Minima)) < 1e-6, i


def test_categorize_reproduces_golden_reasons(spark, g_invalid):
    """Q2 over the reconstructed invalid-side input reassigns every
    Reason identically (multiset compare over full rows). Sound because
    the invalid subset is closed under the tier rules: null checks and
    currency checks are per-row, and every member of a currency-valid
    duplicate group is itself in the invalid output."""
    recon = _spark_df(spark, g_invalid.drop(columns=["Reason"]))
    out = sales_etl.categorize_invalid_sales(recon).toPandas()
    key = ["Sale_ID", "Product", "Amount", "Date", "Audit_Date", "Reason"]

    def multiset(pdf: pd.DataFrame):
        rows = [
            tuple("" if (v is None or (isinstance(v, float) and math.isnan(v))) else v
                  for v in r)
            for r in pdf[key].itertuples(index=False)
        ]
        return sorted(rows)

    assert multiset(out) == multiset(g_invalid)
