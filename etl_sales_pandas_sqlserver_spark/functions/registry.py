"""Registry of training-data-pipeline queries, merged into the
driver-contract QUERIES dict by plans/testdata_queries.py.

Each module contributes ``{name: (spark_fn, oracle_sql | None)}``;
``None`` marks genuinely non-SQL-expressible ops (approximate ANN,
stateful streaming) where the driver records a rows-only check.
"""

from __future__ import annotations

from .textstats import TEXT_QUERIES

FUNCTION_QUERIES = {}
FUNCTION_QUERIES.update(TEXT_QUERIES)

for _mod_queries in ("dedup", "similarity", "multimodal"):
    try:
        import importlib

        _m = importlib.import_module(f".{_mod_queries}", __package__)
        FUNCTION_QUERIES.update(getattr(_m, "QUERIES_EXPORT"))
    except (ImportError, AttributeError):
        pass
