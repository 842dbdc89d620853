"""Curation funnel audit (functions/funnel.py) invariants the driver
hash-compare can't pin from the stock testdata:

- the duplicated spellings (fingerprint key, token-length gate) must
  stay identical to their owning modules (the tokcount lesson);
- FIRST-FAIL attribution priority: a document that is both a duplicate
  and too short must land in ``exact_dup`` — both engines share the
  CASE order, so only a semantic pin catches a reordering;
- the funnel must telescope (docs_in chains by n_docs) and its ``kept``
  row must equal the census total of ``corpus_curation_pipeline`` — the
  audit and the pipeline it audits can never disagree.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F


def _normalize(sql: str) -> str:
    return re.sub(r"\s+", " ", sql).strip()


def test_fingerprint_spelling_matches_textstats():
    from etl_sales_pandas_sqlserver_spark.functions.funnel import _STAGED_CTE
    from etl_sales_pandas_sqlserver_spark.functions.textstats import (
        FINGERPRINT_SQL,
    )

    # hardcoded on purpose: the pin must not follow tokcount.WS_CLASS
    # automatically, or a WS_CLASS edit could silently move every
    # spelling at once without this test noticing the grain changed
    key = "md5(lower(trim(regexp_replace(text, '[ \\t\\n\\f\\r]+', ' ', 'g'))))"
    assert key in _normalize(FINGERPRINT_SQL)
    assert key in _normalize(_STAGED_CTE)


def test_token_gate_shared_with_capstone():
    """The SQL embeds traindata._MIN_TOKENS via f-string, so the gate
    is structurally shared; pin the rendered form anyway so a move to
    a literal would fail loudly."""
    from etl_sales_pandas_sqlserver_spark.functions.funnel import (
        FUNNEL_STAGES_SQL,
    )
    from etl_sales_pandas_sqlserver_spark.functions.traindata import (
        _MIN_TOKENS,
    )

    assert (
        f"WHEN r.n_tok IS NULL OR r.n_tok < {_MIN_TOKENS} THEN 2"
        in _normalize(FUNNEL_STAGES_SQL)
    )


@pytest.fixture(scope="module")
def staged_corpus(tmp_path_factory) -> str:
    """Seven docs with a known stage each, exercising the first-fail
    priority: doc 21 is BOTH a duplicate and too short (dup wins),
    doc 3 text-equals eval doc 10 (jaccard 1.0 -> contaminated)."""
    docs = [
        # (doc_id, text, expected stage)
        (10, "shared eval text one two three", "eval_holdout"),
        (1, "dup text here alpha beta gamma", "kept_first"),  # rn == 1
        (11, "dup text here alpha beta gamma", "exact_dup"),
        (2, "tiny doc", "too_short"),
        (21, "tiny doc", "exact_dup"),  # dup AND short: dup wins
        (3, "shared eval text one two three", "contaminated"),
        (4, "perfectly fine unique document with many tokens", "kept"),
    ]
    d = tmp_path_factory.mktemp("funnel_sf")
    tbl = pa.table(
        {
            "doc_id": pa.array([i for i, _, _ in docs], pa.int64()),
            "text": pa.array([t for _, t, _ in docs], pa.string()),
            "lang": pa.array(["en"] * len(docs), pa.string()),
            "source": pa.array(
                ["src_a" if i % 2 else "src_b" for i, _, _ in docs],
                pa.string(),
            ),
            "n_chars": pa.array([len(t) for _, t, _ in docs], pa.int64()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


def test_first_fail_attribution_and_telescoping(spark, staged_corpus):
    from etl_sales_pandas_sqlserver_spark.functions.funnel import (
        q_funnel_stages,
    )

    rows = {
        r.stage: r for r in q_funnel_stages(spark, staged_corpus).collect()
    }
    assert rows["eval_holdout"].n_docs == 1
    assert rows["exact_dup"].n_docs == 2  # docs 11 and 21 (priority)
    assert rows["too_short"].n_docs == 1  # doc 2 only
    assert rows["contaminated"].n_docs == 1  # doc 3
    assert rows["kept"].n_docs == 2  # docs 1 and 4

    # telescoping: docs_in chains by n_docs in stage order, starting
    # at the full corpus and ending with kept == its own docs_in
    ordered = sorted(rows.values(), key=lambda r: r.stage_order)
    assert ordered[0].docs_in == 7
    for prev, cur in zip(ordered, ordered[1:]):
        assert cur.docs_in == prev.docs_in - prev.n_docs
    assert ordered[-1].stage == "kept"
    assert ordered[-1].docs_in == ordered[-1].n_docs
    assert ordered[-1].ppm_of_in == 1_000_000


def test_kept_equals_capstone_census(spark, sf_small):
    """The funnel's ``kept`` totals must equal the final census of
    corpus_curation_pipeline on the same corpus — identical survivor
    set by construction, pinned end-to-end."""
    from etl_sales_pandas_sqlserver_spark.functions.funnel import (
        q_funnel_stages,
    )
    from etl_sales_pandas_sqlserver_spark.functions.traindata import (
        q_corpus_curation,
    )

    kept = (
        q_funnel_stages(spark, sf_small)
        .filter(F.col("stage") == "kept")
        .collect()[0]
    )
    census = q_corpus_curation(spark, sf_small).agg(
        F.sum("n_docs").alias("n")
    ).collect()[0]
    assert kept.n_docs == census.n


def test_kept_equals_capstone_census_with_null_text(spark, tmp_path):
    """The never-disagree invariant on a NULL-TEXT corpus (r14 ADVICE
    fix): a null-text doc has NULL n_tok, and before the null-absorbing
    too_short arm it was attributed 'kept' while the capstone pipeline
    dropped it at the token gate. The first null-text doc (keep-first
    of the shared NULL fingerprint group) must land in too_short, the
    rest in exact_dup, and 'kept' must still equal the pipeline
    census."""
    from etl_sales_pandas_sqlserver_spark.functions.funnel import (
        q_funnel_stages,
    )
    from etl_sales_pandas_sqlserver_spark.functions.traindata import (
        q_corpus_curation,
    )

    long = "alpha beta gamma delta epsilon zeta"
    docs = [
        (1, long + " one"),
        (2, None),            # null text, keep-first -> too_short
        (3, long + " three"),
        (4, None),            # null text, dup of 2 -> exact_dup
        (10, long + " eval"),  # eval holdout
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([i for i, _ in docs], pa.int64()),
            "text": pa.array([t for _, t in docs], pa.string()),
            "lang": pa.array(["en"] * len(docs), pa.string()),
            "source": pa.array(["s"] * len(docs), pa.string()),
            "n_chars": pa.array(
                [len(t) if t else 0 for _, t in docs], pa.int64()
            ),
        }
    )
    d = tmp_path / "nulltext"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))

    rows = {r.stage: r for r in q_funnel_stages(spark, str(d)).collect()}
    assert rows["too_short"].n_docs == 1
    assert rows["exact_dup"].n_docs == 1
    kept = rows["kept"]
    census = (
        q_corpus_curation(spark, str(d))
        .agg(F.sum("n_docs").alias("n"))
        .collect()[0]
    )
    assert kept.n_docs == census.n == 2


def test_vertical_tab_token_grain_agrees(spark, tmp_path):
    """r16: the traindata curation gate respelled to tokcount.WS_CLASS,
    so the funnel audit and the capstone pipeline share ONE token
    definition even on vertical-tab text — the r15 desync pin flips to
    agreement (this test's previous incarnation asserted kept != census
    on exactly this corpus while the gate still split on Java ``\\s+``).
    Both now see 4 tokens in the \\x0B doc (< _MIN_TOKENS): funnel says
    too_short AND the capstone gate drops it, kept == census == 1.
    The per-stage gate count (4, not 8) is asserted explicitly so a
    partial respell (one of the two grains flipping back) fails on the
    number, not just the equality (r15 ADVICE)."""
    from etl_sales_pandas_sqlserver_spark.functions.funnel import (
        q_funnel_stages,
    )
    from etl_sales_pandas_sqlserver_spark.functions.traindata import (
        q_corpus_curation,
    )

    long = "alpha beta gamma delta epsilon zeta"
    vt = "a\x0bb c\x0bd e\x0bf g\x0bh"  # 4 WS_CLASS tokens, 8 \s+ tokens
    docs = [(1, long + " one"), (2, vt), (10, long + " eval")]
    tbl = pa.table(
        {
            "doc_id": pa.array([i for i, _ in docs], pa.int64()),
            "text": pa.array([t for _, t in docs], pa.string()),
            "lang": pa.array(["en"] * len(docs), pa.string()),
            "source": pa.array(["s"] * len(docs), pa.string()),
            "n_chars": pa.array([len(t) for _, t in docs], pa.int64()),
        }
    )
    d = tmp_path / "vtab"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))

    rows = {r.stage: r for r in q_funnel_stages(spark, str(d)).collect()}
    census = (
        q_corpus_curation(spark, str(d))
        .agg(F.sum("n_docs").alias("n"))
        .collect()[0]
    )
    # both grains: vt doc has 4 tokens (\x0B is NOT a separator),
    # 4 < _MIN_TOKENS -> funnel too_short AND capstone-dropped
    assert rows["too_short"].n_docs == 1
    assert rows["kept"].n_docs == 1
    assert census.n == 1, (
        "kept != census on a vertical-tab doc: the funnel audit and "
        "the traindata curation gate no longer share one token grain"
    )
    # the gate's own token count for the vt doc must be 4 on the
    # WS_CLASS grain (8 would mean a Java-\s+ site crept back in)
    from etl_sales_pandas_sqlserver_spark.functions.tokcount import (
        n_tokens_spark,
    )

    n_vt = (
        spark.read.parquet(str(d / "documents.parquet"))
        .filter(F.col("doc_id") == 2)
        .select(n_tokens_spark().alias("n"))
        .collect()[0]
        .n
    )
    assert n_vt == 4


def test_null_doc_id_vanishes_identically_on_both_engines(
    spark, tmp_path
):
    """A null ``doc_id`` fails BOTH residue filters (``% 10`` is null),
    so the document is attributed to no stage at all — on both engines
    (the dedup/decontaminate families share this property, it is the
    %-filter idiom's semantics). Pin it cross-engine so a refactor to
    null-keeping filters cannot drift one side silently."""
    import duckdb

    from etl_sales_pandas_sqlserver_spark.functions.funnel import (
        FUNNEL_STAGES_SQL,
        q_funnel_stages,
    )

    tbl = pa.table(
        {
            "doc_id": pa.array([1, None, 4], pa.int64()),
            "text": pa.array(
                ["one two three four five"] * 3, pa.string()
            ),
            "lang": pa.array(["en"] * 3, pa.string()),
            "source": pa.array(["s"] * 3, pa.string()),
            "n_chars": pa.array([23] * 3, pa.int64()),
        }
    )
    d = tmp_path / "nullid"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))

    got = q_funnel_stages(spark, str(d)).collect()
    # the three texts are identical: doc 1 keeps first, doc 4 is the
    # dup, the null-id doc is in neither count
    assert sum(r.n_docs for r in got) == 2

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM '{d / 'documents.parquet'}'"
    )
    odf = con.execute(FUNNEL_STAGES_SQL).df()
    assert int(odf["n_docs"].sum()) == 2
    assert {r.stage: r.n_docs for r in got} == dict(
        zip(odf["stage"], odf["n_docs"].astype(int))
    )


def test_keep_first_plans_no_window_before_stage_agg(spark, sf_small):
    """The skew-immunity pin: dup attribution must plan as an
    aggregate + join, NEVER a per-fingerprint window (AQE can split a
    hot join partition but not a window partition, and a boilerplate
    fingerprint with millions of copies is a realistic hot key). The
    only Window allowed in the stages plan is the docs-entering
    arithmetic, which must sit on the single-partition exchange fed by
    the bounded 5-value stage aggregate."""
    from etl_sales_pandas_sqlserver_spark.functions.funnel import (
        q_funnel_by_source,
        q_funnel_stages,
    )

    by_source = q_funnel_by_source(spark, sf_small)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Window" not in by_source, (
        "keep-first regressed to a window form"
    )

    # Semantic pins, not adjacent-line plan text (r14 ADVICE fix:
    # layout/indentation/AQE-reuse nodes shift across Spark versions):
    # exactly one single-partition exchange (the bounded docs-entering
    # funnel), and every Window node must sit ABOVE it — i.e. the only
    # windows run on the <= 5-row post-exchange frame, never on the
    # corpus below the stage aggregate.
    stages = q_funnel_stages(spark, sf_small)._jdf.queryExecution(
    ).executedPlan().toString()
    lines = stages.splitlines()
    sp = [i for i, ln in enumerate(lines) if "Exchange SinglePartition" in ln]
    assert len(sp) == 1, "extra global funnel appeared"
    # plan prints children BELOW parents: anything after the exchange
    # line is the pre-exchange (unbounded-corpus) subtree
    below = "\n".join(lines[sp[0] + 1:])
    assert "Window" not in below, (
        "a Window regressed below the bounded stage aggregate"
    )
    assert "HashAggregate" in below, (
        "the stage aggregate vanished from the exchange's subtree"
    )


def test_by_source_sums_to_global(spark, sf_small):
    from etl_sales_pandas_sqlserver_spark.functions.funnel import (
        q_funnel_by_source,
        q_funnel_stages,
    )

    g = {
        (r.stage_order, r.stage): (r.n_docs, r.tokens)
        for r in q_funnel_stages(spark, sf_small).collect()
    }
    s = (
        q_funnel_by_source(spark, sf_small)
        .groupBy("stage_order", "stage")
        .agg(F.sum("n_docs").alias("n"), F.sum("tokens").alias("t"))
        .collect()
    )
    assert {(r.stage_order, r.stage): (r.n, r.t) for r in s} == g
