"""Invariants for the training-batch shaping family
(functions/batching.py). Driver-style oracle parity runs with the
rest of the registry in tests/test_oracle_parity.py; here the
structural properties a parity hash can't localize."""

from __future__ import annotations

from etl_sales_pandas_sqlserver_spark.functions.batching import (
    _CTX_SIZES,
    _MIN_BUCKET,
    _PPM,
    _VOCAB_K,
    q_oov_rate_by_source,
    q_packing_efficiency_curve,
    q_seq_bucket_padding_waste,
)


def test_seq_buckets_are_pow2_and_docs_fit(spark, sf_small):
    rows = q_seq_bucket_padding_waste(spark, sf_small).collect()
    assert rows
    n_docs_total = 0
    for r in rows:
        assert r.bucket_cap >= _MIN_BUCKET
        assert r.bucket_cap & (r.bucket_cap - 1) == 0, "cap must be 2^k"
        # every doc fits its cap and (if above the floor) overflows
        # the next smaller one: cap/2 < max_tokens <= cap implies
        # total_tokens <= n_docs * cap strictly when any padding exists
        assert r.total_tokens <= r.padded_tokens == r.n_docs * r.bucket_cap
        assert 0 <= r.waste_ppm < _PPM
        n_docs_total += r.n_docs
    assert n_docs_total > 0


def test_packing_curve_waste_decreases_with_smaller_ctx(spark, sf_small):
    rows = {r.ctx: r for r in q_packing_efficiency_curve(spark, sf_small).collect()}
    assert set(rows) == set(_CTX_SIZES)
    for ctx, r in rows.items():
        assert r.n_chunks >= r.n_docs, "every doc yields >= 1 chunk"
        assert r.padded_tokens == r.n_chunks * ctx
        assert 0 <= r.waste_ppm < _PPM
    # padded totals are monotone ONLY because _CTX_SIZES is a divisor
    # (doubling) chain: for C = k*c, ceil(n/C)*C >= ceil(n/c)*c per
    # doc. A non-divisor candidate (e.g. 384 after 256) can legally
    # DECREASE total padding — extend this assert only for chains.
    for small, big in zip(_CTX_SIZES, _CTX_SIZES[1:]):
        assert big % small == 0, "monotonicity proof needs a divisor chain"
        pad_small = rows[small].padded_tokens
        pad_big = rows[big].padded_tokens
        # identical token mass; bigger ctx can only add padding
        assert pad_small <= pad_big


def test_oov_rate_bounds_and_vocab_coverage(spark, sf_small):
    rows = q_oov_rate_by_source(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_oov <= r.n_tokens
        assert r.oov_ppm == r.n_oov * _PPM // r.n_tokens
    # the top-K vocab covers the corpus's most common tokens, so the
    # corpus-wide OOV share must be strictly below 100%
    total = sum(r.n_tokens for r in rows)
    oov = sum(r.n_oov for r in rows)
    assert oov < total
    assert _VOCAB_K > 0


def test_next_pow2_bit_math_matches_python(spark):
    """The engine's next-pow2 spelling (1 << length(bin(n-1))) must
    agree with Python's exact int.bit_length across the whole
    envelope: every power of two, its neighbors, and a coarse sweep.
    This is the cross-engine-exactness argument (no log2) verified
    against a third implementation."""
    from pyspark.sql import functions as F

    ns = sorted(
        {1, 2, 3}
        | {2**k + d for k in range(1, 40) for d in (-1, 0, 1)}
        | {i * 997 + 13 for i in range(200)}
    )
    df = spark.createDataFrame([(n,) for n in ns], "n long").select(
        "n",
        F.when(F.col("n") <= 16, F.lit(16).cast("long"))
        .otherwise(F.expr("shiftleft(CAST(1 AS BIGINT), length(bin(n - 1)))"))
        .alias("cap"),
    )
    got = {r.n: r.cap for r in df.collect()}
    for n in ns:
        want = 16 if n <= 16 else 1 << (n - 1).bit_length()
        assert got[n] == want, (n, got[n], want)


def test_oov_vocab_plan_shape(spark, sf_small):
    # the top-K vocab must plan as TakeOrderedAndProject (per-partition
    # top-k, K rows only — never a global sort), and its rejoin to the
    # token stream must broadcast, not shuffle the tokens
    plan = (
        q_oov_rate_by_source(spark, sf_small)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan
