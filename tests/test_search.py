"""Semantic invariants for the round-7 additions: BM25 retrieval,
Misra-Gries heavy hitters, prefix-filtered Jaccard join, rolling
z-score anomalies. Oracle parity (exact hash equivalence vs DuckDB)
is covered by test_oracle_parity; these tests pin the properties the
hash alone can't express -- pruning actually bites, sketch guarantees
hold on adversarial input, the anomaly test matches its closed form.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_bm25_topk_ranked_and_bounded(spark, sf_small):
    from etl_sales_pandas_sqlserver_spark.functions.search import (
        _BM25_TOPK,
        q_bm25_search,
    )

    rows = q_bm25_search(spark, sf_small).collect()
    assert 0 < len(rows) <= _BM25_TOPK
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    # every hit contains at least one query term
    assert all(r.tf0 + r.tf1 + r.tf2 > 0 for r in rows)


def test_misra_gries_superset_on_skewed_keys(spark):
    """Every key with global frequency > n/k must survive the
    per-partition MG summaries (the guarantee the exact recount relies
    on) -- checked on a skewed synthetic with far more distinct keys
    than MG capacity."""
    from etl_sales_pandas_sqlserver_spark.functions.search import (
        _misra_gries_candidates,
    )

    # 10_000 rows: key 7 appears 2000x, key 13 500x, the rest is a
    # long uniform tail of 7500 distinct singleton-ish keys
    df = spark.range(10_000).select(
        F.when(F.col("id") < 2000, F.lit(7))
        .when(F.col("id") < 2500, F.lit(13))
        .otherwise(F.col("id") + 1000)
        .cast("long")
        .alias("user_id")
    ).repartition(8)
    k = 16  # threshold n/k = 625: keys 7 (2000) and 13 (500) vs tail
    cand = {r.user_id for r in _misra_gries_candidates(df, k).collect()}
    assert 7 in cand  # freq 2000 > 625: MUST be a candidate
    # 13 (freq 500 < 625) may or may not appear -- no assertion
    assert len(cand) <= 8 * k  # capacity bound per partition


def test_prefix_filter_prunes_postings(spark, sf_small):
    """The prefix join must (a) return exactly the brute-force pair
    set -- same frame as the inverted-index baseline -- and (b) ship
    strictly fewer postings into the candidate join than the full
    index does: if the prefix ever degenerates to the whole document,
    the scale story is gone even while results stay correct."""
    from etl_sales_pandas_sqlserver_spark.functions.dedup import (
        _doc_shingles,
        q_jaccard_prefix_filter,
        q_ngram_jaccard_pairs,
    )

    got = {
        (r.a_id, r.b_id)
        for r in q_jaccard_prefix_filter(spark, sf_small).collect()
    }
    want = {
        (r.a_id, r.b_id)
        for r in q_ngram_jaccard_pairs(spark, sf_small).collect()
    }
    assert got == want and want  # non-empty equality

    sh = _doc_shingles(spark, sf_small)
    total_postings = sh.select(F.explode("s")).count()
    # mirror the query's integer prefix length: |s| - ceil(0.9|s|) + 1
    prefix_postings = sh.select(
        (
            F.size("s")
            - F.expr("(9 * size(s) + 9) div 10")
            + F.lit(1)
        ).alias("plen"),
        F.size("s").alias("n"),
    ).agg(
        F.sum(F.least(F.greatest("plen", F.lit(0)), F.col("n"))).alias("p")
    ).collect()[0].p
    assert prefix_postings < 0.2 * total_postings


def test_zscore_flags_synthetic_spike(spark):
    """A flat series with one spike: exactly the spike is flagged."""
    import pandas as pd

    from etl_sales_pandas_sqlserver_spark.plans.temporal_queries import (
        q_zscore_anomaly,
    )

    # build a one-user events table in a temp dir shaped like testdata
    import tempfile

    vals = [10.0] * 30
    vals[25] = 400.0  # the spike (after the >=10-row warmup window)
    pdf = pd.DataFrame(
        {
            "event_id": range(30),
            "ts": (
                pd.to_datetime("2024-01-01")
                + pd.to_timedelta(range(30), unit="min")
            ).astype("datetime64[us]"),  # testdata stores timestamp[us]
            "user_id": [1] * 30,
            "event_type": ["view"] * 30,
            "value": vals,
            "props": ["{}"] * 30,
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pdf.to_parquet(f"{d}/events.parquet")
        rows = q_zscore_anomaly(spark, d).collect()
    assert [r.event_id for r in rows] == [25]
    assert rows[0].v_cents == 40000


def test_pair_feed_memoized_per_session(spark, sf_small):
    """The dedup family's shared pair feed must return the SAME
    checkpointed frame for repeated same-session calls (that is the
    whole optimization) and recompute per sf_dir."""
    from etl_sales_pandas_sqlserver_spark.functions.dedup import (
        minhash_verified_pairs,
    )

    a = minhash_verified_pairs(spark, sf_small)
    b = minhash_verified_pairs(spark, sf_small)
    assert a is b
    other = minhash_verified_pairs(spark, "/root/testdata/sf0.01")
    assert other is not a


def test_ntile_closed_form_matches_sql_semantics():
    """The decile query's integer closed form must reproduce SQL
    ntile(k) exactly for every N: buckets 1..(N mod k) hold
    (N div k)+1 rows, the rest hold N div k. Exhaustive over
    N = k..2000 (pure arithmetic -- no Spark needed)."""
    k = 10

    def closed_form(rnk: int, n: int) -> int:
        q, m = divmod(n, k)
        big_span = m * (q + 1)
        if rnk <= big_span:
            return (rnk - 1) // (q + 1) + 1
        return m + (rnk - big_span - 1) // q + 1

    for n in range(k, 2001):
        q, m = divmod(n, k)
        expected = []
        for b in range(1, k + 1):
            expected.extend([b] * (q + 1 if b <= m else q))
        got = [closed_form(r, n) for r in range(1, n + 1)]
        assert got == expected, f"N={n}"


def test_prefix_filter_complete_on_adversarial_docs(spark, tmp_path):
    """Prefix-filter completeness on a CONSTRUCTED corpus: families of
    near-identical documents (one word changed -- Jaccard just above
    0.9) plus unrelated noise docs. Every qualifying pair must survive
    the blocking; brute force is the ground truth."""
    import itertools

    import pandas as pd

    from etl_sales_pandas_sqlserver_spark.functions.dedup import (
        _JACCARD_THRESHOLD,
        q_jaccard_prefix_filter,
    )

    base = ("tok%02d " * 40) % tuple(range(40))
    docs = []
    # family A: 4 docs, each differing from base in ONE trailing word
    for i in range(4):
        words = base.split()
        words[39] = f"var{i}"
        docs.append(" ".join(words))
    # family B: 3 exact copies of a different base
    base_b = ("alt%02d " * 40) % tuple(range(40))
    docs += [base_b.strip()] * 3
    # noise: unrelated docs
    for i in range(10):
        docs.append(("n%d_%%02d " % i * 40) % tuple(range(40)))
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(docs)),
            "text": docs,
            "lang": ["en"] * len(docs),
            "source": ["t"] * len(docs),
            "n_chars": [len(d) for d in docs],
        }
    )
    d = tmp_path / "corpus"
    d.mkdir()
    pdf.to_parquet(str(d / "documents.parquet"))

    got = {
        (r.a_id, r.b_id)
        for r in q_jaccard_prefix_filter(spark, str(d)).collect()
    }

    # brute force in python
    def shingles(text):
        w = text.split()
        return {
            " ".join(w[i : i + 3]) for i in range(len(w) - 2)
        } if len(w) >= 3 else set()

    sh = [shingles(t) for t in docs]
    want = set()
    for a, b in itertools.combinations(range(len(docs)), 2):
        inter = len(sh[a] & sh[b])
        union = len(sh[a] | sh[b])
        if union and inter / union >= _JACCARD_THRESHOLD:
            want.add((a, b))
    assert want, "constructed corpus must contain qualifying pairs"
    assert got == want


def test_misra_gries_batch_merge_property(spark):
    """Randomized pin of the batch-merged kernel's guarantee: over
    random multisets with planted heavy keys, every key with
    single-partition frequency > N/(k+1) survives the capped summary
    regardless of arrival order (the shrink step subtracts the
    (k+1)-th largest count, so total undercount per key is bounded by
    N/(k+1) exactly as in row-at-a-time MG)."""
    import random

    from etl_sales_pandas_sqlserver_spark.functions.search import (
        _misra_gries_candidates,
    )

    rng = random.Random(0xC0FFEE)
    for trial in range(3):
        k = 8
        n = 5000
        # plant 2 heavies safely above n/(k+1) ~ 555, bury them in a
        # long tail of ~uniform distinct keys
        keys = [1] * 900 + [2] * 700
        keys += [rng.randrange(10_000, 90_000) for _ in range(n - len(keys))]
        rng.shuffle(keys)
        df = (
            spark.createDataFrame([(x,) for x in keys], ["user_id"])
            .coalesce(1)  # single partition: the per-partition bound
        )
        cand = {r.user_id for r in _misra_gries_candidates(df, k).collect()}
        assert 1 in cand and 2 in cand, f"trial {trial}: heavy key lost"
        assert len(cand) <= k, f"trial {trial}: capacity exceeded"


def test_misra_gries_null_key_is_a_candidate_and_survives_recount(spark):
    """A null key that is a true heavy hitter must (a) survive the MG
    kernel -- value_counts(dropna=False), NaN normalized to ONE
    sentinel counter so cross-batch counts fold instead of splitting --
    and (b) survive the null-safe recount semi join (plain equi join
    would drop it while the SQL-GROUP-BY oracle keeps the NULL group).
    Latent on the stock testdata (events.user_id has no nulls); this
    pins it on a synthetic."""
    from etl_sales_pandas_sqlserver_spark.functions.search import (
        _HH_K,
        _misra_gries_candidates,
    )

    # 10_000 rows: null appears 3000x (a heavy hitter at any k >= 4),
    # the rest a uniform tail of distinct keys
    df = spark.range(10_000).select(
        F.when(F.col("id") < 3000, F.lit(None))
        .otherwise(F.col("id"))
        .cast("long")
        .alias("user_id")
    ).repartition(8)
    k = 16
    cand = [r.user_id for r in _misra_gries_candidates(df, k).collect()]
    assert None in cand  # freq 3000 > 10000/16: must survive the sketch

    # end-to-end recount through the registered query shape: same
    # plan as q_heavy_hitters_users, on the synthetic frame
    cand_df = _misra_gries_candidates(df, k).withColumnRenamed(
        "user_id", "_cand_id"
    )
    total = df.agg(F.count(F.lit(1)).alias("total"))
    out = (
        df.join(
            cand_df,
            F.col("user_id").eqNullSafe(F.col("_cand_id")),
            "left_semi",
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n_events") * k > F.col("total"))
        .select("user_id", "n_events")
        .collect()
    )
    got = {(r.user_id, r.n_events) for r in out}
    assert (None, 3000) in got
    assert _HH_K  # imported constant stays referenced
