"""Deduplication operators over the ``documents`` / ``embeddings``
tables: exact content-hash dedup plus four near-duplicate detectors
(n-gram Jaccard, MinHash+LSH, SimHash, embedding cosine).

Scale design (the whole point -- these run over 100 TB of text):

- **exact**: one hash-agg shuffle on a fixed-width md5 key; map-side
  partial aggregation keeps the shuffle small. Never shuffles the text.
- **ngram_jaccard**: the exact all-pairs answer via an *inverted index*
  (explode shingles -> self-join on the 64-bit shingle hash -> count
  common per pair). Shuffles (doc_id, hash) pairs, never text; cost is
  sum over shingles of C(group_size, 2), which explodes on hot shingles
  -- this is the correctness baseline, MinHash below is the scale path.
- **minhash_lsh**: 64 hash functions -> 16 bands x 4 rows. Signature is
  one agg shuffle; candidates come from equi-joining 16 fixed-width
  band keys per doc; only candidates are exactly verified. Linear in
  docs + near-dup pairs, independent of all-pairs count. For a pair
  with true Jaccard j, P(candidate) = 1-(1-j^4)^16 (> 1-1e-12 at
  j>=0.96, the planted-dup range), so the verified output equals the
  exact answer on this data -- and the oracle asserts exactly that.
- **simhash**: 60-bit SimHash over *shingle* features with a portable
  pair of 31-bit md5-slice token hashes combined into one 62-bit
  feature hash (expressible in both Spark and DuckDB SQL, so the
  oracle checks the full pipeline including the banding); 5 bands x 12
  bits,
  hamming <= _SIMHASH_HAMMING candidates, exact-Jaccard verified.
  Band width is the scale lever: 12-bit bands have 4096 values, so
  unrelated-doc band collisions are ~C(n,2)/2^12 per band instead of
  the ~C(n,2)/2^6 a 6-bit band admits -- the round-1 24-bit version
  produced ~320k candidate pairs at sf0.1; this geometry produces
  ~18k band candidates / ~3.5k after the hamming cut (measured), and
  recalls 23/25 of the exact Jaccard answer at sf0.01 and 237/249 at
  sf0.1 (the misses are high-hamming outliers; minhash is the
  high-recall path). Geometry swept empirically: 4x15 recalls 20/25,
  6x10 costs 5x the candidates for no recall gain over 5x12.
  Features are 3-gram shingles, NOT tokens: on a small vocabulary
  token-level simhash degenerates (most docs share most tokens ->
  correlated bit majorities -> giant LSH buckets); shingles keep
  signatures diverse so band buckets stay small. Measured on the
  testdata: tokens gave 2474 distinct signatures across 5000 docs
  (quadratic bucket blowup), shingles give 4951.
- **embedding_cosine**: brute-force pair scan at test scale with the
  dot products as sequential folds (bitwise-identical across engines);
  the ANN scale path lives in similarity.py.

No Python UDFs anywhere -- everything is JVM-side higher-order array
expressions, codegen-friendly.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cache import managed_cache
from ..session import shuffle_partitions
from ..sources.testdata import load_table
from .textstats import fingerprint_col
from .tokcount import WS_CLASS

SparkQuery = Callable[[SparkSession, str], DataFrame]

_JACCARD_THRESHOLD = 0.9
_COSINE_THRESHOLD = 0.4
_MINHASH_K = 64  # 16 bands x 4 rows
_MINHASH_BANDS = 16
_SIMHASH_BITS = 60  # 5 bands x 12 bits
_SIMHASH_BANDS = 5
_SIMHASH_HAMMING = 20
_HASH_MOD = 2_147_483_647
_HASH_SHIFT = 2_147_483_648  # 2^31

#: Explicit whitespace class for this module's TOKEN sites (r14
#: respell, aligned with the r10-cohort drain): Java's ``\s`` (Spark)
#: includes U+000B, RE2's (DuckDB) does not, so the two engines
#: disagreed on vertical-tab documents. The class is defined ONCE in
#: functions/tokcount.py (the token-grain home, same hoist discipline
#: as N_TOKENS_SQL) and proven cross-engine-identical over every
#: Unicode codepoint. r16: EXACT_DEDUP_SQL's fingerprint (paired with
#: textstats.fingerprint_col) now also interpolates this class — the
#: module has no ``\s+`` site left.
_WS_CLASS = WS_CLASS

# ---------------------------------------------------------------------------
# Shared shingling (word 3-grams, distinct per doc)
# ---------------------------------------------------------------------------

#: Spark: tokens -> distinct word-3-gram shingles (empty if < 3 tokens;
#: the CASE guards sequence(1, 0) which would step backwards in Spark).
_SHINGLES_EXPR = """
  CASE WHEN size(w) < 3 THEN array()
       ELSE array_distinct(transform(sequence(1, size(w) - 2),
                           i -> concat_ws(' ', w[i-1], w[i], w[i+1])))
  END
"""

_SHINGLES_CTE = rf"""
  toks AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '{_WS_CLASS}') AS w
    FROM documents
  ),
  sh AS (
    SELECT doc_id,
           list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                          for i in range(1, len(w) - 1)]) AS s
    FROM toks
  )
"""

#: exact all-pairs Jaccard >= threshold -- the oracle for all three text
#: near-dup detectors (each must return exactly the true answer).
_EXACT_JACCARD_PAIRS_SQL = f"""
  WITH {_SHINGLES_CTE},
  pairs AS (
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           len(list_intersect(a.s, b.s)) AS common,
           len(a.s) AS na, len(b.s) AS nb
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  )
  SELECT a_id, b_id,
         CAST(common AS DOUBLE) / (na + nb - common) AS jaccard
  FROM pairs
  WHERE CAST(common AS DOUBLE) / (na + nb - common) >= {_JACCARD_THRESHOLD}
  ORDER BY a_id, b_id
"""


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized checkpointed shingle frame. Six registered
    dedup queries start from this exact frame; before round 7 each
    rebuilt it (text scan + split + in-array shingle transform,
    ~0.8s/query at sf0.1) behind its own managed_cache. The memoized
    eager checkpoint (see cache.session_checkpoint_memo) materializes
    it once per (live session, sf_dir) -- a few MB of string arrays --
    and every consumer reads the severed-lineage frame, which also
    retires the per-query cache registrations for it."""
    from ..cache import session_checkpoint_memo
    from ..source_tags import sf_content_tag

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        return docs.select(
            "doc_id", F.split(F.trim(F.col("text")), _WS_CLASS).alias("w")
        ).select("doc_id", F.expr(_SHINGLES_EXPR).alias("s"))

    # the content tag in the key makes a same-session rewrite of the
    # documents parquet MISS the memo (r9 advice; same spelling as the
    # similarity/kmeans memos)
    return session_checkpoint_memo(
        spark,
        ("doc_shingles", sf_dir, sf_content_tag(sf_dir, "documents")),
        build,
    )


def _verify_jaccard(cand: DataFrame, sh: DataFrame) -> DataFrame:
    """Join candidate (a_id, b_id) pairs back to the shingle sets and
    keep only pairs with exact Jaccard >= threshold. Only candidates are
    verified -- at scale this joins |candidates| rows, not all pairs.
    Extra columns on ``cand`` (e.g. a prefilter's hamming distance) ride
    through, so callers need not re-join them afterwards."""
    sa = sh.select(F.col("doc_id").alias("a_id"), F.col("s").alias("sa"))
    sb = sh.select(F.col("doc_id").alias("b_id"), F.col("s").alias("sb"))
    common = F.size(F.array_intersect("sa", "sb"))
    jaccard = common.cast("double") / (F.size("sa") + F.size("sb") - common)
    return (
        cand.join(sa, "a_id")
        .join(sb, "b_id")
        .select(*cand.columns, jaccard.alias("jaccard"))
        .filter(F.col("jaccard") >= _JACCARD_THRESHOLD)
    )


# ---------------------------------------------------------------------------
# 1. Exact dedup: content-hash group-by, keep the lowest doc_id.
# ---------------------------------------------------------------------------

EXACT_DEDUP_SQL = rf"""
  WITH f AS (
    SELECT doc_id,
           md5(lower(trim(regexp_replace(text, '{_WS_CLASS}', ' ', 'g')))) AS fingerprint
    FROM documents
  )
  SELECT min(doc_id) AS keep_doc_id, fingerprint, COUNT(*) AS n_copies
  FROM f
  GROUP BY fingerprint
  ORDER BY keep_doc_id
"""


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", fingerprint_col().alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("keep_doc_id", "fingerprint", "n_copies")
    )


# ---------------------------------------------------------------------------
# 1b. INCREMENTAL near-dup dedup -- the daily-ingest shape: a new batch
# of documents is deduplicated against the existing corpus WITHOUT an
# all-pairs rescan. Near-dup edges come from the MinHash-LSH path (so
# the recurring cost is |batch| signatures + banded joins against the
# corpus band index, linear in batch size); each batch doc classifies:
#   dup_of_corpus : near-duplicates some existing-corpus document --
#                   drop, the corpus already has this content;
#   dup_in_batch  : near-duplicates only LOWER-id batch docs
#                   (keep-first within the day's arrivals);
#   novel         : no near-dup anywhere.
# The doc_id % 7 split stands in for the batch/corpus partition; the
# oracle replays the classification over the exact all-pairs Jaccard
# edges, which the minhash oracle already proves equals the verified
# LSH pair set on this data -- so a green row checks the incremental
# path end to end against ground truth.
# ---------------------------------------------------------------------------

INCREMENTAL_DEDUP_SQL = f"""
  WITH {_SHINGLES_CTE},
  pairs AS (
    SELECT a.doc_id AS a_id, b.doc_id AS b_id
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
          >= {_JACCARD_THRESHOLD}
  ),
  und AS (
    SELECT a_id AS x, b_id AS y FROM pairs
    UNION ALL
    SELECT b_id AS x, a_id AS y FROM pairs
  ),
  flags AS (
    SELECT x AS doc_id,
           MAX(CASE WHEN y % 7 <> 0 THEN 1 ELSE 0 END) AS has_corpus,
           MAX(CASE WHEN y % 7 = 0 AND y < x THEN 1 ELSE 0 END)
             AS has_lower_batch
    FROM und WHERE x % 7 = 0 GROUP BY 1
  )
  SELECT d.doc_id,
         CASE WHEN f.has_corpus = 1 THEN 'dup_of_corpus'
              WHEN f.has_lower_batch = 1 THEN 'dup_in_batch'
              ELSE 'novel' END AS status
  FROM documents d
  LEFT JOIN flags f ON f.doc_id = d.doc_id
  WHERE d.doc_id % 7 = 0
  ORDER BY d.doc_id
"""


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = minhash_verified_pairs(spark, sf_dir).select("a_id", "b_id")
    und = pairs.select(
        F.col("a_id").alias("x"), F.col("b_id").alias("y")
    ).unionByName(pairs.select(F.col("b_id").alias("x"), F.col("a_id").alias("y")))
    flags = (
        und.filter(F.col("x") % 7 == 0)
        .groupBy(F.col("x").alias("doc_id"))
        .agg(
            F.max((F.col("y") % 7 != 0).cast("int")).alias("has_corpus"),
            F.max(
                ((F.col("y") % 7 == 0) & (F.col("y") < F.col("x"))).cast("int")
            ).alias("has_lower_batch"),
        )
    )
    batch = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % 7 == 0)
    )
    status = (
        F.when(F.col("has_corpus") == 1, "dup_of_corpus")
        .when(F.col("has_lower_batch") == 1, "dup_in_batch")
        .otherwise("novel")
    )
    return (
        batch.join(flags, "doc_id", "left")
        .select("doc_id", status.alias("status"))
    )


# ---------------------------------------------------------------------------
# 2. Exact n-gram Jaccard pairs via inverted shingle index.
# ---------------------------------------------------------------------------


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the shingle frame is a session-memoized checkpoint (four
    # consumers here: both self-join sides, both size joins)
    sh = _doc_shingles(spark, sf_dir)
    sizes = sh.select("doc_id", F.size("s").alias("n"))
    # inverted index: ship 64-bit hashes through the shuffle, not text.
    # Hash INSIDE the array then explode the precomputed longs: a
    # generator whose child is an uncached expensive array pipeline
    # evaluates it interpreted (7.1s at sf0.1 vs 0.5s for this
    # spelling) -- with the cache this costs nothing and protects the
    # plan if the cache is ever dropped
    ex = sh.select(
        "doc_id",
        F.explode(F.expr("transform(s, x -> xxhash64(x))")).alias("h"),
    )
    a = ex.select(F.col("doc_id").alias("a_id"), "h")
    b = ex.select(F.col("doc_id").alias("b_id"), "h")
    common = (
        a.join(b, "h")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    na = sizes.select(F.col("doc_id").alias("a_id"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("b_id"), F.col("n").alias("nb"))
    jaccard = F.col("common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("common")
    )
    return (
        common.join(na, "a_id")
        .join(nb, "b_id")
        .select("a_id", "b_id", jaccard.alias("jaccard"))
        .filter(F.col("jaccard") >= _JACCARD_THRESHOLD)
    )


# ---------------------------------------------------------------------------
# 2a. Jaccard CONTAINMENT pairs: the asymmetric sibling of the jaccard
# join -- |A n B| / |A| >= t finds documents A whose content is
# (almost) wholly inside another document B even when B is much
# larger, the quote/excerpt/boilerplate case a symmetric jaccard
# misses (a 50-shingle doc pasted into a 5000-shingle doc has jaccard
# ~0.01 but containment 1.0). Same inverted-index shuffle shape as the
# jaccard join -- (doc_id, 64-bit shingle hash) pairs, never text;
# the threshold test is integer cross-multiplied (10*common >= 9*na)
# so the filter is exact and the only float is the reported ratio.
# Pairs are DIRECTED (a contained-in b), so both orientations of an
# exact-duplicate pair appear -- by design.
# ---------------------------------------------------------------------------

_CONTAINMENT_PCT = 9  # threshold = _CONTAINMENT_PCT / 10

CONTAINMENT_SQL = f"""
  WITH {_SHINGLES_CTE},
  sized AS (SELECT doc_id, s, len(s) AS n FROM sh WHERE len(s) > 0),
  pairs AS (
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           len(list_intersect(a.s, b.s)) AS common, a.n AS na
    FROM sized a JOIN sized b ON a.doc_id <> b.doc_id
  )
  SELECT a_id, b_id, CAST(common AS DOUBLE) / na AS containment
  FROM pairs
  WHERE 10 * common >= {_CONTAINMENT_PCT} * na
  ORDER BY a_id, b_id
"""


def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _doc_shingles(spark, sf_dir)
    sizes = sh.select("doc_id", F.size("s").alias("n")).filter(
        F.col("n") > 0
    )
    ex = sh.select(
        "doc_id",
        F.explode(F.expr("transform(s, x -> xxhash64(x))")).alias("h"),
    )
    a = ex.select(F.col("doc_id").alias("a_id"), "h")
    b = ex.select(F.col("doc_id").alias("b_id"), "h")
    # |A n B| is symmetric: aggregate each unordered pair ONCE (a<b --
    # half the join/agg mass of a directed a!=b join), then mirror the
    # tiny post-agg pair list into both orientations before the
    # per-side size test.
    common = (
        a.join(b, "h")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    directed = common.unionByName(
        common.select(
            F.col("b_id").alias("a_id"),
            F.col("a_id").alias("b_id"),
            "common",
        )
    )
    na = sizes.select(F.col("doc_id").alias("a_id"), F.col("n").alias("na"))
    return (
        directed.join(na, "a_id")
        .filter(
            F.lit(10) * F.col("common") >= F.lit(_CONTAINMENT_PCT) * F.col("na")
        )
        .select(
            "a_id",
            "b_id",
            (F.col("common").cast("double") / F.col("na")).alias(
                "containment"
            ),
        )
    )


# ---------------------------------------------------------------------------
# 2b. Train/eval decontamination: the cross-corpus variant of the
# inverted-index join. Before pre-training, any train document that
# near-duplicates an eval/benchmark document must be dropped or the
# benchmark is contaminated. Same shuffle shape as the self-join --
# (doc_id, shingle-hash) pairs, never text -- but the candidate mass is
# |train shingles| x |eval shingles per bucket|, far below all-pairs
# because the eval side is tiny relative to the corpus. At 100 TB this
# is THE shape: broadcast-size eval set joins a corpus-size index.
# The eval split here is derived (doc_id % 10 == 0) since the testdata
# has one corpus; in production the eval side is its own table.
# ---------------------------------------------------------------------------

DECONTAMINATE_SQL = f"""
  WITH {_SHINGLES_CTE},
  sized AS (SELECT doc_id, s, len(s) AS n FROM sh),
  train AS (SELECT * FROM sized WHERE doc_id % 10 <> 0),
  eval_ AS (SELECT * FROM sized WHERE doc_id % 10 = 0),
  pairs AS (
    SELECT t.doc_id AS train_id, e.doc_id AS eval_id,
           len(list_intersect(t.s, e.s)) AS common, t.n AS nt, e.n AS ne
    FROM train t JOIN eval_ e ON TRUE
  )
  SELECT train_id, eval_id,
         CAST(common AS DOUBLE) / (nt + ne - common) AS jaccard
  FROM pairs
  WHERE CAST(common AS DOUBLE) / (nt + ne - common) >= {_JACCARD_THRESHOLD}
  ORDER BY train_id, eval_id
"""


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _doc_shingles(spark, sf_dir)
    sizes = sh.select("doc_id", F.size("s").alias("n"))
    # in-array hash before explode (see q_ngram_jaccard_pairs)
    ex = sh.select(
        "doc_id",
        F.explode(F.expr("transform(s, x -> xxhash64(x))")).alias("h"),
    )
    train = ex.filter(F.col("doc_id") % 10 != 0).select(
        F.col("doc_id").alias("train_id"), "h"
    )
    ev = ex.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("eval_id"), "h"
    )
    common = (
        train.join(ev, "h")
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    nt = sizes.select(F.col("doc_id").alias("train_id"), F.col("n").alias("nt"))
    ne = sizes.select(F.col("doc_id").alias("eval_id"), F.col("n").alias("ne"))
    jaccard = F.col("common").cast("double") / (
        F.col("nt") + F.col("ne") - F.col("common")
    )
    return (
        common.join(nt, "train_id")
        .join(ne, "eval_id")
        .select("train_id", "eval_id", jaccard.alias("jaccard"))
        .filter(F.col("jaccard") >= _JACCARD_THRESHOLD)
    )


# ---------------------------------------------------------------------------
# 2c. Bloom-filter decontamination: the zero-shuffle serving path.
#
# The inverted-index join above shuffles (doc_id, shingle-hash) pairs
# for BOTH corpora. When the eval/benchmark side is tiny and the train
# corpus is 100 TB, the right shape is: compress the eval shingle set
# into a FIXED-SIZE bloom bitmap (m bits regardless of eval size),
# broadcast it, and stream the train corpus through it map-side only --
# the sole shuffle left is the per-document re-aggregation, which is
# map-side combined down to one row per document. Bits are byte-packed
# into a <= m/8-row (byte_idx, byte_val) table, always auto-broadcast.
#
# The bloom is DETERMINISTIC AND PORTABLE -- md5-derived double hashing
# (Kirsch-Mitzenmacher: pos_i = (h1 + i*h2) mod m), the same md5 slice
# scheme the simhash family uses -- so DuckDB replays the identical
# bitmap bit for bit and the driver hash-compares the full per-document
# result (train_id, n_shingles, n_hits, flagged), a far stronger check
# than error-bound booleans. A document is flagged when a MAJORITY of
# its shingles hit the bloom: no false negatives at the near-dup
# threshold (a jaccard>=0.9 pair shares >=90% of shingles), while
# per-shingle false positives (~0.1% at these m/n/k) cannot reach the
# majority gate.
# ---------------------------------------------------------------------------

def _hash_duck(start: int) -> str:
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT),"
        f" list_transform(range({start}, {start + 14}), i ->"
        " CAST(strpos('0123456789abcdef', substr(md5(tok), i, 1)) - 1 AS BIGINT))),"
        f" (acc, x) -> acc * 16 + x) % {_HASH_MOD}"
    )


_BLOOM_M = 1 << 19  # bitmap bits (64 KiB packed)
_BLOOM_K = 3  # probes per shingle


def q_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _doc_shingles(spark, sf_dir)
    # hash INSIDE the array, then explode the precomputed (h1, h2)
    # structs: exploding the raw shingle pipeline drops the expensive
    # transform+distinct out of whole-stage codegen (measured 7s vs
    # <1s at sf0.1), while an in-array hash keeps the generator trivial
    h_struct = (
        "transform(s, x -> named_struct("
        f"'h1', CAST(conv(substring(md5(x), 1, 14), 16, 10) AS BIGINT) % {_HASH_MOD}, "
        f"'h2', CAST(conv(substring(md5(x), 15, 14), 16, 10) AS BIGINT) % {_HASH_MOD}))"
    )
    hashed = (
        sh.select("doc_id", F.explode(F.expr(h_struct)).alias("p"))
        .select("doc_id", F.col("p.h1").alias("h1"), F.col("p.h2").alias("h2"))
    )

    # eval side -> byte-packed bloom bitmap (tiny; shuffles are fine)
    ev_pos = (
        hashed.filter(F.col("doc_id") % 10 == 0)
        .select(
            F.explode(
                F.array(
                    *[
                        ((F.col("h1") + F.lit(i) * F.col("h2")) % _BLOOM_M).alias(
                            f"p{i}"
                        )
                        for i in range(_BLOOM_K)
                    ]
                )
            ).alias("pos")
        )
        .distinct()
    )
    bloom_bytes = (
        ev_pos.groupBy((F.col("pos") / 8).cast("bigint").alias("bidx"))
        .agg(F.bit_or(F.expr("shiftleft(1, cast(pos % 8 as int))")).alias("bval"))
        # <= m/8 rows; cached so the K broadcast copies don't each
        # rebuild the eval pipeline
    )
    bloom_bytes = managed_cache(bloom_bytes)

    # train side: one map-side broadcast join per probe, no shingle
    # ever shuffles; a shingle is a bloom member iff ALL K probes hit
    train = hashed.filter(F.col("doc_id") % 10 != 0)
    hit_all = None
    for i in range(_BLOOM_K):
        pos = (F.col("h1") + F.lit(i) * F.col("h2")) % _BLOOM_M
        train = train.withColumn(f"bidx{i}", (pos / 8).cast("bigint")).withColumn(
            f"bit{i}", (pos % 8).cast("int")
        )
        bb = F.broadcast(  # broadcast-ok: bloom bitmap, <= _BLOOM_M/8 (64 KiB) rows
            bloom_bytes.select(
                F.col("bidx").alias(f"bidx{i}"), F.col("bval").alias(f"bval{i}")
            )
        )
        train = train.join(bb, f"bidx{i}", "left")
        hit_i = F.expr(f"(coalesce(bval{i}, 0) >> bit{i}) & 1 = 1")
        hit_all = hit_i if hit_all is None else (hit_all & hit_i)

    per_doc = train.groupBy(F.col("doc_id").alias("train_id")).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(hit_all.cast("bigint")).alias("n_hits"),
    )
    return per_doc.select(
        "train_id",
        "n_shingles",
        "n_hits",
        (F.col("n_hits") * 2 >= F.col("n_shingles")).alias("flagged"),
    )


def _bloom_hash_duck(start: int) -> str:
    # _hash_duck hashes the lambda/row variable `tok`
    return _hash_duck(start)


DECONTAMINATE_BLOOM_SQL = f"""
  WITH {_SHINGLES_CTE},
  ex AS (SELECT doc_id, unnest(s) AS tok FROM sh),
  hashed AS (
    SELECT doc_id, tok,
           {_bloom_hash_duck(1)} AS h1,
           {_bloom_hash_duck(15)} AS h2
    FROM ex
  ),
  ev_pos AS (
    SELECT DISTINCT (h1 + i * h2) % {_BLOOM_M} AS pos
    FROM hashed, unnest([{", ".join(str(i) for i in range(_BLOOM_K))}]) t(i)
    WHERE doc_id % 10 = 0
  ),
  bloom_bytes AS (
    SELECT pos // 8 AS bidx, bit_or(1 << (pos % 8)) AS bval
    FROM ev_pos GROUP BY 1
  ),
  probes AS (
    SELECT doc_id, tok, i, (h1 + i * h2) % {_BLOOM_M} AS pos
    FROM hashed, unnest([{", ".join(str(i) for i in range(_BLOOM_K))}]) t(i)
    WHERE doc_id % 10 <> 0
  ),
  shingle_hits AS (
    SELECT p.doc_id, p.tok,
           CASE WHEN b.bval IS NOT NULL
                 AND (b.bval >> CAST(p.pos % 8 AS INTEGER)) & 1 = 1
                THEN 1 ELSE 0 END AS hit
    FROM probes p LEFT JOIN bloom_bytes b ON b.bidx = p.pos // 8
  ),
  per_shingle AS (
    SELECT doc_id, tok, MIN(hit) AS hit_all
    FROM shingle_hits GROUP BY doc_id, tok
  )
  SELECT doc_id AS train_id,
         CAST(COUNT(*) AS BIGINT) AS n_shingles,
         CAST(SUM(hit_all) AS BIGINT) AS n_hits,
         SUM(hit_all) * 2 >= COUNT(*) AS flagged
  FROM per_shingle
  GROUP BY doc_id
  ORDER BY train_id
"""


# ---------------------------------------------------------------------------
# 3. MinHash + LSH banding, exact-verified.
# ---------------------------------------------------------------------------


def _minhash_signature(ex: DataFrame) -> DataFrame:
    """(doc_id, h1, h2) base-hash pairs -> one row per doc with columns
    h0..h{K-1}; one agg shuffle.

    The K hash functions use double hashing (Kirsch-Mitzenmacher):
    ``g_i = (h1 + i*h2) mod p`` from TWO base xxhash64 evaluations per
    shingle (computed in-array by the caller) -- hashing the string K
    times costs K string traversals per row and a giant codegen unit
    (measured: the 64x xxhash64 spelling pushed the first-run
    compile+execute to ~14s at sf0.1; this form runs ~2s warm).
    mod 2^31-1 keeps every intermediate ANSI-safe (h1 + 63*h2 < 2^37)
    and the min-wise property holds per standard double-hashing
    practice; recall vs the exact answer is unchanged (verified: 25/25
    at sf0.01, 249/249 at sf0.1)."""
    p = F.lit(_HASH_MOD)
    mins = [
        F.min(F.pmod(F.col("h1") + F.lit(i) * F.col("h2"), p)).alias(f"h{i}")
        for i in range(_MINHASH_K)
    ]
    return ex.groupBy("doc_id").agg(*mins)


# Memoized pair feed (round-7, verdict #4): four registered queries
# consume the LSH-verified pair list (dedup_minhash_lsh itself,
# clusters, incremental batch, triangle census), and each paid the full
# ~2.2s shingle->band pipeline independently in a serial sweep. The
# feed is computed ONCE per (live session, sf_dir) via the shared
# session_checkpoint_memo (eager localCheckpoint, weak-keyed by the
# SparkSession; see cache.py) -- the result is a few thousand int-pair
# rows, so the pinned blocks are negligible while the recompute is the
# dominant cost of the whole dedup family.
#
# 100 TB size bound (r18 audit): the checkpoint holds exactly the
# VERIFIED pair list -- three fixed-width columns (a_id, b_id, jaccard)
# per pair that actually passes the exact-Jaccard verify, i.e. it is
# bounded by the true near-duplicate pair count, never by the corpus
# (shingles, signatures and band tables stream through the pipeline
# and are not retained). A pathological all-identical corpus makes the
# pair COUNT itself quadratic, but every downstream consumer
# (clustering, census, incremental classify) consumes that same pair
# list either way -- the checkpoint adds no asymptotic cost beyond the
# result it feeds, and it beats recomputation by construction: one
# materialization of <= |pairs| x 24 bytes versus 4 re-runs of the
# corpus-wide shingle -> signature -> band -> verify pipeline.


def minhash_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..cache import session_checkpoint_memo
    from ..source_tags import sf_content_tag

    return session_checkpoint_memo(
        spark,
        ("minhash_pairs", sf_dir, sf_content_tag(sf_dir, "documents")),
        lambda: _minhash_pairs_plan(spark, sf_dir),
    )


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_verified_pairs(spark, sf_dir)


def _minhash_pairs_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # shingle checkpoint consumed by the signature pipeline AND the
    # verify join
    sh = _doc_shingles(spark, sf_dir)
    # both base hashes computed in-array, exploded as precomputed
    # structs (see q_ngram_jaccard_pairs)
    ex = sh.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(s, x -> named_struct("
                f"'h1', pmod(xxhash64(x), {_HASH_MOD}), "
                f"'h2', pmod(xxhash64(1, x), {_HASH_MOD})))"
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.h1").alias("h1"), F.col("p.h2").alias("h2"))
    sig = _minhash_signature(ex)
    rows_per_band = _MINHASH_K // _MINHASH_BANDS
    bands = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.xxhash64(
                    *[f"h{bi * rows_per_band + r}" for r in range(rows_per_band)]
                ).alias("val"),
            )
            for bi in range(_MINHASH_BANDS)
        ]
    )
    banded = sig.select("doc_id", F.explode(bands).alias("b")).select(
        "doc_id", F.col("b.band").alias("band"), F.col("b.val").alias("val")
    )
    left = banded.select(F.col("doc_id").alias("a_id"), "band", "val")
    right = banded.select(F.col("doc_id").alias("b_id"), "band", "val")
    cand = (
        left.join(right, ["band", "val"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    return _verify_jaccard(cand, sh)


# ---------------------------------------------------------------------------
# 4. SimHash with a portable polynomial hash -- the oracle replays the
#    FULL pipeline (hash, bit-majority, banding, hamming, verify) in SQL.
# ---------------------------------------------------------------------------

#: Mersenne prime 2^31-1: two independent 31-bit polynomial hashes
#: (multipliers 31 and 37) are combined into one 62-bit feature hash
#: ``h1 * 2^31 + h2`` -- the widest portable hash both engines can
#: evaluate without int64 overflow even under Spark ANSI mode
#: (max intermediate: (p-1)*37 + 127 < 2^37; h1*2^31 + h2 < 2^62).

#: Portable token hash: md5(token), then two DISJOINT 14-hex-digit
#: (56-bit) slices reduced mod 2^31-1 -> two independent 31-bit hashes
#: per token. Hashing is two-level -- each token hashed ONCE per
#: occurrence, then a shingle feature combines its three token hashes
#: arithmetically. md5 is a native function on both engines, so the
#: Spark hot path has NO per-character lambda work (the earlier
#: char-fold polynomial hash spent ~2.6s of interpreted higher-order
#: lambdas at sf0.1; this form is a codegen'd md5 + conv per token).
#: Spark parses the hex slice with conv() (inline in q_simhash_pairs,
#: over a single md5 array); DuckDB has no hex-parse function so the
#: oracle folds the 14 hex digits -- fine, the oracle only ever runs
#: at sf0.01.
#: combine three token hashes into one shingle feature hash; max
#: intermediate = (p-1)*37 + (p-1) < 2^37, no int64 overflow. `{t0}`,
#: `{t1}`, `{t2}` are the token-hash terms in engine-local indexing.
_COMBINE3 = "(({t0} * {mult} + {t1}) % {mod} * {mult} + {t2}) % {mod}"


def _combine62(c1: str, c2: str) -> str:
    """Two 31-bit combined hashes -> one 62-bit feature hash."""
    return f"(({c1}) * CAST({_HASH_SHIFT} AS BIGINT) + ({c2}))"


def _simhash_sql() -> str:
    bit_sums = ",\n           ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS c{j}"
        for j in range(_SIMHASH_BITS)
    )
    assemble = " + ".join(
        f"(CASE WHEN c{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(_SIMHASH_BITS)
    )
    bits_per_band = _SIMHASH_BITS // _SIMHASH_BANDS
    mask = (1 << bits_per_band) - 1
    band_eq = " OR ".join(
        f"(a.simhash >> {bi * bits_per_band}) & {mask} = (b.simhash >> {bi * bits_per_band}) & {mask}"
        for bi in range(_SIMHASH_BANDS)
    )
    combine = _combine62(
        _COMBINE3.format(t0="th1[i]", t1="th1[i+1]", t2="th1[i+2]", mult=31, mod=_HASH_MOD),
        _COMBINE3.format(t0="th2[i]", t1="th2[i+1]", t2="th2[i+2]", mult=37, mod=_HASH_MOD),
    )
    return rf"""
  WITH simw AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '{_WS_CLASS}') AS w
    FROM documents
  ),
  simth AS (
    SELECT doc_id,
           list_transform(w, tok -> {_hash_duck(1)}) AS th1,
           list_transform(w, tok -> {_hash_duck(15)}) AS th2
    FROM simw
  ),
  hashed AS (
    SELECT doc_id,
           unnest([{combine} for i in range(1, len(th1) - 1)]) AS h
    FROM simth
  ),
  bitsum AS (
    SELECT doc_id,
           {bit_sums}
    FROM hashed GROUP BY doc_id
  ),
  sig AS (
    SELECT doc_id, {assemble} AS simhash FROM bitsum
  ),
  cand AS (
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE ({band_eq})
      AND bit_count(xor(a.simhash, b.simhash)) <= {_SIMHASH_HAMMING}
  ),
  {_SHINGLES_CTE.lstrip()},
  verified AS (
    SELECT c.a_id, c.b_id, c.hamming,
           CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
             / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) AS jaccard
    FROM cand c
    JOIN sh sa ON sa.doc_id = c.a_id
    JOIN sh sb ON sb.doc_id = c.b_id
  )
  SELECT a_id, b_id, hamming, jaccard
  FROM verified WHERE jaccard >= {_JACCARD_THRESHOLD}
  ORDER BY a_id, b_id
"""


SIMHASH_SQL = _simhash_sql()


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    # Round-9 rewrite: the array-transform spelling evaluated FOUR
    # interpreted lambda passes per token (md5, two conv slices, the
    # trigram combine) -- higher-order functions never enter codegen
    # (measured ~2.9s isolated at sf0.1, ~1.2s after). Explode tokens
    # FIRST so md5/conv run as codegen'd columns, then build each
    # trigram with two lead() steps in one doc-partitioned window; the
    # bit-sum aggregate below reuses that exchange (same clustering).
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), _WS_CLASS)).alias(
            "pos", "tok"
        ),
    )
    # one md5 per token; both 31-bit hashes slice the same digest
    th = toks.select(
        "doc_id",
        "pos",
        F.expr(
            f"CAST(conv(substring(md5(tok), 1, 14), 16, 10) AS BIGINT)"
            f" % {_HASH_MOD}"
        ).alias("h1"),
        F.expr(
            f"CAST(conv(substring(md5(tok), 15, 14), 16, 10) AS BIGINT)"
            f" % {_HASH_MOD}"
        ).alias("h2"),
    )
    wl = Window.partitionBy("doc_id").orderBy("pos")
    tri = th.select(
        "doc_id",
        "h1",
        "h2",
        F.lead("h1", 1).over(wl).alias("h1b"),
        F.lead("h1", 2).over(wl).alias("h1c"),
        F.lead("h2", 1).over(wl).alias("h2b"),
        F.lead("h2", 2).over(wl).alias("h2c"),
    )
    c1 = _COMBINE3.format(t0="h1", t1="h1b", t2="h1c", mult=31, mod=_HASH_MOD)
    c2 = _COMBINE3.format(t0="h2", t1="h2b", t2="h2c", mult=37, mod=_HASH_MOD)
    # rows whose 2-ahead lead is NULL are the tail of each doc (and
    # docs under 3 tokens vanish entirely) -- identical to the old
    # CASE size(th1) < 3 guard + sequence(1, size - 2) enumeration
    hashed = tri.filter(F.col("h1c").isNotNull()).select(
        "doc_id", F.expr(_combine62(c1, c2)).alias("h")
    )
    # bit-majority via plain bit sums: bit j set <=> 2*sum_j > n, the
    # same predicate as the oracle's sum(+-1) > 0 spelling but with
    # branch-free aggregates (halves the codegen'd expression size)
    # the 64 bit sums, the 64-term majority fold and the band array are
    # built as SQL STRINGS and handed to the JVM in a handful of calls:
    # the previous per-bit Column loops created ~700 JVM expression
    # objects one py4j round trip at a time, which dominated the
    # query's CONSTRUCTION wall (driver-side, guide §7.3) — the
    # resulting expressions are identical, only their assembly changed
    bit_sums = [
        F.expr(f"sum(shiftright(h, {j}) & 1) AS c{j}")
        for j in range(_SIMHASH_BITS)
    ]
    bitsum = hashed.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("nfeat"), *bit_sums
    )
    simhash_sql = " + ".join(
        f"(CASE WHEN c{j} * 2 > nfeat THEN {1 << j}L ELSE 0L END)"
        for j in range(_SIMHASH_BITS)
    )
    # one row per doc; NOT cached -- the band self-join's two branches
    # are byte-identical subplans, so Spark materializes the shuffle
    # once and reads it twice (ReusedExchange; pinned by
    # tests/test_plan_shapes.py). Explicit caching here cost ~2s per
    # bench run in re-materialization without saving any work.
    sig = bitsum.selectExpr(
        "doc_id", f"CAST({simhash_sql} AS BIGINT) AS simhash"
    )

    bits_per_band = _SIMHASH_BITS // _SIMHASH_BANDS
    mask = (1 << bits_per_band) - 1
    bands = F.expr(
        "array(" + ", ".join(
            f"named_struct('band', {bi}, "
            f"'val', shiftright(simhash, {bi * bits_per_band}) & {mask})"
            for bi in range(_SIMHASH_BANDS)
        ) + ")"
    )
    banded = sig.select("doc_id", "simhash", F.explode(bands).alias("b")).select(
        "doc_id", "simhash", F.col("b.band").alias("band"), F.col("b.val").alias("val")
    )
    left = banded.select(
        F.col("doc_id").alias("a_id"), F.col("simhash").alias("sim_a"), "band", "val"
    )
    right = banded.select(
        F.col("doc_id").alias("b_id"), F.col("simhash").alias("sim_b"), "band", "val"
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    cand = (
        left.join(right, ["band", "val"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", hamming.alias("hamming"))
        .filter(F.col("hamming") <= _SIMHASH_HAMMING)
        .distinct()
    )
    # the hamming XOR-popcount prefilter above keeps the candidate set
    # SMALL before the exact verify, so the intersect runs on raw
    # string arrays: it only ever evaluates on |candidates| joined rows
    # (cand broadcasts; the shingle frame streams through). The old
    # hash-the-arrays-first step paid an interpreted transform over
    # EVERY shingle in the corpus to cheapen intersects that the
    # prefilter had already made rare -- strictly more work (round-9;
    # string intersects also match the oracle exactly, no collision
    # caveat). hamming rides through the verify join, so cand is
    # consumed exactly once -- no cache, no re-join.
    sh = _doc_shingles(spark, sf_dir)
    return (
        _verify_jaccard(cand, sh)
        .select("a_id", "b_id", "hamming", "jaccard")
    )


# ---------------------------------------------------------------------------
# 5. Embedding-cosine near-dup pairs: distributed block-grid matmul.
#
# The naive spelling (pair self-join + per-pair expression fold) costs
# |pairs| * dim interpreted lambda steps -- measured 38s for 2000
# vectors at sf0.1. The round-1 version collected the corpus to the
# driver and broadcast the full matrix -- fast locally, a guaranteed
# driver OOM at scale. This version keeps everything distributed:
#
# - each vector is assigned a block ``vec_id % NB``;
# - each vector is replicated to the NB grid cells (g1, g2) its block
#   participates in (classic all-pairs "grid" scheme), so every
#   unordered block pair lands in exactly one ``applyInPandas`` group;
# - each group computes its (|A| x |B|) slice of the Gram matrix with
#   one BLAS matmul and emits only the (a_id, b_id) pairs over the
#   threshold. Ids only, so cross-engine comparison never touches
#   last-ulp float differences between BLAS and the oracle's
#   sequential fold (a pair would have to sit within ~1e-12 of the
#   threshold to disagree; tests pin the actual data).
#
# Cost model at scale: the O(n^2) pair work is inherent in the EXACT
# all-pairs contract; what matters is that it is sharded. Per-task
# memory = 2 blocks = 2*n/NB vectors; shuffle volume = NB * corpus
# (replication factor NB); tasks = NB*(NB+1)/2, all independent. Pick
# NB so a block fits executor memory (NB grows as sqrt of task-count
# head-room). No driver collect, no full-corpus broadcast anywhere.
# When approximate recall is acceptable the same BLAS kernel runs per
# LSH/IVF bucket instead of per grid cell (see similarity.py's ANN
# paths); the exact grid is the oracle-checkable contract here.
# ---------------------------------------------------------------------------

#: DuckDB sequential fold dot product over DOUBLE lists
_DOT_DUCK = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
    " list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i])),"
    " (acc, x) -> acc + x)"
)

EMBEDDING_COSINE_SQL = f"""
  WITH e AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
    FROM embeddings
  ),
  n AS (
    SELECT vec_id, v, sqrt({_DOT_DUCK.format(a="v", b="v")}) AS nrm
    FROM e
  ),
  pairs AS (
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           {_DOT_DUCK.format(a="a.v", b="b.v")} / (a.nrm * b.nrm) AS cosine
    FROM n a JOIN n b ON a.vec_id < b.vec_id
  )
  SELECT a_id, b_id
  FROM pairs WHERE cosine >= {_COSINE_THRESHOLD}
  ORDER BY a_id, b_id
"""


def _dot(a, b):
    """Sequential-fold dot product (index order, double accumulate) --
    mirrors the DuckDB fold so scalar results are bitwise identical.
    Used where per-row dot products are cheap (top-k search); the
    all-pairs scan below uses BLAS instead."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


# ---------------------------------------------------------------------------
# 2c. SEMANTIC decontamination: the embedding-space counterpart of the
# n-gram variants above -- a train document whose embedding is too
# close (cosine) to an eval/benchmark document is a paraphrase-level
# leak that shingle overlap can miss entirely. Output is the flagged
# (train, eval, cosine) pair list.
#
# Scale shape: the eval side is bounded by construction (a benchmark
# suite, not a corpus), so it REPLICATES -- each train block receives
# the full eval set through one grouped shuffle (replication cost =
# NB x |eval|, tunable to the cluster), and each group runs ONE
# vectorized kernel. No driver collect, no all-pairs shuffle. The
# kernel accumulates dot products in strict index order
# (similarity._seq_matmul), so the emitted cosine is bitwise identical
# to the oracle's list_reduce fold -- the full pair table hash-checks,
# not just booleans. (The testdata has no zero-norm vectors, verified
# across sf0.001-0.1, so the unguarded division matches the oracle's.)
# The vec_id % 10 eval split mirrors DECONTAMINATE_SQL; in production
# the eval side is its own table.
# ---------------------------------------------------------------------------

DECONTAMINATE_SEMANTIC_SQL = f"""
  WITH e AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
    FROM embeddings
  ),
  n AS (
    SELECT vec_id, v, sqrt({_DOT_DUCK.format(a="v", b="v")}) AS nrm
    FROM e
  ),
  t AS (SELECT * FROM n WHERE vec_id % 10 <> 0),
  ev AS (SELECT * FROM n WHERE vec_id % 10 = 0),
  scored AS (
    SELECT t.vec_id AS train_id, ev.vec_id AS eval_id,
           {_DOT_DUCK.format(a="t.v", b="ev.v")} / (t.nrm * ev.nrm)
             AS cosine
    FROM t JOIN ev ON TRUE
  )
  SELECT train_id, eval_id, cosine
  FROM scored WHERE cosine >= {_COSINE_THRESHOLD}
  ORDER BY train_id, eval_id
"""


def q_decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from .similarity import _seq_matmul, _seq_norms

    nb = _COSINE_GRID_BLOCKS
    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    train = vecs.filter(F.col("vec_id") % 10 != 0).select(
        "vec_id", "v", (F.col("vec_id") % nb).alias("blk"), F.lit(0).alias("role")
    )
    ev = vecs.filter(F.col("vec_id") % 10 == 0).select(
        "vec_id",
        "v",
        F.explode(F.array(*[F.lit(i) for i in range(nb)])).alias("blk"),
        F.lit(1).alias("role"),
    )
    both = train.unionByName(ev)

    schema = T.StructType(
        [
            T.StructField("train_id", T.LongType()),
            T.StructField("eval_id", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def block(key: tuple, pdf: "pd.DataFrame") -> "pd.DataFrame":
        tr = pdf[pdf["role"] == 0]
        evl = pdf[pdf["role"] == 1]
        if len(tr) == 0 or len(evl) == 0:
            return pd.DataFrame({"train_id": [], "eval_id": [], "cosine": []})
        tm = np.stack(tr["v"].to_numpy()).astype(np.float64)
        em = np.stack(evl["v"].to_numpy()).astype(np.float64)
        # oracle arithmetic exactly: dot / (nrm_t * nrm_e), fold order
        cos = _seq_matmul(tm, em) / (
            _seq_norms(tm)[:, None] * _seq_norms(em)[None, :]
        )
        ti, ei = np.nonzero(cos >= _COSINE_THRESHOLD)
        return pd.DataFrame(
            {
                "train_id": tr["vec_id"].to_numpy()[ti],
                "eval_id": evl["vec_id"].to_numpy()[ei],
                "cosine": cos[ti, ei],
            }
        )

    return (
        both.groupBy("blk")
        .applyInPandas(block, schema=schema)
    )


# Two consumers: the all-pairs cosine query blocks on a triangular
# grid (NB*(NB+1)/2 = 36 independent tasks locally); semantic
# decontamination reuses it as a plain NB-way modulus split of the
# train side (8 tasks, eval side replicated into each).
_COSINE_GRID_BLOCKS = 8


def q_embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    nb = _COSINE_GRID_BLOCKS
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        (F.col("vec_id") % nb).alias("blk"),
    )
    # Replicate each vector to every grid cell its block participates
    # in: a vector in block b lands in cell (min(b,o), max(b,o)) for
    # each o in 0..NB-1, so each unordered block pair is one group and
    # every vector appears in it exactly once (no pair dedup needed).
    other = F.explode(F.array(*[F.lit(i) for i in range(nb)])).alias("other")
    rep = e.select("vec_id", "v", "blk", other).select(
        "vec_id",
        "v",
        "blk",
        F.least("blk", "other").alias("g1"),
        F.greatest("blk", "other").alias("g2"),
    )

    schema = T.StructType(
        [T.StructField("a_id", T.LongType()), T.StructField("b_id", T.LongType())]
    )

    def grid_cell(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        g1, g2 = key
        ids = pdf["vec_id"].to_numpy()
        mat = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        nrm = np.linalg.norm(mat, axis=1, keepdims=True)
        # zero-norm vectors stay all-zero (dot = 0 < threshold) instead
        # of propagating NaN through the comparisons
        mat /= np.where(nrm == 0.0, 1.0, nrm)
        if g1 == g2:
            a_rows = b_rows = np.arange(len(ids))
        else:
            a_rows = np.nonzero((pdf["blk"] == g1).to_numpy())[0]
            b_rows = np.nonzero((pdf["blk"] == g2).to_numpy())[0]
        sims = mat[a_rows] @ mat[b_rows].T  # one BLAS call per cell
        bi, bj = np.nonzero(sims >= _COSINE_THRESHOLD)
        a = ids[a_rows][bi]
        b = ids[b_rows][bj]
        if g1 == g2:
            # each unordered pair appears as (i,j) AND (j,i): keep one
            keep = a < b
            lo, hi = a[keep], b[keep]
        else:
            # each cross-block pair appears exactly once; ids interleave
            # across blocks, so orient rather than filter
            lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"a_id": lo, "b_id": hi})

    return (
        rep.groupBy("g1", "g2")
        .applyInPandas(grid_cell, schema=schema)
    )


# ---------------------------------------------------------------------------
# 6. Duplicate-cluster resolution: pair list -> connected components.
# Near-dup detectors emit PAIRS; deduping a corpus needs CLUSTERS (pick
# one canonical doc per component, drop the rest). Labels converge by
# min-label propagation: each round every node takes the min label in
# its neighborhood; rounds needed = graph diameter. Verified near-dup
# components are near-cliques (every surviving pair passed the exact
# Jaccard check), so diameter is small and 2-3 rounds suffice; for
# general graphs the alternating large-star/small-star transform is the
# O(log n)-round scale path (same join shape per round). Each round is
# one shuffle of (edge, label) keyed by node -- never the text -- and
# lineage is cut per round with localCheckpoint so plans stay flat.
# ---------------------------------------------------------------------------


def _canon_edges(e: DataFrame) -> DataFrame:
    """Undirected edge set in canonical form: (s, d) with s < d,
    self-loops dropped, distinct."""
    return (
        e.select(F.least("s", "d").alias("s"), F.greatest("s", "d").alias("d"))
        .filter(F.col("s") != F.col("d"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star: every node connects its strictly-LARGER neighbors to
    the minimum of its closed neighborhood. Processing each undirected
    edge from its smaller endpoint emits it exactly once."""
    adj = edges.unionByName(
        edges.select(F.col("d").alias("s"), F.col("s").alias("d"))
    )
    mins = adj.groupBy("s").agg(F.min("d").alias("mn"))
    m = F.least(F.col("mn"), F.col("s"))
    big = adj.filter(F.col("d") > F.col("s")).join(mins, "s")
    return _canon_edges(big.select(F.col("d").alias("s"), m.alias("d")))


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star: every node connects its smaller neighbors (and
    itself) to the minimum of those. Processing each edge from its
    LARGER endpoint emits it exactly once."""
    adj = edges.select(F.greatest("s", "d").alias("s"), F.least("s", "d").alias("d"))
    mins = adj.groupBy("s").agg(F.min("d").alias("mn"))  # mn < s by canon
    rewired = adj.join(mins, "s").select(
        F.col("d").alias("s"), F.col("mn").alias("d")
    )
    center = mins.select("s", F.col("mn").alias("d"))
    return _canon_edges(rewired.unionByName(center))


def cluster_components(pairs: DataFrame, max_rounds: int = 20) -> DataFrame:
    """(a_id, b_id) duplicate pairs -> (doc_id, cluster_id) where
    cluster_id = min doc_id of the connected component. Only docs that
    appear in some pair are emitted (singletons need no resolution).

    Alternating large-star/small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond"): each round rewires
    the edge set toward per-component stars centered at the component
    minimum, converging in O(log n) rounds REGARDLESS of graph
    diameter -- a 10k-node path converges in ~6 rounds where plain
    min-label propagation needs 10k (the round-4 scale caveat this
    replaces). Near-clique dup graphs converge in 2-3 rounds, so the
    common case pays nothing for the worst-case guarantee."""
    spark = pairs.sparkSession
    # materialize the pair list ONCE -- both the node universe and the
    # edge set derive from it, and without this every round (and the
    # node scan) re-executes the full upstream pair-detection pipeline
    idpairs = pairs.select("a_id", "b_id").localCheckpoint(eager=True)
    nodes = (
        idpairs.select(F.col("a_id").alias("node"))
        .unionByName(idpairs.select(F.col("b_id").alias("node")))
        .distinct()
    )
    edges = _canon_edges(
        idpairs.select(F.col("a_id").alias("s"), F.col("b_id").alias("d"))
    ).localCheckpoint(eager=True)
    # the contraction loop shuffles only edges -- usually orders of
    # magnitude smaller than the corpus. Size its partition count to
    # the EDGE data (one partition per ~50k edges), not the session
    # default: a near-dup graph with hundreds of edges must not pay
    # 32 tasks x ~4 jobs x rounds of scheduling overhead, while a
    # billion-edge graph still fans out
    n_edges = edges.count()
    nparts = max(1, min(int(spark.conf.get("spark.sql.shuffle.partitions")),
                        n_edges // 50_000 + 1))
    converged = n_edges == 0
    with shuffle_partitions(spark, nparts):
        for _ in range(max_rounds):
            if converged:
                break
            # lazy checkpoint: the probe aggregation below is the first
            # action on the new edge set, so it materializes the
            # checkpoint as a side effect -- one Spark job per round
            # instead of two (checkpoint + probe)
            edges = _small_star(_large_star(edges)).localCheckpoint(eager=False)
            # Convergence is detected DIRECTLY, in one two-level
            # aggregation per round: a canonical edge set is a fixed
            # point of small-star∘large-star exactly when it is a star
            # forest (every node is a center or a leaf with ONE center,
            # never both; centers < leaves by canon, so each center is
            # its component's minimum -- and the transforms preserve
            # connectivity, so those components ARE the input's).
            # Checking the structural invariant itself, instead of
            # comparing (count, checksum) against the previous round,
            # saves the extra confirming round, lets an already-star
            # input converge in one round, and removes the 64-bit
            # XOR-collision false-convergence window the old checksum
            # comparison carried (round-5 advice).
            probe = edges.select(
                F.col("d").alias("node"), F.lit(0).alias("role")
            ).unionByName(
                edges.select(F.col("s").alias("node"), F.lit(1).alias("role"))
            )
            # edges are distinct+canonical, so leaf rows per node ==
            # distinct centers per node
            per_node = probe.groupBy("node").agg(
                F.sum(F.when(F.col("role") == 0, 1).otherwise(0)).alias("k"),
                F.max("role").alias("is_center"),
            )
            bad_node = (F.col("k") > 1) | (
                (F.col("k") >= 1) & (F.col("is_center") == 1)
            )
            viol = per_node.agg(F.sum(bad_node.cast("int"))).collect()[0][0]
            converged = int(viol or 0) == 0
    if not converged:
        # partial star sets are WRONG (a component would be reported as
        # several clusters) -- fail loudly rather than return them.
        # O(log n) convergence makes max_rounds=20 cover any feasible
        # graph; hitting this means the input is malformed.
        raise RuntimeError(
            f"cluster_components did not converge in {max_rounds} rounds "
            f"({n_edges} edges); raise max_rounds"
        )
    # converged == the star-forest invariant HELD (it is the
    # convergence test), so labels below are safe by construction
    leaf_labels = edges.select(
        F.col("d").alias("node"), F.col("s").alias("lbl")
    )
    return (
        nodes.join(leaf_labels, "node", "left")
        .select(
            F.col("node").alias("doc_id"),
            F.coalesce("lbl", "node").alias("cluster_id"),
        )
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clusters over the MinHash-LSH verified pairs (the scale path;
    identical to the exact pair list on this data -- the minhash oracle
    asserts that)."""
    pairs = minhash_verified_pairs(spark, sf_dir).select("a_id", "b_id")
    return cluster_components(pairs)


#: DuckDB oracle: transitive closure by recursive CTE (reach set per
#: node), cluster_id = min(node, min reachable node). Exponential-ish
#: on big components but exact at test scale.
# ---------------------------------------------------------------------------
# 9b. PageRank over the dup graph -- the iterative-algorithm showcase,
# made EXACTLY oracle-checkable by working in integer parts-per-million
# with floored divisions: 5 fixed iterations of
#   p'(v) = 150000 + (850000 * sum_{u->v}(p(u) div outdeg(u))) div 10^6
# are deterministic on both engines (floor div on non-negative BIGINTs
# is `div` in Spark and `//` in DuckDB), so the driver hash-compares
# the per-node ranks bit-for-bit -- no float fixed point, no
# convergence tolerance. The flooring makes this a deterministic
# fixed-point APPROXIMATION of damped PageRank (error < 1 ppm per
# node-iteration), which is the right trade for a verifiable engine
# primitive. Spark side: one join+agg per iteration over the memoized
# pair feed, localCheckpoint per round so plans stay flat (the
# cluster_components pattern); per-iteration sums are bounded by
# in-degree * 10^6, safely inside BIGINT for the bounded-degree dup
# graphs this runs on. Oracle: the same five iterations UNROLLED as
# CTEs over the brute-force dup pairs.
# ---------------------------------------------------------------------------

_PAGERANK_ITERS = 5


def _pagerank_sql() -> str:
    base = f"""
  edges AS (
    SELECT a_id AS s, b_id AS d FROM dup
    UNION ALL SELECT b_id AS s, a_id AS d FROM dup
  ),
  deg AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS outdeg FROM edges GROUP BY s),
  it0 AS (SELECT s AS v, CAST(1000000 AS BIGINT) AS p FROM deg)"""
    its = []
    for i in range(1, _PAGERANK_ITERS + 1):
        its.append(
            f"""
  it{i} AS (
    SELECT e.d AS v,
           150000 + (850000 * SUM(r.p // g.outdeg)) // 1000000 AS p
    FROM edges e JOIN it{i - 1} r ON r.v = e.s JOIN deg g ON g.s = e.s
    GROUP BY e.d)"""
        )
    return (
        f"WITH {_SHINGLES_CTE},\n"
        + """
  dup AS (
    SELECT a.doc_id AS a_id, b.doc_id AS b_id
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
          >= """
        + str(_JACCARD_THRESHOLD)
        + "),"
        + base
        + ","
        + ",".join(its)
        + f"""
  SELECT v AS doc_id, CAST(p AS BIGINT) AS rank_ppm
  FROM it{_PAGERANK_ITERS} ORDER BY doc_id"""
    )


PAGERANK_SQL = _pagerank_sql()


def q_pagerank_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = minhash_verified_pairs(spark, sf_dir).select("a_id", "b_id")
    edges = pairs.select(
        F.col("a_id").alias("s"), F.col("b_id").alias("d")
    ).unionByName(
        pairs.select(F.col("b_id").alias("s"), F.col("a_id").alias("d"))
    )
    deg = edges.groupBy("s").agg(F.count(F.lit(1)).alias("outdeg"))
    # edges+degree are reused every iteration: checkpoint once
    ed = (
        edges.join(deg, "s")
        .select("s", "d", "outdeg")
        .localCheckpoint(eager=True)
    )
    ranks = deg.select(
        F.col("s").alias("v"), F.lit(1_000_000).cast("bigint").alias("p")
    ).localCheckpoint(eager=True)
    # The iterations CHAIN as one lazy plan (r18): each round is one
    # join + one aggregate referencing the previous round once, so the
    # plan grows linearly in _PAGERANK_ITERS and the whole chain
    # executes as a single job. The old per-iteration eager
    # localCheckpoint ran one driver-blocking job per round and
    # materialized every intermediate rank table -- pure overhead for
    # a 5-deep lineage over the already-checkpointed edge table
    # (measured 1.27s -> 0.88s at sf0.1; results bit-identical).
    # Checkpointing stays where it pays: ed/ranks above sever the
    # expensive minhash lineage that every round re-reads.
    for _ in range(_PAGERANK_ITERS):
        contrib = ed.join(ranks, ed.s == ranks.v).select(
            "d", F.expr("p div outdeg").alias("c")
        )
        ranks = (
            contrib.groupBy(F.col("d").alias("v"))
            .agg(
                (
                    F.lit(150_000)
                    + F.expr("(850000 * sum(c)) div 1000000")
                )
                .cast("bigint")
                .alias("p")
            )
        )
    return ranks.select(
        F.col("v").alias("doc_id"), F.col("p").alias("rank_ppm")
    )


CLUSTER_COMPONENTS_SQL = f"""
  WITH RECURSIVE {_SHINGLES_CTE},
  dup AS (
    SELECT a.doc_id AS a_id, b.doc_id AS b_id
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
          >= {_JACCARD_THRESHOLD}
  ),
  edges AS (
    SELECT a_id AS s, b_id AS d FROM dup
    UNION ALL
    SELECT b_id AS s, a_id AS d FROM dup
  ),
  walk(node, reach) AS (
    SELECT s, d FROM edges
    UNION
    SELECT w.node, e.d FROM walk w JOIN edges e ON e.s = w.reach
  )
  SELECT node AS doc_id, LEAST(node, MIN(reach)) AS cluster_id
  FROM walk GROUP BY node ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# 8. Repeated-span detection: the SUBSTRING-level exact-dedup building
# block (the doc-level detectors above can't see a paragraph pasted
# into otherwise-distinct documents -- the case "Deduplicating Training
# Data Makes Language Models Better" [Lee et al. 2022] showed matters
# for LLM corpora; their suffix-array approach finds arbitrary-length
# repeats, this is the fixed-width n-gram-window variant that
# distributes as a plain inverted index). Every 13-token window is
# md5'd INSIDE the row (transform over a position sequence -- no
# O(len^2) array replication through an explode), then one hash-agg
# shuffle on the fixed-width span key counts occurrences and distinct
# docs; only spans seen in >= 2 distinct docs survive. Shuffles
# (doc_id, 32-char md5) pairs, never text; map-side partial
# aggregation collapses within-doc repeats before the wire. md5 is
# bit-identical across Spark and DuckDB, so the full pipeline --
# tokenize, window, hash, count -- is oracle-checked.
# ---------------------------------------------------------------------------

_SPAN_TOKENS = 13

REPEATED_SPANS_SQL = f"""
  WITH toks AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '{_WS_CLASS}') AS t
    FROM documents
  ),
  spans AS (
    SELECT doc_id,
           md5(array_to_string(t[p:p+{_SPAN_TOKENS - 1}], ' ')) AS span_md5
    FROM (
      SELECT doc_id, t,
             unnest(generate_series(1, len(t) - {_SPAN_TOKENS - 1})) AS p
      FROM toks
      WHERE len(t) >= {_SPAN_TOKENS}
    )
  )
  SELECT span_md5,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(COUNT(*) AS BIGINT) AS n_occurrences
  FROM spans
  GROUP BY span_md5
  HAVING COUNT(DISTINCT doc_id) >= 2
  ORDER BY span_md5
"""


def q_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # guard: Spark's sequence(1, stop) DESCENDS for stop < 1 (sequence
    # (1,0) = [1,0], and slice at position 0 throws), so short docs
    # must short-circuit to an empty span array
    spans = F.expr(
        f"CASE WHEN size(t) >= {_SPAN_TOKENS} THEN "
        f"transform(sequence(1, size(t) - {_SPAN_TOKENS - 1}),"
        f" p -> md5(concat_ws(' ', slice(t, p, {_SPAN_TOKENS}))))"
        f" ELSE array() END"
    )
    exploded = (
        docs.select(
            "doc_id", F.split(F.trim(F.col("text")), _WS_CLASS).alias("t")
        )
        .select("doc_id", F.explode(spans).alias("span_md5"))
    )
    return (
        exploded.groupBy("span_md5")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= 2)
    )


# ---------------------------------------------------------------------------
# Triangle census of the near-dup graph: how much of the duplicate
# structure is mutually-confirming (a~b, b~c, a~c all verified) vs
# chain-like -- a standard graph-quality signal for dedup output
# (near-dup clusters from genuine templates are near-cliques; sparse
# chains suggest threshold borderliners). Spark shape: the canonical
# a<b<c ordered 3-way self-join -- each triangle counted exactly once,
# join keys are node ids so at scale both joins hash-partition on the
# shared endpoint; no enumeration of wedges beyond the join. Output is
# per-cluster triangle counts (cluster = connected component), so the
# whole table hash-verifies.
# ---------------------------------------------------------------------------

TRIANGLE_CENSUS_SQL = """
  WITH RECURSIVE {shingles},
  pairs AS (
    SELECT a.doc_id AS a_id, b.doc_id AS b_id
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
          >= {thr}
  ),
  tri AS (
    SELECT e1.a_id AS a, e1.b_id AS b, e2.b_id AS c
    FROM pairs e1
    JOIN pairs e2 ON e2.a_id = e1.b_id
    JOIN pairs e3 ON e3.a_id = e1.a_id AND e3.b_id = e2.b_id
  ),
  und AS (
    SELECT a_id AS s, b_id AS d FROM pairs
    UNION ALL
    SELECT b_id AS s, a_id AS d FROM pairs
  ),
  walk(node, reach) AS (
    SELECT s, d FROM und
    UNION
    SELECT w.node, e.d FROM walk w JOIN und e ON e.s = w.reach
  ),
  comp AS (
    SELECT node AS x, LEAST(node, MIN(reach)) AS cluster_id
    FROM walk GROUP BY node
  )
  SELECT c.cluster_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM tri t JOIN comp c ON c.x = t.a
  GROUP BY 1
  ORDER BY 1
""".format(shingles=_SHINGLES_CTE, thr=_JACCARD_THRESHOLD)


def q_triangle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the shared memoized feed materializes the pair list once for the
    # whole dedup family: the three triangle join legs plus the
    # clustering pass all read the checkpointed int pairs (before the
    # round-6 checkpoint this re-ran the full minhash pipeline four
    # times, 7.0s; the round-7 session-wide feed also stops the OTHER
    # family members from paying the ~2.2s pipeline again)
    pairs = minhash_verified_pairs(spark, sf_dir).select("a_id", "b_id")
    e1 = pairs.select(F.col("a_id").alias("a"), F.col("b_id").alias("b"))
    e2 = pairs.select(F.col("a_id").alias("b"), F.col("b_id").alias("c"))
    e3 = pairs.select(F.col("a_id").alias("a"), F.col("b_id").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"]).select("a", "b", "c")
    clusters = cluster_components(pairs).select(
        F.col("doc_id").alias("a"), "cluster_id"
    )
    return (
        tri.join(clusters, "a")
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


# ---------------------------------------------------------------------------
# 10. Prefix-filtered exact Jaccard join (PPJoin-style blocking). The
# inverted-index baseline (q_ngram_jaccard_pairs) joins EVERY shingle
# posting; prefix filtering joins only each document's rarest few:
# order the universe by (global df, shingle) -- a total order both
# docs compute identically -- and keep the first
# |s| - ceil(t*|s|) + 1 shingles per doc. Two sets with Jaccard >= t
# MUST share a prefix element under any common total order (standard
# prefix-filtering completeness, e.g. Chaudhuri et al. 2006 /
# Xiao et al. PPJoin 2008), so the candidate join over ~10% of the
# postings (t=0.9) loses no pair -- and the driver PROVES it: the
# oracle is the brute-force all-pairs Jaccard, so a hash match
# certifies completeness, not just plausibility. At 100 TB the
# candidate shuffle carries (doc_id, shingle-hash) ints for the prefix
# postings only; rarest-first ordering makes each join group small
# (the most frequent shingles never block).
# ceil(0.9*|s|) is spelled in INTEGER arithmetic ((9*|s| + 9) DIV 10):
# a float ceil could round 0.9*|s| up across the integer boundary and
# silently shorten the prefix below the completeness bound.
# ---------------------------------------------------------------------------


def q_jaccard_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    sh = _doc_shingles(spark, sf_dir)
    # hash AFTER the explode so xxhash64 runs as a codegen'd column
    # (a transform() lambda is interpreted per element -- round-9
    # rewrite, ~1s at sf0.1); every downstream shuffle (df window,
    # rank window, candidate join) then carries (doc_id, int64) rows,
    # never 3-word shingle strings. (df, hash) is still a shared TOTAL
    # order over the shingle universe, which is all prefix-filter
    # completeness requires; a 2^-64 hash collision merges two items'
    # df counts, which can only ADD candidates, never lose a pair.
    ex = sh.select("doc_id", F.explode("s").alias("x")).select(
        "doc_id", F.xxhash64("x").alias("sh_hash")
    )
    # document frequency as a COUNT window over the hash (one shuffle,
    # no counts-table join back -- the posting list never rides through
    # a sort-merge join), then rank + set size in ONE doc-partitioned
    # window pass (both functions share the exchange)
    df_win = F.count(F.lit(1)).over(Window.partitionBy("sh_hash"))
    occ = ex.withColumn("df", df_win)
    w = Window.partitionBy("doc_id").orderBy("df", "sh_hash")
    ranked = occ.withColumn("pos", F.row_number().over(w)).withColumn(
        "n_sh", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
    )
    prefix_len = (
        F.col("n_sh")
        - F.expr("(9 * n_sh + 9) div 10")
        + F.lit(1)
    )
    prefix = ranked.filter(F.col("pos") <= prefix_len).select(
        "doc_id", "sh_hash"
    )
    a = prefix.select(F.col("doc_id").alias("a_id"), "sh_hash")
    b = prefix.select(F.col("doc_id").alias("b_id"), "sh_hash")
    cand = (
        a.join(b, "sh_hash")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    return _verify_jaccard(cand, sh)


QUERIES_EXPORT: dict[str, tuple[SparkQuery, str | None]] = {
    "dedup_jaccard_prefix_filter": (
        q_jaccard_prefix_filter,
        _EXACT_JACCARD_PAIRS_SQL,
    ),
    "dedup_containment_pairs": (q_containment_pairs, CONTAINMENT_SQL),
    "graph_pagerank_dup": (q_pagerank_dup, PAGERANK_SQL),
    "dedup_exact": (q_exact_dedup, EXACT_DEDUP_SQL),
    "dedup_repeated_spans": (q_repeated_spans, REPEATED_SPANS_SQL),
    "dedup_ngram_jaccard": (q_ngram_jaccard_pairs, _EXACT_JACCARD_PAIRS_SQL),
    "dedup_minhash_lsh": (q_minhash_lsh_pairs, _EXACT_JACCARD_PAIRS_SQL),
    "dedup_simhash": (q_simhash_pairs, SIMHASH_SQL),
    "dedup_embedding_cosine": (q_embedding_cosine_pairs, EMBEDDING_COSINE_SQL),
    "dedup_clusters": (q_dedup_clusters, CLUSTER_COMPONENTS_SQL),
    "dedup_decontaminate": (q_decontaminate, DECONTAMINATE_SQL),
    "dedup_decontaminate_bloom": (q_decontaminate_bloom, DECONTAMINATE_BLOOM_SQL),
    "dedup_incremental_batch": (q_incremental_dedup, INCREMENTAL_DEDUP_SQL),
    "dedup_triangle_census": (q_triangle_census, TRIANGLE_CENSUS_SQL),
    "dedup_decontaminate_semantic": (
        q_decontaminate_semantic,
        DECONTAMINATE_SEMANTIC_SQL,
    ),
}
