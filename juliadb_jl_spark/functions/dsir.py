"""DSIR-style importance resampling for pretraining-data selection
(Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling" — public NeurIPS paper).

Pipeline: hashed bag-of-n-gram features (unigrams + adjacent word
bigrams folded into B buckets) → smoothed bucket distributions for a
TARGET corpus (what you want more of) and the RAW corpus (what you
have) → per-document log importance weight
``logw(d) = Σ_b count_b(d) · (log p̂_target[b] − log p̂_raw[b])`` →
top-k selection via Gumbel keys, which samples without replacement
with probability ∝ exp(logw).

Determinism: bucketing is a pure function of the gram (native xxhash64
by default — the 100-TB path; ``hash_family="portable"`` switches to
the 31-bit fold over md5 hex that is bit-identical in any SQL engine,
making every stage oracle-checkable in DuckDB), and the Gumbel noise
is a pure function of the document key (``g = logw − ln(−ln(u))`` with
``u`` from the portable family), so selection is reproducible across
runs, engines, partition layouts, and appends.

Scale (100 TB): the corpus explodes ONCE into its grams; both bucket
distributions are B-sized (thousands of rows) and broadcast; scoring
is the explode + one broadcast join + one per-doc aggregation — the
corpus crosses a single shuffle keyed on the document id. Selection is
a sort().limit() the planner executes as TakeOrdered (no global sort).
The fitted log-ratio table is a tiny DataFrame you can persist and
reuse across ingest batches (append-stable: old documents never change
score or Gumbel key when new ones arrive).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from juliadb_jl_spark.functions.dedup import (_P31, _spread, perm_constants,
                                              portable_hash_md5)
from juliadb_jl_spark.functions.text import tokens

# Independent constant streams: bucketing and Gumbel noise use disjoint
# seed offsets so the two hash roles never correlate.
_BUCKET_SEED_OFF = 101
_GUMBEL_SEED_OFF = 211


def bucket_constants(seed: int = 1) -> tuple[int, int]:
    """(a, b) of the seeded permutation behind `gram_bucket` — exposed so
    oracle SQL can inline the identical literals."""
    a, b = perm_constants(1, seed=2 * seed + _BUCKET_SEED_OFF)
    return a[0], b[0]


def gumbel_constants(seed: int = 1) -> tuple[int, int]:
    """(a, b) of the permutation behind the per-document Gumbel key."""
    a, b = perm_constants(1, seed=2 * seed + _GUMBEL_SEED_OFF)
    return a[0], b[0]


def word_grams(col: Column, bigrams: bool = True,
               method: str = "arrow") -> Column:
    """Unigrams + (optionally) adjacent word bigrams of a text column as
    one array<string>. Empty/NULL text → empty array. Zero shuffle.

    The bigram build defaults to the fused Arrow byte-slice pass
    (`text.arrow_shingles` — same strings as the zip_with HOF form,
    which Catalyst evaluates interpreted per element; `method="expr"`
    keeps that form differential-tested). Unigrams stay native: the
    tokenizing split is codegen'd either way."""
    t = tokens(col)
    if not bigrams:
        return t
    if method == "arrow":
        from juliadb_jl_spark.functions.text import arrow_shingles
        return F.concat(t, arrow_shingles(col, 2))
    if method != "expr":
        raise ValueError(f"method must be 'arrow' or 'expr' "
                         f"(got {method!r})")
    n = F.size(t)
    bi = F.when(n >= 2,
                F.zip_with(F.slice(t, F.lit(1), n - 1),
                           F.slice(t, F.lit(2), n - 1),
                           lambda x, y: F.concat(x, F.lit(" "), y))) \
        .otherwise(F.array().cast("array<string>"))
    return F.concat(t, bi)


def gram_bucket(col: Column, n_buckets: int, seed: int = 1,
                hash_family: str = "xxhash64") -> Column:
    """Feature-hash one gram into [0, n_buckets).

    hash_family="xxhash64" (default): native JVM hash, fully codegen'd —
    the 100-TB path (same convention as MinHash/SimHash in
    functions/dedup.py). hash_family="portable": 31-bit fold of the
    gram's md5 hex (the md5 round is what buys uniformity for
    natural-language grams) + a seeded linear permutation — bit-identical
    in DuckDB with inlined `bucket_constants`, so the whole DSIR pipeline
    is oracle-checkable. Either family yields a uniform bucketing; the
    scores differ only through which grams collide."""
    if hash_family == "xxhash64":
        return F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(n_buckets))
    a, b = bucket_constants(seed)
    h = portable_hash_md5(col)  # unrolled 32-step fold, stays in codegen
    return ((F.lit(a) * h + F.lit(b)) % F.lit(_P31)) % F.lit(n_buckets)


def doc_bucket_counts(df: DataFrame, id_col: str, text_col: str = "text",
                      n_buckets: int = 256, seed: int = 1,
                      bigrams: bool = True,
                      hash_family: str = "xxhash64") -> DataFrame:
    """Per-document hashed-gram bucket counts: (id_col, bucket, cnt).
    Documents with no grams produce no rows (callers re-attach them).
    One explode, one (id, bucket) aggregation — map-side combinable."""
    g = _spread(df).select(
        F.col(id_col),
        F.explode(word_grams(F.col(text_col), bigrams)).alias("__g"))
    return (g.select(id_col,
                     gram_bucket(F.col("__g"), n_buckets, seed, hash_family)
                     .alias("bucket"))
            .groupBy(id_col, "bucket")
            .agg(F.count(F.lit(1)).alias("cnt")))


def bucket_logp(df: DataFrame, text_col: str = "text",
                n_buckets: int = 256, seed: int = 1,
                smoothing: float = 1.0, bigrams: bool = True,
                hash_family: str = "xxhash64") -> DataFrame:
    """Smoothed log bucket distribution of a corpus: (bucket, logp) with
    ``logp = ln((cnt_b + α) / (total + α·B))`` — every bucket present
    (zero-count buckets get the floor mass), so log-ratios are finite.

    Scale: one explode + one B-sized aggregation; the total re-joins via
    a broadcast of a single row. Output is B rows — driver-safe."""
    spark = df.sparkSession
    counts = (_spread(df)
              .select(F.explode(word_grams(F.col(text_col), bigrams))
                      .alias("__g"))
              .select(gram_bucket(F.col("__g"), n_buckets, seed, hash_family)
                      .alias("bucket"))
              .groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt")))
    all_b = spark.range(n_buckets).select(F.col("id").cast("int")
                                          .alias("bucket"))
    full = (all_b.join(counts, "bucket", "left")
            .select("bucket", F.coalesce("cnt", F.lit(0)).alias("cnt")))
    total = full.agg(F.sum("cnt").alias("__t"))
    return (full.crossJoin(F.broadcast(total))
            .select("bucket",
                    F.log((F.col("cnt") + F.lit(float(smoothing))) /
                          (F.col("__t") + F.lit(float(smoothing * n_buckets))))
                    .alias("logp")))


def dsir_logratios(target: DataFrame, raw: DataFrame,
                   text_col: str = "text", n_buckets: int = 256,
                   seed: int = 1, smoothing: float = 1.0,
                   bigrams: bool = True,
                   hash_family: str = "xxhash64") -> DataFrame:
    """Per-bucket log importance ratio log p̂_target − log p̂_raw:
    (bucket, logratio), B rows. Persist this tiny table once and reuse
    it for every ingest batch."""
    t = bucket_logp(target, text_col, n_buckets, seed, smoothing, bigrams,
                    hash_family).withColumnRenamed("logp", "__lt")
    r = bucket_logp(raw, text_col, n_buckets, seed, smoothing, bigrams,
                    hash_family).withColumnRenamed("logp", "__lr")
    return t.join(r, "bucket").select(
        "bucket", (F.col("__lt") - F.col("__lr")).alias("logratio"))


def dsir_scores(df: DataFrame, id_col: str, logratios: DataFrame,
                text_col: str = "text", n_buckets: int = 256,
                seed: int = 1, bigrams: bool = True,
                hash_family: str = "xxhash64") -> DataFrame:
    """Per-document log importance weight: (id_col, n_grams, logw) for
    EVERY input document (gram-less documents score 0.0 over 0 grams —
    neutral weight, never NULL).

    Scale: explode_outer keeps empty docs in-line (no second pass); the
    B-sized log-ratio table broadcasts; one per-doc aggregation — the
    corpus crosses exactly one shuffle, keyed on the id."""
    g = _spread(df).select(
        F.col(id_col),
        F.explode_outer(word_grams(F.col(text_col), bigrams)).alias("__g"))
    bucketed = g.select(
        id_col,
        F.when(F.col("__g").isNotNull(),
               gram_bucket(F.col("__g"), n_buckets, seed, hash_family))
        .alias("bucket"))
    joined = bucketed.join(F.broadcast(logratios), "bucket", "left")
    return (joined.groupBy(id_col)
            .agg(F.count("bucket").alias("n_grams"),
                 F.coalesce(F.sum("logratio"), F.lit(0.0)).alias("logw")))


def gumbel_key(id_col: Column, logw: Column, seed: int = 1) -> Column:
    """Deterministic Gumbel-perturbed key ``logw − ln(−ln(u))`` where
    ``u = (perm(portable_hash(md5(id))) + 0.5) / (2^31−1)`` — strictly
    inside (0, 1), so the key is always finite. Top-k by this key is a
    weighted sample without replacement with P(select) ∝ exp(logw)
    (Gumbel-top-k), reproducible everywhere the portable family is."""
    a, b = gumbel_constants(seed)
    ph = (F.lit(a) * portable_hash_md5(id_col.cast("string")) + F.lit(b)) \
        % F.lit(_P31)
    u = (ph + F.lit(0.5)) / F.lit(float(_P31))
    return logw - F.log(-F.log(u))


def dsir_select(scores: DataFrame, k: int, id_col: str,
                seed: int = 1) -> DataFrame:
    """Top-k documents by Gumbel key: the DSIR resampling step. Adds
    `gumbel` and returns exactly k rows (fewer if the input is smaller),
    ties broken by id. sort().limit() → the planner runs TakeOrdered
    (per-partition heaps + driver merge of k rows, no global sort)."""
    keyed = scores.withColumn(
        "gumbel", gumbel_key(F.col(id_col), F.col("logw"), seed))
    return (keyed.orderBy(F.col("gumbel").desc(), F.col(id_col).asc())
            .limit(k))


def dsir_fit_and_score(df: DataFrame, id_col: str, target: Column,
                       text_col: str = "text", n_buckets: int = 256,
                       seed: int = 1, smoothing: float = 1.0,
                       bigrams: bool = True,
                       hash_family: str = "xxhash64") -> DataFrame:
    """Fit + score in ONE corpus pass, for the common case where the
    target set is a predicate over the raw corpus itself (`target` is a
    boolean Column, e.g. ``F.col("lang") == "en"``): the corpus explodes
    once into per-document bucket counts; the raw distribution is a
    re-aggregation of those counts, the target distribution the same
    re-aggregation under the predicate, and the scores one broadcast
    join + per-doc rollup over the same cached table. Identical output
    to dsir_logratios → dsir_scores (differential-tested), at a third
    of the corpus scans.

    Returns (id_col, n_grams, logw) for every input document."""
    from juliadb_jl_spark.functions import scratch
    g = _spread(df).select(
        F.col(id_col), target.alias("__t"),
        F.explode_outer(word_grams(F.col(text_col), bigrams))
        .alias("__g"))
    bc = scratch.register(
        g.select(id_col, "__t",
                 F.when(F.col("__g").isNotNull(),
                        gram_bucket(F.col("__g"), n_buckets, seed,
                                    hash_family))
                 .alias("bucket"))
        .groupBy(id_col, "__t", "bucket")
        .agg(F.sum(F.col("bucket").isNotNull().cast("long")).alias("cnt"))
        .persist())

    # Raw and target bucket counts in ONE aggregation pass (r9: the
    # former two-branch shape re-read bc twice and zero-filled both
    # branches against a range(B) join before joining them back —
    # 2 aggregations + 2 range joins + 2 total crossJoins + 1 join,
    # ~8 tiny stages per run, all to produce B rows.  A bucket with
    # raw count 0 occurs in no document, so it can never be referenced
    # by the final per-doc join — the zero-fill only ever mattered for
    # target-absent buckets, which coalesce(0) covers.  The log
    # expressions are unchanged (same doubles in, same Math.log, so
    # bit-identical logratios; the dsir_logratios differential test
    # pins this).
    real = bc.filter(F.col("bucket").isNotNull())
    joint = real.groupBy("bucket").agg(
        F.sum("cnt").alias("__raw"),
        F.coalesce(F.sum(F.when(F.col("__t"), F.col("cnt"))),
                   F.lit(0)).alias("__tgt"))
    # Totals via an all-rows window over the B-sized joint table (B
    # rows in one partition — driver-safe at any corpus scale) instead
    # of a separate agg + crossJoin(broadcast): one stage fewer, and
    # the joint aggregation is executed once, not once per branch.
    from pyspark.sql import Window as _W
    wall = _W.partitionBy()
    a = F.lit(float(smoothing))
    ab = F.lit(float(smoothing * n_buckets))
    ratio = (joint
             .withColumn("__tr", F.sum("__raw").over(wall))
             .withColumn("__tt", F.sum("__tgt").over(wall))
             .select("bucket",
                     (F.log((F.col("__tgt") + a) / (F.col("__tt") + ab)) -
                      F.log((F.col("__raw") + a) / (F.col("__tr") + ab)))
                     .alias("logratio")))
    joined = bc.join(F.broadcast(ratio), "bucket", "left")
    return (joined.groupBy(id_col)
            .agg(F.sum("cnt").alias("n_grams"),
                 F.coalesce(F.sum(F.col("cnt") * F.col("logratio")),
                            F.lit(0.0)).alias("logw")))


def dsir_pipeline(raw: DataFrame, target: DataFrame, id_col: str, k: int,
                  text_col: str = "text", n_buckets: int = 256,
                  seed: int = 1, smoothing: float = 1.0,
                  bigrams: bool = True,
                  hash_family: str = "xxhash64") -> DataFrame:
    """Fit + score + select in one call (the one-shot shape; at scale,
    persist `dsir_logratios` once and call `dsir_scores`/`dsir_select`
    per ingest batch)."""
    lr = dsir_logratios(target, raw, text_col, n_buckets, seed,
                        smoothing, bigrams, hash_family)
    sc = dsir_scores(raw, id_col, lr, text_col, n_buckets, seed, bigrams,
                     hash_family)
    return dsir_select(sc, k, id_col, seed)
