"""Deterministic data-selection operators for training pipelines:
hash-based split, stratified sampling, mixture downsampling, and
token-budget packing.

Selection is a pure function of the DATA (portable 31-bit hash of the
key + a seeded linear permutation), not of RNG state or row order — so
train/val/test membership is reproducible across runs, engines (every
op is oracle-checkable in DuckDB), partition counts, and cluster sizes,
and a re-run after appending new rows never reassigns old rows.

Scale (100 TB): every op is native Column expressions; sampling and
splitting are embarrassingly parallel filters (no shuffle at all);
stratified sampling is one window shuffle on the group key; global
packing uses the two-pass cumulative-sum (per-partition totals + driver
offsets) — no single-partition Exchange anywhere.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from juliadb_jl_spark.functions.dedup import (_P31, perm_constants,
                                              portable_hash_md5)
from juliadb_jl_spark.operators.sort import with_global_cumsum


def unit_constants(seed: int = 1) -> tuple[int, int]:
    """(a, b) of the seeded permutation behind `hash_unit` — exposed so
    oracle SQL can inline the identical literals. 2*seed+1 keeps the LCG
    off the zero fixed point for any seed >= 0."""
    a, b = perm_constants(1, seed=2 * seed + 1)
    return a[0], b[0]


def hash_unit(col: Column, seed: int = 1) -> Column:
    """Deterministic uniform value in [0,1) from any column: cast to
    string, md5 (identical lowercase hex in every engine), portable
    31-bit fold of the hex — uniform because the 32 hex chars are — then
    a seeded linear permutation for independent streams per seed; divide
    by the modulus. Both operands are exact in double, so the quotient
    is bit-identical in any IEEE engine. (A fold of the raw key string
    alone is NOT uniform for sequential keys — the md5 round is what
    buys uniformity.)"""
    a, b = unit_constants(seed)
    h = portable_hash_md5(col.cast("string"))  # unrolled fold: codegen-safe
    return ((F.lit(a) * h + F.lit(b)) % F.lit(_P31)) / F.lit(float(_P31))


def split_thresholds(fractions: dict[str, float]) -> list[tuple[str, float]]:
    """Cumulative (name, upper_bound) pairs; the float accumulation is
    done ONCE here so Spark and oracle SQL inline identical doubles."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1 (got {total})")
    out, acc = [], 0.0
    for name, frac in fractions.items():
        acc += frac
        out.append((name, acc))
    return out


def split_by_hash(df: DataFrame, key: str, fractions: dict[str, float],
                  seed: int = 1, name: str = "split") -> DataFrame:
    """Assign every row to a named split (e.g. train/val/test) by the
    deterministic key hash. Pure map — no shuffle, append-stable."""
    u = hash_unit(F.col(key), seed)
    expr = None
    pairs = split_thresholds(fractions)
    for split_name, bound in pairs[:-1]:
        clause = F.when(u < F.lit(bound), F.lit(split_name))
        expr = clause if expr is None else expr.when(u < F.lit(bound),
                                                     F.lit(split_name))
    last = F.lit(pairs[-1][0])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(name, expr)


def sample_by_hash(df: DataFrame, key: str, fraction: float,
                   seed: int = 1) -> DataFrame:
    """Keep a deterministic `fraction` of rows by key hash (no shuffle)."""
    return df.filter(hash_unit(F.col(key), seed) < F.lit(float(fraction)))


def sample_exact(df: DataFrame, n: int, key: str,
                 seed: int = 1) -> DataFrame:
    """EXACTLY `n` rows (all rows when the input is smaller), chosen
    deterministically as the n smallest seeded key hashes (ties → key)
    — when the budget is a row COUNT, not a rate (eval slices, human
    audits, fixed-size dev sets). Unlike `sample_by_hash` the
    membership is competitive, so it is NOT append-stable — adding
    corpus rows can evict previous members (documented trade; use the
    rate form for append-stable splits).

    Scale: orderBy(hash).limit(n) plans as TakeOrdered — each partition
    keeps its local top-n and only n-sized heads cross to the driver
    merge; the corpus is never globally sorted."""
    u = hash_unit(F.col(key), seed)
    return (df.withColumn("__u", u)
            .orderBy(F.col("__u"), F.col(key))
            .limit(int(n)).drop("__u"))


def stratified_sample(df: DataFrame, by: str | Sequence[str], n: int,
                      key: str, seed: int = 1) -> DataFrame:
    """Exactly `n` rows per group (all rows for smaller groups), chosen
    deterministically: rank by (permuted key hash, key) within each group
    and keep rank <= n. One shuffle (the window partition); groups are
    processed in parallel."""
    by_cols = [by] if isinstance(by, str) else list(by)
    u = hash_unit(F.col(key), seed)
    w = W.partitionBy(*by_cols).orderBy(u.asc(), F.col(key).asc())
    return (df.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= n).drop("__r"))


def cap_per_key(df: DataFrame, key_col: str, n: int, key: str,
                seed: int = 5) -> DataFrame:
    """Deterministic per-key row cap (the CommonCrawl-style per-domain
    cap): keep at most `n` rows per `key_col` value, chosen as the `n`
    smallest seeded-hash values of `key` (a uniform SAMPLE of each
    over-cap key's rows, not a prefix; ties broken by `key`).
    Membership is a pure function of the data, so re-runs reproduce it
    exactly — though unlike the rate filters, appending rows to an
    over-cap key CAN rotate which ones survive (a cap is a competition,
    not a threshold; use `downsample_sources` for append-stability).

    Scale (100 TB): the corpus is NEVER globally sorted or windowed.
    One map-side-combinable agg finds the (tiny) set of over-cap keys;
    under-cap rows pass through a broadcast anti-join untouched, and
    only the over-cap slice — the few hot domains — crosses a shuffle
    into the per-key row_number window, where Spark's WindowGroupLimit
    rewrite (rank-limit pushdown, plan-asserted in tests) keeps at most
    n rows per key per map partition BEFORE the exchange — so even a
    single domain holding 10% of the corpus ships only n rows per map
    task, never its full row set. The two scans of `df` are columnar
    reads, cheaper than the full-corpus shuffle+sort a naive single
    window would pay."""
    over = (df.groupBy(key_col).agg(F.count(F.lit(1)).alias("__c"))
            .filter(F.col("__c") > n).select(key_col))
    under = df.join(F.broadcast(over), key_col, "left_anti")
    hot = df.join(F.broadcast(over), key_col, "left_semi")
    u = hash_unit(F.col(key), seed)
    w = W.partitionBy(key_col).orderBy(u.asc(), F.col(key).asc())
    capped = (hot.withColumn("__r", F.row_number().over(w))
              .filter(F.col("__r") <= n).drop("__r"))
    return under.unionByName(capped)


def downsample_sources(df: DataFrame, source_col: str,
                       rates: dict[str, float], key: str,
                       seed: int = 1) -> DataFrame:
    """Mixture reweighting: keep each row iff hash_unit(key) <
    rates[source]; sources absent from `rates` are kept whole. The
    standard way to hit a target corpus mixture — a pure filter, no
    shuffle, append-stable."""
    u = hash_unit(F.col(key), seed)
    rate = None
    for src, r in rates.items():
        clause = (F.col(source_col) == src, F.lit(float(r)))
        rate = (F.when(*clause) if rate is None else rate.when(*clause))
    rate = F.lit(1.0) if rate is None else rate.otherwise(F.lit(1.0))
    return df.filter(u < rate)


def temperature_rates(df: DataFrame, source_col: str,
                      alpha: float = 0.5) -> dict[str, float]:
    """Per-source keep-rates realizing temperature mixture sampling:
    target share q_s ∝ p_s^alpha (the multilingual alpha-sampling of
    Conneau & Lample 2019 / XLM-R), achieved downsample-only — the
    keep-rate p_s^(alpha-1) is normalized so the most-upweighted
    (smallest) source keeps everything and larger sources shed share.

    Scale: ONE vocabulary-of-sources-sized agg; everything after is
    driver arithmetic. alpha=0.5 computes 1/sqrt(p) — sqrt and divide
    are correctly-rounded IEEE ops, so the rates are bit-identical in
    any engine (the SQL oracle restates them exactly); other alphas go
    through pow(), which is only ~1-ulp reproducible."""
    rows = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n")).collect()
    if not rows:
        return {}
    total = sum(r["n"] for r in rows)

    def w(n: int) -> float:
        p = n / total
        return 1.0 / math.sqrt(p) if alpha == 0.5 else p ** (alpha - 1.0)

    ws = {r[source_col]: w(r["n"]) for r in rows}
    wmax = max(ws.values())
    return {s: v / wmax for s, v in ws.items()}


def temperature_downsample(df: DataFrame, source_col: str, key: str,
                           alpha: float = 0.5, seed: int = 1) -> DataFrame:
    """Temperature-mix the corpus: rates from `temperature_rates`,
    applied as the same deterministic no-shuffle hash filter as
    `downsample_sources` (append-stable, engine-reproducible)."""
    rates = temperature_rates(df, source_col, alpha)
    return downsample_sources(df, source_col, rates, key, seed)


def pack_tokens(df: DataFrame, token_col: str, budget: int,
                order: Sequence[str], by: str | None = None,
                name: str = "bin") -> DataFrame:
    """Context-window packing: assign documents to contiguous token-budget
    bins, bin = floor(exclusive_running_sum(tokens) / budget) over a
    deterministic `order` — the concat-and-chunk shape used to build
    fixed-length LLM pretraining batches. Bins are contiguous in `order`
    and may overrun by at most one document (offset-based packing).

    `by=None` packs globally via the two-pass cumulative sum (scale-safe,
    no single-partition Exchange); `by=col` packs within each group with
    one ordinary window (parallel across groups)."""
    if by is None:
        out = with_global_cumsum(df, token_col, "__cum", order=list(order))
    else:
        w = (W.partitionBy(by).orderBy(*[F.col(c) for c in order])
             .rowsBetween(W.unboundedPreceding, -1))
        out = df.withColumn(
            "__cum", F.coalesce(F.sum(token_col).over(w),
                                F.lit(0)).cast("long"))
    # exact-int doubles below 2^53 → floor(x/b) identical in any engine
    b = out.withColumn(name, F.floor(F.col("__cum") / F.lit(float(budget)))
                       .cast("long"))
    return b.drop("__cum")


def pack_tokens_exact(df: DataFrame, token_col: str, budget: int,
                      order: Sequence[str], by: str,
                      name: str = "bin") -> DataFrame:
    """Greedy packing with reset: walk the group in `order`, open a new
    bin whenever adding the next document would exceed `budget` — bins
    never overrun (an oversized single document gets its own bin).

    The greedy scan is inherently sequential, so this variant REQUIRES a
    group key (`by`) and parallelizes across groups (applyInPandas, one
    Arrow batch per group); use the offset-based `pack_tokens` when a
    global packing must scale. Bin ids are per-group, 0-based."""
    ddl = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                    for f in df.schema.fields)
    out_schema = f"{ddl}, `{name}` bigint"
    order_cols = list(order)

    def _pack(pdf):
        import pandas as pd  # noqa: F401 (worker-side)
        pdf = pdf.sort_values(order_cols, ignore_index=True)
        bins, fill, cur = [], 0, 0
        for tok in pdf[token_col]:
            t = int(tok)
            if fill > 0 and fill + t > budget:
                cur += 1
                fill = 0
            bins.append(cur)
            fill += t
        pdf[name] = bins
        return pdf

    return df.groupBy(by).applyInPandas(_pack, schema=out_schema)


def pack_manifest(packed: DataFrame, token_col: str, order: Sequence[str],
                  bin_col: str = "bin",
                  id_col: str = "doc_id") -> DataFrame:
    """Per-bin loader manifest over a `pack_tokens` result: one row per
    bin with the ordered document list a training data loader consumes
    to assemble each context window without re-scanning the corpus —
    (bin, n_docs, bin_tokens, docs) where `docs` is the `order`-sorted
    array of (id, n_tokens, offset) structs and `offset` is the token
    position of the document inside its bin.

    Scale: offsets come from a window PARTITIONED BY bin — a bin holds
    ~budget tokens (a handful of documents), so every window frame is
    tiny regardless of corpus size; the manifest is one groupBy(bin).
    Bin order inside `docs` is made deterministic by array_sort on the
    leading order columns (not collect order, which is partition-
    dependent)."""
    from pyspark.sql import Window as WW
    w = (WW.partitionBy(bin_col).orderBy(*[F.col(c) for c in order])
         .rowsBetween(WW.unboundedPreceding, -1))
    off = F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("long")
    m = packed.withColumn("__off", off)
    entry = F.struct(*[F.col(c) for c in order],
                     F.col(id_col).alias("id"),
                     F.col(token_col).cast("long").alias("n_tokens"),
                     F.col("__off").alias("offset"))
    return (m.groupBy(bin_col)
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.col(token_col).cast("long")).alias("bin_tokens"),
                 F.array_sort(F.collect_list(entry)).alias("docs")))
