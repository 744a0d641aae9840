"""Deterministic data-selection (sampling.py) and incremental rollup
(rollup.py): determinism, append-stability, partition invariance, the
no-single-partition-Exchange scale guarantee, and exact state-merge
semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from juliadb_jl_spark.functions import rollup as RU
from juliadb_jl_spark.functions import sampling as SP


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"src{i % 3}", (i * 37) % 1000 + 1) for i in range(1000)]
    return spark.createDataFrame(rows, ["id", "source", "n_tok"])


def test_split_fractions_and_determinism(docs):
    out = SP.split_by_hash(docs, "id", {"train": 0.8, "val": 0.1,
                                        "test": 0.1}, seed=1)
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 1000
    assert abs(counts["train"] - 800) < 80  # hash-uniformity tolerance
    # deterministic: identical assignment on re-run and on repartitioned input
    again = SP.split_by_hash(docs.repartition(7), "id",
                             {"train": 0.8, "val": 0.1, "test": 0.1}, seed=1)
    assert (out.select("id", "split").exceptAll(
        again.select("id", "split")).count() == 0)


def test_split_append_stability(docs):
    """Old rows keep their split when new rows are appended — the property
    RNG-based sampling does not have."""
    first = SP.split_by_hash(docs.filter(F.col("id") < 500), "id",
                             {"a": 0.5, "b": 0.5}, seed=2)
    full = SP.split_by_hash(docs, "id", {"a": 0.5, "b": 0.5}, seed=2) \
        .filter(F.col("id") < 500)
    assert first.select("id", "split").exceptAll(
        full.select("id", "split")).count() == 0


def test_split_rejects_bad_fractions(docs):
    with pytest.raises(ValueError, match="sum to 1"):
        SP.split_by_hash(docs, "id", {"a": 0.5, "b": 0.3})


def test_stratified_exact_n_per_group(docs):
    out = SP.stratified_sample(docs, by="source", n=25, key="id", seed=5)
    sizes = {r["source"]: r["n"] for r in
             out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sizes == {"src0": 25, "src1": 25, "src2": 25}
    # smaller group than n → whole group kept
    small = SP.stratified_sample(docs.filter(F.col("id") < 4), "source",
                                 n=25, key="id")
    assert small.count() == 4


def test_sample_by_hash_subset_semantics(docs):
    s = SP.sample_by_hash(docs, "id", 0.25, seed=9)
    n = s.count()
    assert 150 < n < 350
    # a larger fraction strictly contains a smaller one (nested samples)
    s2 = SP.sample_by_hash(docs, "id", 0.5, seed=9)
    assert s.exceptAll(s2).count() == 0


def test_downsample_sources_rates(docs):
    out = SP.downsample_sources(docs, "source", {"src0": 0.1, "src1": 0.5},
                                key="id", seed=4)
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["src2"] == 333            # untouched source kept whole
    assert counts["src0"] < counts["src1"] < counts["src2"]


def test_pack_tokens_matches_pandas_and_scales(docs):
    out = SP.pack_tokens(docs, "n_tok", budget=4000, order=["id"])
    pdf = out.select("id", "n_tok", "bin").toPandas().sort_values("id")
    cum_excl = pdf["n_tok"].cumsum() - pdf["n_tok"]
    assert (pdf["bin"] == cum_excl // 4000).all()
    # bins are contiguous and nondecreasing in order
    assert pdf["bin"].is_monotonic_increasing
    # scale guarantee: no single-partition Exchange in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan


def test_pack_tokens_grouped(docs):
    out = SP.pack_tokens(docs, "n_tok", budget=4000, order=["id"],
                         by="source")
    pdf = out.select("source", "id", "n_tok", "bin").toPandas()
    for _, g in pdf.groupby("source"):
        g = g.sort_values("id")
        cum_excl = g["n_tok"].cumsum() - g["n_tok"]
        assert (g["bin"] == cum_excl // 4000).all()


def test_pack_tokens_exact_greedy_reset(docs):
    out = SP.pack_tokens_exact(docs, "n_tok", budget=4000, order=["id"],
                               by="source")
    pdf = out.select("source", "id", "n_tok", "bin").toPandas()
    for _, g in pdf.groupby("source"):
        g = g.sort_values("id", ignore_index=True)
        # python greedy reference
        bins, fill, cur = [], 0, 0
        for t in g["n_tok"]:
            if fill > 0 and fill + t > 4000:
                cur, fill = cur + 1, 0
            bins.append(cur)
            fill += t
        assert g["bin"].tolist() == bins
        # invariant: no bin exceeds the budget (max n_tok is 1000 < budget)
        assert (g.groupby("bin")["n_tok"].sum() <= 4000).all()


def test_pack_tokens_exact_oversized_doc(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 5000), (3, 10)], ["id", "n_tok"]) \
        .withColumn("g", F.lit("x"))
    pdf = SP.pack_tokens_exact(df, "n_tok", budget=100, order=["id"],
                               by="g").toPandas().sort_values("id")
    # the oversized doc opens (and overruns) its own bin
    assert pdf["bin"].tolist() == [0, 1, 2]


def test_sampling_chunk_invariance(docs):
    """Hash-based selection must not depend on partitioning — the core
    distributed-correctness property (reference sweeps chunk counts)."""
    base = None
    for n in [1, 2, 5]:
        d = docs.repartition(n)
        split = SP.split_by_hash(d, "id", {"a": 0.5, "b": 0.5}) \
            .select("id", "split").toPandas().sort_values("id",
                                                          ignore_index=True)
        strat = SP.stratified_sample(d, "source", 10, key="id") \
            .select("id").toPandas().sort_values("id", ignore_index=True)
        pack = SP.pack_tokens(d, "n_tok", budget=4000, order=["id"]) \
            .select("id", "bin").toPandas().sort_values("id",
                                                        ignore_index=True)
        got = (split, strat, pack)
        if base is None:
            base = got
        else:
            for b, g in zip(base, got):
                assert b.equals(g)


def test_rollup_chunk_invariance(docs):
    base = None
    for n in [1, 2, 5]:
        st = RU.rollup_state(docs.repartition(n), "source", "n_tok") \
            .toPandas().sort_values("source", ignore_index=True)
        if base is None:
            base = st
        else:
            assert base.equals(st)


def test_rollup_merge_equals_full_state(docs):
    """merge(state(A), state(B)) == state(A ∪ B), exactly."""
    a = RU.rollup_state(docs.filter(F.col("id") % 2 == 0), "source", "n_tok")
    b = RU.rollup_state(docs.filter(F.col("id") % 2 == 1), "source", "n_tok")
    merged = RU.rollup_merge(a, b)
    full = RU.rollup_state(docs, "source", "n_tok")
    assert merged.exceptAll(full).count() == 0
    assert full.exceptAll(merged).count() == 0


def test_rollup_finalize_matches_direct_agg(docs):
    state = RU.rollup_state(docs, "source", "n_tok")
    fin = RU.rollup_finalize(state, "n_tok").toPandas().set_index("source")
    direct = (docs.groupBy("source")
              .agg(F.avg("n_tok").alias("mean"),
                   F.var_samp(F.col("n_tok").cast("double")).alias("var"))
              .toPandas().set_index("source"))
    for src in direct.index:
        assert abs(fin.loc[src, "n_tok_mean"] - direct.loc[src, "mean"]) < 1e-9
        assert abs(fin.loc[src, "n_tok_var"] - direct.loc[src, "var"]) < 1e-6


def test_rollup_time_bucketed(spark):
    rows = [(1, "2024-01-01 10:00:00", 5), (1, "2024-01-01 23:00:00", 7),
            (1, "2024-01-02 01:00:00", 1)]
    df = spark.createDataFrame(rows, ["k", "ts", "v"]) \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    st = RU.rollup_state(df, "k", "v", time_col="ts", grain="day")
    got = {str(r["bucket"])[:10]: (r["n"], r["v_sum"]) for r in st.collect()}
    assert got == {"2024-01-01": (2, 12), "2024-01-02": (1, 1)}


def test_rollup_hll_distinct_merge(docs):
    """HLL sketches merge exactly (sketch-union == sketch-of-union) and
    estimate within HLL error of the true distinct count."""
    a = RU.rollup_state(docs.filter(F.col("id") % 2 == 0), "source", "n_tok",
                        distinct_cols="n_tok")
    b = RU.rollup_state(docs.filter(F.col("id") % 2 == 1), "source", "n_tok",
                        distinct_cols="n_tok")
    fin = RU.rollup_finalize(RU.rollup_merge(a, b), "n_tok") \
        .toPandas().set_index("source")
    truth = (docs.groupBy("source")
             .agg(F.count_distinct("n_tok").alias("d"))
             .toPandas().set_index("source"))
    for src in truth.index:
        est, true = fin.loc[src, "n_tok_ndistinct"], truth.loc[src, "d"]
        assert abs(est - true) / true < 0.05, (src, est, true)


def test_rollup_var_null_for_single_row(spark):
    df = spark.createDataFrame([(1, 10)], ["k", "v"])
    fin = RU.rollup_finalize(RU.rollup_state(df, "k", "v"), "v")
    row = fin.collect()[0]
    assert row["v_var"] is None and row["v_mean"] == 10.0


def test_temperature_rates_alpha_half(spark):
    import math
    df = spark.createDataFrame(
        [(i, "big" if i < 90 else "small") for i in range(100)],
        "k int, src string")
    rates = SP.temperature_rates(df, "src", alpha=0.5)
    # smallest source keeps everything; bigger sources shed share
    assert rates["small"] == 1.0
    # closed form: rate_big = sqrt(p_small/p_big)
    assert abs(rates["big"] - math.sqrt(0.1 / 0.9)) < 1e-15
    kept = SP.temperature_downsample(df, "src", key="k", alpha=0.5, seed=3)
    by = {r["src"]: r["n"] for r in
          kept.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by["small"] == 10
    assert 0 < by["big"] < 90


def test_temperature_rates_alpha_one_is_identity(spark):
    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(30)], "k int, src string")
    rates = SP.temperature_rates(df, "src", alpha=1.0)
    assert all(abs(r - 1.0) < 1e-15 for r in rates.values())
    assert SP.temperature_rates(
        df.filter(F.lit(False)), "src") == {}


def test_pack_manifest_offsets_and_coverage(spark):
    from juliadb_jl_spark.functions import sampling as SP
    rows = [(i, 10 * (i % 3 + 1)) for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "nt"])
    packed = SP.pack_tokens(df, "nt", budget=50, order=["doc_id"])
    man = SP.pack_manifest(packed, "nt", order=["doc_id"])
    got = {r["bin"]: r for r in man.collect()}
    # every doc appears exactly once, offsets are the within-bin
    # exclusive running sum in doc order, totals match
    seen = []
    for b, r in got.items():
        off = 0
        for d in r["docs"]:
            assert d["offset"] == off
            off += d["n_tokens"]
            seen.append(d["id"])
        assert r["bin_tokens"] == off and r["n_docs"] == len(r["docs"])
    assert sorted(seen) == list(range(20))


def test_sample_exact_count_and_determinism(spark):
    from juliadb_jl_spark.functions.sampling import sample_exact
    df = spark.createDataFrame([(i,) for i in range(1000)], ["k"])
    a = {r["k"] for r in sample_exact(df, 50, "k", seed=2).collect()}
    b = {r["k"] for r in sample_exact(df.repartition(13), 50, "k",
                                      seed=2).collect()}
    assert len(a) == 50 and a == b                # exact + partition-proof
    c = {r["k"] for r in sample_exact(df, 50, "k", seed=3).collect()}
    assert c != a                                  # seed-keyed
    # n >= rows -> everything, no error
    assert len(sample_exact(df, 5000, "k").collect()) == 1000
    # plans as TakeOrdered, not a global sort
    plan = sample_exact(df, 50, "k")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_quantile_buckets_golden(spark):
    from juliadb_jl_spark.functions.curation import quantile_buckets
    df = spark.createDataFrame([(float(v),) for v in range(1, 9)]
                               + [(None,)], "v double")
    out = {r["v"]: r["bucket"] for r in
           quantile_buckets(df, "v", 4).collect()}
    # thresholds (interpolated over 1..8): q25=2.75, q50=4.5, q75=6.25
    assert out[1.0] == 0 and out[2.0] == 0
    assert out[3.0] == 1 and out[4.0] == 1
    assert out[5.0] == 2 and out[6.0] == 2
    assert out[7.0] == 3 and out[8.0] == 3
    assert out[None] is None
    import pytest as _pytest
    with _pytest.raises(ValueError):
        quantile_buckets(df, "v", 1)


def test_quantile_buckets_no_corpus_shuffle(spark):
    from juliadb_jl_spark.functions.curation import quantile_buckets
    df = spark.createDataFrame([(float(v),) for v in range(100)],
                               "v double")
    plan = quantile_buckets(df, "v", 10)._jdf.queryExecution() \
        .executedPlan().toString()
    # the only exchange feeds the 1-row threshold agg + its broadcast;
    # the corpus side must carry no hash/range exchange
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_recall_report_golden_and_exhaustive(spark):
    from pyspark.sql import functions as F

    from juliadb_jl_spark.functions import similarity as SIM
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % 100 == 0)
    exact = SIM.cosine_topk(emb, q, k=5)
    tagged, cents = SIM.ivf_build(emb, n_cells=8)
    # nprobe == n_cells scans everything -> recall must be exactly 1.0
    full = SIM.ivf_topk(tagged, cents, q, k=5, nprobe=8)
    row = SIM.recall_report(full, exact) \
        .filter(F.col("query_id").isNull()).collect()[0]
    assert row["recall"] == 1.0 and row["n_hit"] == row["n_exact"]
    # pruned probing: per-query recall in [0,1], macro = mean of rows
    part = SIM.recall_report(SIM.ivf_topk(tagged, cents, q, k=5,
                                          nprobe=2), exact).collect()
    per = [r for r in part if r["query_id"] is not None]
    macro = [r for r in part if r["query_id"] is None][0]
    assert all(0.0 <= r["recall"] <= 1.0 for r in per)
    assert abs(macro["recall"]
               - sum(r["recall"] for r in per) / len(per)) < 1e-12
