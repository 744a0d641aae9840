"""Serving/eval handoff + corpus-shaping ops added in round 5:
token-window chunking, deterministic per-key caps, quality-aware
dedup keeper election, vocabulary-coverage reporting.
"""

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from juliadb_jl_spark.functions import curation as CU
from juliadb_jl_spark.functions import dedup as DD
from juliadb_jl_spark.functions import sampling as SP
from juliadb_jl_spark.functions import text as TX
from juliadb_jl_spark.functions.sampling import hash_unit


# ---------------------------------------------------------------------------
# chunk_documents
# ---------------------------------------------------------------------------

def test_chunk_documents_golden(spark):
    df = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),  # 10 tokens
         (2, "a b"),                             # shorter than one window
         (3, "")],                               # no tokens → no chunks
        "doc_id long, text string")
    out = CU.chunk_documents(df, size=4, overlap=1).toPandas()
    got = {(r.doc_id, r.chunk_id): (r.n_chunks, r.tok_start, r.tok_len,
                                    r.chunk_text)
           for r in out.itertuples()}
    # stride 3 → starts 0,3,6,9 for n=10
    assert got[(1, 0)] == (4, 0, 4, "t0 t1 t2 t3")
    assert got[(1, 1)] == (4, 3, 4, "t3 t4 t5 t6")
    assert got[(1, 2)] == (4, 6, 4, "t6 t7 t8 t9")
    assert got[(1, 3)] == (4, 9, 1, "t9")
    assert got[(2, 0)] == (1, 0, 2, "a b")
    assert 3 not in {k[0] for k in got}
    assert len(got) == 5


def test_chunk_documents_reconstruction(tables):
    """overlap=0: chunks partition the token stream — re-joining them
    reproduces the whitespace-normalized text."""
    docs = tables["documents"].df.limit(100)
    out = CU.chunk_documents(docs, size=7, overlap=0)
    rebuilt = (out.groupBy("doc_id")
               .agg(F.array_join(
                   F.transform(
                       F.array_sort(F.collect_list(
                           F.struct("chunk_id", "chunk_text"))),
                       lambda s: s["chunk_text"]), " ").alias("re")))
    norm = docs.select("doc_id",
                       F.trim(F.regexp_replace("text", r"\s+", " "))
                       .alias("orig"))
    bad = (rebuilt.join(norm, "doc_id")
           .filter(F.col("re") != F.col("orig")).count())
    assert bad == 0


def test_chunk_documents_validates(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        CU.chunk_documents(df, size=4, overlap=4)
    with pytest.raises(ValueError):
        CU.chunk_documents(df, size=4, overlap=-1)


def test_chunk_documents_tok_len_consistent(tables):
    """tok_len counts the actual sliced tokens for every chunk."""
    docs = tables["documents"].df.limit(200)
    out = CU.chunk_documents(docs, size=9, overlap=2)
    n_sliced = F.size(F.split(F.col("chunk_text"), r"\s+"))
    assert out.filter(n_sliced != F.col("tok_len")).count() == 0


# ---------------------------------------------------------------------------
# cap_per_key
# ---------------------------------------------------------------------------

def test_cap_per_key_matches_naive_window(tables):
    """Differential: the split (anti-join passthrough + hot-slice
    window) plan ≡ the naive single global window."""
    docs = tables["documents"].df.select("doc_id", "source")
    got = SP.cap_per_key(docs, "source", 7, key="doc_id", seed=5)
    u = hash_unit(F.col("doc_id"), 5)
    w = W.partitionBy("source").orderBy(u.asc(), F.col("doc_id").asc())
    naive = (docs.withColumn("__r", F.row_number().over(w))
             .filter(F.col("__r") <= 7).drop("__r"))
    assert (sorted(r["doc_id"] for r in got.collect()) ==
            sorted(r["doc_id"] for r in naive.collect()))


def test_cap_per_key_counts_and_membership(spark):
    rows = [(i, "hot" if i < 40 else f"k{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, key string")
    out = SP.cap_per_key(df, "key", 5, key="doc_id")
    cnt = {r["key"]: r["n"] for r in
           out.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert cnt["hot"] == 5
    # under-cap keys pass through whole (k0/k1/k2 have ~7 rows > 5 →
    # also capped; build a truly-under key set to check passthrough)
    df2 = spark.createDataFrame([(i, f"u{i}") for i in range(10)],
                                "doc_id long, key string")
    assert SP.cap_per_key(df2, "key", 5, key="doc_id").count() == 10
    # deterministic across runs
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in
               SP.cap_per_key(df, "key", 5, key="doc_id").collect())
    assert a == b


def test_cap_per_key_plan_shapes(tables):
    """Plan audit: chunking is shuffle-free past the spread; the cap's
    hot-slice window gets Spark's rank-limit pushdown (WindowGroupLimit
    Partial) so at most n rows per key per map task reach the exchange,
    and both key-set joins broadcast."""
    docs = tables["documents"].df
    ch = CU.chunk_documents(docs, size=32, overlap=8)
    chp = ch._jdf.queryExecution().executedPlan().toString()
    # exactly the one intentional _spread round-robin repartition
    assert chp.count("Exchange") == 1, chp
    cap = SP.cap_per_key(docs.select("doc_id", "source"), "source", 15,
                         key="doc_id")
    cp = cap._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in cp, cp
    assert cp.count("BroadcastHashJoin") == 2, cp


# ---------------------------------------------------------------------------
# dedup_exact keeper election
# ---------------------------------------------------------------------------

def test_dedup_exact_keep_best(spark):
    df = spark.createDataFrame(
        [(1, "same text", 10.0), (2, "Same  Text", 30.0),
         (3, "same text", 30.0),  # ties with 2 on score → lower id wins
         (4, "other", 1.0)],
        "doc_id long, text string, q double")
    best = DD.dedup_exact(df, "doc_id", score_col="q", keep="max")
    assert sorted(r["doc_id"] for r in best.collect()) == [2, 4]
    worst = DD.dedup_exact(df, "doc_id", score_col="q", keep="min")
    assert sorted(r["doc_id"] for r in worst.collect()) == [1, 4]
    # default stays min-id
    first = DD.dedup_exact(df, "doc_id")
    assert sorted(r["doc_id"] for r in first.collect()) == [1, 4]
    with pytest.raises(ValueError):
        DD.dedup_exact(df, "doc_id", score_col="q", keep="longest")


def test_dedup_exact_null_scores_lose(spark):
    """A NULL score must lose the keeper election for BOTH keep modes
    (struct min sorts NULL fields first — without the is-null guard a
    NULL-score copy beats every scored one). All-NULL groups fall back
    to min-id."""
    df = spark.createDataFrame(
        [(1, "same text", None), (2, "same text", 5.0),
         (3, "same text", 2.0),
         (7, "allnull", None), (8, "allnull", None)],
        "doc_id long, text string, q double")
    best = DD.dedup_exact(df, "doc_id", score_col="q", keep="max")
    assert sorted(r["doc_id"] for r in best.collect()) == [2, 7]
    worst = DD.dedup_exact(df, "doc_id", score_col="q", keep="min")
    assert sorted(r["doc_id"] for r in worst.collect()) == [3, 7]


def test_dedup_by_clusters_null_scores_lose(spark):
    df = spark.createDataFrame(
        [(1, None), (2, 3.0), (3, 8.0), (4, None), (5, None)],
        "doc_id long, q double")
    pairs = spark.createDataFrame([(1, 2), (2, 3), (4, 5)],
                                  "id_a long, id_b long")
    out = DD.dedup_by_clusters(df, pairs, "doc_id", score_col="q",
                               keep="max")
    # cluster {1,2,3}: NULL on 1 loses, 8.0 on 3 wins; cluster {4,5}
    # all-NULL -> min id 4
    assert sorted(r["doc_id"] for r in out.collect()) == [3, 4]
    low = DD.dedup_by_clusters(df, pairs, "doc_id", score_col="q",
                               keep="min")
    assert sorted(r["doc_id"] for r in low.collect()) == [2, 4]


def test_dedup_by_clusters_keep_best(spark):
    """Cluster rep election: transitive cluster {1,2,3} keeps its
    max-score member; unpaired rows pass through untouched."""
    df = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 9.0), (4, 1.0), (5, 2.0)],
        "doc_id long, q double")
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    out = DD.dedup_by_clusters(df, pairs, "doc_id", score_col="q",
                               keep="max")
    # 2 and 3 tie at 9.0 → lower id 2 wins; 4 and 5 unpaired
    assert sorted(r["doc_id"] for r in out.collect()) == [2, 4, 5]
    low = DD.dedup_by_clusters(df, pairs, "doc_id", score_col="q",
                               keep="min")
    assert sorted(r["doc_id"] for r in low.collect()) == [1, 4, 5]
    default = DD.dedup_by_clusters(df, pairs, "doc_id")
    assert sorted(r["doc_id"] for r in default.collect()) == [1, 4, 5]
    with pytest.raises(ValueError):
        DD.dedup_by_clusters(df, pairs, "doc_id", score_col="q",
                             keep="best")


def test_dedup_exact_keeper_integer_scores(spark):
    """Negation trick must be exact for integral scores too."""
    df = spark.createDataFrame(
        [(i, "dup", i * 7 % 5) for i in range(1, 8)],
        "doc_id long, text string, s long")
    out = DD.dedup_exact(df, "doc_id", score_col="s", keep="max").collect()
    # max s = 4 at doc_id 2 (2*7%5=4)
    assert [r["doc_id"] for r in out] == [2]


# ---------------------------------------------------------------------------
# vocab_coverage
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# filter_by_quantile / quantize_embeddings
# ---------------------------------------------------------------------------

def test_filter_by_quantile_golden(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(1, 11)],
                               "id long, v double")
    # P(0.25)=3.25, P(0.75)=7.75 (interpolated) → keep 4..7
    out = CU.filter_by_quantile(df, "v", 0.25, 0.75)
    assert sorted(r["id"] for r in out.collect()) == [4, 5, 6, 7]
    # identity bounds keep everything
    assert CU.filter_by_quantile(df, "v").count() == 10
    with pytest.raises(ValueError):
        CU.filter_by_quantile(df, "v", 0.9, 0.1)


def test_quantize_embeddings_roundtrip(tables):
    """Dequantized vectors are within scale/2 per coordinate; codes fit
    the signed bit budget; zero vectors quantize to zero codes."""
    from juliadb_jl_spark.functions import similarity as SIM
    e = tables["embeddings"].df.limit(200)
    q = SIM.quantize_embeddings(e, "embedding", bits=8)
    err = q.select(
        F.array_max(F.zip_with(
            "embedding", SIM.dequantize_expr(F.col("q_codes"),
                                             F.col("q_scale")),
            lambda x, y: F.abs(x.cast("double") - y))).alias("e"),
        (F.col("q_scale") / 2).alias("half"),
        F.array_max(F.transform("q_codes", lambda c: F.abs(c))).alias("m"))
    bad = err.filter((F.col("e") > F.col("half") * 1.0000001) |
                     (F.col("m") > 127)).count()
    assert bad == 0


def test_quantize_embeddings_zero_vector(spark):
    from juliadb_jl_spark.functions import similarity as SIM
    df = spark.createDataFrame([(1, [0.0, 0.0]), (2, [1.0, -2.0])],
                               "vec_id long, embedding array<float>")
    out = {r["vec_id"]: (r["q_scale"], r["q_codes"])
           for r in SIM.quantize_embeddings(df).collect()}
    assert out[1] == (0.0, [0, 0])
    s, codes = out[2]
    assert codes == [64, -127] and abs(s - 2.0 / 127) < 1e-12
    with pytest.raises(ValueError):
        SIM.quantize_embeddings(df, bits=1)


def test_vocab_coverage_golden(spark):
    vocab = spark.createDataFrame(
        [("<unk>", 0), ("the", 1), ("cat", 2)], "word string, token_id int")
    df = spark.createDataFrame(
        [(1, "s1", "The cat zzz"), (2, "s1", "the the"),
         (3, "s2", "qqq qqq qqq qqq"), (4, "s2", "")],
        "doc_id long, source string, text string")
    per_doc = {r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_rate"])
               for r in TX.vocab_coverage(df, vocab).collect()}
    assert per_doc[1] == (3, 1, 1 / 3)   # case-folded "the cat" hit
    assert per_doc[2] == (2, 0, 0.0)
    assert per_doc[3] == (4, 4, 1.0)
    assert per_doc[4] == (0, 0, 0.0)     # empty doc still reported
    per_src = {r["source"]: (r["n_tokens"], r["n_oov"])
               for r in TX.vocab_coverage(df, vocab, by="source").collect()}
    assert per_src == {"s1": (5, 1), "s2": (4, 4)}


def test_handoff_ops_run_on_streams(spark, tmp_path):
    """Chunking and quantization are stateless per-row transforms — the
    same code runs under Structured Streaming (chunk/quantize each
    arriving batch at ingest)."""
    import pandas as pd
    from juliadb_jl_spark.functions import similarity as SIM
    from juliadb_jl_spark.streaming.aggregate import (run_to_memory,
                                                      stream_from_parquet)
    docs = spark.createDataFrame(
        [(i, " ".join(f"t{i}_{j}" for j in range(12))) for i in range(30)],
        "doc_id long, text string")
    src = str(tmp_path / "doc_src")
    docs.write.parquet(src)

    def chunk(d):
        return CU.chunk_documents(d, size=5, overlap=1)

    batch = chunk(spark.read.parquet(src)).toPandas() \
        .sort_values(["doc_id", "chunk_id"], ignore_index=True)
    streamed = run_to_memory(chunk(stream_from_parquet(spark, src)),
                             "chunk_stream", mode="append").toPandas() \
        .sort_values(["doc_id", "chunk_id"], ignore_index=True)
    pd.testing.assert_frame_equal(batch, streamed)

    vecs = spark.createDataFrame(
        [(i, [float(i), float(-i), 0.5]) for i in range(20)],
        "vec_id long, embedding array<float>")
    vsrc = str(tmp_path / "vec_src")
    vecs.write.parquet(vsrc)

    def quant(d):
        q = SIM.quantize_embeddings(d)
        return q.select("vec_id", "q_scale",
                        F.concat_ws(",", F.transform(
                            "q_codes", lambda c: c.cast("string")))
                        .alias("codes"))

    qb = quant(spark.read.parquet(vsrc)).toPandas() \
        .sort_values("vec_id", ignore_index=True)
    qs = run_to_memory(quant(stream_from_parquet(spark, vsrc)),
                       "quant_stream", mode="append").toPandas() \
        .sort_values("vec_id", ignore_index=True)
    pd.testing.assert_frame_equal(qb, qs)


def test_vocab_coverage_full_vocab_zero_oov(tables):
    """A min_freq=1 vocab built from the corpus covers it exactly."""
    docs = tables["documents"].df.limit(200)
    vocab = TX.build_vocab(docs)
    out = TX.vocab_coverage(docs, vocab, by="lang")
    assert out.agg(F.sum("n_oov")).head()[0] == 0
