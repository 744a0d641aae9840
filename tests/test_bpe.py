"""BPE tokenizer: trainer vs a naive recount-everything reference,
encoder vs classic rank-greedy merge application, Spark vs driver-side
equivalence, and chunk invariance.
"""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from juliadb_jl_spark.functions import bpe as B


# -- naive reference: recount every pair each step (textbook Sennrich) --

def naive_learn(word_freq, num_merges, min_pair_count=2):
    words = {i: list(w) for i, (w, _) in enumerate(word_freq)}
    freqs = [f for _, f in word_freq]
    merges = []
    for _ in range(num_merges):
        counts = Counter()
        for i, syms in words.items():
            for p in zip(syms, syms[1:]):
                counts[p] += freqs[i]
        live = {p: c for p, c in counts.items() if c >= min_pair_count}
        if not live:
            break
        best = min(live, key=lambda p: (-live[p], p))
        for i in words:
            words[i] = B._merge_symbols(words[i], *best)
        merges.append(best)
    return merges


def naive_encode(word, merges):
    syms = list(word)
    for a, b in merges:
        syms = B._merge_symbols(syms, a, b)
    return syms


CORPUS = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3),
          ("lowest", 4), ("new", 7), ("wide", 2)]


def test_learn_matches_naive_golden():
    got = B.bpe_learn(CORPUS, 12)
    assert got == naive_learn(CORPUS, 12)
    # the classic corpus learns real morphemes deterministically
    assert ("e", "s") in got or ("es", "t") in got or ("e", "st") in got


def test_learn_min_pair_count_stops():
    assert B.bpe_learn([("ab", 1)], 5, min_pair_count=2) == []
    assert B.bpe_learn([("ab", 2)], 5, min_pair_count=2) == [("a", "b")]


word_st = st.text(alphabet="abcde", min_size=1, max_size=8)
corpus_st = st.lists(
    st.tuples(word_st, st.integers(min_value=1, max_value=9)),
    min_size=1, max_size=12, unique_by=lambda t: t[0])


@settings(max_examples=60, deadline=None)
@given(corpus_st, st.integers(min_value=0, max_value=15))
def test_learn_matches_naive_property(corpus, n):
    assert B.bpe_learn(corpus, n) == naive_learn(corpus, n)


@settings(max_examples=60, deadline=None)
@given(corpus_st, word_st, st.integers(min_value=1, max_value=15))
def test_encode_word_matches_rank_greedy(corpus, word, n):
    merges = B.bpe_learn(corpus, n, min_pair_count=1)
    assert B.encode_word(word, merges) == naive_encode(word, merges)


def test_encode_word_adjacent_occurrences():
    # ' a  b  a  b ' must merge BOTH occurrences (the two-space
    # separator restores the boundary a single-space form would eat)
    assert B.encode_word("abab", [("a", "b")]) == ["ab", "ab"]
    assert B.encode_word("aaa", [("a", "a")]) == ["aa", "a"]
    assert B.encode_word("", []) == []


def test_encode_roundtrip_concat():
    merges = B.bpe_learn(CORPUS, 8)
    for w, _ in CORPUS:
        assert "".join(B.encode_word(w, merges)) == w


@pytest.fixture(scope="module")
def corpus_df(spark):
    rows = [(i, " ".join([w] * f))
            for i, (w, f) in enumerate(CORPUS)] + [(99, None), (98, "")]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_train_on_dataframe_matches_local(spark, corpus_df):
    got = B.bpe_train(corpus_df, num_merges=10)
    # same counts locally: each word appears `freq` times in its doc
    assert got == B.bpe_learn(sorted(CORPUS), 10)


@pytest.mark.parametrize("nparts", [1, 2, 5])
def test_train_chunk_invariance(spark, corpus_df, nparts):
    assert B.bpe_train(corpus_df.repartition(nparts), num_merges=6) == \
        B.bpe_train(corpus_df.coalesce(1), num_merges=6)


def test_encode_dataframe_matches_encode_word(spark, corpus_df):
    merges = B.bpe_train(corpus_df, num_merges=8)
    out = {r["doc_id"]: r["pieces"]
           for r in B.bpe_encode(corpus_df, merges).collect()}
    for i, (w, f) in enumerate(CORPUS):
        assert out[i] == B.encode_word(w, merges) * f
    assert out[99] == [] and out[98] == []


def test_encode_lowercases_and_ascii_ws(spark):
    df = spark.createDataFrame(
        [(1, "LOW\tlow   low")], "doc_id int, text string")
    merges = [("l", "o"), ("lo", "w")]
    row = B.bpe_encode(df, merges).head()
    # NBSP is NOT a separator for Java \s — nor for the encoder
    assert row["pieces"] == ["low", "low", " ", "low"]


def test_vocab_inventory():
    merges = [("a", "b"), ("ab", "c")]
    assert B.bpe_vocab(merges) == ["<unk>", "ab", "abc"]


def test_bpe_encode_runs_on_streams(spark, tmp_path):
    """bpe_encode is a stateless pandas UDF map — identical code runs
    under Structured Streaming (the tokenizer-apply step of a streaming
    ingest pipeline)."""
    import pandas as pd
    from juliadb_jl_spark.streaming.aggregate import (run_to_memory,
                                                      stream_from_parquet)
    merges = [("l", "o"), ("lo", "w"), ("e", "r")]
    pdf = pd.DataFrame({"doc_id": range(12),
                        "text": [f"lower low slower {i}" for i in range(12)]})
    src = str(tmp_path / "bpe_src")
    spark.createDataFrame(pdf).write.parquet(src)

    def enc(df):
        return B.bpe_encode(df, merges).select(
            "doc_id", F.array_join("pieces", "|").alias("p"))

    batch = enc(spark.read.parquet(src)).toPandas() \
        .sort_values("doc_id", ignore_index=True)
    streamed = run_to_memory(enc(stream_from_parquet(spark, src)),
                             "bpe_stream", mode="append").toPandas() \
        .sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(batch, streamed)
    assert batch["p"][0].startswith("low|er|low|s|low|er")


def test_train_vocab_cap_is_take_ordered(spark, corpus_df):
    """The max_words cap must lower to TakeOrdered (top-k per partition
    + driver merge), not a global Sort Exchange — at 100 TB the word
    table is still millions of rows and a global sort of it per
    training run is a needless shuffle."""
    from juliadb_jl_spark.functions.text import word_freqs
    wf = (word_freqs(corpus_df)
          .orderBy(F.desc("freq"), F.asc("word")).limit(5))
    plan = wf._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # cap honored and deterministic under it
    got = B.bpe_train(corpus_df, num_merges=4, max_words=3)
    assert got == B.bpe_learn(
        sorted(CORPUS, key=lambda t: (-t[1], t[0]))[:3], 4)


def test_bpe_save_load_roundtrip(spark, tmp_path, corpus_df):
    merges = B.bpe_train(corpus_df, num_merges=6)
    path = str(tmp_path / "tok")
    B.bpe_save(spark, merges, path)
    assert B.bpe_load(spark, path) == merges
