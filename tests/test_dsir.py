"""DSIR importance resampling (functions/dsir.py): feature hashing,
distribution fitting, scoring, and deterministic Gumbel-top-k selection
— differential vs a local numpy reimplementation, append-stability, and
partition-layout invariance.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

import juliadb_jl_spark.functions.dsir as DS
from juliadb_jl_spark.functions.dedup import _P31

DOCS = [
    (0, "the cat sat on the mat", "en"),
    (1, "the dog ate the cat", "en"),
    (2, "le chien mange le chat", "fr"),
    (3, "el gato come queso", "es"),
    (4, "", "en"),
    (5, "cat", "en"),
    (6, "the the the the", "en"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text", "lang"])


def _local_grams(text: str, bigrams: bool = True) -> list[str]:
    toks = text.split()
    out = list(toks)
    if bigrams:
        out += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return out


def _local_bucket(gram: str, n_buckets: int, seed: int = 1) -> int:
    import hashlib
    hexd = hashlib.md5(gram.encode()).hexdigest()
    h = 0
    for ch in hexd:
        h = (h * 31 + ord(ch)) % _P31
    a, b = DS.bucket_constants(seed)
    return ((a * h + b) % _P31) % n_buckets


def test_word_grams_golden(spark):
    df = spark.createDataFrame([("a b c",), ("",), ("solo",)], ["text"])
    got = [r[0] for r in
           df.select(DS.word_grams(F.col("text"))).collect()]
    assert got == [["a", "b", "c", "a b", "b c"], [], ["solo"]]
    uni = [r[0] for r in
           df.select(DS.word_grams(F.col("text"), bigrams=False)).collect()]
    assert uni == [["a", "b", "c"], [], ["solo"]]


def test_word_grams_arrow_equals_expr(spark):
    df = spark.createDataFrame(
        [("a b c d e",), ("",), (None,), ("one",),
         ("héllo wörld ünïcode",), ("\ttab lead x y",)], ["text"])
    rows = df.select(
        DS.word_grams(F.col("text"), method="arrow").alias("a"),
        DS.word_grams(F.col("text"), method="expr").alias("b")).collect()
    for r in rows:
        assert list(r["a"]) == list(r["b"])
    import pytest as _pytest
    with _pytest.raises(ValueError):
        df.select(DS.word_grams(F.col("text"), method="hof"))


def test_gram_bucket_matches_local(spark):
    grams = ["the", "cat sat", "é unicode", ""]
    df = spark.createDataFrame([(g,) for g in grams], ["g"])
    got = {r["g"]: r["b"] for r in
           df.select("g", DS.gram_bucket(F.col("g"), 64, seed=3,
                                         hash_family="portable")
                     .alias("b")).collect()}
    for g in grams:
        assert got[g] == _local_bucket(g, 64, seed=3)
        assert 0 <= got[g] < 64


def test_bucket_logp_is_distribution(spark, docs):
    lp = DS.bucket_logp(docs, n_buckets=32).collect()
    assert len(lp) == 32  # every bucket present, zero-count included
    total = sum(math.exp(r["logp"]) for r in lp)
    assert abs(total - 1.0) < 1e-9  # smoothing renormalizes exactly


def test_scores_match_local_reimplementation(spark, docs):
    nb, seed, alpha = 32, 1, 1.0
    target = docs.filter(F.col("lang") == "en")
    lr = DS.dsir_logratios(target, docs, n_buckets=nb, seed=seed,
                           smoothing=alpha, hash_family="portable")
    got = {r["doc_id"]: (r["n_grams"], r["logw"]) for r in
           DS.dsir_scores(docs, "doc_id", lr, n_buckets=nb,
                          seed=seed, hash_family="portable").collect()}

    # local fit
    def dist(rows):
        counts = [0] * nb
        for _, text, _ in rows:
            for g in _local_grams(text):
                counts[_local_bucket(g, nb, seed)] += 1
        tot = sum(counts)
        return [math.log((c + alpha) / (tot + alpha * nb)) for c in counts]

    lt = dist([r for r in DOCS if r[2] == "en"])
    lraw = dist(DOCS)
    for doc_id, text, _ in DOCS:
        grams = _local_grams(text)
        want = sum(lt[_local_bucket(g, nb, seed)]
                   - lraw[_local_bucket(g, nb, seed)] for g in grams)
        n, logw = got[doc_id]
        assert n == len(grams)
        assert abs(logw - want) < 1e-9
    # gram-less doc present with neutral weight
    assert got[4] == (0, 0.0)


def test_scores_append_stable(spark, docs):
    """With a FIXED log-ratio table, a document's score never changes
    when other documents arrive (the per-batch production shape)."""
    lr = DS.dsir_logratios(docs.filter(F.col("lang") == "en"), docs,
                           n_buckets=32)
    base = {r["doc_id"]: r["logw"] for r in
            DS.dsir_scores(docs, "doc_id", lr, n_buckets=32).collect()}
    extra = spark.createDataFrame(
        [(100, "entirely new words here", "en")],
        ["doc_id", "text", "lang"])
    both = {r["doc_id"]: r["logw"] for r in
            DS.dsir_scores(docs.union(extra), "doc_id", lr,
                           n_buckets=32).collect()}
    for k, v in base.items():
        assert both[k] == v


def test_scores_partition_invariant(spark, docs):
    lr = DS.dsir_logratios(docs.filter(F.col("lang") == "en"), docs,
                           n_buckets=32)
    ref = None
    for nparts in (1, 2, 5):
        got = {r["doc_id"]: (r["n_grams"], r["logw"]) for r in
               DS.dsir_scores(docs.repartition(nparts), "doc_id", lr,
                              n_buckets=32).collect()}
        if ref is None:
            ref = got
        else:
            assert got.keys() == ref.keys()
            for k in ref:
                assert got[k][0] == ref[k][0]
                assert abs(got[k][1] - ref[k][1]) < 1e-9


def test_gumbel_key_matches_local(spark, docs):
    lr = DS.dsir_logratios(docs.filter(F.col("lang") == "en"), docs,
                           n_buckets=32)
    sc = DS.dsir_scores(docs, "doc_id", lr, n_buckets=32)
    sel = DS.dsir_select(sc, 3, "doc_id", seed=1)
    rows = sel.collect()
    assert len(rows) == 3
    a, b = DS.gumbel_constants(1)
    for r in rows:
        ph = (a * _local_bucket_raw(str(r["doc_id"])) + b) % _P31
        u = (ph + 0.5) / _P31
        want = r["logw"] - math.log(-math.log(u))
        assert abs(r["gumbel"] - want) < 1e-9


def _local_bucket_raw(key: str) -> int:
    import hashlib
    hexd = hashlib.md5(key.encode()).hexdigest()
    h = 0
    for ch in hexd:
        h = (h * 31 + ord(ch)) % _P31
    return h


def test_select_deterministic_and_ordered(spark, docs):
    lr = DS.dsir_logratios(docs.filter(F.col("lang") == "en"), docs,
                           n_buckets=32)
    sc = DS.dsir_scores(docs, "doc_id", lr, n_buckets=32)
    one = [r["doc_id"] for r in DS.dsir_select(sc, 4, "doc_id").collect()]
    two = [r["doc_id"] for r in
           DS.dsir_select(sc.repartition(3), 4, "doc_id").collect()]
    assert one == two  # layout-independent
    bigger = [r["doc_id"] for r in
              DS.dsir_select(sc, 6, "doc_id").collect()]
    assert bigger[:4] == one  # top-k is a prefix of top-(k+2)
    # a different seed reorders (independent Gumbel stream)
    other = [r["doc_id"] for r in
             DS.dsir_select(sc, 4, "doc_id", seed=2).collect()]
    assert set(other) != set(one) or other != one


def test_pipeline_shape(spark, docs):
    out = DS.dsir_pipeline(docs, docs.filter(F.col("lang") == "en"),
                           "doc_id", k=2)
    assert out.columns == ["doc_id", "n_grams", "logw", "gumbel"]
    assert out.count() == 2


def test_fit_and_score_matches_two_pass(spark, docs):
    """The one-explode dsir_fit_and_score ≡ the generic
    dsir_logratios → dsir_scores composition."""
    lr = DS.dsir_logratios(docs.filter(F.col("lang") == "en"), docs,
                           n_buckets=32)
    two = {r["doc_id"]: (r["n_grams"], r["logw"]) for r in
           DS.dsir_scores(docs, "doc_id", lr, n_buckets=32).collect()}
    one = {r["doc_id"]: (r["n_grams"], r["logw"]) for r in
           DS.dsir_fit_and_score(docs, "doc_id", F.col("lang") == "en",
                                 n_buckets=32).collect()}
    assert one.keys() == two.keys()
    for k in two:
        assert one[k][0] == two[k][0]
        assert abs(one[k][1] - two[k][1]) < 1e-9


def test_hash_families_agree_structurally(spark, docs):
    """xxhash64 (native scale path) and portable (oracle path) agree on
    everything except which grams collide: same n_grams per doc, both
    distributions normalize, both selects return k rows."""
    import math as _m
    for fam in ("xxhash64", "portable"):
        lp = DS.bucket_logp(docs, n_buckets=32, hash_family=fam).collect()
        assert abs(sum(_m.exp(r["logp"]) for r in lp) - 1.0) < 1e-9
    fast = {r["doc_id"]: r["n_grams"] for r in
            DS.dsir_fit_and_score(docs, "doc_id", F.col("lang") == "en",
                                  n_buckets=32).collect()}
    slow = {r["doc_id"]: r["n_grams"] for r in
            DS.dsir_fit_and_score(docs, "doc_id", F.col("lang") == "en",
                                  n_buckets=32,
                                  hash_family="portable").collect()}
    assert fast == slow
