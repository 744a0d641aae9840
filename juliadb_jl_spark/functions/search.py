"""Full-text relevance search over a document corpus: TF/DF term
statistics, BM25 scoring, and top-k retrieval.

Scale (100 TB corpus, short query):
- The query's term set is tiny, so the exploded token stream is
  filtered to query terms BEFORE any aggregation — per-doc work is one
  native explode + filter, and the only shuffles are the per-(doc,term)
  tf groupBy and the final per-doc sum, both over the filtered (small)
  stream, never the full token stream.
- Corpus-level constants (doc count, average length) are a 1-row
  aggregate attached via broadcast cross-join — no driver collect in
  the plan.
- Document frequencies are per-query-term (a handful of rows) and
  broadcast back onto the tf stream.
- Top-k is `orderBy(...).limit(k)` — Spark's TakeOrdered: per-partition
  heaps, only k rows per partition reach the driver-side merge.

BM25 uses the Lucene-style non-negative idf:
    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(d,q) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from juliadb_jl_spark.functions.text import tokens

__all__ = ["term_stats", "bm25_scores", "bm25_topk"]


def term_stats(df: DataFrame, id_col: str, text_col: str = "text",
               terms: Sequence[str] | None = None) -> DataFrame:
    """Per-(doc, term) term frequencies: (id_col, term, tf, dl) where dl
    is the document's token length. `terms` restricts the index to a
    term subset (filter applied pre-aggregation — the scale path for
    query-time scoring); None builds the full index."""
    toks = df.select(
        F.col(id_col),
        F.size(tokens(F.col(text_col))).alias("dl"),
        F.explode_outer(tokens(F.col(text_col))).alias("term"))
    if terms is not None:
        toks = toks.filter(F.col("term").isin(list(terms)))
    else:
        toks = toks.filter(F.col("term").isNotNull())
    return toks.groupBy(id_col, "dl", "term") \
        .agg(F.count(F.lit(1)).alias("tf")) \
        .select(id_col, "term", "tf", "dl")


def bm25_scores(df: DataFrame, query: str | Sequence[str], id_col: str,
                text_col: str = "text", k1: float = 1.2,
                b: float = 0.75) -> DataFrame:
    """BM25 relevance of every matching document for `query` (a string,
    whitespace-tokenized, or an explicit term list). Returns
    (id_col, score) for documents matching >= 1 query term."""
    terms = query.split() if isinstance(query, str) else list(query)
    terms = sorted(set(terms))
    if not terms:
        raise ValueError("bm25: empty query")

    tf = term_stats(df, id_col, text_col, terms=terms)
    stats = df.agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg(F.size(tokens(F.col(text_col)))).alias("__avgdl"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))

    scored = (tf.join(F.broadcast(dfreq), "term")
              .crossJoin(F.broadcast(stats)))
    idf = F.log(F.lit(1.0) + (F.col("__n") - F.col("__df") + 0.5)
                / (F.col("__df") + 0.5))
    norm = F.col("tf") * (k1 + 1) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("__avgdl")))
    return (scored.withColumn("__s", idf * norm)
            .groupBy(id_col).agg(F.sum("__s").alias("score")))


def bm25_topk(df: DataFrame, query: str | Sequence[str], id_col: str,
              text_col: str = "text", k: int = 10, k1: float = 1.2,
              b: float = 0.75) -> DataFrame:
    """Top-k documents by BM25 score (ties broken by id for
    determinism). TakeOrdered — no global sort materializes."""
    return (bm25_scores(df, query, id_col, text_col, k1, b)
            .orderBy(F.col("score").desc(), F.col(id_col))
            .limit(k))
