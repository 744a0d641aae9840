"""Byte-pair-encoding tokenizer: distributed training statistics, exact
driver-side merge learning, and a distributed memoized encoder.

The split mirrors how production BPE trainers work (SentencePiece, HF
tokenizers): the corpus-scale work is the word-frequency count — ONE
distributed pass reducing 100 TB of text to a vocabulary-sized table —
and merge learning then runs on that bounded table with incremental
pair-count maintenance. Encoding is a single corpus pass through an
Arrow-batched pandas UDF with per-executor word memoization, so the
per-document cost collapses to the distinct-word cost.

Merge application uses the *sequential replace-chain* form: a word is
laid out as ``' ' + '  '.join(chars) + '  '`` (two-space separators,
single-space outer boundary) and each merge ``(a, b)`` is one
left-to-right ``replace(' a  b ', ' ab ')``.  With two-space separators
a replacement restores the separator shared with both neighbors, so
adjacent occurrences (``a b a b`` → ``ab ab``) merge exactly like the
classic scan — and the same chain is expressible verbatim in ANSI SQL
``replace()``, which is what the DuckDB correctness oracle runs.
Sequential application in rank order is equivalent to the rank-greedy
encoder: merge k only creates pairs containing the new symbol, and any
learned pair containing that symbol necessarily has rank > k.

Reference scope: the reference engine has no tokenizer; this is part of
the training-data-pipeline extension surface (SURVEY §2.12), built from
the public BPE literature (Sennrich et al. 2016; GPT-2 encoder notes).
"""

from __future__ import annotations

import heapq
import re
from collections import Counter, defaultdict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from juliadb_jl_spark.functions.text import word_freqs

# Java and RE2 \s are ASCII-only; Python str.split() would also split on
# Unicode whitespace (NBSP…), silently diverging from word_freqs and the
# SQL oracle — pin the encoder to the same ASCII class.
_WS = re.compile(r"\s+", re.ASCII)


def _merge_symbols(syms: list[str], a: str, b: str) -> list[str]:
    """Merge all (a, b) adjacencies left-to-right (classic BPE scan)."""
    out, i, n = [], 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _pairs(syms: list[str]) -> list[tuple[str, str]]:
    return list(zip(syms, syms[1:]))


def bpe_learn(word_freq: list[tuple[str, int]], num_merges: int,
              min_pair_count: int = 2) -> list[tuple[str, str]]:
    """Learn merges from a (word, freq) list — exact incremental BPE.

    Deterministic: best pair = max count, ties broken by the
    lexicographically smallest (a, b). Stops early when the best count
    drops below `min_pair_count`. Cost per merge touches only the words
    containing the merged pair (inverted pair→words index)."""
    words = [list(w) for w, _ in word_freq]
    freqs = [f for _, f in word_freq]
    counts: Counter = Counter()
    where: dict[tuple[str, str], set[int]] = defaultdict(set)
    for i, syms in enumerate(words):
        for p in _pairs(syms):
            counts[p] += freqs[i]
            where[p].add(i)
    # lazy max-heap keyed (-count, pair): stale entries are corrected at
    # pop time, so each merge costs O(log·touched) instead of a full
    # scan over every live pair — the difference between minutes and
    # seconds at production merge counts (32k merges, 200k words)
    heap = [(-c, p) for p, c in counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best = None
        while heap:
            nc, p = heapq.heappop(heap)
            c = counts.get(p, 0)
            if c <= 0:
                continue
            if -nc != c:
                heapq.heappush(heap, (-c, p))
                continue
            if c < min_pair_count:
                heapq.heappush(heap, (nc, p))  # true max < threshold: done
                break
            best = p
            break
        if best is None:
            break
        a, b = best
        for i in list(where[best]):
            old = words[i]
            new = _merge_symbols(old, a, b)
            for p in _pairs(old):
                counts[p] -= freqs[i]
                if counts[p] <= 0:
                    del counts[p]
                where[p].discard(i)
            for p in _pairs(new):
                counts[p] += freqs[i]
                where[p].add(i)
                heapq.heappush(heap, (-counts[p], p))
            words[i] = new
        merges.append(best)
    return merges


def bpe_train(df: DataFrame, text_col: str = "text",
              num_merges: int = 200, min_pair_count: int = 2,
              max_words: int = 200_000,
              lowercase: bool = True) -> list[tuple[str, str]]:
    """Train a BPE merge list on a corpus.

    Scale: `word_freqs` is the only corpus pass (explode + map-side
    combined groupBy, ONE shuffle to a vocabulary-sized table).  The
    top-`max_words` cap lowers to TakeOrdered (no global sort), bounding
    what the driver collects — the standard count-file input of
    production trainers. Learning itself is driver-side and exact."""
    wf = (word_freqs(df, text_col, lowercase=lowercase)
          .orderBy(F.desc("freq"), F.asc("word")).limit(max_words))
    rows = [(r["word"], r["freq"]) for r in wf.collect()]
    return bpe_learn(rows, num_merges, min_pair_count)


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply merges to one word via the replace-chain form (see module
    docstring) — bit-identical to the SQL-oracle formulation."""
    if not word:
        return []
    s = " " + "  ".join(word) + "  "
    for a, b in merges:
        pat = f" {a}  {b} "
        if pat in s:
            s = s.replace(pat, f" {a}{b} ")
    return s.strip(" ").split("  ")


def bpe_encode(df: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text", out_col: str = "pieces",
               lowercase: bool = True) -> DataFrame:
    """Encode `text_col` into an array<string> of BPE pieces.

    Scale: ONE corpus pass, no shuffle — an Arrow-batched pandas UDF
    with a per-executor distinct-word memo (Zipf makes the distinct-word
    working set tiny relative to the token stream). The merge list rides
    the closure (vocabulary-sized, broadcast once per executor)."""
    import pandas as pd  # noqa: F401 (worker-side)
    pats = [(f" {a}  {b} ", f" {a}{b} ") for a, b in merges]

    @F.pandas_udf("array<string>")
    def _enc(texts):
        cache: dict[str, list[str]] = {}

        def enc_word(w):
            r = cache.get(w)
            if r is None:
                s = " " + "  ".join(w) + "  "
                for pat, rep in pats:
                    if pat in s:
                        s = s.replace(pat, rep)
                r = cache[w] = s.strip(" ").split("  ")
            return r

        def enc_text(t):
            if t is None:
                return []
            out: list[str] = []
            for w in _WS.split(t):
                if w:
                    out.extend(enc_word(w))
            return out

        return texts.map(enc_text)

    # case-fold on the JVM side (F.lower), NOT with Python str.lower()
    # inside the UDF: the two disagree on Unicode edge cases ('İ' →
    # 'i̇' two codepoints in Python), and bpe_train/word_freqs fold with
    # F.lower — merges learned there must apply identically at encode
    # time. The module already pins \s to ASCII for the same reason.
    src = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    return df.withColumn(out_col, _enc(src))


def bpe_save(spark, merges: list[tuple[str, str]], path: str) -> None:
    """Persist a merge list as rank-ordered parquet — the tokenizer
    artifact a training pipeline ships alongside its shards."""
    spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string").coalesce(1) \
        .write.mode("overwrite").parquet(path)


def bpe_load(spark, path: str) -> list[tuple[str, str]]:
    rows = spark.read.parquet(path).orderBy("rank").collect()
    return [(r["left"], r["right"]) for r in rows]


def bpe_vocab(merges: list[tuple[str, str]],
              specials: tuple[str, ...] = ("<unk>",)) -> list[str]:
    """Token inventory induced by a merge list: specials, then the
    merged symbols in rank order (characters come from the corpus at
    encode time; merged tokens are the learned inventory)."""
    return list(specials) + [a + b for a, b in merges]
