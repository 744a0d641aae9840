"""Document-op bench at the 5M-doc rung (VERDICT r5 #7): the headline
bench (bench.py, sf0.1) amortizes document ops to sub-seconds, so a
document-op scale regression only ever surfaced as a rung anecdote in
SCALING.md. This runs the heavy document operators at a real rung and
prints ONE JSON line; the per-round table lives in SCALING.md §docs-rung.

Usage: python tools/docs_bench.py [rung_dir]   (default .testdata/sfdocs)
Each op runs ONCE (they are minutes-long); wall + process-tree CPU both
reported — CPU is the load-robust statistic, as in bench.py.

Load gate + control (VERDICT r8 #1): BENCH_DOCS_r08 ran at ambient
load ~35 and its 826 s total was not comparable to r7's idle 612 s.
The rung now waits for an idle host before measuring (same gate as
bench.py; stamps ``"noisy": true`` on timeout) and carries a control
row: ``dedup_exact`` — a pure fingerprint hash-groupBy untouched since
r4, measured 5.47/5.43 s in r7/r8 under wildly different ambient load
(its 32-thread saturated shape self-normalizes) — so drift on the
control marks the artifact, not the code.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _await_idle, _proc_tree_cpu  # noqa: E402

DOCS_CONTROL_OP = "dedup_exact"
DOCS_CONTROL_REF = 5.45  # r7 idle 5.47 / r8 loaded 5.43 — stable


def main():
    rung = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".testdata/sfdocs")
    from pyspark.sql import functions as F

    from juliadb_jl_spark.functions import curation as CU
    from juliadb_jl_spark.functions import dedup as DD
    from juliadb_jl_spark.functions import text as TX
    from juliadb_jl_spark.session import get_spark
    from juliadb_jl_spark.sources.testdata import read_table

    load_start, noisy = _await_idle()
    spark = get_spark("docs-bench", cpus=32, shuffle_partitions=64)
    docs = read_table(spark, rung, "documents")
    me = os.getpid()

    def _substring_index(d):
        from juliadb_jl_spark.functions.incremental import substring_index
        return substring_index(d, "doc_id", k=20)

    OPS = {
        "winnow_k20_w4": lambda d: DD.winnow_fingerprints(
            d, "doc_id", k=20, w=4),
        "window_fps_k20": lambda d: DD._window_fps(
            d, "doc_id", "text", 20),
        "paragraph_dedup": lambda d: CU.paragraph_dedup(
            d, "doc_id", "text", granularity="line"),
        "frequent_phrases_n3": lambda d: TX.frequent_phrases(
            d, n=3, min_count=5, k=50),
        "dedup_exact": lambda d: DD.dedup_exact(d, "doc_id"),
        "novelty_scores_n5": lambda d: CU.novelty_scores(d, "doc_id"),
        "minhash_signatures": lambda d: DD.minhash_signature(
            d, "doc_id", num_hashes=32),
        # corpus-vs-itself leakage: the eval split's char volume puts
        # auto in its top tier here (scale-safe two-sided shuffle +
        # sort-merge bench join) — the honest 100-TB shape for
        # corpus-sized evals
        "split_leakage_n5": lambda d: CU.split_leakage(
            d.withColumn("split",
                         F.when(F.pmod(F.xxhash64("doc_id"), F.lit(10))
                                == 0, "eval").otherwise("train")), n=5),
        "duplicate_spans_k20": lambda d: DD.duplicate_spans(
            d, "doc_id", k=20),
        "substring_index_k20": lambda d: _substring_index(d),
        # A/B twin: since r8 flipped duplicate_spans' default to u64,
        # the tracked row above IS the 8-byte poly-crc path; this twin
        # is the 16-byte md5 escape hatch (the dedup_substrings rewrite
        # default). Opt-in only (name it in SPARK_GRAFT_DOCS_OPS) — not
        # part of the tracked rung total.
        "duplicate_spans_k20_md5": lambda d: DD.duplicate_spans(
            d, "doc_id", k=20, fp_fmt="bin"),
    }
    AB_ONLY = {"duplicate_spans_k20_md5"}
    only = os.environ.get("SPARK_GRAFT_DOCS_OPS")
    if only:
        OPS = {k: v for k, v in OPS.items() if k in only.split(",")}
    else:
        OPS = {k: v for k, v in OPS.items() if k not in AB_ONLY}
    # min-of-N mode (default 1): single-run rows on this host swing up
    # to ~3x with accumulated memory state (SCALING.md §docs-rung
    # adjudication) — min-of-2 stabilizes the artifact's
    # regression-catching purpose at 2x rung cost
    runs = int(os.environ.get("SPARK_GRAFT_DOCS_RUNS", "1"))
    results, cpu = {}, {}
    n_docs = docs.count()
    for name, fn in OPS.items():
        walls, cpus_ = [], []
        for _ in range(max(1, runs)):
            c0 = _proc_tree_cpu(me)
            t0 = time.time()
            try:
                fn(docs).write.format("noop").mode("overwrite").save()
                walls.append(round(time.time() - t0, 2))
                c1 = _proc_tree_cpu(me)
                cpus_.append(round(c1 - c0, 1)
                             if c0 is not None and c1 is not None
                             else None)
            except Exception as ex:
                print(f"docs-bench error in {name}: {ex}",
                      file=sys.stderr)
                walls.append(-1.0)
                cpus_.append(None)
                break
        # in min-of-N mode report the (wall, cpu) PAIR from the run
        # with the minimum wall (ADVICE r7: independent minima could
        # pair one run's wall with another's CPU, muddying wall-vs-CPU
        # reads); negative CPU deltas are sampling artifacts
        # (SIGKILLed workers reparent to init and their time leaves
        # the process tree — SCALING.md footnote ¹), treated as absent
        pairs = [(w, c) for w, c in zip(walls, cpus_) if w >= 0]
        if pairs:
            best_w, best_c = min(pairs, key=lambda p: p[0])
            results[name] = best_w
            if best_c is not None and best_c >= 0:
                cpu[name] = best_c
        else:
            results[name] = -1.0
        print(f"# {name}: {results[name]}s (runs: {walls})",
              file=sys.stderr)
    control = None
    if results.get(DOCS_CONTROL_OP, -1.0) >= 0:
        control = {
            "op": DOCS_CONTROL_OP,
            "min": results[DOCS_CONTROL_OP],
            "ref": DOCS_CONTROL_REF,
            "drift": round(
                results[DOCS_CONTROL_OP] / DOCS_CONTROL_REF - 1.0, 2),
        }
    out = json.dumps({
        "metric": "docs_rung_total_sec",
        "value": round(sum(v for v in results.values() if v >= 0), 2),
        "unit": "sec", "queries": results, "queries_cpu": cpu,
        "n_docs": n_docs, "rung": rung,
        "load": [round(x, 2) for x in os.getloadavg()],
        "load_start": load_start, "noisy": noisy, "control": control,
    })
    print(out)
    # tracked gate artifact (VERDICT r6 #7): BENCH_DOCS_r{N}.json diffs
    # catch document-op rung regressions round-over-round
    path = os.environ.get("SPARK_GRAFT_DOCS_OUT")
    if path:
        with open(path, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
