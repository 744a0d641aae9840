"""ANN quality tracking (VERDICT r8 #5): a per-round RECALL artifact so
approximate-op quality is diffed across rounds like perf, not just
asserted once in tests.

Measures recall@10 of the IVF index (q39's configuration class) against
the exhaustive cosine top-k on the rung embeddings, at two nprobe
settings plus the nprobe == n_cells ladder top (which must be recall
1.0 exactly — every cell probed reproduces the exhaustive answer, the
same differential `test_embedding_against_ivf_recall_ladder` pins), and
the incremental `embedding_against_ivf` ladder at the same settings.

Usage: python tools/recall_bench.py [rung_dir] [--json OUT]
Defaults: .testdata/sf1 (20k vectors, dim 64).
Prints ONE JSON line; --json writes the tracked RECALL_r{N}.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CELLS = 16
NPROBES = (1, 4, N_CELLS)   # sparse probe, q39's default, ladder top
K = 10
N_QUERIES = 100


def main():
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    args = [a for a in argv if not a.startswith("--")]
    rung = args[0] if args else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".testdata/sf1")

    from pyspark.sql import functions as F

    from juliadb_jl_spark.functions import incremental as INC
    from juliadb_jl_spark.functions import similarity as SIM
    from juliadb_jl_spark.session import get_spark
    from juliadb_jl_spark.sources.testdata import read_table

    spark = get_spark("recall-bench", cpus=16, shuffle_partitions=16)
    emb = read_table(spark, rung, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)

    exact = SIM.cosine_topk(emb, queries, k=K).cache()
    tagged, cents = SIM.ivf_build(emb, n_cells=N_CELLS)
    tagged = tagged.cache()

    recalls: dict[str, float] = {}
    for nprobe in NPROBES:
        approx = SIM.ivf_topk(tagged, cents, queries, k=K, nprobe=nprobe)
        rep = SIM.recall_report(approx, exact, k=K)
        macro = rep.filter(F.col("query_id").isNull()).collect()[0]
        recalls[str(nprobe)] = round(float(macro["recall"]), 4)

    # incremental embedding_against_ivf ladder: fraction of the
    # exhaustive >=threshold links the probed path recovers (link
    # recall, not top-k — the op's own contract).  exact=True is the
    # exhaustive scan (the blocked default would itself be lossy).
    thr = 0.9
    idx = INC.embedding_index(emb, "vec_id", "embedding")
    n_exact = INC.embedding_against(
        queries, idx, "vec_id", "embedding", threshold=thr,
        exact=True).count()
    inc_recalls: dict[str, float] = {}
    for nprobe in NPROBES:
        got = INC.embedding_against_ivf(
            queries, tagged, cents, "vec_id", "embedding",
            threshold=thr, nprobe=nprobe).count()
        inc_recalls[str(nprobe)] = (
            round(got / n_exact, 4) if n_exact else 1.0)

    out = {
        "metric": f"ivf_recall_at_{K}",
        "value": recalls.get("4"),
        "n_cells": N_CELLS,
        "recall_at_k_by_nprobe": recalls,
        "against_ivf_link_recall_by_nprobe": inc_recalls,
        "link_threshold": thr,
        "k": K,
        "n_queries": N_QUERIES,
        "rung": rung,
    }
    line = json.dumps(out)
    print(line)
    if json_out:
        with open(json_out, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
