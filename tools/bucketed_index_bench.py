"""Measure the bucketed-index composition for incremental ingest.

The claim under test (SCALING.md round 5): with the index persisted
hash-bucketed on its join key (`save_index_bucketed`), a batch too big
to broadcast joins the index WITHOUT re-partitioning it — the plan
exchanges only the batch.  This harness runs `minhash_against`
(verify=False, broadcast_new=False — the forced worst case) and
`dedup_exact_against` with the same index stored two ways:

  * plain parquet (the r4 shape: index banded in-flight + shuffled)
  * bucketed table via save_index_bucketed (r5: scan satisfies the join)

and reports wall seconds, index-side exchange presence, and output
equality.  Usage: python tools/bucketed_index_bench.py [sf_dir]
(default .testdata/sf10 — 500k docs, 250k-doc index).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.testdata/sf10"
    from juliadb_jl_spark.functions import incremental as INC
    from juliadb_jl_spark.session import get_spark
    from juliadb_jl_spark.sources.testdata import read_table

    spark = get_spark("bucketed_index_bench")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    docs = read_table(spark, sf_dir, "documents")
    # realistic ingest ratio: the index holds half the corpus, the batch
    # is ~1% — batch-side work is then small and the measurement isolates
    # the INDEX-side cost (in-flight banding + shuffle vs bucketed scan)
    old = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 100 == 1)
    work = "/tmp/bucketed_index_bench"

    def timed(name, thunk):
        t0 = time.time()
        out = thunk()
        print(json.dumps({"op": name, "wall_sec": round(time.time() - t0, 2),
                          "result": out}), flush=True)
        return out

    # --- persist both layouts of the SAME minhash index
    midx = INC.minhash_index(old, "doc_id", num_hashes=32)
    timed("build_plain_index", lambda: (
        midx.write.mode("overwrite").parquet(f"{work}/mh_plain"), None)[1])
    banded = INC.minhash_index_banded(midx, num_hashes=32, bands=8)
    timed("build_bucketed_index", lambda: (
        INC.save_index_bucketed(banded, "bib_mh", "minhash", buckets=32),
        None)[1])
    plain = spark.read.parquet(f"{work}/mh_plain")
    buck = INC.load_index("bib_mh", spark)

    kw = dict(num_hashes=32, bands=8, verify=False, broadcast_new=False)
    cp = INC.minhash_against(new, plain, "doc_id", **kw)
    cb = INC.minhash_against(new, buck, "doc_id", **kw)
    for tag, df in (("plain", cp), ("bucketed", cb)):
        p = df._jdf.queryExecution().executedPlan().toString()
        print(json.dumps({"op": f"minhash_{tag}_plan",
                          "exchanges": p.count("Exchange hashpartitioning"),
                          "bucketed_scan": "Bucketed: true" in p}), flush=True)
    np_ = timed("minhash_against_plain_index", lambda: cp.count())
    nb = timed("minhash_against_bucketed_index", lambda: cb.count())
    assert np_ == nb, (np_, nb)

    # --- exact index both ways
    xidx = INC.dedup_index(old, "doc_id")
    xidx.write.mode("overwrite").parquet(f"{work}/ex_plain")
    INC.save_index_bucketed(xidx, "bib_ex", "exact", buckets=32)
    xp = INC.dedup_exact_against(
        new, spark.read.parquet(f"{work}/ex_plain"), "doc_id")
    xb = INC.dedup_exact_against(new, INC.load_index("bib_ex", spark),
                                 "doc_id")
    kp = timed("exact_against_plain_index", lambda: xp.count())
    kb = timed("exact_against_bucketed_index", lambda: xb.count())
    assert kp == kb, (kp, kb)

    for t in ("bib_mh", "bib_ex"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    print(json.dumps({"all_ok": True}), flush=True)


if __name__ == "__main__":
    main()
