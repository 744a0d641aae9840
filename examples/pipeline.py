"""End-to-end training-data pipeline on the engine — the workload shape the
100 TB design targets:

  ingest → text features → quality filter → exact dedup → near-dup dedup
  (MinHash-LSH) → embedding near-dup → deterministic train/val/test split
  → context-window packing → save curated corpus + IVF index

Run: python examples/pipeline.py [sf_dir] (default /root/testdata/sf0.001)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import juliadb_jl_spark as jdb
from juliadb_jl_spark.functions import dedup as DD
from juliadb_jl_spark.functions import sampling as SP
from juliadb_jl_spark.functions import similarity as SIM
from juliadb_jl_spark.functions import text as TX
from juliadb_jl_spark.sources.testdata import read_table


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated_corpus"
    spark = jdb.get_spark("pipeline-example")

    with jdb.tracktime("ingest+features", spark):
        docs = read_table(spark, sf_dir, "documents")
        feats = TX.add_text_features(docs)

    with jdb.tracktime("quality-filter", spark):
        kept = feats.filter((F.col("quality") >= 0.5) & (F.col("n_tokens") >= 10))

    with jdb.tracktime("exact-dedup", spark):
        kept = DD.dedup_exact(kept, "doc_id")

    with jdb.tracktime("neardup-minhash", spark):
        pairs = DD.minhash_lsh_pairs(kept, "doc_id", k=3, num_hashes=32,
                                     bands=16, threshold=0.6)
        # drop the higher doc_id of each near-dup pair
        losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
        # the curated set feeds split/pack/save/counts — persist so the
        # dedup chain runs once, not per downstream action
        kept = kept.join(losers, "doc_id", "left_anti").persist()

    with jdb.tracktime("embedding-neardup", spark):
        emb = read_table(spark, sf_dir, "embeddings")
        epairs = DD.embedding_neardup_pairs(emb, "vec_id", "embedding",
                                            threshold=0.95)

    with jdb.tracktime("split+pack", spark):
        # deterministic, append-stable selection: split by key hash, then
        # pack the train docs into contiguous token-budget bins
        kept = SP.split_by_hash(kept, "doc_id",
                                {"train": 0.9, "val": 0.05, "test": 0.05})
        train = kept.filter(F.col("split") == "train")
        train = SP.pack_tokens(train, "n_tokens", budget=2048,
                               order=["doc_id"])

    with jdb.tracktime("save+index", spark):
        jdb.save(jdb.table(kept.drop("split"), pkey="doc_id"),
                 f"{out_dir}/documents")
        tagged, cents = SIM.ivf_build(emb, n_cells=8)
        SIM.ivf_save(tagged, cents, f"{out_dir}/ivf")

    n_in = docs.count()
    n_out = kept.count()
    splits = {r["split"]: r["n"] for r in
              kept.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_bins = train.agg(F.max("bin")).head()[0]
    print(f"\ncorpus: {n_in} docs in -> {n_out} kept "
          f"({n_in - n_out} dropped by quality/dedup); "
          f"splits {splits}; train packed into {(n_bins or 0) + 1} bins; "
          f"{epairs.count()} embedding near-dup pairs flagged")
    print("\nstage timings:")
    print(jdb.timings().drop(columns=["ts"]).to_string(index=False))
    print(f"\ncurated corpus + IVF index at {out_dir}")


if __name__ == "__main__":
    main()
