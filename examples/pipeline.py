"""End-to-end training-data pipeline on the engine — the workload shape the
100 TB design targets:

  ingest → C4 line cleaning → text features + repetition signals → PII
  scrub → quality filter → quality classifier (distributed logreg) →
  exact dedup → near-dup dedup (MinHash-LSH + cluster resolution) →
  semantic dedup (embeddings) → cluster curation (k-means fit +
  prototype prune + balanced sample) → contamination check → temperature
  mixture rebalance → deterministic train/val/test split →
  context-window packing → bigram-LM perplexity filter → deterministic
  shuffle → BPE tokenizer training + encoding → token-id encoding →
  save curated corpus + token shards + IVF index

Run: python examples/pipeline.py [sf_dir] (default /root/testdata/sf0.001)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import juliadb_jl_spark as jdb
from juliadb_jl_spark.functions import bpe as BPE
from juliadb_jl_spark.functions import classifier as CL
from juliadb_jl_spark.functions import clustering as KM
from juliadb_jl_spark.functions import curation as CU
from juliadb_jl_spark.functions import dedup as DD
from juliadb_jl_spark.functions import incremental as INC
from juliadb_jl_spark.functions import sampling as SP
from juliadb_jl_spark.functions import similarity as SIM
from juliadb_jl_spark.functions import text as TX
from juliadb_jl_spark.sources.testdata import read_table


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated_corpus"
    spark = jdb.get_spark("pipeline-example")

    with jdb.tracktime("ingest+clean", spark):
        docs = read_table(spark, sf_dir, "documents")
        # line-level cleaning first (C4: sentence-shaped lines only) —
        # the synthetic corpus has no punctuation, so keep the raw text
        # when cleaning would empty the doc
        # strip invisible bytes FIRST (zero-width/control chars defeat
        # exact dedup keys); keep original casing for the features
        docs = docs.withColumn("text", TX.normalize_text(
            F.col("text"), casefold=False))
        cleaned = CU.c4_line_clean(docs)
        cleaned = cleaned.withColumn(
            "text", F.when(F.col("n_kept") > 0, F.col("text_clean"))
            .otherwise(F.col("text"))).drop("text_clean")
        # MATERIALIZE the computed text before fan-out reuse: ~30
        # downstream feature expressions each reference `text`, and
        # Catalyst's Project collapse would re-inline the cleaning
        # expression into every one of them (at 100 TB this stage is a
        # parquet write of the cleaned corpus — same barrier, durable)
        cleaned = cleaned.localCheckpoint(eager=False)

    with jdb.tracktime("features+pii+quality-filter", spark):
        feats = CU.repetition_stats(TX.add_text_features(cleaned))
        feats = CU.add_pii_columns(feats).drop("text") \
            .withColumnRenamed("text_scrubbed", "text")
        kept = feats.filter(
            (F.col("quality") >= 0.5) & (F.col("n_tokens") >= 10)
            & (F.col("dup_line_frac") <= 0.3)
            & (F.col("top_2gram_frac") <= 0.2))
        # second barrier before the join-heavy dedup stages: dedup /
        # minhash / contamination each reference `kept` on BOTH sides of
        # a join — without materialization the whole feature chain would
        # be duplicated (and re-optimized) per branch
        kept = kept.localCheckpoint(eager=False)

    with jdb.tracktime("novelty-filter", spark):
        # cross-document boilerplate signal: drop docs whose 5-grams
        # are mostly shared with other docs (templated/memorized text)
        nov = CU.novelty_scores(kept, "doc_id", n=5) \
            .filter(F.col("novelty") < 0.05).select("doc_id")
        kept = kept.join(nov, "doc_id", "left_anti")

    with jdb.tracktime("quality-classifier", spark):
        # fastText-style hashed-feature logreg on a weak label (language
        # heuristic agreement) — at 100 TB you'd train on a sample and
        # score the full corpus with the pure-native expression
        labeled = kept.withColumn(
            "label", (F.col("lang_pred") == F.col("lang")).cast("double"))
        model = CL.train_logreg(labeled.sample(0.5, seed=7), "label",
                                dim=128, iters=5, lr=1.0)
        kept = CL.add_quality_score(kept, model)

    with jdb.tracktime("exact-dedup", spark):
        kept = DD.dedup_exact(kept, "doc_id")

    with jdb.tracktime("neardup-minhash+clusters", spark):
        # star_intra: component-equivalent sparse edges — the input is
        # already exact-deduped, so this is a no-op today, but it keeps
        # the stage linear if a near-identical clique slips through
        pairs = DD.minhash_lsh_pairs(kept, "doc_id", k=3, num_hashes=32,
                                     bands=16, threshold=0.6,
                                     star_intra=True)
        # transitive cluster resolution keeps the smallest-id member of
        # each near-dup cluster (not merely pairwise loser-dropping).
        # The curated set feeds split/pack/save/counts — persist so the
        # dedup chain runs once, not per downstream action
        kept = DD.dedup_by_clusters(kept, pairs, "doc_id").persist()

    with jdb.tracktime("semantic-dedup", spark):
        emb = read_table(spark, sf_dir, "embeddings")
        epairs = DD.embedding_neardup_pairs(emb, "vec_id", "embedding",
                                            threshold=0.95)

    with jdb.tracktime("cluster-curate", spark):
        # SemDeDup/D4-shaped cluster stage: fit k-means once (artifact
        # persisted — later ingest batches score against it without
        # re-fitting), drop the most prototypical quarter of each
        # cluster (redundancy), then keep a balanced per-cell sample
        # for diversity; all decisions deterministic and append-stable
        cents = KM.kmeans_fit(emb, k=8, iters=2)
        KM.centroids_save(spark, cents, f"{out_dir}/centroids")
        diverse = KM.prototype_prune(emb, cents, frac=0.25, keep="far")
        n_cell_target = max(1, diverse.count() // 16)
        balanced = KM.cluster_sample(diverse, cents, n_cell_target, seed=5)
        n_emb, n_diverse, n_bal = emb.count(), diverse.count(), \
            balanced.count()

    with jdb.tracktime("contamination", spark):
        # guard against eval-set leakage: here the 'benchmark' is a tiny
        # held-out slice of the corpus itself (stand-in for a real suite)
        bench = docs.filter(F.col("doc_id") % 97 == 0).select("text")
        contam = CU.contamination_report(kept, bench, n=5)
        flagged = contam.filter(F.col("contamination") >= 0.8) \
            .select("doc_id")
        kept = kept.join(flagged, "doc_id", "left_anti")

    with jdb.tracktime("temperature-mix", spark):
        # alpha-sample sources toward a flatter mixture (downsample-only,
        # deterministic) so no single crawl dominates the token budget
        kept = SP.temperature_downsample(kept, "source", key="doc_id",
                                         alpha=0.5, seed=11)

    with jdb.tracktime("split+pack", spark):
        # deterministic, append-stable selection: split by key hash, then
        # pack the train docs into contiguous token-budget bins
        kept = SP.split_by_hash(kept, "doc_id",
                                {"train": 0.9, "val": 0.05, "test": 0.05})
        train = kept.filter(F.col("split") == "train")
        train = SP.pack_tokens(train, "n_tokens", budget=2048,
                               order=["doc_id"])

    with jdb.tracktime("perplexity-filter", spark):
        # LM-based quality pass (CCNet-style): self-train a bigram LM on
        # the curated set, drop the highest-perplexity tail
        lm = TX.bigram_lm(kept)
        ppl = TX.perplexity_scores(kept, "doc_id", lm)
        cutoff = ppl.agg(
            F.expr("percentile_approx(ppl, 0.95)")).head()[0]
        train = train.join(
            ppl.filter(F.col("ppl") <= F.lit(cutoff)).select("doc_id"),
            "doc_id", "left_semi")

    with jdb.tracktime("epoch-shuffle+encode", spark):
        # deterministic, seed-keyed training order for epoch 0, then
        # token-id encoding under a frequency-ordered vocabulary
        train = CU.shuffle_rows(train, "doc_id", seed=0)
        vocab = TX.build_vocab(kept, min_freq=2)
        encoded = TX.encode_tokens(train, "doc_id", vocab)

    with jdb.tracktime("bpe-tokenizer", spark):
        # subword alternative to the word-level vocabulary: train a BPE
        # merge list on the curated corpus (one distributed count pass),
        # encode the train split with the memoized no-shuffle encoder
        merges = BPE.bpe_train(kept, num_merges=64)
        bpe_encoded = BPE.bpe_encode(train, merges)
        n_pieces = bpe_encoded.agg(
            F.sum(F.size("pieces")).alias("n")).head()["n"]

    with jdb.tracktime("serving-handoff", spark):
        # retrieval/eval handoff: outlier-gate by data-driven length
        # percentiles, cap any runaway source, chunk to overlapping
        # token windows (the RAG unit), and quantize the embedding
        # store to int8 codes for the ANN index (4x smaller)
        gated = CU.filter_by_quantile(kept, "n_tokens", 0.02, 0.98)
        capped = SP.cap_per_key(gated, "source", 200, key="doc_id")
        chunks = CU.chunk_documents(capped, size=64, overlap=8)
        q8 = SIM.quantize_embeddings(emb)
        n_gated, n_capped = gated.count(), capped.count()
        n_chunks = chunks.count()
        n_q8 = q8.filter(F.size("q_codes") > 0).count()

    with jdb.tracktime("release-audit", spark):
        # the tables a dataset release publishes alongside the data:
        # (1) what this version changed vs the previous release —
        # here old = the raw crawl, new = the curated set, so
        # `removed` counts curation drops and `changed` counts
        # cleaned/scrubbed docs; only (id, md5) ever cross the join
        changelog = CU.corpus_diff_report(docs, kept).head()
        # (2) threshold calibration of the quality classifier against
        # the weak label — ONE corpus pass for all cutoffs
        cal = CL.calibration_report(
            CL.add_quality_score(
                labeled.select("doc_id", "text", "label"), model),
            "clf_score", "label", [0.3, 0.5, 0.7])
        best = max(cal.collect(), key=lambda r: r["f1"])
        # (3) dedup threshold curve from the ONE pair table the
        # near-dup stage already computed — no re-detection per cutoff
        curve = {r["threshold"]: r["n_docs_flagged"] for r in
                 DD.dedup_rate_curve(pairs, [0.6, 0.8, 0.95],
                                     sim_col="jaccard").collect()}
        # (4) train→val/test n-gram leakage on the split we just chose
        # (train side is corpus-sized: the non-broadcast join shape)
        leak = CU.split_leakage(kept, n=5)
        n_leaky = leak.filter(F.col("contamination") >= 0.8).count()

    with jdb.tracktime("save+index", spark):
        jdb.save(jdb.table(kept.drop("split"), pkey="doc_id"),
                 f"{out_dir}/documents")
        jdb.save(jdb.table(encoded, pkey="doc_id"),
                 f"{out_dir}/train_tokens", compression="zstd")
        tagged, cents = SIM.ivf_build(emb, n_cells=8)
        SIM.ivf_save(tagged, cents, f"{out_dir}/ivf")

    with jdb.tracktime("incremental-ingest", spark):
        # day-2 ingest: a new crawl batch (re-crawled copies of existing
        # docs + whatever survived curation elsewhere) deduped against
        # the persisted corpus INDEX — the curated corpus itself is
        # never re-scanned; near-dup links come from banding the batch
        # signatures against the signature index (no self-joins)
        idx = INC.dedup_index(kept, "doc_id")
        batch = (docs.sample(0.3, seed=7)
                 .withColumn("doc_id", F.col("doc_id") + 10_000_000))
        fresh = INC.dedup_exact_against(batch, idx, "doc_id")
        sig_idx = INC.minhash_index(kept, "doc_id")
        links = INC.minhash_against(fresh, sig_idx, "doc_id",
                                    corpus_df=kept, threshold=0.5)
        # ingest-time curation signal: how novel is what survived?
        nv = INC.novelty_against(fresh, INC.novelty_index(kept), "doc_id")
        mean_novelty = nv.agg(F.avg("novelty")).head()[0]
        n_batch, n_fresh, n_links = batch.count(), fresh.count(), links.count()

    n_in = docs.count()
    n_out = kept.count()
    splits = {r["split"]: r["n"] for r in
              kept.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_bins = train.agg(F.max("bin")).head()[0]
    print(f"\ncorpus: {n_in} docs in -> {n_out} kept "
          f"({n_in - n_out} dropped by quality/dedup); "
          f"splits {splits}; train packed into {(n_bins or 0) + 1} bins; "
          f"{epairs.count()} embedding near-dup pairs flagged; "
          f"cluster curation: {n_emb} vectors -> {n_diverse} after "
          f"prototype prune -> {n_bal} balanced; "
          f"BPE: {len(merges)} merges, {n_pieces} train pieces; "
          f"day-2 ingest: {n_batch} batch docs -> {n_fresh} fresh "
          f"({n_links} near-dup links vs corpus index, "
          f"mean novelty {mean_novelty:.3f}); "
          f"serving handoff: {n_out} -> {n_gated} length-gated -> "
          f"{n_capped} capped -> {n_chunks} chunks; "
          f"{n_q8} embeddings quantized to int8; "
          f"release audit: changelog +{changelog['n_added']}"
          f"/-{changelog['n_removed']}/~{changelog['n_changed']} "
          f"(unchanged {changelog['n_unchanged']}), "
          f"classifier cutoff {best['threshold']} "
          f"(F1 {best['f1']:.3f}), dedup curve {curve}, "
          f"{n_leaky} leaky val/test docs")
    print("\nstage timings:")
    print(jdb.timings().drop(columns=["ts"]).to_string(index=False))
    print(f"\ncurated corpus + IVF index at {out_dir}")


if __name__ == "__main__":
    main()
