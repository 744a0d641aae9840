"""Streaming at the rung (VERDICT r8 #6): drive FunnelSink and
stream_dedup_against over a MULTI-BATCH stream of the 5M-doc rung and
record (a) state size from the engine's own stateOperators metrics and
(b) final-counts ≡ batch-twin equality.  The micro-batch pytest rows
prove the semantics; this proves the STATE BOUND at a real rung:
 - stream_dedup_against is a stream-static anti-join — stateless by
   construction (no stateOperators entry at all);
 - the chained within-stream `streaming_dedup` (no watermark: the
   documented unbounded mode) holds exactly one state row per distinct
   surviving fingerprint — the recorded numRowsTotal must equal the
   batch twin's distinct-fp count, and memory must be ~fp-row-sized;
 - FunnelSink state is (n_stages+1) rows regardless of corpus size.

Usage: python tools/stream_rung.py [rung_dir] [--json OUT]
Splits the rung's odd-doc_id half into N_FILES parquet files and
streams them 1 file/trigger against a dedup index built from the even
half (continuous-ingest composition, same as q9b's batch twin).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FILES = 10


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
        ".testdata/sfdocs")

    from pyspark.sql import functions as F

    from juliadb_jl_spark.functions.curation import curation_funnel
    from juliadb_jl_spark.functions.incremental import _fp, dedup_index
    from juliadb_jl_spark.session import get_spark
    from juliadb_jl_spark.sources.testdata import read_table
    from juliadb_jl_spark.streaming.aggregate import (
        stream_dedup_against, stream_from_parquet, streaming_dedup)
    from juliadb_jl_spark.streaming.funnel_sink import FunnelSink

    spark = get_spark("stream-rung", cpus=32, shuffle_partitions=32)
    docs = read_table(spark, rung, "documents")
    # corpus = ~25% of DISTINCT TEXTS (hash-of-text selector, so a
    # text is either fully indexed or fully novel); stream = the odd
    # doc_id half.  An id-parity corpus would degenerate on the 5M
    # rung: its cliques alternate member parity (make_docs_rung
    # offset_parity=odd), so every streamed text would already be
    # indexed and the run would check 0 == 0.  This split makes all
    # three claims non-trivial: the anti-join drops ~1/4 of the
    # stream, the within-stream dedup collapses the ~5 odd copies per
    # surviving clique, and the state row count must equal the
    # surviving distinct-fp census.
    corpus = docs.filter(F.pmod(F.xxhash64("text"), F.lit(4)) == 0)
    newhalf = docs.filter(F.pmod("doc_id", F.lit(2)) == 1)

    work = tempfile.mkdtemp(prefix="jdbspark_stream_rung_")
    try:
        t0 = time.time()
        idx_path = os.path.join(work, "dedup_index")
        dedup_index(corpus, "doc_id").write.parquet(idx_path)
        idx = spark.read.parquet(idx_path)
        src = os.path.join(work, "stream_src")
        newhalf.repartition(N_FILES).write.parquet(src)
        t_setup = round(time.time() - t0, 1)

        stages = [
            ("min_len", F.length(F.trim("text")) >= 50),
            ("min_tokens", F.size(F.split(F.trim("text"), r"\s+")) >= 10),
        ]

        # --- streaming run -------------------------------------------
        t0 = time.time()
        stream = stream_from_parquet(spark, src, max_files_per_trigger=1)

        funnel_state = os.path.join(work, "funnel_state")
        sink = FunnelSink(funnel_state, stages)
        q1 = stream.writeStream.foreachBatch(sink) \
            .option("checkpointLocation", os.path.join(work, "ck1")) \
            .start()

        surv = stream_dedup_against(stream, idx)
        surv = streaming_dedup(
            surv.withColumn("__fp", _fp("text", True)), "__fp")
        out_path = os.path.join(work, "survivors")
        q2 = surv.writeStream.outputMode("append").format("parquet") \
            .option("path", out_path) \
            .option("checkpointLocation", os.path.join(work, "ck2")) \
            .start()

        q1.processAllAvailable()
        q2.processAllAvailable()
        n_batches = 0
        state = {}
        prog = q2.lastProgress
        if prog:
            n_batches = prog["batchId"] + 1
            ops = prog.get("stateOperators") or []
            state = {
                "n_state_operators": len(ops),
                "state_rows_total": sum(o.get("numRowsTotal", 0)
                                        for o in ops),
                "state_memory_bytes": sum(o.get("memoryUsedBytes", 0)
                                          for o in ops),
            }
        q1.stop()
        q2.stop()
        t_stream = round(time.time() - t0, 1)

        # --- batch twins ---------------------------------------------
        t0 = time.time()
        stream_rows = spark.read.parquet(out_path)
        got_n = stream_rows.count()
        got_fps = stream_rows.select("__fp").distinct()

        batch_surv = stream_dedup_against(newhalf, idx) \
            .withColumn("__fp", _fp("text", True))
        want_fps = batch_surv.select("__fp").distinct()
        want_n = want_fps.count()
        fp_sets_equal = (
            got_fps.count() == want_n and
            got_fps.join(want_fps, "__fp", "left_anti").count() == 0)

        sf = sink.current(spark).toPandas().sort_values("stage_idx")
        bf = curation_funnel(newhalf, stages).toPandas() \
            .sort_values("stage_idx")
        funnel_equal = (
            list(sf["stage"]) == list(bf["stage"]) and
            list(sf["docs_in"]) == list(bf["docs_in"]) and
            list(sf["docs_kept"]) == list(bf["docs_kept"]))
        funnel_rows = len(sf)
        t_twin = round(time.time() - t0, 1)

        out = {
            "metric": "stream_rung",
            "rung": rung,
            "n_stream_docs": int(bf["docs_in"].iloc[0]),
            "n_batches": n_batches,
            "survivors_stream": got_n,
            "survivors_batch_distinct_fp": want_n,
            "counts_equal": got_n == want_n,
            "fp_sets_equal": bool(fp_sets_equal),
            "funnel_equal": bool(funnel_equal),
            "funnel_state_rows": funnel_rows,
            "dedup_state": state,
            "sec_setup": t_setup, "sec_stream": t_stream,
            "sec_twin": t_twin,
        }
        line = json.dumps(out)
        print(line)
        if json_out:
            with open(json_out, "w") as fh:
                fh.write(line + "\n")
        sys.exit(0 if (out["counts_equal"] and fp_sets_equal
                       and funnel_equal) else 1)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
