"""Build a DOCUMENT-SCALE rung (default 5M docs) for the dedup +
incremental-ingest family — the 100-TB claim is about documents, and
`make_sf.py`'s plain replication cannot reach 5M docs with well-posed
invariants: at factor 1000 every source doc would become a 1000-member
exact clique (Σ C(1000,2) ≈ 2.5×10⁹ all-pairs — physically nonsensical
to enumerate, the same reason sf10skew switched to star edges).

Two-level replication instead: each source doc becomes
``factor // clique`` DISTINCT text variants × ``clique``-member exact
duplicate cliques.  A (variant × source-doc)-unique token is woven in
after every second token (``'(\\S+ \\S+)' -> '\\1 vNxSRC'``), so EVERY
3-gram shingle window of a variant copy contains a token no OTHER
distinct text has — pairwise Jaccard between any two distinct texts is
exactly 0, while clique members stay byte-identical.  The true-pair
population is then exactly the exact-duplicate cliques (5k src × 100
variants × C(10,2) = 22.5M jaccard-1 pairs — the proven sf10
magnitude) and the candidate volume is bounded by the cliques too.
(First cut used a per-variant-only token; source docs within a variant
then still shared their natural phrase shingles, multiplying the
sf0.1 corpus's dense candidate set ×100 — the verify join carries both
shingle arrays per candidate and spilled >76 GB of shuffle before
dying.  Distinct-text-disjoint shingle spaces are the well-posed way
to grow DOC COUNT without growing the quadratic near-dup load that is
a property of the data, not the engine.)

Embeddings replicate plainly (identical-vector groups of
``emb_factor``) — the embedding invariant needs identical groups, and
its candidate count scales with group size squared, so it gets its own
smaller factor.

Usage: python tools/make_docs_rung.py [factor] [clique] [emb_factor]
                                      [src_dir] [out_dir] [offset_parity]
Defaults: 1000 10 50 /root/testdata/sf0.1 /root/repo/.testdata/sfdocs odd
→ 5,000,000 documents (500k variants × 10-cliques), 100,000 embeddings
(2k groups of 50).  Gate: tools/check_invariants.py <out_dir>.

offset_parity picks which half of the invariants gate the rung
stresses: ``odd`` offsets alternate clique-member id parity, so the
odd/even incremental MinHash/embedding checks (#6/#7) see the full
clique cross-link load (12.5M / 1.25M links) while incremental exact
(#5) degenerates to 0 == 0 (every text exists on both sides); ``even``
offsets put each clique on one side, making #5 the strong check
(distinct-fp difference = 249,993) while #6/#7 see only the duplicate
source texts.  Run both parities for full coverage (both recorded
7/7-exact in round 5).
"""

from __future__ import annotations

import os
import sys

import duckdb


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    clique = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    emb_factor = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    src = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    out = sys.argv[5] if len(sys.argv) > 5 else "/root/repo/.testdata/sfdocs"
    parity = sys.argv[6] if len(sys.argv) > 6 else "odd"
    assert factor % clique == 0, "factor must be a multiple of clique"
    assert parity in ("odd", "even")
    want = 1 if parity == "odd" else 0
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    # odd offsets: replica ids ALTERNATE parity within a clique (strong
    # #6/#7); even offsets: each clique lands on one side (strong #5)
    doc_unit = con.execute(
        f"SELECT max(doc_id) + 1 FROM "
        f"read_parquet('{src}/documents.parquet')").fetchone()[0]
    if doc_unit % 2 != want:
        doc_unit += 1
    # variant 0 keeps the original text so the rung contains the source
    # corpus verbatim; n_chars recomputed to stay consistent with text
    con.execute(f"""
      COPY (
        SELECT doc_id, text, lang, source, length(text) AS n_chars
        FROM (
          SELECT d.doc_id + r.r * {doc_unit} AS doc_id,
                 CASE WHEN r.r // {clique} = 0 THEN d.text
                      ELSE regexp_replace(d.text, '(\\S+ \\S+)',
                           '\\1 v' || CAST(r.r // {clique} AS VARCHAR) ||
                           'x' || CAST(d.doc_id AS VARCHAR), 'g')
                 END AS text,
                 d.lang, d.source
          FROM read_parquet('{src}/documents.parquet') d,
               range({factor}) AS r(r))
      ) TO '{out}/documents.parquet'
        (FORMAT PARQUET, ROW_GROUP_SIZE 262144)""")
    n = con.execute(f"SELECT count(*), count(DISTINCT text) FROM "
                    f"read_parquet('{out}/documents.parquet')").fetchone()
    print(f"documents: {n[0]} rows, {n[1]} distinct texts "
          f"(cliques of {clique})")

    emb_unit = con.execute(
        f"SELECT max(vec_id) + 1 FROM "
        f"read_parquet('{src}/embeddings.parquet')").fetchone()[0]
    if emb_unit % 2 != want:
        emb_unit += 1
    con.execute(f"""
      COPY (
        SELECT e.vec_id + r.r * {emb_unit} AS vec_id, e.embedding, e.label
        FROM read_parquet('{src}/embeddings.parquet') e,
             range({emb_factor}) AS r(r)
      ) TO '{out}/embeddings.parquet'
        (FORMAT PARQUET, ROW_GROUP_SIZE 262144)""")
    n = con.execute(f"SELECT count(*) FROM "
                    f"read_parquet('{out}/embeddings.parquet')").fetchone()[0]
    print(f"embeddings: {n} rows (identical-vector groups of {emb_factor})")


if __name__ == "__main__":
    main()
