"""Shared expression-construction helpers (r9).

Two concerns live here:

- `col_sql`: the provably-round-trippable SQL text of a Column's
  unresolved expression (or None).  Lets wide expression builders emit
  ONE parsed `F.expr` string instead of thousands of synchronous py4j
  round trips (measured 1.3 s of q36's per-run build).
- flat vector kernels: `aggregate`/`zip_with` higher-order folds are
  CodegenFallback — interpreted per ELEMENT (the portable_hash cliff
  class, guide §4.1).  When the vector dimension is statically known,
  the fold is algebraically a flat sum of per-index terms whose
  left-associated adds reproduce the fold's exact IEEE summation order
  (0.0+x differs from x only on -0.0, which Spark's comparisons and
  sort normalization cannot distinguish), so the whole kernel stays
  inside whole-stage codegen; rows of any OTHER shape take the fold
  branch verbatim, keeping output bit-identical on every input.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Non-deterministic builtins that must never enter a flat kernel: the
# kernels splice the input's SQL text once per term (up to ~193 copies
# in _ph_sql, 2·dim in flat_dot_sql) and each copy would re-evaluate
# independently — silently diverging from the single-evaluation fold
# branch (ADVICE r9).  The SQL texts of unresolved trees don't expose
# a determinism flag pre-analysis, so guard by name.
_NONDET_RE = re.compile(
    r"\b(rand|randn|random|uuid|shuffle|monotonically_increasing_id|"
    r"rand_str|uniform|randstr|current_timestamp|now|"
    r"current_date|spark_partition_id|input_file_name)\s*\(", re.I)


def col_sql(col: Column) -> str | None:
    """SQL text of a Column's unresolved expression if it provably
    round-trips through the SQL parser, else None.  The guard is exact:
    the text is accepted only when re-parsing it yields a node with the
    IDENTICAL sql text — this rejects pyspark HOF lambda variables
    (print as bare generated names `x_3`/`y_7`/... that would re-parse
    as ordinary attributes), unquoted weird identifiers, and anything
    else lossy.  Rejection only costs speed: callers keep their
    Column-API construction."""
    from pyspark.sql import SparkSession
    spark = SparkSession.getActiveSession()
    if spark is None:
        return None
    try:
        sql = col._jc.node().sql()
        parsed = (spark._jsparkSession.sessionState().sqlParser()
                  .parseExpression(sql))
        if parsed.sql() != sql:
            return None
    except Exception:
        return None
    if re.search(r"\b[xyz]_\d+\b", sql):
        return None
    if _NONDET_RE.search(sql):
        # a non-deterministic input spliced N times would evaluate N
        # ways; the Column fold path evaluates it once — reject so both
        # constructions always agree (rejection only costs speed)
        return None
    return sql


def dlit(x: float) -> str:
    """Shortest-round-trip double literal with the D suffix (plain
    decimal literals parse as DECIMAL and would change arithmetic).
    Non-finite values have no literal form (`infD`/`nanD` would fail at
    parse time — ADVICE r9: a NaN centroid from an empty k-means
    cluster); they emit the CAST-from-string spelling Spark folds to
    the same constant."""
    x = float(x)
    if not math.isfinite(x):
        s = "NaN" if math.isnan(x) else \
            ("Infinity" if x > 0 else "-Infinity")
        return f"CAST('{s}' AS DOUBLE)"
    return repr(x) + "D"


def flat_dot_sql(asql: str, bsql: str, dim: int) -> str:
    """Σ a[j]·b[j] for j=1..dim, products cast to double so float
    inputs accumulate exactly like the fold's double accumulator."""
    flat = " + ".join(
        f"CAST((element_at({asql}, {j}) * element_at({bsql}, {j})) AS DOUBLE)"
        for j in range(1, dim + 1))
    fold = (f"aggregate(zip_with({asql}, {bsql}, (x, y) -> x * y), 0.0D, "
            f"(acc, x) -> acc + x)")
    return (f"CASE WHEN size({asql}) = {dim} AND size({bsql}) = {dim} "
            f"THEN {flat} ELSE {fold} END")


def flat_sqnorm_sql(asql: str, dim: int) -> str:
    """Σ a[j]² for j=1..dim (same double-accumulation contract)."""
    flat = " + ".join(
        f"CAST((element_at({asql}, {j}) * element_at({asql}, {j})) AS DOUBLE)"
        for j in range(1, dim + 1))
    fold = f"aggregate({asql}, 0.0D, (acc, x) -> acc + x * x)"
    return f"CASE WHEN size({asql}) = {dim} THEN {flat} ELSE {fold} END"


def flat_dot_lit_sql(asql: str, centroid: list[float]) -> str:
    """Σ a[j]·c[j] against a LITERAL centroid — the per-index literal is
    inlined, where `flat_dot_sql` would repeat the centroid's whole
    O(dim) ``array(...)`` text once per term (O(dim²) SQL to parse and
    analyze).  Bit-identical to flat_dot_sql over the literal array:
    ``element_at(array(c1..), j)`` constant-folds to the same double
    the inline literal denotes, products/casts/add order unchanged."""
    dim = len(centroid)
    flat = " + ".join(
        f"CAST((element_at({asql}, {j + 1}) * {dlit(c)}) AS DOUBLE)"
        for j, c in enumerate(centroid))
    lits = ", ".join(dlit(c) for c in centroid)
    fold = (f"aggregate(zip_with({asql}, array({lits}), (x, y) -> x * y), "
            f"0.0D, (acc, x) -> acc + x)")
    return f"CASE WHEN size({asql}) = {dim} THEN {flat} ELSE {fold} END"


def flat_sqdist_sql(asql: str, centroid: list[float]) -> str:
    """Σ (a[j]−c[j])² against a literal centroid (dim = len(centroid))."""
    dim = len(centroid)
    flat = " + ".join(
        f"((element_at({asql}, {j + 1}) - {dlit(c)}) * "
        f"(element_at({asql}, {j + 1}) - {dlit(c)}))"
        for j, c in enumerate(centroid))
    lits = ", ".join(dlit(c) for c in centroid)
    fold = (f"aggregate(zip_with({asql}, array({lits}), "
            f"(x, y) -> (x - y) * (x - y)), 0.0D, (acc, x) -> acc + x)")
    return f"CASE WHEN size({asql}) = {dim} THEN {flat} ELSE {fold} END"
