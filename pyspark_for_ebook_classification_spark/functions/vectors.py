"""Vector math over ``array<float>`` embedding columns (SURVEY.md §2.9 L3).

Cross-engine determinism strategy (same rationale as numeric.py):
  * float elements are cast to DOUBLE first (exact) — DuckDB's direct
    float→decimal cast rounds in float arithmetic and drifts;
  * each pairwise product is computed in DOUBLE (IEEE-identical given
    identical operands) then rounded to DECIMAL(38,12);
  * the sum of decimals is exact and order-independent;
  * the final cast back to DOUBLE is correctly rounded in both engines.

So dot products, norms, and cosines are bit-identical between Spark and
DuckDB, which lets similarity rankings (ties broken by id) hash-match.

All expressions are built-in JVM-side catalyst expressions (zip_with +
aggregate fold) — no Python UDF in the hot path. At 100 TB, a dot product
per row is a codegen'd loop over a 64-float array: CPU-bound, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F  # noqa: F401  (re-exported convenience)

ACC_T = "DECIMAL(38,12)"


def spark_dot(a: str, b: str) -> Column:
    """Deterministic dot(a, b) as a Spark column expression."""
    from pyspark.sql.functions import expr

    return expr(
        f"CAST(aggregate("
        f"  zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        f"  CAST(0 AS {ACC_T}),"
        f"  (acc, v) -> CAST(acc + CAST(v AS {ACC_T}) AS {ACC_T})"
        f") AS DOUBLE)"
    )


def sql_dot(a: str, b: str, dim: int = 64) -> str:
    """The DuckDB rendering of :func:`spark_dot` (1-based list indexing)."""
    return (
        f"CAST(list_sum(list_transform(range(1, {dim + 1}), "
        f"i -> CAST(CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) AS {ACC_T})"
        f")) AS DOUBLE)"
    )


def spark_cosine(a: str, b: str) -> Column:
    return spark_dot(a, b) / (F.sqrt(spark_dot(a, a)) * F.sqrt(spark_dot(b, b)))


def sql_cosine(a: str, b: str, dim: int = 64) -> str:
    return (
        f"{sql_dot(a, b, dim)} / (sqrt({sql_dot(a, a, dim)}) * sqrt({sql_dot(b, b, dim)}))"
    )


# ---------------------------------------------------------------- LSH planes
#
# Deterministic random-hyperplane LSH: plane weights come from a pure
# integer formula (an LCG step), so BOTH engines can generate them inline —
# no seed-dependent library randomness, no literal blobs.
#     w(p, j) = ((1103515245 * (p*DIM + j) + 12345) % 2001 - 1000) / 1000.0
# Integer arithmetic is exact; /1000.0 is a correctly-rounded double in both.

N_PLANES = 8
DIM = 64


def spark_lsh_bucket(col: str, n_planes: int = N_PLANES, dim: int = DIM) -> Column:
    """8-char '0'/'1' bucket signature of an embedding column."""
    from pyspark.sql.functions import concat, expr

    # CAST(... AS BIGINT) on the multiplier: the product exceeds int32 and
    # Spark's ANSI mode (4.x default) raises on overflow instead of wrapping.
    bits = [
        expr(
            f"CASE WHEN aggregate(sequence(1, {dim}), CAST(0 AS {ACC_T}),"
            f" (acc, i) -> CAST(acc + CAST("
            f"   ((CAST(1103515245 AS BIGINT) * ({p} * {dim} + i - 1) + 12345) % 2001 - 1000) / 1000.0"
            f"   * CAST(element_at({col}, i) AS DOUBLE) AS {ACC_T}) AS {ACC_T})"
            f") >= 0 THEN '1' ELSE '0' END"
        )
        for p in range(n_planes)
    ]
    return concat(*bits)


def sql_lsh_bucket(col: str, n_planes: int = N_PLANES, dim: int = DIM) -> str:
    bits = ", ".join(
        f"CASE WHEN list_sum(list_transform(range(1, {dim + 1}),"
        f" i -> CAST("
        f"   ((CAST(1103515245 AS BIGINT) * ({p} * {dim} + i - 1) + 12345) % 2001 - 1000) / 1000.0"
        f"   * CAST({col}[i] AS DOUBLE) AS {ACC_T})"
        f")) >= 0 THEN '1' ELSE '0' END"
        for p in range(n_planes)
    )
    return f"concat({bits})"
