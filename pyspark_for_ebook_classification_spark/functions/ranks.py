"""Scalable global ranking — the two-pass alternative to the
single-task `Window.orderBy(...)` trap.

`row_number() OVER (ORDER BY ...)` with no PARTITION BY moves EVERY row
to one task (Spark logs "No Partition Defined for Window operation");
fine in an oracle, fatal at 100 TB. The classic distributed fix (the
same dance as RDD zipWithIndex, done relationally):

  1. range-repartition by the order key — each partition holds a
     contiguous key range, sorted partitions concatenate to the total
     order;
  2. count rows per partition (partition-count-sized table);
  3. prefix-sum those counts into per-partition offsets — the only
     unpartitioned window left runs over ~shuffle.partitions rows,
     bounded by cluster layout, not by data;
  4. rank within each partition (partitioned window — scalable) and
     add the broadcast offset.

Determinism: the range partitioner SAMPLES boundaries, so partition
membership varies run to run — but as long as the order key ends in a
unique tiebreak the total order is unique, and rank-within + offset is
the same number wherever the boundary lands. The result is exact and
reproducible even though the physical split is not.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_global_rank(
    df: DataFrame, order_cols: list[Column | str], out: str = "global_pos"
) -> DataFrame:
    """Add 1-based ``out`` = rank of each row under ``order_cols``.

    ``order_cols`` must define a TOTAL order (end with a unique key) or
    ranks would be sample-dependent. All original columns are kept.
    """
    # localCheckpoint pins ONE physical materialization of the
    # nondeterministic repartitionByRange + spark_partition_id() subplan.
    # Both consumers below (the counts pipeline and the final join) read
    # the same checkpointed partitions, so correctness no longer depends
    # on Spark's exchange-reuse collapsing the two branches — if the
    # sampled range boundaries differed between branches, offsets and
    # in-partition ranks would disagree and every consumer (RFM, Pareto
    # deciles, curriculum order, deterministic shuffle, histogram
    # quantiles) would silently corrupt. Same pattern as the CC fixpoint
    # in operators/dedup.py (labels localCheckpoint).
    ranged = (
        df.repartitionByRange(*order_cols)
        .withColumn("_gr_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = ranged.groupBy("_gr_pid").agg(F.count(F.lit(1)).alias("_gr_n"))
    # prefix offsets via a triangular self-join: the counts table has
    # ~shuffle.partitions rows — bounded by cluster layout, not data —
    # so the quadratic pairing is over a constant-size input and avoids
    # any unpartitioned window in the plan entirely
    prior = counts.select(
        F.col("_gr_pid").alias("_gr_pid2"), F.col("_gr_n").alias("_gr_n2")
    )
    offsets = (
        counts.join(prior, F.col("_gr_pid2") < F.col("_gr_pid"), "left")
        .groupBy("_gr_pid")
        .agg(F.coalesce(F.sum("_gr_n2"), F.lit(0)).alias("_gr_off"))
    )
    w_in = Window.partitionBy("_gr_pid").orderBy(*order_cols)
    return (
        ranged.join(F.broadcast(offsets), "_gr_pid")
        .withColumn(out, (F.row_number().over(w_in) + F.col("_gr_off")).cast("bigint"))
        .drop("_gr_pid", "_gr_off")
    )


def with_global_cumsum(
    df: DataFrame,
    order_cols: list[Column | str],
    value_col: str,
    out: str = "global_cumsum",
) -> DataFrame:
    """Add ``out`` = inclusive prefix sum of ``value_col`` under the
    TOTAL order ``order_cols`` (must end in a unique key) — the same
    two-pass range-partition dance as :func:`with_global_rank`, with
    per-partition SUMs in place of counts. The only unpartitioned
    structure is the ~shuffle.partitions-row offsets table; every
    data-sized stage is partitioned. ``value_col`` must be integral
    (summed as BIGINT) so the prefix sum is order-exact.
    """
    ranged = (
        df.repartitionByRange(*order_cols)
        .withColumn("_gc_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin ONE boundary sample (see above)
    )
    totals = ranged.groupBy("_gc_pid").agg(
        F.sum(F.col(value_col).cast("bigint")).alias("_gc_t")
    )
    prior = totals.select(
        F.col("_gc_pid").alias("_gc_pid2"), F.col("_gc_t").alias("_gc_t2")
    )
    offsets = (
        totals.join(prior, F.col("_gc_pid2") < F.col("_gc_pid"), "left")
        .groupBy("_gc_pid")
        .agg(F.coalesce(F.sum("_gc_t2"), F.lit(0)).cast("bigint").alias("_gc_off"))
    )
    w_in = (
        Window.partitionBy("_gc_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranged.join(F.broadcast(offsets), "_gc_pid")
        .withColumn(
            out,
            (F.sum(F.col(value_col).cast("bigint")).over(w_in) + F.col("_gc_off")).cast(
                "bigint"
            ),
        )
        .drop("_gc_pid", "_gc_off")
    )


def ntile_from_rank(rank: str, n_rows: str, n_tiles: int) -> Column:
    """Exact ntile(n) from a precomputed global rank + total row count.

    Reproduces SQL ntile's split (the first ``n_rows % n`` tiles get one
    extra row) with integer ``div``/``%`` only — no double division, so
    it stays exact past 2^53 rows — letting the tile derive from a
    scalable global rank instead of a second single-task window.
    ``rank`` / ``n_rows`` are SQL expression strings (column names).
    """
    q = f"(({n_rows}) div {n_tiles})"
    r = f"(({n_rows}) % {n_tiles})"
    big = f"(({q} + 1) * {r})"
    return F.expr(
        f"CAST(CASE WHEN {rank} <= {big} THEN ({rank} - 1) div ({q} + 1) "
        f"ELSE {r} + ({rank} - {big} - 1) div {q} END + 1 AS BIGINT)"
    )
