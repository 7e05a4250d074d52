"""Distributed prefix-sum: global cumulative totals / ranks WITHOUT a
single-reducer global window.

The naive formulation (`sum(x) over (order by k)` with no partitioning)
pulls the entire corpus through ONE task. This helper is the repo's shared
scaffold for the scalable form (first built for pack_sequences, reused by
perplexity_buckets' global rank):

1. `repartitionByRange(order)` makes partition boundaries respect the
   total order, so partition ids ARE the coarse order;
2. a PER-PARTITION window (partitionBy the physical partition id) computes
   local prefixes in parallel — each task sees ~rows/P rows;
3. per-partition totals (#partitions rows, driver-scale) get their own
   prefix via a tiny unpartitioned window — safe there ONLY because its
   cardinality equals the partition count;
4. a broadcast join adds the two.

The staged frame is localCheckpoint'ed with eager=True: spark_partition_id
over a range exchange is only deterministic WITHIN one materialization
(RangePartitioner re-samples per plan execution) and the frame feeds TWO
consumers (the totals aggregate and the final join). A LAZY checkpoint
re-opens the race on a real cluster — concurrent jobs (e.g. broadcast
subqueries) can each materialize the subtree independently and read
DIFFERENT pid/row assignments, corrupting every global prefix; eager
materialization closes it (the mid-plan persist lesson, BENCH.md).
The checkpoint holds only the caller's columns plus two longs per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def attach_global_prefix(df: DataFrame, order_cols: list,
                         value_col: str | None = None,
                         partitions: int | None = None,
                         out_col: str = "before",
                         total_col: str | None = None) -> DataFrame:
    """Return `df` with `out_col` = the sum of `value_col` over every row
    STRICTLY PRECEDING it in the total order given by `order_cols`
    (Column expressions; `.desc()` allowed — the order must be total, so
    include a unique tie-break column). `value_col=None` counts rows, so
    `out_col + 1` is the global row_number. `total_col`, when set, also
    attaches the GRAND total of `value_col` to every row — derived from
    the scaffold's own #partitions-row totals frame, so callers needing
    n (e.g. the perplexity tercile cuts) don't pay a separate
    corpus-length aggregate. Output is provably independent of the
    physical partition count (pinned by the callers' partition-sweep
    tests).

    NB for plan reviews: the eager checkpoint truncates lineage, so a
    captured plan shows `Scan ExistingRDD` at the boundary — the
    corpus-sized subtree below it must be reviewed at the CALLER (its
    own plan up to the checkpoint), the accepted cost of closing the
    pid rematerialization race."""
    reserved = {"_pid", "_local_before", "_pid_before", out_col}
    if total_col:
        reserved.add(total_col)
    clash = reserved.intersection(df.columns)
    if clash:
        raise ValueError(
            f"attach_global_prefix would clobber column(s) {sorted(clash)}; "
            "rename them or pick a different out_col/total_col")
    ranged = df.repartitionByRange(
        *([partitions] if partitions else []), *order_cols
    ).withColumn("_pid", F.spark_partition_id())
    val: Column = F.lit(1).cast("long") if value_col is None \
        else F.col(value_col)
    w_local = (
        Window.partitionBy("_pid").orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    staged = ranged.withColumn(
        "_local_before", F.coalesce(F.sum(val).over(w_local), F.lit(0))
    ).localCheckpoint(eager=True)

    totals = staged.groupBy("_pid").agg(F.sum(val).alias("_tot"))
    w_pid = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    # unpartitioned window is safe HERE only: cardinality == #partitions
    offsets = totals.select(
        "_pid",
        F.coalesce(F.sum("_tot").over(w_pid), F.lit(0)).alias("_pid_before"),
    )
    out = (
        staged.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.col("_local_before") + F.col("_pid_before"))
        .drop("_pid", "_local_before", "_pid_before")
    )
    if total_col:
        grand = totals.agg(
            F.coalesce(F.sum("_tot"), F.lit(0)).alias(total_col))
        out = out.crossJoin(F.broadcast(grand))
    return out
