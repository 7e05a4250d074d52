"""Link-graph analytics: PageRank over (src, dst) edges.

The iterative twin of dedup.connected_components for RANKED graph signals —
host/page reputation for crawl prioritization and training-mix weighting.

Determinism contract (what makes the driver oracle possible): per-iteration
contributions are rounded to 12 decimals and summed as DECIMAL(38,12) —
exact and associative, so partial-aggregation order can't wiggle bits — and
only the final damping arithmetic runs in doubles. Every iteration is
bit-reproducible across partitionings and engines; the oracle unrolls the
same iterations in SQL (the kmeans_lloyd pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85


def out_degrees(edges: DataFrame) -> DataFrame:
    return edges.groupBy("src").agg(F.count("*").cast("long").alias("out_deg"))


def pagerank(edges: DataFrame, n_iter: int = 2, damping: float = DAMPING,
             checkpoint_every: int = 8) -> DataFrame:
    """(src, dst) edges -> (node, rank). Uniform 1/N start; dangling nodes
    (no out-edges) leak their mass — the simple variant; the oracle mirrors
    it exactly.

    Scale shape per iteration: one join of ranks to the edge list on src
    (rank frame is small — one row per node — and broadcastable when it
    fits; Spark's AQE decides), one shuffle keyed by dst for the
    contribution sum. Edge list is persisted once up front; lineage on the
    rank frame is truncated with localCheckpoint every `checkpoint_every`
    iterations, same discipline as connected_components."""
    edges = edges.select("src", "dst").persist()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # also materializes nodes + edges exactly once
    base = (1.0 - damping) / n
    deg = out_degrees(edges)
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for it in range(n_iter):
        contribs = (
            edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                # exact at scale 12 -> the decimal cast below never rounds
                F.round(F.col("rank") / F.col("out_deg"), 12).alias("c"),
            )
        )
        summed = contribs.groupBy("node").agg(
            F.sum(F.col("c").cast("decimal(26,12)")).cast("double").alias("s")
        )
        ranks = (
            nodes.join(summed, "node", "left")
            .select(
                "node",
                (F.lit(base) + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0)))
                .alias("rank"),
            )
        )
        if (it + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    # hand back a lineage-free frame (same contract as connected_components):
    # the loop builds a lazy plan that references the edge list ~3x per
    # iteration, so materialize ONCE while the caches are still alive, then
    # release them — otherwise the caller's collect would recompute the
    # whole chain against unpersisted inputs
    ranks = ranks.localCheckpoint(eager=True)
    edges.unpersist()
    nodes.unpersist()
    return ranks


def pagerank_dangling(edges: DataFrame, n_iter: int = 2,
                      damping: float = DAMPING) -> DataFrame:
    """(src, dst) edges -> (node, rank), redistributing dangling-node mass.

    The default a real web graph wants: pages with no out-links (a large
    fraction of any crawl) hold rank that `pagerank` simply leaks, so ranks
    stop summing to 1 and everything is under-weighted. Here each iteration
    adds ONE extra 1-row aggregation — the total rank sitting on nodes with
    no out-edges, DECIMAL-summed over round-12 ranks for cross-partition
    determinism — broadcast back (1-row crossJoin) and shared uniformly:

        rank'(v) = (1-d)/N + d * (contribs(v) + dangling_mass / N)

    Same scale shape as `pagerank` (one src join + one dst shuffle per
    iteration) plus the 1-row agg. Lineage discipline is STRICTER than the
    simple variant: the previous ranks frame feeds TWO consumers per
    iteration (dangling sum + contributions), so an unmaterialized plan
    doubles per iteration instead of growing linearly — each iteration
    therefore starts from an eagerly localCheckpoint'ed ranks frame (tiny:
    one row per node), which also avoids the concurrent cache-fill race a
    lazy persist would hit with two branches in one action."""
    edges = edges.select("src", "dst").persist()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # also materializes nodes + edges exactly once
    base = (1.0 - damping) / n
    deg = out_degrees(edges)
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for it in range(n_iter):
        # materialize BEFORE the two consumers below read it (see docstring)
        ranks = ranks.localCheckpoint(eager=True)
        dang = (
            ranks.join(deg, ranks["node"] == deg["src"], "left_anti")
            .agg(
                F.coalesce(
                    F.sum(F.round(F.col("rank"), 12).cast("decimal(26,12)")),
                    F.lit(0).cast("decimal(26,12)"),
                ).cast("double").alias("dang")
            )
        )
        contribs = (
            edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.round(F.col("rank") / F.col("out_deg"), 12).alias("c"),
            )
        )
        summed = contribs.groupBy("node").agg(
            F.sum(F.col("c").cast("decimal(26,12)")).cast("double").alias("s")
        )
        ranks = (
            nodes.join(summed, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("s"), F.lit(0.0))
                       + F.col("dang") / F.lit(float(n)))
                ).alias("rank"),
            )
        )
    ranks = ranks.localCheckpoint(eager=True)
    edges.unpersist()
    nodes.unpersist()
    return ranks
