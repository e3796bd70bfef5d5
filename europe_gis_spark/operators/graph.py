"""Iterative graph operators over edge DataFrames (link-graph layer of
a crawl pipeline: PageRank-style authority scoring feeds the same
corpus-selection stage as the quality scores in textops).

Same distributed shape as ``dedup.connected_components``: each
iteration is one join + one aggregation, lineage truncated per round
with ``localCheckpoint`` so round N never replays rounds 1..N−1. At
corpus scale both sides hash-partition on the node key; no driver-side
state beyond one scalar (the dangling-mass sum) per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """PageRank with a FIXED iteration count (deterministic — oracle-
    checkable against the same unrolled recurrence), uniform dangling-
    mass redistribution, self-loops and duplicate edges removed.

    Per iteration: contrib(dst) = Σ_{src→dst} pr(src)/outdeg(src) is a
    src-keyed broadcast-free hash join + dst-keyed aggregation; the
    dangling mass is ONE scalar aggregate joined back via a 1-row
    crossJoin (broadcast by construction). Returns (node, pr) with pr
    summing to 1 over the node universe src ∪ dst.
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        # empty graph (no edges, or self-loops only): empty result with
        # the right schema, not a ZeroDivisionError
        return nodes.select("node", F.lit(0.0).alias("pr"))
    deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("pr"))
    base = (1.0 - damping) / n_nodes
    for _ in range(iters):
        with_deg = ranks.join(deg, ranks.node == deg.src, "left")
        contrib = (
            e.join(
                with_deg.filter(F.col("outdeg").isNotNull()).select(
                    "node", (F.col("pr") / F.col("outdeg")).alias("share")
                ),
                e.src == F.col("node"),
            )
            .groupBy("dst")
            .agg(F.sum("share").alias("contrib"))
        )
        dangling = with_deg.filter(F.col("outdeg").isNull()).agg(
            F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dang")
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .crossJoin(dangling)
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("dang") / F.lit(float(n_nodes))
                    )
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
