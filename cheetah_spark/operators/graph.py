"""Distributed connected components — the graph primitive Spark's
DataFrame API lacks (GraphX is RDD/Scala-only), built as iterative
min-label propagation over an edge DataFrame.

Used by q_llm_dup_clusters to turn near-dup PAIRS into duplicate
GROUPS (pairs alone over-delete: A~B, B~C must collapse to one cluster
{A,B,C}).

Iterative-Spark essentials baked in (each the difference between
seconds and minutes — measured on the sf0.01 fixture where the naive
persist-only variant took >300 s of pure driver-side planning):

1. ``localCheckpoint`` every round. Caching alone truncates EXECUTION
   but not the logical plan, so Catalyst re-analyzes an exponentially
   growing lineage. On a real cluster, swap for a durable
   ``checkpoint()`` (HDFS/S3 checkpoint dir) for fault tolerance —
   same call shape.
2. Iterate only over nodes that APPEAR in the edge set. Singletons can
   never change labels, and at 100 TB the near-dup graph is orders of
   magnitude smaller than the corpus.
3. Convergence via the monotone label sum (labels only ever decrease):
   one scalar aggregate per round instead of a join-and-count of
   changed rows.
4. The loop runs on few shuffle partitions — per-round latency is
   stage scheduling, not data volume; size the knob to |edges|, not
   |corpus| (on a cluster this is the label-graph parallelism).

Rounds needed = graph diameter (near-dup groups are cliques-ish, so
2-4 in practice; the sf0.1 fixture's planted chains take 9). A
production variant at adversarial diameters swaps in alternating
large-star/small-star rounds (Kiveris et al., "Connected Components in
MapReduce and Beyond") — same per-round plan shape, O(log n) rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["connected_components"]


def connected_components(
    spark: SparkSession,
    edges: DataFrame,
    src: str = "s",
    dst: str = "t",
    max_iters: int = 50,
    loop_shuffle_partitions: int = 8,
) -> DataFrame:
    """Min-label-propagation connected components.

    ``edges`` must be undirected-as-symmetric (both (a,b) and (b,a)
    present) with integer node id columns ``src``/``dst``. Returns
    ``(node_id, comp_id)`` for every node that appears in ``edges``,
    where ``comp_id`` is the component's minimum node id (stable,
    engine-independent). Nodes with no edges are singletons by
    definition and are NOT returned — callers wanting them can union
    the complement.
    """
    edges = edges.select(F.col(src).alias("s"), F.col(dst).alias("t")).localCheckpoint()
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(loop_shuffle_partitions))
    try:
        labels = (
            edges.select(F.col("s").alias("node_id"))
            .distinct()
            .select("node_id", F.col("node_id").alias("comp_id"))
            .localCheckpoint()
        )
        prev_sum = labels.agg(F.sum("comp_id")).collect()[0][0]
        for _ in range(max_iters):
            neigh_min = (
                edges.join(labels, edges["s"] == labels["node_id"])
                .groupBy(F.col("t").alias("node_id"))
                .agg(F.min("comp_id").alias("neigh_comp"))
            )
            labels = (
                labels.join(neigh_min, "node_id", "left")
                .select(
                    "node_id",
                    F.least(
                        F.col("comp_id"), F.coalesce(F.col("neigh_comp"), F.col("comp_id"))
                    ).alias("comp_id"),
                )
                .localCheckpoint()
            )
            cur_sum = labels.agg(F.sum("comp_id")).collect()[0][0]
            if cur_sum == prev_sum:
                return labels
            prev_sum = cur_sum
        raise RuntimeError(f"connected components did not converge in {max_iters} rounds")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
