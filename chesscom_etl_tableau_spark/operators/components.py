"""Connected components over near-duplicate pair edges — the cluster
resolution step of large-scale dedup (beyond the reference surface;
pairs alone don't dedup: A~B and B~C must collapse into ONE cluster
{A,B,C} with one survivor).

Algorithm: iterative **min-label propagation**. Every node starts
labeled with its own id; each round, every node takes the min of its
own label and its neighbors' labels; converged when no label changes.
Rounds needed = graph diameter. Near-dup graphs are unions of small
near-cliques (similarity is ~transitive), so diameter is tiny and 2-4
rounds suffice even at 100 TB; for adversarial long-chain graphs the
large-star/small-star variant (Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC'14) bounds rounds at O(log² n) — this
implementation keeps the simple propagation because the dedup input
shape guarantees shallow graphs.

Scale notes:
- each round is one shuffle-join (labels ⋈ edges) + one groupBy-min;
  edges are re-used across rounds, so cache() them;
- `localCheckpoint` after every round cuts the lineage — without it
  the plan doubles per iteration and the job DAG explodes;
- convergence is detected by the monotone label-sum invariant: labels
  only ever decrease, so the per-round min-label sum strictly
  decreases until the fixpoint — one cheap agg per round instead of a
  full old-vs-new comparison join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "doc_id",
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node with its component id = min node id reachable.

    `nodes`: one column `node_col` (all nodes, including singletons).
    `edges`: undirected pairs (`src_col`, `dst_col`).
    Returns (`node_col`, `component_id`).
    """
    sym = (
        edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"))
        .union(edges.select(F.col(dst_col).alias("_s"), F.col(src_col).alias("_d")))
        .distinct()
        .cache()
    )
    labels = nodes.select(
        F.col(node_col).alias("_n"), F.col(node_col).alias("_lbl")
    ).localCheckpoint()

    prev_sum = None
    for _ in range(max_iter):
        # neighbor labels flow along edges; keep own label via union.
        msgs = labels.join(sym, labels["_n"] == sym["_s"]).select(
            F.col("_d").alias("_n"), "_lbl"
        )
        labels = (
            labels.union(msgs).groupBy("_n").agg(F.min("_lbl").alias("_lbl"))
        ).localCheckpoint()
        cur_sum = labels.agg(F.sum("_lbl")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    sym.unpersist()
    return labels.select(
        F.col("_n").alias(node_col), F.col("_lbl").alias("component_id")
    )


def component_survivors(components: DataFrame, node_col: str = "doc_id") -> DataFrame:
    """Collapse a component assignment to one row per cluster:
    (component_id, survivor = min id, n_members)."""
    return components.groupBy("component_id").agg(
        F.min(node_col).alias("survivor_id"),
        F.count(F.lit(1)).alias("n_members"),
    )
