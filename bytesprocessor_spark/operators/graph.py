"""Connected components — the missing step between near-dup PAIRS and
near-dup CLUSTERS.

Pairwise similarity (MinHash-LSH, PPJoin, embedding cosine) yields
edges; deduplication must then keep ONE document per *transitive*
cluster (A~B, B~C => drop two of {A,B,C} even if A!~C directly).
Treating pairs as independent under-deduplicates: the canonical-per-
pair rule keeps both B-cluster survivors when the cluster is a chain.

Algorithm: iterative minimum-label propagation (the HashToMin family,
Rastogi et al., ICDE'13): every node starts labeled with itself; each
round, a node adopts the minimum label in its closed neighborhood.
Converges in O(diameter) rounds — near-dup graphs are unions of small
cliques/chains, so a handful of rounds in practice.  Each round is one
shuffle (join + min-aggregate); lineage is cut with localCheckpoint so
the plan doesn't grow with iterations (the classic iterative-Spark
trap).  At 100 TB scale the same loop runs with the edge list
partitioned by node id; rounds are edge-linear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``, where
    ``component`` is the minimum node id reachable from it.  Raises if
    not converged within ``max_iter`` rounds (diameter bound)."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = (
        sym.select(F.col("a").alias("node")).distinct().withColumn("label", F.col("node"))
    ).localCheckpoint()
    sym = sym.localCheckpoint()

    for _ in range(max_iter):
        # neighbor labels + own label -> per-node minimum
        msgs = sym.join(labels, sym.a == labels.node).select(
            F.col("b").alias("node"), "label"
        )
        new_labels = (
            msgs.unionByName(labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        ).localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select("node", F.col("label").alias("component"))
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def cluster_keep(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "id_a",
    pair_b: str = "id_b",
) -> DataFrame:
    """Near-dup dedup with transitive closure: every doc in a pairwise-
    similarity cluster collapses to the cluster's minimum id; docs in
    no pair survive as their own cluster.  Returns (doc_id, component,
    is_kept) for every input doc."""
    comp = connected_components(pairs, src=pair_a, dst=pair_b)
    out = docs.select(F.col(id_col).alias("doc_id")).join(
        comp, F.col("doc_id") == comp.node, "left"
    )
    return out.select(
        "doc_id",
        F.coalesce("component", "doc_id").alias("component"),
    ).withColumn("is_kept", F.col("doc_id") == F.col("component"))
