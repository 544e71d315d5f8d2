"""Dedup clustering: connected components over near-duplicate pairs.

Near-dup detection (MinHash-LSH / SimHash / Jaccard) yields PAIRS; an actual
dedup pipeline needs CLUSTERS — every document labeled with a canonical
representative so one survivor per cluster is kept. Pair → cluster is
transitive closure, i.e. connected components.

Implementation: min-label propagation. Every vertex starts labeled with its
own id; each iteration every vertex takes the min of its own and its
neighbors' labels; converged when no label changes. The loop is a driver-side
``for`` over pure DataFrame joins — each iteration is one shuffle join + one
aggregation, and ``localCheckpoint`` truncates the lineage so plans stay
flat. Iteration count is bounded by the component diameter; near-dup
components are dense (near-cliques out of LSH buckets), so convergence is
fast in practice and ``max_iter`` is a backstop. (The O(log n) large-star /
small-star variant drops in behind the same signature if diameters ever grow
— components here are duplicate clusters, not a web graph.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(vertices: DataFrame, edges: DataFrame,
                         id_col: str = "id", src_col: str = "src",
                         dst_col: str = "dst",
                         max_iter: int = 25) -> DataFrame:
    """Label every vertex with the MIN vertex id reachable from it.

    ``vertices``: one column ``id_col`` (must include isolated vertices —
    they come out as singleton clusters). ``edges``: undirected pairs.
    Returns (id, cluster) with cluster = min id of the component.
    """
    sym = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .unionByName(
            edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = vertices.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("label"))
    labels = labels.localCheckpoint()
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["v"] == labels["id"])
            .groupBy("u").agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["u"], "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("nmin", "label"))
                .alias("label"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1).count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("id", F.col("label").alias("cluster"))


def dedup_clusters(docs: DataFrame, pairs: DataFrame,
                   id_col: str = "doc_id",
                   pair_a: str = "doc_a", pair_b: str = "doc_b") -> DataFrame:
    """(doc_id, cluster, is_representative): cluster = min doc_id of the
    near-dup component (singletons cluster with themselves); the
    representative (kept document) is the cluster min — the deterministic
    keep-first policy."""
    comps = connected_components(
        docs.select(F.col(id_col).alias("id")),
        pairs.select(F.col(pair_a).alias("src"), F.col(pair_b).alias("dst")),
    )
    return comps.select(
        F.col("id").alias(id_col),
        F.col("cluster").cast("long").alias("cluster"),
        F.when(F.col("id") == F.col("cluster"), 1).otherwise(0)
        .cast("long").alias("is_representative"),
    )
