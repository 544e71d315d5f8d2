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
    import warnings

    # The edge table is static across iterations: pre-partition it on the
    # join key and cache (localCheckpoint would lose the partitioning —
    # LogicalRDD reports no outputPartitioning), so every iteration's
    # neighbor join reuses the exchange instead of re-shuffling the edges
    # (guide §2.4: two operations keyed the same way share one exchange).
    sym = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .unionByName(
            edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v")))
        .distinct()
        .repartition(int(edges.sparkSession.conf.get(
            "spark.sql.shuffle.partitions", "200")), "v")
        .cache()
    )
    labels = vertices.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("label"))
    labels = labels.localCheckpoint()
    changed = 0
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["v"] == labels["id"])
            .groupBy("u").agg(F.min("label").alias("nmin"))
        )
        # __chg rides in the checkpointed frame so convergence detection is
        # a shuffle-free scan of the materialized blocks, not a second join
        # of old vs new labels per iteration.
        new_labels = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["u"], "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("nmin", "label"))
                .alias("label"),
                (F.col("nmin").isNotNull()
                 & (F.col("nmin") < F.col("label"))).alias("__chg"))
            .localCheckpoint()
        )
        changed = new_labels.where(F.col("__chg")).limit(1).count()
        labels = new_labels.drop("__chg")
        if changed == 0:
            break
    sym.unpersist()
    if changed != 0:
        warnings.warn(
            f"connected_components did not converge within max_iter={max_iter}"
            " rounds (component diameter exceeds the budget) — labels may"
            " split one component into several; raise max_iter or use"
            " connected_components_two_star (O(log n) rounds)",
            RuntimeWarning, stacklevel=2)
    return labels.select("id", F.col("label").alias("cluster"))


def connected_components_two_star(vertices: DataFrame, edges: DataFrame,
                                  id_col: str = "id", src_col: str = "src",
                                  dst_col: str = "dst",
                                  max_iter: int = 20) -> DataFrame:
    """Alternating large-star / small-star connected components
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    O(log n) rounds regardless of component diameter, vs the O(diameter)
    min-label propagation above. Same output contract: (id, cluster) with
    cluster = min id of the component.

    large-star(u): attach every strictly-larger neighbor of u to
    m = min(N(u) ∪ {u}); small-star(u) over min-oriented edges: attach every
    (smaller-or-equal) neighbor and u itself to m. At the fixpoint the edge
    set is a star per component pointing at its minimum. Each half-step is
    one groupBy + one join; localCheckpoint truncates lineage per round.

    Use this instead of min-label propagation when components may be
    long/chainy (e.g. URL redirect chains, link graphs); near-dup clusters
    from LSH buckets are near-cliques where label propagation's cheaper
    rounds win.
    """
    # canonical form between rounds: larger-endpoint-first, deduped
    e = (
        edges.select(F.greatest(F.col(src_col), F.col(dst_col)).alias("u"),
                     F.least(F.col(src_col), F.col(dst_col)).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    n_e = e.count()

    def _min_neighbor(df):  # m(u) = min(N(u) ∪ {u})
        return (df.groupBy("u")
                .agg(F.least(F.first("u"), F.min("v")).alias("m")))

    for _ in range(max_iter):
        # -- large-star over the symmetrized view: (v, m(u)) for v ∈ N(u),
        # v > u. The emitted pair always has v > u ≥ m(u), so large-star
        # output is already larger-first.
        sym = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = _min_neighbor(sym)
        # no distinct here (r7): each sym row emits at most one pair, so
        # |large| ≤ 2|E| with or without it — duplicates (two neighbors of
        # v sharing one m) are absorbed by m2's min aggregate and the
        # small-star distinct below; the dedup exchange was pure overhead
        large = (
            sym.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
        )
        # -- small-star over larger-first edges: attach every (smaller)
        # neighbor and u itself to m(u)
        m2 = _min_neighbor(large)
        small = (
            large.join(m2, "u")
            .select(F.greatest("v", "m").alias("u"),
                    F.least("v", "m").alias("v"))
            .unionByName(m2.select(F.col("u"), F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        # converged when the (set-valued) canonical edge list is unchanged.
        # Both sides are distinct sets, so equality ⇔ equal cardinality +
        # one-sided containment: a count of the just-checkpointed frame
        # (shuffle-free) plus a single left_anti probe only when the counts
        # match — replacing the two exceptAll jobs (4 shuffles) per round.
        n_small = small.count()
        delta = 1
        if n_small == n_e:
            delta = small.join(e, ["u", "v"], "left_anti").limit(1).count()
        e, n_e = small, n_small
        if delta == 0:
            break

    # fixpoint stars: every non-min vertex points at its component min
    label_edges = e.groupBy("u").agg(F.min("v").alias("nmin"))
    return (
        vertices.select(F.col(id_col).alias("id"))
        .join(label_edges, F.col("id") == F.col("u"), "left")
        .select("id",
                F.least(F.col("id"), F.coalesce("nmin", "id")).alias("cluster"))
    )


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
    # cluster keeps the id column's own type — an unconditional cast("long")
    # would silently NULL every cluster for string (e.g. sha-hex) doc ids
    numeric = comps.schema["id"].dataType.typeName() in (
        "byte", "short", "integer", "long")
    cluster = (F.col("cluster").cast("long") if numeric
               else F.col("cluster"))
    return comps.select(
        F.col("id").alias(id_col),
        cluster.alias("cluster"),
        F.when(F.col("id") == F.col("cluster"), 1).otherwise(0)
        .cast("long").alias("is_representative"),
    )
