"""Real IVF (inverted-file) approximate nearest neighbour index.

The round-1 ``ann_ivf_topk`` query probed pre-existing data labels standing
in for cells; this module is the genuine article:

1. **Train**: Lloyd's k-means over a bounded, deterministic sample collected
   to the driver (k×dim floats — tiny). Init = first k sampled vectors, a
   fixed iteration count, so the index is a pure function of the data.
2. **Assign**: every vector gets its nearest centroid via one Arrow-batched
   pandas UDF (a single ``(batch × dim) @ (dim × k)`` matmul per batch — the
   one place Python earns its keep; per-row JVM expressions would evaluate
   k×dim expression nodes per row).
3. **Index**: vectors written ``partitionBy("cell")`` — the inverted lists.
   At deployment scale this is the Iceberg table layout; partition pruning
   IS the inverted-file lookup.
4. **Probe**: the query vector ranks centroids on the driver (k distances),
   reads ONLY the ``nprobe`` nearest cells (partition filter → pruned scan,
   verifiable via ``inputFiles()``), computes exact cosine within probed
   cells JVM-side, and takes top-k via ``orderBy().limit(k)``
   (TakeOrderedAndProject — no global window).

Approximation error comes only from probing a subset of cells, as in
FAISS-style IVF-Flat; recall vs brute force is asserted ≥ 0.9 in pytest.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F


def _lloyds(sample: np.ndarray, k: int, iters: int) -> np.ndarray:
    """Deterministic k-means: init = first k sample rows, fixed iterations,
    L2 metric on unit-normalized vectors (equivalent to spherical k-means)."""
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    x = sample / norms
    centroids = x[:k].copy()
    for _ in range(iters):
        # assign: argmax cosine == argmin L2 on the unit sphere
        sims = x @ centroids.T
        assign = sims.argmax(axis=1)
        for c in range(k):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    centroids[c] = m / n
    return centroids


def train_centroids(embeddings: DataFrame, k: int = 16, iters: int = 8,
                    sample_size: int = 4096,
                    vec_col: str = "embedding") -> np.ndarray:
    """Collect a bounded deterministic sample (first ``sample_size`` rows in
    vec_id order — TakeOrderedAndProject, no full sort) and run Lloyd's on
    the driver. Returns (k × dim) float64 centroids."""
    rows = (embeddings.select("vec_id", vec_col)
            .orderBy("vec_id").limit(sample_size).collect())
    sample = np.array([r[vec_col] for r in rows], dtype=np.float64)
    k = min(k, len(sample))
    return _lloyds(sample, k, iters)


def assign_cells(embeddings: DataFrame, centroids: np.ndarray,
                 vec_col: str = "embedding") -> DataFrame:
    """Attach the nearest-centroid cell id — one vectorized matmul per Arrow
    batch against the broadcast centroid matrix."""
    cent = centroids  # captured; shipped once per executor in the closure

    @F.pandas_udf("int")
    def nearest_cell(v: pd.Series) -> pd.Series:
        x = np.array(v.tolist(), dtype=np.float64)
        norms = np.linalg.norm(x, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (x / norms) @ cent.T
        return pd.Series(sims.argmax(axis=1).astype(np.int32))

    return embeddings.withColumn("cell", nearest_cell(F.col(vec_col)))


def build_ivf_index(embeddings: DataFrame, index_path: str,
                    centroids: np.ndarray,
                    vec_col: str = "embedding") -> None:
    """Write the inverted lists: one parquet partition per cell. At cluster
    scale this is an Iceberg table partitioned by cell; the probe's
    partition filter prunes unread cells at the file-listing level."""
    (assign_cells(embeddings, centroids, vec_col)
     .write.mode("overwrite").partitionBy("cell").parquet(index_path))


def probe_cells(centroids: np.ndarray, query_vec: np.ndarray,
                nprobe: int) -> list[int]:
    q = np.asarray(query_vec, dtype=np.float64)
    n = np.linalg.norm(q)
    if n > 0:
        q = q / n
    sims = centroids @ q
    order = np.argsort(-sims, kind="stable")
    return [int(c) for c in order[:nprobe]]


def ivf_topk(spark: SparkSession, index_path: str, centroids: np.ndarray,
             query_vec, k: int = 10, nprobe: int = 4,
             vec_col: str = "embedding") -> DataFrame:
    """Top-k by exact cosine within the ``nprobe`` nearest cells."""
    probed = probe_cells(centroids, np.asarray(query_vec, dtype=np.float64),
                         nprobe)
    idx = spark.read.parquet(index_path).where(F.col("cell").isin(probed))
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(v, qv, lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    nv = F.sqrt(F.aggregate(F.transform(v, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    # Query norm computed JVM-side with the same left-to-right accumulation
    # as the row norms (numpy's pairwise summation can differ in the last
    # ulp, which matters for the exact full-probe oracle's value hash).
    nq = F.sqrt(F.aggregate(F.transform(qv, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    cos = dot / (nv * nq)
    # Sort by the 6-dp ROUNDED cosine (the value the oracle hash compares):
    # ordering by the raw float could select/order near-ties differently
    # across engines while the compared values still round equal.
    return (
        idx.withColumn("cosine", F.round(cos, 6))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", "cosine", F.col("cell").cast("long").alias("cell"))
    )
