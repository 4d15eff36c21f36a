"""PCA over the embedding column: covariance, top principal component,
projection — the whitening / dimensionality-reduction stage of an
embedding-dedup or ANN pipeline, built so the only O(n) pass is a single
Arrow-batched Gram accumulation.

Scale design (100 TB of vectors, d = 64..1024):
- ``pca_cov``: one ``mapInPandas`` pass; each Arrow batch folds into a
  LOCAL float64 Gram (d^2 accumulators in numpy, one BLAS ``X.T @ X``
  per batch) and emits d(d+1)/2 + d + 1 partial rows — shuffle volume is
  O(batches x d^2), never the O(n x d^2) an explode-and-self-join would
  ship. The final combine is one tiny groupBy.
- ``pca_power``: power iteration for the top eigenvector runs on the
  AGGREGATED covariance table (d^2 rows) — per round one join + one sum
  keyed on the dimension index plus a broadcast L2 normalizer. Fixed
  rounds, no driver-side linear algebra, exactly SQL-replicable.
- ``pca_project``: per-vector dot product against the (tiny, broadcast)
  component table via posexplode + join — stays in whole-stage codegen.

Everything is cast to double BEFORE any product: the parquet column is
float32 and f32 multiplies would accumulate engine-dependent error.

Reference anchor: the reference's numeric summaries are dense-matrix
stats over small graphs (reference complexity.py); this is the
distributed analogue for model-feature matrices.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

__all__ = ["pca_cov", "pca_power", "pca_project"]


def pca_cov(
    embs: DataFrame,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (i, j, cov) population covariance for the upper triangle
    0 <= i <= j < dim: cov = E[x_i x_j] - mu_i mu_j."""

    def gram_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        iu = np.triu_indices(dim)
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            g = x.T @ x
            sx = x.sum(axis=0)
            n = np.float64(len(x))
            # rows: (i, j, s) for the Gram triangle; (i, -1, sum_i) for
            # the mean accumulators; (-1, -1, count)
            yield pd.DataFrame(
                {
                    "i": np.concatenate(
                        [iu[0], np.arange(dim), [-1]]
                    ).astype(np.int32),
                    "j": np.concatenate(
                        [iu[1], np.full(dim, -1), [-1]]
                    ).astype(np.int32),
                    "s": np.concatenate([g[iu], sx, [n]]),
                }
            )

    from .lineage import truncate_plan

    parts = embs.select(vec_col).mapInPandas(
        gram_batches, schema="i int, j int, s double"
    )
    # materialize the combined accumulators ONCE: three branches (n, mu,
    # gram) read `tot`, and without truncation each would re-run the full
    # O(n) mapInPandas Gram pass
    tot = truncate_plan(parts.groupBy("i", "j").agg(F.sum("s").alias("s")))
    n1 = tot.where((F.col("i") == -1) & (F.col("j") == -1)).select(
        F.col("s").alias("_n")
    )
    mu = tot.where((F.col("i") >= 0) & (F.col("j") == -1)).select(
        "i", F.col("s").alias("_sx")
    )
    gram = tot.where(F.col("j") >= 0)
    return (
        gram.crossJoin(F.broadcast(n1))
        .join(F.broadcast(mu.select(F.col("i"), F.col("_sx").alias("_sxi"))), "i")
        .join(
            F.broadcast(
                mu.select(F.col("i").alias("j"), F.col("_sx").alias("_sxj"))
            ),
            "j",
        )
        .select(
            "i",
            "j",
            (
                F.col("s") / F.col("_n")
                - (F.col("_sxi") / F.col("_n")) * (F.col("_sxj") / F.col("_n"))
            ).alias("cov"),
        )
    )


def pca_power(cov_tri: DataFrame, dim: int, rounds: int = 3) -> DataFrame:
    """-> (i, v) unit top-eigenvector estimate after ``rounds`` power
    iterations from v0 = 1/sqrt(dim): v <- normalize(C v). Runs entirely
    on the d^2-row covariance table — mirror the triangle, then each
    round is one join + one sum keyed on i plus a broadcast L2 norm."""
    from .lineage import truncate_plan

    # the covariance build (mapInPandas + combine) runs ONCE: truncate it
    # out of every round's plan, or round k's lineage contains k copies
    # of the whole upstream job and the plan grows exponentially
    cfull = truncate_plan(
        cov_tri.unionByName(
            cov_tri.where(F.col("i") != F.col("j")).select(
                F.col("j").alias("i"), F.col("i").alias("j"), "cov"
            )
        )
    )
    spark = cov_tri.sparkSession
    v = spark.range(dim).select(
        F.col("id").cast("int").alias("j"),
        F.lit(1.0 / float(dim) ** 0.5).alias("v"),
    )
    for _ in range(rounds):
        w = (
            cfull.join(F.broadcast(v), "j")
            .groupBy("i")
            .agg(F.sum(F.col("cov") * F.col("v")).alias("w"))
        )
        nrm = w.agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("_nrm"))
        v = truncate_plan(
            w.crossJoin(F.broadcast(nrm)).select(
                F.col("i").alias("j"), (F.col("w") / F.col("_nrm")).alias("v")
            ),
            eager=False,
        )
    return v.select(F.col("j").alias("i"), "v")


def pca_project(
    embs: DataFrame,
    component: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (vec_id, proj) dot product of every embedding with the (i, v)
    component table — component is model-sized and broadcast; the big
    side explodes once and aggregates back on its own id (map-side
    partial sums, one exchange)."""
    ex = embs.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(vec_col).alias("i", "x"),
    )
    return (
        ex.join(F.broadcast(component), "i")
        .groupBy("vec_id")
        .agg(F.sum(F.col("x").cast("double") * F.col("v")).alias("proj"))
    )
