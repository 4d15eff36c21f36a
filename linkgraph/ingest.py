"""Raw-graph-data ingestion — build (edges, vertices) from pre-built data.

≙ the reference's alternate constructor path ``XBytecodeGraph(graph_data=
...)`` (/root/reference/src/ccm/graphs.py:206,229-240): a list/dict/
nx.Graph/ndarray/sparse/AGraph bypasses bytecode scanning entirely and
becomes the graph directly. The engine equivalent bypasses link
extraction: any of those shapes becomes the canonical DataFrame pair
(edges(src,dst), vertices(id)) that every operator consumes.

All shapes normalize driver-side to an edge iterable and then ONE
``spark.createDataFrame`` — appropriate because a raw in-driver object is
by definition driver-resident already (this is the small-graph
convenience path; web-scale graphs arrive via extraction or a parquet
edge table read, never through here). Node labels may be ints (used
as-is) or strings (hashed with xxhash64, the engine's url-id convention —
linkgraph.graph.build_edges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _edge_iter(data):
    """Normalize supported graph_data shapes to an (src, dst) iterator."""
    # adjacency dict {u: [v, ...]}
    if isinstance(data, dict):
        for u, nbrs in data.items():
            for v in nbrs:
                yield (u, v)
        return
    # networkx graph (gated import — engine never requires networkx)
    try:
        import networkx as nx

        if isinstance(data, nx.Graph):
            for u, v in data.edges():
                yield (u, v)
                if not data.is_directed():
                    yield (v, u)
            return
    except ImportError:
        pass
    # numpy adjacency matrix (square, nonzero = edge)
    try:
        import numpy as np

        if isinstance(data, np.ndarray):
            if data.ndim != 2 or data.shape[0] != data.shape[1]:
                raise ValueError(
                    f"adjacency matrix must be square 2-D, got {data.shape}"
                )
            rr, cc = np.nonzero(data)
            for u, v in zip(rr.tolist(), cc.tolist()):
                yield (u, v)
            return
    except ImportError:
        pass
    # scipy sparse adjacency (gated import)
    try:
        from scipy.sparse import spmatrix  # type: ignore

        if isinstance(data, spmatrix):
            coo = data.tocoo()
            for u, v in zip(coo.row.tolist(), coo.col.tolist()):
                yield (int(u), int(v))
            return
    except ImportError:
        pass
    # iterable of (src, dst) pairs
    for item in data:
        u, v = item
        yield (u, v)


def graph_from_data(
    spark: SparkSession, data, isolates=()
) -> tuple[DataFrame, DataFrame]:
    """graph_data -> (edges(src,dst), vertices(id)), ready for every
    engine operator (pagerank/components/labelprop/triangles/complexity).

    ``isolates`` optionally adds edge-less vertices (nx graphs contribute
    their isolated nodes automatically). String labels are hashed to the
    engine's 64-bit id space; int labels pass through unchanged.
    """
    pairs = list(_edge_iter(data))
    extra = list(isolates)
    try:
        import networkx as nx

        if isinstance(data, nx.Graph):
            extra += [n for n in data.nodes() if data.degree(n) == 0]
    except ImportError:
        pass

    def is_str(x):
        return isinstance(x, str)

    if any(is_str(u) or is_str(v) for u, v in pairs) or any(map(is_str, extra)):
        sdf = spark.createDataFrame(
            [(str(u), str(v)) for u, v in pairs], "src string, dst string"
        )
        edges = sdf.select(
            F.xxhash64("src").alias("src"), F.xxhash64("dst").alias("dst")
        ).distinct()
        iso_ids = (
            spark.createDataFrame([(str(x),) for x in extra], "u string").select(
                F.xxhash64("u").alias("id")
            )
            if extra
            else None
        )
    else:
        edges = spark.createDataFrame(
            [(int(u), int(v)) for u, v in pairs], "src long, dst long"
        ).distinct()
        iso_ids = (
            spark.createDataFrame([(int(x),) for x in extra], "id long")
            if extra
            else None
        )
    vertices = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    if iso_ids is not None:
        vertices = vertices.unionByName(iso_ids).distinct()
    return edges, vertices
