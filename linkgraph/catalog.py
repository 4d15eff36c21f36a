"""SQL catalog — register the engine's tables as temp views so users can
drive everything from ``spark.sql`` (the reference's REPL-style UX,
/root/reference/src/ccm/__init__.py's one-call entry points, mapped onto
Spark's SQL surface).

``register(spark, sf_dir)`` materializes NOTHING: each view is a lazy
DataFrame over the parquet scans (plus the extraction UDF for links), so
Catalyst still sees pushed filters and pruned columns through the view —
``spark.sql("SELECT src FROM lg_edges WHERE ...")`` plans exactly like
the DataFrame call.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

VIEWS = (
    "lg_documents",
    "lg_embeddings",
    "lg_pages",
    "lg_links",
    "lg_edges",
    "lg_vertices",
)


def register(spark: SparkSession, sf_dir: str, prefix: str = "lg_") -> list[str]:
    """Create the engine's temp views over ``sf_dir`` and return their
    names: documents/embeddings (raw scans), pages (synthesized html),
    links (extracted edges with position), edges/vertices (the graph
    layer's hashed tables)."""
    import __spark_entry__ as entry

    from linkgraph.extract import build_links
    from linkgraph.graph import build_graph

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pages = entry._synth_pages(docs)
    links = build_links(pages)
    edges, vertices = build_graph(pages, links)
    named = {
        f"{prefix}documents": docs,
        f"{prefix}embeddings": embs,
        f"{prefix}pages": pages,
        f"{prefix}links": links,
        f"{prefix}edges": edges,
        f"{prefix}vertices": vertices,
    }
    for name, df in named.items():
        df.createOrReplaceTempView(name)
    return list(named)


def register_iceberg(spark: SparkSession, name: str, location: str,
                     snapshot_id: int | None = None) -> str:
    """Expose a jar-free Iceberg table (linkgraph.iceberg_lite) as a temp
    view — optionally pinned to a snapshot, so SQL users get time travel:

        register_iceberg(spark, "pages_v1", loc, snapshot_id=s1)
        spark.sql("SELECT lang, count(*) FROM pages_v1 GROUP BY lang")

    The view wraps the lazy snapshot scan; filters/pruning still reach
    the underlying parquet scan through it."""
    from .iceberg_lite import IcebergLiteTable

    df = IcebergLiteTable.load(location).scan(spark, snapshot_id=snapshot_id)
    df.createOrReplaceTempView(name)
    return name
