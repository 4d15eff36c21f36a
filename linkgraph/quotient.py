"""Quotient graph + node-induced subgraph — derived-graph operators.

≙ reference capabilities:
- ``XBytecodeGraph.get_source_code_graph`` (/root/reference/src/ccm/
  graphs.py:135-202): quotient of the bytecode digraph under the
  "same source line" equivalence — a quotient edge exists iff ANY
  cross-block edge exists, blocks relabelled to a canonical member, and a
  singleton quotient gets a self-loop to stay "connected"
  (graphs.py:198-200).
- ``XBytecodeGraph.get_subgraph`` (graphs.py:100-133): node-induced
  subgraph with recomputed point-class counts (the reference's version
  always raises via an undefined-variable bug, graphs.py:124; the
  *capability* is reproduced here).

Spark-first: a quotient is two hash joins + one distinct (never a
per-block product like ``nx.quotient_graph``'s ``block_to_block``); a
node-induced subgraph is two left-semi joins. Both broadcast the small
side automatically and keep everything JVM-side, so they survive a
10^12-vertex graph as long as the mapping table does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def quotient_edges(
    edges: DataFrame,
    mapping: DataFrame,
    keep_self_loops: bool = False,
) -> DataFrame:
    """edges(src,dst) × mapping(id,key) -> distinct quotient edges (q_src,q_dst).

    ``mapping`` assigns every vertex to its equivalence class (component id,
    url host, source line, ...). A quotient edge (a,b) exists iff any
    original edge crosses from class a to class b (the reference's
    ``block_to_block`` existence semantics, graphs.py:179-180). Self-loops
    (intra-class edges) are dropped unless ``keep_self_loops`` — matching
    ``nx.quotient_graph``'s ``create_using=DiGraph`` default.
    """
    src_map = mapping.select(F.col("id").alias("src"), F.col("key").alias("q_src"))
    dst_map = mapping.select(F.col("id").alias("dst"), F.col("key").alias("q_dst"))
    q = (
        edges.join(src_map, "src")
        .join(dst_map, "dst")
        .select("q_src", "q_dst")
    )
    if not keep_self_loops:
        q = q.where(F.col("q_src") != F.col("q_dst"))
    return q.distinct()


def quotient_graph(
    edges: DataFrame,
    mapping: DataFrame,
    keep_self_loops: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """-> (q_edges, q_vertices) where q_vertices(key, n_members) also keeps
    the canonical representative (min member id — the reference relabels
    blocks to their min-offset line, graphs.py:184-188)."""
    q_vertices = mapping.groupBy("key").agg(
        F.count("*").alias("n_members"), F.min("id").alias("rep_id")
    )
    return quotient_edges(edges, mapping, keep_self_loops), q_vertices


def host_of(url):
    """URL column -> lowercase host (authority without port/userinfo)."""
    host = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    host = F.regexp_extract(host, r"^(?:[^@]*@)?([^:]*)", 1)
    return F.lower(host)


def host_graph(edges_urls: DataFrame) -> DataFrame:
    """edges(src_url, dst_url) -> distinct host-level quotient edges
    (q_src, q_dst) — the web-graph instance of the reference's source-line
    quotient (SURVEY.md §2 row G4)."""
    return (
        edges_urls.select(
            host_of(F.col("src_url")).alias("q_src"),
            host_of(F.col("dst_url")).alias("q_dst"),
        )
        .where(F.col("q_src") != F.col("q_dst"))
        .distinct()
    )


def node_induced_subgraph(
    edges: DataFrame,
    vertices: DataFrame,
    keep: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """Node-induced subgraph: keep(id) -> (sub_edges, sub_vertices).

    Two left-semi joins on the edge table (an edge survives iff BOTH
    endpoints are kept), one on the vertex table; degree columns are
    recomputed from the surviving edges (the reference recomputes its
    point-class counts after removal, graphs.py:127-131).
    """
    keep_ids = keep.select("id").distinct()
    sub_edges = (
        edges.join(keep_ids.select(F.col("id").alias("src")), "src", "left_semi")
        .join(keep_ids.select(F.col("id").alias("dst")), "dst", "left_semi")
        .select("src", "dst")
    )
    out_deg = sub_edges.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("o")
    )
    in_deg = sub_edges.groupBy(F.col("dst").alias("id")).agg(
        F.count("*").alias("i")
    )
    sub_vertices = (
        vertices.join(keep_ids, "id", "left_semi")
        .join(out_deg, "id", "left")
        .join(in_deg, "id", "left")
        .select(
            "id",
            F.coalesce("o", F.lit(0)).cast("long").alias("out_deg"),
            F.coalesce("i", F.lit(0)).cast("long").alias("in_deg"),
        )
    )
    return sub_edges, sub_vertices
