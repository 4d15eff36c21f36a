"""Edge/vertex table construction — the engine's graph layer.

≙ the reference's ``XBytecodeGraph`` assembly (/root/reference/src/ccm/
graphs.py:204-258): ordered records -> edge list -> graph + point-class
indexes. Here the graph is a property graph held as two DataFrames
(edges, vertices), ids are stable 64-bit ``xxhash64`` of the url, and the
point-class indexes become degree columns computed in one aggregation pass
(vs the reference's four tee'd filter passes, graphs.py:252-256).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def build_edges(links: DataFrame) -> DataFrame:
    """links(src_url, dst_url, pos) -> edges(src, dst) — distinct directed
    edges keyed by xxhash64(url). Duplicate anchors collapse (the graph is a
    simple digraph, like the reference's nx.DiGraph, graphs.py:44)."""
    return (
        links.select(
            F.xxhash64("src_url").alias("src"),
            F.xxhash64("dst_url").alias("dst"),
        )
        .distinct()
    )


def build_vertices(pages: DataFrame, links: DataFrame) -> DataFrame:
    """vertices(id, url, out_deg, in_deg).

    The vertex set is page urls ∪ link-target urls — dangling targets
    (linked but never crawled) are real vertices with out_deg 0, exactly the
    rows PageRank's dangling-mass handling exists for.

    Degrees count *distinct* neighbors (edges are simple). One shuffle per
    degree direction; the url dictionary stays joinable by id for reporting.
    """
    urls = (
        pages.select("url")
        .unionByName(links.select(F.col("dst_url").alias("url")))
        .distinct()
    )
    edges = build_edges(links)
    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    in_deg = edges.groupBy("dst").agg(F.count("*").alias("in_deg"))
    return (
        urls.select(F.xxhash64("url").alias("id"), "url")
        .join(out_deg, F.col("id") == F.col("src"), "left")
        .drop("src")
        .join(in_deg, F.col("id") == F.col("dst"), "left")
        .drop("dst")
        .select(
            "id",
            "url",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        )
    )


def build_graph(pages: DataFrame, links: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Convenience: (edges, vertices) from pages + extracted links."""
    return build_edges(links), build_vertices(pages, links)


def sym_pairs(df: DataFrame, c1: str, c2: str, extra: tuple = ()) -> DataFrame:
    """Emit each row twice — as (c1, c2) and swapped — in ONE exploded
    pass over ``df`` instead of a two-branch union (which evaluates a
    computed input once per branch; Catalyst shares the branches' common
    exchange but re-runs everything above it). ``extra`` columns are
    carried through unchanged."""
    swapped = F.explode(
        F.array(
            F.struct(F.col(c1).alias(c1), F.col(c2).alias(c2)),
            F.struct(F.col(c2).alias(c1), F.col(c1).alias(c2)),
        )
    )
    return df.select(swapped.alias("_p"), *[F.col(c) for c in extra]).select(
        f"_p.{c1}", f"_p.{c2}", *extra
    )


def undirected_edges(edges: DataFrame) -> DataFrame:
    """Symmetric closure (u,v)+(v,u), self-loops dropped — the neighbor
    relation used by connected components / label propagation / triangles.

    Emitted as ONE exploded pass over the edge table rather than a
    two-branch union: the union form evaluates the (possibly computed)
    edge plan once per branch, the exploded form once (guide §1.2;
    measured 3/4 interleaved pairs faster at sf0.1, identical rows)."""
    return (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.explode(
                F.array(
                    F.struct(F.col("src"), F.col("dst")),
                    F.struct(
                        F.col("dst").alias("src"), F.col("src").alias("dst")
                    ),
                )
            ).alias("p")
        )
        .select("p.src", "p.dst")
        .distinct()
    )


def reciprocity(edges: DataFrame) -> DataFrame:
    """-> one row (n_directed, n_reciprocal, reciprocity) over the distinct
    directed simple graph: the fraction of directed edges whose reverse
    edge also exists — the classic link-graph "mutual linking" metric
    (boilerplate nav/webring structures score high; organic citation
    graphs low).

    One distinct + one self-semi-join keyed on (src,dst), then a scalar
    aggregate — two exchanges, no fan-out beyond |E|.
    """
    e = (
        edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = e.join(rev, ["src", "dst"], "left_semi")
    return (
        e.agg(F.count("*").alias("n_directed"))
        .crossJoin(recip.agg(F.count("*").alias("n_reciprocal")))
        .select(
            "n_directed",
            "n_reciprocal",
            F.when(F.col("n_directed") == 0, F.lit(0.0))
            .otherwise(F.round(F.col("n_reciprocal") / F.col("n_directed"), 6))
            .alias("reciprocity"),
        )
    )


def health_report(edges: DataFrame) -> DataFrame:
    """-> one row (n_edges, n_vertices, n_entry, n_dangling, n_internal,
    frac_dangling) — the link-graph health summary a crawl pipeline
    checks before running PageRank. ``n_entry`` = vertices with outgoing
    links only (crawl frontier roots), ``n_dangling`` = link targets
    with no outgoing edge (PageRank's dangling-mass set — uncrawled or
    leaf pages), ``n_internal`` = both sides.

    Plan: one distinct on (src,dst), two key-bounded aggregations to the
    distinct src / dst sets, one full-outer join of those sets, then a
    scalar rollup — every exchange is bounded by |V|, nothing fans out.
    """
    e = edges.where(F.col("src") != F.col("dst")).select("src", "dst").distinct()
    srcs = e.select(F.col("src").alias("id")).distinct().withColumn("has_out", F.lit(1))
    dsts = e.select(F.col("dst").alias("id")).distinct().withColumn("has_in", F.lit(1))
    cls = srcs.join(dsts, "id", "full_outer").select(
        F.coalesce("has_out", F.lit(0)).alias("has_out"),
        F.coalesce("has_in", F.lit(0)).alias("has_in"),
    )
    return (
        cls.agg(
            F.count("*").alias("n_vertices"),
            F.sum(F.when((F.col("has_out") == 1) & (F.col("has_in") == 0), 1).otherwise(0)).alias("n_entry"),
            F.sum(F.when((F.col("has_out") == 0) & (F.col("has_in") == 1), 1).otherwise(0)).alias("n_dangling"),
            F.sum(F.when((F.col("has_out") == 1) & (F.col("has_in") == 1), 1).otherwise(0)).alias("n_internal"),
        )
        .crossJoin(e.agg(F.count("*").alias("n_edges")))
        .select(
            F.col("n_edges").cast("long").alias("n_edges"),
            F.col("n_vertices").cast("long").alias("n_vertices"),
            F.col("n_entry").cast("long").alias("n_entry"),
            F.col("n_dangling").cast("long").alias("n_dangling"),
            F.col("n_internal").cast("long").alias("n_internal"),
            F.round(F.col("n_dangling") / F.col("n_vertices"), 6).alias("frac_dangling"),
        )
    )


def assortativity(edges: DataFrame) -> DataFrame:
    """-> one row (n_edges, assortativity6) — directed degree
    assortativity (Newman 2002): the Pearson correlation, over directed
    edges, of the source's out-degree with the target's in-degree.
    Negative on organic web graphs (hubs point at leaves); near +1 on
    mirrored/boilerplate link farms — a one-number topology fingerprint.

    Degree tables are |V|-bounded aggregations; the edge-to-degree joins
    shuffle on src then dst (both already the edge table's natural
    keys); the correlation is assembled from six single-pass scalar sums
    (n, Σx, Σy, Σxy, Σx², Σy²) with ``try_divide`` so a degenerate input
    (constant degree on either side) yields NULL — the same answer
    DuckDB's ``corr`` gives — instead of an ANSI divide-by-zero. The
    moment form is invariant to the sample-vs-population variance
    convention, so the oracle matches at 6 decimals.
    """
    e = edges.where(F.col("src") != F.col("dst")).select("src", "dst").distinct()
    outd = e.groupBy("src").agg(F.count("*").alias("src_out_deg"))
    ind = e.groupBy("dst").agg(F.count("*").alias("dst_in_deg"))
    j = e.join(outd, "src").join(ind, "dst")
    x = F.col("src_out_deg").cast("double")
    y = F.col("dst_in_deg").cast("double")
    m = j.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return m.select(
        F.col("n").cast("long").alias("n_edges"),
        F.round(F.try_divide(num, F.nullif(den, F.lit(0.0))), 6).alias("assortativity6"),
    )


def degree_histogram(edges: DataFrame, vertices: DataFrame) -> DataFrame:
    """-> (out_deg, n_vertices) — the degree-distribution summary (the
    power-law exponent eyeball for web graphs). Zero-out-degree vertices
    are included (coalesce against the vertex table), so the histogram
    sums to |V|. Two aggregations on naturally-bounded keys."""
    deg = (
        vertices.select("id")
        .join(
            edges.where(F.col("src") != F.col("dst"))
            .select("src", "dst")
            .distinct()
            .groupBy(F.col("src").alias("id"))
            .agg(F.count("*").alias("out_deg")),
            "id",
            "left",
        )
        .select(F.coalesce("out_deg", F.lit(0)).alias("out_deg"))
    )
    return deg.groupBy("out_deg").agg(F.count("*").cast("long").alias("n_vertices"))


def cocitation(
    edges: DataFrame, min_shared: int = 2, df_cap: int | None = 10_000
) -> DataFrame:
    """-> (a, b, shared) — source pairs citing >= min_shared common
    targets (bibliographic coupling; swap the edge direction for
    co-citation proper). The classic "related pages" signal.

    Same posting-list shape as n-gram dedup: ONE exchange keyed on the
    shared target builds the per-target citer list, pairs explode from
    each list, one (a,b) aggregate counts them. ``df_cap`` drops
    super-cited targets (every page links the homepage — its citer pair
    set is quadratic noise), the direct analogue of dedup's stop-shingle
    guard; None keeps it exact for oracle runs.
    """
    e = (
        edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    lists = e.groupBy("dst").agg(F.sort_array(F.collect_list("src")).alias("cs"))
    if df_cap is not None:
        lists = lists.where(F.size("cs") <= df_cap)
    return (
        lists.select(F.posexplode("cs").alias("i", "a"), "cs")
        .select(
            "a",
            F.explode(
                F.slice("cs", F.col("i") + F.lit(2), F.size("cs") - F.col("i") - 1)
            ).alias("b"),
        )
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("shared"))
        .where(F.col("shared") >= min_shared)
    )


def bfs_distances(
    spark, edges: DataFrame, seeds: DataFrame, max_hops: int = 3
) -> DataFrame:
    """-> (id, dist) — minimal directed hop distance from the seed set,
    bounded at ``max_hops`` (unreached vertices are absent). The
    neighborhood-expansion primitive (crawl frontier depth, link-spam
    blast radius, seed-set influence).

    BSP frontier relaxation: each round extends every settled distance by
    one directed hop and re-takes the per-vertex min — join + union +
    groupBy(min), all keyed on vertex id. Rounds are a FIXED unrolled
    prefix (bounded-radius queries are the scalable form; an unbounded
    variant is connected_components' fixpoint pattern), so the whole
    expansion is one lazy plan with zero per-round driver actions, and
    SQL-replicable round for round.
    """
    from .lineage import truncate_plan

    dist = seeds.select("id", F.lit(0).cast("int").alias("dist")).distinct()
    e = edges.where(F.col("src") != F.col("dst")).select("src", "dst").distinct()
    for _ in range(max_hops):
        hop = (
            e.join(dist.select(F.col("id").alias("src"), "dist"), "src")
            .select(F.col("dst").alias("id"), (F.col("dist") + 1).alias("dist"))
        )
        dist = truncate_plan(
            dist.unionByName(hop).groupBy("id").agg(F.min("dist").alias("dist")),
            eager=False,
        )
    return dist.select("id", F.col("dist").cast("int").alias("dist"))


def bfs_labeled(
    spark, edges: DataFrame, seeds: DataFrame, max_hops: int = 3
) -> DataFrame:
    """-> (seed, id, dist) — minimal directed hop distance from EACH seed
    separately (the per-seed variant of ``bfs_distances``: that one
    relaxes from the seed set as a whole). Feeds per-seed influence
    metrics — reach counts, bounded harmonic centrality — for moderate
    seed sets; state is one row per (seed, reached vertex), so size the
    seed set to the radius (|seeds| x bounded neighborhood, never |V|^2).

    Same unrolled BSP shape as bfs_distances, keyed on (seed, id): one
    lazy plan, zero per-round driver actions, SQL-replicable round for
    round.
    """
    from .lineage import truncate_plan

    dist = seeds.select(
        F.col("id").alias("seed"), F.col("id"), F.lit(0).cast("int").alias("dist")
    ).distinct()
    e = edges.where(F.col("src") != F.col("dst")).select("src", "dst").distinct()
    for _ in range(max_hops):
        hop = (
            e.join(dist.select("seed", F.col("id").alias("src"), "dist"), "src")
            .select("seed", F.col("dst").alias("id"), (F.col("dist") + 1).alias("dist"))
        )
        dist = truncate_plan(
            dist.unionByName(hop)
            .groupBy("seed", "id")
            .agg(F.min("dist").alias("dist")),
            eager=False,
        )
    return dist.select("seed", "id", F.col("dist").cast("int").alias("dist"))


def harmonic_centrality(
    spark, edges: DataFrame, seeds: DataFrame, max_hops: int = 3
) -> DataFrame:
    """-> (seed, n_reached, harmonic) — bounded harmonic centrality per
    seed: sum of 1/dist over vertices reached within ``max_hops`` (the
    standard finite, disconnected-safe centrality). One aggregation over
    the labeled BFS state."""
    d = bfs_labeled(spark, edges, seeds, max_hops=max_hops)
    reached = d.where(F.col("dist") > 0)
    return reached.groupBy("seed").agg(
        F.count("*").cast("long").alias("n_reached"),
        F.round(F.sum(1.0 / F.col("dist")), 6).alias("harmonic"),
    )


def conductance(edges: DataFrame, mapping: DataFrame) -> DataFrame:
    """edges(src, dst) + mapping(id, key) -> (key, vol, cut, conductance)
    — per-group conductance phi(S) = cut(S) / min(vol(S), vol(V)-vol(S)):
    the partition-quality metric for a host/domain grouping (low = hosts
    are link-cohesive communities; high = the grouping cuts through real
    link structure — tells you whether host-level quotients/rollups are
    faithful summaries).

    Two dictionary joins map endpoints to groups, each edge emits its two
    endpoint stubs (internal edges count twice into vol, the standard
    volume), one aggregation keyed on group. Broadcast the mapping when
    it is host-sized.
    """
    e = edges.where(F.col("src") != F.col("dst")).select("src", "dst").distinct()
    ms = mapping.select(F.col("id").alias("src"), F.col("key").alias("ks"))
    md = mapping.select(F.col("id").alias("dst"), F.col("key").alias("kd"))
    tagged = e.join(ms, "src").join(md, "dst")
    stubs = tagged.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("ks").alias("key"),
                    (F.col("ks") != F.col("kd")).alias("is_cut"),
                ),
                F.struct(
                    F.col("kd").alias("key"),
                    (F.col("ks") != F.col("kd")).alias("is_cut"),
                ),
            )
        ).alias("s")
    ).select("s.key", "s.is_cut")
    per = stubs.groupBy("key").agg(
        F.count("*").cast("long").alias("vol"),
        F.sum(F.col("is_cut").cast("long")).cast("long").alias("cut"),
    )
    tot = per.agg(F.sum("vol").alias("tv"))
    return per.crossJoin(F.broadcast(tot)).select(
        "key",
        "vol",
        "cut",
        F.round(
            F.col("cut")
            / F.least(F.col("vol"), F.col("tv") - F.col("vol")),
            6,
        ).alias("conductance"),
    )


def collision_audit(vertices: DataFrame) -> tuple[int, int]:
    """(distinct ids, distinct urls) — must be equal (FIXTURES.md §3)."""
    row = vertices.agg(
        F.countDistinct("id").alias("ids"), F.countDistinct("url").alias("urls")
    ).collect()[0]
    return row["ids"], row["urls"]


def snapshot_diff(edges_a: DataFrame, edges_b: DataFrame) -> DataFrame:
    """-> (src, dst, status in {'removed','added'}) — edge churn between
    two crawl snapshots (A = earlier, B = later): the crawl-diff table
    behind freshness metrics and incremental re-extraction (only re-parse
    pages whose outlink set changed).

    One full-outer shuffle join keyed on (src, dst) after per-side
    distinct — unchanged edges (the overwhelming majority crawl-to-crawl)
    are dropped in the same stage, so output is proportional to churn,
    not graph size. No driver-side set logic.
    """
    a = edges_a.select("src", "dst").distinct().withColumn("_a", F.lit(1))
    b = edges_b.select("src", "dst").distinct().withColumn("_b", F.lit(1))
    j = a.join(b, ["src", "dst"], "full_outer")
    return j.where(F.col("_a").isNull() | F.col("_b").isNull()).select(
        "src",
        "dst",
        F.when(F.col("_b").isNull(), F.lit("removed"))
        .otherwise(F.lit("added"))
        .alias("status"),
    )


def modularity(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """edges(src, dst) + labels(id, label) -> per-community
    (label, n_nodes, intra_edges, degree_sum, q_term9) over the
    UNDIRECTED simple graph: Newman-Girvan modularity terms
    q_c = m_c/m - (d_c/(2m))^2, so Q = sum(q_term9). The community-
    quality score for a label-propagation / host partition — the
    companion metric to :func:`conductance` (cut-based) on the
    fraction-of-edges side.

    Shape: one canonical-pair projection (least/greatest), degree from
    the exploded incidence, two dictionary joins to tag endpoint labels,
    one groupBy per aggregate — all hash exchanges on bounded keys; the
    label map broadcasts when communities come from a quotient. The
    q_term arithmetic is written with an explicit x*x square so the SQL
    oracle evaluates the identical IEEE expression.
    """
    e = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
    )
    mm = e.agg(F.count("*").cast("double").alias("m"))
    inc = e.select(F.col("u").alias("id")).unionAll(
        e.select(F.col("v").alias("id"))
    )
    deg = inc.groupBy("id").agg(F.count("*").alias("deg"))
    la = labels.select("id", "label")
    dsum = (
        la.join(deg, "id", "left")
        .groupBy("label")
        .agg(
            F.count("*").cast("long").alias("n_nodes"),
            F.sum(F.coalesce("deg", F.lit(0))).cast("long").alias("degree_sum"),
        )
    )
    lu = la.select(F.col("id").alias("u"), F.col("label").alias("lu"))
    lv = la.select(F.col("id").alias("v"), F.col("label").alias("lv"))
    intra = (
        e.join(lu, "u")
        .join(lv, "v")
        .where(F.col("lu") == F.col("lv"))
        .groupBy(F.col("lu").alias("label"))
        .agg(F.count("*").cast("long").alias("intra_edges"))
    )
    half = F.col("degree_sum").cast("double") / (2.0 * F.col("m"))
    return (
        dsum.join(intra, "label", "left")
        .crossJoin(F.broadcast(mm))
        .select(
            "label",
            "n_nodes",
            F.coalesce("intra_edges", F.lit(0)).cast("long").alias("intra_edges"),
            "degree_sum",
            F.round(
                F.coalesce("intra_edges", F.lit(0)).cast("double") / F.col("m")
                - half * half,
                9,
            ).alias("q_term9"),
        )
    )
