"""Similarity search over an embedding column (array<float>).

Two paths, one semantics:

- ``topk_bruteforce`` — exact top-k cosine neighbors; the *queries* side is
  broadcast (it's the small side by construction), the corpus side never
  shuffles, per-query ranking is a window over the corpus partitioning.
- ``topk_lsh`` — sign-LSH (random-hyperplane family degenerated to
  coordinate hyperplanes so the DuckDB oracle can replicate buckets
  exactly): candidates must share a bucket, then exact re-rank. At 100 TB
  the bucket join replaces the corpus-wide cross product.
  ``probe_flips=1`` adds bit-flip multi-probing: each query also probes
  every bucket at Hamming distance 1 (the standard multi-probe LSH recall
  lift — probe count grows by len(dims), bucket-join cost stays bounded
  by bucket sizes); probed buckets are distinct, so no pair dedup is
  needed.

All arithmetic is double precision via built-in higher-order array
functions (zip_with/aggregate) — JVM-side, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import cosine_col


def sign_bucket_col(vec, dims: tuple[int, ...]):
    """Bucket id string: one char per probed dim, '1' if vec[d] >= 0."""
    return F.concat(
        *[
            F.when(F.element_at(vec, d + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for d in dims
        ]
    )


def topk_bruteforce(
    embs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (query_id, neighbor_id, cos) exact top-k per query.

    ``queries`` carries (query_id, qvec). Ties broken by neighbor_id asc
    (min-based, deterministic). Self-matches excluded.
    """
    corpus = embs.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v"))
    scored = (
        F.broadcast(queries)
        .crossJoin(corpus)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_col(F.col("qvec"), F.col("v")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos")
    )


def queries_from(embs: DataFrame, modulus: int, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Deterministic query subset: every vec with id % modulus == 0."""
    return embs.where(F.col(id_col) % modulus == 0).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )


def _flip_bit(bkt, i: int, nbits: int):
    """Bucket string with character i toggled ('0' <-> '1')."""
    return F.concat(
        F.substring(bkt, 1, i),
        F.when(F.substring(bkt, i + 1, 1) == "1", F.lit("0")).otherwise(F.lit("1")),
        F.substring(bkt, i + 2, nbits - i - 1),
    )


def topk_lsh(
    embs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dims: tuple[int, ...] = (0, 8, 16, 24, 32, 40, 48, 56),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_flips: int = 0,
    n_tables: int | None = None,
    bits_per_table: int = 6,
    n_dims: int = 64,
) -> DataFrame:
    """-> (query_id, neighbor_id, cos) approximate top-k.

    Single-table mode (``n_tables=None``): candidates share the sign
    bucket over ``dims``; the oracle-checked base path.
    Multi-table mode (``n_tables=T``): T hash tables over disjoint
    deterministic hyperplane sets (dedup.lsh_table_dims — same OR-of-ANDs
    construction as embedding_dup_pairs); a pair is a candidate if it
    collides in ANY table. ``probe_flips=1`` additionally probes every
    bucket at Hamming distance 1 per table (multi-probe LSH). Candidate
    pairs are DISTINCT'd before the exact-cosine re-rank, so vectors join
    back once per pair regardless of how many tables collide. Recall is
    tuned by (T, bits, probes): weakly-clustered corpora need coarse
    bands + many tables (the sf0.1 fixture is near-random — p(bit
    agree) ≈ 0.62 for true top-5 neighbors — so ≥0.9 recall forces a
    candidate fraction no sublinear method avoids; on real clustered
    embeddings the same knobs prune far harder)."""
    if probe_flips not in (0, 1):
        raise ValueError("probe_flips supports 0 (single) or 1 (Hamming-1)")

    if n_tables is None:
        table_dims = {0: dims}
    else:
        from .dedup import lsh_table_dims

        table_dims = dict(enumerate(lsh_table_dims(n_tables, bits_per_table, n_dims)))

    def keys_for(vec, probe: bool):
        per_table = []
        for t, d in table_dims.items():
            b = sign_bucket_col(vec, d)
            base = F.concat(F.lit(f"{t}:"), b)
            if probe:
                n = len(d)
                # Hamming-1 probes via ONE transform over bit positions —
                # an unrolled per-bit concat chain blows past janino's
                # 64KB codegen method limit at realistic (tables × bits)
                flips = F.transform(
                    F.sequence(F.lit(1), F.lit(n)),
                    lambda i: F.concat(
                        F.lit(f"{t}:"),
                        F.substring(b, F.lit(1), i - 1),
                        F.when(
                            F.substring(b, i, F.lit(1)) == "1", F.lit("0")
                        ).otherwise(F.lit("1")),
                        F.substring(b, i + 1, F.lit(n) - i),
                    ),
                )
                per_table.append(F.concat(F.array(base), flips))
            else:
                per_table.append(F.array(base))
        if len(per_table) == 1 and not probe:
            return per_table[0][0]  # single-table scalar: original plan shape
        allk = F.concat(*per_table) if len(per_table) > 1 else per_table[0]
        return F.explode(allk)

    corpus = embs.select(
        F.col(id_col).alias("neighbor_id"),
        keys_for(F.col(vec_col), probe=False).alias("bkt"),
    )
    q = queries.select(
        "query_id", keys_for(F.col("qvec"), probe=probe_flips == 1).alias("bkt")
    )
    cand = (
        F.broadcast(q)
        .join(corpus, "bkt")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    scored = (
        cand.join(
            queries.select("query_id", "qvec"), "query_id"
        )
        .join(
            embs.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v")),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_col(F.col("qvec"), F.col("v")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos")
    )


def centroids_from(
    embs: DataFrame, modulus: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Deterministic coarse-quantizer codebook: every vec with
    id % modulus == 0 becomes a centroid (cid, cvec). A production IVF
    would k-means these; a deterministic subset keeps the oracle
    closed-form while exercising the identical query shape."""
    return embs.where(F.col(id_col) % modulus == 0).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")
    )


def label_centroids(
    embs: DataFrame,
    dim: int = 64,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (label, n, centroid array<double>) — per-class mean vector.

    The class-prototype operator (k-means M-step / prototype classifier /
    per-cluster summary for embedding dedup). Deliberately NOT an
    explode: ``dim`` per-component ``avg(embedding[d])`` aggregates run
    inside ONE whole-stage-codegen exchange on label — shuffle volume is
    labels x dim partial rows per task, never rows x dim exploded rows.
    Components rounded to 6 decimals (engine-wide float determinism
    discipline).
    """
    aggs = [
        F.round(F.avg(F.col(vec_col).getItem(d)), 6).alias(f"c{d}")
        for d in range(dim)
    ]
    agg = embs.groupBy(F.col(label_col).alias("label")).agg(
        F.count("*").alias("n"), *aggs
    )
    return agg.select(
        "label",
        "n",
        F.array(*[F.col(f"c{d}") for d in range(dim)]).alias("centroid"),
    )


def ivf_cells(
    embs: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF assignment: each vector joins its nearest centroid by cosine
    (rounded; ties -> min cid) -> (vec_id, cell). The broadcast
    cross-score + per-vector argmax is the standard IVF build pass — at
    10^12 rows it is one map-side pass over the corpus (centroids
    broadcast), then everything downstream is bucketed by cell."""
    scored = embs.crossJoin(F.broadcast(centroids)).select(
        F.col(id_col).alias("vec_id2"),
        "cid",
        F.round(cosine_col(F.col(vec_col), F.col("cvec")), 6).alias("ccos"),
    )
    w = Window.partitionBy("vec_id2").orderBy(F.desc("ccos"), F.asc("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(F.col("vec_id2").alias("vec_id"), F.col("cid").alias("cell"))
    )


def topk_ivf(
    embs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    centroid_modulus: int = 40,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """-> (query_id, neighbor_id, cos) approximate top-k via IVF: corpus
    vectors live in their nearest-centroid cell; a query probes its
    ``nprobe`` closest cells and re-ranks exactly within them. The
    coarse-quantizer alternative to sign-LSH (both are `queries()`
    entries; recall grows with nprobe, candidate cost is bounded by cell
    sizes — never the corpus cross product). Pass ``centroids``
    (cid, cvec) to use a TRAINED codebook — e.g. ``kmeans_lloyd``'s —
    instead of the deterministic id-subset default."""
    cents = (
        centroids
        if centroids is not None
        else centroids_from(embs, centroid_modulus, id_col, vec_col)
    )
    cells = ivf_cells(embs, cents, id_col, vec_col)
    qscored = queries.crossJoin(F.broadcast(cents)).select(
        "query_id",
        "cid",
        F.round(cosine_col(F.col("qvec"), F.col("cvec")), 6).alias("ccos"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("ccos"), F.asc("cid"))
    qcells = (
        qscored.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= nprobe)
        .select("query_id", F.col("cid").alias("cell"))
    )
    cand = (
        qcells.join(cells, "cell")
        .where(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    scored = (
        cand.join(queries.select("query_id", "qvec"), "query_id")
        .join(
            embs.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v")),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_col(F.col("qvec"), F.col("v")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos")
    )


def bucket_histogram(
    embs: DataFrame,
    dims: tuple[int, ...] = (0, 8, 16, 24, 32, 40, 48, 56),
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (bucket, n_vecs) — LSH bucket occupancy (skew diagnostic: a hot
    bucket here is exactly a hub vertex in the graph algorithms)."""
    return (
        embs.select(sign_bucket_col(F.col(vec_col), dims).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vecs"))
    )


def quantize_int8(
    embs: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector symmetric int8 quantization audit — the compression
    step an ANN index at 100 TB applies before storing vectors (4x
    smaller, SIMD-friendly): scale = amax/127, q_i = round(x_i/scale)
    in [-127, 127], reported with integer checksums (q_sum, q_abs_sum —
    exact, hash-strong) and the reconstruction SSE.

    -> (vec_id, scale9, q_sum, q_abs_sum, sse9). Pure JVM array lambdas,
    zero shuffle at any corpus size; every float op is written so the
    DuckDB oracle evaluates the identical IEEE expression (float32 ->
    float64 widening is exact; the q fold is a sequential left fold in
    both engines). All-zero vectors quantize to q = 0 with scale 0.
    """
    x = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    amax = F.array_max(F.transform(x, F.abs))
    scale = amax / F.lit(127.0)
    q = F.when(scale == 0, F.transform(x, lambda v: F.lit(0).cast("long"))).otherwise(
        F.transform(x, lambda v: F.round(v / scale).cast("long"))
    )
    err = F.zip_with(x, q, lambda xv, qv: xv - qv * scale)
    return embs.select(
        F.col(id_col),
        F.round(scale, 9).alias("scale9"),
        F.aggregate(q, F.lit(0).cast("long"), lambda a, v: a + v).alias("q_sum"),
        F.aggregate(
            q, F.lit(0).cast("long"), lambda a, v: a + F.abs(v)
        ).alias("q_abs_sum"),
        F.round(
            F.aggregate(
                err, F.lit(0.0), lambda a, v: a + v * v
            ),
            9,
        ).alias("sse9"),
    )


def kmeans_assign(
    embs: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (vec_id, cid, dist): each vector's nearest centroid by squared
    L2, ties to the smallest cid (one struct-min, deterministic). The
    codebook broadcasts (k rows); the scan side streams — the k-means
    E-step and the IVF route step share this exact shape.
    """
    x = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    dist = F.aggregate(
        F.zip_with(x, F.col("cvec"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = embs.crossJoin(F.broadcast(centroids)).select(
        F.col(id_col),
        F.struct(dist.alias("d"), F.col("cid").alias("cid")).alias("dc"),
    )
    best = scored.groupBy(id_col).agg(F.min("dc").alias("dc"))
    return best.select(
        id_col, F.col("dc.cid").alias("cid"), F.col("dc.d").alias("dist")
    )


def kmeans_lloyd(
    embs: DataFrame,
    init_modulus: int = 64,
    rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Lloyd's k-means, FIXED unrolled rounds with a deterministic
    codebook seed (vectors with id % init_modulus == 0 — k-means++ would
    need an order-dependent sampler; the fixed seed keeps every round
    SQL-replicable). -> (assignments(vec_id, cid, dist), centroids(cid,
    cvec)) after ``rounds`` E/M pairs.

    Per round: E-step is the broadcast argmin above; M-step re-estimates
    per-dim means via ONE posexplode + (cid, dim) aggregate + array
    rebuild — shuffles bounded by |V|·dim rows keyed on small keys.
    Empty clusters drop (standard Lloyd behavior).
    """
    cents = embs.where(F.col(id_col) % init_modulus == 0).select(
        F.col(id_col).alias("cid"),
        F.transform(F.col(vec_col), lambda v: v.cast("double")).alias("cvec"),
    )
    assign = None
    for _ in range(rounds):
        assign = kmeans_assign(embs, cents, id_col, vec_col)
        dims = (
            embs.join(assign.select(id_col, "cid"), id_col)
            .select(
                "cid",
                F.posexplode(
                    F.transform(F.col(vec_col), lambda v: v.cast("double"))
                ).alias("dim", "val"),
            )
            .groupBy("cid", "dim")
            .agg(F.avg("val").alias("m"))
        )
        cents = dims.groupBy("cid").agg(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(F.col("dim").alias("d"), F.col("m").alias("v"))
                    )
                ),
                lambda s: s["v"],
            ).alias("cvec")
        )
    return kmeans_assign(embs, cents, id_col, vec_col), cents
