"""Deterministic corpus sampling / per-source caps — training-data curation.

A 100 TB crawl is never trained on wholesale: pipelines downsample by
rate, upweight/downweight by quality, and cap any single source so no
domain dominates the mixture. Both operators here are DETERMINISTIC
(md5-hash uniforms / explicit priority orderings), so runs are
reproducible, resumable, and DuckDB-oracle-checkable — never `rand()`:

- ``hash_sample``: Bernoulli(p) via the lexicographic md5 prefix — a
  fixed-length lowercase-hex prefix compares exactly like the integer it
  encodes, so ``substr(md5(id||seed), 1, k) < hex(floor(p * 16^k))``
  IS a uniform coin both engines evaluate identically. Changing ``seed``
  draws an independent sample; the rate is exact to 16^-k.
- ``cap_per_source``: keep the top ``cap`` documents per source under an
  explicit priority (longest-first, id tie-break) — one window, one
  shuffle by source; the skew knob for dominant domains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def hash_threshold(rate: float, k: int = 6) -> str:
    """Lowercase-hex threshold h with P[md5-prefix < h] == rate (±16^-k)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return format(min(int(rate * 16 ** k), 16 ** k - 1), f"0{k}x")


def hash_sample(
    docs: DataFrame, rate: float, seed: str = "s1", id_col: str = "doc_id",
    k: int = 6,
) -> DataFrame:
    """Deterministic Bernoulli(rate) subsample keyed on (id, seed)."""
    coin = F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))), 1, k
    )
    return docs.where(coin < F.lit(hash_threshold(rate, k)))


def cap_per_source(
    docs: DataFrame,
    cap: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    length_col: str = "n_chars",
) -> DataFrame:
    """Keep at most ``cap`` docs per source; priority = longest first,
    min id tie-break. Adds ``source_rank`` (1-based priority within the
    source) so callers can audit what the cap dropped."""
    w = Window.partitionBy(source_col).orderBy(
        F.desc(length_col), F.asc(id_col)
    )
    return (
        docs.withColumn("source_rank", F.row_number().over(w))
        .where(F.col("source_rank") <= cap)
    )


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    key_col: str = "lang",
    seed: str = "s1",
    id_col: str = "doc_id",
    k: int = 6,
) -> DataFrame:
    """Per-stratum deterministic Bernoulli sampling — ``sampleBy`` with a
    reproducible coin. Training mixtures are never uniform over a crawl:
    each language / source stratum gets its own rate (e.g. upsample
    low-resource languages, downsample English boilerplate). Keys absent
    from ``fractions`` are dropped (rate 0), matching ``sampleBy``.

    The coin is the same md5-prefix uniform as ``hash_sample`` keyed on
    (id, seed) only — NOT the stratum — so re-weighting a stratum later
    keeps every previously-kept doc whose rate did not fall (nested
    samples: rate' >= rate keeps a superset). Pure projection + filter
    with a broadcast-free literal map lookup: zero shuffle at any scale.
    """
    pairs: list = []
    for key in sorted(fractions):
        pairs += [F.lit(key), F.lit(hash_threshold(fractions[key], k))]
    thr = F.create_map(*pairs)
    coin = F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))), 1, k
    )
    return docs.where(coin < thr[F.col(key_col)])

def mixture_weights(
    docs: DataFrame, alpha: float = 0.7, key_col: str = "source"
) -> DataFrame:
    """-> (source, n_docs, weight) — temperature-based mixture reweighting
    (multilingual-LM style: sampling weight proportional to count^alpha,
    alpha<1 upweights low-resource sources). The weights table is the
    input to a downstream stratified_sample at rate weight*budget/n_docs.

    One count aggregation over the corpus; the normalizer rides a
    broadcast crossJoin of the 1-row sum (no driver action). Output is
    one row per source — trivially broadcastable at any corpus size.
    """
    counts = docs.groupBy(key_col).agg(F.count("*").alias("n_docs"))
    pw = counts.withColumn(
        "w", F.pow(F.col("n_docs").cast("double"), F.lit(float(alpha)))
    )
    tot = pw.agg(F.sum("w").alias("tw"))
    return pw.crossJoin(F.broadcast(tot)).select(
        key_col,
        F.col("n_docs").cast("long").alias("n_docs"),
        F.round(F.col("w") / F.col("tw"), 6).alias("weight"),
    )


def negative_sampling_weights(
    vertices_deg: DataFrame, alpha: float = 0.75, deg_col: str = "deg"
) -> DataFrame:
    """-> (id, deg, weight) — the word2vec/DeepWalk negative-sampling
    table: draw probability proportional to degree^alpha (0.75 flattens
    the hub head so rare vertices still appear as negatives). Pairs with
    ``random_walks`` output to train graph embeddings.

    One projection + a broadcast 1-row normalizer — the weights column
    rides the existing degree table, no extra aggregation over edges.
    """
    pw = vertices_deg.withColumn(
        "w", F.pow(F.col(deg_col).cast("double"), F.lit(float(alpha)))
    )
    tot = pw.agg(F.sum("w").alias("tw"))
    return pw.crossJoin(F.broadcast(tot)).select(
        "id",
        F.col(deg_col).cast("long").alias("deg"),
        F.round(F.col("w") / F.col("tw"), 9).alias("weight"),
    )


def assign_shards(
    docs: DataFrame, n_shards: int = 16, id_col: str = "doc_id",
    seed: str = "s1",
) -> DataFrame:
    """-> docs + ``shard`` — deterministic output bucketing: shard =
    md5-prefix(id, seed) mod n_shards, the reproducible writer-side
    partitioner (same doc always lands in the same shard across runs, so
    shards can be regenerated independently). Pure projection, zero
    shuffle; the write itself repartitions by ``shard``."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))),
            1, 6,
        ),
        16, 10,
    ).cast("long")
    return docs.withColumn("shard", (h % n_shards).cast("int"))


def shard_balance_report(
    docs: DataFrame, n_shards: int = 16, id_col: str = "doc_id",
    seed: str = "s1",
) -> DataFrame:
    """-> (shard, n_docs, frac) — occupancy per shard under
    ``assign_shards`` (the writer-skew dashboard row)."""
    sharded = assign_shards(docs, n_shards, id_col=id_col, seed=seed)
    counts = sharded.groupBy("shard").agg(F.count("*").alias("n_docs"))
    tot = counts.agg(F.sum("n_docs").alias("t"))
    return counts.crossJoin(F.broadcast(tot)).select(
        F.col("shard").cast("int").alias("shard"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.round(F.col("n_docs") / F.col("t"), 6).alias("frac"),
    )


def source_length_stats(
    docs: DataFrame, key_col: str = "source", len_col: str = "n_chars"
) -> DataFrame:
    """-> (source, n_docs, len_p50, len_p90, len_max) — per-source length
    percentiles (continuous interpolation), the curation dashboard row
    that catches truncated or boilerplate-heavy sources at a glance.

    One aggregation keyed on source. Exact percentiles buffer the group's
    values; at 100 TB swap F.percentile for percentile_approx (t-digest,
    bounded state) — same call shape, documented seam.
    """
    return docs.groupBy(key_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.percentile(len_col, F.lit(0.5)), 6).alias("len_p50"),
        F.round(F.percentile(len_col, F.lit(0.9)), 6).alias("len_p90"),
        F.max(len_col).cast("long").alias("len_max"),
    )


def pack_chunks(
    docs: DataFrame,
    budget: int = 2048,
    key_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (doc_id, <key_col>, n_tokens, chunk_id, chunk_offset) — the
    concat-and-chunk sequence-packing map of LLM training: within each
    stream (``key_col``), documents are concatenated in ``id_col`` order
    and cut every ``budget`` tokens; each doc lands at ``chunk_offset``
    inside ``chunk_id`` (docs may straddle chunk boundaries, exactly like
    the standard packing loader). Deterministic, so shards can be packed
    independently and re-derived.

    One window per stream key — the shuffle is keyed on ``key_col``, and
    the running sum is a streaming frame (no buffering). At 100 TB you
    pack per shard/source, never globally: a global order would serialize
    into one partition, which is why ``key_col`` is required rather than
    optional. Token counts reuse the corpus-wide normalization
    (``textops.tokens_col``) so they agree with ``token_stats``.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    from linkgraph.textops import tokens_col

    n = F.size(tokens_col(F.col(text_col))).cast("long")
    w = Window.partitionBy(key_col).orderBy(F.asc(id_col))
    d = docs.select(F.col(id_col), F.col(key_col), n.alias("n_tokens"))
    before = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("before")
    return d.select(id_col, key_col, "n_tokens", before).select(
        id_col,
        key_col,
        "n_tokens",
        F.floor(F.col("before") / budget).cast("long").alias("chunk_id"),
        (F.col("before") % budget).cast("long").alias("chunk_offset"),
    )

def chunk_fill_report(
    docs: DataFrame,
    budget: int = 2048,
    key_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """-> (source, n_docs, total_tokens, n_chunks, tail_fill, waste_frac)
    — packing efficiency per stream under ``pack_chunks`` semantics:
    every chunk is full except the tail, so waste = unused tail capacity.
    The dashboard row that tells you whether streams are too small for
    the budget (tiny sources -> mostly-empty tail chunks).

    One aggregation keyed on the stream; token counts reuse the corpus
    tokenizer so the report agrees with the pack map exactly.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    from linkgraph.textops import tokens_col

    n = F.size(tokens_col(F.col(text_col))).cast("long")
    agg = docs.groupBy(key_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(n).cast("long").alias("total_tokens"),
    )
    n_chunks = F.ceil(F.col("total_tokens") / budget).cast("long")
    tail = F.col("total_tokens") % budget
    tail_fill = F.when(F.col("total_tokens") == 0, F.lit(0)).otherwise(
        F.when(tail == 0, F.lit(budget)).otherwise(tail)
    )
    return agg.select(
        key_col,
        "n_docs",
        "total_tokens",
        n_chunks.alias("n_chunks"),
        tail_fill.cast("long").alias("tail_fill"),
        F.when(F.col("total_tokens") == 0, F.lit(0.0))
        .otherwise(
            F.round(
                1.0 - F.col("total_tokens") / (n_chunks * F.lit(budget)), 6
            )
        )
        .alias("waste_frac"),
    )


def weighted_sample(
    docs: DataFrame,
    k: int,
    weight_col: str = "n_chars",
    strata_col: str | None = None,
    seed: str = "ws1",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: keep the
    ``k`` items per stratum (or globally) drawn with probability
    proportional to ``weight_col`` — Efraimidis & Spirakis A-Res
    (IPL 2006): each item draws uniform u and is ranked by u^(1/w);
    the top-k by that key is exactly a weighted draw without
    replacement.

    The uniform is the md5-hash integer of (id, seed) scaled to (0, 1),
    so the draw is reproducible and both engines rank identically; the
    ranking key rides ln(u)/w (monotone in u^(1/w), avoids pow). One
    window per stratum — a single shuffle on the stratum key; global
    mode uses one partition only for the FINAL top-k rank, so cap k
    accordingly (per-stratum is the scale path, matching how mixtures
    are drawn per language/source).

    -> input columns + (h60, rk): the 60-bit hash driving the draw and
    the 1-based rank within the stratum.
    """
    assert k >= 1
    h60 = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))),
            1, 15,
        ),
        16, 10,
    ).cast("long")
    # u in (0,1): (h60+1)/(2^60+1); key = ln(u)/w, top-k DESCENDING
    u = (h60 + F.lit(1).cast("double")) / F.lit(float(2**60 + 1))
    key = F.log(u) / F.col(weight_col).cast("double")
    part = (
        Window.partitionBy(strata_col) if strata_col is not None
        else Window.partitionBy()
    )
    w = part.orderBy(key.desc(), F.col(id_col))
    out = (
        docs.where(F.col(weight_col) > 0)
        .withColumn("h60", h60)
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
    )
    return out
