"""Physical-plan audit for the headline queries -> BENCH/PLANS.md.

For each audited query: the formatted Catalyst plan plus a mechanical
checklist — did filters/column pruning reach the parquet scan
(PushedFilters / ReadSchema), is the hot path inside WholeStageCodegen,
how many exchanges (shuffles) does the plan carry, and is the small side
broadcast. The point is the discipline the build rules demand: iterate
until the plan is the one you'd want at 100x, not the first one that
passed.
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from linkgraph.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(plan: str) -> list[str]:
    notes = []
    n_ex = len(re.findall(r"\bExchange\b", plan))
    notes.append(f"exchanges: {n_ex}")
    ids = set(re.findall(r"codegen id : (\d+)", plan))
    notes.append(f"WholeStageCodegen spans: {len(ids)}")
    if "PushedFilters: [" in plan:
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        non_empty = [p for p in pushed if p.strip()]
        notes.append(f"scans with pushed filters: {len(non_empty)}/{len(pushed)}")
    reads = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    if reads:
        widths = [len(r.split(",")) for r in reads if r]
        notes.append(f"scan column widths: {widths} (pruned, not select-*)")
    if "BroadcastHashJoin" in plan:
        notes.append(
            f"broadcast joins: {len(re.findall(r'BroadcastHashJoin', plan))}"
        )
    if "ShuffledHashJoin" in plan:
        notes.append(
            f"shuffled-hash joins (no per-superstep sort): "
            f"{len(re.findall(r'ShuffledHashJoin', plan))}"
        )
    if "SortMergeJoin" in plan:
        notes.append(f"sort-merge joins: {len(re.findall(r'SortMergeJoin', plan))}")
    return notes


def _asof_plan(spark, sf_dir):
    from pyspark.sql import functions as F

    from linkgraph.asof import asof_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pur = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    sig = ev.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("sig_id"), "user_id", "ts"
    )
    return asof_join(pur, sig, on="user_id", ts_col="ts", right_cols=["sig_id"])


def _iceberg_plan(spark, docs):
    """Latest-snapshot scan of a jar-free Iceberg table: the file list
    comes from manifest metadata, but filter pushdown and column pruning
    must still show up at the underlying parquet scan node."""
    import tempfile

    from linkgraph.iceberg_lite import IcebergLiteTable

    # tmp dir outlives the lazy df (the audit explains within this process)
    loc = tempfile.mkdtemp(prefix="lg-plan-ice-") + "/documents"
    t = IcebergLiteTable.create(loc, docs.schema)
    t.append(docs)
    return (t.scan(spark).where(F.col("lang") == "en")
            .select("doc_id", "n_chars"))


def _range_join_plan(spark):
    from pyspark.sql import functions as F

    from linkgraph.rangejoin import range_join

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    pur = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clk = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    return range_join(
        pur, clk, on=["user_id"], left_ts="ts", right_ts="ts",
        lower_s=-3600, upper_s=0,
    )


def _nb_plan(spark, docs):
    from linkgraph.classify import nb_classify, nb_model, train_split_coin

    coin = train_split_coin()
    cond, stats = nb_model(docs.where(coin < "cccccc"), label_col="lang")
    return nb_classify(docs.where(coin >= "cccccc"), cond, stats)


def _louvain_w_plan(spark, edges, verts):
    """Phase-2 plan: one local-move round over the weighted community
    quotient (the coarse graph one Louvain level produces)."""
    from linkgraph.community import (
        community_quotient,
        louvain_communities,
        louvain_move_round_weighted,
    )

    l1 = louvain_communities(spark, edges, verts, rounds=1)
    wq = community_quotient(edges, l1)
    comms = wq.select(F.col("u").alias("id")).unionByName(
        wq.select(F.col("v").alias("id"))
    ).distinct()
    return louvain_move_round_weighted(
        spark, wq, comms.select("id", F.col("id").alias("label"))
    )


def _triangles_blocked(spark, edges, verts):
    """Blocked-path count plan: the store build is out-of-band (one-time
    compaction, like the PageRank store); the audited plan is the count
    itself — mapInPandas over the block work frame + one aggregation."""
    from linkgraph.triangles_csr import build_tri_store, triangle_counts_blocked

    ts = build_tri_store(spark, edges, n_blocks=8)
    return triangle_counts_blocked(spark, ts, verts)


def main() -> None:
    spark = get_spark("plan-audit", cores=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    # static plan inspection: AQE re-plans at runtime and hides codegen
    # annotations in the pre-execution formatted plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    from linkgraph import dedup, simsearch, textops, tpcgraph
    from linkgraph.extract import extract_anchors_udf, extract_links_udf
    from linkgraph.quotient import quotient_edges
    from linkgraph.triangles import triangle_counts

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    edges = tpcgraph.order_edges(spark, SF_DIR)
    verts = tpcgraph.vertices_of(edges)

    targets = {
        "scan pruning + pushdown (documents filter/project)": docs.where(
            F.col("lang") == "en"
        ).select("doc_id", "n_chars"),
        "extraction (vectorized pandas UDF over binary html)": docs.select(
            F.explode(
                extract_links_udf(
                    F.encode("text", "UTF-8"),
                    F.concat(F.lit("https://x.example/"), F.col("doc_id")),
                )
            )
        ),
        "text quality (pure JVM expressions)": textops.quality(docs),
        "quotient graph (two joins + distinct)": quotient_edges(
            edges, verts.select("id", F.pmod(F.col("id"), F.lit(97)).alias("key"))
        ),
        "triangles (degree-ordered oriented wedge join)": triangle_counts(
            spark, edges, verts
        ),
        "triangles blocked (one map stage over oriented-CSR sidecars + "
        "O(touched) count agg)": _triangles_blocked(spark, edges, verts),
        "exact dedup (single groupBy)": dedup.exact_groups(docs),
        "ngram shingles (zip_with, no per-element slice)": dedup.shingle_table(
            docs
        ),
        "ngram jaccard w/ df-cap (posting lists: one shingle exchange, "
        "length-filter guard, ordered-pair double explode)":
            dedup.ngram_jaccard_pairs(docs, threshold=0.5, log_drops=False),
        "minhash verify (array_intersect per candidate pair)":
            dedup.minhash_dedup_pairs(docs, verify_threshold=0.5),
        "ANN top-k (multi-table sign-LSH, Hamming-1 probes, broadcast queries)":
            simsearch.topk_lsh(
                embs, simsearch.queries_from(embs, 50), k=5,
                n_tables=10, bits_per_table=6, probe_flips=1,
            ),
        "anchor-enriched extraction (list<struct> pandas UDF)": docs.select(
            F.posexplode(
                extract_anchors_udf(
                    F.encode("text", "UTF-8"),
                    F.concat(F.lit("https://x.example/"), F.col("doc_id")),
                )
            )
        ),
        "repetition signals (map-only array lambdas, zero shuffle)":
            textops.repetition(docs),
        "C4 line cleaning (map-only array lambdas, zero shuffle)":
            textops.c4_clean(docs),
        "source curation report (one projection + fp window + source agg)":
            __import__("linkgraph.curation", fromlist=["source_report"])
            .source_report(docs),
        "label centroids (64 codegen aggregates, one exchange, no explode)":
            simsearch.label_centroids(embs, dim=64),
        "vocabulary (one explode + one token groupBy)":
            textops.vocabulary(docs, min_count=5),
        "PII redaction (staged regex, map-only, zero shuffle)":
            textops.pii_redact(docs),
        "unigram LM score (token-keyed rejoin + broadcast normalizer)":
            textops.lm_score(docs),
        "sequence packing (one window per stream key, streaming frame)":
            __import__("linkgraph.sampling", fromlist=["pack_chunks"])
            .pack_chunks(docs),
        "random walks (per-step frontier join + min_by, no driver loop)":
            __import__("linkgraph.walks", fromlist=["random_walks"])
            .random_walks(
                edges, verts.select("id").limit(64), steps=3
            ),
        "source-line link map (decode/posexplode/regexp, one codegen stage)":
            __import__("linkgraph.extract", fromlist=["source_line_links"])
            .source_line_links(
                docs.select("doc_id", F.encode("text", "UTF-8").alias("html"))
            ),
        "as-of join (merge shape: one union + one window, no range blowup)":
            _asof_plan(spark, SF_DIR),
        "repeated spans (one shingle scan + one count agg)":
            dedup.repeated_spans(docs, width=12),
        "collocations (pair agg thresholded before unigram joins)":
            textops.collocations(docs, min_count=5),
        "adaptive quality filter (score projection + broadcast thresholds)":
            __import__("linkgraph.curation", fromlist=["adaptive_quality_filter"])
            .adaptive_quality_filter(docs, key_col="lang"),
        "iceberg scan (metadata-resolved file list; pushdown + pruning "
        "still reach the parquet scan)": _iceberg_plan(spark, docs),
        "winnowing fingerprints (positional k-grams + ONE window min, "
        "no self-join)": dedup.winnow_fingerprints(docs),
        "ordered funnel (map-side type filter + one groupBy + JVM fold)":
            __import__("linkgraph.events", fromlist=["funnel"]).funnel(
                spark.read.parquet(f"{SF_DIR}/events.parquet"),
                ["view", "click", "signup", "purchase"],
            ),
        "weighted sample (A-Res: hash projection + per-stratum window "
        "top-k)": __import__(
            "linkgraph.sampling", fromlist=["weighted_sample"]
        ).weighted_sample(docs, k=20, strata_col="lang"),
        "range join (bucketed equi-join, NOT BroadcastNestedLoop)":
            _range_join_plan(spark),
        "louvain local move (shuffle_hash vote join + bounded-key aggs + "
        "max_by argmax, no window sort)": __import__(
            "linkgraph.community", fromlist=["louvain_move_round"]
        ).louvain_move_round(
            spark, edges,
            verts.select("id", F.col("id").alias("label")),
        ),
        "louvain weighted phase-2 round (coarse community graph: "
        "weighted vote join + same argmax)": _louvain_w_plan(spark, edges,
                                                             verts),
        "luby MIS round (min-priority vote join + anti-join "
        "elimination)": __import__(
            "linkgraph.mis", fromlist=["maximal_independent_set"]
        ).maximal_independent_set(spark, edges, verts, rounds=1),
        "k-means E-step (broadcast codebook + struct-min argmin)":
            __import__(
                "linkgraph.simsearch", fromlist=["kmeans_assign"]
            ).kmeans_assign(
                embs,
                embs.where(F.col("vec_id") % 64 == 0).select(
                    F.col("vec_id").alias("cid"),
                    F.col("embedding").alias("cvec"),
                ),
            ),
        "rare-token suppression (one positional explode + token-keyed "
        "df join + ordered rebuild)": __import__(
            "linkgraph.textops", fromlist=["rare_token_mask"]
        ).rare_token_mask(docs),
        "NB classifier scoring (token-keyed join, broadcast class stats)":
            _nb_plan(spark, docs),
        "SALSA round (degree-normalized join + sum supersteps)":
            __import__("linkgraph.hits", fromlist=["salsa"]).salsa(
                spark, edges, verts, iterations=1
            ),
        "PCA covariance (one mapInPandas Gram pass + tiny combine)":
            __import__("linkgraph.pca", fromlist=["pca_cov"]).pca_cov(
                embs, dim=64
            ),
        "weighted SSSP round (frontier join + union + per-vertex min, "
        "unrolled lazy prefix)": __import__(
            "linkgraph.sssp", fromlist=["sssp_distances"]
        ).sssp_distances(
            spark,
            edges.select(
                "src", "dst",
                (F.pmod("src", F.lit(97)) + 1).cast("double").alias("w"),
            ),
            verts.select("id").where(F.pmod("id", F.lit(100)) == 0),
            max_hops=2,
            truncate_rounds=False,
        ),
        "Luby MIS round (one neighbor-min agg + two anti-joins, bounded "
        "prefix)": __import__(
            "linkgraph.mis", fromlist=["maximal_independent_set"]
        ).maximal_independent_set(spark, edges, verts, rounds=1),
        "Louvain local move (label-keyed aggs + per-vertex max_by argmax)":
            __import__(
                "linkgraph.community", fromlist=["louvain_communities"]
            ).louvain_communities(
                spark, edges, verts, rounds=1, materialize_each=False
            ),
    }

    out = ["# BENCH/PLANS.md — physical-plan audit (headline queries)", ""]
    out.append(
        f"AQE disabled for static inspection (it is ON in production "
        "sessions and re-plans at runtime), sf dir `{SF_DIR}`. Graph plans "
        "include the edge-table DERIVATION from the raw tables (joins that "
        "a production run materializes once, not per query). Generated by "
        "`python scripts/explain_plans.py`.\n"
    )
    for name, df in targets.items():
        plan = formatted_plan(df)
        out.append(f"## {name}\n")
        for n in audit(plan):
            out.append(f"- {n}")
        out.append("")
        out.append("```\n" + plan.strip()[:4000] + "\n```\n")
    (REPO / "BENCH" / "PLANS.md").write_text("\n".join(out))
    print(f"wrote BENCH/PLANS.md ({len(targets)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
