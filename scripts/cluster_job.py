"""Bench job submitted to the standalone cluster via spark-submit --py-files.

Prints one JSON line: per-superstep PageRank seconds + extraction timing.
Inputs via argv: n_vertices avg_deg supersteps n_pages.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession, functions as F

from linkgraph.extract import extract_links_udf
from linkgraph.pagerank import pagerank
from linkgraph.synthgraph import synth_edges, synth_vertices


def main() -> None:
    n_vertices, avg_deg, supersteps, n_pages = (int(x) for x in sys.argv[1:5])
    spark = SparkSession.builder.appName("linkgraph-cluster-bench").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    edges = synth_edges(spark, n_vertices, avg_deg, num_partitions=parts).persist()
    n_edges = edges.count()
    verts = synth_vertices(spark, n_vertices, num_partitions=parts)
    res = pagerank(spark, edges, verts, tol=0.0, max_iter=supersteps)
    step_secs = [round(s.seconds, 3) for s in res.supersteps]
    # steady state: median of the last half (cache/JIT/python-worker warmup
    # dominates the first supersteps)
    tail = sorted(step_secs[len(step_secs) // 2:])
    pr_sec = tail[len(tail) // 2]

    pages = spark.range(0, n_pages, numPartitions=parts).select(
        F.concat(F.lit("https://bench.example/p"), F.col("id")).alias("url"),
        F.encode(
            F.concat(
                F.lit("<html><body><p>bench page body text</p>"),
                F.aggregate(
                    F.transform(
                        F.sequence(F.lit(0), F.pmod(F.col("id"), F.lit(12))),
                        lambda j: F.concat(
                            F.lit('<a href="https://bench.example/p'),
                            F.pmod(F.col("id") * 31 + j * 7, F.lit(n_pages)),
                            F.lit('#s">x</a>'),
                        ),
                    ),
                    F.lit(""),
                    lambda acc, x: F.concat(acc, x),
                ),
                F.lit("</body></html>"),
            ),
            "UTF-8",
        ).alias("html"),
    ).persist()
    pages.count()

    def run_extract():
        return pages.select(
            F.explode(extract_links_udf(F.col("html"), F.col("url")))
        ).count()

    run_extract()  # warm python workers
    t0 = time.perf_counter()
    n_links = run_extract()
    ex_sec = time.perf_counter() - t0

    print(
        "RESULT "
        + json.dumps(
            {
                "n_edges": n_edges,
                "pagerank_steps": step_secs,
                "pagerank_sec_per_superstep": round(pr_sec, 3),
                "pagerank_edges_per_sec": round(n_edges / pr_sec, 1),
                "extract_sec": round(ex_sec, 3),
                "extract_pages_per_sec": round(n_pages / ex_sec, 1),
                "n_links": n_links,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
