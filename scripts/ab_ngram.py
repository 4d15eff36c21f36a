"""Isolated dedup_ngram timing, replicating bench.py's exact context:
shared shingle scan persisted, minhash consumes it first (warm), then
ngram_jaccard_pairs timed. N_ROUNDS alternating passes, report all + min."""
import sys, time
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
from linkgraph.session import get_spark
from linkgraph import caching, dedup

SF = __import__("os").environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("ab-ngram", cores=32, shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(f"{SF}/documents.parquet")

walls = []
for rnd in range(3):
    shingles = dedup.shingle_table(docs, 3).persist()
    dedup.minhash_dedup_pairs(docs, num_hashes=8, rows_per_band=2,
                              verify_threshold=0.5, shingles=shingles).count()
    t0 = time.perf_counter()
    n = dedup.ngram_jaccard_pairs(docs, threshold=0.05, shingles=shingles,
                                  log_drops=False).count()
    w = time.perf_counter() - t0
    walls.append(round(w, 3))
    print(f"round {rnd}: ngram {w:.3f}s ({n} pairs)", flush=True)
    caching.release_caches()
    shingles.unpersist()
print("WALLS", walls, "MIN", min(walls))
spark.stop()
