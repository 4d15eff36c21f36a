"""Isolated extract_links timing (round-4 verdict item #8): the committed
bench moved 0.61s (r3) -> 0.91s (r4) with extract.py untouched between
rounds, so the move should be host noise, not a regression. This script
replays bench.py's EXACT extraction timing (same lazy _synth_pages
fixture — synth included in the wall, as in bench — same
posexplode(extract_links_udf) count action) N rounds in ONE session and
reports every wall plus the min: on identical code, a same-session
spread covering the committed [0.61, 0.91] band IS the noise-band
confirmation (cross-session absolute walls are not comparable on this
host; see BENCH/BASELINE.md's host-noise model)."""
import sys
import time

sys.path.insert(0, str(
    __import__("pathlib").Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from linkgraph.extract import extract_links_udf  # noqa: E402
from linkgraph.session import get_spark  # noqa: E402

SF = __import__("os").environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("ab-extract", cores=32, shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(f"{SF}/documents.parquet")
pages = entrymod._synth_pages(docs)  # lazy, like bench.py's pass

walls = []
for rnd in range(6):
    t0 = time.perf_counter()
    n = pages.select(
        F.posexplode(extract_links_udf(F.col("html"), F.col("url")))
    ).count()
    w = time.perf_counter() - t0
    walls.append(round(w, 3))
    print(f"round {rnd}: extract_links {w:.3f}s ({n} links)", flush=True)
print("WALLS", walls, "MIN", min(walls))
spark.stop()
