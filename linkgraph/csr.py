"""Per-partition CSR compaction of the edge table (BASELINE.json:6).

After hash-partitioning edges by ``src``, each partition's adjacency is
compacted into one row of contiguous arrays — ``srcs`` (distinct sources in
sorted order), ``offsets`` (CSR row pointers, len = len(srcs)+1) and
``dsts`` (concatenated sorted out-neighbor lists). This is the storage
layout an executor-resident superstep kernel streams through without
per-edge object overhead; it is built with ``applyInPandas`` (one Arrow
batch per partition group, vectorized numpy inside — no per-row Python,
BASELINE.json:16).

≙ the reference's clustered ordered instruction map (OrderedDict keyed
(line, offset), /root/reference/src/ccm/xdis.py:638-651) — the "physical"
layout its sequential scans rely on, here made explicitly partitioned.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

CSR_SCHEMA = (
    "block int, srcs array<long>, offsets array<long>, dsts array<long>, "
    "n_edges long"
)


def _compact(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["src", "dst"], kind="mergesort")
    srcs_arr = pdf["src"].to_numpy()
    dsts = pdf["dst"].to_numpy()
    srcs, counts = np.unique(srcs_arr, return_counts=True)
    offsets = np.zeros(len(srcs) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    block = int(pdf["block"].iloc[0]) if len(pdf) else 0
    return pd.DataFrame(
        {
            "block": [block],
            "srcs": [srcs.tolist()],
            "offsets": [offsets.tolist()],
            "dsts": [dsts.tolist()],
            "n_edges": [len(dsts)],
        }
    )


def compact_csr(edges: DataFrame, num_blocks: int = 32) -> DataFrame:
    """edges(src,dst) -> one CSR row per hash block of src."""
    return (
        edges.withColumn("block", F.pmod(F.xxhash64("src"), F.lit(num_blocks)).cast("int"))
        .groupBy("block")
        .applyInPandas(_compact, CSR_SCHEMA)
    )


def expand_csr(csr: DataFrame) -> DataFrame:
    """Inverse of compact_csr (round-trip test support): -> edges(src,dst)."""
    per_src = csr.select(
        F.col("srcs"),
        F.col("offsets"),
        F.col("dsts"),
        F.posexplode("srcs").alias("i", "src"),
    ).select(
        "src",
        F.slice(
            "dsts",
            F.element_at("offsets", F.col("i") + 1) + 1,
            F.element_at("offsets", F.col("i") + 2)
            - F.element_at("offsets", F.col("i") + 1),
        ).alias("nbrs"),
    )
    return per_src.select("src", F.explode("nbrs").alias("dst"))
