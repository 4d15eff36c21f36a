"""Per-round join-side strategy for iterative flat operators.

Every flat BSP operator joins a LARGE static side (the symmetric edge
table, ~2|E| rows) against a small per-round vertex-state side (labels,
distances, undecided sets — at most |V| rows). The guide's §3.1 order of
preference applies per round:

- when the state side FITS (row count under a configurable bound), a
  broadcast hash join moves the O(|V|) state instead of shuffling the
  O(|E|) edge side — the edge table is then never exchanged at all, and
  the round's only shuffle is the map-side-combined vote aggregation;
- when it does not fit (web-scale |V|), the shuffle_hash hint keeps the
  historical behavior: hash join instead of a sort-merge that would
  re-sort the 2|E| rows every round (the round-3 labelprop finding).

The decision needs the state-side cardinality, which iterative callers
know for free: per-round state is bounded by |V|, and |V| is one count
of the (usually cached) vertex table, paid once per operator call.

``LINKGRAPH_BCAST_MAX_ROWS`` bounds the broadcast side (default 2M rows
≈ tens of MB built — far under the 8 GB / 512M-row broadcast cap and a
comfortable executor-memory footprint; raise it on fat-memory clusters,
lower it for very wide state rows).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F


def max_broadcast_rows() -> int:
    return int(os.environ.get("LINKGRAPH_BCAST_MAX_ROWS", "2000000"))


def fits_broadcast(n_rows: int | None) -> bool:
    """True when a per-round state side of ``n_rows`` should broadcast."""
    return n_rows is not None and n_rows <= max_broadcast_rows()


def small_side(df: DataFrame, n_rows: int | None) -> DataFrame:
    """Tag the per-round state side of a big-static x small-state join.

    ``n_rows`` is an upper bound on the side's cardinality (|V| for
    vertex state), or None when unknown — unknown keeps the shuffle-hash
    path, never a silent broadcast of something unbounded.
    """
    if fits_broadcast(n_rows):
        return F.broadcast(df)
    return df.hint("shuffle_hash")
