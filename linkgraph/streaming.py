"""Structured Streaming ingestion — incremental link extraction.

The batch engine's page->links->edges pipeline, re-expressed as a stream:
``readStream`` over an append-only pages table (the Common-Crawl drop
folder / Iceberg snapshot stream at cluster scale), the SAME vectorized
extraction UDF (linkgraph.extract — one code path for batch and stream),
watermarked event-time windows for late crawl timestamps, and a
``writeStream`` sink in append mode. ``Trigger.AvailableNow`` turns the
same query into an incremental batch (used by tests and the oracle query:
stream output == batch output, row for row).

Scale notes: stateless extraction scales embarrassingly (one Arrow batch
per micro-batch partition); the windowed rate aggregation keeps state
bounded by the watermark (late rows beyond it are dropped, state evicted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .extract import extract_links_udf

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary"


def stream_pages(
    spark: SparkSession, path: str, schema: str = PAGES_SCHEMA
) -> DataFrame:
    """readStream over an append-only parquet pages directory."""
    return spark.readStream.schema(schema).parquet(path)


def stream_extract_links(pages: DataFrame) -> DataFrame:
    """pages stream -> (src_url, pos, dst_url) stream (same UDF as batch)."""
    return pages.select(
        F.col("url").alias("src_url"),
        *( [F.col("warc_ts")] if "warc_ts" in pages.columns else [] ),
        F.posexplode(extract_links_udf(F.col("html"), F.col("url"))).alias(
            "pos", "dst_url"
        ),
    )


def stream_host_rates(
    links: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked per-window, per-destination-host link counts — the
    skew/rate monitor a crawl pipeline runs continuously."""
    from .quotient import host_of

    return (
        links.withWatermark("warc_ts", watermark)
        .groupBy(
            F.window("warc_ts", window).alias("w"),
            host_of(F.col("dst_url")).alias("dst_host"),
        )
        .agg(F.count("*").alias("n_links"))
        .select(
            F.col("w.start").alias("window_start"), "dst_host", "n_links"
        )
    )


def stream_first_seen(links: DataFrame, key_col: str = "dst_url") -> DataFrame:
    """First-seen dedup across micro-batches — a CUSTOM STATEFUL operator
    (``applyInPandasWithState``): per-key boolean state; each key is
    emitted exactly once over the life of the stream, no matter how many
    batches or occurrences carry it. The crawl-frontier primitive ("have
    we seen this url before?") that built-in stateless ops can't express
    incrementally; state size = one flag per distinct key, the streaming
    analogue of dedup_exact."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def emit_first(key, pdfs, state):
        for _ in pdfs:
            pass  # drain the batch iterator; occurrences beyond the first are dropped
        if not state.exists:
            state.update((True,))
            yield pd.DataFrame({key_col: [key[0]]})

    return links.groupBy(key_col).applyInPandasWithState(
        emit_first,
        f"{key_col} string",
        "seen boolean",
        "append",
        GroupStateTimeout.NoTimeout,
    )


def stream_sessions(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """CLOSED-session emission over an event stream — the second custom
    stateful operator (``applyInPandasWithState``): per-user state is the
    one OPEN session (start, last, count); a batch's events merge into it
    in (ts, event_id) order, and every session that a later event proves
    finished (next event > ``gap_minutes`` after its end) is emitted.
    The open tail stays in state across micro-batches and is never
    emitted — so the stream's output is exactly the batch sessionization
    MINUS each user's final session, which is what the SQL oracle
    computes (a stream cannot know the last session ended).

    State is 3 int64s per active user — the bounded-state analogue of
    events_sessions; timestamps ride as epoch micros in state (portable,
    no tz ambiguity). Within a batch the merge is vectorized (numpy gap
    split); cross-batch ordering follows arrival, the standard
    at-the-watermark simplification.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def emit_closed(key, pdfs, state):
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            return
        rows = pd.concat(chunks, ignore_index=True).sort_values(
            [ts_col, id_col]
        )
        ts_us = rows[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        bounds = np.where(np.diff(ts_us) > gap_us)[0] + 1
        groups = np.split(ts_us, bounds)
        sessions = []
        if state.exists:
            sessions.append(tuple(state.get))
        sessions += [(int(g[0]), int(g[-1]), len(g)) for g in groups]
        merged = [sessions[0]]
        for s in sessions[1:]:
            p = merged[-1]
            if s[0] - p[1] <= gap_us:
                merged[-1] = (p[0], max(p[1], s[1]), p[2] + s[2])
            else:
                merged.append(s)
        closed, open_ = merged[:-1], merged[-1]
        state.update(open_)
        if closed:
            yield pd.DataFrame(
                {
                    user_col: [key[0]] * len(closed),
                    "session_start": pd.to_datetime(
                        [c[0] for c in closed], unit="us"
                    ),
                    "session_end": pd.to_datetime(
                        [c[1] for c in closed], unit="us"
                    ),
                    "n_events": [c[2] for c in closed],
                }
            )

    return events.groupBy(user_col).applyInPandasWithState(
        emit_closed,
        f"{user_col} long, session_start timestamp, "
        "session_end timestamp, n_events long",
        "start_us long, last_us long, n long",
        "append",
        GroupStateTimeout.NoTimeout,
    )


def run_into_iceberg(
    stream_df: DataFrame,
    table_location: str,
    checkpoint_path: str,
    timeout_sec: int = 300,
    upsert_keys: "list[str] | None" = None,
) -> "IcebergLiteTable":
    """Stream sink into a jar-free Iceberg table: each micro-batch commits
    one append SNAPSHOT (``foreachBatch`` -> ``IcebergLiteTable.append``),
    so downstream consumers get the changelog for free —
    ``scan_added(snapshot_id)`` is exactly one micro-batch, and a periodic
    ``compact()`` heals the small-files sprawl the commit cadence creates.

    ``upsert_keys`` switches the sink to CDC UPSERT semantics (a
    recrawl's latest page version wins): each batch first commits a v2
    EQUALITY-delete of its key tuples (``delete_where_eq`` — no data
    file is read), then appends the batch rows; the strictly-older
    sequence rule guarantees the freshly appended rows survive their own
    batch's delete. Idempotent under replay: the batch-id stamp rides
    the append, and a crash between the two commits just re-deletes the
    same keys (a no-op on the final state) before the append lands.

    Exactly-once story: Structured Streaming's checkpoint makes batch
    replays carry the same ``batchId``; we stamp it into the snapshot
    summary and skip batches already committed (the Iceberg snapshot is
    the sink-side transaction log, same recipe the real Iceberg sink
    uses). Drains with Trigger.AvailableNow, like run_available_now.
    """
    from .iceberg_lite import IcebergLiteTable

    state: dict[str, IcebergLiteTable] = {}

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        tbl = state.get("t")
        if tbl is None:
            if IcebergLiteTable.exists(table_location):
                tbl = IcebergLiteTable.load(table_location)
            else:
                tbl = IcebergLiteTable.create(table_location, batch_df.schema)
            state["t"] = tbl
        done = {
            s["summary"].get("streaming-batch-id")
            for s in tbl.snapshots()
        }
        if str(batch_id) in done:
            return  # replayed batch: already a committed snapshot
        if upsert_keys:
            tbl.delete_where_eq(
                batch_df.sparkSession, batch_df.select(*upsert_keys))
        tbl.append(batch_df, summary={"streaming-batch-id": str(batch_id)})

    q = (
        stream_df.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:
        q.stop()
        raise TimeoutError(f"stream did not drain within {timeout_sec}s")
    return IcebergLiteTable.load(table_location)


def run_available_now(
    stream_df: DataFrame, out_path: str, checkpoint_path: str, timeout_sec: int = 300
) -> None:
    """Drain everything currently available into a parquet sink and stop
    (incremental-batch mode; exactly-once via the checkpoint dir)."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:
        q.stop()
        raise TimeoutError(f"stream did not drain within {timeout_sec}s")
