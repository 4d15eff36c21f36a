"""Iceberg-backed state store — executes for real when a runtime jar exists.

The north rule mandates Iceberg-backed checkpointing (BASELINE.json:6,16).
The engine's storage seam (linkgraph.storage.IcebergStateStore) is backend
config, not code; what is missing in THIS sandbox is the
iceberg-spark-runtime jar itself:

- `find / -name '*iceberg*'` over the whole container: no jar anywhere
  (pyspark's bundled jars/ has no iceberg/delta/hudi artifacts);
- the sandbox has no network egress and package installation is
  prohibited, so the jar cannot be fetched or vendored;
- attempt log + method in BENCH/BASELINE.md / VERDICT round-2 item #5.

Round 3 closes the executed-coverage gap differently: the public Iceberg
v1 table spec is implemented directly in pure Python
(linkgraph/iceberg_lite.py — snapshots, avro manifests, partition
overwrite, time travel), so checkpointing/scan DO execute through real
Iceberg metadata here with no jar (tests/test_iceberg_lite.py). This
file keeps covering the jar-backed catalog-session route only.

This test therefore self-skips with that reason unless a jar is provided
via $LINKGRAPH_ICEBERG_JAR (or is already on the session classpath), in
which case it runs a REAL end-to-end: catalog session -> vertex-state
write (overwritePartitions) -> read-back -> idempotent superstep rewrite
-> manifest append. Drop a jar in and the mandate's last gap closes with
zero engine changes.
"""

from __future__ import annotations

import glob
import os

import pytest


def _find_iceberg_jar() -> str | None:
    env = os.environ.get("LINKGRAPH_ICEBERG_JAR")
    if env and os.path.exists(env):
        return env
    import pyspark

    jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    hits = glob.glob(os.path.join(jars, "*iceberg-spark-runtime*.jar"))
    return hits[0] if hits else None


JAR = _find_iceberg_jar()


@pytest.mark.skipif(
    JAR is None,
    reason=(
        "no iceberg-spark-runtime jar in this sandbox (searched pyspark/jars "
        "and $LINKGRAPH_ICEBERG_JAR; container-wide find has zero iceberg "
        "artifacts; no network egress to fetch one) — IcebergStateStore "
        "fails fast with catalog instructions instead (test_storage.py)"
    ),
)
def test_iceberg_state_roundtrip(tmp_path):
    """Write vertex state through an actual Iceberg catalog and read it
    back; a superstep re-write must replace exactly its own partition."""
    from pyspark.sql import SparkSession

    from linkgraph.storage import for_url

    warehouse = str(tmp_path / "warehouse")
    spark = (
        SparkSession.builder.appName("iceberg-it")
        .master("local[4]")
        .config("spark.jars", JAR)
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
        .config("spark.sql.catalog.lake", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.lake.type", "hadoop")
        .config("spark.sql.catalog.lake.warehouse", warehouse)
        .getOrCreate()
    )
    try:
        store = for_url(spark, "iceberg://lake.linkgraph")
        state = spark.createDataFrame(
            [(i, float(i) / 10) for i in range(100)], "id long, rank double"
        )
        back = store.write_state(state, "run1", "pagerank", 0)
        assert back.count() == 100

        # idempotent superstep rewrite: same key replaces, not appends
        store.write_state(state, "run1", "pagerank", 0)
        assert store.read_state(spark, "run1", "pagerank", 0).count() == 100

        # distinct superstep is a separate partition
        store.write_state(state.limit(10), "run1", "pagerank", 1)
        assert store.read_state(spark, "run1", "pagerank", 1).count() == 10
        assert store.read_state(spark, "run1", "pagerank", 0).count() == 100

        manifest = spark.createDataFrame(
            [("run1", "pagerank", 0, 100)],
            "run_id string, algo string, superstep int, rows long",
        )
        store.append_manifest(manifest)
        assert store.read_manifest(spark).count() >= 1
    finally:
        spark.stop()
