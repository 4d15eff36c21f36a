"""Storage seam: parquet backend round-trips through CheckpointManager;
iceberg:// URL routing fails fast without a configured catalog."""

import pytest
from pyspark.sql import functions as F

from linkgraph import storage
from linkgraph.checkpoint import CheckpointManager


def test_parquet_store_roundtrip(spark, tmp_path):
    mgr = CheckpointManager(spark, str(tmp_path / "ckpt"), "run-t")
    df = spark.range(10).select(
        F.col("id"), (F.col("id") * 2.0).alias("rank"), F.lit(0).alias("superstep")
    )
    reread = mgr.write_state(df, "pagerank", 0, l1_delta=0.5)
    assert reread.count() == 10
    assert mgr.latest_complete("pagerank") == 0
    got = mgr.read_state("pagerank", 0)
    assert {r["id"]: r["rank"] for r in got.collect()} == {
        i: i * 2.0 for i in range(10)
    }
    m = mgr.manifest()
    assert m.where(F.col("completed")).count() >= 1


def test_for_url_routing(spark, tmp_path):
    st = storage.for_url(spark, str(tmp_path / "p"))
    assert isinstance(st, storage.ParquetStateStore)
    with pytest.raises(RuntimeError, match="catalog 'nosuch' is not configured"):
        storage.for_url(spark, "iceberg://nosuch.ns")


def test_explicit_store_injection(spark, tmp_path):
    st = storage.ParquetStateStore(str(tmp_path / "x"))
    mgr = CheckpointManager(spark, str(tmp_path / "x"), "run-i", store=st)
    assert mgr.store is st
