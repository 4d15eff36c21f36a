"""iceberg_lite: pure-Python Iceberg v1 tables execute for real here.

Complements tests/test_iceberg.py (which still self-skips awaiting a
runtime jar for the catalog-session path): these tests exercise the
spec-level implementation — avro container codec, metadata json /
manifest-list / manifest layout, snapshots, time travel, identity
partition overwrite — with no jar at all.
"""

from __future__ import annotations

import io
import json
import os

import pytest
from pyspark.sql import functions as F, types as T

from linkgraph import avro_lite as avro
from linkgraph.iceberg_lite import (
    IcebergLiteTable, STATUS_ADDED, STATUS_EXISTING, schema_to_iceberg,
    schema_to_spark,
)


# ---------------------------------------------------------------------------
# avro codec


def test_avro_zigzag_longs_roundtrip():
    for v in (0, -1, 1, 63, 64, -64, -65, 2**31, -2**31, 2**63 - 1, -2**63):
        buf = io.BytesIO()
        avro.write_long(buf, v)
        buf.seek(0)
        assert avro.read_long(buf) == v


def test_avro_container_roundtrip_all_types(tmp_path):
    schema = {"type": "record", "name": "e", "fields": [
        {"name": "s", "type": "string"},
        {"name": "n", "type": "long"},
        {"name": "i", "type": "int"},
        {"name": "d", "type": "double"},
        {"name": "bl", "type": "boolean"},
        {"name": "by", "type": "bytes"},
        {"name": "opt", "type": ["null", "long"], "default": None},
        {"name": "arr", "type": {"type": "array", "items": {
            "type": "record", "name": "sub", "fields": [
                {"name": "x", "type": "int"}]}}},
        {"name": "m", "type": {"type": "map", "values": "double"}},
    ]}
    recs = [
        {"s": "héllo☃", "n": -(2**62), "i": -7, "d": 2.5, "bl": True,
         "by": b"\x00\xff", "opt": None, "arr": [{"x": 1}, {"x": -5}],
         "m": {"a": 1.5, "b": -0.25}},
        {"s": "", "n": 0, "i": 0, "d": 0.0, "bl": False, "by": b"",
         "opt": 42, "arr": [], "m": {}},
    ]
    for codec in ("null", "deflate"):
        path = str(tmp_path / f"t-{codec}.avro")
        length = avro.write_container(path, schema, recs, codec=codec,
                                      metadata={"k": b"v"})
        assert length == os.path.getsize(path)
        schema2, meta, out = avro.read_container(path)
        assert out == recs
        assert meta["k"] == b"v"
        assert schema2 == schema


def test_avro_container_framing(tmp_path):
    """File structure is the spec's: magic, metadata map with avro.schema,
    16-byte sync repeated after the block."""
    schema = {"type": "record", "name": "r",
              "fields": [{"name": "x", "type": "long"}]}
    path = str(tmp_path / "f.avro")
    avro.write_container(path, schema, [{"x": 1}])
    raw = open(path, "rb").read()
    assert raw[:4] == b"Obj\x01"
    assert b"avro.schema" in raw and b"avro.codec" in raw
    # sync marker appears twice: after header and after the single block
    schema2, meta, recs = avro.read_container(path)
    assert recs == [{"x": 1}]


# ---------------------------------------------------------------------------
# schema conversion


def test_schema_conversion_roundtrip():
    spark_schema = T.StructType([
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("n", T.LongType(), True),
        T.StructField("score", T.DoubleType(), True),
    ])
    ice = schema_to_iceberg(spark_schema)
    assert [f["id"] for f in ice["fields"]] == [1, 2, 3, 4, 5]
    assert ice["fields"][1]["type"] == "timestamptz"
    assert ice["fields"][0]["required"] is True
    back = schema_to_spark(ice)
    assert back == spark_schema


def test_schema_conversion_rejects_nested():
    nested = T.StructType([T.StructField(
        "a", T.ArrayType(T.LongType()), True)])
    with pytest.raises(TypeError):
        schema_to_iceberg(nested)


# ---------------------------------------------------------------------------
# table lifecycle


@pytest.fixture()
def pages(spark):
    return spark.range(0, 120).select(
        F.concat(F.lit("https://h"), (F.col("id") % 9).cast("string"),
                 F.lit("/p"), F.col("id").cast("string")).alias("url"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("warc_ts"),
        F.encode(F.concat(F.lit("<html>"), F.col("id").cast("string")),
                 "utf-8").alias("html"),
        F.concat(F.lit("text "), F.col("id").cast("string")).alias("text"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"),
    )


def test_create_append_scan(spark, tmp_path, pages):
    loc = str(tmp_path / "pages_tbl")
    t = IcebergLiteTable.create(loc, pages.schema)
    s1 = t.append(pages.filter(F.col("lang") == "en"))
    s2 = t.append(pages.filter(F.col("lang") == "de"))
    t2 = IcebergLiteTable.load(loc)
    assert t2.scan(spark).count() == 120
    # snapshots accumulate; parent chain recorded
    snaps = t2.snapshots()
    assert [s["snapshot-id"] for s in snaps] == [s1, s2]
    assert snaps[1]["parent-snapshot-id"] == s1
    # time travel to the first snapshot
    assert t2.scan(spark, snapshot_id=s1).count() == 40
    # incremental: exactly what s2 added
    inc = t2.scan_added(spark, s2)
    assert inc.count() == 80
    assert inc.select("lang").distinct().collect()[0][0] == "de"
    # as-of-timestamp travel
    ts1 = snaps[0]["timestamp-ms"]
    assert t2.scan(spark, as_of_ms=ts1).count() == 40


def test_metadata_layout_is_spec_shaped(spark, tmp_path, pages):
    """The on-disk layout is HadoopTables + spec v1: version-hint.text,
    vN.metadata.json with required keys, avro manifests with field-ids."""
    loc = str(tmp_path / "tbl")
    t = IcebergLiteTable.create(loc, pages.schema)
    t.append(pages)
    hint = os.path.join(loc, "metadata", "version-hint.text")
    assert open(hint).read().strip() == "2"  # v1 create + v2 append
    meta = json.load(open(os.path.join(loc, "metadata", "v2.metadata.json")))
    for key in ("format-version", "table-uuid", "location", "last-column-id",
                "schema", "partition-specs", "snapshots",
                "current-snapshot-id", "snapshot-log"):
        assert key in meta, key
    assert meta["format-version"] == 1
    snap = meta["snapshots"][0]
    # manifest list: spec field names + ids
    lschema, _, mfs = avro.read_container(snap["manifest-list"])
    ids = {f["name"]: f["field-id"] for f in lschema["fields"]}
    assert ids["manifest_path"] == 500 and ids["manifest_length"] == 501
    assert ids["partition_spec_id"] == 502
    assert ids["added_snapshot_id"] == 503
    assert mfs[0]["manifest_length"] == \
        os.path.getsize(mfs[0]["manifest_path"])
    # manifest file: entry schema ids + key-value metadata
    eschema, emeta, entries = avro.read_container(mfs[0]["manifest_path"])
    eids = {f["name"]: f["field-id"] for f in eschema["fields"]}
    # v2 optional sequence_number (field-id 3) rides along; ADDED entries
    # leave it null and inherit the manifest's sequence number
    assert eids == {"status": 0, "snapshot_id": 1, "sequence_number": 3,
                    "data_file": 2}
    assert emeta["format-version"] == b"1" and emeta["content"] == b"data"
    df_ids = {f["name"]: f["field-id"]
              for f in next(f for f in eschema["fields"]
                            if f["name"] == "data_file")["type"]["fields"]}
    assert df_ids["file_path"] == 100 and df_ids["record_count"] == 103
    assert all(e["status"] == STATUS_ADDED for e in entries)
    assert sum(e["data_file"]["record_count"] for e in entries) == 120
    # every referenced data file exists and is parquet
    for e in entries:
        assert os.path.exists(e["data_file"]["file_path"])
        assert e["data_file"]["file_format"] == "PARQUET"


def test_timestamps_written_as_int64_micros(spark, tmp_path, pages):
    """Iceberg requires int64-micros parquet timestamps (INT96 is
    disallowed by the spec); the write path must force that and restore
    the session conf afterwards."""
    import pyarrow.parquet as pq

    prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    loc = str(tmp_path / "ts_tbl")
    t = IcebergLiteTable.create(loc, pages.schema)
    t.append(pages)
    assert spark.conf.get("spark.sql.parquet.outputTimestampType") == prev
    f = t.files()[0]["file_path"]
    ts_field = pq.read_schema(f).field("warc_ts")
    assert str(ts_field.type).startswith("timestamp[us")
    # and the values survive the round trip
    got = t.scan(spark).agg(F.min("warc_ts").cast("long")).collect()[0][0]
    assert got == 1700000000


def test_partitioned_overwrite_is_idempotent(spark, tmp_path):
    """The vertex-state pattern: one identity partition per superstep,
    re-running a superstep replaces exactly its own partition."""
    loc = str(tmp_path / "state")
    state0 = spark.range(0, 50).select(
        F.col("id").alias("vid"), F.lit(0).alias("superstep"),
        F.lit(1.0).alias("rank"))
    t = IcebergLiteTable.create(loc, state0.schema,
                                partition_by=["superstep"])
    t.overwrite_partitions(state0, {"superstep": 0})
    s1 = state0.withColumn("superstep", F.lit(1)) \
        .withColumn("rank", F.lit(2.0))
    t.overwrite_partitions(s1, {"superstep": 1})
    # idempotent re-write of superstep 1 (the crash-recovery path)
    s1b = s1.withColumn("rank", F.lit(3.0))
    t.overwrite_partitions(s1b, {"superstep": 1})
    t = IcebergLiteTable.load(loc)
    assert t.scan(spark).count() == 100  # not 150: partition replaced
    ranks = dict(t.scan(spark).groupBy("superstep")
                 .agg(F.sum("rank").alias("s")).collect())
    assert ranks == {0: 50.0, 1: 150.0}
    # metadata-only partition pruning: file list for superstep=0 excludes
    # every superstep=1 file before Spark ever opens one
    pruned = t.scan(spark, partition_filter={"superstep": 0})
    assert pruned.count() == 50
    files0 = {f["file_path"] for f in t.files()
              if f["partition"] == {"superstep": 0}}
    scanned = {f.removeprefix("file://") for f in pruned.inputFiles()}
    assert scanned <= files0
    # surviving entries from rewritten manifests are EXISTING, new ADDED
    statuses = {f["status"] for f in t.files()}
    assert statuses <= {STATUS_ADDED, STATUS_EXISTING}


def test_overwrite_all_and_empty_scan(spark, tmp_path):
    loc = str(tmp_path / "ow")
    df = spark.range(0, 10).select(F.col("id"))
    t = IcebergLiteTable.create(loc, df.schema)
    assert t.scan(spark).count() == 0  # pre-first-snapshot: empty, typed
    t.append(df)
    t.overwrite_all(spark.range(100, 103).select(F.col("id")))
    assert sorted(r["id"] for r in t.scan(spark).collect()) == [100, 101, 102]
    assert t.snapshots()[-1]["summary"]["operation"] == "overwrite"


def test_create_twice_fails(spark, tmp_path):
    loc = str(tmp_path / "dup")
    df = spark.range(3).select(F.col("id"))
    IcebergLiteTable.create(loc, df.schema)
    with pytest.raises(FileExistsError):
        IcebergLiteTable.create(loc, df.schema)


# ---------------------------------------------------------------------------
# the mandated path: per-superstep vertex-state checkpointing to Iceberg,
# resumable mid-iteration — executing with zero jars via iceberg_lite


def test_pagerank_checkpoints_to_iceberg_and_resumes(spark, tiny, tmp_path):
    import math

    from conftest import collect_map
    from linkgraph.checkpoint import CheckpointManager
    from linkgraph.pagerank import pagerank

    url = f"iceberg+lite://{tmp_path}/wh_full"
    full_cp = CheckpointManager(spark, url, "run-full")
    full = pagerank(spark, tiny.edges, tiny.vertices, max_iter=8, tol=0.0,
                    checkpoint=full_cp)

    # vertex_state is a real Iceberg table: one overwrite snapshot per
    # superstep, identity-partitioned by (run_id, algo, superstep_p)
    tbl = IcebergLiteTable.load(str(tmp_path / "wh_full" / "vertex_state"))
    assert tbl.partition_columns == ["run_id", "algo", "superstep_p"]
    assert len(tbl.snapshots()) == 8
    assert all(s["summary"]["operation"] == "overwrite"
               for s in tbl.snapshots())
    supersteps = {f["partition"]["superstep_p"] for f in tbl.files()}
    assert supersteps == set(range(8))

    # kill after superstep 4, resume, bitwise-equivalent final ranks
    url2 = f"iceberg+lite://{tmp_path}/wh_part"
    part_cp = CheckpointManager(spark, url2, "run-part")
    pagerank(spark, tiny.edges, tiny.vertices, max_iter=5, tol=0.0,
             checkpoint=part_cp)
    assert part_cp.latest_complete("pagerank") == 4
    resumed = pagerank(spark, tiny.edges, tiny.vertices, max_iter=3, tol=0.0,
                       checkpoint=part_cp, resume=True)
    assert resumed.iterations == 8
    a = collect_map(full.ranks, "id", "rank")
    b = collect_map(resumed.ranks, "id", "rank")
    assert set(a) == set(b)
    for k in a:
        assert math.isclose(a[k], b[k], rel_tol=1e-12, abs_tol=1e-15), k

    # lineage manifest also lives in an Iceberg table (append snapshots)
    m = part_cp.manifest().toPandas()
    assert set(m["superstep"]) == set(range(8))
    assert m["completed"].all()


def test_iceberg_store_superstep_rewrite_is_idempotent(spark, tmp_path):
    """Crash recovery: re-writing superstep k replaces its partition —
    no duplicate state rows, one more snapshot."""
    from linkgraph.storage import for_url

    st = for_url(spark, f"iceberg+lite://{tmp_path}/wh")
    df = spark.range(0, 20).select(F.col("id"), F.lit(1.0).alias("rank"))
    st.write_state(df, "r", "pagerank", 3)
    got = st.write_state(df.withColumn("rank", F.lit(2.0)), "r",
                         "pagerank", 3)
    assert got.count() == 20
    assert got.agg(F.sum("rank")).collect()[0][0] == 40.0
    back = st.read_state(spark, "r", "pagerank", 3)
    assert back.columns == ["id", "rank"]
    assert back.count() == 20


# ---------------------------------------------------------------------------
# maintenance: compaction + snapshot expiration (streaming-ingest hygiene)


def test_compact_bin_packs_small_files(spark, tmp_path):
    loc = str(tmp_path / "cmp")
    df = spark.range(0, 400).select(F.col("id"), (F.col("id") % 5)
                                    .alias("grp"))
    t = IcebergLiteTable.create(loc, df.schema)
    for lo in range(0, 400, 100):  # 4 micro-batch appends, 4+ files each
        t.append(df.filter((F.col("id") >= lo) & (F.col("id") < lo + 100))
                 .repartition(4))
    assert len(t.files()) >= 16
    before = t.scan(spark).agg(F.sum("id")).collect()[0][0]
    sid = t.compact(spark)
    assert sid is not None
    t = IcebergLiteTable.load(loc)
    assert len(t.files()) < 16  # bin-packed
    assert t.scan(spark).count() == 400
    assert t.scan(spark).agg(F.sum("id")).collect()[0][0] == before
    assert t.snapshots()[-1]["summary"]["operation"] == "replace"
    # second compact is a no-op
    assert t.compact(spark) is None


def test_compact_respects_partitions(spark, tmp_path):
    loc = str(tmp_path / "cmp_p")
    df = spark.range(0, 60).select(F.col("id"), F.lit(0).alias("step"))
    t = IcebergLiteTable.create(loc, df.schema, partition_by=["step"])
    for s in (0, 1):
        for _ in range(2):
            t.append(df.withColumn("step", F.lit(s)).repartition(3),
                     {"step": s})
    t.compact(spark)
    t = IcebergLiteTable.load(loc)
    parts = {f["partition"]["step"] for f in t.files()}
    assert parts == {0, 1}
    # pruned reads still only touch their own partition's files
    got = t.scan(spark, partition_filter={"step": 1}).count()
    assert got == 120


def test_expire_snapshots_bounds_storage(spark, tmp_path):
    import glob

    loc = str(tmp_path / "exp")
    df = spark.range(0, 30).select(F.col("id"))
    t = IcebergLiteTable.create(loc, df.schema)
    sids = [t.append(df) for _ in range(4)]
    n_data_before = len(glob.glob(f"{loc}/data/**/*.parquet",
                                  recursive=True))
    t.overwrite_all(df.limit(5))  # strands the 4 append snapshots' files
    stats = t.expire_snapshots(keep_last=1)
    assert stats["snapshots"] == 4
    assert stats["data_files"] > 0
    t = IcebergLiteTable.load(loc)
    assert len(t.snapshots()) == 1
    assert t.scan(spark).count() == 5
    # expired snapshots are gone from time travel
    with pytest.raises(KeyError):
        t.scan(spark, snapshot_id=sids[0])
    # stranded data files physically deleted
    n_data_after = len(glob.glob(f"{loc}/data/**/*.parquet",
                                 recursive=True))
    assert n_data_after < n_data_before
    # live data untouched, table still readable after reload
    assert IcebergLiteTable.load(loc).scan(spark).count() == 5


def test_expire_keeps_shared_files(spark, tmp_path):
    """An append chain shares files across snapshots: expiring old
    snapshots must NOT delete files still referenced by kept ones."""
    loc = str(tmp_path / "exp_sh")
    df = spark.range(0, 10).select(F.col("id"))
    t = IcebergLiteTable.create(loc, df.schema)
    t.append(df)
    t.append(df.select((F.col("id") + 10).alias("id")))
    stats = t.expire_snapshots(keep_last=1)
    assert stats["snapshots"] == 1
    assert stats["data_files"] == 0  # snapshot 2 references snapshot 1's files
    assert t.scan(spark).count() == 20
    with pytest.raises(ValueError):
        t.expire_snapshots(keep_last=0)


# ---------------------------------------------------------------------------
# streaming ingestion: one Iceberg snapshot per micro-batch


def test_stream_into_iceberg_snapshots_per_batch(spark, tmp_path):
    from linkgraph.streaming import (
        run_into_iceberg, stream_extract_links, stream_pages,
    )

    html = F.encode(F.concat(
        F.lit('<html><body><a href="https://h'),
        (F.col("id") % 9).cast("string"),
        F.lit('/p'), ((F.col("id") + 1) % 120).cast("string"),
        F.lit('">x</a></body></html>')), "utf-8")
    linked = spark.range(0, 120).select(
        F.concat(F.lit("https://h"), (F.col("id") % 9).cast("string"),
                 F.lit("/p"), F.col("id").cast("string")).alias("url"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id"))
        .alias("warc_ts"),
        html.alias("html"), F.col("id"))
    src = str(tmp_path / "src")
    linked.select("url", "warc_ts", "html").write.parquet(src)
    links = stream_extract_links(
        stream_pages(spark, src)).drop("warc_ts")
    tbl_loc = str(tmp_path / "links_tbl")
    ckpt = str(tmp_path / "ckpt")
    t = run_into_iceberg(links, tbl_loc, ckpt)
    # content == batch extraction, row for row
    from linkgraph.extract import extract_links_udf

    batch = spark.read.parquet(src).select(
        F.col("url").alias("src_url"),
        F.posexplode(extract_links_udf(F.col("html"), F.col("url")))
        .alias("pos", "dst_url"))
    got = t.scan(spark)
    assert got.count() == batch.count()
    assert got.exceptAll(batch).count() == 0
    # snapshots carry the streaming batch id in their summary
    assert all("streaming-batch-id" in s["summary"] for s in t.snapshots())
    # draining again with the same checkpoint adds NO new snapshot
    n = len(t.snapshots())
    t2 = run_into_iceberg(links, tbl_loc, ckpt)
    assert len(t2.snapshots()) == n
    # new source data -> exactly one more snapshot, changelog-readable
    extra = linked.limit(3).select(
        F.concat(F.lit("https://xh/q"), F.col("id").cast("string"))
        .alias("url"), "warc_ts", "html")
    extra.write.mode("append").parquet(src)
    t3 = run_into_iceberg(links, tbl_loc, ckpt)
    assert len(t3.snapshots()) == n + 1
    inc = t3.scan_added(spark, t3.snapshots()[-1]["snapshot-id"])
    assert inc.count() > 0
    assert all(r["src_url"].startswith("https://xh/")
               for r in inc.select("src_url").collect())


# ---------------------------------------------------------------------------
# column stats in manifests + min/max file skipping


def test_manifest_column_bounds_recorded(spark, tmp_path):
    from linkgraph.iceberg_lite import decode_bound, encode_bound

    # single-value serialization round-trips (spec appendix D shapes)
    for t, v in [("int", -5), ("long", 2**40), ("double", -2.5),
                 ("float", 1.5), ("string", "héllo")]:
        assert decode_bound(t, encode_bound(t, v)) == v

    loc = str(tmp_path / "stats")
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") * 2).alias("v"),
        F.when(F.col("id") < 90, F.concat(F.lit("k"), F.col("id")))
        .alias("name"))  # 10 nulls
    t = IcebergLiteTable.create(loc, df.schema)
    t.append(df.coalesce(1))
    f = t.files()[0]
    assert f["lower_bounds"]["id"] == 0
    assert f["upper_bounds"]["id"] == 99
    assert f["lower_bounds"]["v"] == 0 and f["upper_bounds"]["v"] == 198
    assert f["null_value_counts"]["name"] == 10


def test_bounds_filter_skips_files(spark, tmp_path):
    loc = str(tmp_path / "skip")
    df = spark.range(0, 1000).select(F.col("id"),
                                     (F.col("id") % 7).alias("g"))
    t = IcebergLiteTable.create(loc, df.schema)
    # 10 sorted-range commits -> each file covers a narrow id range
    for lo in range(0, 1000, 100):
        t.append(df.filter((F.col("id") >= lo) & (F.col("id") < lo + 100))
                 .coalesce(1))
    n_files = len(t.files())
    assert n_files == 10
    pruned = t.scan(spark, bounds_filter={"id": (250, 349)})
    opened = pruned.inputFiles()
    assert len(opened) == 2  # only the [200,300) and [300,400) files
    # sound: the pruned scan plus the row filter equals the full answer
    got = sorted(r["id"] for r in
                 pruned.filter(F.col("id").between(250, 349)).collect())
    assert got == list(range(250, 350))
    # open-ended intervals
    assert len(t.scan(spark, bounds_filter={"id": (950, None)})
               .inputFiles()) == 1
    assert len(t.scan(spark, bounds_filter={"id": (None, 49)})
               .inputFiles()) == 1
    # provably-empty interval -> zero files, empty typed DataFrame
    empty = t.scan(spark, bounds_filter={"id": (5000, None)})
    assert empty.count() == 0 and empty.schema == t.spark_schema
    # unknown column raises
    with pytest.raises(KeyError):
        t.scan(spark, bounds_filter={"nope": (1, 2)})


def test_distributed_planning_matches_driver_loop(spark, tmp_path):
    """Past the manifest threshold, scan planning fans out as a Spark job
    — identical file set and results to the driver loop."""
    loc = str(tmp_path / "dist_plan")
    df = spark.range(0, 60).select(F.col("id"))
    t = IcebergLiteTable.create(loc, df.schema)
    for lo in range(0, 60, 10):  # 6 manifests
        t.append(df.filter((F.col("id") >= lo) & (F.col("id") < lo + 10))
                 .coalesce(1))
    try:
        t.DISTRIBUTED_PLAN_THRESHOLD = 2  # force the distributed path
        dist = t.scan(spark, bounds_filter={"id": (15, 34)})
        dist_files = sorted(dist.inputFiles())
        dist_rows = sorted(r["id"] for r in dist.collect())
    finally:
        del t.DISTRIBUTED_PLAN_THRESHOLD  # back to the class default
    drv = t.scan(spark, bounds_filter={"id": (15, 34)})
    assert sorted(drv.inputFiles()) == dist_files
    assert len(dist_files) == 3  # [10,20) [20,30) [30,40)
    assert dist_rows == sorted(r["id"] for r in drv.collect())


def test_register_iceberg_view_time_travel(spark, tmp_path, pages):
    """catalog.register_iceberg exposes a lite table (optionally snapshot-
    pinned) as a SQL temp view; the view is the lazy snapshot scan."""
    from linkgraph.catalog import register_iceberg

    loc = str(tmp_path / "tbl")
    t = IcebergLiteTable.create(loc, pages.schema)
    s1 = t.append(pages.filter(F.col("lang") == "en"))
    t.append(pages.filter(F.col("lang") == "de"))
    register_iceberg(spark, "pages_cur", loc)
    register_iceberg(spark, "pages_v1", loc, snapshot_id=s1)
    assert spark.sql("SELECT count(*) c FROM pages_cur").collect()[0]["c"] == 120
    v1 = spark.sql("SELECT lang, count(*) c FROM pages_v1 GROUP BY lang").collect()
    assert [(r["lang"], r["c"]) for r in v1] == [("en", 40)]


def test_schema_evolution_add_columns(spark, tmp_path):
    """add_columns: metadata-only — pre-evolution files read as NULL for
    the new column, post-evolution appends carry it, field ids are fresh
    and the schema history is kept; a load() round-trip preserves it."""
    from pyspark.sql import functions as F, types as T

    from linkgraph.iceberg_lite import IcebergLiteTable

    loc = str(tmp_path / "evo")
    df1 = spark.createDataFrame(
        [(i, "en", 10 * i) for i in range(5)],
        "doc_id long, lang string, n_chars long",
    )
    t = IcebergLiteTable.create(loc, df1.schema)
    t.append(df1)

    t.add_columns(T.StructType([T.StructField("quality", T.DoubleType())]))
    assert [f.name for f in t.spark_schema.fields] == [
        "doc_id", "lang", "n_chars", "quality",
    ]
    assert t.meta["last-column-id"] == 4
    assert t.meta["schema"]["fields"][-1]["id"] == 4
    assert t.meta["current-schema-id"] == 1
    assert len(t.meta["schemas"]) == 2

    df2 = spark.createDataFrame(
        [(10 + i, "de", 7 * i, i / 2.0) for i in range(3)],
        "doc_id long, lang string, n_chars long, quality double",
    )
    t.append(df2)

    rows = {r["doc_id"]: r for r in t.scan(spark).collect()}
    assert len(rows) == 8
    for i in range(5):
        assert rows[i]["quality"] is None  # old files: NULL-filled
    for i in range(3):
        assert rows[10 + i]["quality"] == i / 2.0

    t2 = IcebergLiteTable.load(loc)
    assert [f.name for f in t2.spark_schema.fields][-1] == "quality"
    n_null = t2.scan(spark).where(F.col("quality").isNull()).count()
    assert n_null == 5

    import pytest as _pytest
    with _pytest.raises(ValueError, match="already exists"):
        t2.add_columns(T.StructType([T.StructField("lang", T.StringType())]))


# ---------------------------------------------------------------------------
# v2 position deletes (merge-on-read)


def test_delete_where_merge_on_read(spark, tmp_path, pages):
    loc = str(tmp_path / "del_tbl")
    t = IcebergLiteTable.create(loc, pages.schema)
    s1 = t.append(pages)
    sid = t.delete_where(spark, "lang = 'en'")
    assert sid is not None
    assert t.meta["format-version"] == 2
    # merge-on-read: current scan reflects the delete
    cur = t.scan(spark)
    assert cur.count() == 80
    assert cur.where(F.col("lang") == "en").count() == 0
    # time travel: the pre-delete snapshot still has every row
    assert t.scan(spark, snapshot_id=s1).count() == 120
    # the delete snapshot is a real snapshot with op=delete + seq ordering
    snaps = t.snapshots()
    assert snaps[-1]["summary"]["operation"] == "delete"
    assert snaps[-1]["sequence-number"] > snaps[0]["sequence-number"]
    # reload from disk: metadata round-trips
    t2 = IcebergLiteTable.load(loc)
    assert t2.scan(spark).count() == 80
    # files(): delete file visible with content=1, sorted rows
    fl = t2.files()
    dels = [f for f in fl if f["content"] == 1]
    assert len(dels) >= 1 and sum(f["record_count"] for f in dels) == 40
    ddf = spark.read.parquet(*[f["file_path"] for f in dels])
    rows = ddf.orderBy("file_path", "pos").collect()
    assert rows == sorted(rows, key=lambda r: (r["file_path"], r["pos"]))


def test_delete_is_cumulative_and_append_unaffected(spark, tmp_path, pages):
    loc = str(tmp_path / "del_tbl2")
    t = IcebergLiteTable.create(loc, pages.schema)
    t.append(pages.filter(F.col("lang") == "en"))   # 40 rows
    t.delete_where(spark, "url like '%/p0'")        # 1 row gone
    assert t.scan(spark).count() == 39
    # second delete only records rows still live (idempotent re-delete)
    again = t.delete_where(spark, "url like '%/p0'")
    assert again is None  # nothing left matching -> no empty snapshot
    # rows appended AFTER a delete are never touched by it
    t.append(pages.filter(F.col("lang") == "de"))   # +80
    assert t.scan(spark).count() == 119
    t.delete_where(spark, "lang = 'de'")
    assert t.scan(spark).count() == 39
    # deleting already-deleted rows again matches nothing
    assert t.delete_where(spark, "lang = 'de'") is None


def test_delete_values_not_just_counts(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, i % 5) for i in range(100)], "id long, k long")
    loc = str(tmp_path / "del_vals")
    t = IcebergLiteTable.create(loc, df.schema)
    t.append(df.repartition(7))  # several files, positions per file
    t.delete_where(spark, "k = 3")
    got = sorted(r["id"] for r in t.scan(spark).collect())
    assert got == [i for i in range(100) if i % 5 != 3]
    # overlapping second delete: k=3 already gone, k=4 goes now
    t.delete_where(spark, "k in (3, 4)")
    got = sorted(r["id"] for r in t.scan(spark).collect())
    assert got == [i for i in range(100) if i % 5 not in (3, 4)]


def test_compact_folds_deletes_in(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, i % 2) for i in range(50)], "id long, flag long")
    loc = str(tmp_path / "del_compact")
    t = IcebergLiteTable.create(loc, df.schema)
    t.append(df.repartition(5))
    t.delete_where(spark, "flag = 1")
    sid = t.compact(spark)
    assert sid is not None
    # rewritten files physically exclude deleted rows
    live = [f for f in t.files() if f["content"] == 0]
    assert sum(f["record_count"] for f in live) == 25
    assert sorted(r["id"] for r in t.scan(spark).collect()) == \
        list(range(0, 50, 2))
    # delete rows for dead paths are harmless no-ops on future scans
    t.append(spark.createDataFrame([(100, 1)], "id long, flag long"))
    assert t.scan(spark).count() == 26


def test_expire_reclaims_dead_delete_files(spark, tmp_path):
    df = spark.createDataFrame([(i,) for i in range(30)], "id long")
    loc = str(tmp_path / "del_expire")
    t = IcebergLiteTable.create(loc, df.schema)
    t.append(df)
    t.delete_where(spark, "id < 10")
    t.overwrite_all(t.scan(spark))  # rewrites: deletes no longer needed
    assert t.scan(spark).count() == 20
    stats = t.expire_snapshots(keep_last=1)
    assert stats["snapshots"] == 2
    # the position-delete parquet itself was reclaimed
    data_dir = os.path.join(loc, "data")
    leftover = [d for d in os.listdir(data_dir) if d.startswith("deletes-")]
    for d in leftover:
        assert not any(f.endswith(".parquet")
                       for f in os.listdir(os.path.join(data_dir, d)))
    assert t.scan(spark).count() == 20


def test_delete_with_partition_prune(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, i % 3, i * 2) for i in range(60)], "id long, p long, v long")
    loc = str(tmp_path / "del_part")
    t = IcebergLiteTable.create(loc, df.schema, partition_by=["p"])
    for p in range(3):
        t.append(df.where(F.col("p") == p), partition_values={"p": p})
    # delete only scans the pruned partition's files
    t.delete_where(spark, "id < 30", partition_filter={"p": 1})
    got = sorted(r["id"] for r in t.scan(spark).collect())
    expect = sorted(i for i in range(60) if not (i % 3 == 1 and i < 30))
    assert got == expect


# ---------------------------------------------------------------------------
# multi-writer optimistic concurrency (CAS on the metadata version)


def _two_handles(spark, tmp_path, pages):
    loc = str(tmp_path / "mw_tbl")
    t = IcebergLiteTable.create(loc, pages.schema)
    t.append(pages.where(F.col("lang") == "en"))
    # two independent handles loaded from the SAME version => a race
    return loc, IcebergLiteTable.load(loc), IcebergLiteTable.load(loc)


def test_concurrent_append_rebases_and_keeps_both(spark, tmp_path, pages):
    from linkgraph.iceberg_lite import CommitConflictError  # noqa: F401

    loc, t1, t2 = _two_handles(spark, tmp_path, pages)
    n_en = pages.where(F.col("lang") == "en").count()
    n_de = pages.where(F.col("lang") == "de").count()
    t1.append(pages.where(F.col("lang") == "de").limit(10))
    # t2's view is now stale: its commit loses the CAS, rebases on t1's
    # metadata, and retries — t1's snapshot must survive
    t2.append(pages.where(F.col("lang") == "de").offset(10))
    final = IcebergLiteTable.load(loc)
    assert len(final.snapshots()) == 3
    assert final.scan(spark).count() == n_en + n_de
    # sequence numbers strictly increase across the racing commits
    seqs = [s["sequence-number"] for s in final.snapshots()]
    assert seqs == sorted(seqs) and len(set(seqs)) == len(seqs)
    # parent chain follows commit order, not handle-load order
    snaps = final.snapshots()
    assert snaps[2]["parent-snapshot-id"] == snaps[1]["snapshot-id"]


def test_concurrent_delete_preserves_winner_append(spark, tmp_path, pages):
    loc, t1, t2 = _two_handles(spark, tmp_path, pages)
    added = pages.where(F.col("lang") == "de").limit(7)
    t1.append(added)
    # stale delete: applies to the rows ITS snapshot saw; t1's freshly
    # appended rows are carried over untouched (snapshot isolation)
    t2.delete_where(spark, "lang = 'en'")
    final = IcebergLiteTable.load(loc)
    assert final.scan(spark).count() == 7
    assert final.scan(spark).where("lang = 'de'").count() == 7


def test_stale_compact_conflict_surfaces(spark, tmp_path, pages):
    from linkgraph.iceberg_lite import CommitConflictError

    loc, t1, t2 = _two_handles(spark, tmp_path, pages)
    t1.append(pages.where(F.col("lang") == "de"))
    with pytest.raises(CommitConflictError):
        t2.compact(spark)  # rewrote files from the replaced snapshot
    # the standard recovery: re-run against a fresh handle
    fresh = IcebergLiteTable.load(loc)
    n_before = fresh.scan(spark).count()
    fresh.compact(spark)
    assert IcebergLiteTable.load(loc).scan(spark).count() == n_before


def test_concurrent_add_columns_composes(spark, tmp_path, pages):
    loc, t1, t2 = _two_handles(spark, tmp_path, pages)
    t1.add_columns(T.StructType([T.StructField("score", T.DoubleType())]))
    t2.add_columns(T.StructType([T.StructField("host", T.StringType())]))
    final = IcebergLiteTable.load(loc)
    names = [f.name for f in final.spark_schema.fields]
    assert "score" in names and "host" in names
    # field ids stay unique after the rebase re-derivation
    ids = [f["id"] for f in final.meta["schema"]["fields"]]
    assert len(ids) == len(set(ids))


def test_stale_hint_self_heals(spark, tmp_path, pages):
    loc, t1, _ = _two_handles(spark, tmp_path, pages)
    t1.append(pages.where(F.col("lang") == "de"))
    hint = os.path.join(loc, "metadata", "version-hint.text")
    with open(hint) as f:
        latest = int(f.read().strip())
    with open(hint, "w") as f:
        f.write("1")  # regress the advisory pointer
    healed = IcebergLiteTable.load(loc)
    assert healed._base_version == latest
    assert healed.current_snapshot_id() == t1.current_snapshot_id()


def test_direct_version_collision_raises(spark, tmp_path, pages):
    from linkgraph.iceberg_lite import CommitConflictError

    loc, t1, t2 = _two_handles(spark, tmp_path, pages)
    t1.meta["properties"]["a"] = "1"
    t1._commit()
    t2.meta["properties"]["b"] = "2"
    with pytest.raises(CommitConflictError):
        t2._commit()  # same base version as t1 had -> CAS must fail


# ---------------------------------------------------------------------------
# v2 equality deletes (the CDC / blind-upsert flavor)


def test_equality_delete_merge_on_read(spark, tmp_path, pages):
    loc = str(tmp_path / "eq_tbl")
    t = IcebergLiteTable.create(loc, pages.schema)
    s1 = t.append(pages)
    n_all = pages.count()
    keys = pages.where(F.col("lang") == "en").select("url")
    n_en = keys.count()
    sid = t.delete_where_eq(spark, keys)
    assert sid is not None and t.meta["format-version"] == 2
    assert t.scan(spark).count() == n_all - n_en
    assert t.scan(spark).where("lang = 'en'").count() == 0
    # time travel to the pre-delete snapshot still sees every row
    assert t.scan(spark, snapshot_id=s1).count() == n_all


def test_equality_delete_blind_upsert(spark, tmp_path, pages):
    """The CDC upsert pattern: delete keys + append fresh rows. The
    sequence rule (delete applies only to data files with seq strictly
    below) is what makes the re-appended rows survive."""
    loc = str(tmp_path / "upsert_tbl")
    t = IcebergLiteTable.create(loc, pages.schema)
    t.append(pages)
    victims = pages.where(F.col("lang") == "en")
    t.delete_where_eq(spark, victims.select("url"))
    fresh = victims.withColumn("text", F.concat(F.lit("v2 "), "text"))
    t.append(fresh)
    got = t.scan(spark)
    assert got.count() == pages.count()
    en_rows = got.where("lang = 'en'")
    assert en_rows.count() == victims.count()
    # every surviving en row is the NEW version
    assert en_rows.where(F.col("text").startswith("v2 ")).count() == \
        victims.count()


def test_equality_and_position_deletes_compose(spark, tmp_path, pages):
    loc = str(tmp_path / "mixed_tbl")
    t = IcebergLiteTable.create(loc, pages.schema)
    t.append(pages)
    t.delete_where(spark, "lang = 'de'")  # position deletes
    t.delete_where_eq(  # equality deletes on a different slice
        spark, pages.where(F.col("lang") == "en").limit(5).select("url"))
    n_de = pages.where("lang = 'de'").count()
    assert t.scan(spark).count() == pages.count() - n_de - 5


def test_compact_folds_equality_deletes(spark, tmp_path, pages):
    loc = str(tmp_path / "eqcompact_tbl")
    t = IcebergLiteTable.create(loc, pages.schema)
    t.append(pages.where(F.col("lang") == "en"))
    t.append(pages.where(F.col("lang") == "de"))
    t.delete_where_eq(
        spark, pages.where(F.col("warc_ts") < F.timestamp_seconds(
            F.lit(1700000000 + 30))).select("url"))
    before = {r["url"] for r in t.scan(spark).select("url").collect()}
    assert t.compact(spark) is not None
    after_tbl = IcebergLiteTable.load(loc)
    after = {r["url"] for r in after_tbl.scan(spark).select("url").collect()}
    assert after == before
    # the rewritten files carry seq ABOVE the delete's: the eq delete no
    # longer matches anything, and scanning still returns the folded rows
    assert len(after) == 120 - 30


def test_equality_delete_rejects_unknown_columns(spark, tmp_path, pages):
    loc = str(tmp_path / "eqbad_tbl")
    t = IcebergLiteTable.create(loc, pages.schema)
    t.append(pages)
    with pytest.raises(KeyError):
        t.delete_where_eq(spark, pages.select(F.col("url").alias("nope")))


def test_stream_upsert_recrawl_latest_wins(spark, tmp_path):
    """CDC upsert sink: a recrawl batch re-emits existing urls with new
    content; with upsert_keys the table holds exactly one row per url —
    the latest version — while plain append mode would hold both."""
    from linkgraph.streaming import run_into_iceberg, stream_pages

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    tbl_loc = str(tmp_path / "pages_tbl")

    def crawl(version: str, n: int):
        return spark.range(0, n).select(
            F.concat(F.lit("https://s/p"), F.col("id").cast("string"))
            .alias("url"),
            F.timestamp_seconds(F.lit(1700000000) + F.col("id"))
            .alias("warc_ts"),
            F.encode(F.concat(F.lit(version), F.col("id").cast("string")),
                     "utf-8").alias("html"),
        )

    crawl("v1-", 20).write.parquet(src)
    pages = stream_pages(spark, src)
    t = run_into_iceberg(pages, tbl_loc, ckpt, upsert_keys=["url"])
    assert t.scan(spark).count() == 20
    # recrawl: 10 of the same urls, new content
    crawl("v2-", 10).write.mode("append").parquet(src)
    t2 = run_into_iceberg(
        stream_pages(spark, src), tbl_loc, ckpt, upsert_keys=["url"])
    got = t2.scan(spark)
    assert got.count() == 20  # one row per url, not 30
    v2 = got.where(F.decode("html", "utf-8").startswith("v2-"))
    assert v2.count() == 10  # the recrawled urls are the NEW versions
    # replaying the drained checkpoint changes nothing
    t3 = run_into_iceberg(
        stream_pages(spark, src), tbl_loc, ckpt, upsert_keys=["url"])
    assert t3.scan(spark).count() == 20
    assert len(t3.snapshots()) == len(t2.snapshots())


def test_compact_drops_dead_position_delete_files(spark, tmp_path):
    """All groups packed => every position-delete file's targets are gone,
    so the compact commit itself retires the delete files (round-4
    verdict item #6) — no merge-on-read debt left, scan unchanged."""
    df = spark.createDataFrame(
        [(i, i % 2) for i in range(40)], "id long, flag long")
    loc = str(tmp_path / "del_drop")
    t = IcebergLiteTable.create(loc, df.schema)
    t.append(df.repartition(4))
    t.delete_where(spark, "flag = 1")
    assert any(f["content"] != 0 for f in t.files())
    before = sorted(r["id"] for r in t.scan(spark).collect())
    assert t.compact(spark) is not None
    t2 = IcebergLiteTable.load(loc)
    assert all(f["content"] == 0 for f in t2.files())  # deletes retired
    assert sorted(r["id"] for r in t2.scan(spark).collect()) == before


def test_compact_keeps_applicable_position_delete_files(spark, tmp_path):
    """A single-file partition is never packed, so delete files that
    still reference it must survive the compact — and keep masking its
    rows on scans."""
    df = spark.range(0, 30).select(F.col("id"), F.lit(0).alias("step"))
    loc = str(tmp_path / "del_keep")
    t = IcebergLiteTable.create(loc, df.schema, partition_by=["step"])
    for _ in range(2):  # step=0: two appends -> multiple files -> packed
        t.append(df.withColumn("id", F.col("id")), {"step": 0})
    # step=1: exactly ONE data file (coalesce(1) — an append of a multi-
    # partition frame writes one file per partition and would get packed)
    t.append(df.withColumn("step", F.lit(1)).coalesce(1), {"step": 1})
    t.delete_where(spark, "id < 5")  # hits both partitions
    before = t.scan(spark).groupBy("step").count().collect()
    assert t.compact(spark) is not None
    t2 = IcebergLiteTable.load(loc)
    # the delete file referencing the unpacked step=1 file survives
    assert any(f["content"] != 0 for f in t2.files())
    after = t2.scan(spark).groupBy("step").count().collect()
    assert {r["step"]: r["count"] for r in after} == \
        {r["step"]: r["count"] for r in before}
    assert t2.scan(spark).where("step = 1 AND id < 5").count() == 0


def test_compact_drops_dead_equality_delete_files(spark, tmp_path, pages):
    """After a full pack, every surviving data file carries the new
    (higher) sequence number, so no equality delete can apply — the
    compact commit retires the equality-delete files too."""
    loc = str(tmp_path / "eqdrop_tbl")
    t = IcebergLiteTable.create(loc, pages.schema)
    t.append(pages.where(F.col("lang") == "en"))
    t.append(pages.where(F.col("lang") == "de"))
    t.delete_where_eq(
        spark, pages.where(F.col("warc_ts") < F.timestamp_seconds(
            F.lit(1700000000 + 30))).select("url"))
    assert any(f["content"] != 0 for f in t.files())
    before = {r["url"] for r in t.scan(spark).select("url").collect()}
    assert t.compact(spark) is not None
    t2 = IcebergLiteTable.load(loc)
    assert all(f["content"] == 0 for f in t2.files())
    assert {r["url"] for r in t2.scan(spark).select("url").collect()} == \
        before


def test_expire_snapshots_keeps_live_delete_files(spark, tmp_path):
    """Expiration with LIVE delete files: the current snapshot's delete
    manifests keep their files on disk, and the merge-on-read scan still
    masks the deleted rows afterwards (round-4 verdict item #6's test
    gap)."""
    df = spark.createDataFrame([(i,) for i in range(30)], "id long")
    loc = str(tmp_path / "del_live_expire")
    t = IcebergLiteTable.create(loc, df.schema)
    t.append(df)
    t.delete_where(spark, "id < 10")
    t.append(spark.createDataFrame([(100,)], "id long"))
    assert t.scan(spark).count() == 21
    stats = t.expire_snapshots(keep_last=1)
    assert stats["snapshots"] == 2
    t2 = IcebergLiteTable.load(loc)
    live_dels = [f for f in t2.files() if f["content"] != 0]
    assert live_dels  # the delete file is still referenced ...
    for f in live_dels:
        assert os.path.exists(f["file_path"])  # ... and still on disk
    assert t2.scan(spark).count() == 21  # rows stay masked post-expire
