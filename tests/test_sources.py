"""Source/sink format coverage (SURVEY §2c sources): CSV, JSON,
in-memory rows, parquet round-trips — schema-explicit reads (no
inference scans, which would double-read 100 TB inputs)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_csv_roundtrip_with_schema(spark, sf_dir, tmp_path):
    from kbrowse_spark.sources.tables import load

    nation = load(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_csv")
    nation.write.option("header", True).csv(path)
    back = (
        spark.read.schema("n_nationkey int, n_name string, n_regionkey int")
        .option("header", True)
        .csv(path)
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_json_roundtrip_with_schema(spark, sf_dir, tmp_path):
    from kbrowse_spark.sources.tables import load

    region = load(spark, sf_dir, "region")
    path = str(tmp_path / "region_json")
    region.write.json(path)
    back = spark.read.schema("r_regionkey int, r_name string").json(path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, region.collect()))


def test_in_memory_rows_and_parquet_sink(spark, tmp_path):
    rows = [(i, f"name-{i}") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, name string")
    out = str(tmp_path / "sink.parquet")
    df.repartition(4).write.parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == 100
    assert back.filter(F.col("id") == 42).collect()[0]["name"] == "name-42"


def test_json_lines_payload_decode(spark, tmp_path):
    """from_json over a JSON-lines text column — the schema-on-read
    path used for payload decoding in the scan pipeline."""
    lines = [f'{{"a": {i}, "tags": ["x", "{i}"]}}' for i in range(10)]
    df = spark.createDataFrame([(s,) for s in lines], "raw string")
    parsed = df.select(
        F.from_json("raw", "a long, tags array<string>").alias("j")
    ).select("j.a", F.element_at("j.tags", 2).alias("tag2"))
    got = sorted(map(tuple, parsed.collect()))
    assert got == [(i, str(i)) for i in range(10)]


def test_pyds_rowgroup_partition_planning(spark, sf_dir):
    """The custom Python data source plans one input partition per
    parquet row group (split planning from the footer, like a Kafka
    source's (topic, partition, offsets) listing) and round-trips the
    data exactly."""
    import pyarrow.parquet as pq

    from kbrowse_spark.sources.pyds import register_events_rowgroup_source
    from kbrowse_spark.sources.tables import table_path

    register_events_rowgroup_source(spark)
    path = table_path(sf_dir, "events")
    n_rg = pq.read_metadata(path).num_row_groups
    df = spark.read.format("events_rowgroups").option("path", path).load()
    assert df.rdd.getNumPartitions() == n_rg
    expected = pq.read_metadata(path).num_rows
    assert df.count() == expected
    # spot-check content equality against the native reader
    native = spark.read.parquet(path).select("event_id", "value")
    assert (
        df.select("event_id", "value")
        .exceptAll(native)
        .limit(1)
        .count()
        == 0
    )


def test_pyds_follow_stream_mid_stream_arrival(spark, tmp_path):
    """The streaming Python data source picks up files that arrive
    AFTER the query starts — the follow-mode contract: offsets advance
    with the append-only listing, each micro-batch plans only the new
    splits."""
    import time

    from kbrowse_spark.sources.pyds_stream import (
        EventsFollowStreamReader,
        register_events_follow_source,
    )

    d = str(tmp_path / "follow_src")
    import os

    os.makedirs(d)

    def stage(idx: int, start: int, n: int) -> None:
        spark.range(start, start + n).selectExpr(
            "id AS event_id",
            "id % 7 AS user_id",
            "'click' AS event_type",
            "CAST(id AS DOUBLE) / 10 AS value",
        ).coalesce(1).write.parquet(str(tmp_path / f"b{idx}"))
        import glob
        import shutil

        (part,) = glob.glob(str(tmp_path / f"b{idx}" / "part-*.parquet"))
        shutil.copy(part, os.path.join(d, f"{idx:03d}.parquet"))

    stage(0, 0, 50)
    stage(1, 50, 30)

    # Offset/partition planning is pure listing math (no Spark needed).
    r = EventsFollowStreamReader({"path": d})
    assert r.initialOffset() == {"files": 0}
    assert r.latestOffset() == {"files": 2}
    assert len(r.partitions({"files": 0}, {"files": 2})) == 2
    assert len(r.partitions({"files": 1}, {"files": 2})) == 1

    register_events_follow_source(spark)
    ev = spark.readStream.format("events_follow").option("path", d).load()
    q = (
        ev.groupBy()
        .agg(F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("s"))
        .writeStream.format("memory")
        .queryName("follow_mid_stream")
        .outputMode("complete")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:

        def wait_for(n_expected: int, timeout: float = 60.0) -> None:
            deadline = time.monotonic() + timeout
            while time.monotonic() < deadline:
                rows = spark.table("follow_mid_stream").collect()
                if rows and rows[0]["n"] == n_expected:
                    return
                time.sleep(0.3)
            raise AssertionError(
                f"stream never reached {n_expected} rows: "
                f"{spark.table('follow_mid_stream').collect()}"
            )

        wait_for(80)
        stage(2, 80, 20)  # arrives mid-stream
        wait_for(100)
        (row,) = spark.table("follow_mid_stream").collect()
        assert row["s"] == 100 * 99 // 2
    finally:
        q.stop()


def test_pioneer_jsonl_sink_two_phase_commit(spark, sf_dir, tmp_path):
    """Custom Python data source WRITER: parallel task writes land in
    _tmp, commit renames to ordered part files and publishes a
    manifest last; row counts reconcile exactly and no temp residue
    survives."""
    import glob
    import json
    import os

    from kbrowse_spark.sources.pyds_writer import register_pioneer_jsonl_sink

    register_pioneer_jsonl_sink(spark)
    out = str(tmp_path / "sink")
    os.makedirs(out)
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "user_id", "event_type")
        .filter("event_id < 300")
        .repartition(4)
    )
    n_in = ev.count()
    ev.write.format("pioneer_jsonl").option("path", out).mode(
        "overwrite"
    ).save()

    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["type"] == "pioneer"
    assert manifest["total_rows"] == n_in
    parts = sorted(glob.glob(os.path.join(out, "part-*.jsonl")))
    assert {f["file"] for f in manifest["files"]} == {
        os.path.basename(p) for p in parts
    }
    rows = []
    for p in parts:
        with open(p) as f:
            rows.extend(json.loads(line) for line in f)
    assert len(rows) == n_in
    assert {r["event_id"] for r in rows} == {
        r["event_id"] for r in ev.collect()
    }
    assert not os.path.exists(os.path.join(out, "_tmp"))

    # overwrite mode replaces prior parts (no stale accumulation)
    ev.limit(10).write.format("pioneer_jsonl").option("path", out).mode(
        "overwrite"
    ).save()
    manifest2 = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest2["total_rows"] == 10
    total = 0
    for p in glob.glob(os.path.join(out, "part-*.jsonl")):
        with open(p) as f:
            total += sum(1 for _ in f)
    assert total == 10

    # append mode keeps prior parts: new files get collision-free
    # names past the max existing index and the manifest merges both
    # commits' entries (the exactly-once contract for append).
    ev.limit(7).repartition(2).write.format("pioneer_jsonl").option(
        "path", out
    ).mode("append").save()
    manifest3 = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest3["total_rows"] == 17
    prior_names = {f["file"] for f in manifest2["files"]}
    assert prior_names < {f["file"] for f in manifest3["files"]}
    total = 0
    for p in glob.glob(os.path.join(out, "part-*.jsonl")):
        with open(p) as f:
            total += sum(1 for _ in f)
    assert total == 17
    assert len({f["file"] for f in manifest3["files"]}) == len(
        manifest3["files"]
    )


def test_pioneer_jsonl_stream_writer_per_batch_commit(spark, sf_dir, tmp_path):
    """Streaming custom sink: availableNow drive of the events file
    stream through the pioneer_jsonl streamWriter — per-batch
    manifests appear, counts reconcile with the source, temp dir is
    gone."""
    import glob
    import json
    import os

    from kbrowse_spark.sources.pyds_writer import register_pioneer_jsonl_sink

    register_pioneer_jsonl_sink(spark)
    src = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "event_type"
    )
    n_in = src.count()
    stream_src = str(tmp_path / "stream_src")
    src.coalesce(2).write.parquet(stream_src)
    out = str(tmp_path / "stream_out")
    os.makedirs(out)
    q = (
        spark.readStream.schema(src.schema)
        .parquet(stream_src)
        .writeStream.format("pioneer_jsonl")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    manifests = sorted(glob.glob(os.path.join(out, "_BATCH_*_MANIFEST.json")))
    assert manifests, "no batch manifests published"
    total = sum(json.load(open(m))["total_rows"] for m in manifests)
    assert total == n_in
    n_lines = 0
    for p in glob.glob(os.path.join(out, "batch-*-part-*.jsonl")):
        with open(p) as f:
            n_lines += sum(1 for _ in f)
    assert n_lines == n_in


def test_schema_evolution_mergeschema_read(spark, tmp_path):
    """Schema evolution across parquet file vintages: columns added in
    later writes must surface (NULL-filled for older files) under
    mergeSchema — the contract that lets a 100 TB table grow columns
    without rewriting history.  Conflicting TYPES for the same column
    are a hard error (not silent coercion), which the second half
    pins: evolution means adding columns, never mutating them."""
    base = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a")], "id long, name string"
    ).write.parquet(f"{base}/v1.parquet")
    spark.createDataFrame(
        [(2 ** 40, "b", 99)], "id long, name string, score int"
    ).write.parquet(f"{base}/v2.parquet")
    df = spark.read.option("mergeSchema", "true").parquet(f"{base}/*.parquet")
    assert dict(df.dtypes) == {"id": "bigint", "name": "string", "score": "int"}
    rows = {r["name"]: (r["id"], r["score"]) for r in df.collect()}
    assert rows == {"a": (1, None), "b": (2 ** 40, 99)}
    # a TYPE conflict (id rewritten as string) must fail loudly
    import pytest

    spark.createDataFrame(
        [("oops", "c")], "id string, name string"
    ).write.parquet(f"{base}/v3.parquet")
    with pytest.raises(Exception, match="[Mm]erg"):
        spark.read.option("mergeSchema", "true").parquet(f"{base}/*.parquet")


def _write_rowgrouped_events(path: str, n: int = 1000, rg: int = 100) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "user_id": pa.array([i % 50 for i in range(n)], pa.int64()),
            "event_type": pa.array(
                ["click" if i % 3 else "view" for i in range(n)]
            ),
            "value": pa.array([float(i) / 7 for i in range(n)], pa.float64()),
        }
    )
    pq.write_table(t, path, row_group_size=rg)


def test_pyds_pushdown_prunes_row_groups(spark, tmp_path):
    """Python DSv2 filter pushdown: a selective event_id predicate must
    shrink the PLANNED split list via footer min/max stats (10 row
    groups -> 2), while every filter is returned unhandled so Spark
    re-applies it and results stay exact."""
    from pyspark.sql.datasource import EqualTo, LessThan

    from kbrowse_spark.sources.pyds import EventsRowGroupReader

    p = str(tmp_path / "rg_events.parquet")
    _write_rowgrouped_events(p)
    r = EventsRowGroupReader({"path": p})
    assert len(r.partitions()) == 10
    unhandled = list(r.pushFilters([LessThan(("event_id",), 150)]))
    assert len(unhandled) == 1  # advisory: Spark re-applies
    assert len(r.partitions()) == 2  # row groups [0,100) and [100,200)
    r2 = EventsRowGroupReader({"path": p})
    r2.pushFilters([EqualTo(("event_id",), 555)])
    assert len(r2.partitions()) == 1


def test_pyds_pushdown_end_to_end_exact(spark, tmp_path):
    """With spark.sql.python.filterPushdown.enabled the pruned scan
    must return EXACTLY the filtered rows (stats pruning is advisory;
    Spark's re-applied predicate guarantees the values)."""
    from kbrowse_spark.sources.pyds import register_events_rowgroup_source

    p = str(tmp_path / "rg_events2.parquet")
    _write_rowgrouped_events(p)
    register_events_rowgroup_source(spark)
    prev = spark.conf.get("spark.sql.python.filterPushdown.enabled", "false")
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        df = (
            spark.read.format("events_rowgroups")
            .option("path", p)
            .load()
            .filter(F.col("event_id") < 150)
        )
        got = sorted(r.event_id for r in df.collect())
    finally:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", prev)
    assert got == list(range(150))


def test_orc_roundtrip_preserves_values(spark, sf_dir, tmp_path):
    """ORC is first-class in Spark (vectorized reader, predicate
    pushdown); round-trip the orders table and prove the pushed filter
    reaches the OrcScan."""
    from pyspark.sql import functions as F

    from kbrowse_spark.sources.tables import load

    o = load(spark, sf_dir, "orders")
    dest = str(tmp_path / "orders_orc")
    o.write.orc(dest)
    back = spark.read.orc(dest)
    assert back.count() == o.count()
    a = o.agg(F.sum(F.col("o_totalprice").cast("decimal(25,6)"))).collect()
    b = back.agg(
        F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
    ).collect()
    assert a == b
    plan = (
        back.filter(F.col("o_orderkey") < 100)
        .select("o_orderkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # Tolerant of filter ordering / whitespace shifts across Spark
    # minor versions: require only that the LessThan predicate appears
    # inside the PushedFilters line.
    import re

    m = re.search(r"PushedFilters: \[[^\]]*\]", plan)
    assert m, plan
    assert re.search(r"LessThan\(o_orderkey, ?100", m.group(0)), m.group(0)


def test_csv_corrupt_record_modes(spark, tmp_path):
    """The three CSV malformed-record policies a production ingest
    needs: PERMISSIVE routes bad rows to _corrupt_record, DROPMALFORMED
    silently drops them, FAILFAST raises."""
    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    p = tmp_path / "mixed.csv"
    p.write_text("1,alpha\n2,beta\nnot_a_number,gamma\n3,delta\n")
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    path = str(p)

    permissive = spark.read.schema(schema).option("mode", "PERMISSIVE").csv(path)
    # Spark requires caching before filtering on _corrupt_record.
    permissive = permissive.cache()
    bad = permissive.filter(F.col("_corrupt_record").isNotNull()).collect()
    assert len(bad) == 1 and "not_a_number" in bad[0]._corrupt_record
    assert permissive.count() == 4
    permissive.unpersist()

    dropped = (
        spark.read.schema(schema).option("mode", "DROPMALFORMED").csv(path)
    )
    assert sorted(r.id for r in dropped.collect() if r.id is not None) == [1, 2, 3]

    failfast = spark.read.schema(
        StructType(schema.fields[:2])
    ).option("mode", "FAILFAST").csv(path)
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        failfast.collect()


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    """Schema evolution on the read path: files written before and
    after a column was added must union under mergeSchema, with the
    missing column NULL for old files — the contract an append-only
    100 TB lake depends on when producers upgrade."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "evolving")
    spark.range(5).select(F.col("id").alias("a")).write.mode(
        "append"
    ).parquet(path)
    spark.range(5, 8).select(
        F.col("id").alias("a"), (F.col("id") * 10).alias("b")
    ).write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"a", "b"}
    assert merged.count() == 8
    assert merged.filter(F.col("b").isNull()).count() == 5
    assert (
        merged.agg(F.sum("b")).collect()[0][0] == 50 + 60 + 70
    )


def test_xml_source_roundtrip_and_payload_decode(spark, sf_dir, tmp_path):
    """Spark 4 native XML: write/read with rowTag plus from_xml payload
    decoding — the remaining file-format cell of the source matrix
    (parquet/CSV/JSON/ORC are covered above)."""
    from kbrowse_spark.sources.tables import load

    region = load(spark, sf_dir, "region")
    path = str(tmp_path / "region_xml")
    region.write.format("xml").option("rootTag", "regions").option(
        "rowTag", "region"
    ).save(path)
    back = (
        spark.read.format("xml")
        .schema("r_regionkey int, r_name string")
        .option("rowTag", "region")
        .load(path)
    )
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, region.collect())
    )

    # Embedded-payload decode: from_xml over a string column (the XML
    # analogue of the JSON-lines schema-on-read path above).
    rows = [(f"<e><id>{i}</id><tag>t{i}</tag></e>",) for i in range(5)]
    df = spark.createDataFrame(rows, "raw string")
    parsed = df.select(
        F.from_xml("raw", "id LONG, tag STRING").alias("x")
    ).select("x.id", "x.tag")
    assert sorted(map(tuple, parsed.collect())) == [
        (i, f"t{i}") for i in range(5)
    ]
