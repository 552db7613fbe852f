"""Grouped-map / UDAF / UDTF operators (U3-U5), stateful streaming
(ST6), and the CSV/JSON source/sink round trips (S6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bytesprocessor_spark.operators.grouped import (
    grouped_weighted_mean,
    grouped_zscore,
    register_range_udtf,
)
from bytesprocessor_spark.sources.tables import read_csv, read_json, write_csv, write_json


@pytest.fixture(scope="module")
def kv_df(spark):
    rows = [("a", 1.0, 1.0), ("a", 2.0, 1.0), ("a", 3.0, 1.0), ("b", 10.0, 1.0), ("b", 10.0, 3.0)]
    return spark.createDataFrame(rows, "k string, v double, w double")


def test_grouped_zscore(kv_df):
    out = {(r.k, r.v): r.zscore for r in grouped_zscore(kv_df, ["k"], "v").collect()}
    assert out[("a", 2.0)] == pytest.approx(0.0)
    assert out[("a", 1.0)] == pytest.approx(-1.0)
    assert out[("a", 3.0)] == pytest.approx(1.0)
    assert out[("b", 10.0)] == pytest.approx(0.0)  # zero-variance group -> 0, not NaN


def test_grouped_weighted_mean(kv_df):
    out = {r.k: r.weighted_mean for r in grouped_weighted_mean(kv_df, ["k"], "v", "w").collect()}
    assert out["a"] == pytest.approx(2.0)
    assert out["b"] == pytest.approx(10.0)


def test_udtf_register_and_query(spark):
    register_range_udtf(spark)
    rows = spark.sql("SELECT * FROM chunk_ranges(0, 10, 4)").collect()
    assert [(r.chunk_id, r.start, r.end) for r in rows] == [(0, 0, 4), (1, 4, 8), (2, 8, 10)]


def test_stateful_running_totals(spark, tmp_path):
    """ST6: applyInPandasWithState accumulates across micro-batches."""
    from bytesprocessor_spark.streaming.stateful import running_totals

    src_dir = str(tmp_path / "src")
    schema = "user_id long, value double"
    spark.createDataFrame([(1, 1.0), (1, 2.0), (2, 5.0)], schema).write.mode(
        "overwrite"
    ).parquet(src_dir)

    stream = spark.readStream.schema(schema).parquet(src_dir)
    out = running_totals(stream, keys=("user_id",), value_col="value")
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("totals")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.user_id: (r.n_events, r.total) for r in spark.sql("SELECT * FROM totals").collect()}
    assert got == {1: (2, 3.0), 2: (1, 5.0)}

    # second batch arrives -> state carries over
    spark.createDataFrame([(1, 4.0)], schema).write.mode("append").parquet(src_dir)
    q2 = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("totals2")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    # without a shared checkpoint the new query replays everything:
    # totals must include ALL rows for user 1
    got2 = {r.user_id: (r.n_events, r.total) for r in spark.sql("SELECT * FROM totals2").collect()}
    assert got2[1] == (3, 7.0)


def test_csv_json_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "x", 1.5), (2, "y", -2.0)], "id long, name string, score double"
    )
    csv_path, json_path = str(tmp_path / "c"), str(tmp_path / "j")
    write_csv(df, csv_path)
    write_json(df, json_path)
    back_csv = read_csv(spark, csv_path, schema="id long, name string, score double")
    back_json = read_json(spark, json_path, schema="id long, name string, score double")
    expect = sorted(map(tuple, df.collect()))
    assert sorted(map(tuple, back_csv.collect())) == expect
    assert sorted(map(tuple, back_json.select("id", "name", "score").collect())) == expect


def test_multimodal_image_features(spark):
    from bytesprocessor_spark.functions.multimodal import image_features, sample_video_frames

    media = spark.createDataFrame(
        [(1, "image", b"\x89PNGfake"), (2, "image", b"\xff\xd8jpegfake"), (3, "image", None)],
        "media_id long, kind string, payload binary",
    )
    rows = {r.media_id: r for r in image_features(media).collect()}
    assert len(rows) == 3
    assert rows[1].width >= 1 and rows[1].height >= 1
    assert len(rows[1].features) == 16 and all(0 <= v <= 1 for v in rows[1].features)
    # deterministic: same payload -> same fake decode
    again = {r.media_id: r for r in image_features(media).collect()}
    assert again[1].features == rows[1].features
    assert rows[3].n_bytes == 0  # null payload handled

    frames = sample_video_frames(media.where("media_id = 1"), n_frames=3).collect()
    assert [f.frame_idx for f in frames] == [0, 1, 2]
    assert all(len(f.frame) == 32 for f in frames)


def test_audio_stub_is_explicit():
    from bytesprocessor_spark.functions.multimodal import decode_audio_stub

    with pytest.raises(NotImplementedError):
        decode_audio_stub(b"RIFF")


def test_expectation_suite(spark):
    from bytesprocessor_spark.operators.quality import (
        DataQualityError,
        assert_expectations,
        expectation_report,
    )
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 50.0), (2, "zz", float("nan"))],
        "id long, code string, v double",
    )
    rep = {
        (r.expectation, r.target): r.n_violations
        for r in expectation_report(
            df,
            not_null=["v"],
            unique=["id"],
            in_range={"v": (0.0, 10.0)},
            in_set={"code": ["a", "b"]},
            matches={"code": "^[a-y]+$"},
        ).collect()
    }
    assert rep[("not_null", "v")] == 1      # NaN counts as violation
    assert rep[("unique", "id")] == 1       # one duplicated id
    assert rep[("in_range", "v[0.0,10.0]")] == 2  # 50.0 and NaN
    assert rep[("in_set", "code")] == 1     # "zz"
    assert rep[("matches", "code")] == 1    # "zz" fails ^[a-y]+$
    clean = df.where("id = 1")
    assert assert_expectations(clean, not_null=["v"], unique=["id"]) is clean
    with _pytest.raises(DataQualityError):
        assert_expectations(df, unique=["id"])


def test_merge_upsert_semantics(spark):
    from bytesprocessor_spark.operators.merge import merge_upsert

    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id long, s string, v long"
    )
    source = spark.createDataFrame(
        [(2, "B", 200, False, 1), (3, "x", 0, True, 1),       # update, delete
         (4, "d", 40, False, 1),                               # insert
         (2, "B2", 201, False, 2)],                            # later version of id=2
        "id long, s string, v long, is_delete boolean, ver long",
    )
    out = merge_upsert(target, source, ["id"], delete_col="is_delete", version_col="ver")
    rows = sorted(map(tuple, out.select("id", "s", "v").collect()))
    assert rows == [(1, "a", 10), (2, "B2", 201), (4, "d", 40)]
    # idempotent: re-applying the same batch changes nothing
    again = merge_upsert(out, source, ["id"], delete_col="is_delete", version_col="ver")
    assert sorted(map(tuple, again.select("id", "s", "v").collect())) == rows


def test_compact_parquet(spark, tmp_path):
    from bytesprocessor_spark.sources.tables import compact_parquet
    import os

    path = str(tmp_path / "many")
    df = spark.range(10000).withColumn("v", F.col("id") * 2)
    df.repartition(64).write.parquet(path)
    before = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(before) == 64
    compact_parquet(spark, path, target_file_bytes=1 << 30)  # everything fits one file
    after = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(after) == 1
    back = spark.read.parquet(path)
    assert back.count() == 10000
    assert back.agg(F.sum("v")).collect()[0][0] == 10000 * 9999


def test_read_csv_tolerant_quarantines_bad_rows(spark, tmp_path):
    """S6 error tolerance: malformed lines land in quarantine with the
    raw text preserved; good rows parse completely."""
    from bytesprocessor_spark.sources.tables import read_csv_tolerant

    p = str(tmp_path / "in.csv")
    with open(p, "w") as f:
        f.write("1,alice,10.5\n")
        f.write("2,bob,not_a_number\n")   # bad double
        f.write("3,carol,7.25\n")
    good, bad = read_csv_tolerant(spark, p, "id int, name string, v double")
    g = sorted((r.id, r.name, r.v) for r in good.collect())
    assert g == [(1, "alice", 10.5), (3, "carol", 7.25)]
    b = [r[0] for r in bad.collect()]
    assert b == ["2,bob,not_a_number"]


def test_orc_roundtrip(spark, tmp_path):
    """S6 format breadth: ORC sink/scan round-trips schema and values
    (ORC is the other columnar lake format Spark ships natively)."""
    p = str(tmp_path / "t.orc")
    df = spark.createDataFrame(
        [(1, "a", 1.5, [1.0, 2.0]), (2, "b", 2.5, [3.0])],
        "id long, s string, v double, arr array<double>",
    )
    df.write.mode("overwrite").orc(p)
    back = spark.read.orc(p)
    assert back.schema == df.schema
    assert sorted((r.id, r.s, r.v, tuple(r.arr)) for r in back.collect()) == [
        (1, "a", 1.5, (1.0, 2.0)),
        (2, "b", 2.5, (3.0,)),
    ]


def test_xml_roundtrip_and_tolerant(spark, tmp_path):
    """S6 XML surface: write -> read round-trip via Spark 4's built-in
    XML source, plus the PERMISSIVE quarantine posture on a malformed
    fragment (type-mismatched field lands in the corrupt column, good
    rows survive)."""
    from bytesprocessor_spark.sources.tables import read_xml, write_xml

    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "id long, name string"
    )
    p = str(tmp_path / "xml_out")
    write_xml(df, p, row_tag="rec")
    back = read_xml(spark, p, row_tag="rec")
    assert {(r.id, r.name) for r in back.collect()} == {(1, "alpha"), (2, "beta"), (3, "gamma")}

    bad = str(tmp_path / "bad.xml")
    with open(bad, "w") as f:
        f.write(
            "<rows><rec><id>1</id><name>ok</name></rec>"
            "<rec><id>not_a_number</id><name>broken</name></rec></rows>"
        )
    tol = read_xml(spark, bad, row_tag="rec", schema="id long, name string", tolerant=True)
    rows = tol.collect()
    good = [r for r in rows if r._corrupt_record is None]
    quarantined = [r for r in rows if r._corrupt_record is not None]
    assert [(r.id, r.name) for r in good] == [(1, "ok")]
    assert len(quarantined) == 1


def test_observe_quality_rides_the_action(spark, tmp_path):
    """Q3 in-flight metrics: observation values must arrive from the
    SAME action that writes the output (no second scan), and count
    nulls/NaNs + min/max correctly."""
    from bytesprocessor_spark.operators.quality import observe_quality

    df = spark.createDataFrame(
        [(1, 2.0), (2, float("nan")), (3, None), (4, 7.5)],
        "id long, v double",
    )
    observed, obs = observe_quality(df, not_null=["v"], stats=["id"])
    observed.write.mode("overwrite").format("noop").save()
    m = obs.get
    assert m["n_rows"] == 4
    assert m["null_v"] == 2  # one NULL + one NaN
    assert m["min_id"] == 1 and m["max_id"] == 4


def test_merge_upsert_cross_batch_version_guard(spark):
    """With the version PERSISTED in the target, a later batch carrying
    a STALE version must not roll rows back — the property that makes
    CDC apply order-independent across micro-batches (foreachBatch
    gives no cross-batch order guarantee after restart)."""
    from bytesprocessor_spark.operators.merge import merge_upsert

    target = spark.createDataFrame(
        [(1, "new", 2), (2, "base", 0)], "id long, v string, version long"
    )
    stale = spark.createDataFrame(
        [(1, "old", 1), (2, "upd", 1)], "id long, v string, version long"
    )
    out = {r.id: (r.v, r.version) for r in merge_upsert(target, stale, ["id"], version_col="version").collect()}
    assert out[1] == ("new", 2)   # stale change rejected
    assert out[2] == ("upd", 1)   # newer change applied

    # equal versions re-apply (idempotent replay of the same batch)
    replay = spark.createDataFrame([(1, "new", 2)], "id long, v string, version long")
    out2 = {r.id: r.v for r in merge_upsert(target, replay, ["id"], version_col="version").collect()}
    assert out2[1] == "new"


def test_read_json_tolerant_quarantines_bad_rows(spark, tmp_path):
    """S6b error tolerance over JSONL: structurally-broken AND
    valid-JSON-but-type-mismatched lines both land in quarantine with
    the raw text preserved; good rows parse completely."""
    from bytesprocessor_spark.sources.tables import read_json_tolerant

    p = str(tmp_path / "in.jsonl")
    with open(p, "w") as f:
        f.write('{"id": 1, "name": "alice", "v": 10.5}\n')
        f.write('{"id": 2, "name": "bob", "v": "not_a_number"}\n')  # type clash
        f.write('{"id": 3, "name": "carol", "v": 7.25\n')  # truncated JSON
        f.write('{"id": 4, "name": "dave", "v": 1.0}\n')
    good, bad = read_json_tolerant(spark, p, "id int, name string, v double")
    g = sorted((r.id, r.name, r.v) for r in good.collect())
    assert g == [(1, "alice", 10.5), (4, "dave", 1.0)]
    b = sorted(r[0] for r in bad.collect())
    assert b == [
        '{"id": 2, "name": "bob", "v": "not_a_number"}',
        '{"id": 3, "name": "carol", "v": 7.25',
    ]
