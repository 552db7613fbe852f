"""WebDataset tar-shard source/sink (S12): round-trip, balanced-shard,
and determinism properties — the binary-container policy is
pytest-pinned parity (like the pcap family), since a tar has no
SQL-expressible oracle."""

from __future__ import annotations

import hashlib
import os
import tarfile

from pyspark.sql import functions as F

from bytesprocessor_spark.sources.webdataset import (
    group_samples,
    read_tar_shards,
    write_tar_shards,
)


def _sample_rows(n):
    rows = []
    for i in range(n):
        key = f"{i:06d}"
        rows.append((key, "txt", f"document number {i}".encode()))
        rows.append((key, "bin", hashlib.sha256(key.encode()).digest()))
    return rows


def test_tar_shard_roundtrip(spark, tmp_path):
    rows = _sample_rows(40)
    df = spark.createDataFrame(rows, "key string, ext string, payload binary")
    out = str(tmp_path / "shards")
    manifest = write_tar_shards(df, out, n_shards=4).collect()
    assert sorted(r["shard"] for r in manifest) == [0, 1, 2, 3]
    assert sum(r["n_members"] for r in manifest) == 80

    back = read_tar_shards(spark, out)
    got = {(r["key"], r["ext"]): bytes(r["payload"]) for r in back.collect()}
    want = {(k, e): p for k, e, p in rows}
    assert got == want

    samples = {r["key"]: dict(r["parts"]) for r in group_samples(back).collect()}
    assert len(samples) == 40
    assert bytes(samples["000007"]["txt"]) == b"document number 7"


def test_tar_shards_are_balanced_and_cohesive(spark, tmp_path):
    """Hash sharding: all of a sample's members land in ONE shard, and
    no shard hoards the corpus."""
    df = spark.createDataFrame(
        _sample_rows(200), "key string, ext string, payload binary"
    )
    out = str(tmp_path / "shards")
    write_tar_shards(df, out, n_shards=8).collect()
    by_key = {}
    for f in sorted(os.listdir(out)):
        with tarfile.open(os.path.join(out, f)) as tf:
            for m in tf.getmembers():
                key = m.name.rsplit(".", 1)[0]
                by_key.setdefault(key, set()).add(f)
    assert all(len(s) == 1 for s in by_key.values())  # cohesion
    from collections import Counter

    sizes = Counter()
    for key, (f,) in ((k, tuple(s)) for k, s in by_key.items()):
        sizes[f] += 1
    assert max(sizes.values()) <= 3 * min(sizes.values())  # rough balance


def test_tar_shards_byte_identical_across_runs(spark, tmp_path):
    df = spark.createDataFrame(
        _sample_rows(30), "key string, ext string, payload binary"
    )
    outs = []
    for run in ("a", "b"):
        out = str(tmp_path / run)
        write_tar_shards(df, out, n_shards=2).collect()
        blob = b"".join(
            open(os.path.join(out, f), "rb").read() for f in sorted(os.listdir(out))
        )
        outs.append(hashlib.sha256(blob).hexdigest())
    assert outs[0] == outs[1]


def test_tar_stream_drains_all_members(spark, tmp_path):
    """Streaming twin: shards landing in a directory drain through
    availableNow with the same member rows as the batch reader."""
    import uuid

    from bytesprocessor_spark.sources.webdataset import stream_tar_shards

    df = spark.createDataFrame(
        _sample_rows(20), "key string, ext string, payload binary"
    )
    land = str(tmp_path / "landing")
    write_tar_shards(df, land, n_shards=3).collect()
    stream = stream_tar_shards(spark, land)
    assert stream.isStreaming
    sink = f"wds_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r["key"], r["ext"]) for r in spark.table(sink).collect()}
    assert len(got) == 40  # 20 samples x 2 members
    spark.catalog.dropTempView(sink)


def test_tar_corrupt_shard_quarantines_in_tolerant_mode(spark, tmp_path):
    """A truncated shard fails the strict reader but quarantines (one
    CORRUPT_EXT row carrying the raw bytes) in tolerant mode; healthy
    shards are unaffected either way."""
    import pytest

    from bytesprocessor_spark.sources.webdataset import CORRUPT_EXT

    df = spark.createDataFrame(
        _sample_rows(20), "key string, ext string, payload binary"
    )
    out = str(tmp_path / "shards")
    write_tar_shards(df, out, n_shards=2).collect()
    # corrupt one shard: garble the leading header block entirely
    victim = sorted(os.listdir(out))[0]
    vp = os.path.join(out, victim)
    blob = open(vp, "rb").read()
    open(vp, "wb").write(b"\xff" * 512 + blob[512:])

    with pytest.raises(Exception):
        read_tar_shards(spark, out).collect()

    rows = read_tar_shards(spark, out, tolerant=True).collect()
    bad = [r for r in rows if r["ext"] == CORRUPT_EXT]
    good = [r for r in rows if r["ext"] != CORRUPT_EXT]
    # the victim quarantines (raw bytes preserved for forensics);
    # the healthy shard is complete
    assert len(bad) == 1 and bad[0]["shard"] == victim
    assert len(bytes(bad[0]["payload"])) == len(blob)
    # every member of the intact shard is present
    intact = sorted(os.listdir(out))[1]
    with tarfile.open(os.path.join(out, intact)) as tf:
        n_intact = sum(1 for m in tf.getmembers() if m.isfile())
    assert sum(1 for r in good if r["shard"] == intact) == n_intact


def test_tar_audit_flags_truncated_shard(spark, tmp_path):
    """The manifest audit catches what tolerant reading can't: a tar
    truncated at a block boundary that silently parses shorter."""
    from bytesprocessor_spark.sources.webdataset import audit_tar_shards

    df = spark.createDataFrame(
        _sample_rows(20), "key string, ext string, payload binary"
    )
    out = str(tmp_path / "shards")
    manifest = write_tar_shards(df, out, n_shards=2)
    manifest_rows = manifest.collect()
    ok = audit_tar_shards(spark, out, manifest).collect()
    assert all(r["status"] == "ok" for r in ok)

    # drop the tail of shard 0 at a 512-block boundary: members vanish
    # silently (no parse error) — only the audit notices
    vp = os.path.join(out, "shard-000000.tar")
    blob = open(vp, "rb").read()
    cut = (len(blob) // 2 // 512) * 512
    open(vp, "wb").write(blob[:cut])
    audited = {r["shard"]: r for r in audit_tar_shards(spark, out, manifest).collect()}
    assert audited[0]["status"] in ("short", "missing")
    assert audited[0]["actual"] < audited[0]["expected"]
    assert audited[1]["status"] == "ok"


def test_tar_audit_flags_unmanifested_shard_as_extra(spark, tmp_path):
    """A shard on disk that the manifest doesn't know about (stale
    rewrite leftovers, foreign files) must report 'extra', never
    'ok'."""
    import shutil

    from bytesprocessor_spark.sources.webdataset import audit_tar_shards

    df = spark.createDataFrame(
        _sample_rows(20), "key string, ext string, payload binary"
    )
    out = str(tmp_path / "shards")
    manifest = write_tar_shards(df, out, n_shards=2)
    # drop a foreign shard into the directory
    src = os.path.join(out, "shard-000000.tar")
    shutil.copy(src, os.path.join(out, "shard-000099.tar"))
    audited = {r["shard"]: r["status"] for r in audit_tar_shards(spark, out, manifest).collect()}
    assert audited[99] == "extra"
    assert audited[0] == "ok" and audited[1] == "ok"


def test_tar_read_is_shard_parallel(spark, tmp_path):
    """One input task per shard: the reader must not coalesce all
    shards into a single task (the format's unit of parallelism)."""
    df = spark.createDataFrame(
        _sample_rows(40), "key string, ext string, payload binary"
    )
    out = str(tmp_path / "shards")
    write_tar_shards(df, out, n_shards=4).collect()
    back = read_tar_shards(spark, out)
    assert back.rdd.getNumPartitions() >= 2
