"""WebDataset-style tar-shard ingest/egress (S12).

Large-scale training pipelines move multimodal samples as tar shards
(the WebDataset convention, github.com/webdataset/webdataset): each
shard is a plain tar whose members share a basename per sample —
``000017.txt`` + ``000017.jpg`` + ``000017.json`` is one sample.  The
format needs no index, streams sequentially, and shards are the unit
of parallelism.

Spark mapping — everything stays executor-side and shard-parallel:

  * **read**: ``binaryFile`` gives (path, content) with one task per
    shard; a stdlib-``tarfile`` ``mapInPandas`` explodes members out
    of the in-memory bytes.  No Python loop ever sees more than one
    Arrow batch of shards; at 100 TB the unit of work is the shard,
    exactly how the format is meant to scale.
  * **group**: member rows pivot to one row per sample key with an
    ext->payload map (``collect_list`` + ``map_from_entries`` — one
    shuffle on the sample key, or zero when consumers keep the
    shard-local grouping).
  * **write**: samples hash-partition to a shard id, and one
    ``applyInPandas`` per shard streams a tar to the target directory,
    returning a manifest row (shard, members, bytes).  Deterministic:
    member order inside a shard is sorted (key, ext), shard assignment
    is a content-independent hash of the key.

The tar payloads themselves are opaque binary — pytest pins the
round-trip (write -> read -> group == original), the balanced-shard
property, and the member ordering; there is no SQL-expressible oracle
for a binary container (same policy as the pcap source family).
"""

from __future__ import annotations

import io
import os
import tarfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MEMBER_SCHEMA = "shard string, key string, ext string, payload binary"
_MANIFEST_SCHEMA = "shard int, n_members long, n_bytes long"


CORRUPT_EXT = "__corrupt__"


def _explode_members(batches, tolerant: bool = False):
    """Arrow-batched (path, content) -> one row per tar member.  With
    ``tolerant``, a shard whose container structure is unreadable
    yields ONE quarantine row (ext = CORRUPT_EXT, payload = the raw
    bytes, for forensics) instead of failing the task — a single
    corrupt shard must not kill a 100 TB ingest (the S6 tolerant-CSV
    policy applied to containers).  Caveat: a tar truncated exactly at
    a block boundary still parses as a shorter archive (stdlib
    tarfile semantics) — catching silent tail loss needs a
    member-count manifest check, which write_tar_shards provides."""
    for pdf in batches:
        out = {"shard": [], "key": [], "ext": [], "payload": []}
        for p, content in zip(pdf["path"], pdf["content"]):
            raw = bytes(content)
            shard = os.path.basename(p)
            # stage the shard's members locally and commit them to the
            # batch only if the WHOLE shard parses: a mid-member
            # failure must not leave ragged columns (DataFrame
            # construction error) or emit a partial sample set that
            # looks healthy next to the quarantine row
            staged: list[tuple[str, str, str, bytes]] = []
            try:
                with tarfile.open(fileobj=io.BytesIO(raw)) as tf:
                    for m in tf.getmembers():
                        if not m.isfile():
                            continue
                        base, dot, ext = m.name.rpartition(".")
                        staged.append(
                            (
                                shard,
                                base if dot else m.name,
                                ext if dot else "",
                                tf.extractfile(m).read(),
                            )
                        )
            except (tarfile.TarError, EOFError, OSError):
                if not tolerant:
                    raise
                staged = [(shard, shard, CORRUPT_EXT, raw)]
            for s, k, e, pl in staged:
                out["shard"].append(s)
                out["key"].append(k)
                out["ext"].append(e)
                out["payload"].append(pl)
        yield pd.DataFrame(out)


def _explode_members_tolerant(batches):
    return _explode_members(batches, tolerant=True)


def read_tar_shards(spark: SparkSession, path: str, tolerant: bool = False) -> DataFrame:
    """(shard, key, ext, payload): every member of every ``*.tar``
    under ``path``, one input task per shard.  ``tolerant`` quarantines
    unreadable shards as CORRUPT_EXT rows instead of failing."""
    raw = spark.read.format("binaryFile").load(os.path.join(path, "*.tar"))
    fn = _explode_members_tolerant if tolerant else _explode_members
    return raw.select("path", "content").mapInPandas(fn, _MEMBER_SCHEMA)


def stream_tar_shards(
    spark: SparkSession, landing_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """Streaming twin of :func:`read_tar_shards`: watch a landing
    directory for arriving shards and explode members per micro-batch
    (the ingest-time shape — shards land from the crawler, members
    flow into the curation pipeline with exactly-once file-source
    semantics).  ``maxFilesPerTrigger`` bounds micro-batch size."""
    raw = (
        spark.readStream.format("binaryFile")
        .schema("path string, modificationTime timestamp, length long, content binary")
        .option("pathGlobFilter", "*.tar")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(landing_dir)
    )
    return raw.select("path", "content").mapInPandas(
        _explode_members, _MEMBER_SCHEMA
    )


def group_samples(members: DataFrame) -> DataFrame:
    """(key, parts): pivot member rows into one row per sample with an
    ext->payload map — the shape a training loader consumes."""
    return (
        members.groupBy("key")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("ext", "payload")))
            ).alias("parts")
        )
    )


def audit_tar_shards(
    spark: SparkSession, path: str, manifest: DataFrame
) -> DataFrame:
    """(shard, expected, actual, status): re-count each shard's
    readable members against the write-time manifest — the check that
    catches silent tail truncation (a tar cut at a block boundary
    parses as a shorter archive) and quarantined corruption.  Status:
    'ok' | 'short' | 'extra' | 'missing'.  One task per shard, join on
    the int shard id."""
    members = read_tar_shards(spark, path, tolerant=True)
    actual = (
        members.where(F.col("ext") != CORRUPT_EXT)
        .groupBy("shard")
        .agg(F.count("*").alias("actual"))
        .select(
            F.regexp_extract("shard", r"shard-(\d+)\.tar", 1)
            .cast("int")
            .alias("shard"),
            "actual",
        )
    )
    joined = manifest.select("shard", F.col("n_members").alias("expected")).join(
        actual, "shard", "full_outer"
    )
    act = F.coalesce("actual", F.lit(0))
    return joined.select(
        "shard",
        F.coalesce("expected", F.lit(0)).alias("expected"),
        act.alias("actual"),
        # a NULL expected means the shard is on disk but absent from
        # the manifest (stale rewrite leftovers, foreign files) — that
        # is 'extra', never 'ok'
        F.when(F.col("expected").isNull(), "extra")
        .when(act == 0, "missing")
        .when(act < F.col("expected"), "short")
        .when(act > F.col("expected"), "extra")
        .otherwise("ok")
        .alias("status"),
    )


def write_tar_shards(
    samples: DataFrame,
    path: str,
    n_shards: int,
    key_col: str = "key",
) -> DataFrame:
    """Write one tar per shard from (key, ext, payload) rows and
    return the manifest (shard, n_members, n_bytes).  Shard assignment
    is a deterministic hash of the sample key (all of a sample's
    members land together); member order inside a shard is sorted
    (key, ext) so re-runs produce byte-identical shards.

    The write executes EAGERLY and the manifest returns as a
    local-backed DataFrame (n_shards rows, bounded): a side-effecting
    sink must run exactly once, not re-fire whenever a lazy consumer
    re-evaluates its lineage."""
    os.makedirs(path, exist_ok=True)
    assigned = samples.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards)).cast("int")
    )

    def _write(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame({"shard": [], "n_members": [], "n_bytes": []})
        shard = int(pdf["shard"].iloc[0])
        pdf = pdf.sort_values([key_col, "ext"])
        out = os.path.join(path, f"shard-{shard:06d}.tar")
        n_bytes = 0
        with tarfile.open(out, "w") as tf:
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"])
                info = tarfile.TarInfo(name=f"{r[key_col]}.{r['ext']}")
                info.size = len(payload)
                info.mtime = 0  # fixed: byte-identical shards across runs
                tf.addfile(info, io.BytesIO(payload))
                n_bytes += len(payload)
        return pd.DataFrame(
            {"shard": [shard], "n_members": [len(pdf)], "n_bytes": [n_bytes]}
        )

    lazy = assigned.groupBy("shard").applyInPandas(_write, _MANIFEST_SCHEMA)
    rows = lazy.collect()  # run the sink exactly once
    return samples.sparkSession.createDataFrame(rows, _MANIFEST_SCHEMA)
