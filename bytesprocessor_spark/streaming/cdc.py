"""Streaming CDC apply: maintain a materialized table from a change
stream (SURVEY §2.9 ST9).

The lakehouse upsert loop: a stream of change rows (inserts, updates,
deletes, each with a monotonically increasing version) is applied to a
parquet target with ``foreachBatch`` + ``operators.merge.merge_upsert``.
Each micro-batch:

  1. reads the current target snapshot,
  2. merges the batch's changes (max-version-wins per key, so replayed
     batches — Spark's at-least-once foreachBatch contract — apply
     idempotently),
  3. writes the new snapshot to a fresh directory and atomically swaps
     a pointer file to it (classic swap-safe rewrite; a transactional
     format like Delta/Iceberg replaces step 3 with a commit).

At 100 TB the FULL-rewrite in step 3 is the naive form; the scale form
partitions the target by a key prefix and rewrites only partitions the
batch touches (merge_upsert's join prunes untouched partitions when the
source is pre-filtered to its key range).  The swap protocol here keeps
that property: each partition directory could be swapped independently.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _pointer(path: str) -> str:
    return os.path.join(path, "_CURRENT")


_TOMBSTONE = "__deleted"


def read_cdc_table(spark: SparkSession, path: str) -> DataFrame:
    """Read the current snapshot of a CDC-maintained table (tombstoned
    rows filtered out, the flag column dropped)."""
    with open(_pointer(path)) as f:
        df = spark.read.parquet(os.path.join(path, f.read().strip()))
    if _TOMBSTONE in df.columns:
        df = df.where(~F.coalesce(F.col(_TOMBSTONE), F.lit(False))).drop(_TOMBSTONE)
    return df


def init_cdc_table(
    initial: DataFrame, path: str, version_col: str | None = None
) -> None:
    """Materialize ``initial`` as snapshot gen-0 of a CDC table.

    Pass ``version_col`` to PERSIST the change version in the snapshot
    (initialized to 0 when the initial load doesn't carry one): with
    the version in the target, merge_upsert's >= guard makes the apply
    idempotent across replayed AND reordered micro-batches — without
    it, a restarted stream delivering an old change file after a newer
    one would silently roll rows back.  Versioned tables also keep
    DELETE TOMBSTONES (a flag column, filtered by read_cdc_table)
    rather than hard-dropping rows, so a stale replayed upsert can't
    resurrect a deleted key."""
    os.makedirs(path, exist_ok=True)
    if version_col is not None:
        if version_col not in initial.columns:
            initial = initial.withColumn(version_col, F.lit(0).cast("long"))
        initial = initial.withColumn(_TOMBSTONE, F.lit(False))
    initial.write.mode("overwrite").parquet(os.path.join(path, "gen-0"))
    tmp = _pointer(path) + ".tmp"
    with open(tmp, "w") as f:
        f.write("gen-0")
    os.replace(tmp, _pointer(path))


def apply_cdc_stream(
    changes: DataFrame,
    path: str,
    keys: Sequence[str],
    delete_col: str | None = "is_delete",
    version_col: str | None = "version",
    checkpoint: str | None = None,
    available_now: bool = False,
    keep_generations: int = 2,
):
    """Start a streaming query that folds ``changes`` into the table at
    ``path``.  Returns the StreamingQuery (caller stops/awaits it).

    ``keep_generations`` bounds disk: after each pointer swap, snapshot
    directories older than the newest N are deleted (every superseded
    generation is garbage once the pointer moved — without retention a
    long-running stream accumulates one full table copy per batch)."""
    from bytesprocessor_spark.operators.merge import merge_upsert

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if not batch.head(1):
            return
        spark = batch.sparkSession
        with open(_pointer(path)) as f:
            cur = f.read().strip()
        target = spark.read.parquet(os.path.join(path, cur))
        merged = merge_upsert(
            target,
            batch,
            keys,
            delete_col=delete_col,
            version_col=version_col,
            soft_delete_col=_TOMBSTONE if _TOMBSTONE in target.columns else None,
        )
        gen = int(cur.split("-")[1]) + 1
        nxt = f"gen-{gen}"
        merged.write.mode("overwrite").parquet(os.path.join(path, nxt))
        tmp = _pointer(path) + f".tmp-{batch_id}"
        with open(tmp, "w") as f:
            f.write(nxt)
        os.replace(tmp, _pointer(path))
        for name in os.listdir(path):
            if name.startswith("gen-") and int(name.split("-")[1]) <= gen - keep_generations:
                shutil.rmtree(os.path.join(path, name), ignore_errors=True)

    writer = changes.writeStream.foreachBatch(_apply).outputMode("update")
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    if available_now:  # drain the backlog, then stop (batch-style runs, tests)
        writer = writer.trigger(availableNow=True)
    return writer.start()
