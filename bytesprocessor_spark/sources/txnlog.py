"""S15 — transaction-log table format: snapshot-isolated parquet
tables with time travel, in the spirit of the open lakehouse formats
(Delta/Iceberg's core idea: the TABLE is the log, not the directory).

Why the engine needs it: the ingest jobs in this repo (partition
backfill S13, CDC apply J9/ST9, compaction S9) all assume readers can
see a CONSISTENT snapshot while writers land new files.  Plain
directory-listing parquet cannot give that — a reader that lists
mid-commit sees half a write.  The fix is the standard one: data files
are immutable and anonymous; a numbered JSON manifest names the exact
file set of each version; readers resolve the manifest chain, never
the directory.

Layout::

    table_dir/
      _txnlog/00000000.json     # one manifest per committed version
      _txnlog/00000001.json
      data/<uuid>/...parquet    # immutable, written before commit

Each manifest is a FULL snapshot (Iceberg-style), not a delta: it
carries the complete relative file list, so any version is readable
without replaying history.

Concurrency: optimistic.  The commit writes the manifest body to a
temp file (json + flush + fsync), then claims ``_txnlog/<next>.json``
atomically with ``os.link`` — the version file either exists with its
FULL body or not at all, so concurrent readers can never load a
partial manifest, and a writer crash mid-commit leaves only an
orphaned temp file (reclaimed by ``vacuum``), never a truncated
manifest.  If another writer claimed the version number first, the
link fails (FileExistsError), the writer re-reads the latest snapshot
and retries with the next number.  Data files are written BEFORE the
manifest, so a crashed writer leaves only unreferenced files (cleaned
by ``vacuum``), never a corrupt table.

Scale posture: commits are O(1) metadata writes regardless of data
volume; reads are manifest-resolved (no object-store LIST on the data
path — the operation that kills S3-scale tables); history is bounded
by ``vacuum(keep_versions=...)``.  On a real deployment the
temp-write + ``os.link`` claim collapses to a SINGLE conditional PUT
(if-none-match) of the complete manifest body — the object store's
atomic create-if-absent gives the same no-partial-manifest guarantee
the local temp+link dance provides.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

_LOG_DIR = "_txnlog"
_DATA_DIR = "data"


class TxnConflict(RuntimeError):
    """Another writer committed the version this writer targeted."""


def _log_path(table_dir: str) -> str:
    return os.path.join(table_dir, _LOG_DIR)


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(_log_path(table_dir), f"{version:08d}.json")


def _list_versions(table_dir: str) -> list[int]:
    log = _log_path(table_dir)
    if not os.path.isdir(log):
        return []
    out = []
    for name in os.listdir(log):
        if name.endswith(".json"):
            try:
                out.append(int(name[:-5]))
            except ValueError:
                continue
    return sorted(out)


def latest_version(table_dir: str) -> int | None:
    vs = _list_versions(table_dir)
    return vs[-1] if vs else None


def read_manifest(table_dir: str, version: int) -> dict:
    with open(_manifest_path(table_dir, version)) as f:
        return json.load(f)


def txn_write(
    df: DataFrame,
    table_dir: str,
    mode: str = "append",
    max_retries: int = 5,
    extra: dict | None = None,
    allow_schema_change: bool = False,
) -> int:
    """Commit ``df`` to the table; returns the committed version.

    ``mode="append"`` adds the new files to the current snapshot;
    ``mode="overwrite"`` replaces the snapshot.  Data lands fully
    before the manifest is attempted, so concurrent readers never see
    partial data; version-number collision with a concurrent writer
    retries against the refreshed snapshot (the new files are already
    on disk and stay valid — only the manifest race is retried).

    Appends are SCHEMA-GUARDED: a batch whose schema differs from the
    current snapshot's is rejected (the silent-widening failure mode —
    a reader resolving the manifest would otherwise scan mixed-schema
    file sets).  Pass ``allow_schema_change=True`` for a deliberate
    evolution (the new schema becomes the snapshot schema; old files
    surface the usual mergeSchema NULL semantics), or use
    ``mode="overwrite"`` which replaces the file set anyway.  A
    rejected append leaves only an unreferenced data dir (reclaimed by
    ``vacuum``), never a manifest.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    os.makedirs(_log_path(table_dir), exist_ok=True)

    # 1. land immutable data under an anonymous directory (uuid only —
    # no version prefix: the committed version is decided by the
    # manifest race below, so a name chosen now could be stale after a
    # collision retry; manifests reference paths, names carry no meaning)
    rel = os.path.join(_DATA_DIR, uuid.uuid4().hex)
    df.write.parquet(os.path.join(table_dir, rel))

    # 2. commit the manifest: write the FULL body to a temp file
    # (flush + fsync), then claim the version atomically with
    # os.link — a reader can never observe a partial manifest and a
    # crash never leaves a truncated one; link's FileExistsError on
    # collision preserves the optimistic-retry semantics.
    for _ in range(max_retries):
        current = latest_version(table_dir)
        version = 0 if current is None else current + 1
        prev = read_manifest(table_dir, current) if current is not None else {}
        if (
            mode == "append"
            and not allow_schema_change
            and prev.get("schema") is not None
        ):
            # nullability-free comparison: a batch-vs-stream or
            # range-vs-parquet round trip flips nullable flags without
            # changing the data contract
            from pyspark.sql.types import StructType

            prev_sig = StructType.fromJson(json.loads(prev["schema"])).simpleString()
            if prev_sig != df.schema.simpleString():
                raise ValueError(
                    f"append schema differs from snapshot v{current} of"
                    f" {table_dir} ({df.schema.simpleString()} vs"
                    f" {prev_sig}); pass allow_schema_change=True for a"
                    " deliberate evolution"
                )
        files = list(prev["files"]) if mode == "append" and prev else []
        files.append(rel)
        manifest = {
            "version": version,
            "mode": mode,
            "files": files,
            "schema": df.schema.json(),
            **(extra or {}),
        }
        # Exactly-once bookkeeping survives manifest vacuuming: every
        # manifest carries, PER QUERY IDENTITY, the highest batch_id
        # that query ever committed (Delta's (txnAppId, txnVersion)
        # pattern), so the replay check reads only the LATEST manifest,
        # not the full — prunable — history.  Keying per query id is
        # what lets two streaming queries (two checkpoints, each with
        # its own monotone batch-id sequence starting at 0) share one
        # table without one query's high-water mark swallowing the
        # other's batches.  Marks from manifests written before this
        # field existed (legacy single "max_batch_id") are migrated
        # under the "default" query id — the only identity the old
        # single-query-per-table protocol could have meant.
        marks = dict(prev.get("txn_max_batch", {}))
        if "txn_max_batch" not in prev and "max_batch_id" in prev:
            marks["default"] = prev["max_batch_id"]
        qid = manifest.get("txn_query_id")
        this_batch = manifest.get("batch_id", -1)
        if qid is not None and this_batch >= 0:
            marks[qid] = max(marks.get(qid, -1), this_batch)
        manifest["txn_max_batch"] = marks
        # legacy field kept for readers of the old protocol
        manifest["max_batch_id"] = max(prev.get("max_batch_id", -1), this_batch)
        tmp = os.path.join(_log_path(table_dir), f".tmp-{uuid.uuid4().hex}.json")
        fd = os.open(tmp, os.O_WRONLY | os.O_CREAT | os.O_EXCL, 0o644)
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(manifest, f)
                f.flush()
                os.fsync(f.fileno())
            try:
                os.link(tmp, _manifest_path(table_dir, version))
            except FileExistsError:
                continue  # lost the race — re-read snapshot, try next number
            except FileNotFoundError:
                # a concurrent vacuum (min_age_seconds too small) swept
                # our live temp between write and link — non-fatal: the
                # next loop iteration rewrites a fresh temp and retries
                continue
            return version
        finally:
            try:
                os.unlink(tmp)
            except FileNotFoundError:
                pass  # already swept by a concurrent vacuum
    raise TxnConflict(
        f"could not commit to {table_dir} after {max_retries} attempts"
    )


def txn_read(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Snapshot read: resolve the manifest (latest, or ``version`` for
    time travel) and scan exactly its file set — never the directory."""
    if version is None:
        version = latest_version(table_dir)
        if version is None:
            raise FileNotFoundError(f"no committed versions in {table_dir}")
    path = _manifest_path(table_dir, version)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"version {version} does not exist in {table_dir} "
            f"(vacuumed or never committed)"
        )
    manifest = read_manifest(table_dir, version)
    paths = [os.path.join(table_dir, rel) for rel in manifest["files"]]
    return spark.read.parquet(*paths)


def txn_changes(
    spark: SparkSession,
    table_dir: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Incremental (change-feed) read: the rows APPENDED between
    ``from_version`` (exclusive) and ``to_version`` (inclusive,
    default latest) — scan exactly the manifest file-set difference,
    never the whole table.  The consumer loop a downstream
    incremental job runs: remember the last version it processed,
    read only the delta, advance.

    Append-only semantics are REQUIRED and verified: if any file of
    the from-snapshot is missing from the to-snapshot, an overwrite
    or compaction rewrote history inside the range, and the file-set
    difference is NOT the logical change set — raises ``ValueError``
    (re-sync from a full snapshot instead; a compaction rewrites
    bytes, not rows, but the diff can no longer attribute them).
    An empty range returns an empty frame with the snapshot schema.
    """
    if to_version is None:
        to_version = latest_version(table_dir)
        if to_version is None:
            raise FileNotFoundError(f"no committed versions in {table_dir}")
    if to_version < from_version:
        raise ValueError(
            f"to_version {to_version} precedes from_version {from_version}"
        )
    m_from = read_manifest(table_dir, from_version)
    m_to = read_manifest(table_dir, to_version)
    from_files = set(m_from["files"])
    missing = from_files - set(m_to["files"])
    if missing:
        raise ValueError(
            f"non-append history between v{from_version} and v{to_version}"
            f" of {table_dir}: {len(missing)} base file(s) rewritten"
            " (overwrite/compact inside the range) — the manifest diff is"
            " not a change feed; re-sync from a snapshot read"
        )
    new_files = [rel for rel in m_to["files"] if rel not in from_files]
    if not new_files:
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(json.loads(m_to["schema"]))
        return spark.createDataFrame([], schema)
    return spark.read.parquet(
        *[os.path.join(table_dir, rel) for rel in new_files]
    )


def txn_compact(
    spark: SparkSession,
    table_dir: str,
    target_file_bytes: int = 256 * 1024 * 1024,
    min_files: int = 2,
) -> int | None:
    """Snapshot-isolated compaction (the lakehouse OPTIMIZE): rewrite
    the CURRENT snapshot's file set into ~``target_file_bytes`` files
    under a NEW version, leaving every older version readable for time
    travel (old files are reclaimed by ``vacuum`` once retention
    passes).  Row set and schema are unchanged — only layout.

    Concurrency is compare-and-swap, NOT retry: the compaction is only
    valid against the exact snapshot it read, so if ANY writer commits
    between the read and the manifest claim, the claim fails and this
    raises :class:`TxnConflict` — rerun against the new snapshot (a
    retry loop here would silently drop the interleaved append, the
    lost-update bug table formats document for OPTIMIZE).  Streaming
    exactly-once marks ride the new manifest unchanged, so replay
    protection survives compaction like it survives vacuum.

    Returns the committed version, or ``None`` when the snapshot
    already has fewer than ``min_files`` files (nothing to do).  At
    100 TB run per partition on a schedule, like ``compact_parquet``;
    the transaction here is what lets readers keep resolving a
    consistent snapshot while the rewrite lands.
    """
    import shutil

    current = latest_version(table_dir)
    if current is None:
        raise FileNotFoundError(f"no committed versions in {table_dir}")
    prev = read_manifest(table_dir, current)
    if len(prev["files"]) < min_files:
        return None

    total = 0
    for rel in prev["files"]:
        root = os.path.join(table_dir, rel)
        for dirpath, _, names in os.walk(root):
            total += sum(
                os.path.getsize(os.path.join(dirpath, n))
                for n in names
                if n.endswith(".parquet")
            )
    n_out = max(1, -(-total // target_file_bytes))  # ceil

    rel = os.path.join(_DATA_DIR, uuid.uuid4().hex)
    txn_read(spark, table_dir, version=current).coalesce(n_out).write.parquet(
        os.path.join(table_dir, rel)
    )

    version = current + 1
    manifest = dict(prev)
    manifest.update(
        {"version": version, "mode": "compact", "files": [rel],
         "compaction_of": current}
    )
    tmp = os.path.join(_log_path(table_dir), f".tmp-{uuid.uuid4().hex}.json")
    fd = os.open(tmp, os.O_WRONLY | os.O_CREAT | os.O_EXCL, 0o644)
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, _manifest_path(table_dir, version))
        except FileExistsError:
            # a writer committed after our snapshot read — committing
            # anyway would drop their files (lost update).  Abandon the
            # rewritten dir to vacuum and surface the conflict.
            shutil.rmtree(os.path.join(table_dir, rel), ignore_errors=True)
            raise TxnConflict(
                f"snapshot advanced past v{current} during compaction of"
                f" {table_dir}; rerun against the new snapshot"
            )
        return version
    finally:
        try:
            os.unlink(tmp)
        except FileNotFoundError:
            pass


def txn_vacuum(
    table_dir: str, keep_versions: int = 1, min_age_seconds: float = 0.0
) -> dict:
    """Drop data directories unreferenced by the ``keep_versions``
    newest manifests, and the manifests older than those.  Returns
    counts.  Readers pinned to a vacuumed version get a clean
    FileNotFoundError from txn_read.

    CONCURRENCY CONTRACT: an in-flight writer that has landed data
    (txn_write step 1) but not yet committed its manifest looks
    unreferenced — vacuuming it would corrupt the writer's imminent
    commit.  When writers may be live, pass ``min_age_seconds``
    greater than the longest possible write duration (the standard
    lakehouse retention-window rule); directories younger than that
    are skipped.  The default 0 is only safe with no concurrent
    writers."""
    import shutil
    import time

    if keep_versions < 1:
        raise ValueError(
            f"keep_versions must be >= 1 (got {keep_versions}); the"
            " latest snapshot must always survive a vacuum"
        )
    # orphaned commit temp files (writer crashed between temp write and
    # the os.link claim) — swept FIRST, before the committed-version
    # early-exit below, so a table with zero committed versions still
    # reclaims its orphans.  Same age guard as in-flight data: a LIVE
    # committer's temp younger than min_age_seconds is spared (and a
    # sweep that does race a committer is non-fatal — txn_write retries
    # on the resulting FileNotFoundError).
    log = _log_path(table_dir)
    if os.path.isdir(log):
        now = time.time()
        for name in os.listdir(log):
            if name.startswith(".tmp-") and name.endswith(".json"):
                full = os.path.join(log, name)
                try:
                    if now - os.path.getmtime(full) >= min_age_seconds:
                        os.remove(full)
                except OSError:
                    pass

    versions = _list_versions(table_dir)
    if not versions:
        return {"removed_files": 0, "removed_manifests": 0}
    kept = versions[-keep_versions:]
    referenced: set[str] = set()
    for v in kept:
        referenced.update(read_manifest(table_dir, v)["files"])

    removed_files = 0
    data_root = os.path.join(table_dir, _DATA_DIR)
    if os.path.isdir(data_root):
        now = time.time()
        for name in os.listdir(data_root):
            rel = os.path.join(_DATA_DIR, name)
            if rel in referenced:
                continue
            full = os.path.join(table_dir, rel)
            if min_age_seconds > 0:
                try:
                    if now - os.path.getmtime(full) < min_age_seconds:
                        continue  # possibly an in-flight writer's data
                except OSError:
                    continue
            shutil.rmtree(full, ignore_errors=True)
            removed_files += 1

    removed_manifests = 0
    for v in versions:
        if v not in kept:
            os.remove(_manifest_path(table_dir, v))
            removed_manifests += 1
    return {"removed_files": removed_files, "removed_manifests": removed_manifests}


def txn_exactly_once_sink(
    table_dir: str, mode: str = "append", query_id: str = "default"
):
    """ST18 — exactly-once streaming sink over the transaction log.

    Structured Streaming's file sink is at-least-once across query
    restarts (a batch that wrote data but crashed before the sink
    commit is REPLAYED).  This returns a ``foreachBatch`` function
    that makes the replay idempotent the standard lakehouse way —
    Delta's ``(txnAppId, txnVersion)`` pattern: each commit's manifest
    records ``(query_id, batch_id)`` and carries forward
    ``txn_max_batch`` (the highest batch id ever committed PER query
    id), so a replayed batch (``batch_id <= txn_max_batch[query_id]``
    of the LATEST manifest — Structured Streaming batch ids are
    monotone per checkpoint) is skipped wholesale — the data files the
    crashed attempt landed stay unreferenced (no manifest points at
    them) and are reclaimed by ``vacuum``.  Because the high-water
    marks ride every manifest, idempotence SURVIVES ``txn_vacuum``
    pruning old manifests (the retention caveat Delta documents for
    txn app-id dedup does not apply here).

    ``query_id`` is the query's durable identity — it must be stable
    across restarts of the SAME query (same checkpoint) and DISTINCT
    for different queries writing the same table.  Two queries with
    their own checkpoints both restart batch ids at 0; without
    per-identity keying one query's high-water mark would silently
    swallow the other's batches.  If you delete a query's checkpoint
    (its batch ids restart at 0), pass a fresh ``query_id`` — to the
    table that is a new query.  Tables written by older builds carry
    their single high-water mark under the ``"default"`` identity.

    Usage::

        q = (stream.writeStream
             .foreachBatch(txn_exactly_once_sink(table_dir,
                                                 query_id="ingest-v1"))
             .option("checkpointLocation", ckpt).start())

    Scale: the id check reads ONE manifest (the latest), never data.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        current = latest_version(table_dir)
        if current is not None:
            m = read_manifest(table_dir, current)
            marks = m.get("txn_max_batch")
            if marks is None:
                # legacy manifest: its single mark belongs to "default"
                marks = {"default": m.get("max_batch_id", -1)}
            if batch_id <= marks.get(query_id, -1):
                return  # replayed batch — this query already committed it
        txn_write(
            batch_df,
            table_dir,
            mode=mode,
            extra={"batch_id": batch_id, "txn_query_id": query_id},
        )

    return write_batch
