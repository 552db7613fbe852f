"""S15 transaction-log table format (sources/txnlog.py): snapshot
isolation, time travel, optimistic-concurrency retry, vacuum."""

import os

import pytest
from pyspark.sql import functions as F

from bytesprocessor_spark.sources.txnlog import (
    TxnConflict,
    _manifest_path,
    latest_version,
    read_manifest,
    txn_read,
    txn_vacuum,
    txn_write,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select("id", (F.col("id") * 10).alias("x"))


def test_append_accumulates_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v0 = txn_write(_df(spark, 0, 10), t, mode="append")
    v1 = txn_write(_df(spark, 10, 15), t, mode="append")
    assert (v0, v1) == (0, 1)
    assert txn_read(spark, t).count() == 15
    assert txn_read(spark, t, version=0).count() == 10
    assert sorted(r.id for r in txn_read(spark, t, version=1).collect()) == list(range(15))


def test_overwrite_replaces_snapshot_keeps_history(spark, tmp_path):
    t = str(tmp_path / "tbl")
    txn_write(_df(spark, 0, 10), t, mode="append")
    v1 = txn_write(_df(spark, 100, 103), t, mode="overwrite")
    assert v1 == 1
    assert txn_read(spark, t).count() == 3
    # the pre-overwrite snapshot is still fully readable (time travel)
    assert txn_read(spark, t, version=0).count() == 10


def test_conflict_retry_takes_next_version(spark, tmp_path):
    t = str(tmp_path / "tbl")
    txn_write(_df(spark, 0, 5), t)
    # simulate a concurrent writer that already claimed version 1
    os.makedirs(os.path.dirname(_manifest_path(t, 1)), exist_ok=True)
    with open(_manifest_path(t, 1), "w") as f:
        f.write('{"version": 1, "mode": "append", "files": []}')
    v = txn_write(_df(spark, 5, 8), t, mode="append")
    assert v == 2, "writer must retry past the claimed version"
    # the retried commit appended onto the REFRESHED snapshot (v1 = empty files)
    assert txn_read(spark, t, version=2).count() == 3


def test_conflict_exhaustion_raises(spark, tmp_path):
    t = str(tmp_path / "tbl")
    txn_write(_df(spark, 0, 5), t)
    for v in range(1, 4):
        with open(_manifest_path(t, v), "w") as f:
            f.write(f'{{"version": {v}, "mode": "append", "files": []}}')

    # every retry keeps colliding: pre-claim far ahead
    for v in range(4, 10):
        with open(_manifest_path(t, v), "w") as f:
            f.write(f'{{"version": {v}, "mode": "append", "files": []}}')
    with pytest.raises(TxnConflict):
        # latest keeps being taken; max_retries=0 forces instant failure
        txn_write(_df(spark, 5, 8), t, max_retries=0)


def test_vacuum_drops_unreferenced_and_old_versions(spark, tmp_path):
    t = str(tmp_path / "tbl")
    txn_write(_df(spark, 0, 10), t, mode="append")
    txn_write(_df(spark, 100, 103), t, mode="overwrite")
    stats = txn_vacuum(t, keep_versions=1)
    # v0's data dir is unreferenced by the latest snapshot -> dropped
    assert stats == {"removed_files": 1, "removed_manifests": 1}
    assert latest_version(t) == 1
    assert txn_read(spark, t).count() == 3
    with pytest.raises(FileNotFoundError):
        txn_read(spark, t, version=0)


def test_manifest_carries_full_snapshot(spark, tmp_path):
    t = str(tmp_path / "tbl")
    txn_write(_df(spark, 0, 5), t)
    txn_write(_df(spark, 5, 9), t)
    m = read_manifest(t, 1)
    assert len(m["files"]) == 2 and m["version"] == 1
    # schema is recorded for readers that need it without data access
    assert "fields" in m["schema"]


def test_exactly_once_sink_replay_is_idempotent(spark, tmp_path):
    """ST18: a replayed foreachBatch (post-crash at-least-once
    redelivery) must not double-commit; fresh batch ids append."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from bytesprocessor_spark.sources.txnlog import txn_exactly_once_sink

    t = str(tmp_path / "sink_tbl")
    land = _tempfile.mkdtemp(prefix="bp_txn_src_")
    try:
        batch = _df(spark, 0, 20)
        batch.write.parquet(_os.path.join(land, "in"))
        sink = txn_exactly_once_sink(t)
        stream = spark.readStream.schema(batch.schema).parquet(
            _os.path.join(land, "in")
        )
        q = (
            stream.writeStream.foreachBatch(sink)
            .trigger(availableNow=True)
            .option("checkpointLocation", _os.path.join(land, "ckpt"))
            .start()
        )
        q.awaitTermination()
        assert txn_read(spark, t).count() == 20

        # crash-replay: same batch id delivered again -> no-op
        sink(_df(spark, 0, 20), 0)
        assert txn_read(spark, t).count() == 20
        assert latest_version(t) == 0

        # a genuinely new batch id appends
        sink(_df(spark, 20, 25), 1)
        assert txn_read(spark, t).count() == 25
    finally:
        _shutil.rmtree(land, ignore_errors=True)


def test_exactly_once_survives_vacuum(spark, tmp_path):
    """ADVICE r6: the batch-id high-water mark rides every manifest, so
    a replay arriving AFTER vacuum pruned the committing manifest is
    still skipped (no duplicate commit)."""
    from bytesprocessor_spark.sources.txnlog import txn_exactly_once_sink

    t = str(tmp_path / "tbl")
    sink = txn_exactly_once_sink(t)
    sink(_df(spark, 0, 10), 0)
    sink(_df(spark, 10, 15), 1)
    txn_vacuum(t, keep_versions=1)  # manifest 0 (batch 0's commit) is gone
    sink(_df(spark, 0, 10), 0)  # crash-replay of the vacuumed batch
    assert latest_version(t) == 1
    assert txn_read(spark, t).count() == 15
    # and a genuinely new id still appends
    sink(_df(spark, 15, 18), 2)
    assert txn_read(spark, t).count() == 18


def test_exactly_once_two_queries_share_table(spark, tmp_path):
    """ADVICE r7: high-water marks are keyed per query identity
    (Delta's (txnAppId, txnVersion) pattern).  Two streaming queries —
    two checkpoints, each with batch ids restarting at 0 — can share
    one table: neither query's mark swallows the other's batches, and
    each query's own replays are still skipped."""
    from bytesprocessor_spark.sources.txnlog import txn_exactly_once_sink

    t = str(tmp_path / "tbl")
    a = txn_exactly_once_sink(t, query_id="query-a")
    b = txn_exactly_once_sink(t, query_id="query-b")
    a(_df(spark, 0, 10), 0)
    a(_df(spark, 10, 15), 1)
    # query B starts from ITS batch 0 — must commit, not be dropped
    b(_df(spark, 100, 104), 0)
    assert txn_read(spark, t).count() == 19
    # each query's crash-replay is still a no-op
    a(_df(spark, 0, 10), 0)
    a(_df(spark, 10, 15), 1)
    b(_df(spark, 100, 104), 0)
    assert txn_read(spark, t).count() == 19
    # fresh ids on both sides append
    a(_df(spark, 15, 17), 2)
    b(_df(spark, 104, 105), 1)
    assert txn_read(spark, t).count() == 22
    # the marks survive vacuum independently
    txn_vacuum(t, keep_versions=1)
    a(_df(spark, 15, 17), 2)
    b(_df(spark, 104, 105), 1)
    assert txn_read(spark, t).count() == 22


def test_exactly_once_legacy_manifest_marks_default_query(spark, tmp_path):
    """A table written by the pre-r8 protocol (single "max_batch_id",
    no "txn_max_batch") keeps replay protection for the "default"
    query identity, and a NEW query identity is not poisoned by the
    legacy mark."""
    import json as _json

    from bytesprocessor_spark.sources.txnlog import txn_exactly_once_sink

    t = str(tmp_path / "tbl")
    txn_write(_df(spark, 0, 10), t)
    # rewrite manifest 0 to the legacy shape
    path = _manifest_path(t, 0)
    with open(path) as f:
        m = _json.load(f)
    m.pop("txn_max_batch", None)
    m["max_batch_id"] = 3
    os.remove(path)
    with open(path, "w") as f:
        _json.dump(m, f)

    legacy = txn_exactly_once_sink(t)  # "default" identity
    legacy(_df(spark, 0, 5), 3)  # genuine crash-replay of the legacy query
    assert latest_version(t) == 0, "legacy replay must be skipped"
    legacy(_df(spark, 10, 12), 4)
    assert txn_read(spark, t).count() == 12
    # a distinct new query starts at batch 0 despite legacy mark 3
    fresh = txn_exactly_once_sink(t, query_id="query-new")
    fresh(_df(spark, 100, 101), 0)
    assert txn_read(spark, t).count() == 13


def test_vacuum_reclaims_orphan_temps_with_zero_versions(spark, tmp_path):
    """ADVICE r7: the orphan-temp sweep runs even when the table has no
    committed versions (writer crashed before its very first commit)."""
    t = str(tmp_path / "tbl")
    log = os.path.join(t, "_txnlog")
    os.makedirs(log)
    orphan = os.path.join(log, ".tmp-deadbeef.json")
    with open(orphan, "w") as f:
        f.write("{}")
    stats = txn_vacuum(t, keep_versions=1)
    assert not os.path.exists(orphan)
    assert stats == {"removed_files": 0, "removed_manifests": 0}


def test_commit_leaves_no_temp_files_and_vacuum_reclaims_orphans(spark, tmp_path):
    """ADVICE r6: manifests are claimed via temp-write + os.link; a
    successful commit unlinks its temp, and vacuum reclaims temps a
    crashed writer left behind."""
    t = str(tmp_path / "tbl")
    txn_write(_df(spark, 0, 5), t)
    txn_write(_df(spark, 5, 9), t)
    log = os.path.join(t, "_txnlog")
    assert not [n for n in os.listdir(log) if n.startswith(".tmp-")]
    # plant an orphan (writer died between temp write and link)
    orphan = os.path.join(log, ".tmp-deadbeef.json")
    with open(orphan, "w") as f:
        f.write("{}")
    txn_vacuum(t, keep_versions=2)
    assert not os.path.exists(orphan)
    # orphan temps never count as versions
    assert latest_version(t) == 1


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_ops = st.lists(
    st.tuples(st.sampled_from(["append", "overwrite"]), st.integers(1, 4)),
    min_size=1,
    max_size=5,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_ops)
def test_txnlog_matches_model_under_random_histories(spark, tmp_path_factory, ops):
    """Property: any append/overwrite history yields snapshots equal to
    the obvious list model, at every version (time travel included)."""
    t = str(tmp_path_factory.mktemp("prop"))
    model_snapshots = []
    model = []
    base = 0
    for mode, n in ops:
        batch = list(range(base, base + n))
        base += n
        if mode == "append":
            model = model + batch
        else:
            model = list(batch)
        model_snapshots.append(list(model))
        df = spark.createDataFrame([(i,) for i in batch], "id long")
        txn_write(df, t, mode=mode)
    for v, snap in enumerate(model_snapshots):
        got = sorted(r.id for r in txn_read(spark, t, version=v).collect())
        assert got == sorted(snap), f"version {v} diverged"


def test_compact_preserves_rows_history_and_marks(spark, tmp_path):
    """txn_compact rewrites the snapshot layout under a new version:
    row set identical, older versions still time-travel, exactly-once
    replay marks survive, vacuum reclaims the pre-compaction dirs."""
    from bytesprocessor_spark.sources.txnlog import txn_compact, txn_exactly_once_sink

    t = str(tmp_path / "tbl")
    sink = txn_exactly_once_sink(t, query_id="q")
    sink(_df(spark, 0, 10), 0)
    sink(_df(spark, 10, 15), 1)
    txn_write(_df(spark, 15, 18), t)  # a plain batch append too
    v = txn_compact(spark, t, min_files=2)
    assert v == 3
    m = read_manifest(t, v)
    assert m["mode"] == "compact" and m["compaction_of"] == 2
    assert len(m["files"]) == 1
    assert sorted(r.id for r in txn_read(spark, t).collect()) == list(range(18))
    # time travel to the pre-compaction snapshot still works
    assert txn_read(spark, t, version=2).count() == 18
    assert txn_read(spark, t, version=1).count() == 15
    # exactly-once marks rode the compaction manifest
    sink(_df(spark, 0, 10), 0)  # replay -> still skipped
    assert latest_version(t) == 3
    # vacuum reclaims the three pre-compaction data dirs
    stats = txn_vacuum(t, keep_versions=1)
    assert stats["removed_files"] == 3
    assert txn_read(spark, t).count() == 18


def test_compact_aborts_on_concurrent_commit(spark, tmp_path, monkeypatch):
    """CAS semantics: a writer landing between the snapshot read and
    the manifest claim must abort the compaction (retrying would drop
    the interleaved append — the OPTIMIZE lost-update bug)."""
    import json as _json

    import bytesprocessor_spark.sources.txnlog as tl

    t = str(tmp_path / "tbl")
    txn_write(_df(spark, 0, 5), t)
    txn_write(_df(spark, 5, 9), t)

    orig_read = tl.txn_read

    def racing_read(spark_, table_dir, version=None):
        df = orig_read(spark_, table_dir, version)
        # the concurrent writer commits AFTER our snapshot read but
        # BEFORE our manifest claim
        m = read_manifest(t, 1)
        m["version"] = 2
        with open(_manifest_path(t, 2), "w") as f:
            _json.dump(m, f)
        return df

    monkeypatch.setattr(tl, "txn_read", racing_read)
    import pytest as _pytest

    with _pytest.raises(TxnConflict):
        tl.txn_compact(spark, t)
    monkeypatch.undo()
    # the abandoned rewrite dir was cleaned up (two committed dirs left)
    assert len(os.listdir(os.path.join(t, "data"))) == 2
    # and the interleaved commit is intact
    assert txn_read(spark, t, version=2).count() == 9


def test_compact_noop_below_min_files(spark, tmp_path):
    from bytesprocessor_spark.sources.txnlog import txn_compact

    t = str(tmp_path / "tbl")
    txn_write(_df(spark, 0, 5), t)
    assert txn_compact(spark, t, min_files=2) is None
    assert latest_version(t) == 0


def test_append_schema_guard(spark, tmp_path):
    """An append whose schema differs from the snapshot is rejected
    unless the evolution is deliberate; overwrite replaces freely."""
    import pytest as _pytest
    from pyspark.sql import functions as F2

    t = str(tmp_path / "tbl")
    txn_write(_df(spark, 0, 5), t)
    evolved = _df(spark, 5, 8).withColumn("extra", F2.lit(1))
    with _pytest.raises(ValueError, match="schema differs"):
        txn_write(evolved, t, mode="append")
    # rejected append left no manifest
    assert latest_version(t) == 0
    v = txn_write(evolved, t, mode="append", allow_schema_change=True)
    assert v == 1
    assert "extra" in read_manifest(t, 1)["schema"]
    # overwrite never consults the old schema
    assert txn_write(_df(spark, 0, 3), t, mode="overwrite") == 2


def test_changes_returns_exactly_the_delta(spark, tmp_path):
    """txn_changes(v_from -> v_to) is exactly the rows of the commits
    in the range — no base row leaks, none of the delta is lost."""
    from bytesprocessor_spark.sources.txnlog import txn_changes

    t = str(tmp_path / "tbl")
    txn_write(_df(spark, 0, 5), t)      # v0
    txn_write(_df(spark, 5, 8), t)      # v1
    txn_write(_df(spark, 8, 10), t)     # v2
    got = sorted(r.id for r in txn_changes(spark, t, 0).collect())
    assert got == list(range(5, 10))
    got01 = sorted(r.id for r in txn_changes(spark, t, 0, 1).collect())
    assert got01 == list(range(5, 8))
    # empty range: same version on both ends -> empty frame, snapshot schema
    empty = txn_changes(spark, t, 2, 2)
    assert empty.count() == 0
    assert set(empty.columns) == {"id", "x"}


def test_changes_rejects_rewritten_history(spark, tmp_path):
    """An overwrite (or compaction) inside the range invalidates the
    manifest diff as a change feed — loud error, not silent wrong
    rows."""
    from bytesprocessor_spark.sources.txnlog import txn_changes, txn_compact

    t = str(tmp_path / "tbl")
    txn_write(_df(spark, 0, 5), t)                      # v0
    txn_write(_df(spark, 5, 8), t)                      # v1
    txn_write(_df(spark, 0, 3), t, mode="overwrite")    # v2
    with pytest.raises(ValueError, match="not a change feed"):
        txn_changes(spark, t, 0)
    # but reading from the overwrite forward is a valid feed again
    txn_write(_df(spark, 3, 4), t)                      # v3
    got = sorted(r.id for r in txn_changes(spark, t, 2).collect())
    assert got == [3]
    # compaction rewrites the file set -> same rejection across it
    t2 = str(tmp_path / "tbl2")
    txn_write(_df(spark, 0, 5), t2)
    txn_write(_df(spark, 5, 8), t2)
    txn_compact(spark, t2, min_files=2)
    with pytest.raises(ValueError, match="not a change feed"):
        txn_changes(spark, t2, 0)
