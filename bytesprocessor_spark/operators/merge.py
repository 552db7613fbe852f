"""MERGE (upsert / CDC apply) semantics over plain DataFrames.

ANSI ``MERGE INTO`` needs a transactional table format (Delta/Iceberg)
for in-place execution; the *relational semantics* — matched rows
updated, unmatched source rows inserted, optionally flagged rows
deleted — are a pure dataframe computation, and at lake scale the
rewrite-on-merge pattern is exactly this: read target, apply changes,
write the affected partitions back.

Plan shape: one full-outer equi-join on the merge key.  With both
sides bucketed on the key (sources/tables.py:write_bucketed) the join
is shuffle-free; otherwise it is the single unavoidable shuffle.  A
deterministic tie rule (latest source row wins by ``version_col``)
makes the operator safe under retried/replayed CDC batches —
idempotent apply, the property streaming CDC needs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    delete_col: str | None = None,
    version_col: str | None = None,
    soft_delete_col: str | None = None,
) -> DataFrame:
    """Return the merged state of ``target`` after applying ``source``:

      * key in both       -> the source row's values (UPDATE)
      * key only in source-> the source row (INSERT)
      * key only in target-> the target row (unchanged)
      * matched + ``delete_col`` true -> dropped (DELETE)

    ``version_col`` deduplicates the source first (max version per key
    wins) AND — when the target also carries the version column —
    guards the apply: a matched row updates only if the incoming
    version is >= the applied one.  That makes the merge idempotent
    across REPLAYED AND REORDERED batches (Spark's foreachBatch is
    at-least-once with no cross-batch order guarantee after a restart);
    with a version column only on the source, ordering holds within a
    batch but a later batch carrying a stale version would overwrite —
    persist the version into the target (init it to 0) to close that.

    DELETES and reordering: a hard delete leaves no trace, so a stale
    replayed upsert for the deleted key would re-insert it.  Pass
    ``soft_delete_col`` (a boolean column persisted in the TARGET) to
    keep version-carrying tombstones instead: deletes flip the flag
    rather than dropping the row, the version guard then rejects the
    stale resurrection, and readers filter the flag
    (streaming/cdc.py wires this for the CDC apply loop).  A NULL
    source version never applies (update or delete) — explicit
    versions are the ordering contract.
    Column set = target's columns; source-only columns (flags, a
    version the target doesn't persist) are dropped from the output.
    """
    keys = list(keys)
    if version_col is not None:
        w = Window.partitionBy(*keys).orderBy(F.col(version_col).desc())
        source = (
            source.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
    src = source.withColumn("__present", F.lit(True))
    joined = target.alias("t").join(src.alias("s"), keys, "full")
    matched = F.col("s.__present").isNotNull()
    if version_col is not None and version_col in target.columns:
        # cross-batch guard: only apply if not older than what's
        # applied; coalesced so a NULL source version applies NOTHING
        # (without the coalesce, Kleene NULL would veto the update
        # branch yet still satisfy the delete filter)
        newer = F.coalesce(
            F.col(f"t.{version_col}").isNull()
            | (F.col(f"s.{version_col}") >= F.col(f"t.{version_col}")),
            F.lit(False),
        )
        applies = matched & newer
    else:
        applies = matched
    deleting = applies & (
        F.coalesce(F.col(f"s.{delete_col}"), F.lit(False))
        if delete_col is not None
        else F.lit(False)
    )

    if delete_col is not None and soft_delete_col is None:
        joined = joined.where(~deleting)

    out_cols = []
    for c in target.columns:
        if c in keys:
            out_cols.append(F.col(c))  # coalesced by the USING-style join
        elif c == soft_delete_col:
            out_cols.append(
                F.when(deleting, F.lit(True))
                .when(applies, F.lit(False))  # an upsert revives a tombstone
                .otherwise(F.coalesce(F.col(f"t.{c}"), F.lit(False)))
                .alias(c)
            )
        else:
            out_cols.append(
                F.when(applies, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            )
    return joined.select(*out_cols)
