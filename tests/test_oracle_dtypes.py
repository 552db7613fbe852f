"""Driver-canonicalization hazard lint over EVERY oracle's output
schema — Spark-free, bind-only (no query executes), so the whole
corpus checks in seconds.

The round driver materializes DuckDB results via fetchdf(), where

  * HUGEINT / UHUGEINT columns (any uncast SUM over BIGINT, or
    arithmetic containing one) coerce to float64 while Spark returns
    int64 — numerically equal values that fail the driver's
    type-tagged value hash (the round-4 red-row class), and
  * LIST / STRUCT / MAP columns materialize as unhashable Python
    objects that crash the driver's pandas canonicalizer outright
    (the embedding_kmeans crash class).

Neither type may therefore appear in a checked oracle's output.
DECIMAL is also rejected: none of the corpus emits it today, and a
future one would hash as Decimal on DuckDB vs float/int on Spark.
"""

from __future__ import annotations

import duckdb
import pytest

from bytesprocessor_spark.queries import ORACLE
from bytesprocessor_spark.sources.tables import TABLES
from tests.conftest import SF_DIR

_BANNED_PREFIXES = ("HUGEINT", "UHUGEINT", "DECIMAL")
_BANNED_COMPOUND = ("[]", "STRUCT(", "MAP(")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def test_no_oracle_emits_driver_hostile_types(duck):
    bad = []
    for name, sql in ORACLE.items():
        rel = duck.sql(sql)  # bind only — nothing executes
        for col, typ in zip(rel.columns, rel.types):
            t = str(typ)
            if t.startswith(_BANNED_PREFIXES) or any(
                m in t for m in _BANNED_COMPOUND
            ):
                bad.append(f"{name}.{col}: {t}")
    assert not bad, (
        "oracle outputs with fetchdf-hostile types (CAST to BIGINT / "
        "scalarize):\n  " + "\n  ".join(bad)
    )
