"""Local stand-in for the driver's correctness gate.

Runs every QUERIES entry on Spark and its ORACLE SQL on DuckDB over
the same parquet tables, then compares row count, column names, and
order-insensitive values (exact match; floats reported with max-diff
on mismatch so near-misses are diagnosable).

Two fetch modes:
  --mode driver (default): DuckDB results via fetchdf() and Spark via
    toPandas(), mirroring the round driver.  This is the mode that
    exposes DuckDB's SUM(BIGINT)->HUGEINT->float64 coercion (the round-4
    red rows) and rejects unhashable array/struct output cells the way
    the driver's pandas canonicalizer does.
  --mode raw: fetchall()/collect() — exact Python values, useful for
    diagnosing whether a driver-mode mismatch is a value bug or a
    fetchdf dtype coercion.

Usage:
    python tools/check_oracle.py [--sf /root/testdata/sf0.01] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import decimal
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb

from bytesprocessor_spark.session import get_spark
from bytesprocessor_spark.sources.tables import TABLES


def canon_cell(v):
    # Type-tagged canonical form: the driver's value-hash distinguishes
    # 68 (BIGINT) from 68.0 (DOUBLE) and Decimal('68') (DECIMAL), so a
    # faithful local gate must too.  bool is checked before int (subclass).
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        return ("f", v)
    if isinstance(v, decimal.Decimal):
        return ("d", str(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(canon_cell(x) for x in v)
    return v


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare(name, spark_cols, spark_rows, duck_cols, duck_rows):
    problems = []
    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"schema mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"rowcount mismatch: spark={len(spark_rows)} duck={len(duck_rows)}")
    s = canon_rows(spark_cols, spark_rows)
    d = canon_rows(duck_cols, duck_rows)
    if s != d:
        n_bad = 0
        max_float_diff = 0.0
        for rs, rd in zip(s, d):
            if rs != rd:
                n_bad += 1
                for a, b in zip(rs, rd):
                    if (
                        isinstance(a, tuple) and isinstance(b, tuple)
                        and len(a) == 2 and len(b) == 2
                        and a[0] == "f" and b[0] == "f"
                        and isinstance(a[1], float) and isinstance(b[1], float)
                    ):
                        max_float_diff = max(max_float_diff, abs(a[1] - b[1]))
                if n_bad <= 3:
                    problems.append(f"  row diff:\n    spark={rs}\n    duck ={rd}")
        problems.insert(0, f"value mismatch in {n_bad} rows (max float diff {max_float_diff:g})")
    return problems


def _pdf_rows(pdf):
    """Canonical (cols, rows) from a pandas frame, converting numpy
    scalars to Python and flagging unhashable cells the driver's
    canonicalizer would crash on (lists / ndarrays / dicts)."""
    import numpy as np

    cols = list(pdf.columns)
    rows = []
    for tup in pdf.itertuples(index=False, name=None):
        out = []
        for v in tup:
            if isinstance(v, (list, np.ndarray, dict)):
                raise TypeError(
                    f"unhashable cell type {type(v).__name__} — driver "
                    f"canonicalizer would crash; scalarize this column"
                )
            if isinstance(v, np.generic):
                v = v.item()
            if v is not None and not isinstance(v, (bool, str, bytes, decimal.Decimal)):
                try:
                    if v != v:  # NaN from pandas nullable coercion
                        v = float("nan")
                except Exception:
                    pass
        # pandas NaT / pd.NA normalization
            if v is not None and repr(v) in ("NaT", "<NA>"):
                v = None
            out.append(v)
        rows.append(tuple(out))
    return cols, rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("--mode", choices=["driver", "raw"], default="driver")
    args = ap.parse_args()

    from bytesprocessor_spark.queries import ORACLE, QUERIES

    only = set(args.only.split(",")) if args.only else None

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')")

    n_pass = n_fail = n_nooracle = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf)
            if args.mode == "driver":
                spark_cols, spark_rows = _pdf_rows(sdf.toPandas())
            else:
                spark_cols = sdf.columns
                spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in ORACLE:
            print(f"SKIP {name}: no oracle (rows={len(spark_rows)})")
            n_nooracle += 1
            continue
        try:
            res = con.execute(ORACLE[name])
            if args.mode == "driver":
                duck_cols, duck_rows = _pdf_rows(res.fetchdf())
            else:
                duck_cols = [d[0] for d in res.description]
                duck_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = compare(name, spark_cols, spark_rows, duck_cols, duck_rows)
        dt = time.time() - t0
        if problems:
            print(f"FAIL {name} ({dt:.1f}s, rows spark={len(spark_rows)} duck={len(duck_rows)})")
            for p in problems:
                print(f"  {p}")
            n_fail += 1
        else:
            print(f"PASS {name} ({dt:.1f}s, {len(spark_rows)} rows)")
            n_pass += 1

    print(f"\n{n_pass} passed, {n_fail} failed, {n_nooracle} without oracle")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
