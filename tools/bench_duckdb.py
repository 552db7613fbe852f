"""DuckDB timings for the bench HEADLINE queries — the relational
baseline numbers BASELINE.md calls for (the reference publishes none,
so the driver-sanctioned DuckDB oracle at the same scale factor is the
comparison point for the 2x perf gate).

Usage:
    python tools/bench_duckdb.py [--sf /root/testdata/sf0.1]
Prints one JSON line mirroring bench.py's shape.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb

from bytesprocessor_spark.sources.tables import TABLES


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--threads", type=int, default=None)
    args = ap.parse_args()

    from bench import HEADLINE  # noqa: E402 (repo root on path)
    import __spark_entry__ as entry_mod

    oracles = entry_mod.oracle_sql()

    con = duckdb.connect()
    if args.threads:
        con.execute(f"SET threads={args.threads}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        sql = oracles.get(name)
        if sql is None:
            continue  # no SQL form (pcap pipeline, approximate ops)
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"  duckdb {name}: {dt:.2f}s", file=sys.stderr)

    from bench import POST_BRACKET_ADDITIONS  # noqa: E402

    legacy = {n: t for n, t in timings.items() if n not in POST_BRACKET_ADDITIONS}
    print(
        json.dumps(
            {
                "metric": "duckdb_headline_seconds",
                "value": round(total, 3),
                # same composition-controlled split bench.py emits
                "value_legacy": round(sum(legacy.values()), 3),
                "n_legacy": len(legacy),
                "unit": "sec",
                "queries": timings,
                "sf": args.sf,
            }
        )
    )


if __name__ == "__main__":
    main()
