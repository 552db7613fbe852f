"""Z-order layout (sources/layout.py): the interleave math, the
round-trip, and the actual point of it — parquet min-max stats prune
multi-dimensional predicates that a single-column sort cannot."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from bytesprocessor_spark.sources.layout import quantize, zorder_write, zvalue


def _file_ranges(path: str, col: str) -> list[tuple[int, int]]:
    """Per-file (min, max) of ``col`` from parquet footer statistics —
    exactly what a scan's file-level skipping consults."""
    out = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    lo = c.statistics.min if lo is None else min(lo, c.statistics.min)
                    hi = c.statistics.max if hi is None else max(hi, c.statistics.max)
        out.append((lo, hi))
    return out


def _files_touched(ranges: list[tuple[int, int]], lo: int, hi: int) -> int:
    return sum(1 for (mn, mx) in ranges if not (mx < lo or mn > hi))


def test_zvalue_interleave(spark):
    # bit-exact Morton check against a python reference
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", zvalue(["x", "y"], bits=4).alias("z")).collect()
    }

    def morton(x, y):
        z = 0
        for i in range(4):
            z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return z

    assert got == {(x, y): morton(x, y) for x, y in rows}
    # the curve is a bijection on the grid
    assert len(set(got.values())) == 256


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    n, files = 64, 16
    rows = [(x, y, x * n + y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x long, y long, payload long")

    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    zorder_write(df, zpath, [quantize("x", 0, n, 6), quantize("y", 0, n, 6)], n_files=files, bits=6)
    # baseline: the classic single-column sort layout
    (
        df.repartitionByRange(files, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    # round-trip: layout changes nothing about the data
    assert spark.read.parquet(zpath).count() == n * n
    assert (
        spark.read.parquet(zpath).agg(F.sum("payload")).first()[0]
        == df.agg(F.sum("payload")).first()[0]
    )

    # a y-only range predicate: the x-sorted layout cannot skip anything,
    # the z-ordered layout confines each y-range to a minority of files
    zy, ly = _file_ranges(zpath, "y"), _file_ranges(lpath, "y")
    assert _files_touched(ly, 8, 15) == files
    assert _files_touched(zy, 8, 15) <= files // 2

    # box predicate on both dims: z-order touches strictly fewer files
    zx, lx = _file_ranges(zpath, "x"), _file_ranges(lpath, "x")
    zbox = sum(
        1
        for (xr, yr) in zip(zx, zy)
        if not (xr[1] < 8 or xr[0] > 15) and not (yr[1] < 8 or yr[0] > 15)
    )
    lbox = sum(
        1
        for (xr, yr) in zip(lx, ly)
        if not (xr[1] < 8 or xr[0] > 15) and not (yr[1] < 8 or yr[0] > 15)
    )
    assert zbox < lbox
    assert zbox <= files // 4
