"""Data-layout optimization: Z-order (Morton curve) clustering for
multi-dimensional data skipping.

Parquet scans prune on per-file / per-row-group min-max statistics.  A
table sorted on one column prunes that column's predicates only; a
query filtering another column reads everything.  Interleaving the
bits of several columns into one sort key (the Morton / Z-order curve,
Morton 1966; the layout behind Delta/Iceberg OPTIMIZE ZORDER) makes
rows close in ANY of the dimensions land in the same files, so every
dimension's min-max range stays narrow per file and multi-dimensional
box predicates skip most of the data.

Everything here is pure Catalyst expression + a range repartition:

  * ``zvalue`` builds the interleave as a bit-arithmetic expression
    tree (whole-stage-codegen'd, no UDF);
  * ``zorder_write`` range-partitions on the z-value — the total-order
    shuffle Spark already uses for global sorts, so at 100 TB this is
    one pass: shuffle on sampled z-ranges, sort within partitions,
    write one file per partition.

The write path is offline layout maintenance (run it like compaction,
sources/tables.py:compact_parquet); readers need no code at all — the
benefit shows up as ordinary parquet stats pruning.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cols: Sequence[Column | str], bits: int = 8) -> Column:
    """Morton-interleave the low ``bits`` bits of each column (already
    non-negative ints; callers quantize/rank first — see
    ``quantize``).  With n columns, bit i of column j lands at output
    bit ``i*n + j``; values clamp into ``[0, 2^bits)`` so outliers
    cannot scramble the curve."""
    n = len(cols)
    cap = (1 << bits) - 1
    clamped = [
        F.least(F.greatest(F.col(c) if isinstance(c, str) else c, F.lit(0)), F.lit(cap)).cast("long")
        for c in cols
    ]
    parts = [
        F.shiftleft(F.shiftright(col, i).bitwiseAND(F.lit(1)), i * n + j)
        for i in range(bits)
        for j, col in enumerate(clamped)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def quantize(col: Column | str, lo: float, hi: float, bits: int = 8) -> Column:
    """Map a numeric column into ``[0, 2^bits)`` by fixed-width binning
    over a known [lo, hi) range — the map-only normalization feeding
    ``zvalue``.  (For unknown ranges, compute lo/hi once with a global
    min/max agg — two scalars, not a sort.)"""
    c = F.col(col) if isinstance(col, str) else col
    n = 1 << bits
    bin_ = F.floor((c - F.lit(lo)) / F.lit((hi - lo) / n)).cast("long")
    return F.least(F.greatest(bin_, F.lit(0)), F.lit(n - 1))


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[Column],
    n_files: int,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Rewrite ``df`` clustered on the Z-curve of ``cols`` (quantized
    columns, see ``quantize``): range-partition on the z-value into
    ``n_files`` output files, sorted within each.  One total-order
    shuffle — the same cost as a global sort on one column, but every
    listed dimension gets data-skipping."""
    z = zvalue(list(cols), bits=bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
