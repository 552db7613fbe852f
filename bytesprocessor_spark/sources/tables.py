"""Table sources (SURVEY §2.1 S5-S7).

The reference's only source is a hand-chunked pcap iterator
(BytesProcessor.py:56-64); the general engine reads columnar parquet
(and csv/json for ETL edges) through Spark's datasource v2 path so
filter pushdown, column pruning and partition-sized splits come from
the planner instead of hand-rolled chunking (BytesProcessor.py:62-81).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan (S5). Columnar, pushdown-capable, split by
    ``spark.sql.files.maxPartitionBytes`` — bounded memory at any scale.

    The events table's ``ts`` is normalized to a session-zone
    TimestampType regardless of how the parquet stored it:
    TIMESTAMP(NANOS) (pre-Spark-4 vectorized readers reject it) is
    read as raw nanos (``nanosAsLong``) and truncated to micros;
    isAdjustedToUTC=false micros arrive as TIMESTAMP_NTZ and are
    cast (identity under the engine's UTC session).  Downstream
    epoch arithmetic (``unix_micros``) and the DuckDB oracle's
    ``epoch_us`` then agree exactly.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def spread_scan(df: DataFrame, *keys: str) -> DataFrame:
    """Hash-repartition a scan to ``defaultParallelism`` by ``keys``
    ONLY when the source yields fewer partitions than cores.

    A heavy per-row projection (n-gram explode, a 126-hash minhash
    family, per-row md5 scoring) inherits the SCAN's parallelism; a
    small single-row-group parquet file is one unsplittable task, so
    on a 32-core executor the whole projection runs on one thread
    while 31 idle.  One keyed exchange of the raw rows — bytes that
    are tiny next to the projection's work — restores full
    parallelism.  When the source is already as wide as the session
    (the 100 TB design point, where scans arrive in thousands of
    splits), this is a NO-OP: no shuffle is added at scale, so the
    bench at any core count and the cluster plan read the same.

    Contract (ADVICE r11): ``df`` must be a RAW SCAN (or a trivially
    narrow projection of one) — the partition probe physically plans
    ``df`` and reads its pre-AQE partition count, which is cheap and
    meaningful for a file scan but both costly and misleading for a
    complex upstream plan (exchanges report the shuffle-partition
    conf, not data width).  The probe goes through the JVM RDD handle
    directly so no Python-serde wrapper is built.
    """
    sc = df.sparkSession.sparkContext
    dp = sc.defaultParallelism
    if df._jdf.rdd().getNumPartitions() >= dp:
        return df
    return df.repartition(dp, *[F.col(k) for k in keys])


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose the standard tables as temp views for the SQL surface."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def read_csv(spark: SparkSession, path: str, schema=None, header: bool = True) -> DataFrame:
    """CSV scan (S6). Schema should be supplied in production — schema
    inference is a full extra pass over the data."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSON lines scan (S6)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def from_rows(spark: SparkSession, rows, schema) -> DataFrame:
    """In-memory source (S7) for tests and small dimension tables."""
    return spark.createDataFrame(rows, schema=schema)


def write_parquet(
    df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None
) -> None:
    """Parquet sink (S3).  ``partition_by`` gives directory-level
    partition pruning to every downstream reader — at lake scale,
    partition on the columns queries filter by (date, label)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed parquet table (the co-located-join layout for repeated
    large joins/aggregations on the same key).

    Both sides of a join written with the same ``bucket_cols`` and
    ``n_buckets`` hash-partition their files identically, so Spark's
    planner proves co-partitioning and elides BOTH shuffle exchanges —
    the dominant cost of a fact⋈fact join at lake scale.  ``sort_cols``
    additionally pre-sorts within each bucket file, turning sort-merge
    joins into merge-only (plan gate: tests/test_plans.py::
    test_bucketed_join_elides_shuffles).

    At 100 TB: size ``n_buckets`` so one bucket of the LARGER table is
    100-500 MB (e.g. 30 TB fact / 256 MB -> ~120k buckets); every
    downstream join or groupBy on the bucket key is then shuffle-free
    regardless of cluster size.  Bucketing metadata lives in the
    catalog, so this writes through ``saveAsTable`` (``path`` makes it
    an external table at that location).
    """
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def read_csv_tolerant(
    spark: SparkSession,
    path: str,
    schema: str,
    corrupt_col: str = "_corrupt_record",
    with_handle: bool = False,
):
    """Error-tolerant CSV scan (S6): PERMISSIVE mode with the corrupt
    raw line captured in ``corrupt_col`` instead of failing the job —
    the lake-scale posture (a 100 TB ingest WILL contain bad rows; a
    FAILFAST job dies hours in, a silent DROPMALFORMED loses data
    unaccountably).  Returns (good_rows, bad_rows): callers write
    ``bad_rows`` to a quarantine sink and alert on its count.

    The scan is cached so the two splits share one pass.  To release
    that cache once both sinks are written, pass ``with_handle=True``
    and call ``handle.unpersist()`` on the third returned value —
    unpersisting ``good_rows``/``bad_rows`` would NOT release it (they
    are children of the cached scan, and unpersist is not inherited).
    """
    df = (
        spark.read.schema(f"{schema}, {corrupt_col} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .option("header", "false")
        .csv(path)
        .cache()  # one scan feeds both splits; PERMISSIVE requires a
        # materialization boundary before filtering on the corrupt col
    )
    good = df.where(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.where(F.col(corrupt_col).isNotNull()).select(corrupt_col)
    if with_handle:
        return good, bad, df
    return good, bad


def read_json_tolerant(
    spark: SparkSession,
    path: str,
    schema: str,
    corrupt_col: str = "_corrupt_record",
    with_handle: bool = False,
):
    """Error-tolerant JSON-lines scan (S6b): the `read_csv_tolerant`
    contract over JSONL — PERMISSIVE parse, corrupt raw line captured
    verbatim in ``corrupt_col``, (good, bad) splits off one cached
    scan.  JSONL has a failure mode CSV doesn't: a line can be VALID
    JSON but type-mismatched against the schema (a string where a
    number belongs); PERMISSIVE nulls the bad field and still captures
    the raw line, so the gate below treats it as quarantined.

    Same cache-release contract as the CSV sibling: pass
    ``with_handle=True`` and unpersist the third return value once
    both sinks are written.
    """
    df = (
        spark.read.schema(f"{schema}, {corrupt_col} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
        .cache()  # one scan feeds both splits; PERMISSIVE requires a
        # materialization boundary before filtering on the corrupt col
    )
    good = df.where(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.where(F.col(corrupt_col).isNotNull()).select(corrupt_col)
    if with_handle:
        return good, bad, df
    return good, bad


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    """CSV sink (S6)."""
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink (S6)."""
    df.write.mode(mode).json(path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 256 * 1024 * 1024,
    partition_by: list[str] | None = None,
) -> int:
    """Rewrite a parquet directory into ~``target_file_bytes`` files —
    the small-files fix (streaming sinks and fine-grained ingest leave
    thousands of tiny files; at lake scale each one costs a task, an
    open, and a footer read on every query).

    Sizing reads the CURRENT byte size from the filesystem (works on
    any Hadoop FS, not just local), then rewrites through a temp
    sibling and swaps, so readers never observe a half-compacted
    directory.  Returns the new file count.  At 100 TB run per
    partition directory (``partition_by``) on a schedule, compacting
    only partitions whose small-file count exceeds a threshold.
    """
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total = fs.getContentSummary(hpath).getLength()
    n_files = max(1, -(-total // target_file_bytes))  # ceil

    tmp = f"{path}__compacting"
    df = spark.read.parquet(path)
    w = df.repartition(int(n_files)).write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(tmp)

    old = f"{path}__old"
    fs.rename(hpath, jvm.org.apache.hadoop.fs.Path(old))
    fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), hpath)
    fs.delete(jvm.org.apache.hadoop.fs.Path(old), True)
    return int(n_files)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema=None,
    tolerant: bool = False,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """XML scan (S6; built into Spark 4's sql core — no external
    package).  ``row_tag`` names the repeated element that becomes a
    row.  Supply ``schema`` in production — inference is an extra full
    pass.  ``tolerant`` switches to PERMISSIVE with the malformed
    fragment captured in ``corrupt_col`` (requires ``schema``), the
    same quarantine posture as :func:`read_csv_tolerant`."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if tolerant:
        if schema is None:
            raise ValueError("tolerant XML read requires an explicit schema")
        reader = (
            reader.schema(f"{schema}, {corrupt_col} string")
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", corrupt_col)
        )
    elif schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_xml(df: DataFrame, path: str, row_tag: str = "row", mode: str = "overwrite") -> None:
    """XML sink (S6)."""
    df.write.mode(mode).format("xml").option("rowTag", row_tag).save(path)


def read_parquet_evolved(
    spark: SparkSession,
    *paths: str,
    type_widening: dict[str, str] | None = None,
) -> DataFrame:
    """S13: schema-evolution-tolerant parquet read across generations
    of a dataset directory (old files missing newer columns, columns
    whose type widened between writers).

    ``mergeSchema`` handles ADDED columns natively (missing -> NULL at
    scan time, per file footer), but it hard-fails on a widened type
    (int -> long, float -> double) because parquet footers disagree.
    For those, pass ``type_widening={"col": "long"}``: each
    generation is read separately, cast to the widened type, and
    unioned by name with missing columns allowed — the portable
    equivalent of Delta/Iceberg's schema-evolution metadata, built
    from plain parquet.

    Scale notes: one generation == one scan node; Catalyst still
    pushes filters/pruning into every scan, and the union is a no-op
    at runtime (no shuffle — partitions concatenate).  Footer
    *listing* is the only added cost, the same price mergeSchema pays.
    """
    if not paths:
        raise ValueError("read_parquet_evolved: at least one path required")
    if len(paths) == 1 and type_widening is None:
        return spark.read.option("mergeSchema", "true").parquet(paths[0])
    frames = []
    for p in paths:
        df = spark.read.option("mergeSchema", "true").parquet(p)
        for col, typ in (type_widening or {}).items():
            if col in df.columns:
                df = df.withColumn(col, F.col(col).cast(typ))
        frames.append(df)
    out = frames[0]
    for df in frames[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out


def overwrite_partitions(df: DataFrame, path: str, partition_by: list[str]) -> None:
    """Idempotent partition backfill (S13): rewrite ONLY the partitions
    present in ``df``, leaving every other partition untouched —
    Spark's dynamic partitionOverwriteMode, scoped to this one write.

    This is the reprocessing primitive of a date-partitioned lake:
    re-deriving one bad day re-lands exactly that day's directories,
    re-running it is a no-op change, and a crashed backfill never
    truncates the table the way static overwrite mode (which drops ALL
    partitions first) would.  At 100 TB the write's cost is the
    touched partitions, full stop."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def read_parquet_quarantine(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """S14 tolerant parquet scan: read a directory that may contain
    corrupt files (truncated uploads, partial writes from a crashed
    task without a committer, bitrot) without failing the job, and
    report exactly WHICH files were skipped so they can be re-fetched
    — the resilience twin of the CSV/JSON/tar tolerant readers.

    Returns ``(rows, audit)``: ``rows`` is the surviving data
    (``ignoreCorruptFiles`` drops unreadable files at scan time,
    per-file granularity, no driver-side pre-reading), ``audit`` is
    one row per parquet file in the directory with ``is_quarantined``
    — computed by anti-joining the directory listing (driver-side
    metadata, O(#files)) against ``input_file_name()`` of the rows
    that actually survived.  Caveat: a corrupt file that would have
    contributed ZERO rows is indistinguishable from an empty healthy
    file; both land in the audit as quarantined-or-empty.

    Schema inference is itself corruption-resilient: Spark's default
    inference can die on an unreadable footer before ignoreCorruptFiles
    applies, so the schema is probed per file (footer-only reads,
    driver-side, usually one attempt) until a healthy footer answers,
    then the scan runs with that explicit schema.

    At 100 TB the scan is the same parquet scan as always (the option
    changes error handling only); the audit adds one distinct-files
    aggregate over the scan — column-pruned to the metadata column, no
    data columns read."""
    import os as _os

    listed = sorted(
        f
        for f in _os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
    schema = None
    for f in listed:
        try:
            schema = spark.read.parquet(_os.path.join(path, f)).schema
            break
        except Exception:
            continue
    if schema is None:
        raise ValueError(f"no readable parquet footer in {path}")
    rows = (
        spark.read.schema(schema)
        .option("ignoreCorruptFiles", "true")
        .parquet(path)
    )
    listing = spark.createDataFrame([(f,) for f in listed], "file_name string")
    seen = (
        spark.read.schema(schema)
        .option("ignoreCorruptFiles", "true")
        .parquet(path)
        .select(
            F.element_at(F.split(F.input_file_name(), "/"), -1).alias("file_name")
        )
        .distinct()
    )
    audit = (
        listing.join(seen.withColumn("seen", F.lit(True)), "file_name", "left")
        .select(
            "file_name",
            F.coalesce(F.col("seen"), F.lit(False)).alias("has_rows"),
            (~F.coalesce(F.col("seen"), F.lit(False))).alias("is_quarantined"),
        )
        .orderBy("file_name")
    )
    return rows, audit
