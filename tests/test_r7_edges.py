"""Edge cases for the round-7 entries:

- orders_interval_overlap: a pair whose overlap straddles a month
  boundary shares TWO month bins — the overlap-start-bin dedup rule
  must count it exactly once (cross-engine).
- part_kendall_tau: metric ties count neither concordant nor
  discordant (tau-a), and a brand with a single size yields no pairs.
- orders_target_encoding: a category with one row has no leave-one-out
  denominator and must be excluded by both engines.
- schema_evolution_read: the merged relation carries the evolved
  column with NULLs for pre-evolution files.
"""

import importlib.util
from pathlib import Path

import duckdb
from pyspark.sql import functions as F

_spec = importlib.util.spec_from_file_location(
    "check_oracle_r7",
    Path(__file__).resolve().parents[1] / "tools" / "check_oracle.py",
)
_co = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_co)


def _cross_check(spark, name, d, views):
    from bytesprocessor_spark.queries import ORACLE, QUERIES

    con = duckdb.connect()
    for t in views:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{d}/{t}.parquet/*.parquet')"
        )
    duck = con.execute(ORACLE[name]).fetchdf()
    sdf = QUERIES[name](spark, d).toPandas()
    duck_cols, duck_rows = _co._pdf_rows(duck)
    spark_cols, spark_rows = _co._pdf_rows(sdf)
    problems = _co.compare(name, spark_cols, spark_rows, duck_cols, duck_rows)
    assert not problems, "\n".join(problems)
    return sdf


def _orders(spark, rows):
    return spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp_ntz"))


def test_interval_overlap_month_straddle_counts_once(spark, tmp_path):
    """Left interval Jan 25 + 21 days overlaps right interval Feb 3 +
    11 days across the Jan/Feb boundary: the pair shares the Jan and
    Feb bins and must appear exactly once, in the overlap-start (Feb)
    bin."""
    d = str(tmp_path)
    # o_custkey=7 satisfies the %50=7 slice; keys chosen so
    # 1 + key % 21 gives the intended lengths (key 20 -> 21 days,
    # key 10 -> 11 days)
    rows = [
        (20, 7, "O", 100.0, "2024-01-25 00:00:00", "1-URGENT"),
        (10, 7, "F", 100.0, "2024-02-03 00:00:00", "1-URGENT"),
    ]
    _orders(spark, rows).write.parquet(f"{d}/orders.parquet")
    sdf = _cross_check(spark, "orders_interval_overlap", d, ["orders"])
    assert len(sdf) == 1
    row = sdf.iloc[0]
    assert row["n_pairs"] == 1, "straddling pair must dedup to one row"
    # overlap = [Feb 3, Feb 14] inclusive = 12 days, starting in Feb
    assert row["month_idx"] == 2024 * 12 + 2 - 1
    assert row["sum_overlap_days"] == 12


def test_kendall_tau_ties_and_singleton_group(spark, tmp_path):
    """Brand A: sizes 1,2,3 with metrics 10,10,30 -> pair (1,2) is a
    tie (neither), (1,3) and (2,3) concordant -> tau = 2/3.  Brand B
    has one size -> no pairs, no output row."""
    d = str(tmp_path)
    rows = [
        (1, "Brand#A", 1, 0.10),
        (2, "Brand#A", 2, 0.10),
        (3, "Brand#A", 3, 0.30),
        (4, "Brand#B", 5, 0.50),
    ]
    spark.createDataFrame(
        rows, "p_partkey long, p_brand string, p_size int, p_retailprice double"
    ).write.parquet(f"{d}/part.parquet")
    sdf = _cross_check(spark, "part_kendall_tau", d, ["part"])
    assert list(sdf["p_brand"]) == ["Brand#A"]
    row = sdf.iloc[0]
    assert (row["n_pairs"], row["n_conc"], row["n_disc"]) == (3, 2, 0)
    assert row["tau_ppm"] == 2_000_000 // 3


def test_target_encoding_singleton_category_excluded(spark, tmp_path):
    """A category with one row has no leave-one-out mean; both engines
    must drop it rather than divide by zero."""
    d = str(tmp_path)
    rows = [
        (1, 1, "O", 10.00, "2024-01-01 00:00:00", "1-URGENT"),
        (2, 2, "O", 20.00, "2024-01-02 00:00:00", "1-URGENT"),
        (3, 3, "O", 30.00, "2024-01-03 00:00:00", "5-LOW"),
    ]
    _orders(spark, rows).write.parquet(f"{d}/orders.parquet")
    sdf = _cross_check(spark, "orders_target_encoding", d, ["orders"])
    assert set(sdf["o_orderpriority"]) == {"1-URGENT"}
    # each URGENT row encodes to the OTHER row's price (centi-cents)
    assert sdf["sum_enc_cc"].sum() == 20_00_00 + 10_00_00


def test_schema_evolution_nulls_only_from_old_files(spark, tmp_path):
    """Pre-evolution (even event_id) rows surface NULL value_c; the
    evolved column round-trips for new files."""
    d = str(tmp_path)
    rows = [
        (0, "2024-01-01 00:00:00", 1, "view", 1.25, "{}"),
        (1, "2024-01-01 01:00:00", 1, "view", 2.50, "{}"),
        (2, "2024-01-01 02:00:00", 2, "click", 4.00, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz")).write.parquet(
        f"{d}/events.parquet"
    )
    sdf = _cross_check(spark, "schema_evolution_read", d, ["events"])
    by_type = {r["event_type"]: r for _, r in sdf.iterrows()}
    assert by_type["view"]["n"] == 2
    assert by_type["view"]["n_pre_evolution"] == 1  # event_id 0
    assert by_type["view"]["sum_value_c"] == 250  # event_id 1 only
    assert by_type["click"]["n_pre_evolution"] == 1
    assert by_type["click"]["sum_value_c"] == 0


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_interval_rows = st.lists(
    st.tuples(
        st.integers(0, 400),      # o_orderkey (drives length 1 + k%21)
        st.sampled_from(["O", "F"]),
        st.integers(0, 27),       # start day within one month-ish span
    ),
    min_size=2,
    max_size=24,
    unique_by=lambda t: t[0],
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_interval_rows)
def test_interval_overlap_matches_oracle_on_random_intervals(
    spark, tmp_path_factory, rows
):
    """Property: the month-bin blocked join equals the naive overlap
    join (the DuckDB oracle) on arbitrary interval sets — including
    boundary-touching and multi-month-straddling pairs."""
    d = str(tmp_path_factory.mktemp("iv"))
    orders = [
        (
            key,
            7,  # custkey slice %50 = 7
            status,
            10.0,
            f"2024-01-{day + 1:02d} 00:00:00",
            "1-URGENT",
        )
        for key, status, day in rows
    ]
    _orders(spark, orders).write.parquet(f"{d}/orders.parquet")
    _cross_check(spark, "orders_interval_overlap", d, ["orders"])


_kendall_rows = st.lists(
    st.tuples(st.integers(1, 6), st.integers(0, 40)),  # (p_size, price decis)
    min_size=1,
    max_size=12,
    unique_by=lambda t: t[0],
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_kendall_rows)
def test_kendall_tau_matches_oracle_on_random_metrics(
    spark, tmp_path_factory, rows
):
    """Property: concordant/discordant/tie accounting agrees with the
    SQL pair enumeration for arbitrary (size, metric) profiles,
    including heavy ties and reversed orderings."""
    d = str(tmp_path_factory.mktemp("kt"))
    parts = [
        (i, "Brand#P", size, price / 10.0)
        for i, (size, price) in enumerate(rows)
    ]
    spark.createDataFrame(
        parts, "p_partkey long, p_brand string, p_size int, p_retailprice double"
    ).write.parquet(f"{d}/part.parquet")
    _cross_check(spark, "part_kendall_tau", d, ["part"])
