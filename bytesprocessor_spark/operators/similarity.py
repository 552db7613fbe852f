"""Similarity search over embedding columns (SURVEY §2.11 L3).

Baseline: brute-force cosine top-k (broadcast the query set, score
every corpus vector, per-query heap via TakeOrdered/window).  Scale
path: LSH bucketing via random hyperplanes so only same-bucket pairs
are scored — the classic ANN trade: recall for a ~bucket-count
reduction in comparisons.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bytesprocessor_spark.functions.vectors import cosine_similarity, dot_product, l2_norm


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k neighbours per query.

    Plan: broadcast the (small) query set against the corpus — a
    broadcast nested-loop join with the similarity computed in codegen;
    per-query top-k by window rank.  The corpus is never shuffled, so
    this scales to any corpus size as long as the query batch fits in a
    broadcast (use :func:`lsh_topk` otherwise).
    Output: (query_id, vec_id, sim, rank).
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("__qv")
        )
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__cv"))
    if metric == "cosine":
        sim = cosine_similarity(F.col("__qv"), F.col("__cv"))
    elif metric == "dot":
        sim = dot_product(F.col("__qv"), F.col("__cv"))
    else:
        raise ValueError(f"unknown metric {metric!r}")
    scored = c.crossJoin(q).withColumn("sim", sim).where(F.col("query_id") != F.col("vec_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "sim", "rank")
    )


def _hyperplane(dim: int, seed: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane from a counter
    hash (no numpy on executors; driver-side constant folded into the
    plan)."""
    import hashlib

    vals = []
    for j in range(dim):
        h = hashlib.md5(f"{seed}:{j}".encode()).hexdigest()
        vals.append((int(h[:8], 16) / 0x7FFFFFFF) - 1.0)
    return vals


def lsh_bucket(vec_col, dim: int, n_planes: int, seed: int = 42):
    """Random-hyperplane (SRP) bucket id: sign bit per plane packed into
    a long.  Same-bucket vectors are cosine-close with high probability.
    """
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = _hyperplane(dim, seed * 1000 + p)
        dp = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(v) for v in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        bucket = bucket.bitwiseOR(
            F.shiftleft(F.when(dp > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")), p)
        )
    return bucket


def _lsh_tables(df: DataFrame, vec: str, dim: int, n_planes: int, n_tables: int) -> DataFrame:
    """Tag each row with one (table, bucket) pair per hash table —
    multi-probe amplification: a near pair is a candidate if it
    collides in ANY table (OR-construction over AND-constructions),
    P(candidate) = 1-(1-p^planes)^tables for per-plane agreement p."""
    tags = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(t).alias("tbl"),
                    lsh_bucket(F.col(vec), dim, n_planes, seed=1000 + t).alias("bkt"),
                )
                for t in range(n_tables)
            ]
        )
    )
    return df.withColumn("__tag", tags).select(*df.columns, "__tag.tbl", "__tag.bkt")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 4,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: SRP-bucket both sides into ``n_tables``
    independent hash tables, equi-join on (table, bucket), dedup
    candidates, score once per candidate pair.

    One shuffle on the (table, bucket) key; the pair space shrinks
    ~2**n_planes-fold per table.  Tune recall with the standard LSH
    trade: more planes => fewer false candidates, more tables =>
    fewer false negatives."""
    c = _lsh_tables(
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__cv")),
        "__cv", dim, n_planes, n_tables,
    )
    q = _lsh_tables(
        queries.select(F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("__qv")),
        "__qv", dim, n_planes, n_tables,
    )
    cand = (
        c.join(q, ["tbl", "bkt"])
        .where(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id", "__qv", "__cv")
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = cand.withColumn("sim", cosine_similarity(F.col("__qv"), F.col("__cv")))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "sim", "rank")
    )
