"""Vector math over array<float> embedding columns (SURVEY §2.11 L3).

All built-in higher-order functions (zip_with / aggregate) — JVM-side,
no Python in the hot path.  Accumulation is forced to double and runs
strictly left-to-right, which makes results bit-deterministic and
comparable across engines.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves string annotations in module globals
from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


# --- Arrow-vectorized kernels -------------------------------------------------
#
# The HOF forms above are interpreted (no whole-stage codegen), and
# unrolling them into 64-term scalar chains breaks Janino compilation
# outright (InternalCompilerException -> interpreted fallback, measured
# slower still).  For dense per-pair scoring the efficient engine path
# is Arrow batches + numpy — vectorized C loops, ~100x the interpreted
# expression walk.  Determinism is preserved by the same fixed-point
# trick: after round(x*1e6) every product (<2^40) and partial sum
# (<2^53) is an exact integer in a double, so ANY summation order —
# including BLAS blocking — yields the identical value DuckDB computes.


def quantize_micro(a: Column) -> Column:
    """array<float/double> -> array<bigint> in 1e-6 fixed point —
    round-half-away in both Spark and DuckDB; the shared entry to the
    exact-integer arithmetic the oracles depend on."""
    return F.transform(a, lambda x: F.round(x.cast("double") * 1_000_000).cast("long"))


def sq_dist_q(a: Column, b: Column) -> Column:
    """Exact integer squared L2 distance between two quantized
    vectors (each term < 2^42, sums < 2^53-safe for dims <= 2048)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def np_round_half_away(y):
    """Round-half-away-from-zero on a float64 ndarray — the rounding
    rule Spark's F.round and DuckDB's round() share; numpy's np.round
    rounds half-to-even and would diverge on exact .5 products."""
    import numpy as np

    return np.where(y >= 0, np.floor(y + 0.5), np.ceil(y - 0.5))


def to_matrix(series, quantize: bool):
    """pandas Series of array<float> -> float64 [n, dim] matrix,
    optionally 1e-6 fixed-point quantized."""
    import numpy as np

    M = np.array([np.asarray(v, dtype=np.float64) for v in series], dtype=np.float64)
    return np_round_half_away(M * 1e6) if quantize else M


def cosine_pairs_udf(quantize: bool, quantize_b: bool | None = None):
    """Vectorized (v_a, v_b) -> cosine pandas UDF for pair verification
    after a candidate join.

    ``quantize_b`` (default: same as ``quantize``) allows PER-SIDE
    fixed-pointing — the r11 optimization that moves the 1e-6
    quantization of a corpus-scale side INTO the numpy batch (one
    vectorized multiply+round) instead of an interpreted
    ``F.transform`` higher-order function over every corpus row
    (guide §4.2: hand whole batches to vectorized native code).  The
    rounding (np_round_half_away == Spark round == DuckDB ROUND) and
    the resulting exact-integer doubles are bit-identical to the
    column-expression form, so scores are unchanged.

    Marked nondeterministic (it isn't — it's a pure function) purely to
    stop Catalyst's expression duplication: the common call shape
    ``withColumn("sim", udf).where(sim >= t)`` otherwise compiles to
    TWO ArrowEvalPython nodes (one feeding the Filter, one recomputing
    the projected value), doubling the Python-worker cost of every
    verify join.  The flag forces a single evaluation with the filter
    applied above it; it only constrains optimizer freedom, never
    results."""
    from pyspark.sql.functions import pandas_udf

    qb = quantize if quantize_b is None else quantize_b

    @pandas_udf("double")
    def _cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        import numpy as np

        if len(va) == 0:
            return pd.Series([], dtype="float64")
        A = to_matrix(va, quantize)
        B = to_matrix(vb, qb)
        dots = np.einsum("ij,ij->i", A, B)
        na = np.sqrt(np.einsum("ij,ij->i", A, A))
        nb = np.sqrt(np.einsum("ij,ij->i", B, B))
        return pd.Series(dots / (na * nb))

    return _cos.asNondeterministic()


def int8_scale(a: Column) -> Column:
    """Per-vector symmetric int8 scale: 127 / max|x|.  Every op is a
    deterministic IEEE double op, so engines agree bit-for-bit; a
    zero vector yields NULL (nothing to quantize)."""
    max_abs = F.array_max(F.transform(a, lambda x: F.abs(x.cast("double"))))
    return F.lit(127.0) / F.nullif(max_abs, F.lit(0.0))


def quantize_int8(a: Column, scale: Column) -> Column:
    """array<float> -> array<bigint> in [-127, 127]: round(x*scale),
    round-half-away in both Spark and DuckDB.  Int8 storage is the
    standard 4x memory cut for ANN serving; the integer dot product
    that follows is exact (|q|<=127, dims<=2^15 => sums < 2^53)."""
    return F.transform(a, lambda x: F.round(x.cast("double") * scale).cast("long"))


def whiten_embeddings(
    df,
    vec_col: str = "embedding",
    eps: float = 1e-6,
):
    """ZCA-whiten an embedding column: out = W (x - mu) with
    W = V diag(1/sqrt(lambda + eps)) V^T from the eigendecomposition
    of the corpus covariance — the retrieval-pipeline preprocessing
    step (anisotropic embedding spaces hurt cosine ANN recall; see
    e.g. the post-processing in SimCSE-style pipelines).

    Distribution of work, the pattern this repo uses for all bounded
    linear algebra (the embedding_gram_matrix row's docstring):

      * mean + second-moment matrix: ONE distributed aggregate — the
        d(d+1)/2 Gram cells and the d mean sums are the only shuffled
        data; the corpus never shuffles.
      * eigh: driver-side numpy on the d x d matrix (d^2 doubles —
        KBs; this is not a scale concern at any corpus size).
      * transform: the d x d rotation broadcasts back and applies per
        row as one Arrow-batched matmul (vectorized pandas UDF — the
        legitimate Python seam; a 4096-term codegen expression tree
        per output dim would be slower to compile than to run).

    Returns a DataFrame with ``vec_col`` replaced by the whitened
    vector (float64).  Whitening is float by nature — this is a
    feature transform, not an oracle-checked aggregate; tests pin the
    algebraic contract (whitened covariance == identity)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, DoubleType

    spark = df.sparkSession
    d = len(df.select(vec_col).first()[0])

    e = df.select(F.posexplode(F.col(vec_col).cast("array<double>")).alias("i", "x"))
    mu = np.zeros(d)
    for r in e.groupBy("i").agg(F.avg("x").alias("m")).collect():
        mu[r.i] = r.m
    # second moment E[xx^T] via the Gram-cell aggregate (upper triangle)
    terms = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(d - 1)),
            lambda i: F.transform(
                F.sequence(i, F.lit(d - 1)),
                lambda j: F.struct(
                    i.alias("i"),
                    j.alias("j"),
                    (
                        F.element_at(F.col("__v"), i + 1)
                        * F.element_at(F.col("__v"), j + 1)
                    ).alias("p"),
                ),
            ),
        )
    )
    n = df.count()
    cells = (
        df.select(F.col(vec_col).cast("array<double>").alias("__v"))
        .select(F.explode(terms).alias("t"))
        .groupBy(F.col("t.i").alias("i"), F.col("t.j").alias("j"))
        .agg(F.sum("t.p").alias("s"))
        .collect()
    )
    m2 = np.zeros((d, d))
    for r in cells:
        m2[r.i, r.j] = m2[r.j, r.i] = r.s / n
    cov = m2 - np.outer(mu, mu)
    lam, vecs = np.linalg.eigh(cov)
    w = (vecs * (1.0 / np.sqrt(np.maximum(lam, 0.0) + eps))) @ vecs.T

    wb = spark.sparkContext.broadcast((w, mu))

    @F.pandas_udf(ArrayType(DoubleType()))
    def _apply(col: pd.Series) -> pd.Series:
        wm, mum = wb.value
        mat = np.vstack(col.to_numpy())
        out = (mat - mum) @ wm.T
        return pd.Series(list(out))

    return df.withColumn(vec_col, _apply(F.col(vec_col).cast("array<double>")))
