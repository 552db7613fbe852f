"""Retrieval, record-linkage, and graph-traversal operators.

The discovery-side complement of the dedup/similarity machinery: once
a corpus is curated, users search it (BM25 ranked retrieval over the
inverted-index machinery of L4c), resolve noisy external references
into it (blocked fuzzy linkage — the scale-out form of F10's
Levenshtein matcher), and walk entity relationships extracted from it
(multi-source BFS — the traversal primitive behind n-degree-reach /
blast-radius questions, completing the GR family next to connected
components, PageRank, and triangles).

Round-5 additions: text_distinctive_terms (L4q log-odds with an
informative prior — source vs corpus contrast), retrieval_rrf_fusion
(L4s reciprocal rank fusion of the BM25 and exact-cosine rankings —
calibration-free hybrid search), and graph_degree_histogram (GR5 —
the pre-traversal skew diagnostic with membership checksums).

All rows follow the corpus determinism contract (queries.py module
docstring): transcendentals are quantized to integer micro-units
per-term BEFORE any reduction, so no float sum depends on reduction
order; hop counts and edit distances are integers by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bytesprocessor_spark.operators.ranking import bounded_single_group
from bytesprocessor_spark.queries import _t, query
from bytesprocessor_spark.functions.text import tokenize

# ---------------------------------------------------------------------------
# L4p: BM25 ranked retrieval
# ---------------------------------------------------------------------------

_BM25_TERMS = ("spark", "merge", "vector")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 20

_DUCK_TOKS_ALL = (
    "[x for x in regexp_split_to_array(lower(text), '[^a-z0-9]+') if len(x) > 0]"
)

_BM25_SQL = f"""
    WITH toks AS (
      SELECT doc_id, unnest({_DUCK_TOKS_ALL}) AS token FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    tot AS (SELECT COUNT(*) AS n_docs,
                   CAST(SUM(dl) AS BIGINT) AS total_tokens FROM dl),
    q AS (SELECT unnest({list(_BM25_TERMS)!r}) AS token),
    tf AS (
      SELECT t.doc_id, t.token, COUNT(*) AS tf
      FROM toks t JOIN q USING (token)
      GROUP BY t.doc_id, t.token
    ),
    df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
    scored AS (
      SELECT tf.doc_id,
             CAST(ROUND(
               LN(1.0 + (CAST(tot.n_docs - df.df AS DOUBLE) + 0.5)
                        / (CAST(df.df AS DOUBLE) + 0.5))
               * ((CAST(tf.tf AS DOUBLE) * {1.0 + _BM25_K1})
                  / (CAST(tf.tf AS DOUBLE)
                     + {_BM25_K1} * ({1.0 - _BM25_B}
                        + {_BM25_B} * (CAST(dl.dl * tot.n_docs AS DOUBLE)
                                       / CAST(tot.total_tokens AS DOUBLE)))))
               * 1000000) AS BIGINT) AS s_micro
      FROM tf JOIN df USING (token) JOIN dl USING (doc_id) CROSS JOIN tot
    ),
    agg AS (
      SELECT doc_id, COUNT(*) AS n_terms,
             CAST(SUM(s_micro) AS BIGINT) AS score_micro
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id, n_terms, score_micro,
           ROW_NUMBER() OVER (ORDER BY score_micro DESC, doc_id) AS rank
    FROM agg ORDER BY rank LIMIT {_BM25_TOPK}
"""


@query("text_bm25_topk", _BM25_SQL)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4p BM25 ranked retrieval: top-k documents for a fixed query
    term set, scored with the Robertson BM25 formula (k1=1.2, b=0.75,
    idf = ln(1 + (N-df+0.5)/(df+0.5))) over the same tokenizer the
    inverted index (L4c) uses.

    Determinism: each (doc, term) partial score is quantized to an
    integer micro-unit BEFORE the per-document sum, so the only float
    reduction in the query is replaced by exact int64 addition; the
    ln/divide tree is a fixed sequence of IEEE ops written identically
    in both engines.

    Plan shape: one corpus scan feeds both the doc-length table and
    the term postings (Catalyst prunes to the 2 referenced columns);
    df (3 rows) and the corpus totals (1 row) broadcast onto the
    postings, so the only corpus-scale shuffles are the two hash
    aggregates on doc_id — at 100 TB this is exactly the inverted-
    index build plus a broadcast-annotated rescore, and the top-k is
    a distributed TakeOrdered, never a global sort."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokenize(F.col("text"))).alias("token"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    tot = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").cast("long").alias("total_tokens")
    )
    tf = (
        toks.where(F.col("token").isin(*_BM25_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    dft = tf.groupBy("token").agg(F.count("*").alias("df"))
    j = (
        tf.join(F.broadcast(dft), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(tot))
    )
    idf = F.log(
        F.lit(1.0)
        + ((F.col("n_docs") - F.col("df")).cast("double") + 0.5)
        / (F.col("df").cast("double") + 0.5)
    )
    frac = (F.col("tf").cast("double") * (1.0 + _BM25_K1)) / (
        F.col("tf").cast("double")
        + _BM25_K1
        * (
            (1.0 - _BM25_B)
            + _BM25_B
            * (
                (F.col("dl") * F.col("n_docs")).cast("double")
                / F.col("total_tokens").cast("double")
            )
        )
    )
    scored = j.select(
        "doc_id", F.round(idf * frac * 1000000).cast("long").alias("s_micro")
    )
    agg = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_terms"), F.sum("s_micro").cast("long").alias("score_micro")
    )
    top = bounded_single_group(
        agg.orderBy(F.col("score_micro").desc(), "doc_id").limit(_BM25_TOPK)
    )
    w = Window.partitionBy("__opid").orderBy(F.col("score_micro").desc(), "doc_id")
    return top.select(
        "doc_id", "n_terms", "score_micro", F.row_number().over(w).alias("rank")
    ).orderBy("rank")


# ---------------------------------------------------------------------------
# F10b: blocked fuzzy record linkage
# ---------------------------------------------------------------------------

_LINKAGE_SQL = """
    WITH probes AS (
      SELECT p_partkey AS probe_id,
             '#' || substr(p_name, 2) AS probe
      FROM part WHERE p_partkey < 100
    ),
    pb AS (
      SELECT probe_id, probe,
             regexp_extract(probe, '[a-z]+$') AS block_key
      FROM probes
    ),
    cb AS (
      SELECT p_partkey, p_name,
             regexp_extract(p_name, '[a-z]+$') AS block_key
      FROM part
    ),
    cand AS (
      SELECT pb.probe_id, pb.probe, cb.p_partkey, cb.p_name,
             levenshtein(pb.probe, cb.p_name) AS dist
      FROM pb JOIN cb USING (block_key)
    ),
    best AS (
      SELECT probe_id, probe, p_partkey, p_name, dist,
             COUNT(*) OVER (PARTITION BY probe_id) AS n_candidates,
             ROW_NUMBER() OVER (PARTITION BY probe_id
                                ORDER BY dist, p_partkey) AS rk
      FROM cand
    )
    SELECT probe_id, probe, p_partkey AS matched_id, p_name AS matched_name,
           CAST(dist AS BIGINT) AS dist,
           CAST(n_candidates AS BIGINT) AS n_candidates
    FROM best WHERE rk = 1 ORDER BY probe_id
"""


@query("linkage_blocked_fuzzy", _LINKAGE_SQL)
def linkage_blocked_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10b blocked fuzzy record linkage — the scale-out form of F10
    (sql_fuzzy_match): noisy probe names (deterministic first-char
    corruption) resolve back to the catalog WITHOUT a cross join.  The
    block key is derived from the PROBE text itself (its last intact
    word), so the demonstration is honest: a real linkage never sees
    the clean source row at blocking time.  Candidates = probe x
    catalog pairs sharing a block key; only those pairs pay the
    Levenshtein verify; min-distance with id tiebreak picks the match,
    and n_candidates exposes the blocking selectivity per probe.

    Plan shape: one equi-join (shuffle or broadcast on the block key)
    replaces F10's O(probes x catalog) cross join — the same
    block-then-verify pattern as the MinHash-LSH dedup family, applied
    to entity resolution.  At 100 TB the block key is the unit of
    skew: a hot key (stopword noun) is the salting case operators/
    skew.py handles; the verify cost is candidate-bounded either way."""
    part = _t(spark, sf_dir, "part")
    probes = part.where(F.col("p_partkey") < 100).select(
        F.col("p_partkey").alias("probe_id"),
        F.concat(F.lit("#"), F.expr("substr(p_name, 2)")).alias("probe"),
    )
    pb = probes.withColumn("block_key", F.regexp_extract("probe", "[a-z]+$", 0))
    cb = part.select(
        "p_partkey", "p_name", F.regexp_extract("p_name", "[a-z]+$", 0).alias("block_key")
    )
    cand = pb.join(cb, "block_key").select(
        "probe_id", "probe", "p_partkey", "p_name",
        F.levenshtein("probe", "p_name").alias("dist"),
    )
    w = Window.partitionBy("probe_id")
    best = cand.select(
        "*",
        F.count("*").over(w).alias("n_candidates"),
        F.row_number().over(w.orderBy("dist", "p_partkey")).alias("rk"),
    )
    return (
        best.where(F.col("rk") == 1)
        .select(
            "probe_id", "probe",
            F.col("p_partkey").alias("matched_id"),
            F.col("p_name").alias("matched_name"),
            F.col("dist").cast("long").alias("dist"),
            F.col("n_candidates").cast("long").alias("n_candidates"),
        )
        .orderBy("probe_id")
    )


# ---------------------------------------------------------------------------
# GR4: multi-source BFS hop distances
# ---------------------------------------------------------------------------

_BFS_DEPTH = 3
_BFS_SEED_MAX = 4  # custkeys 0..4 seed the traversal

_BFS_SQL = f"""
    WITH RECURSIVE eb AS (
      SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    e AS (SELECT c AS src, s AS dst FROM eb
          UNION ALL SELECT s AS src, c AS dst FROM eb),
    seeds AS (SELECT DISTINCT o_custkey * 2 AS seed FROM orders
              WHERE o_custkey <= {_BFS_SEED_MAX}),
    walk AS (
      SELECT seed, seed AS node, 0 AS d FROM seeds
      UNION
      SELECT w.seed, e.dst AS node, w.d + 1 AS d
      FROM walk w JOIN e ON e.src = w.node
      WHERE w.d < {_BFS_DEPTH}
    ),
    m AS (SELECT seed, node, MIN(d) AS dist FROM walk GROUP BY seed, node)
    SELECT CAST(seed // 2 AS BIGINT) AS seed_custkey,
           CAST(dist AS BIGINT) AS dist,
           COUNT(*) AS n_nodes,
           CAST(SUM(node) AS BIGINT) AS node_checksum
    FROM m GROUP BY 1, 2 ORDER BY 1, 2
"""


@query("graph_bfs_reach", _BFS_SQL)
def graph_bfs_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GR4 multi-source BFS over the bipartite customer-supplier trade
    graph (same node packing as GR2 PageRank): minimum hop distance
    from each seed customer to every node within {_BFS_DEPTH} hops,
    reported as a per-(seed, distance) reach histogram with a node-id
    checksum — the n-degree-reach / blast-radius primitive.

    Determinism: hop counts are integers; the oracle is a recursive-
    CTE closure over the identical edge table.  Plan shape: the level
    loop in operators/graph.py:bfs_distances is one frontier-edge join
    plus one min-aggregate per level with localCheckpoint lineage
    cuts; k seeds ride one traversal as a second key column.  At
    100 TB each level is edge-linear, the same contract as connected
    components."""
    from bytesprocessor_spark.operators.graph import (
        bfs_distances,
        trade_edges_symmetric,
    )

    # r11: edge build shared via the session-memoized trade_pairs_packed
    edges = trade_edges_symmetric(spark, sf_dir)
    seeds = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_custkey") <= _BFS_SEED_MAX)
        .select((F.col("o_custkey") * 2).alias("seed"))
        .distinct()
    )
    dist = bfs_distances(edges, seeds, max_depth=_BFS_DEPTH)
    return (
        dist.groupBy(
            F.expr("seed div 2").alias("seed_custkey"),
            F.col("dist").cast("long").alias("dist"),
        )
        .agg(
            F.count("*").alias("n_nodes"),
            F.sum("node").cast("long").alias("node_checksum"),
        )
        .orderBy("seed_custkey", "dist")
    )


# ---------------------------------------------------------------------------
# L4q: distinctive terms per source (log-odds with informative prior)
# ---------------------------------------------------------------------------

_DISTINCT_TERMS_SQL = """
    WITH t AS (
      SELECT source,
             unnest([x for x in regexp_split_to_array(lower(text), '[^a-z0-9]+')
                     if len(x) > 0]) AS tok
      FROM documents
    ),
    sw AS (SELECT source, tok, COUNT(*) AS y_sw FROM t GROUP BY 1, 2),
    wt AS (SELECT tok, CAST(SUM(y_sw) AS BIGINT) AS y_w FROM sw GROUP BY tok),
    st AS (SELECT source, CAST(SUM(y_sw) AS BIGINT) AS n_s FROM sw GROUP BY source),
    tot AS (SELECT CAST(SUM(y_w) AS BIGINT) AS n FROM wt),
    d AS (
      SELECT sw.source, sw.tok, sw.y_sw, wt.y_w, st.n_s, tot.n,
             CAST(ROUND(LN(CAST(sw.y_sw + wt.y_w AS DOUBLE)
                           / CAST(st.n_s + tot.n - (sw.y_sw + wt.y_w) AS DOUBLE))
                        * 1000000) AS BIGINT)
             - CAST(ROUND(LN(CAST((wt.y_w - sw.y_sw) + wt.y_w AS DOUBLE)
                             / CAST((tot.n - st.n_s) + tot.n
                                    - ((wt.y_w - sw.y_sw) + wt.y_w) AS DOUBLE))
                          * 1000000) AS BIGINT) AS delta_micro
      FROM sw JOIN wt USING (tok) JOIN st USING (source) CROSS JOIN tot
    ),
    r AS (
      SELECT source, tok, y_sw, delta_micro,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY delta_micro DESC, tok) AS rk
      FROM d
    )
    SELECT source, rk, tok, CAST(y_sw AS BIGINT) AS y_sw, delta_micro
    FROM r WHERE rk <= 3 ORDER BY source, rk
"""


@query("text_distinctive_terms", _DISTINCT_TERMS_SQL)
def text_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4q distinctive terms per source: log-odds ratio with an
    informative Dirichlet prior (Monroe, Colaresi & Quinn 2008 —
    "Fightin' Words"), the corpus-linguistics complement of TF-IDF
    (L4i scores terms within a DOCUMENT; this contrasts a SOURCE
    against the rest of the corpus, with the corpus itself as the
    prior so rare-term noise is damped).  Top-3 terms per source by
    the quantized log-odds delta.

    Determinism: each ln is quantized to integer micro-units before
    the subtraction (the PSI/surprisal idiom); everything after is
    int64.  Plan shape: one token explode -> one (source, token) hash
    agg; the token-total and source-total tables are vocabulary- and
    K-sized broadcasts back onto it; the top-3 window partitions on
    source over the vocab-bounded scored table."""
    docs = _t(spark, sf_dir, "documents")
    t = docs.select("source", F.explode(tokenize(F.col("text"))).alias("tok"))
    sw = t.groupBy("source", "tok").agg(F.count("*").alias("y_sw"))
    wt = sw.groupBy("tok").agg(F.sum("y_sw").cast("long").alias("y_w"))
    st = sw.groupBy("source").agg(F.sum("y_sw").cast("long").alias("n_s"))
    tot = wt.agg(F.sum("y_w").cast("long").alias("n"))
    d = (
        sw.join(F.broadcast(wt), "tok")
        .join(F.broadcast(st), "source")
        .crossJoin(F.broadcast(tot))
    )
    ln1 = F.round(
        F.log(
            (F.col("y_sw") + F.col("y_w")).cast("double")
            / (F.col("n_s") + F.col("n") - (F.col("y_sw") + F.col("y_w"))).cast("double")
        )
        * 1000000
    ).cast("long")
    ln2 = F.round(
        F.log(
            ((F.col("y_w") - F.col("y_sw")) + F.col("y_w")).cast("double")
            / (
                (F.col("n") - F.col("n_s"))
                + F.col("n")
                - ((F.col("y_w") - F.col("y_sw")) + F.col("y_w"))
            ).cast("double")
        )
        * 1000000
    ).cast("long")
    scored = d.select(
        "source", "tok", "y_sw", (ln1 - ln2).alias("delta_micro")
    )
    w = Window.partitionBy("source").orderBy(F.col("delta_micro").desc(), "tok")
    return (
        scored.select(
            "source", F.row_number().over(w).alias("rk"), "tok",
            F.col("y_sw").cast("long").alias("y_sw"), "delta_micro",
        )
        .where(F.col("rk") <= 3)
        .orderBy("source", "rk")
    )


# ---------------------------------------------------------------------------
# L4s: reciprocal-rank-fusion hybrid retrieval (BM25 + embedding)
# ---------------------------------------------------------------------------

_RRF_K = 60          # the standard RRF damping constant (Cormack 2009)
_RRF_PROBE = 7       # pinned probe vector: doc_id/vec_id alignment
_RRF_LIST = 20       # per-list depth fused
_RRF_TOPK = 10

_RRF_QUANT = "list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000000))"

_RRF_SQL = f"""
    WITH bm AS (
      SELECT doc_id, rank AS r_b FROM ({_BM25_SQL})
    ),
    e AS (SELECT vec_id, {_RRF_QUANT} AS v FROM embeddings),
    qp AS (SELECT v AS qv FROM e WHERE vec_id = {_RRF_PROBE}),
    s AS (
      SELECT e.vec_id,
             list_dot_product(qv, v)
               / (SQRT(list_dot_product(qv, qv)) * SQRT(list_dot_product(v, v))) AS sim
      FROM e CROSS JOIN qp
      WHERE e.vec_id <> {_RRF_PROBE}
    ),
    cr AS (
      SELECT vec_id AS doc_id,
             ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id) AS r_c
      FROM s
    ),
    cl AS (SELECT doc_id, r_c FROM cr WHERE r_c <= {_RRF_LIST}),
    f AS (
      SELECT COALESCE(bm.doc_id, cl.doc_id) AS doc_id,
             CAST(COALESCE(bm.r_b, 0) AS BIGINT) AS bm25_rank,
             CAST(COALESCE(cl.r_c, 0) AS BIGINT) AS cos_rank,
             CAST(COALESCE(1000000 // ({_RRF_K} + bm.r_b), 0)
                  + COALESCE(1000000 // ({_RRF_K} + cl.r_c), 0) AS BIGINT) AS rrf_micro
      FROM bm FULL OUTER JOIN cl ON bm.doc_id = cl.doc_id
    )
    SELECT doc_id, bm25_rank, cos_rank, rrf_micro,
           ROW_NUMBER() OVER (ORDER BY rrf_micro DESC, doc_id) AS rank
    FROM f ORDER BY rank LIMIT {_RRF_TOPK}
"""


@query("retrieval_rrf_fusion", _RRF_SQL)
def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4s hybrid retrieval via reciprocal rank fusion (Cormack,
    Clarke & Buettcher SIGIR'09): the lexical ranking (L4p BM25, fixed
    term query) and the semantic ranking (exact cosine against a
    pinned probe embedding, doc_id/vec_id aligned) fuse by
    rrf(d) = sum over lists of 1/(60 + rank_d) — the standard way
    production search combines keyword and vector retrieval without
    score calibration, since RRF consumes only RANKS (scale-free,
    robust to one list's score distribution drifting).

    Determinism: each reciprocal is the integer 1000000 // (60+rank)
    BEFORE the sum (micro-quantization idiom); both input rankings are
    deterministic (BM25 micro-scores; cosine doubles from identical
    IEEE trees over integer-quantized vectors, vec_id tiebreaks).
    Absent-from-list contributes exactly 0, rank columns report 0.

    Plan shape: the BM25 branch is the L4p plan unchanged (two doc_id
    aggs + broadcasts, TakeOrdered top-20); the cosine branch is one
    corpus scan against a 1-row broadcast probe with a top-20 window;
    the fusion itself is a full outer join of two <=20-row lists —
    driver-trivial at any scale."""
    from bytesprocessor_spark.queries import QUERIES
    from bytesprocessor_spark.functions.vectors import dot_product

    bm = (
        QUERIES["text_bm25_topk"](spark, sf_dir)
        .select("doc_id", F.col("rank").alias("r_b"))
    )
    emb = _t(spark, sf_dir, "embeddings")
    quant = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: F.round(x.cast("double") * 1000000.0)).alias(
            "v"
        ),
    )
    qp = F.broadcast(
        quant.where(F.col("vec_id") == _RRF_PROBE).select(F.col("v").alias("qv"))
    )
    sim = dot_product(F.col("qv"), F.col("v")) / (
        F.sqrt(dot_product(F.col("qv"), F.col("qv")))
        * F.sqrt(dot_product(F.col("v"), F.col("v")))
    )
    s = (
        quant.where(F.col("vec_id") != _RRF_PROBE)
        .crossJoin(qp)
        .withColumn("sim", sim)
    )
    # rank-then-filter over the scored corpus would single-partition
    # the whole table: TakeOrdered the top list FIRST, rank the
    # bounded prefix (identical result under the unique total order)
    top_c = bounded_single_group(
        s.select("vec_id", "sim")
        .orderBy(F.col("sim").desc(), F.col("vec_id"))
        .limit(_RRF_LIST)
    )
    wc = Window.partitionBy("__opid").orderBy(F.col("sim").desc(), F.col("vec_id"))
    cl = top_c.select(
        F.col("vec_id").alias("doc_id"), F.row_number().over(wc).alias("r_c")
    )
    f = bm.join(cl, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce(F.col("r_b"), F.lit(0)).cast("long").alias("bm25_rank"),
        F.coalesce(F.col("r_c"), F.lit(0)).cast("long").alias("cos_rank"),
        (
            F.coalesce(F.expr(f"1000000 div ({_RRF_K} + r_b)"), F.lit(0))
            + F.coalesce(F.expr(f"1000000 div ({_RRF_K} + r_c)"), F.lit(0))
        )
        .cast("long")
        .alias("rrf_micro"),
    )
    # f is the union of two bounded top lists
    wf = Window.partitionBy("__opid").orderBy(F.col("rrf_micro").desc(), F.col("doc_id"))
    return (
        bounded_single_group(f)
        .withColumn("rank", F.row_number().over(wf))
        .orderBy("rank")
        .limit(_RRF_TOPK)
        .drop("__opid")
    )


# ---------------------------------------------------------------------------
# GR5: degree distribution of the trade graph
# ---------------------------------------------------------------------------

@query(
    "graph_degree_histogram",
    """
    WITH eb AS (
      SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    e AS (SELECT c AS src FROM eb UNION ALL SELECT s FROM eb),
    d AS (SELECT src AS node, COUNT(*) AS deg FROM e GROUP BY src)
    SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS side,
           CAST(deg AS BIGINT) AS degree,
           COUNT(*) AS n_nodes,
           CAST(SUM(node) AS BIGINT) AS node_checksum
    FROM d GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def graph_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GR5 degree distribution of the GR2/GR4 trade graph, per side of
    the bipartition — the first diagnostic read before ANY iterative
    graph algorithm at scale: the histogram's tail is the skew plan
    (a power-law hub means the per-iteration edge shuffle needs
    salting; a flat histogram means plain hash partitioning holds),
    and its shape over time is the graph-drift monitor.  node_checksum
    pins membership, not just counts.

    Plan shape: one distinct-edge agg (the same first shuffle every
    graph row pays), one degree agg keyed on node, one histogram agg
    on (side, degree) — strictly cheaper than any traversal; all keys
    are the graph's own ids."""
    from bytesprocessor_spark.operators.graph import trade_pairs_packed

    # r11: the distinct-pair build is the shared session-memoized table
    eb = trade_pairs_packed(spark, sf_dir)
    e = eb.select(F.col("c").alias("src")).unionAll(eb.select(F.col("s")))
    d = e.groupBy("src").agg(F.count("*").alias("deg"))
    return (
        d.groupBy(
            F.when(F.col("src") % 2 == 0, "customer")
            .otherwise("supplier")
            .alias("side"),
            F.col("deg").cast("long").alias("degree"),
        )
        .agg(
            F.count("*").alias("n_nodes"),
            F.sum("src").cast("long").alias("node_checksum"),
        )
        .orderBy("side", "degree")
    )


# ---------------------------------------------------------------------------
# L4v: RAKE keyphrase extraction
# ---------------------------------------------------------------------------

_RAKE_TOPK = 20
_RAKE_MAXLEN = 3

from bytesprocessor_spark.functions.text import _EN_STOPWORDS as _RAKE_STOPWORDS

_RAKE_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in _RAKE_STOPWORDS) + "]"

_RAKE_SQL = f"""
    WITH tk AS (
      SELECT doc_id,
             unnest([x for x in regexp_split_to_array(lower(text), '[^a-z0-9]+')
                     if len(x) > 0]) AS tok,
             generate_subscripts([x for x in
               regexp_split_to_array(lower(text), '[^a-z0-9]+')
               if len(x) > 0], 1) AS idx
      FROM documents
    ),
    f AS (
      SELECT doc_id, tok, idx,
             CASE WHEN list_contains({_RAKE_STOP_SQL}, tok) THEN 1 ELSE 0 END AS is_stop
      FROM tk
    ),
    g AS (
      SELECT doc_id, tok, idx, is_stop,
             SUM(is_stop) OVER (PARTITION BY doc_id ORDER BY idx
                                ROWS UNBOUNDED PRECEDING) AS grp
      FROM f
    ),
    ph AS (
      SELECT doc_id, grp,
             string_agg(tok, ' ' ORDER BY idx) AS phrase,
             COUNT(*) AS plen
      FROM g WHERE is_stop = 0
      GROUP BY doc_id, grp
      HAVING COUNT(*) <= {_RAKE_MAXLEN}
    ),
    pw AS (
      SELECT doc_id, grp, phrase, plen, unnest(string_split(phrase, ' ')) AS w
      FROM ph
    ),
    ws AS (
      SELECT w, CAST(SUM(plen) * 1000000 // COUNT(*) AS BIGINT) AS s_q
      FROM pw GROUP BY w
    ),
    psc AS (
      SELECT pw.doc_id, pw.grp, pw.phrase,
             CAST(SUM(ws.s_q) AS BIGINT) AS score_micro
      FROM pw JOIN ws ON pw.w = ws.w
      GROUP BY pw.doc_id, pw.grp, pw.phrase
    ),
    agg AS (
      SELECT phrase, COUNT(*) AS n_occurrences,
             CAST(MAX(score_micro) AS BIGINT) AS score_micro
      FROM psc GROUP BY phrase
    )
    SELECT phrase, n_occurrences, score_micro,
           ROW_NUMBER() OVER (ORDER BY score_micro DESC, phrase) AS rank
    FROM agg ORDER BY rank LIMIT {_RAKE_TOPK}
"""


@query("text_rake_keyphrases", _RAKE_SQL)
def text_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4v RAKE keyphrase extraction (Rose et al. 2010): candidate
    phrases are maximal stopword-delimited runs of content words
    (capped at 3 words), each word scored deg/freq over the phrase
    corpus (deg = summed lengths of the phrases it appears in — words
    that live in long phrases score high), phrase score = sum of its
    word scores; top-20 distinct phrases.  The unsupervised
    key-term surface for corpus exploration and index seeding, built
    from the same tokenizer and stopword list as L4's quality
    heuristics.

    Determinism: word scores are floored integer micro-units
    (deg*1e6 // freq) BEFORE the per-phrase sum; phrase identity is
    the joined token string; ranking ties break on the phrase text.

    Plan shape: tokenize+posexplode -> stopword-prefix-sum window
    keyed by doc -> phrase agg keyed by (doc, grp) -> word-score agg
    keyed by word (vocab-bounded) joined back -> phrase-text agg.
    Every shuffle is keyed by doc, word, or phrase — no pairing, no
    driver loop."""
    from bytesprocessor_spark.functions.text import tokenize, _EN_STOPWORDS

    docs = _t(spark, sf_dir, "documents")
    tk = docs.select(
        "doc_id", F.posexplode(tokenize(F.col("text"))).alias("idx", "tok")
    )
    f = tk.withColumn(
        "is_stop", F.when(F.col("tok").isin(*_EN_STOPWORDS), 1).otherwise(0)
    )
    wg = Window.partitionBy("doc_id").orderBy("idx").rowsBetween(
        Window.unboundedPreceding, 0
    )
    g = f.withColumn("grp", F.sum("is_stop").over(wg))
    ph = (
        g.where(F.col("is_stop") == 0)
        .groupBy("doc_id", "grp")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("idx", "tok"))),
                    lambda x: x["tok"],
                ),
                " ",
            ).alias("phrase"),
            F.count("*").alias("plen"),
        )
        .where(F.col("plen") <= _RAKE_MAXLEN)
    )
    pw = ph.select(
        "doc_id", "grp", "phrase", "plen",
        F.explode(F.split(F.col("phrase"), " ")).alias("w"),
    )
    ws = pw.groupBy("w").agg(
        F.expr("CAST(SUM(plen) * 1000000 div COUNT(*) AS BIGINT)").alias("s_q")
    )
    psc = (
        pw.join(F.broadcast(ws), "w")
        .groupBy("doc_id", "grp", "phrase")
        .agg(F.sum("s_q").cast("long").alias("score_micro"))
    )
    agg = psc.groupBy("phrase").agg(
        F.count("*").alias("n_occurrences"),
        F.max("score_micro").cast("long").alias("score_micro"),
    )
    # phrase vocabulary can be large: TakeOrdered the top-k first,
    # rank the bounded prefix (identical under the unique order)
    top = bounded_single_group(
        agg.orderBy(F.col("score_micro").desc(), "phrase").limit(_RAKE_TOPK)
    )
    wr = Window.partitionBy("__opid").orderBy(F.col("score_micro").desc(), "phrase")
    return (
        top.withColumn("rank", F.row_number().over(wr))
        .orderBy("rank")
        .select("phrase", "n_occurrences", "score_micro", "rank")
    )
