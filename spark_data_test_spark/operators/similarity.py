"""Embedding similarity search over ``embeddings`` (north-star).

Brute-force cosine top-k (the correctness baseline) and an IVF-style
ANN (the scale path: assign vectors to centroid cells, probe only the
nearest cells per query).

Determinism across engines: embeddings are quantized per-element to
integer micro-units (``round(x * 1e6) -> bigint``), so dot products and
norms are **exact integer sums** (order-independent); the only floats
are final ``dot / (sqrt(n2_q) * sqrt(n2_c))`` expressions evaluated with
the identical op tree in Spark and DuckDB — bit-identical results, fully
tie-broken ranks.

Everything is JVM-side higher-order array functions (``transform``,
``zip_with``, ``aggregate``) — no Python in the loop. At 100 TB the
brute-force variant is a broadcast-join scan (queries broadcast, one
pass over the corpus, per-partition top-k via window); IVF cuts the
scanned fraction to nprobe/ncells with the same plan shape.
"""

import pyspark.sql.functions as F
from pyspark.sql import Window

from spark_data_test_spark.operators.relational import query, t

_DIM = 64
_NQ = 8  # query vectors: vec_id < 8
_TOPK = 5
_NPROBE = 2
_IVF_TOPK = 3

_INT_EMB = (
    "transform(embedding, x -> cast(round(cast(x as double) * 1000000) as bigint))"
)
_NORM2 = "aggregate(e, cast(0 as bigint), (acc, x) -> acc + x * x)"
_DOT = "aggregate(zip_with(qe, ce, (x, y) -> x * y), cast(0 as bigint), (acc, x) -> acc + x)"

# Shared DuckDB machinery: quantize, flatten, norms, exact integer dots.
_ORACLE_BASE = f"""
ei AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000000) AS BIGINT)) AS e
  FROM embeddings),
flat AS (
  SELECT vec_id, i, e[i] AS v
  FROM ei, unnest(generate_series(1, {_DIM})) AS u(i)),
norms AS (SELECT vec_id, SUM(v * v) AS n2 FROM flat GROUP BY vec_id)
"""


def _int_embeddings(spark, sf_dir):
    return t(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr(_INT_EMB).alias("e")
    ).withColumn("n2", F.expr(_NORM2))


def _cosine(dot_col, qn2, cn2):
    return dot_col.cast("double") / (
        F.sqrt(qn2.cast("double")) * F.sqrt(cn2.cast("double"))
    )


def _scored_pairs(queries_df, candidates_df):
    """Broadcast the (small) query set against every candidate row and
    score with exact integer dot products."""
    q = queries_df.select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("n2").alias("qn2"),
    )
    c = candidates_df.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("e").alias("ce"),
        F.col("n2").alias("cn2"),
    )
    pairs = c.crossJoin(F.broadcast(q)).where(
        F.col("neighbor_id") != F.col("query_id")
    )
    return pairs.withColumn("dot", F.expr(_DOT)).withColumn(
        "cos", _cosine(F.col("dot"), F.col("qn2"), F.col("cn2"))
    )


@query(
    "similarity_cosine_topk",
    f"""
    WITH {_ORACLE_BASE.strip()},
    dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, SUM(q.v * c.v) AS dot
      FROM flat q JOIN flat c ON q.i = c.i
      WHERE q.vec_id < {_NQ} AND c.vec_id <> q.vec_id
      GROUP BY 1, 2),
    scored AS (
      SELECT query_id, neighbor_id,
             CAST(dot AS DOUBLE) /
               (sqrt(CAST(qn.n2 AS DOUBLE)) * sqrt(CAST(cn.n2 AS DOUBLE))) AS cos
      FROM dots
      JOIN norms qn ON qn.vec_id = query_id
      JOIN norms cn ON cn.vec_id = neighbor_id),
    ranked AS (
      SELECT query_id, neighbor_id, cos,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, rank,
           CAST(ROUND(cos * 1000000) AS BIGINT) AS score_1e6
    FROM ranked WHERE rank <= {_TOPK}
    """,
)
def similarity_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k: query set broadcast, one scan of the
    corpus, per-query window top-k."""
    emb = _int_embeddings(spark, sf_dir)
    scored = _scored_pairs(emb.where(F.col("vec_id") < _NQ), emb)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), "neighbor_id"
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _TOPK)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round(F.col("cos") * 1000000).cast("long").alias("score_1e6"),
        )
    )


@query(
    "similarity_ivf_ann",
    f"""
    WITH {_ORACLE_BASE.strip()},
    cent AS (SELECT vec_id AS cent_id, i, v FROM flat WHERE vec_id < {_NQ}),
    cdots AS (
      SELECT f.vec_id, c.cent_id, SUM(f.v * c.v) AS dot
      FROM flat f JOIN cent c ON f.i = c.i
      GROUP BY 1, 2),
    cscored AS (
      SELECT cdots.vec_id AS vec_id, cdots.cent_id AS cent_id,
             CAST(dot AS DOUBLE) /
               (sqrt(CAST(vn.n2 AS DOUBLE)) * sqrt(CAST(cn.n2 AS DOUBLE))) AS cos
      FROM cdots
      JOIN norms vn ON vn.vec_id = cdots.vec_id
      JOIN norms cn ON cn.vec_id = cdots.cent_id),
    assign AS (
      SELECT vec_id, cent_id AS cell
      FROM (SELECT vec_id, cent_id,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY cos DESC, cent_id) AS rn
            FROM cscored)
      WHERE rn = 1),
    probes AS (
      SELECT vec_id AS query_id, cent_id AS cell
      FROM (SELECT vec_id, cent_id,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY cos DESC, cent_id) AS rn
            FROM cscored
            WHERE vec_id >= {_NQ} AND vec_id < {2 * _NQ})
      WHERE rn <= {_NPROBE}),
    cand AS (
      SELECT p.query_id, a.vec_id AS neighbor_id
      FROM probes p JOIN assign a ON a.cell = p.cell
      WHERE a.vec_id <> p.query_id),
    dots AS (
      SELECT cand.query_id, cand.neighbor_id, SUM(q.v * c.v) AS dot
      FROM cand
      JOIN flat q ON q.vec_id = cand.query_id
      JOIN flat c ON c.vec_id = cand.neighbor_id AND c.i = q.i
      GROUP BY 1, 2),
    scored AS (
      SELECT dots.query_id, dots.neighbor_id,
             CAST(dot AS DOUBLE) /
               (sqrt(CAST(qn.n2 AS DOUBLE)) * sqrt(CAST(cn.n2 AS DOUBLE))) AS cos
      FROM dots
      JOIN norms qn ON qn.vec_id = dots.query_id
      JOIN norms cn ON cn.vec_id = dots.neighbor_id)
    SELECT query_id, neighbor_id, rank
    FROM (SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, neighbor_id) AS rank
          FROM scored)
    WHERE rank <= {_IVF_TOPK}
    """,
)
def similarity_ivf_ann(spark, sf_dir):
    """IVF-style ANN: centroids = first {nq} vectors; every vector is
    assigned to its nearest centroid cell; each query (vec_id in
    [nq, 2*nq)) probes its nprobe nearest cells and ranks only those
    candidates — the scanned fraction drops to ~nprobe/ncells."""
    emb = _int_embeddings(spark, sf_dir)
    centroids = emb.where(F.col("vec_id") < _NQ)

    # score every vector against every centroid (centroids broadcast)
    all_scored = _scored_pairs(centroids, emb).select(
        F.col("neighbor_id").alias("vec_id"),
        F.col("query_id").alias("cent_id"),
        "cos",
    )
    # note: _scored_pairs excludes self-pairs; centroids belong to their
    # own cell by definition, so re-add them with cos=1 (exact max).
    self_rows = centroids.select(
        "vec_id", F.col("vec_id").alias("cent_id"), F.lit(1.0).alias("cos")
    )
    cscored = all_scored.unionByName(self_rows)

    w_assign = Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), "cent_id")
    assign = (
        cscored.withColumn("rn", F.row_number().over(w_assign))
        .where(F.col("rn") == 1)
        .select("vec_id", F.col("cent_id").alias("cell"))
    )
    probes = (
        cscored.where((F.col("vec_id") >= _NQ) & (F.col("vec_id") < 2 * _NQ))
        .withColumn("rn", F.row_number().over(w_assign))
        .where(F.col("rn") <= _NPROBE)
        .select(F.col("vec_id").alias("query_id"), F.col("cent_id").alias("cell"))
    )
    cand = probes.join(assign, "cell").where(
        F.col("vec_id") != F.col("query_id")
    ).select("query_id", F.col("vec_id").alias("neighbor_id"))

    qe = emb.select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("n2").alias("qn2"),
    )
    ce = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("e").alias("ce"),
        F.col("n2").alias("cn2"),
    )
    scored = (
        cand.join(F.broadcast(qe), "query_id")
        .join(ce, "neighbor_id")
        .withColumn("dot", F.expr(_DOT))
        .withColumn("cos", _cosine(F.col("dot"), F.col("qn2"), F.col("cn2")))
    )
    w_rank = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .where(F.col("rank") <= _IVF_TOPK)
        .select("query_id", "neighbor_id", "rank")
    )
