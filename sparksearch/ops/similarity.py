"""Similarity search over an embedding column (array<float>).

Counterpart of the reference's kNN/neural retrieval (SURVEY §2.6 Q5: the
reference delegates HNSW kNN to OpenSearch,
``semantic_search/functions/opensearch_loader.py:55-67``; query at
``test_semantic_search.py:29-44``).  Two engines:

* **Brute-force cosine top-k** — the exact baseline.  Pure JVM:
  ``zip_with`` products + ``aggregate`` sum, TakeOrderedAndProject for
  the global top-k.  One scan, no shuffle beyond the k-row merge; the
  query vector rides along as a broadcast (one-row cross join).
* **IVF probe top-k** — the scale path.  Coarse centroids (here: per
  ``label`` mean vectors — at production scale a k-means table), probe
  the ``nprobe`` nearest centroids, exact search only within probed
  cells.  The centroid table is tiny and broadcast; the cell restriction
  becomes a partition-prunable filter when the table is written
  partitioned by cell id.

Both have DuckDB SQL twins for the driver's value-hash gate.  Scores are
float64 end-to-end and rounded to 4 decimals on output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ROUND = 4


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of ``query_vec_id``'s vector vs all other rows.

    Output: (vec_id, cos) rounded, ordered by raw cosine desc / vec_id asc.
    """
    q = (
        emb.filter(F.col(id_col) == query_vec_id)
        .select(F.col(vec_col).alias("qv"))
    )
    scored = (
        emb.filter(F.col(vec_col).isNotNull() & (F.col(id_col) != query_vec_id))
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col).alias("vec_id"),
            (
                _dot(F.col(vec_col), F.col("qv"))
                / (_norm(F.col(vec_col)) * _norm(F.col("qv")))
            ).alias("raw"),
        )
    )
    return (
        scored.orderBy(F.desc("raw"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", F.round("raw", ROUND).alias("cos"))
    )


def cosine_topk_sql(
    query_vec_id: int,
    k: int = 10,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    return f"""
WITH q AS (
  SELECT {vec_col}::DOUBLE[] AS qv FROM {table} WHERE {id_col} = {query_vec_id}
),
scored AS (
  SELECT e.{id_col} AS vec_id,
         list_dot_product(e.{vec_col}::DOUBLE[], q.qv)
           / (sqrt(list_dot_product(e.{vec_col}::DOUBLE[], e.{vec_col}::DOUBLE[]))
              * sqrt(list_dot_product(q.qv, q.qv))) AS raw
  FROM {table} e CROSS JOIN q
  WHERE e.{vec_col} IS NOT NULL AND e.{id_col} <> {query_vec_id}
)
SELECT vec_id, round(raw, {ROUND}) AS cos
FROM scored ORDER BY raw DESC, vec_id ASC LIMIT {k}
""".strip()


def centroids_by_label(emb: DataFrame, id_col: str = "vec_id",
                       vec_col: str = "embedding", label_col: str = "label") -> DataFrame:
    """Per-label mean vector — the IVF coarse quantizer's cell table.

    posexplode → groupBy(label, pos) avg → re-assemble sorted by pos.
    At production scale this is a k-means output; the per-label mean here
    keeps the op deterministic and SQL-twinned.
    """
    flat = emb.filter(F.col(vec_col).isNotNull()).select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("pos", "v"),
    )
    per_dim = flat.groupBy("label", "pos").agg(
        F.avg(F.col("v").cast("double")).alias("m")
    )
    return (
        per_dim.groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
            ).alias("centroid")
        )
    )


def ivf_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """IVF-style ANN: probe the ``nprobe`` labels whose centroid is most
    cosine-similar to the query, then exact cosine top-k within them.

    Output: (vec_id, label, cos).  Deterministic probe tie-break: centroid
    cosine desc, label asc.
    """
    cents = centroids_by_label(emb, id_col, vec_col, label_col)
    q = emb.filter(F.col(id_col) == query_vec_id).select(F.col(vec_col).alias("qv"))
    probe = (
        cents.crossJoin(F.broadcast(q))
        .select(
            "label",
            (
                _dot(F.col("centroid"), F.col("qv"))
                / (_norm(F.col("centroid")) * _norm(F.col("qv")))
            ).alias("craw"),
        )
        .orderBy(F.desc("craw"), F.asc("label"))
        .limit(nprobe)
        .select("label")
    )
    scored = (
        emb.filter(F.col(vec_col).isNotNull() & (F.col(id_col) != query_vec_id))
        .join(F.broadcast(probe), "label")
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col).alias("vec_id"),
            F.col(label_col).cast("long").alias("label"),
            (
                _dot(F.col(vec_col), F.col("qv"))
                / (_norm(F.col(vec_col)) * _norm(F.col("qv")))
            ).alias("raw"),
        )
    )
    return (
        scored.orderBy(F.desc("raw"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", "label", F.round("raw", ROUND).alias("cos"))
    )


def ivf_topk_sql(
    query_vec_id: int,
    k: int = 10,
    nprobe: int = 2,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> str:
    return f"""
WITH q AS (
  SELECT {vec_col}::DOUBLE[] AS qv FROM {table} WHERE {id_col} = {query_vec_id}
),
flat AS (
  SELECT {label_col} AS label, generate_subscripts({vec_col}, 1) AS pos,
         unnest({vec_col}::DOUBLE[]) AS v
  FROM {table} WHERE {vec_col} IS NOT NULL
),
per_dim AS (SELECT label, pos, avg(v) AS m FROM flat GROUP BY 1, 2),
cents AS (
  SELECT label, list(m ORDER BY pos) AS centroid FROM per_dim GROUP BY label
),
probe AS (
  SELECT c.label
  FROM cents c CROSS JOIN q
  ORDER BY list_dot_product(c.centroid, q.qv)
             / (sqrt(list_dot_product(c.centroid, c.centroid)) * sqrt(list_dot_product(q.qv, q.qv))) DESC,
           c.label ASC
  LIMIT {nprobe}
),
scored AS (
  SELECT e.{id_col} AS vec_id, e.{label_col}::BIGINT AS label,
         list_dot_product(e.{vec_col}::DOUBLE[], q.qv)
           / (sqrt(list_dot_product(e.{vec_col}::DOUBLE[], e.{vec_col}::DOUBLE[]))
              * sqrt(list_dot_product(q.qv, q.qv))) AS raw
  FROM {table} e JOIN probe p ON e.{label_col} = p.label CROSS JOIN q
  WHERE e.{vec_col} IS NOT NULL AND e.{id_col} <> {query_vec_id}
)
SELECT vec_id, label, round(raw, {ROUND}) AS cos
FROM scored ORDER BY raw DESC, vec_id ASC LIMIT {k}
""".strip()
