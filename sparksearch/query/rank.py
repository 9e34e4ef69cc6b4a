"""Field collapsing and function_score — post-scoring rank shapers.

Two OpenSearch hit-shaping features that reorder/regroup the FULL
scored match set (a top-k page cannot feed them: collapsing can
promote a group whose leader sits below the page boundary, and a
function boost can promote a low-BM25 hit):

**collapse** — one hit per distinct value of a field (web search's
one-result-per-site).  Pinned: leader of a group = its highest hit by
(rounded score desc, doc_id asc); page = top ``k`` leaders in the same
order; null field values form their own group (OpenSearch puts
missing-field docs in one null group).  Output (doc_id, key, score).

**function_score / field_value_factor** — score reshaped by a document
field (popularity/recency boosting).  Pinned subset: ``boost_mode:
multiply`` with ``field_value_factor`` and the ``ln1p`` modifier::

    score'(d) = round(bm25_raw(d) · ln(1 + coalesce(field, missing)), 4)

``missing`` defaults to 0 (factor 0 — unboosted docs sink, OpenSearch's
own default for a missing field value is to error unless ``missing``
is set; pinning 0 keeps the contract total).  Output (doc_id, score),
ordered (score desc, doc_id asc).

Scale shape: both reuse :func:`bm25_scores_df` (one shared scoring
plan); collapse adds ONE hash-partition window shuffle on the collapse
field (row_number over groups — never a global sort) followed by
TakeOrderedAndProject; function_score adds a doc_id join against a
2-column field projection and keeps TakeOrderedAndProject.  The DuckDB
twins reuse ``bm25_scores_cte`` so engine and oracle share one scoring
text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparksearch.query.bm25 import SCORE_ROUND, bm25_scores_cte, bm25_scores_df


def collapse_topk(
    docs: DataFrame,
    query_text: str,
    collapse_field: str,
    k: int = 10,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    analyzer: str = "ascii",
) -> DataFrame:
    """One best hit per ``collapse_field`` value → (doc_id, key, score)."""
    scored = bm25_scores_df(
        docs, query_text, id_col=id_col, text_col=text_col,
        k1=k1, b=b, analyzer=analyzer,
    ).select("doc_id", F.round("raw", SCORE_ROUND).alias("score"))
    fields = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(collapse_field).cast("string").alias("key"),
    )
    hits = scored.join(fields, "doc_id")
    w = Window.partitionBy("key").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        hits.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .drop("_r")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", "key", "score")
    )


def collapse_topk_sql(
    query_text: str,
    collapse_field: str,
    k: int = 10,
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    analyzer: str = "ascii",
) -> str:
    cte = bm25_scores_cte(
        query_text, table=table, id_col=id_col, text_col=text_col,
        k1=k1, b=b, analyzer=analyzer,
    )
    return f"""
WITH {cte},
hits AS (
  SELECT s.doc_id, CAST(t.{collapse_field} AS VARCHAR) AS key,
         round(s.raw, {SCORE_ROUND}) AS score
  FROM scored s JOIN {table} t ON s.doc_id = t.{id_col}
)
SELECT doc_id, key, score FROM hits
QUALIFY row_number() OVER (
  PARTITION BY key ORDER BY score DESC, doc_id ASC
) = 1
ORDER BY score DESC, doc_id ASC LIMIT {k}
""".strip()


def function_score_topk(
    docs: DataFrame,
    query_text: str,
    factor_field: str,
    k: int = 10,
    *,
    missing: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    analyzer: str = "ascii",
) -> DataFrame:
    """BM25 × ln1p(field) boost → (doc_id, score) top-k."""
    scored = bm25_scores_df(
        docs, query_text, id_col=id_col, text_col=text_col,
        k1=k1, b=b, analyzer=analyzer,
    )
    fields = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.coalesce(F.col(factor_field).cast("double"), F.lit(missing)).alias(
            "_fv"
        ),
    )
    boosted = scored.join(fields, "doc_id").select(
        "doc_id",
        # ln(1 + x), not log1p: the twin's formula text verbatim, so both
        # engines evaluate the identical float expression
        F.round(
            F.col("raw") * F.log(F.lit(1.0) + F.col("_fv")), SCORE_ROUND
        ).alias("score"),
    )
    return boosted.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def function_score_topk_sql(
    query_text: str,
    factor_field: str,
    k: int = 10,
    *,
    missing: float = 0.0,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    analyzer: str = "ascii",
) -> str:
    cte = bm25_scores_cte(
        query_text, table=table, id_col=id_col, text_col=text_col,
        k1=k1, b=b, analyzer=analyzer,
    )
    return f"""
WITH {cte}
SELECT s.doc_id,
       round(s.raw * ln(1.0 + coalesce(CAST(t.{factor_field} AS DOUBLE),
                                       {missing})),
             {SCORE_ROUND}) AS score
FROM scored s JOIN {table} t ON s.doc_id = t.{id_col}
ORDER BY score DESC, s.doc_id ASC LIMIT {k}
""".strip()
