"""rank_feature and distance_feature — OpenSearch's specialized
relevance-boost queries, natively scored.

The reference's OpenSearch cluster exposes both as first-class query
types (`rank_feature` over positive numeric feature fields such as
pagerank/popularity — the CirrusSearch mapping the reference loads
carries exactly such fields, `popularity_score`/`incoming_links`,
SURVEY §1.2; `distance_feature` for date/numeric proximity boosts).
Both are pure per-document math over one field — no index structure —
so the Spark plan is a projection + TakeOrderedAndProject with the
filter pushed to the parquet scan; at 100 TB the scan reads two
columns (id + field) and nothing else.

Pinned semantics (cross-engine bit-identical):

* ``rank_feature`` matches docs where the field is a POSITIVE number
  (OpenSearch only indexes positive feature values; null/<=0 never
  match).  Score by function:
  - ``saturation``: ``boost · x/(x + pivot)``; when ``pivot`` is
    omitted, the EXACT geometric mean ``exp(avg(ln x))`` of the
    matching values (documented deviation: OpenSearch approximates
    the geometric mean from index stats; the exact mean is the same
    quantity computed precisely and is reproducible on any engine).
  - ``log``: ``boost · ln(scaling_factor + x)``.
  - ``sigmoid``: ``boost · x^exp / (x^exp + pivot^exp)``.
* ``distance_feature``: ``boost · pivot / (pivot + |value − origin|)``
  over non-null values; dates measured in epoch MILLISECONDS (the
  OpenSearch unit), numerics in field units.
* Scores round to 4 dp; ties break doc_id asc.  The common bool form
  (``must: match`` + ``should: rank_feature``) adds the feature score
  to the BM25 raw score BEFORE rounding — `rank_feature_bool_topk`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparksearch.query.bm25 import SCORE_ROUND, bm25_scores_cte, bm25_scores_df

_FNS = ("saturation", "log", "sigmoid")


def _feature_base(
    docs: DataFrame, field: str, id_col: str
) -> DataFrame:
    return docs.filter(
        F.col(field).isNotNull() & (F.col(field) > 0)
    ).select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(field).cast("double").alias("x"),
    )


def _geo_mean_pivot(base: DataFrame) -> float:
    row = base.agg(F.exp(F.avg(F.log(F.col("x")))).alias("p")).collect()[0]
    if row["p"] is None:
        raise ValueError("rank_feature: no positive values to derive pivot")
    return float(row["p"])


def _feature_score(
    x: Column, fn: str, pivot: float | None, boost: float,
    scaling_factor: float, exponent: float,
) -> Column:
    if fn == "saturation":
        return F.lit(boost) * x / (x + F.lit(float(pivot)))
    if fn == "log":
        return F.lit(boost) * F.log(F.lit(float(scaling_factor)) + x)
    num = F.pow(x, F.lit(float(exponent)))
    return F.lit(boost) * num / (num + F.lit(float(pivot) ** float(exponent)))


def rank_feature_topk(
    docs: DataFrame,
    field: str,
    k: int = 10,
    *,
    fn: str = "saturation",
    pivot: float | None = None,
    boost: float = 1.0,
    scaling_factor: float = 1.0,
    exponent: float = 2.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Standalone rank_feature top-k → (doc_id, score)."""
    if fn not in _FNS:
        raise ValueError(f"fn must be one of {_FNS}")
    base = _feature_base(docs, field, id_col)
    if fn != "log" and pivot is None:
        pivot = _geo_mean_pivot(base)
    score = _feature_score(
        F.col("x"), fn, pivot, boost, scaling_factor, exponent
    )
    return (
        base.select("doc_id", F.round(score, SCORE_ROUND).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def _sql_score(xexpr: str, fn: str, pivot, boost, scaling_factor, exponent):
    if fn == "saturation":
        return f"{boost} * {xexpr} / ({xexpr} + {pivot})"
    if fn == "log":
        return f"{boost} * ln({scaling_factor} + {xexpr})"
    p = float(pivot) ** float(exponent)
    return (
        f"{boost} * pow({xexpr}, {exponent}) / "
        f"(pow({xexpr}, {exponent}) + {p!r})"
    )


def rank_feature_sql(
    field: str,
    k: int = 10,
    *,
    fn: str = "saturation",
    pivot: float | None = None,
    boost: float = 1.0,
    scaling_factor: float = 1.0,
    exponent: float = 2.0,
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin; ``pivot=None`` derives the exact geometric mean
    INSIDE the SQL so both engines compute it from the same rows."""
    if fn not in _FNS:
        raise ValueError(f"fn must be one of {_FNS}")
    x = f"CAST({field} AS DOUBLE)"
    base = (
        f"base AS (SELECT {id_col} AS doc_id, {x} AS x FROM {table} "
        f"WHERE {field} IS NOT NULL AND {field} > 0)"
    )
    if fn != "log" and pivot is None:
        base += ",\npv AS (SELECT exp(avg(ln(x))) AS pivot FROM base)"
        score = _sql_score("x", fn, "pv.pivot", boost, scaling_factor, exponent)
        src = "base CROSS JOIN pv"
    else:
        score = _sql_score("x", fn, pivot, boost, scaling_factor, exponent)
        src = "base"
    return (
        f"WITH {base}\n"
        f"SELECT doc_id, round({score}, {SCORE_ROUND}) AS score\n"
        f"FROM {src} ORDER BY round({score}, {SCORE_ROUND}) DESC, doc_id ASC "
        f"LIMIT {k}"
    )


def rank_feature_bool_topk(
    docs: DataFrame,
    query_text: str,
    field: str,
    k: int = 10,
    *,
    pivot: float,
    boost: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    analyzer: str = "ascii",
) -> DataFrame:
    """bool{must: match, should: rank_feature(saturation)} — the
    OpenSearch boosting idiom: feature score ADDS to the BM25 raw sum
    for matching docs (docs without the feature keep their BM25 score;
    the should clause never gates membership)."""
    scored = bm25_scores_df(
        docs, query_text, id_col=id_col, text_col=text_col,
        k1=k1, b=b, analyzer=analyzer,
    )
    feat = _feature_base(docs, field, id_col).select(
        "doc_id",
        (F.lit(boost) * F.col("x") / (F.col("x") + F.lit(float(pivot)))).alias(
            "_fs"
        ),
    )
    return (
        scored.join(feat, "doc_id", "left")
        .select(
            "doc_id",
            F.round(
                F.col("raw") + F.coalesce(F.col("_fs"), F.lit(0.0)),
                SCORE_ROUND,
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def rank_feature_bool_sql(
    query_text: str,
    field: str,
    k: int = 10,
    *,
    pivot: float,
    boost: float = 1.0,
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
    fs = (
        f"{boost} * CAST(t.{field} AS DOUBLE) / "
        f"(CAST(t.{field} AS DOUBLE) + {float(pivot)!r})"
    )
    return f"""
WITH {cte}
SELECT s.doc_id,
       round(s.raw + coalesce(CASE WHEN t.{field} IS NOT NULL
                                    AND t.{field} > 0
                                   THEN {fs} END, 0.0),
             {SCORE_ROUND}) AS score
FROM scored s JOIN {table} t ON s.doc_id = t.{id_col}
ORDER BY score DESC, s.doc_id ASC LIMIT {k}
""".strip()


def distance_feature_topk(
    docs: DataFrame,
    field: str,
    origin,
    pivot: float,
    k: int = 10,
    *,
    boost: float = 1.0,
    date: bool = False,
    id_col: str = "doc_id",
) -> DataFrame:
    """distance_feature top-k → (doc_id, score).

    ``date=True`` treats ``field`` as a timestamp and ``origin`` as an
    ISO timestamp string, distances in epoch milliseconds (``pivot``
    likewise in ms — OpenSearch's unit)."""
    if pivot <= 0:
        raise ValueError("pivot must be positive")
    if date:
        # cast handles TIMESTAMP_NTZ columns; field and origin get the
        # same session-TZ offset, which cancels in the distance
        v = F.unix_millis(F.col(field).cast("timestamp")).cast("double")
        o = F.unix_millis(F.to_timestamp(F.lit(origin))).cast("double")
    else:
        v = F.col(field).cast("double")
        o = F.lit(float(origin))
    dist = F.abs(v - o)
    score = F.lit(boost) * F.lit(float(pivot)) / (F.lit(float(pivot)) + dist)
    return (
        docs.filter(F.col(field).isNotNull())
        .select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.round(score, SCORE_ROUND).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def distance_feature_sql(
    field: str,
    origin,
    pivot: float,
    k: int = 10,
    *,
    boost: float = 1.0,
    date: bool = False,
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    if date:
        v = f"epoch_ms(CAST({field} AS TIMESTAMP))::DOUBLE"
        o = f"epoch_ms(TIMESTAMP '{origin}')::DOUBLE"
    else:
        v = f"CAST({field} AS DOUBLE)"
        o = f"{float(origin)!r}"
    score = f"{boost} * {float(pivot)!r} / ({float(pivot)!r} + abs({v} - {o}))"
    return (
        f"SELECT {id_col} AS doc_id, round({score}, {SCORE_ROUND}) AS score "
        f"FROM {table} WHERE {field} IS NOT NULL "
        f"ORDER BY round({score}, {SCORE_ROUND}) DESC, doc_id ASC LIMIT {k}"
    )
