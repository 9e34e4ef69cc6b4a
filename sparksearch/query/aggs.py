"""Search aggregations (facets): terms / stats / range over a match set.

OpenSearch pairs every query with optional ``aggs`` that run over the
FULL set of matching documents, not the top-k page (the reference
drives this engine surface through its `_search` bodies —
``keyword_search/functions/helper_functions.py`` builds match queries;
aggregations are the other half of that `_search` API).  Semantics
pinned here (mirrored by the DuckDB twins):

* **match set** — docs whose analyzed token array contains ANY analyzed
  query term (OpenSearch ``match`` with the default ``operator: or``).
  Expressed as ``arrays_overlap`` so Catalyst keeps it inside
  whole-stage codegen; the indexed path derives the same set from the
  packed postings (same analyzer ⇒ identical set, pytest-pinned).
* **terms agg** — bucket per distinct field value, ``doc_count`` desc,
  key asc (OpenSearch tie order), top ``size`` buckets (default 10).
* **stats agg** — one row: count / min / max / avg / sum (avg rounded
  4 dp — the engine's cross-engine float contract).
* **range agg** — one bucket per requested range, ``from`` inclusive,
  ``to`` exclusive (OpenSearch convention), ranges may overlap, empty
  buckets kept with doc_count 0, bucket order = request order
  (``bucket_idx``); key rendered ``"<from>-<to>"`` with ``*`` for an
  open end.

Scale: the match set never leaves the JVM — each agg is one
filter → groupBy/aggregate with map-side partial aggregation; the
terms agg ships at most (n_partitions × distinct keys) rows into the
final exchange, the stats/range aggs a single row per partition.  The
indexed variants prune the postings scan to the query's term buckets
first, so the corpus is touched only for the matched doc ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparksearch.analyze import duckdb_tokens_expr, tokenize_str, tokens_col

AVG_ROUND = 4


def _match_filter(text_col: str, terms: list[str], analyzer: str):
    return F.arrays_overlap(
        tokens_col(text_col, analyzer), F.array(*[F.lit(t) for t in terms])
    )


def match_set(
    docs: DataFrame,
    query_text: str,
    *,
    text_col: str = "text",
    analyzer: str = "ascii",
) -> DataFrame:
    """Rows of ``docs`` matching the query (OR-semantics match query)."""
    terms = sorted(set(tokenize_str(query_text, analyzer)))
    if not terms:
        return docs.filter(F.lit(False))
    return docs.filter(F.col(text_col).isNotNull()).filter(
        _match_filter(text_col, terms, analyzer)
    )


def _match_where_sql(query_text: str, analyzer: str, text_col: str = "text") -> str:
    terms = sorted(set(tokenize_str(query_text, analyzer)))
    if not terms:
        return "FALSE"
    lits = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return (
        f"{text_col} IS NOT NULL AND len(list_intersect("
        f"{duckdb_tokens_expr(text_col, analyzer)}, [{lits}])) > 0"
    )


def terms_agg(
    docs: DataFrame,
    query_text: str,
    field: str,
    size: int = 10,
    *,
    text_col: str = "text",
    analyzer: str = "ascii",
) -> DataFrame:
    """Terms facet → (key string, doc_count long), OpenSearch bucket order."""
    m = match_set(docs, query_text, text_col=text_col, analyzer=analyzer)
    return (
        m.groupBy(F.col(field).cast("string").alias("key"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy(F.desc("doc_count"), F.asc("key"))
        .limit(size)
    )


def terms_agg_sql(
    query_text: str,
    field: str,
    size: int = 10,
    *,
    table: str = "documents",
    analyzer: str = "ascii",
) -> str:
    return f"""
SELECT CAST({field} AS VARCHAR) AS key, count(*) AS doc_count
FROM {table} WHERE {_match_where_sql(query_text, analyzer)}
GROUP BY 1 ORDER BY doc_count DESC, key ASC LIMIT {size}
""".strip()


def stats_agg(
    docs: DataFrame,
    query_text: str,
    field: str,
    *,
    text_col: str = "text",
    analyzer: str = "ascii",
) -> DataFrame:
    """Stats facet → one row (count, min, max, avg, sum) over ``field``."""
    m = match_set(docs, query_text, text_col=text_col, analyzer=analyzer)
    c = F.col(field)
    return m.agg(
        F.count(c).alias("count"),
        F.min(c).cast("double").alias("min"),
        F.max(c).cast("double").alias("max"),
        F.round(F.avg(c), AVG_ROUND).alias("avg"),
        F.sum(c).cast("double").alias("sum"),
    )


def stats_agg_sql(
    query_text: str,
    field: str,
    *,
    table: str = "documents",
    analyzer: str = "ascii",
) -> str:
    return f"""
SELECT count({field}) AS count,
       CAST(min({field}) AS DOUBLE) AS min,
       CAST(max({field}) AS DOUBLE) AS max,
       round(avg({field}), {AVG_ROUND}) AS avg,
       CAST(sum({field}) AS DOUBLE) AS sum
FROM {table} WHERE {_match_where_sql(query_text, analyzer)}
""".strip()


Range = tuple[float | None, float | None]  # (from inclusive, to exclusive)


def _range_key(lo: float | None, hi: float | None) -> str:
    a = "*" if lo is None else f"{lo:g}"
    b = "*" if hi is None else f"{hi:g}"
    return f"{a}-{b}"


def range_agg(
    docs: DataFrame,
    query_text: str,
    field: str,
    ranges: list[Range],
    *,
    text_col: str = "text",
    analyzer: str = "ascii",
) -> DataFrame:
    """Range facet → (bucket_idx, key, doc_count), request bucket order.

    One pass: every bucket is a conditional count inside a single
    aggregate (no per-range scan), then unpivoted driver-side via a
    literal stack — the match set is read once regardless of the number
    of ranges.
    """
    if not ranges:
        raise ValueError("ranges must be non-empty")
    m = match_set(docs, query_text, text_col=text_col, analyzer=analyzer)
    c = F.col(field)
    conds = []
    for lo, hi in ranges:
        cond = c.isNotNull()
        if lo is not None:
            cond = cond & (c >= F.lit(lo))
        if hi is not None:
            cond = cond & (c < F.lit(hi))
        conds.append(cond)
    one = m.agg(
        *[
            F.sum(F.when(cond, 1).otherwise(0)).alias(f"_b{i}")
            for i, cond in enumerate(conds)
        ]
    )
    stack = ", ".join(
        f"{i}, '{_range_key(lo, hi)}', _b{i}"
        for i, (lo, hi) in enumerate(ranges)
    )
    return one.selectExpr(
        f"stack({len(ranges)}, {stack}) AS (bucket_idx, key, doc_count)"
    ).select(
        F.col("bucket_idx").cast("int"),
        "key",
        F.coalesce(F.col("doc_count"), F.lit(0)).cast("long").alias("doc_count"),
    )


def range_agg_sql(
    query_text: str,
    field: str,
    ranges: list[Range],
    *,
    table: str = "documents",
    analyzer: str = "ascii",
) -> str:
    where = _match_where_sql(query_text, analyzer)
    parts = []
    for i, (lo, hi) in enumerate(ranges):
        cond = f"{field} IS NOT NULL"
        if lo is not None:
            cond += f" AND {field} >= {lo}"
        if hi is not None:
            cond += f" AND {field} < {hi}"
        parts.append(
            f"SELECT CAST({i} AS INT) AS bucket_idx,"
            f" '{_range_key(lo, hi)}' AS key,"
            f" CAST(coalesce(sum(CASE WHEN {cond} THEN 1 ELSE 0 END), 0) AS BIGINT)"
            f" AS doc_count FROM {table} WHERE {where}"
        )
    return "\nUNION ALL\n".join(parts)


def terms_stats_agg(
    docs: DataFrame,
    query_text: str,
    bucket_field: str,
    metric_field: str,
    size: int = 10,
    *,
    text_col: str = "text",
    analyzer: str = "ascii",
) -> DataFrame:
    """Terms bucket with a nested stats sub-aggregation (the aggs TREE).

    OpenSearch sub-aggregations run each child inside its parent's
    bucket: ``terms`` on ``bucket_field`` with a ``stats`` child on
    ``metric_field`` → per-bucket count/min/max/avg/sum.  Bucket order
    and ``size`` follow the parent terms agg (doc_count desc, key asc);
    the child never changes parent bucketing (OpenSearch rule).  One
    groupBy computes the parent count and every child metric in a
    single partial-agg exchange — the nested agg costs the same shuffle
    as the flat one.
    """
    m = match_set(docs, query_text, text_col=text_col, analyzer=analyzer)
    c = F.col(metric_field)
    return (
        m.groupBy(F.col(bucket_field).cast("string").alias("key"))
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.min(c).cast("double").alias("min"),
            F.max(c).cast("double").alias("max"),
            F.round(F.avg(c), AVG_ROUND).alias("avg"),
            F.sum(c).cast("double").alias("sum"),
        )
        .orderBy(F.desc("doc_count"), F.asc("key"))
        .limit(size)
    )


def terms_stats_agg_sql(
    query_text: str,
    bucket_field: str,
    metric_field: str,
    size: int = 10,
    *,
    table: str = "documents",
    analyzer: str = "ascii",
) -> str:
    return f"""
SELECT CAST({bucket_field} AS VARCHAR) AS key, count(*) AS doc_count,
       CAST(min({metric_field}) AS DOUBLE) AS min,
       CAST(max({metric_field}) AS DOUBLE) AS max,
       round(avg({metric_field}), {AVG_ROUND}) AS avg,
       CAST(sum({metric_field}) AS DOUBLE) AS sum
FROM {table} WHERE {_match_where_sql(query_text, analyzer)}
GROUP BY 1 ORDER BY doc_count DESC, key ASC LIMIT {size}
""".strip()


DEFAULT_PERCENTS = (25.0, 50.0, 75.0, 95.0, 99.0)


def percentiles_agg(
    docs: DataFrame,
    query_text: str,
    field: str,
    percents: tuple = DEFAULT_PERCENTS,
    *,
    text_col: str = "text",
    analyzer: str = "ascii",
) -> DataFrame:
    """Percentiles facet → (percent, value), request order.

    Pinned to EXACT linear-interpolation percentiles (Spark's
    ``percentile``; DuckDB's ``quantile_cont`` — the same definition,
    so values match bit-for-bit on integer fields; rounded 4 dp like
    every cross-engine float).  OpenSearch's default is the approximate
    TDigest — a documented deviation: its error bounds are
    implementation-defined and cannot be pinned across engines.  Exact
    percentiles are one sort-based aggregate over the match set; at
    100 TB swap in ``percentile_approx`` when a bounded-error sketch is
    acceptable (same API shape, no oracle).
    """
    if not percents:
        raise ValueError("percents must be non-empty")
    m = match_set(docs, query_text, text_col=text_col, analyzer=analyzer)
    one = m.agg(
        *[
            F.round(
                F.expr(f"percentile({field}, {p / 100.0!r})"), AVG_ROUND
            ).alias(f"_p{i}")
            for i, p in enumerate(percents)
        ]
    )
    stack = ", ".join(
        f"CAST({p!r} AS DOUBLE), _p{i}" for i, p in enumerate(percents)
    )
    return one.selectExpr(
        f"stack({len(percents)}, {stack}) AS (percent, value)"
    )


def percentiles_agg_sql(
    query_text: str,
    field: str,
    percents: tuple = DEFAULT_PERCENTS,
    *,
    table: str = "documents",
    analyzer: str = "ascii",
) -> str:
    where = _match_where_sql(query_text, analyzer)
    parts = [
        f"SELECT CAST({p!r} AS DOUBLE) AS percent,"
        f" round(quantile_cont({field}, {p / 100.0!r}), {AVG_ROUND}) AS value"
        f" FROM {table} WHERE {where}"
        for p in percents
    ]
    return "\nUNION ALL\n".join(parts)


# -- indexed variants ----------------------------------------------------
def indexed_match_ids(index, query_text: str) -> DataFrame:
    """Match-set doc ids straight from the packed index (any-term).

    Prunes the postings scan to the query terms' ``term_bucket=``
    directories, decodes only those blocks per segment, and resolves
    ordinals through the sidecar — the corpus itself is never touched.
    Identical to :func:`match_set`'s ids because postings were built by
    the same analyzer (pytest-pinned).
    """
    from sparksearch.query.matchset import match_ids_df

    return match_ids_df(index, query_text, mode="any")


def terms_agg_indexed(
    index, docs: DataFrame, query_text: str, field: str, size: int = 10,
    *, id_col: str = "doc_id",
) -> DataFrame:
    """Terms facet with the match set from the packed index.

    The ids frame is join-reduced against ``docs`` for the facet field;
    at scale this is a shuffle join on ``doc_id`` that AQE converts to
    a broadcast when the match set is small.
    """
    ids = indexed_match_ids(index, query_text)
    m = docs.join(ids, docs[id_col] == ids["doc_id"], "leftsemi")
    return (
        m.groupBy(F.col(field).cast("string").alias("key"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy(F.desc("doc_count"), F.asc("key"))
        .limit(size)
    )
