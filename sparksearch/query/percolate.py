"""``percolate`` query — match stored queries against documents.

OpenSearch's percolator inverts retrieval: queries are INDEXED
(a ``percolator`` field type) and a document is the request; the
response is the set of stored queries the document matches.  The
reference's alerting-style use of `_search` bodies is the forward
direction of the same surface (`keyword_search/functions/
helper_functions.py` builds those bodies); this module implements the
inverse direction Spark-first.

Pinned stored-query subset: ``(query_id, query_text, operator)`` where
``operator ∈ {or, and}`` — the match query's two operators (the
percolator's overwhelmingly common registration; compound stored
queries decompose into rows of this shape).  A document matches a
stored query iff its analyzed token set contains ANY (or) / ALL (and)
of the query's analyzed terms; empty-analysis queries match nothing
(the match query's own pin).

Scale shape — the classic inverted percolation plan, one shuffle:

    docs → explode DISTINCT tokens           (corpus-sized, map-local)
    query terms (tiny)  → broadcast join on term
    groupBy (doc_id, query_id) count matched (map-side partial agg)
    HAVING n_matched ≥ 1 (or) / = n_terms (and)

No doc×query cross join ever materializes: a document only meets the
queries whose terms it shares, exactly like Lucene's percolator
pre-selecting candidate queries through its term index.  At 100 TB the
query side stays broadcast (thousands of registrations ≪ executor
memory) and the document side streams through one exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparksearch.analyze import duckdb_tokens_expr, tokenize_str, tokens_col


def _query_terms(
    queries: list[tuple], analyzer: str
) -> list[tuple]:
    """(query_id, query_text, operator) → [(query_id, term, n_terms,
    operator)] with per-query analyzed DISTINCT terms."""
    rows = []
    for qid, qtext, op in queries:
        if op not in ("or", "and"):
            raise ValueError(f"operator {op!r} must be or|and")
        terms = sorted(set(tokenize_str(qtext, analyzer)))
        for t in terms:
            rows.append((int(qid), t, len(terms), op))
    return rows


def percolate(
    docs: DataFrame,
    queries: list[tuple],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: str = "ascii",
) -> DataFrame:
    """Percolate ``docs`` against stored ``queries`` [(query_id,
    query_text, operator)] → (doc_id, query_id) matches, both asc."""
    spark = docs.sparkSession
    rows = _query_terms(queries, analyzer)
    if not rows:
        return spark.createDataFrame([], "doc_id long, query_id long")
    qt = spark.createDataFrame(
        rows, "query_id long, term string, n_terms int, operator string"
    )
    flat = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array_distinct(tokens_col(text_col, analyzer))
        ).alias("term"),
    )
    matched = (
        flat.join(F.broadcast(qt), "term")
        .groupBy("doc_id", "query_id")
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.first("n_terms").alias("n_terms"),
            F.first("operator").alias("operator"),
        )
    )
    hit = (F.col("operator") == "or") | (
        F.col("n_matched") == F.col("n_terms")
    )
    return (
        matched.filter(hit)
        .select("doc_id", "query_id")
        .orderBy("doc_id", "query_id")
    )


def percolate_sql(
    queries: list[tuple],
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: str = "ascii",
) -> str:
    """DuckDB twin of :func:`percolate`."""
    rows = _query_terms(queries, analyzer)
    if not rows:
        return (
            "SELECT CAST(NULL AS BIGINT) AS doc_id, "
            "CAST(NULL AS BIGINT) AS query_id WHERE FALSE"
        )
    vals = ", ".join(
        f"({qid}, '{t.replace(chr(39), chr(39) * 2)}', {n}, '{op}')"
        for qid, t, n, op in rows
    )
    toks = duckdb_tokens_expr(text_col, analyzer)
    return f"""
WITH qt(query_id, term, n_terms, operator) AS (VALUES {vals}),
flat AS (
  SELECT {id_col} AS doc_id, u.t AS term
  FROM (
    SELECT {id_col}, list_distinct({toks}) AS ts FROM {table}
    WHERE {text_col} IS NOT NULL
  ), unnest(ts) AS u(t)
),
matched AS (
  SELECT doc_id, query_id, count(*) AS n_matched,
         any_value(n_terms) AS n_terms, any_value(operator) AS operator
  FROM flat JOIN qt USING (term)
  GROUP BY doc_id, query_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(query_id AS BIGINT) AS query_id
FROM matched
WHERE operator = 'or' OR n_matched = n_terms
ORDER BY doc_id, query_id
""".strip()


def percolate_indexed(index, queries: list[tuple]) -> DataFrame:
    """Engine path: percolate from the PACKED POSTINGS alone — no
    corpus read.  Every stored-query term prunes to its term bucket;
    the per-(doc, query) match count comes from the pruned postings'
    (term_id, doc_id) pairs, so cost is Σ df(term) over registered
    terms, not corpus size."""
    spark = index.spark
    analyzer = index.meta.get("analyzer", "ascii")
    rows = _query_terms(queries, analyzer)
    if not rows:
        return spark.createDataFrame([], "doc_id long, query_id long")
    terms = sorted({t for _, t, _, _ in rows})
    by_term = index._term_ids_for(terms)
    qt_rows = [
        (qid, by_term[t], n, op)
        for qid, t, n, op in rows
        if t in by_term
    ]
    # AND queries with an OOV term can never fully match; OR queries
    # just lose the missing term's contribution
    if not qt_rows:
        return spark.createDataFrame([], "doc_id long, query_id long")
    qt = spark.createDataFrame(
        qt_rows, "query_id long, term_id long, n_terms int, operator string"
    )
    from sparksearch.query.matchset import term_doc_pairs_for_ids

    pairs = term_doc_pairs_for_ids(
        index, sorted({tid for _, tid, _, _ in qt_rows})
    )
    matched = (
        pairs.join(F.broadcast(qt), "term_id")
        .groupBy("doc_id", "query_id")
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.first("n_terms").alias("n_terms"),
            F.first("operator").alias("operator"),
        )
    )
    hit = (F.col("operator") == "or") | (
        F.col("n_matched") == F.col("n_terms")
    )
    return (
        matched.filter(hit)
        .select("doc_id", "query_id")
        .orderBy("doc_id", "query_id")
    )
