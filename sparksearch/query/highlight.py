"""Hit highlighting: a matched-term snippet per top-k BM25 hit.

OpenSearch attaches a ``highlight`` block to each hit: fragments of the
source text with matched terms wrapped in ``<em>…</em>``.  Its unified
highlighter works on original-text character offsets; this engine's
analyzer is destructive (lowercase, punctuation stripped), so offsets
do not survive a cross-engine contract.  Pinned semantics — a
TOKEN-STREAM highlighter, deterministic in both engines:

* hits     = the standard BM25 top-k (same scores/tiebreaks as the
  match query);
* fragment = the window of ``window`` tokens each side of the FIRST
  query-term occurrence in the doc's analyzed token stream (≤ 2w+1
  tokens), joined by single spaces;
* every query-term token inside the fragment is wrapped ``<em>t</em>``
  (all occurrences, not just the anchor — Lucene wraps all);
* output   = (doc_id, score, snippet); SELECTION is exactly the bm25
  top-k, display order is (rounded score desc, doc_id asc) — the
  engine's cross-engine-deterministic tie rule (same as hybrid
  fusion), which inside a rounded tie can differ from
  ``bm25_topk_df``'s raw-score order.

Documented deviation from the reference's OpenSearch behavior: the
snippet is built from analyzed tokens, not raw text — "Data, STREAM;"
highlights as "<em>data</em> <em>stream</em>".  The anchor choice
(first occurrence) is also pinned; Lucene's fragment scorer prefers
denser fragments.

Scale shape: scoring is the normal BM25 plan; the snippet expression
(array_position / slice / transform / array_join — all whole-stage
codegen) is computed ONLY for the k winning docs via a broadcast
semi-join of the top-k ids back onto the corpus, so highlighting never
re-tokenizes more than k documents no matter the corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparksearch.analyze import duckdb_tokens_expr, tokenize_str, tokens_col
from sparksearch.query.bm25 import bm25_topk_df, bm25_topk_sql


def _first_pos(toks: Column, terms: list[str]) -> Column:
    """1-based index of the first query-term occurrence (null if none).

    ``array_position`` returns 0 for "not found" in BOTH engines
    (Spark and DuckDB) — NULLIF(…, 0) turns that into an ignorable
    null so LEAST picks the earliest real hit.
    """
    hits = [
        F.nullif(F.array_position(toks, F.lit(t)), F.lit(0)) for t in terms
    ]
    return hits[0] if len(hits) == 1 else F.least(*hits)


def _snippet_col(toks: Column, terms: list[str], window: int) -> Column:
    pos = _first_pos(toks, terms)
    start = F.greatest(F.lit(1), pos - window)
    frag = F.slice(toks, start, pos + window - start + 1)
    lits = F.array(*[F.lit(t) for t in terms])
    wrapped = F.transform(
        frag,
        lambda t: F.when(
            F.array_contains(lits, t), F.concat(F.lit("<em>"), t, F.lit("</em>"))
        ).otherwise(t),
    )
    return F.array_join(wrapped, " ")


def highlight_topk(
    docs: DataFrame,
    query_text: str,
    k: int = 10,
    *,
    window: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    analyzer: str = "ascii",
) -> DataFrame:
    """BM25 top-k with a snippet per hit → (doc_id, score, snippet)."""
    terms = sorted(set(tokenize_str(query_text, analyzer)))
    if not terms:
        return docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.lit(0.0).alias("score"),
            F.lit("").alias("snippet"),
        ).filter(F.lit(False))
    hits = bm25_topk_df(
        docs, query_text, k, id_col=id_col, text_col=text_col,
        k1=k1, b=b, analyzer=analyzer,
    )
    src = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        tokens_col(text_col, analyzer).alias("toks"),
    )
    # k-row side broadcast: snippets are computed for winners only
    return (
        F.broadcast(hits)
        .join(src, "doc_id")
        .select(
            "doc_id",
            "score",
            _snippet_col(F.col("toks"), terms, window).alias("snippet"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )


def highlight_topk_sql(
    query_text: str,
    k: int = 10,
    *,
    window: int = 3,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    analyzer: str = "ascii",
) -> str:
    """DuckDB twin of :func:`highlight_topk` (same tokens, same window)."""
    terms = sorted(set(tokenize_str(query_text, analyzer)))
    toks = duckdb_tokens_expr(text_col, analyzer)
    inner = bm25_topk_sql(
        query_text, k, table=table, id_col=id_col, text_col=text_col,
        k1=k1, b=b, analyzer=analyzer,
    )
    pos = "least(" + ", ".join(
        "NULLIF(list_position(tl, '" + t.replace("'", "''") + "'), 0)"
        for t in terms
    ) + ")" if len(terms) > 1 else (
        "NULLIF(list_position(tl, '" + terms[0].replace("'", "''") + "'), 0)"
    )
    lits = "[" + ", ".join("'" + t.replace("'", "''") + "'" for t in terms) + "]"
    return f"""
WITH hits AS ({inner}),
src AS (
  SELECT {id_col} AS doc_id, {toks} AS tl FROM {table}
  WHERE {text_col} IS NOT NULL
),
pos AS (
  SELECT h.doc_id, h.score, s.tl, {pos} AS p
  FROM hits h JOIN src s USING (doc_id)
)
SELECT doc_id, score,
       array_to_string(
         list_transform(
           tl[greatest(1, p - {window}) : p + {window}],
           t -> CASE WHEN list_contains({lits}, t)
                     THEN '<em>' || t || '</em>' ELSE t END),
         ' ') AS snippet
FROM pos ORDER BY score DESC, doc_id ASC
""".strip()
