"""Term suggester ("did you mean"): per-term spelling corrections.

OpenSearch's term suggester proposes vocabulary terms within edit
distance of each query term.  Semantics pinned here (a deterministic
subset of the Lucene ``DirectSpellChecker`` defaults):

* mode ``missing`` (the default): suggestions only for query terms NOT
  in the vocabulary (a present term needs no correction); mode
  ``always`` suggests for every term;
* candidate = vocabulary term with ``levenshtein(candidate, qterm) <=
  AUTO(qterm)`` (0 edits under 3 chars, 1 through 5, else 2 — the same
  AUTO the fuzzy query uses), candidate ≠ qterm;
* order within a query term: distance asc, doc freq desc, term asc
  (Lucene's score-then-frequency tie chain collapsed to its observable
  effect under pure Levenshtein similarity); top ``size`` (default 5);
* output: (qterm, suggestion, distance, df), query terms in analyzed
  order-insensitive sorted order.

Scale shape: the vocabulary frame is vocab-sized, never corpus-sized —
one distinct-explode groupBy (exhaustive) or a lexicon sidecar read
(engine path, :func:`term_suggest_indexed`); the per-qterm top-size is
a window over candidate sets that are tiny by construction (edit-2
neighborhoods).  The query-term list is a literal broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparksearch.analyze import duckdb_tokens_expr, tokenize_str
from sparksearch.index.lexicon import auto_fuzziness

SUGGEST_SCHEMA = "qterm string, suggestion string, distance int, df long"


def _suggest_from_vocab(
    spark, vocab: DataFrame, qterms: list[str], size: int, mode: str
) -> DataFrame:
    """vocab = (term, df) → suggestions for ``qterms``."""
    if mode not in ("missing", "always"):
        raise ValueError(f"mode {mode!r} must be missing|always")
    if not qterms:
        return spark.createDataFrame([], SUGGEST_SCHEMA)
    q = spark.createDataFrame(
        [(t, auto_fuzziness(t)) for t in qterms], "qterm string, max_ed int"
    )
    if mode == "missing":
        q = q.join(
            vocab.select(F.col("term").alias("qterm")), "qterm", "left_anti"
        )
    lev = F.levenshtein(F.col("term"), F.col("qterm"))
    cand = (
        vocab.crossJoin(F.broadcast(q))
        .filter((lev <= F.col("max_ed")) & (F.col("term") != F.col("qterm")))
        .select(
            "qterm",
            F.col("term").alias("suggestion"),
            lev.cast("int").alias("distance"),
            "df",
        )
    )
    w = Window.partitionBy("qterm").orderBy(
        F.asc("distance"), F.desc("df"), F.asc("suggestion")
    )
    return (
        cand.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= size)
        .drop("_r")
        .orderBy("qterm", "distance", F.desc("df"), "suggestion")
    )


def term_suggest(
    docs: DataFrame,
    query_text: str,
    size: int = 5,
    *,
    mode: str = "missing",
    text_col: str = "text",
    analyzer: str = "ascii",
) -> DataFrame:
    """Exhaustive path: vocabulary + df derived from the corpus."""
    from sparksearch.analyze import tokens_col

    qterms = sorted(set(tokenize_str(query_text, analyzer)))
    vocab = (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            F.explode(F.array_distinct(tokens_col(text_col, analyzer))).alias(
                "term"
            )
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    return _suggest_from_vocab(docs.sparkSession, vocab, qterms, size, mode)


def term_suggest_indexed(
    index,
    query_text: str,
    size: int = 5,
    *,
    mode: str = "missing",
) -> DataFrame:
    """Engine path: vocabulary + df from the lexicon sidecar (no corpus
    read; requires :func:`sparksearch.index.lexicon.build_lexicon`)."""
    from sparksearch.index.lexicon import read_lexicon

    qterms = sorted(set(index._tokenize(query_text)))
    vocab = read_lexicon(index.spark, index.index_dir).select("term", "df")
    return _suggest_from_vocab(index.spark, vocab, qterms, size, mode)


def term_suggest_sql(
    query_text: str,
    size: int = 5,
    *,
    mode: str = "missing",
    table: str = "documents",
    text_col: str = "text",
    analyzer: str = "ascii",
) -> str:
    """DuckDB twin of :func:`term_suggest` (same AUTO, same tie chain)."""
    qterms = sorted(set(tokenize_str(query_text, analyzer)))
    if not qterms:
        return (
            "SELECT CAST(NULL AS VARCHAR) AS qterm, CAST(NULL AS VARCHAR) AS "
            "suggestion, CAST(NULL AS INT) AS distance, CAST(NULL AS BIGINT) "
            "AS df WHERE FALSE"
        )
    toks = duckdb_tokens_expr(text_col, analyzer)
    qrows = ", ".join(
        f"('{t.replace(chr(39), chr(39) * 2)}', {auto_fuzziness(t)})"
        for t in qterms
    )
    missing = (
        "WHERE qterm NOT IN (SELECT term FROM vocab)" if mode == "missing" else ""
    )
    return f"""
WITH base AS (
  SELECT list_distinct({toks}) AS ts FROM {table}
  WHERE {text_col} IS NOT NULL
),
vocab AS (
  SELECT u.t AS term, count(*) AS df FROM base, unnest(ts) AS u(t) GROUP BY 1
),
q(qterm, max_ed) AS (VALUES {qrows}),
qq AS (SELECT * FROM q {missing}),
cand AS (
  SELECT qterm, term AS suggestion,
         CAST(levenshtein(term, qterm) AS INT) AS distance, df
  FROM vocab, qq
  WHERE levenshtein(term, qterm) <= max_ed AND term <> qterm
)
SELECT qterm, suggestion, distance, df FROM cand
QUALIFY row_number() OVER (
  PARTITION BY qterm ORDER BY distance ASC, df DESC, suggestion ASC
) <= {size}
ORDER BY qterm, distance, df DESC, suggestion
""".strip()
