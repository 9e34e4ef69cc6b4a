"""Text analysis operators: token counts, quality scores, language ID,
document fingerprints, corpus statistics.

Capability superset of the reference's ad-hoc corpus analytics (record /
batch / chunk counters, ``semantic_search/functions/wikipedia_extractor.py:121-136``;
notebook token-count exploration `notebooks/01` §3) re-expressed as
declarative aggregations.  Everything here is pure JVM expression work —
zero Python UDFs — so it whole-stage-codegens and scales linearly; the
only shuffles are the final per-doc/per-lang aggregations with map-side
partial aggregation.

Every operator has a DuckDB SQL twin used by the driver's value-hash
correctness harness; keep the two in lock-step when editing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparksearch.analyze import DUCKDB_TOKENS_EXPR, tokens_col

ROUND = 4

# Small ASCII-only stopword marker lists for the n-gram/stopword language
# heuristic.  Deliberately tiny and unambiguous; non-ASCII markers would
# not survive the [a-z0-9] analyzer so they are excluded by design.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "for", "with"],
    "de": ["der", "die", "das", "und", "nicht", "ist", "mit", "ein"],
    "es": ["el", "los", "las", "una", "que", "por", "para", "como"],
    "fr": ["le", "la", "les", "et", "des", "est", "dans", "pour"],
}
# deterministic argmax precedence (ties resolve to the earlier entry)
LANG_ORDER = ["en", "de", "es", "fr"]

EN_STOPWORDS = LANG_MARKERS["en"]


def _sql_list(words: list[str]) -> str:
    return ", ".join(f"'{w}'" for w in words)


def _marker_count(toks: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


# ---------------------------------------------------------------------------
# token counting
# ---------------------------------------------------------------------------

def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc token counts: analyzer tokens, whitespace tokens, distinct terms."""
    toks = tokens_col(text_col)
    ws = F.array_remove(F.split(F.col(text_col), r"\s+"), "")
    return (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("doc_id"),
            F.size(toks).cast("long").alias("n_tokens"),
            F.size(ws).cast("long").alias("n_ws_tokens"),
            F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        )
    )


def token_counts_sql(table: str = "documents", id_col: str = "doc_id", text_col: str = "text") -> str:
    toks = DUCKDB_TOKENS_EXPR.format(col=text_col)
    return f"""
SELECT {id_col} AS doc_id,
       len({toks})::BIGINT AS n_tokens,
       len(list_filter(regexp_split_to_array({text_col}, '\\s+'), t -> t <> ''))::BIGINT AS n_ws_tokens,
       len(list_distinct({toks}))::BIGINT AS n_distinct
FROM {table} WHERE {text_col} IS NOT NULL
""".strip()


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

def quality_scores(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc quality signals: length, punctuation/digit ratios, stopword
    ratio, mean token length.  All ratios rounded to 4 decimals."""
    text = F.col(text_col)
    toks = tokens_col(text_col)
    n_chars = F.length(text).cast("double")
    lowered = F.lower(text)
    non_word = n_chars - F.length(F.regexp_replace(lowered, r"[^a-z0-9\s]", ""))
    digits = F.length(lowered) - F.length(F.regexp_replace(lowered, r"[0-9]", ""))
    n_toks = F.size(toks).cast("double")
    tok_chars = F.length(F.concat_ws("", toks)).cast("double")
    stop_hits = _marker_count(toks, EN_STOPWORDS).cast("double")
    return (
        docs.filter(text.isNotNull())
        .select(
            F.col(id_col).alias("doc_id"),
            F.length(text).cast("long").alias("n_chars"),
            F.size(toks).cast("long").alias("n_tokens"),
            F.round(tok_chars / F.nullif(n_toks, F.lit(0.0)), ROUND).alias("avg_token_len"),
            F.round(non_word / F.nullif(n_chars, F.lit(0.0)), ROUND).alias("punct_ratio"),
            F.round(digits.cast("double") / F.nullif(n_chars, F.lit(0.0)), ROUND).alias("digit_ratio"),
            F.round(stop_hits / F.nullif(n_toks, F.lit(0.0)), ROUND).alias("stopword_ratio"),
        )
    )


def quality_scores_sql(table: str = "documents", id_col: str = "doc_id", text_col: str = "text") -> str:
    toks = DUCKDB_TOKENS_EXPR.format(col=text_col)
    stops = _sql_list(EN_STOPWORDS)
    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id, {text_col} AS t, lower({text_col}) AS lt, {toks} AS toks
  FROM {table} WHERE {text_col} IS NOT NULL
)
SELECT doc_id,
       len(t)::BIGINT AS n_chars,
       len(toks)::BIGINT AS n_tokens,
       round(len(array_to_string(toks, ''))::DOUBLE / nullif(len(toks), 0), {ROUND}) AS avg_token_len,
       round((len(t) - len(regexp_replace(lt, '[^a-z0-9\\s]', '', 'g')))::DOUBLE / nullif(len(t), 0), {ROUND}) AS punct_ratio,
       round((len(lt) - len(regexp_replace(lt, '[0-9]', '', 'g')))::DOUBLE / nullif(len(t), 0), {ROUND}) AS digit_ratio,
       round(len(list_filter(toks, x -> x IN ({stops})))::DOUBLE / nullif(len(toks), 0), {ROUND}) AS stopword_ratio
FROM base
""".strip()


# ---------------------------------------------------------------------------
# language identification (stopword-marker heuristic)
# ---------------------------------------------------------------------------

def langid(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of per-language marker-token counts,
    'und' (undetermined) when no marker hits.  Ties resolve in LANG_ORDER."""
    toks = tokens_col(text_col)
    scores = {lang: _marker_count(toks, LANG_MARKERS[lang]) for lang in LANG_ORDER}
    # chained CASE, evaluated in LANG_ORDER — identical shape in the SQL twin
    c = F.when(scores["en"] >= F.greatest(scores["de"], scores["es"], scores["fr"], F.lit(1)), F.lit("en"))
    c = c.when(scores["de"] >= F.greatest(scores["es"], scores["fr"], F.lit(1)), F.lit("de"))
    c = c.when(scores["es"] >= F.greatest(scores["fr"], F.lit(1)), F.lit("es"))
    c = c.when(scores["fr"] >= F.lit(1), F.lit("fr")).otherwise(F.lit("und"))
    return (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("doc_id"), c.alias("pred_lang"))
    )


def langid_sql(table: str = "documents", id_col: str = "doc_id", text_col: str = "text") -> str:
    toks = DUCKDB_TOKENS_EXPR.format(col=text_col)
    cnt = {
        lang: f"len(list_filter(toks, x -> x IN ({_sql_list(LANG_MARKERS[lang])})))"
        for lang in LANG_ORDER
    }
    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id, {toks} AS toks FROM {table} WHERE {text_col} IS NOT NULL
),
scored AS (
  SELECT doc_id, {cnt['en']} AS s_en, {cnt['de']} AS s_de, {cnt['es']} AS s_es, {cnt['fr']} AS s_fr
  FROM base
)
SELECT doc_id,
       CASE WHEN s_en >= greatest(s_de, s_es, s_fr, 1) THEN 'en'
            WHEN s_de >= greatest(s_es, s_fr, 1) THEN 'de'
            WHEN s_es >= greatest(s_fr, 1) THEN 'es'
            WHEN s_fr >= 1 THEN 'fr'
            ELSE 'und' END AS pred_lang
FROM scored
""".strip()


# ---------------------------------------------------------------------------
# document fingerprinting
# ---------------------------------------------------------------------------

def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Content fingerprints: raw md5, token-set md5 (order/count invariant),
    token-bag md5 (order invariant)."""
    toks = tokens_col(text_col)
    return (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("doc_id"),
            F.md5(F.col(text_col)).alias("fp_raw"),
            F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))).alias("fp_set"),
            F.md5(F.concat_ws(" ", F.array_sort(toks))).alias("fp_bag"),
        )
    )


def fingerprints_sql(table: str = "documents", id_col: str = "doc_id", text_col: str = "text") -> str:
    toks = DUCKDB_TOKENS_EXPR.format(col=text_col)
    return f"""
SELECT {id_col} AS doc_id,
       md5({text_col}) AS fp_raw,
       md5(array_to_string(list_sort(list_distinct({toks})), ' ')) AS fp_set,
       md5(array_to_string(list_sort({toks}), ' ')) AS fp_bag
FROM {table} WHERE {text_col} IS NOT NULL
""".strip()


# ---------------------------------------------------------------------------
# corpus statistics
# ---------------------------------------------------------------------------

def corpus_stats_by_lang(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-language corpus stats: doc count, token totals, mean doc length."""
    toks = tokens_col(text_col)
    return (
        docs.filter(F.col(text_col).isNotNull())
        .select("lang", F.size(toks).alias("dl"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("dl").cast("long").alias("total_tokens"),
            F.round(F.avg("dl"), ROUND).alias("avg_dl"),
        )
    )


def corpus_stats_by_lang_sql(table: str = "documents", text_col: str = "text") -> str:
    toks = DUCKDB_TOKENS_EXPR.format(col=text_col)
    return f"""
WITH base AS (
  SELECT lang, len({toks}) AS dl FROM {table} WHERE {text_col} IS NOT NULL
)
SELECT lang, count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS total_tokens,
       round(avg(dl), {ROUND}) AS avg_dl
FROM base GROUP BY lang
""".strip()
