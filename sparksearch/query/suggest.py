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


# ---------------------------------------------------------------------------
# completion suggester — prefix autocomplete (OpenSearch's completion
# field is a Lucene FST keyed by suggestion inputs with weights; the
# engine analog is the sorted term dictionary).  Pinned: suggestions =
# vocabulary terms with the prefix; weight = df (OpenSearch weights are
# user-supplied per input — corpus df is the derived default,
# documented); order weight desc, suggestion asc; top ``size``.
# The lexicon path (:func:`completion_suggest_indexed`) IS the FST
# analog — a range scan over the term-sorted sidecar, pruned by
# parquet min/max to the files that can hold the prefix range.
# ---------------------------------------------------------------------------

def completion_suggest(
    docs: DataFrame,
    prefix: str,
    size: int = 5,
    *,
    text_col: str = "text",
    analyzer: str = "ascii",
) -> DataFrame:
    """Exhaustive completion suggester → (suggestion, weight)."""
    from sparksearch.analyze import tokens_col

    if not prefix:
        raise ValueError("completion prefix must be non-empty")
    # df weight: distinct terms per doc, then count docs per term
    vocab = (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            F.explode(
                F.array_distinct(tokens_col(text_col, analyzer))
            ).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    return (
        vocab.filter(
            (F.col("term") >= prefix) & (F.col("term") < prefix + "￿")
        )
        .select(F.col("term").alias("suggestion"), "weight")
        .orderBy(F.desc("weight"), F.asc("suggestion"))
        .limit(size)
    )


def completion_suggest_sql(
    prefix: str,
    size: int = 5,
    *,
    table: str = "documents",
    text_col: str = "text",
    analyzer: str = "ascii",
) -> str:
    """DuckDB twin of :func:`completion_suggest`."""
    if not prefix:
        raise ValueError("completion prefix must be non-empty")
    toks = duckdb_tokens_expr(text_col, analyzer)
    p = prefix.replace("'", "''")
    return f"""
WITH base AS (
  SELECT list_distinct({toks}) AS ts FROM {table}
  WHERE {text_col} IS NOT NULL
),
vocab AS (
  SELECT u.t AS suggestion, count(*)::BIGINT AS weight
  FROM base, unnest(ts) AS u(t) GROUP BY 1
)
SELECT suggestion, weight FROM vocab
WHERE suggestion >= '{p}' AND suggestion < '{p}' || chr(65535)
ORDER BY weight DESC, suggestion ASC LIMIT {size}
""".strip()


def completion_suggest_indexed(index, prefix: str, size: int = 5) -> DataFrame:
    """Engine path: term-dictionary range scan (the FST analog; parquet
    min/max prunes to the files holding the prefix range)."""
    from sparksearch.index.lexicon import read_lexicon

    if not prefix:
        raise ValueError("completion prefix must be non-empty")
    lx = read_lexicon(index.spark, index.index_dir)
    return (
        lx.filter(
            (F.col("term") >= prefix) & (F.col("term") < prefix + "￿")
        )
        .select(F.col("term").alias("suggestion"),
                F.col("df").alias("weight"))
        .orderBy(F.desc("weight"), F.asc("suggestion"))
        .limit(size)
    )


# ---------------------------------------------------------------------------
# phrase suggester — whole-query "did you mean" (OpenSearch's phrase
# suggester: per-term candidate generation + an index n-gram language
# model).  Pinned spec:
#
# * candidates per query position: vocabulary terms within the AUTO
#   edit distance of that position's term, INCLUDING the term itself
#   (distance 0 — the original is always a candidate, like Lucene's
#   DirectCandidateGenerator), ranked distance asc / ttf desc / term
#   asc, top ``max_per_term`` (default 5);
# * candidate phrases = the per-position cartesian product (bounded by
#   max_per_term^n; n = analyzed query length, capped at 4);
# * score = StupidBackoff(0.4) bigram LM over the corpus token stream
#   (the OpenSearch default smoothing): P(c_1)·Π P(c_i|c_{i-1}) with
#   P(w) = ttf(w)/T and P(w|v) = count(v,w)/ttf(v) when the bigram
#   exists, else 0.4·P(w); output ``logp = round(ln(score), 4)``
#   (products underflow the 6-dp float contract; ln pins like BM25's
#   idf), order logp desc / suggestion asc, top ``size``.
#
# Scale shape: unigram + bigram counts are two map-side-combined
# groupBys over the token stream (the bigram frame is the corpus's
# distinct-bigram set — at 100 TB this becomes a persisted sidecar,
# same as the lexicon); every candidate-side frame is
# max_per_term-sized and broadcast into the count joins.
# ---------------------------------------------------------------------------

PHRASE_BACKOFF = 0.4
PHRASE_MAX_TERMS = 4
LOGP_ROUND = 4


def _phrase_frames(docs: DataFrame, text_col: str, analyzer: str):
    from sparksearch.analyze import tokens_col

    base = docs.filter(F.col(text_col).isNotNull()).select(
        tokens_col(text_col, analyzer).alias("toks")
    )
    uni = (
        base.select(F.explode("toks").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("ttf"))
    )
    pairs = base.select(
        F.explode(
            F.arrays_zip(
                F.slice("toks", 1, F.size("toks") - 1).alias("v"),
                F.slice("toks", 2, F.size("toks") - 1).alias("w"),
            )
        ).alias("p")
    ).select(F.col("p.v").alias("v"), F.col("p.w").alias("w"))
    bg = pairs.groupBy("v", "w").agg(F.count(F.lit(1)).alias("c"))
    return uni, bg


def phrase_suggest(
    docs: DataFrame,
    query_text: str,
    size: int = 5,
    *,
    max_per_term: int = 5,
    text_col: str = "text",
    analyzer: str = "ascii",
) -> DataFrame:
    """Exhaustive phrase suggester → (suggestion, logp); pinned spec
    in the section docstring above."""
    from sparksearch.index.lexicon import auto_fuzziness

    spark = docs.sparkSession
    qterms = tokenize_str(query_text, analyzer)
    if not qterms:
        return spark.createDataFrame([], "suggestion string, logp double")
    if len(qterms) > PHRASE_MAX_TERMS:
        raise ValueError(
            f"phrase suggester caps at {PHRASE_MAX_TERMS} analyzed terms"
        )
    uni, bg = _phrase_frames(docs, text_col, analyzer)
    uni = uni.persist()
    total = uni.agg(F.sum("ttf").alias("T"))

    cands = []
    for i, qt in enumerate(qterms):
        lev = F.levenshtein(F.col("term"), F.lit(qt))
        w = Window.orderBy(
            F.asc("distance"), F.desc("ttf"), F.asc(f"c{i}")
        )
        ci = (
            uni.filter(lev <= auto_fuzziness(qt))
            .select(
                F.col("term").alias(f"c{i}"),
                F.col("ttf").alias(f"ttf{i}"),
                lev.alias("distance"),
                F.col("ttf"),
            )
            .withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= max_per_term)
            .select(f"c{i}", f"ttf{i}")
        )
        cands.append(ci)
    prod = cands[0].crossJoin(F.broadcast(total))
    for ci in cands[1:]:
        prod = prod.crossJoin(ci)
    for i in range(1, len(qterms)):
        bgi = bg.select(
            F.col("v").alias(f"c{i-1}"),
            F.col("w").alias(f"c{i}"),
            F.col("c").alias(f"bg{i}"),
        )
        # prod is candidate-product-sized (≤ max_per_term^n rows) —
        # the join shuffles bg once on (v, w); at 100 TB the bigram
        # frame becomes a persisted sidecar like the lexicon
        prod = prod.join(bgi, [f"c{i-1}", f"c{i}"], "left")
    score = F.col("ttf0").cast("double") / F.col("T")
    for i in range(1, len(qterms)):
        cond = F.col(f"bg{i}").isNotNull()
        p_bg = F.col(f"bg{i}").cast("double") / F.col(f"ttf{i-1}")
        p_bo = (
            F.lit(PHRASE_BACKOFF)
            * F.col(f"ttf{i}").cast("double")
            / F.col("T")
        )
        score = score * F.when(cond, p_bg).otherwise(p_bo)
    suggestion = F.concat_ws(
        " ", *[F.col(f"c{i}") for i in range(len(qterms))]
    )
    return (
        prod.select(
            suggestion.alias("suggestion"),
            F.round(F.log(score), LOGP_ROUND).alias("logp"),
        )
        .orderBy(F.desc("logp"), F.asc("suggestion"))
        .limit(size)
    )


def phrase_suggest_sql(
    query_text: str,
    size: int = 5,
    *,
    max_per_term: int = 5,
    table: str = "documents",
    text_col: str = "text",
    analyzer: str = "ascii",
) -> str:
    """DuckDB twin of :func:`phrase_suggest` (same candidates, same
    StupidBackoff bigram LM, same rounding)."""
    from sparksearch.index.lexicon import auto_fuzziness

    qterms = tokenize_str(query_text, analyzer)
    if not qterms:
        return (
            "SELECT CAST(NULL AS VARCHAR) AS suggestion, "
            "CAST(NULL AS DOUBLE) AS logp WHERE FALSE"
        )
    if len(qterms) > PHRASE_MAX_TERMS:
        raise ValueError(
            f"phrase suggester caps at {PHRASE_MAX_TERMS} analyzed terms"
        )
    toks = duckdb_tokens_expr(text_col, analyzer)
    n = len(qterms)
    q = lambda t: "'" + t.replace("'", "''") + "'"  # noqa: E731
    cand_ctes = []
    for i, qt in enumerate(qterms):
        cand_ctes.append(
            f"""cand{i} AS (
  SELECT term AS c{i}, ttf AS ttf{i} FROM (
    SELECT term, ttf, levenshtein(term, {q(qt)}) AS distance FROM uni
    WHERE levenshtein(term, {q(qt)}) <= {auto_fuzziness(qt)}
  ) QUALIFY row_number() OVER (
    ORDER BY distance ASC, ttf DESC, term ASC) <= {max_per_term}
)"""
        )
    joins = "cand0 CROSS JOIN tot"
    for i in range(1, n):
        joins += f" CROSS JOIN cand{i}"
    for i in range(1, n):
        joins += (
            f" LEFT JOIN bg bg{i} ON bg{i}.v = c{i-1} AND bg{i}.w = c{i}"
        )
    score = "ttf0::DOUBLE / T"
    for i in range(1, n):
        score += (
            f" * (CASE WHEN bg{i}.c IS NOT NULL THEN bg{i}.c::DOUBLE / "
            f"ttf{i-1} ELSE {PHRASE_BACKOFF} * ttf{i}::DOUBLE / T END)"
        )
    parts = " || ' ' || ".join(f"c{i}" for i in range(n))
    cands_block = ",\n".join(cand_ctes)
    return f"""
WITH base AS (
  SELECT {toks} AS tl FROM {table} WHERE {text_col} IS NOT NULL
),
uni AS (
  SELECT u.t AS term, count(*)::BIGINT AS ttf
  FROM base, unnest(tl) AS u(t) GROUP BY 1
),
tot AS (SELECT sum(ttf)::DOUBLE AS T FROM uni),
bg AS (
  SELECT tl[i] AS v, tl[i + 1] AS w, count(*)::BIGINT AS c
  FROM base, unnest(range(1, len(tl))) AS r(i) GROUP BY 1, 2
),
{cands_block}
SELECT {parts} AS suggestion, round(ln({score}), {LOGP_ROUND}) AS logp
FROM {joins}
ORDER BY logp DESC, suggestion ASC LIMIT {size}
""".strip()
