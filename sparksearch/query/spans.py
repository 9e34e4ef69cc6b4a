"""span_near — ordered/unordered term proximity (Lucene's span family).

The reference delegates retrieval to OpenSearch, whose ``span_near``
wraps ``span_term`` clauses with a ``slop`` and an ``in_order`` flag
(Lucene NearSpansOrdered/Unordered).  Pinned cross-engine spec over
single-term clauses, with the window length ``m + slop`` tokens
(anchor + the ordered rule's ``m-1+slop`` successors):

* ``in_order=True`` — exactly the sloppy-phrase rule
  (``query.phrase.phrase_tf_col``): tf = anchors p with ``toks[p] ==
  t0`` whose remaining clauses form an in-order occurrence within
  ``p + m-1+slop``.  Single-position spans make Lucene's
  ordered-spans condition (strictly increasing positions, span width
  ≤ slop) identical to that rule, so the ordered path DELEGATES to
  the phrase implementation and is rank-identical to
  ``match_phrase(slop=)`` by construction.
* ``in_order=False`` — tf = anchor positions p where ``toks[p]`` is a
  clause term and the window ``toks[p .. p+m-1+slop]`` holds every
  clause term with at least its clause multiplicity (duplicate
  clauses need that many distinct occurrences).  Each valid
  assignment's minimum position is such an anchor, so the existence
  test is exact; anchor counting keeps tf finite, monotone in slop,
  and identical across Spark / DuckDB / the positional sidecar.

Documented deviation from Lucene: SpanScorer weights each enumerated
span ``1/(1+matchLength)`` and counts span enumerator emissions; the
anchored-window tf (weight 1) is pinnable bit-identically across all
three engines.  Scoring is then the standard phrase-family BM25
(df = docs with tf > 0, corpus-wide n_docs/avgdl, 4 dp round).

Scale shape: the exhaustive tf is a pure-Catalyst higher-order
expression (no UDF, no explode); the positional path joins one
bucket-pruned parquet slice per DISTINCT clause term on doc_id and
verifies from position lists alone — document text is never read
(the ``match_phrase_positional`` plan with a per-anchor counting
filter instead of the intersect).
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparksearch.analyze import duckdb_tokens_expr, tokenize_str, tokens_col
from sparksearch.query.bm25 import SCORE_ROUND
from sparksearch.query.phrase import _phrase_tf_sql, phrase_tf_col


def _validate_clauses(terms: list[str], analyzer: str) -> list[str]:
    """span_term clauses are term-level (not analyzed); pin: each must
    be a single analyzer token of itself so all three engines agree on
    vocabulary membership.  Duplicates are legal (multiplicity)."""
    if not terms or len(terms) < 2:
        raise ValueError("span_near needs >= 2 span_term clauses")
    for t in terms:
        if tokenize_str(t, analyzer) != [t]:
            raise ValueError(
                f"span_term clause {t!r} is not a single {analyzer!r} "
                "analyzer token — pass analyzer-space terms"
            )
    return list(terms)


def _eq(u: str):
    # closure factory: a loop-local lambda would late-bind u, and a
    # default-arg lambda is read by PySpark as the (element, index)
    # two-parameter HOF form
    return lambda x: x == F.lit(u)


def span_near_tf_col(
    toks: Column, terms: list[str], slop: int = 0, *, in_order: bool = False
) -> Column:
    """Column: span_near frequency of ``terms`` in ``toks`` (see module
    docstring for the pinned anchored-window spec)."""
    if in_order:
        return phrase_tf_col(toks, terms, slop)
    m = len(terms)
    w = m + slop  # window length: anchor + m-1+slop following tokens
    mult = sorted(Counter(terms).items())
    members = F.array(*[F.lit(t) for t in sorted(set(terms))])

    def _ok(i):
        win = F.slice(toks, i, w)
        cond = F.array_contains(members, F.element_at(toks, i))
        for u, c in mult:
            cond = cond & (F.size(F.filter(win, _eq(u))) >= c)
        return cond

    starts = F.sequence(F.lit(1), F.size(toks))
    hits = F.size(F.filter(starts, _ok))
    return F.when(F.size(toks) >= m, hits).otherwise(F.lit(0))


def _span_tf_sql(toks_expr: str, terms: list[str], slop: int,
                 in_order: bool) -> str:
    if in_order:
        return _phrase_tf_sql(toks_expr, terms, slop)
    m = len(terms)
    w = m + slop
    q = lambda t: "'" + t.replace("'", "''") + "'"  # noqa: E731
    members = ", ".join(q(t) for t in sorted(set(terms)))
    conds = [f"list_contains([{members}], ({toks_expr})[i])"]
    for u, c in sorted(Counter(terms).items()):
        conds.append(
            f"len(list_filter(({toks_expr})[i : i + {w} - 1], "
            f"x -> x = {q(u)})) >= {c}"
        )
    cond = " AND ".join(conds)
    return (
        f"CASE WHEN len({toks_expr}) >= {m} THEN "
        f"len(list_filter(range(1, len({toks_expr}) + 1), i -> {cond})) "
        f"ELSE 0 END"
    )


def _span_bm25_topk(stats: DataFrame, k: int, k1: float, b: float) -> DataFrame:
    """Shared span-family scorer: (doc_id, dl, tf) over ALL docs →
    BM25 top-k (df = docs with tf > 0, corpus-wide n_docs/avgdl)."""
    stats = stats.persist()
    glob = stats.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    hits = stats.filter(F.col("tf") > 0)
    df_ = hits.agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tfn = F.col("tf") / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    return (
        hits.crossJoin(F.broadcast(df_))
        .crossJoin(F.broadcast(glob))
        .select("doc_id", (idf * tfn).alias("raw"))
        .orderBy(F.desc("raw"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", F.round("raw", SCORE_ROUND).alias("score"))
    )


def span_near_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    *,
    slop: int = 0,
    in_order: bool = False,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    analyzer: str = "ascii",
) -> DataFrame:
    """Exhaustive span_near top-k → (doc_id, score)."""
    terms = _validate_clauses(terms, analyzer)
    base = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"), tokens_col(text_col, analyzer).alias("toks")
    )
    stats = base.select(
        "doc_id",
        F.size("toks").alias("dl"),
        span_near_tf_col(F.col("toks"), terms, slop, in_order=in_order).alias("tf"),
    )
    return _span_bm25_topk(stats, k, k1, b)


def span_near_sql(
    terms: list[str],
    k: int = 10,
    *,
    slop: int = 0,
    in_order: bool = False,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    analyzer: str = "ascii",
) -> str:
    """DuckDB twin of :func:`span_near_topk` (same tf/df/rounding)."""
    terms = _validate_clauses(terms, analyzer)
    stf = _span_tf_sql("tl", terms, slop, in_order)
    return _span_bm25_sql(stf, k, table, id_col, text_col, k1, b, analyzer)


def _span_bm25_sql(
    stf: str,
    k: int,
    table: str,
    id_col: str,
    text_col: str,
    k1: float,
    b: float,
    analyzer: str,
) -> str:
    """Shared span-family DuckDB scaffold: ``stf`` is the tf expression
    over the token list alias ``tl`` (the SQL twin of the pinned tf)."""
    toks = duckdb_tokens_expr(text_col, analyzer)
    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id, {toks} AS tl
  FROM {table} WHERE {text_col} IS NOT NULL
),
stats AS (
  SELECT doc_id, len(tl) AS dl, {stf} AS tf FROM base
),
corp AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM stats),
hits AS (SELECT * FROM stats WHERE tf > 0),
dfs AS (SELECT count(*)::DOUBLE AS df FROM hits)
SELECT doc_id,
       round( ln(1.0 + (corp.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
              * tf / (tf + {k1} * (1.0 - {b} + {b} * dl / corp.avgdl)),
              {SCORE_ROUND}) AS score
FROM hits CROSS JOIN dfs CROSS JOIN corp
ORDER BY ln(1.0 + (corp.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
         * tf / (tf + {k1} * (1.0 - {b} + {b} * dl / corp.avgdl)) DESC,
         doc_id ASC
LIMIT {k}
""".strip()


def span_near_positional(
    index, terms: list[str], k: int = 10, *, slop: int = 0,
    in_order: bool = False,
) -> DataFrame:
    """span_near top-k from the positions sidecar alone — no corpus
    read.  Ordered delegates to the sloppy-phrase chain; unordered
    joins one bucket-pruned slice per DISTINCT clause term and counts
    anchors whose window holds every clause multiplicity.
    Rank-identical to :func:`span_near_topk` (pytest-pinned)."""
    from sparksearch.index.positions import (
        _positions_frame,
        phrase_scores_all,
    )

    analyzer = index.meta.get("analyzer", "ascii")
    terms = _validate_clauses(terms, analyzer)
    if in_order:
        scored = phrase_scores_all(index, terms, slop)
        return (
            scored.orderBy(F.desc("raw"), F.asc("doc_id"))
            .limit(k)
            .select("doc_id", F.round("raw", SCORE_ROUND).alias("score"))
        )
    index._refresh_if_stale()
    meta = index.meta
    spark = index.spark
    empty = spark.createDataFrame([], "doc_id long, score double")
    distinct = sorted(set(terms))
    by_term = index._term_ids_for(distinct)
    if len(by_term) < len(distinct):
        return empty  # an OOV clause: the conjunction is empty
    pos = _positions_frame(index)
    n_buckets = int(meta["n_buckets"])
    buckets = sorted({tid % n_buckets for tid in by_term.values()})
    pos = pos.filter(F.col("term_bucket").isin(buckets)).filter(
        F.col("term_id").isin(sorted(set(by_term.values())))
    )
    legs = []
    for i, t in enumerate(distinct):
        leg = pos.filter(F.col("term_id") == by_term[t]).select(
            "doc_id",
            *(["dl"] if i == 0 else []),
            F.col("positions").alias(f"p{i}"),
        )
        legs.append(leg)
    joined = legs[0]
    for leg in legs[1:]:
        joined = joined.join(leg, "doc_id")
    m = len(terms)
    w = m - 1 + slop  # window END offset from the anchor (inclusive)
    mult = Counter(terms)

    def _count_in(col_name: str, p):
        def inside(q):
            return (q >= p) & (q <= p + w)

        return F.size(F.filter(F.col(col_name), inside))

    def _ok(p):
        cond = F.lit(True)
        for i, t in enumerate(distinct):
            cond = cond & (_count_in(f"p{i}", p) >= mult[t])
        return cond

    anchors = F.col("p0")
    for i in range(1, len(distinct)):
        anchors = F.array_union(anchors, F.col(f"p{i}"))
    tf_col = F.size(F.filter(anchors, _ok))
    return _span_positional_score(
        joined.select("doc_id", "dl", tf_col.alias("tf")), meta, k
    )


def _span_positional_score(tf_frame: DataFrame, meta: dict, k: int) -> DataFrame:
    """Shared positional-path scorer: (doc_id, dl, tf) rows (tf=0 rows
    allowed) → BM25 top-k with the INDEX's corpus stats (meta
    n_docs/avgdl — the sidecar never re-derives them)."""
    tf = tf_frame.filter(F.col("tf") > 0).persist()
    df_ = tf.agg(F.count(F.lit(1)).alias("df"))
    k1, b = meta["k1"], meta["b"]
    n_docs, avgdl = meta["n_docs"], meta["avgdl"]
    idf = F.log(1.0 + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tfn = F.col("tf") / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
    )
    return (
        tf.crossJoin(F.broadcast(df_))
        .select("doc_id", (idf * tfn).alias("raw"))
        .orderBy(F.desc("raw"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", F.round("raw", SCORE_ROUND).alias("score"))
    )


# ---------------------------------------------------------------------------
# span_first / span_or / span_not — the rest of the span family over
# single-term clauses (Lucene SpanFirstQuery / SpanOrQuery /
# SpanNotQuery).  Single-position spans make each pin EXACT Lucene
# semantics (no span-width ambiguity):
#
# * span_first(term, end): occurrences whose span end fits in the first
#   ``end`` positions — a single-term span at 0-based position p has
#   end p+1, so tf = |{p : p < end}| = count of the term in the first
#   ``end`` tokens.
# * span_or(terms): union of the clause spans; distinct single-term
#   clauses never collide on a position, so tf = total occurrences of
#   any clause term (clauses pinned distinct — Lucene's duplicate-
#   clause enumeration is redundant for scoring).
# * span_not(include, exclude, pre, post): include occurrences with NO
#   exclude occurrence in [p-pre, p+post] (Lucene's pre/post buffer).
#
# Scoring is the span-family BM25 pin (tf above, df = docs with tf>0,
# corpus-wide n_docs/avgdl, 4 dp).  Exhaustive paths are pure-Catalyst
# higher-order expressions; positional paths read only bucket-pruned
# position lists (buffer arithmetic is shift-invariant, so 0-based
# sidecar positions and the 1-based token-index fold agree exactly).
# ---------------------------------------------------------------------------

def _validate_term(t: str, analyzer: str) -> str:
    """Single span_term clause: must be one analyzer token of itself."""
    if tokenize_str(t, analyzer) != [t]:
        raise ValueError(
            f"span_term clause {t!r} is not a single {analyzer!r} "
            "analyzer token — pass analyzer-space terms"
        )
    return t


def _sql_quote(t: str) -> str:
    return "'" + t.replace("'", "''") + "'"


def span_first_topk(
    docs: DataFrame,
    term: str,
    end: int,
    k: int = 10,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    analyzer: str = "ascii",
) -> DataFrame:
    """Exhaustive span_first top-k: ``term`` within the first ``end``
    positions (Lucene SpanFirstQuery, exact for single-term spans)."""
    term = _validate_term(term, analyzer)
    if end < 0:
        raise ValueError("span_first end must be >= 0")
    base = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"), tokens_col(text_col, analyzer).alias("toks")
    )
    tf = F.size(F.filter(F.slice("toks", 1, end), _eq(term))) if end else F.lit(0)
    stats = base.select("doc_id", F.size("toks").alias("dl"), tf.alias("tf"))
    return _span_bm25_topk(stats, k, k1, b)


def span_first_sql(
    term: str,
    end: int,
    k: int = 10,
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    analyzer: str = "ascii",
) -> str:
    """DuckDB twin of :func:`span_first_topk`."""
    term = _validate_term(term, analyzer)
    q = _sql_quote(term)
    stf = (
        f"len(list_filter(tl[1:{int(end)}], x -> x = {q}))"
        if end
        else "0"
    )
    return _span_bm25_sql(stf, k, table, id_col, text_col, k1, b, analyzer)


def span_first_positional(index, term: str, end: int, k: int = 10) -> DataFrame:
    """span_first from the positions sidecar alone (one bucket-pruned
    leg; 0-based sidecar positions give tf = |{p : p < end}| directly)."""
    from sparksearch.index.positions import _positions_frame

    analyzer = index.meta.get("analyzer", "ascii")
    term = _validate_term(term, analyzer)
    index._refresh_if_stale()
    meta = index.meta
    spark = index.spark
    empty = spark.createDataFrame([], "doc_id long, score double")
    by_term = index._term_ids_for([term])
    if not by_term or end <= 0:
        return empty
    tid = by_term[term]
    pos = _positions_frame(index)
    leg = (
        pos.filter(F.col("term_bucket") == tid % int(meta["n_buckets"]))
        .filter(F.col("term_id") == tid)
        .select("doc_id", "dl", "positions")
    )

    def _lt_end(p):
        return p < F.lit(int(end))

    tf_frame = leg.select(
        "doc_id", "dl", F.size(F.filter("positions", _lt_end)).alias("tf")
    )
    return _span_positional_score(tf_frame, meta, k)


def span_or_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    analyzer: str = "ascii",
) -> DataFrame:
    """Exhaustive span_or top-k: tf = total occurrences of any clause
    term (distinct clauses required — see the family pin above)."""
    terms = sorted({_validate_term(t, analyzer) for t in terms})
    if len(terms) < 2:
        raise ValueError("span_or needs >= 2 distinct span_term clauses")
    base = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"), tokens_col(text_col, analyzer).alias("toks")
    )
    members = F.array(*[F.lit(t) for t in terms])

    def _member(x):
        return F.array_contains(members, x)

    stats = base.select(
        "doc_id",
        F.size("toks").alias("dl"),
        F.size(F.filter("toks", _member)).alias("tf"),
    )
    return _span_bm25_topk(stats, k, k1, b)


def span_or_sql(
    terms: list[str],
    k: int = 10,
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    analyzer: str = "ascii",
) -> str:
    """DuckDB twin of :func:`span_or_topk`."""
    terms = sorted({_validate_term(t, analyzer) for t in terms})
    if len(terms) < 2:
        raise ValueError("span_or needs >= 2 distinct span_term clauses")
    members = ", ".join(_sql_quote(t) for t in terms)
    stf = f"len(list_filter(tl, x -> list_contains([{members}], x)))"
    return _span_bm25_sql(stf, k, table, id_col, text_col, k1, b, analyzer)


def span_or_positional(index, terms: list[str], k: int = 10) -> DataFrame:
    """span_or from the positions sidecar: one bucket-pruned leg per
    clause term, full-outer-joined on doc_id (union semantics — OOV
    clauses just drop out), tf = Σ per-leg occurrence counts."""
    from sparksearch.index.positions import _positions_frame

    analyzer = index.meta.get("analyzer", "ascii")
    terms = sorted({_validate_term(t, analyzer) for t in terms})
    if len(terms) < 2:
        raise ValueError("span_or needs >= 2 distinct span_term clauses")
    index._refresh_if_stale()
    meta = index.meta
    spark = index.spark
    empty = spark.createDataFrame([], "doc_id long, score double")
    by_term = index._term_ids_for(terms)
    if not by_term:
        return empty
    present = sorted(by_term)
    pos = _positions_frame(index)
    n_buckets = int(meta["n_buckets"])
    buckets = sorted({by_term[t] % n_buckets for t in present})
    pos = pos.filter(F.col("term_bucket").isin(buckets)).filter(
        F.col("term_id").isin(sorted(set(by_term.values())))
    )
    legs = [
        pos.filter(F.col("term_id") == by_term[t]).select(
            "doc_id",
            F.col("dl").alias(f"dl{i}"),
            F.size("positions").alias(f"c{i}"),
        )
        for i, t in enumerate(present)
    ]
    joined = legs[0]
    for leg in legs[1:]:
        joined = joined.join(leg, "doc_id", "full")
    dl = F.coalesce(*[F.col(f"dl{i}") for i in range(len(present))])
    tf = sum(
        (F.coalesce(F.col(f"c{i}"), F.lit(0)) for i in range(len(present))),
        F.lit(0),
    )
    tf_frame = joined.select("doc_id", dl.alias("dl"), tf.alias("tf"))
    return _span_positional_score(tf_frame, meta, k)


def span_not_topk(
    docs: DataFrame,
    include: str,
    exclude: str,
    k: int = 10,
    *,
    pre: int = 0,
    post: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    analyzer: str = "ascii",
) -> DataFrame:
    """Exhaustive span_not top-k: ``include`` occurrences with no
    ``exclude`` occurrence within ``[p-pre, p+post]`` (Lucene
    SpanNotQuery with its pre/post buffer, exact for single terms)."""
    include = _validate_term(include, analyzer)
    exclude = _validate_term(exclude, analyzer)
    if pre < 0 or post < 0:
        raise ValueError("span_not pre/post must be >= 0")
    base = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"), tokens_col(text_col, analyzer).alias("toks")
    )

    def _positions_of(term):
        # two-parameter HOF deliberately: (element, 0-based index);
        # avoids sequence(1, 0) == [1, 0] on empty token arrays
        pairs = F.transform(
            "toks", lambda x, i: F.struct(x.alias("t"), (i + 1).alias("p"))
        )

        def _is(s):
            return s["t"] == F.lit(term)

        def _p(s):
            return s["p"]

        return F.transform(F.filter(pairs, _is), _p)

    def _clear(excl):
        def ok(p):
            def near(q):
                return (q >= p - F.lit(pre)) & (q <= p + F.lit(post))

            return F.size(F.filter(excl, near)) == 0

        return ok

    with_pos = base.select(
        "doc_id",
        F.size("toks").alias("dl"),
        _positions_of(include).alias("pi"),
        _positions_of(exclude).alias("pe"),
    )
    stats = with_pos.select(
        "doc_id",
        "dl",
        F.size(F.filter("pi", _clear(F.col("pe")))).alias("tf"),
    )
    return _span_bm25_topk(stats, k, k1, b)


def span_not_sql(
    include: str,
    exclude: str,
    k: int = 10,
    *,
    pre: int = 0,
    post: int = 0,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    analyzer: str = "ascii",
) -> str:
    """DuckDB twin of :func:`span_not_topk`."""
    include = _validate_term(include, analyzer)
    exclude = _validate_term(exclude, analyzer)
    qi, qe = _sql_quote(include), _sql_quote(exclude)
    pi = f"list_filter(range(1, len(tl) + 1), i -> tl[i] = {qi})"
    pe = f"list_filter(range(1, len(tl) + 1), i -> tl[i] = {qe})"
    stf = (
        f"len(list_filter({pi}, p -> len(list_filter({pe}, "
        f"q -> q >= p - {int(pre)} AND q <= p + {int(post)})) = 0))"
    )
    return _span_bm25_sql(stf, k, table, id_col, text_col, k1, b, analyzer)


def span_not_positional(
    index, include: str, exclude: str, k: int = 10, *, pre: int = 0,
    post: int = 0,
) -> DataFrame:
    """span_not from the positions sidecar: include leg inner, exclude
    leg LEFT-joined (docs without the exclude term keep every include
    occurrence); the buffer filter runs on 0-based lists — buffer
    arithmetic is shift-invariant so it pins to the token fold."""
    from sparksearch.index.positions import _positions_frame

    analyzer = index.meta.get("analyzer", "ascii")
    include = _validate_term(include, analyzer)
    exclude = _validate_term(exclude, analyzer)
    if pre < 0 or post < 0:
        raise ValueError("span_not pre/post must be >= 0")
    index._refresh_if_stale()
    meta = index.meta
    spark = index.spark
    empty = spark.createDataFrame([], "doc_id long, score double")
    by_term = index._term_ids_for(sorted({include, exclude}))
    if include not in by_term:
        return empty
    pos = _positions_frame(index)
    n_buckets = int(meta["n_buckets"])
    buckets = sorted({tid % n_buckets for tid in by_term.values()})
    pos = pos.filter(F.col("term_bucket").isin(buckets)).filter(
        F.col("term_id").isin(sorted(set(by_term.values())))
    )
    inc = pos.filter(F.col("term_id") == by_term[include]).select(
        "doc_id", "dl", F.col("positions").alias("pi")
    )
    if exclude in by_term:
        exc = pos.filter(F.col("term_id") == by_term[exclude]).select(
            "doc_id", F.col("positions").alias("pe")
        )
        joined = inc.join(exc, "doc_id", "left").withColumn(
            "pe", F.coalesce(F.col("pe"), F.array().cast("array<int>"))
        )
    else:  # OOV exclude: nothing is ever excluded
        joined = inc.withColumn("pe", F.array().cast("array<int>"))

    def _ok(p):
        def near(q):
            return (q >= p - F.lit(pre)) & (q <= p + F.lit(post))

        return F.size(F.filter("pe", near)) == 0

    tf_frame = joined.select(
        "doc_id", "dl", F.size(F.filter("pi", _ok)).alias("tf")
    )
    return _span_positional_score(tf_frame, meta, k)


# ---------------------------------------------------------------------------
# span_containing / span_within — span composition (Lucene
# SpanContainingQuery / SpanWithinQuery), pinned over big = span_near
# (ordered/unordered, slop) and little = a single span_term:
#
# * the big span's EXTENT is pinned to its anchor window
#   [p, p + m-1+slop] (the family's anchored-window rule; Lucene's
#   extent is first..last matched position — documented deviation,
#   same direction as the span_near tf pin itself);
# * span_containing: tf = #valid big anchors whose window holds an
#   occurrence of little (matches are BIG spans, so scoring counts
#   anchors — Lucene returns the big spans too);
# * span_within: tf = #little occurrences q covered by some valid big
#   anchor window (matches are LITTLE spans, so scoring counts little
#   positions).
#
# Shared tokens are legal (little may equal a big clause term): the
# containment test is pure position membership, like Lucene's.
# ---------------------------------------------------------------------------

def _near_anchor_cond(toks: Column, terms: list[str], slop: int,
                      in_order: bool):
    """Per-anchor validity predicate of the pinned span_near rules —
    the factored anchor test of :func:`span_near_tf_col` (unordered)
    and the sloppy-phrase greedy fold (ordered)."""
    m = len(terms)
    if in_order:
        rest = F.array(*[F.lit(t) for t in terms[1:]])
        t0 = F.lit(terms[0])
        win = m - 1 + slop

        def _ok(i):
            matched = F.aggregate(
                F.slice(toks, i + 1, win),
                F.lit(0),
                lambda acc, x: F.when(
                    (acc < m - 1) & (x == F.element_at(rest, acc + 1)),
                    acc + 1,
                ).otherwise(acc),
            )
            return (F.element_at(toks, i) == t0) & (matched == m - 1)

        return _ok
    w = m + slop
    mult = sorted(Counter(terms).items())
    members = F.array(*[F.lit(t) for t in sorted(set(terms))])

    def _ok(i):
        win_sl = F.slice(toks, i, w)
        cond = F.array_contains(members, F.element_at(toks, i))
        for u, c in mult:
            cond = cond & (F.size(F.filter(win_sl, _eq(u))) >= c)
        return cond

    return _ok


def _near_anchor_cond_sql(toks_expr: str, terms: list[str], slop: int,
                          in_order: bool) -> str:
    """DuckDB twin of :func:`_near_anchor_cond` — a boolean expression
    over the anchor index ``i`` (the factored condition inside
    :func:`_span_tf_sql` / :func:`_phrase_tf_sql`)."""
    m = len(terms)
    q = _sql_quote
    if in_order:
        win = m - 1 + slop
        s = f"({toks_expr})[i + 1 : i + {win}]"
        chain = None
        for j in range(1, m):
            prev = f" AND i{j} > ({chain})" if chain is not None else ""
            chain = (
                f"list_min(list_filter(range(1, len({s}) + 1), "
                f"i{j} -> ({s})[i{j}] = {q(terms[j])}{prev}))"
            )
        return (
            f"(({toks_expr})[i] = {q(terms[0])} AND ({chain}) IS NOT NULL)"
        )
    w = m + slop
    members = ", ".join(q(t) for t in sorted(set(terms)))
    conds = [f"list_contains([{members}], ({toks_expr})[i])"]
    for u, c in sorted(Counter(terms).items()):
        conds.append(
            f"len(list_filter(({toks_expr})[i : i + {w} - 1], "
            f"x -> x = {q(u)})) >= {c}"
        )
    return "(" + " AND ".join(conds) + ")"


def span_containing_topk(
    docs: DataFrame,
    big_terms: list[str],
    little: str,
    k: int = 10,
    *,
    slop: int = 0,
    in_order: bool = False,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    analyzer: str = "ascii",
) -> DataFrame:
    """Exhaustive span_containing top-k: big span_near anchors whose
    window also holds ``little`` (pinned spec above)."""
    big_terms = _validate_clauses(big_terms, analyzer)
    little = _validate_term(little, analyzer)
    m = len(big_terms)
    w = m + slop
    base = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        tokens_col(text_col, analyzer).alias("toks"),
    )
    toks = F.col("toks")
    big_ok = _near_anchor_cond(toks, big_terms, slop, in_order)

    def _ok(i):
        has_little = (
            F.size(F.filter(F.slice(toks, i, w), _eq(little))) >= 1
        )
        return big_ok(i) & has_little

    starts = F.sequence(F.lit(1), F.size(toks))
    tf = F.when(
        F.size(toks) >= m, F.size(F.filter(starts, _ok))
    ).otherwise(F.lit(0))
    stats = base.select(
        "doc_id", F.size("toks").alias("dl"), tf.alias("tf")
    )
    return _span_bm25_topk(stats, k, k1, b)


def span_containing_sql(
    big_terms: list[str],
    little: str,
    k: int = 10,
    *,
    slop: int = 0,
    in_order: bool = False,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    analyzer: str = "ascii",
) -> str:
    """DuckDB twin of :func:`span_containing_topk`."""
    big_terms = _validate_clauses(big_terms, analyzer)
    little = _validate_term(little, analyzer)
    m = len(big_terms)
    w = m + slop
    big = _near_anchor_cond_sql("tl", big_terms, slop, in_order)
    cond = (
        f"{big} AND len(list_filter((tl)[i : i + {w} - 1], "
        f"x -> x = {_sql_quote(little)})) >= 1"
    )
    stf = (
        f"CASE WHEN len(tl) >= {m} THEN "
        f"len(list_filter(range(1, len(tl) + 1), i -> {cond})) ELSE 0 END"
    )
    return _span_bm25_sql(stf, k, table, id_col, text_col, k1, b, analyzer)


def span_within_topk(
    docs: DataFrame,
    little: str,
    big_terms: list[str],
    k: int = 10,
    *,
    slop: int = 0,
    in_order: bool = False,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    analyzer: str = "ascii",
) -> DataFrame:
    """Exhaustive span_within top-k: ``little`` occurrences covered by
    some valid big span_near anchor window (pinned spec above)."""
    big_terms = _validate_clauses(big_terms, analyzer)
    little = _validate_term(little, analyzer)
    m = len(big_terms)
    span_end = m - 1 + slop
    base = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        tokens_col(text_col, analyzer).alias("toks"),
    )
    toks = F.col("toks")
    big_ok = _near_anchor_cond(toks, big_terms, slop, in_order)

    def _covered(q):
        lo = F.greatest(F.lit(1), q - span_end)
        anchors = F.sequence(lo, q)
        return F.exists(anchors, big_ok)

    def _is_little_at(i):
        return (F.element_at(toks, i) == F.lit(little)) & _covered(i)

    starts = F.sequence(F.lit(1), F.size(toks))
    tf = F.when(
        F.size(toks) >= m, F.size(F.filter(starts, _is_little_at))
    ).otherwise(F.lit(0))
    stats = base.select(
        "doc_id", F.size("toks").alias("dl"), tf.alias("tf")
    )
    return _span_bm25_topk(stats, k, k1, b)


def span_within_sql(
    little: str,
    big_terms: list[str],
    k: int = 10,
    *,
    slop: int = 0,
    in_order: bool = False,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    analyzer: str = "ascii",
) -> str:
    """DuckDB twin of :func:`span_within_topk`."""
    big_terms = _validate_clauses(big_terms, analyzer)
    little = _validate_term(little, analyzer)
    m = len(big_terms)
    span_end = m - 1 + slop
    big = _near_anchor_cond_sql("tl", big_terms, slop, in_order)
    covered = (
        f"len(list_filter(range(greatest(1, iq - {span_end}), iq + 1), "
        f"i -> {big})) >= 1"
    )
    cond = f"(tl)[iq] = {_sql_quote(little)} AND {covered}"
    stf = (
        f"CASE WHEN len(tl) >= {m} THEN "
        f"len(list_filter(range(1, len(tl) + 1), iq -> {cond})) ELSE 0 END"
    )
    return _span_bm25_sql(stf, k, table, id_col, text_col, k1, b, analyzer)


# ---------------------------------------------------------------------------
# span_multi — a multi-term query (wildcard) as a span clause inside
# span_near (Lucene SpanMultiTermQueryWrapper).  Pinned form:
# span_near([span_multi(wildcard(pattern)), span_term(term)],
# slop, in_order=False) — the wildcard rewrites through the vocabulary
# (dictionary order, capped, the MultiTermQuery rewrite the wildcard
# query already pins) into a slot of alternatives, and the pair then
# IS the intervals unordered rule with slots [expansions, {term}]
# (`query/intervals.py`), which this delegates to.  ``term`` is
# excluded from its own expansion set (slot disjointness).
# ---------------------------------------------------------------------------

def span_multi_near_topk(
    docs: DataFrame,
    pattern: str,
    term: str,
    k: int = 10,
    *,
    slop: int = 0,
    max_expansions: int = 128,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    analyzer: str = "ascii",
) -> DataFrame:
    """Exhaustive span_multi-in-near top-k (pinned spec above)."""
    from sparksearch.query.intervals import intervals_topk
    from sparksearch.query.termq import _expand_wildcard_exhaustive

    term = _validate_term(term, analyzer)
    exp = [
        t
        for t in _expand_wildcard_exhaustive(
            docs, pattern, max_expansions, text_col, analyzer
        )
        if t != term
    ]
    if not exp:
        return docs.sparkSession.createDataFrame(
            [], "doc_id long, score double"
        )
    return intervals_topk(
        docs, [exp, [term]], k, max_gaps=slop, ordered=False,
        id_col=id_col, text_col=text_col, k1=k1, b=b, analyzer=analyzer,
    )


def span_multi_near_sql(
    pattern: str,
    term: str,
    k: int = 10,
    *,
    slop: int = 0,
    max_expansions: int = 128,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    analyzer: str = "ascii",
) -> str:
    """DuckDB twin of :func:`span_multi_near_topk` — the expansion runs
    IN SQL (vocabulary CTE + regex, dictionary order, same cap), so the
    oracle is self-contained; the tf is the intervals unordered rule
    with the expanded slot read from the CTE's list."""
    from sparksearch.analyze import duckdb_tokens_expr
    from sparksearch.query.termq import wildcard_regex

    term = _validate_term(term, analyzer)
    qt = _sql_quote(term)
    rx = wildcard_regex(pattern).replace("'", "''")
    toks = duckdb_tokens_expr(text_col, analyzer)
    w = 2 + slop
    cond = (
        f"(list_contains(el.ts, (tl)[i]) OR (tl)[i] = {qt}) "
        f"AND len(list_filter((tl)[i : i + {w} - 1], "
        f"x -> list_contains(el.ts, x))) >= 1 "
        f"AND len(list_filter((tl)[i : i + {w} - 1], x -> x = {qt})) >= 1"
    )
    stf = (
        f"CASE WHEN len(tl) >= 2 THEN "
        f"len(list_filter(range(1, len(tl) + 1), i -> {cond})) ELSE 0 END"
    )
    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id, {toks} AS tl
  FROM {table} WHERE {text_col} IS NOT NULL
),
vocab AS (SELECT DISTINCT u.t AS term FROM base, unnest(tl) AS u(t)),
exp AS (
  SELECT term FROM vocab
  WHERE regexp_matches(term, '{rx}') AND term <> {qt}
  ORDER BY term LIMIT {max_expansions}
),
el AS (SELECT coalesce(list(term), []) AS ts FROM exp),
stats AS (
  SELECT doc_id, len(tl) AS dl, {stf} AS tf FROM base, el
),
corp AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM stats),
hits AS (SELECT * FROM stats WHERE tf > 0),
dfs AS (SELECT count(*)::DOUBLE AS df FROM hits)
SELECT doc_id,
       round( ln(1.0 + (corp.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
              * tf / (tf + {k1} * (1.0 - {b} + {b} * dl / corp.avgdl)),
              {SCORE_ROUND}) AS score
FROM hits CROSS JOIN dfs CROSS JOIN corp
ORDER BY ln(1.0 + (corp.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
         * tf / (tf + {k1} * (1.0 - {b} + {b} * dl / corp.avgdl)) DESC,
         doc_id ASC
LIMIT {k}
""".strip()


def span_multi_near_search(
    index, pattern: str, term: str, k: int = 10, *, slop: int = 0,
    max_expansions: int = 128,
) -> DataFrame:
    """Engine path: lexicon rewrite (prefix-range-pruned) → the
    intervals positional path with the expanded slot.  Requires the
    lexicon and positions sidecars.  Rank-identical to the exhaustive
    path when the lexicon covers the corpus vocabulary (pytest)."""
    from pyspark.sql import functions as _F

    from sparksearch.index.lexicon import read_lexicon
    from sparksearch.query.intervals import intervals_positional
    from sparksearch.query.termq import _literal_prefix, wildcard_regex

    analyzer = index.meta.get("analyzer", "ascii")
    term = _validate_term(term, analyzer)
    rx = wildcard_regex(pattern)
    lx = read_lexicon(index.spark, index.index_dir)
    head = _literal_prefix(pattern)
    if head:
        lx = lx.filter(
            (_F.col("term") >= head) & (_F.col("term") < head + "￿")
        )
    rows = (
        lx.filter(_F.col("term").rlike(rx))
        .orderBy("term")
        .limit(max_expansions)
        .collect()
    )
    exp = [r["term"] for r in rows if r["term"] != term]
    if not exp:
        return index.spark.createDataFrame([], "doc_id long, score double")
    return intervals_positional(
        index, [exp, [term]], k, max_gaps=slop, ordered=False
    )
