"""Positional postings sidecar + index-resident phrase verification.

Lucene stores term POSITIONS in the postings (the text-field default,
``IndexOptions.DOCS_AND_FREQS_AND_POSITIONS``), so the ``match_phrase``
queries the reference delegates to OpenSearch
(`keyword_search/functions/helper_functions.py` issues `_search` bodies;
phrase semantics are Lucene `PhraseQuery`) verify adjacency from the
index alone — they never re-read document text.  sparksearch's default
indexed phrase path (`query.phrase.match_phrase_indexed`) verifies on
the candidate docs' re-analyzed text instead: correct, but at 100 TB a
head-term conjunction makes the verification read corpus-proportional
TEXT.  This sidecar restores Lucene's answer: store positions once at
build time, verify phrases against position lists that are orders of
magnitude smaller than the text.

Layout (opt-in, like the lexicon):

    positions/term_bucket=<b>/*.parquet
        (term_id long, doc_id long, dl int, positions array<int>)

``term_bucket = pmod(term_id, n_buckets)`` — the SAME routing as
postings/stats, so a phrase query's scan prunes to the query terms'
buckets (PartitionFilters) and the ``term_id IN`` predicate pushes into
parquet row-group stats (rows are term_id-sorted within files).

Build is row-local, exactly the stage-A shape (`build._tf_rows`): sort
each document's ``(token_hash, position)`` PAIRS, run-length split —
the per-(doc, term) position lists fall out of the runs in ascending
order.  NO corpus-wide exchange; the hive-partitioned write is the only
shuffle-like step, and it is a write-side fan-out, not a groupBy.

Query (`match_phrase_positional`): a phrase's matches are

    tf(d) = | pos(t0) ∩ (pos(t1) − 1) ∩ ... ∩ (pos(t_{m-1}) − (m−1)) |

— ``array_intersect`` over shifted position arrays, pure whole-stage
codegen (positions are distinct within a list, so the set-intersect IS
the start-position count, overlaps included).  Conjunction docs come
from the m-way inner join on doc_id — no separate postings decode
needed.  Scoring/tie-break/rounding mirror ``match_phrase_topk``
exactly, so results are rank-identical to the exhaustive path (pinned
in tests/test_positions.py; driver gate `phrase_positional` runs the
engine against the exhaustive DuckDB oracle).

Staleness: ``meta.positions_gen`` stamps the generation the sidecar was
built at; every mutation bumps ``meta.gen``, so a stale sidecar is
detected on first use and refused with a rebuild hint (positions are
derived data — rebuild is always safe).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparksearch.analyze import tokens_col
from sparksearch.index import manifest as mf
from sparksearch.query.bm25 import SCORE_ROUND


def positions_path(index_dir: str) -> str:
    return os.path.join(index_dir, "positions")


def build_positions(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """One analysis pass over ``docs`` → ``positions/`` sidecar.

    ``docs`` must be the same corpus (and the index meta's analyzer is
    always used) so positions agree with the packed postings.  Single-
    field indexes only — the reference's phrase queries target one text
    field; a multi-field sidecar would salt term ids per namespace.
    """
    meta = mf.read_meta(index_dir)
    analyzer = meta.get("analyzer", "ascii")
    n_buckets = int(meta["n_buckets"])
    base = (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).cast("long").alias("doc_id"),
            tokens_col(text_col, analyzer).alias("toks"),
        )
        .filter(F.size("toks") > 0)  # zero-token docs hold no positions
        .select(
            "doc_id",
            F.size("toks").alias("dl"),
            # sort (hash, position) PAIRS: runs are per-term with
            # ascending positions — same row-local RLE as stage A
            F.array_sort(
                F.zip_with(
                    F.transform("toks", lambda t: F.xxhash64(t)),
                    F.sequence(F.lit(0), F.size("toks") - 1),
                    lambda h, p: F.struct(h.alias("h"), p.alias("p")),
                )
            ).alias("zp"),
        )
    )
    with_runs = base.select(
        "doc_id",
        "dl",
        "zp",
        F.transform("zp", lambda z: z["h"]).alias("srt"),
    ).select(
        "doc_id",
        "dl",
        "zp",
        "srt",
        F.filter(
            F.sequence(F.lit(0), F.col("dl") - 1),
            lambda i: (i == F.lit(0))
            | (F.get("srt", i) != F.get("srt", i - 1)),
        ).alias("starts"),
    )
    rows = (
        with_runs.select(
            "doc_id",
            "dl",
            F.explode(
                F.transform(
                    "starts",
                    lambda s, j: F.struct(
                        F.get("srt", s).alias("term_id"),
                        F.transform(
                            F.slice(
                                "zp",
                                s + 1,
                                F.coalesce(F.get("starts", j + 1), F.col("dl"))
                                - s,
                            ),
                            lambda z: z["p"],
                        ).alias("positions"),
                    ),
                )
            ).alias("e"),
        )
        .select(
            F.col("e.term_id").alias("term_id"),
            "doc_id",
            "dl",
            F.col("e.positions").cast("array<int>").alias("positions"),
            F.pmod(F.col("e.term_id"), F.lit(n_buckets)).alias("term_bucket"),
        )
        # bucket-then-term sort within tasks ⇒ each written file is
        # term_id-sorted ⇒ parquet row-group min/max prune term_id IN
        .sortWithinPartitions("term_bucket", "term_id")
    )
    out = positions_path(index_dir)
    rows.write.mode("overwrite").partitionBy("term_bucket").parquet(out)
    meta = mf.read_meta(index_dir)  # re-read: build may run concurrently
    meta["has_positions"] = True
    meta["positions_gen"] = int(meta.get("gen", 0))
    mf.write_meta(index_dir, meta)


def _positions_frame(index) -> DataFrame:
    """The sidecar as a DataFrame, staleness-checked."""
    meta = index.meta
    if not meta.get("has_positions"):
        raise ValueError(
            f"index at {index.index_dir} has no positions sidecar — "
            "run build_positions(spark, docs, index_dir) first"
        )
    if int(meta.get("positions_gen", -1)) != int(meta.get("gen", 0)):
        raise ValueError(
            "positions sidecar is stale (built at gen "
            f"{meta.get('positions_gen')}, index is at gen "
            f"{meta.get('gen', 0)}) — rebuild with build_positions()"
        )
    return index.spark.read.parquet(positions_path(index.index_dir))


def phrase_scores_all(index, terms: list[str], slop: int = 0) -> DataFrame:
    """(doc_id, raw) for EVERY doc matching the phrase ``terms`` — the
    full match set a bool conjunction needs, unrounded and unsorted.
    Same tf semantics / BM25 globals as :func:`match_phrase_positional`
    (which is the top-k over this frame).  Verification reads position
    lists only, never document text.

    ``slop>0`` applies the pinned ordered-window rule
    (``query.phrase.phrase_tf_col``): tf = anchors p in pos(t0) whose
    greedy chain q_j = min{q ∈ pos(t_j) : q > q_{j-1}} ends within
    p + m-1+slop.  Greedy minimizes the chain end, so the existence
    test is exact; positions are ascending and duplicate-free per
    (doc, term), making the per-anchor filters cheap."""
    index._refresh_if_stale()
    meta = index.meta
    spark = index.spark
    empty = spark.createDataFrame([], "doc_id long, raw double")
    if not terms:
        return empty
    distinct = sorted(set(terms))
    by_term = index._term_ids_for(distinct)
    if len(by_term) < len(distinct):
        return empty  # an OOV conjunct: no doc can hold the phrase
    pos = _positions_frame(index)
    n_buckets = int(meta["n_buckets"])
    buckets = sorted({tid % n_buckets for tid in by_term.values()})
    pos = pos.filter(F.col("term_bucket").isin(buckets)).filter(
        F.col("term_id").isin(sorted(set(by_term.values())))
    )
    legs = []
    for i, t in enumerate(terms):
        leg = pos.filter(F.col("term_id") == by_term[t]).select(
            "doc_id",
            *(["dl"] if i == 0 else []),
            F.col("positions").alias(f"p{i}"),
        )
        legs.append(leg)
    joined = legs[0]
    for leg in legs[1:]:
        joined = joined.join(leg, "doc_id")
    def _shift(offset: int):
        # NB: a two-parameter lambda would be read by PySpark as the
        # (element, index) form of transform — bind the offset via a
        # closure, never a default argument
        return lambda x: x - F.lit(offset)

    m = len(terms)
    if slop == 0 or m == 1:
        acc = F.col("p0")
        for i in range(1, m):
            acc = F.array_intersect(acc, F.transform(f"p{i}", _shift(i)))
        tf_col = F.size(acc)
    else:
        # sloppy: greedy earliest-successor chain per anchor, existence
        # iff the greedy chain's end fits in the anchor's window
        def _next_after(j: int, prev):
            def gt(q):
                return q > prev

            return F.array_min(F.filter(F.col(f"p{j}"), gt))

        def _anchor_ok(p):
            acc = p
            for j in range(1, m):
                acc = _next_after(j, acc)
            return F.coalesce(acc - p <= m - 1 + slop, F.lit(False))

        tf_col = F.size(F.filter(F.col("p0"), _anchor_ok))
    tf = (
        joined.select("doc_id", "dl", tf_col.alias("tf"))
        .filter(F.col("tf") > 0)
        # df aggregate + scoring both read this; same persist rationale
        # as match_phrase_indexed (verified rows only — tiny)
        .persist()
    )
    df_ = tf.agg(F.count(F.lit(1)).alias("df"))
    k1, b = meta["k1"], meta["b"]
    n_docs, avgdl = meta["n_docs"], meta["avgdl"]
    idf = F.log(1.0 + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tfn = F.col("tf") / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
    )
    return tf.crossJoin(F.broadcast(df_)).select(
        "doc_id", (idf * tfn).alias("raw")
    )


def match_phrase_positional(
    index, phrase: str, k: int = 10, *, slop: int = 0
) -> DataFrame:
    """Phrase top-k from the positions sidecar alone — no corpus read.

    Rank-identical to ``query.phrase.match_phrase_topk`` (same tf
    semantics: start positions, overlaps counted; same BM25 globals
    from meta; same rounding/tie-break).  The plan reads m bucket-pruned
    parquet slices (one per phrase term, term_id row-group-pruned),
    inner-joins them on doc_id (the conjunction), and counts adjacency
    via ``array_intersect`` of shifted position arrays — verification
    touches position lists only, never document text.
    """
    scored = phrase_scores_all(index, index._tokenize(phrase), slop)
    return (
        scored.orderBy(F.desc("raw"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", F.round("raw", SCORE_ROUND).alias("score"))
    )


def match_phrase_prefix_positional(
    index, phrase: str, k: int = 10, *, max_expansions: int | None = None
) -> DataFrame:
    """match_phrase_prefix from the positions + lexicon sidecars alone.

    The last analyzed term expands through the term dictionary
    (dictionary order, capped — Lucene MatchPhrasePrefixQuery) and its
    expansions' position lists are flattened per doc (distinct terms
    can never share a position, so the flatten IS the union); adjacency
    then counts exactly like :func:`match_phrase_positional`.
    Rank-identical to ``query.phrase.match_phrase_prefix_topk``
    (pytest) — no corpus read.
    """
    from sparksearch.index.lexicon import MAX_EXPANSIONS, expand_prefix
    from sparksearch.hashing import term_id_of

    if max_expansions is None:
        max_expansions = MAX_EXPANSIONS
    index._refresh_if_stale()
    meta = index.meta
    spark = index.spark
    empty = spark.createDataFrame([], "doc_id long, score double")
    terms = index._tokenize(phrase)
    if not terms:
        return empty
    firsts, pre = terms[:-1], terms[-1]
    expansions = expand_prefix(spark, index.index_dir, pre, max_expansions)
    if not expansions:
        return empty
    if firsts:
        by_term = index._term_ids_for(sorted(set(firsts)))
        if len(by_term) < len(set(firsts)):
            return empty  # an OOV leading conjunct
    else:
        by_term = {}
    exp_ids = sorted({term_id_of(t) for t in expansions})
    pos = _positions_frame(index)
    n_buckets = int(meta["n_buckets"])
    all_ids = sorted(set(by_term.values()) | set(exp_ids))
    buckets = sorted({tid % n_buckets for tid in all_ids})
    pos = pos.filter(F.col("term_bucket").isin(buckets)).filter(
        F.col("term_id").isin(all_ids)
    )
    m = len(terms)
    legs = []
    for i, t in enumerate(firsts):
        legs.append(
            pos.filter(F.col("term_id") == by_term[t]).select(
                "doc_id",
                *(["dl"] if i == 0 else []),
                F.col("positions").alias(f"p{i}"),
            )
        )
    # expansion leg: flatten per doc — positions of distinct terms are
    # disjoint, so no dedup is needed and the flat count IS the tf
    last = (
        pos.filter(F.col("term_id").isin(exp_ids))
        .groupBy("doc_id")
        .agg(
            F.first("dl").alias("dl_last"),
            F.flatten(F.collect_list("positions")).alias(f"p{m - 1}"),
        )
    )
    legs.append(last)
    joined = legs[0]
    for leg in legs[1:]:
        joined = joined.join(leg, "doc_id")
    dl_col = "dl" if firsts else "dl_last"

    def _shift(offset: int):
        return lambda x: x - F.lit(offset)

    if m == 1:
        tf_expr = F.size(F.col("p0"))
    else:
        acc = F.col("p0")
        for i in range(1, m):
            acc = F.array_intersect(acc, F.transform(f"p{i}", _shift(i)))
        tf_expr = F.size(acc)
    tf = (
        joined.select(
            "doc_id", F.col(dl_col).alias("dl"), tf_expr.alias("tf")
        )
        .filter(F.col("tf") > 0)
        .persist()
    )
    df_ = tf.agg(F.count(F.lit(1)).alias("df"))
    k1, b = meta["k1"], meta["b"]
    n_docs, avgdl = meta["n_docs"], meta["avgdl"]
    idf = F.log(1.0 + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tfn = F.col("tf") / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
    )
    scored = tf.crossJoin(F.broadcast(df_)).select(
        "doc_id", (idf * tfn).alias("raw")
    )
    return (
        scored.orderBy(F.desc("raw"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", F.round("raw", SCORE_ROUND).alias("score"))
    )


# Driver-path phrase budget: positions volume (Σ collection-frequency
# of the phrase terms) the coordinator is willing to read directly —
# the phrase twin of InvertedIndex.driver_path_max_postings.
PHRASE_LOCAL_MAX_POSITIONS = 5_000_000


def _round_half_up4(x: float) -> float:
    """Spark's round(col, 4) on doubles: BigDecimal.valueOf (shortest
    decimal repr — Python's repr agrees) then HALF_UP at scale 4."""
    import decimal

    return float(
        decimal.Decimal(repr(float(x))).quantize(
            decimal.Decimal("0.0001"), rounding=decimal.ROUND_HALF_UP
        )
    )


def phrase_local(
    index,
    phrase: str,
    k: int = 10,
    *,
    max_positions: int = PHRASE_LOCAL_MAX_POSITIONS,
):
    """Driver-native positional phrase: pandas out, NO Spark job on the
    common path — the phrase twin of ``InvertedIndex.search_local``.

    The coordinator pyarrow-reads the phrase terms' bucket-pruned
    position rows (term_id predicate pushes into row-group stats) and
    verifies adjacency with one vectorized key-intersect over
    ``(doc_index << 32) | position`` int64 keys — no per-doc Python
    loop.  Result rows/scores are identical to
    :func:`match_phrase_positional` (pinned in tests): same tf/df
    semantics, same BM25 globals, same HALF_UP 4-dp rounding, same
    (score desc, doc_id asc) order.  Phrases whose positions volume
    (Σ cf of the terms, from the stats sidecar) exceeds
    ``max_positions`` transparently run the Spark plan and collect.
    """
    import numpy as np
    import pandas as pd
    import pyarrow.dataset as pds

    index._refresh_if_stale()
    meta = index.meta
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "score": pd.Series([], dtype="float64")})
    terms = index._tokenize(phrase)
    if not terms:
        return empty
    distinct = sorted(set(terms))
    by_term = index._term_ids_for(distinct)
    if len(by_term) < len(distinct):
        return empty
    _positions_frame(index)  # existence + staleness gate (cheap reader)
    n_buckets = int(meta["n_buckets"])
    tids = sorted(set(by_term.values()))
    buckets = sorted({t % n_buckets for t in tids})
    # budget from the stats sidecar: Σ cf == total positions to read
    sds = pds.dataset(
        os.path.join(index.index_dir, "stats"), partitioning="hive"
    )
    st = sds.to_table(
        filter=pds.field("term_bucket").isin(buckets)
        & pds.field("term_id").isin(tids),
        columns=["term_id", "cf"],
    )
    if int(st["cf"].to_pandas().sum()) > max_positions:
        return match_phrase_positional(index, phrase, k).toPandas()
    d = pds.dataset(positions_path(index.index_dir), partitioning="hive")
    tb = d.to_table(
        filter=pds.field("term_bucket").isin(buckets)
        & pds.field("term_id").isin(tids),
        columns=["term_id", "doc_id", "dl", "positions"],
    )
    tid_np = tb["term_id"].to_numpy()
    doc_np = tb["doc_id"].to_numpy()
    dl_np = tb["dl"].to_numpy()
    pos_col = tb.column("positions").combine_chunks()
    flat = pos_col.values.to_numpy().astype(np.int64, copy=False)
    offs = pos_col.offsets.to_numpy()
    lens = np.diff(offs)

    def leg(tid: int):
        """(sorted doc ids, flat (doc_row_index, pos) pairs) for a term."""
        mask = tid_np == tid
        rows = np.flatnonzero(mask)
        docs = doc_np[rows]
        order = np.argsort(docs, kind="quicksort")  # doc ids unique/term
        return docs[order], rows[order]

    tid_list = [by_term[t] for t in terms]
    docs0, rows0 = leg(tid_list[0])
    if len(docs0) == 0:
        return empty
    conj = docs0
    per_leg = [(docs0, rows0)]
    for tid in tid_list[1:]:
        dI, rI = leg(tid)
        per_leg.append((dI, rI))
        conj = np.intersect1d(conj, dI, assume_unique=True)
    if len(conj) == 0:
        return empty

    m = len(terms)

    def keys_for(docs_i, rows_i, shift: int):
        """int64 (conj_index << 32) + (position − shift + m) keys, conj
        docs only.  The +m bias keeps the low word non-negative for
        every shift in [0, m), so keys never wrap."""
        idx = np.searchsorted(conj, docs_i)
        ok = (idx < len(conj)) & (conj[np.minimum(idx, len(conj) - 1)] == docs_i)
        rows_c, idx_c = rows_i[ok], idx[ok]
        n_pos = lens[rows_c]
        didx = np.repeat(idx_c.astype(np.int64), n_pos)
        starts = offs[rows_c]
        # gather each row's positions without a Python loop
        take = np.repeat(starts, n_pos) + (
            np.arange(n_pos.sum()) - np.repeat(np.cumsum(n_pos) - n_pos, n_pos)
        )
        return (didx << 32) + (flat[take] - shift + m)

    if len(terms) == 1:
        mask = np.isin(docs0, conj)
        tf = lens[rows0[mask]].astype(np.int64)
        tf_docs = docs0[mask]
        dl = dl_np[rows0[mask]]
    else:
        acc = keys_for(*per_leg[0], 0)
        for i in range(1, len(terms)):
            acc = np.intersect1d(
                acc, keys_for(*per_leg[i], i), assume_unique=True
            )
        counts = np.bincount((acc >> 32).astype(np.int64), minlength=len(conj))
        hit = counts > 0
        tf = counts[hit]
        tf_docs = conj[hit]
        # dl from leg0 rows of the surviving docs
        idx0 = np.searchsorted(docs0, tf_docs)
        dl = dl_np[rows0[idx0]]
    if len(tf_docs) == 0:
        return empty
    df_ = len(tf_docs)
    k1, b = meta["k1"], meta["b"]
    n_docs, avgdl = meta["n_docs"], meta["avgdl"]
    idf = np.log(1.0 + (n_docs - df_ + 0.5) / (df_ + 0.5))
    raw = idf * (tf / (tf + k1 * (1.0 - b + b * dl / avgdl)))
    order = np.lexsort((tf_docs, -raw))[:k]
    return pd.DataFrame(
        {
            "doc_id": tf_docs[order],
            "score": [_round_half_up4(x) for x in raw[order]],
        }
    )
