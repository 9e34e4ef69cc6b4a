"""Document APIs: ``_mget`` (multi-get) and the ``pinned`` query.

The reference drives OpenSearch through its document APIs alongside
`_search` (`keyword_search/functions/output_functions.py` writes via
the bulk API; reads are the `_doc`/`_mget` mirror of that surface).

* ``_mget`` — fetch documents by id, one output row PER REQUESTED ID
  in REQUEST ORDER (`found=false` rows carry null source columns —
  OpenSearch returns every requested id with a found flag).  The
  request-order pin rides an explicit ``req_order`` column (the
  engines' row order is otherwise undefined).  Scale: the id list
  pushes down to the corpus scan as an ``In`` filter (parquet
  row-group pruning) and the ≤N found rows broadcast back into the
  request frame — one pruned scan, zero exchanges, never a
  driver-side loop.  (Broadcasting the LEFT side of a left outer
  join is silently unsupported in Spark — `HintErrorLogger` drops
  the hint and the plan degrades to a corpus-wide sort-merge
  shuffle — so the broadcast side is the found set, the supported
  build-right shape.)
* ``pinned`` query — promoted ids first (request order), then the
  organic query's BM25 ranking with pinned ids excluded
  (OpenSearch/Lucene PinnedQueryBuilder).  Pinned ids missing from
  the corpus are skipped (Lucene drops non-existent pins).  Output
  (rank, doc_id, score, pinned): organic scores are the BM25 pin
  (4 dp); pinned rows score null→0.0 pinned-flagged (OpenSearch emits
  synthetic descending giants — a float ladder that cannot pin
  cross-engine; the flag + rank carry the same information).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparksearch.query.bm25 import SCORE_ROUND, bm25_scores_cte, bm25_scores_df


def mget(
    docs: DataFrame,
    ids: list[int],
    *,
    id_col: str = "doc_id",
    cols: tuple = ("text",),
) -> DataFrame:
    """``_mget`` → (req_order, doc_id, found, *cols) in request order."""
    if not ids:
        raise ValueError("_mget needs at least one id")
    if len(set(ids)) != len(ids):
        raise ValueError("_mget ids must be unique")
    spark = docs.sparkSession
    req = spark.createDataFrame(
        [(i, int(d)) for i, d in enumerate(ids)],
        "req_order int, doc_id long",
    )
    # Pushed-down point lookup: isin() reaches the parquet scan as an
    # In filter (row-group pruning), leaving ≤N found rows — small
    # enough to broadcast into the request frame.  Build-right of a
    # left outer join is a supported broadcast shape; build-left
    # (broadcast(req) on the left) is not, and silently falls back to
    # a full-corpus sort-merge shuffle.
    found_src = (
        docs.filter(F.col(id_col).isin([int(d) for d in ids]))
        .select(
            F.col(id_col).alias("doc_id"),
            F.lit(True).alias("found"),
            *[F.col(c) for c in cols],
        )
    )
    return (
        req
        .join(F.broadcast(found_src), "doc_id", "left")
        .select(
            "req_order",
            "doc_id",
            F.coalesce(F.col("found"), F.lit(False)).alias("found"),
            *cols,
        )
        .orderBy("req_order")
    )


def mget_sql(
    ids: list[int],
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    cols: tuple = ("text",),
) -> str:
    """DuckDB twin of :func:`mget`."""
    if not ids:
        raise ValueError("_mget needs at least one id")
    if len(set(ids)) != len(ids):
        raise ValueError("_mget ids must be unique")
    vals = ", ".join(f"({i}, {int(d)})" for i, d in enumerate(ids))
    collist = ", ".join(f"d.{c}" for c in cols)
    return f"""
WITH req(req_order, doc_id) AS (VALUES {vals})
SELECT req.req_order, req.doc_id,
       (d.{id_col} IS NOT NULL) AS found, {collist}
FROM req LEFT JOIN {table} d ON d.{id_col} = req.doc_id
ORDER BY req.req_order
""".strip()


def pinned_topk(
    docs: DataFrame,
    pinned_ids: list[int],
    query_text: str,
    k: int = 10,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    analyzer: str = "ascii",
) -> DataFrame:
    """Pinned query top-k → (rank, doc_id, score, pinned); spec in the
    module docstring."""
    if not pinned_ids:
        raise ValueError("pinned query needs at least one pinned id")
    if len(set(pinned_ids)) != len(pinned_ids):
        raise ValueError("pinned ids must be unique")
    spark = docs.sparkSession
    pins = spark.createDataFrame(
        [(i, int(d)) for i, d in enumerate(pinned_ids)],
        "pin_order int, doc_id long",
    )
    # existing pins only (Lucene drops non-existent ids), pin order
    existing = (
        F.broadcast(pins)
        .join(docs.select(F.col(id_col).alias("doc_id")), "doc_id")
        .select(
            "pin_order",
            "doc_id",
            F.lit(0.0).alias("score"),
            F.lit(True).alias("pinned"),
        )
    )
    scored = bm25_scores_df(
        docs, query_text, text_col=text_col, analyzer=analyzer, k1=k1, b=b
    )
    organic = (
        scored.join(F.broadcast(pins.select("doc_id")), "doc_id", "left_anti")
        # the engine's BM25 tie rule: UNROUNDED raw desc, doc_id asc
        # (bm25_topk_df's pin — rounding before the cut can flip
        # near-ties)
        .orderBy(F.desc("raw"), F.asc("doc_id"))
        .limit(k)
        .select(
            F.lit(None).cast("int").alias("pin_order"),
            "doc_id",
            F.round("raw", SCORE_ROUND).alias("score"),
            F.col("raw").alias("_raw"),
            F.lit(False).alias("pinned"),
        )
    )
    unioned = existing.withColumn(
        "_raw", F.lit(None).cast("double")
    ).unionByName(organic)
    w = Window.orderBy(
        F.desc("pinned"),
        F.asc_nulls_last("pin_order"),
        F.desc_nulls_last("_raw"),
        F.asc("doc_id"),
    )
    return (
        unioned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("rank", "doc_id", "score", "pinned")
        .orderBy("rank")
    )


def pinned_sql(
    pinned_ids: list[int],
    query_text: str,
    k: int = 10,
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    analyzer: str = "ascii",
) -> str:
    """DuckDB twin of :func:`pinned_topk`."""
    if not pinned_ids:
        raise ValueError("pinned query needs at least one pinned id")
    if len(set(pinned_ids)) != len(pinned_ids):
        raise ValueError("pinned ids must be unique")
    vals = ", ".join(f"({i}, {int(d)})" for i, d in enumerate(pinned_ids))
    cte = bm25_scores_cte(
        query_text, table=table, id_col=id_col, text_col=text_col,
        k1=k1, b=b, analyzer=analyzer,
    )
    return f"""
WITH {cte},
pins(pin_order, doc_id) AS (VALUES {vals}),
existing AS (
  SELECT p.pin_order, p.doc_id, 0.0 AS score, TRUE AS pinned
  FROM pins p JOIN {table} d ON d.{id_col} = p.doc_id
),
organic AS (
  SELECT CAST(NULL AS INT) AS pin_order, doc_id,
         round(raw, {SCORE_ROUND}) AS score, raw AS _raw, FALSE AS pinned
  FROM scored WHERE doc_id NOT IN (SELECT doc_id FROM pins)
  ORDER BY raw DESC, doc_id ASC LIMIT {k}
),
unioned AS (
  SELECT pin_order, doc_id, score, CAST(NULL AS DOUBLE) AS _raw, pinned
  FROM existing
  UNION ALL SELECT * FROM organic)
SELECT row_number() OVER (
         ORDER BY pinned DESC, pin_order ASC NULLS LAST,
                  _raw DESC NULLS LAST, doc_id ASC) AS rank,
       doc_id, score, pinned
FROM unioned
QUALIFY rank <= {k}
ORDER BY rank
""".strip()
