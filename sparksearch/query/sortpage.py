"""Field sorting + ``search_after`` pagination for query hits.

OpenSearch hits can be ordered by document fields instead of ``_score``
(``sort: [{n_chars: "desc"}, {_id: "asc"}]``), and paged two ways:
``from``/``size`` (re-sorts and skips — deep pages re-do all the work)
or ``search_after`` (a cursor of the last hit's sort values — each page
is an independent top-k over only the rows strictly after the cursor,
the scalable form; OpenSearch requires a unique tiebreak field for it).
Semantics pinned here:

* sort spec = ordered ``(field, "asc"|"desc")`` pairs; a ``(id_col,
  "asc")`` tiebreak is implicitly appended when not present, making the
  order total (exactly the ``_id`` tiebreak OpenSearch documents);
* rows with a NULL in any sort field are EXCLUDED from sorted pages
  (pinned: Spark orders nulls first on asc, DuckDB last, and a null
  cursor value would make the strictly-after predicate vacuous —
  OpenSearch's ``missing: _first/_last`` handling is not pinned here);
* ``search_after`` = the full sort-key tuple of the last returned hit;
  the next page contains rows STRICTLY after it in sort order;
* the match set is the same OR-semantics ``match`` the aggregations
  use (``query/aggs.py``).

Scale shape: the cursor predicate is an OR-of-ANDs over plain column
comparisons — Catalyst pushes it into the parquet scan (row-group
min/max pruning on the leading sort field), and the page itself is a
``TakeOrderedAndProject`` (per-partition top-k, single k-row exchange,
never a global sort).  A ``from``-style deep offset cannot prune; this
is why search_after is the 100-TB pagination path.

The DuckDB twin proves the cursor algebra: the oracle renders the SAME
page via ``ORDER BY … OFFSET page*k LIMIT k`` — offset-pagination and
cursor-pagination must agree wherever the sort is total.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparksearch.query.aggs import _match_where_sql, match_set

SortSpec = list[tuple[str, str]]


def _full_sort(sort: SortSpec, id_col: str) -> SortSpec:
    out = [(f, d.lower()) for f, d in sort]
    for f, d in out:
        if d not in ("asc", "desc"):
            raise ValueError(f"sort direction {d!r} must be asc|desc")
    if id_col not in [f for f, _ in out]:
        out.append((id_col, "asc"))
    return out


def _after_predicate(sort: SortSpec, cursor: tuple) -> Column:
    """(row strictly after cursor) as an OR over first-divergence spots."""
    if len(cursor) != len(sort):
        raise ValueError(
            f"search_after cursor has {len(cursor)} values; sort has {len(sort)}"
        )
    pred = F.lit(False)
    for i, (field, direction) in enumerate(sort):
        strict = (
            F.col(field) > F.lit(cursor[i])
            if direction == "asc"
            else F.col(field) < F.lit(cursor[i])
        )
        for j in range(i):
            strict = strict & (F.col(sort[j][0]) == F.lit(cursor[j]))
        pred = pred | strict
    return pred


def sorted_hits(
    docs: DataFrame,
    query_text: str,
    sort: SortSpec,
    k: int = 10,
    *,
    search_after: tuple | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: str = "ascii",
) -> DataFrame:
    """One page of field-sorted hits → (doc_id, <sort fields>).

    ``search_after=None`` is the first page; pass the last row's sort
    values (in sort-spec order, tiebreak included) for the next one.
    """
    full = _full_sort(sort, id_col)
    m = match_set(docs, query_text, text_col=text_col, analyzer=analyzer)
    for f, _ in full:
        m = m.filter(F.col(f).isNotNull())
    if search_after is not None:
        m = m.filter(_after_predicate(full, tuple(search_after)))
    order = [
        F.col(f).asc() if d == "asc" else F.col(f).desc() for f, d in full
    ]
    cols = [F.col(id_col).cast("long").alias("doc_id")] + [
        F.col(f) for f, _ in full if f != id_col
    ]
    return m.orderBy(*order).limit(k).select(*cols)


def page_cursor(rows, sort: SortSpec, id_col: str = "doc_id") -> tuple:
    """Cursor for the page after ``rows`` (collected output of
    :func:`sorted_hits`): the LAST row's full sort-key tuple."""
    full = _full_sort(sort, id_col)
    last = rows[-1]
    return tuple(
        last["doc_id"] if f == id_col else last[f] for f, _ in full
    )


def sorted_hits_sql(
    query_text: str,
    sort: SortSpec,
    k: int = 10,
    *,
    page: int = 0,
    table: str = "documents",
    id_col: str = "doc_id",
    analyzer: str = "ascii",
) -> str:
    """DuckDB twin via OFFSET — page ``p`` of the total order equals the
    cursor-paged page ``p`` (the equivalence the gate checks)."""
    full = _full_sort(sort, id_col)
    order = ", ".join(f"{f} {d.upper()}" for f, d in full)
    notnull = " AND ".join(f"{f} IS NOT NULL" for f, _ in full)
    cols = ", ".join(
        [f"CAST({id_col} AS BIGINT) AS doc_id"]
        + [f for f, _ in full if f != id_col]
    )
    return f"""
SELECT {cols} FROM {table}
WHERE {_match_where_sql(query_text, analyzer)} AND {notnull}
ORDER BY {order} OFFSET {page * k} LIMIT {k}
""".strip()
