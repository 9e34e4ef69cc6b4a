"""Analyzer (Q1): lowercase + tokenize — identical for documents and queries.

The reference delegates analysis to the OpenSearch/Lucene *standard*
analyzer (index mappings use ``"type": "text"`` with the default analyzer,
``keyword_search/functions/helper_functions.py:158-163``): word
segmentation + lowercase, no stopwords, no stemming.

Our pinned spec: tokens are maximal runs of ``[a-z0-9]`` over the
lowercased text.  This is deliberately expressible in three engines so the
same analysis runs everywhere:

* Spark (JVM, codegen — the hot path): ``split(lower(col), '[^a-z0-9]+')``
  with empties removed.  No Python at all.
* DuckDB (oracle):   ``regexp_split_to_array(lower(text),'[^a-z0-9]+')``.
* Python (tests):    ``re.split`` with the same pattern.

Scale note: the index build uses ``explode(tokens)`` followed by a
``groupBy(doc_id, term)`` — Spark's partial (map-side) hash aggregation
collapses the per-token rows to per-(doc, term) tf *before* the shuffle,
so shuffle volume is the number of distinct (doc, term) pairs, fully
inside whole-stage codegen.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_PATTERN = "[^a-z0-9]+"
_PY_SPLIT_RE = re.compile(TOKEN_SPLIT_PATTERN)

# DuckDB-side expression template for oracle SQL (keep in sync!)
DUCKDB_TOKENS_EXPR = (
    "list_filter(regexp_split_to_array(lower({col}), '[^a-z0-9]+'), t -> t <> '')"
)


def tokens_col(col: Column | str) -> Column:
    """array<string> of analyzed tokens — pure JVM expression."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_remove(F.split(F.lower(c), TOKEN_SPLIT_PATTERN), "")


def doc_length_col(col: Column | str) -> Column:
    """dl = post-analysis token count (BM25's document length)."""
    return F.size(tokens_col(col))


def tokenize_str(s: str) -> list[str]:
    """Pure-Python spec twin of ``tokens_col`` (tests/oracle)."""
    return [t for t in _PY_SPLIT_RE.split(s.lower()) if t]
