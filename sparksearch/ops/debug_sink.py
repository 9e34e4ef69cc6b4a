"""Debug sinks: file-per-article output (reference K2/T6).

Capability twin of ``keyword_search/functions/output_functions.py:46-90``
(``write_file``): each article is written as its own text file named by
its sanitized title (T6: ``' '→'_'``, ``'/'→'-'``,
``output_functions.py:81-84``), content = ``title\\ntext``.

This is a DEBUG sink — one file per document is an anti-pattern at any
real scale (a 100 TB corpus would create billions of tiny files and melt
the namenode/object-store listing).  It exists for parity and for
eyeballing extraction output on samples; the writes run executor-side
(``foreachPartition``), never through the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def filename_col(title_col: str | Column) -> Column:
    """T6: title → safe filename (space→underscore, slash→dash)."""
    c = F.col(title_col) if isinstance(title_col, str) else title_col
    return F.regexp_replace(F.regexp_replace(c, " ", "_"), "/", "-")


def write_article_files(
    docs: DataFrame,
    out_dir: str,
    title_col: str = "url",
    text_col: str = "text",
    max_docs: int = 10_000,
) -> None:
    """K2: write each doc to ``<out_dir>/<sanitized-title>`` as
    ``title\\ntext``.  Capped at ``max_docs`` (debug sink guard)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    rows = (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            filename_col(title_col).alias("fname"),
            F.col(title_col).alias("title"),
            F.col(text_col).alias("text"),
        )
        .limit(max_docs)
    )

    def write_partition(it):
        for r in it:
            # basename() guards against any residual path separators
            path = os.path.join(out_dir, os.path.basename(r["fname"]))
            with open(path, "w", encoding="utf-8") as f:
                f.write(f"{r['title']}\n{r['text']}")

    rows.foreachPartition(write_partition)
