"""Markup → plain-text extraction as Arrow-vectorized pandas UDFs.

The reference strips wiki markup with ``mwparserfromhell.strip_code``
(``semantic_search/functions/wikipedia_extractor.py:197-204``) and then
runs its cleaning chain.  Our canonical input is Common-Crawl-style HTML
(``html: binary``), so the markup stripper here is an HTML-analog with a
*pinned, deterministic* spec (pure regex + stdlib entity unescape); the
post-markup chain reproduces the reference byte-for-byte (see
``sparksearch.cleaning``).

Pipeline order matches the reference's semantic generation:
strip markup → trim tail sections → line cleanup → symbol fixes →
newline fixes (T1→T2→T5→T3→T4 in SURVEY §2.3 numbering).

Everything is exposed two ways:

* pure functions (``extract_text_str``) — the spec, used by tests;
* pandas UDFs (``extract_text_udf``) — the engine path, vectorized with
  ``pandas.Series.str`` ops (C-backed) per Arrow batch; no Spark-level
  per-row Python.
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sparksearch.cleaning import (
    LINE_DROP_SUBSTRINGS,
    NEWLINE_RULES,
    SYMBOL_RULES,
    clean_lines,
    clean_text,
    trim_sections,
)

# --- HTML stripping spec (deterministic; applied before the clean chain) ---

_RE_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
_RE_SCRIPT = re.compile(r"<script\b.*?</script\s*>", re.DOTALL | re.IGNORECASE)
_RE_STYLE = re.compile(r"<style\b.*?</style\s*>", re.DOTALL | re.IGNORECASE)
_RE_BLOCK_CLOSE = re.compile(
    r"<(?:br\s*/?|/(?:p|div|h[1-6]|li|tr|table|ul|ol|section|article|blockquote))\s*>",
    re.IGNORECASE,
)
_RE_TAG = re.compile(r"<[^>]*>")


def strip_html_str(raw: bytes | str | None) -> str | None:
    """HTML → text for ONE document (the spec; mirrors the UDF exactly)."""
    if raw is None:
        return None
    s = raw.decode("utf-8", errors="replace") if isinstance(raw, bytes) else raw
    s = _RE_COMMENT.sub("", s)
    s = _RE_SCRIPT.sub("", s)
    s = _RE_STYLE.sub("", s)
    s = _RE_BLOCK_CLOSE.sub("\n", s)
    s = _RE_TAG.sub("", s)
    return _html.unescape(s)


def extract_text_str(raw: bytes | str | None) -> str | None:
    """Full extraction chain for ONE document (pure-Python spec)."""
    s = strip_html_str(raw)
    if s is None:
        return None
    return clean_text(s)


# --- vectorized engine path ---


def _clean_series(s: pd.Series) -> pd.Series:
    # T2 trim sections: sequential split-once-keep-head per marker
    for marker in ("See also", "References", "External links", "Notes"):
        s = s.str.split(marker, n=1).str[0]
    # T5 line cleanup: inherently per-line branching — per-element inside
    # the Arrow batch (the allowed pattern; cf. SURVEY §2.7)
    s = s.map(clean_lines, na_action="ignore")
    # T3 + T4 ordered literal replaces: single-pass str.replace semantics
    for old, new in SYMBOL_RULES + NEWLINE_RULES:
        s = s.str.replace(old, new, regex=False)
    return s


def _extract_series(raw: pd.Series) -> pd.Series:
    s = raw.map(
        lambda b: b.decode("utf-8", errors="replace") if isinstance(b, (bytes, bytearray)) else b,
        na_action="ignore",
    )
    s = s.str.replace(_RE_COMMENT, "", regex=True)
    s = s.str.replace(_RE_SCRIPT, "", regex=True)
    s = s.str.replace(_RE_STYLE, "", regex=True)
    s = s.str.replace(_RE_BLOCK_CLOSE, "\n", regex=True)
    s = s.str.replace(_RE_TAG, "", regex=True)
    s = s.map(_html.unescape, na_action="ignore")
    return _clean_series(s)


@F.pandas_udf(T.StringType())
def extract_text_udf(raw: pd.Series) -> pd.Series:
    """html(binary|string) → byte-identical extracted text."""
    return _extract_series(raw)


@F.pandas_udf(T.StringType())
def clean_text_udf(s: pd.Series) -> pd.Series:
    """Cleaning chain only (input already plain text)."""
    return _clean_series(s)


__all__ = [
    "strip_html_str",
    "extract_text_str",
    "extract_text_udf",
    "clean_text_udf",
    "trim_sections",
    "clean_text",
    "LINE_DROP_SUBSTRINGS",
]
