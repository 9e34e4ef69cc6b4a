"""Byte-identity of the extraction/cleaning chain (SURVEY §5.2 item 1).

Two oracles:
1. hand-written golden outputs for crafted inputs exercising every rule
   (independent of any engine code);
2. differential: the pure-Python spec path vs the vectorized pandas-UDF
   path must agree byte-for-byte on the whole synthetic corpus.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparksearch.cleaning import clean_text
from sparksearch.extract import (
    clean_text_udf,
    extract_text_str,
    extract_text_udf,
    strip_html_str,
)

# (input, expected) — expected computed BY HAND from the reference rules.
GOLDEN = [
    # ordered symbol fixes: en-dash, nbsp, primes
    ("a – b c ′x′", "a - b c `x`"),
    # empty parens / odd parenthetical runs collapse, double-space swept last
    ("word () tail", "word tail"),
    ("x (;) y", "x y"),
    ("f ( ;) g", "f g"),
    ("a (, b", "a (b"),
    ("m ( , ; n", "m (n"),
    # minus sign and Arabic mark / CJK literal removals
    ("t − u ۝ v 皖 w", "t - u v w"),
    # punctuation spacing: ' .' ' ,' ';;' ',,'.  NB ';;'→';' runs AFTER the
    # ' ; '→'; ' pass, so the space before the surviving ';' remains.
    ("end . next , and ;; or ,,", "end. next, and ; or,"),
    # ',“' becomes ', "'
    ('say ,“quote', 'say, "quote'),
    # newline collapses: trailing ' \n', 6→2, and the 3→2/3→1/3→2 dance
    ("a \nb", "a\nb"),
    ("a" + "\n" * 6 + "b", "a\n\nb"),
    ("a" + "\n" * 3 + "b", "a\n\nb"),
    # section trim: everything from the first marker on is dropped
    ("keep this\nSee also\ndrop this", "keep this\n"),
    ("keep\nReferences\ngone\nExternal links\ngone too", "keep\n"),
    # line drops: thumb|, scope=", rowspan=", style="
    ("good line\nbad thumb|300px line\nalso good", "good line\nalso good"),
    ('keep\nx scope="col" y\nrowspan="2" z\nstyle="a" b\nkeep2', "keep\nkeep2"),
    # leading-space strip + table prefixes; '! ' strips twice
    (" padded line\nrest", "padded line\nrest"),
    ("| cell content\nrest", "cell content\nrest"),
    ("! header\nrest", "header\nrest"),
    ("! ! double\nrest", "double\nrest"),
    ("|- row\nrest", " row\nrest"),
    ("|} end\nrest", " end\nrest"),
    # single-char lines are left alone (len > 1 guard)
    ("x\n|\nrest", "x\n|\nrest"),
]


@pytest.mark.parametrize("raw,expected", GOLDEN, ids=range(len(GOLDEN)))
def test_clean_text_golden(raw, expected):
    assert clean_text(raw) == expected


HTML_GOLDEN = [
    # tags stripped, block closers → newline, entities unescaped,
    # script/style/comments removed
    (
        "<html><head><style>p {color:red}</style><script>1&amp;2</script></head>"
        "<body><!-- hi --><h1>Title</h1><p>a &amp; b</p><p>c</p></body></html>",
        "Title\na & b\nc\n",
    ),
    ("<p>one</p>\n<p>two</p>", "one\n\ntwo\n"),
    ("plain, no markup", "plain, no markup"),
]


@pytest.mark.parametrize("raw,expected", HTML_GOLDEN, ids=range(len(HTML_GOLDEN)))
def test_extract_html_golden(raw, expected):
    assert extract_text_str(raw.encode()) == expected


def test_strip_html_bytes_and_str_agree():
    s = "<p>café &eacute;</p>"
    assert strip_html_str(s) == strip_html_str(s.encode("utf-8"))


def test_udf_matches_pure_python_on_corpus(spark):
    """Differential: Spark vectorized path == pure spec path, byte-for-byte."""
    from sparksearch.synth import generate_pandas

    pdf = generate_pandas(300, seed=42, vocab_size=2000)
    sdf = spark.createDataFrame(
        pdf, schema="url string, warc_ts timestamp, html binary, text string, lang string"
    )
    got = (
        sdf.select("url", extract_text_udf("html").alias("ext"))
        .toPandas()
        .set_index("url")["ext"]
    )
    for url, html in zip(pdf["url"], pdf["html"]):
        expected = extract_text_str(html)
        assert got.loc[url] == expected or (expected is None and pd.isna(got.loc[url])), url


def test_clean_udf_null_safe(spark):
    sdf = spark.createDataFrame([(None,), ("a () b",)], "t string")
    rows = sdf.select(clean_text_udf("t").alias("c")).collect()
    assert rows[0]["c"] is None
    assert rows[1]["c"] == "a b"
