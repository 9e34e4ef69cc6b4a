"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1).

Generates the canonical input table of BASELINE.json's ``input_hint``:

    url string, warc_ts timestamp, html binary, text string, lang string

entirely from ``numpy.random.default_rng(seed)`` keyed by document index
— never by partition or arrival order — so the same (seed, n_docs)
always yields identical bytes at any parallelism (FIXTURES §5).  The
``html`` column wraps the body in markup + the dirty-text constructs of
FIXTURES §1.1 so the extraction chain is genuinely exercised; the
expected clean text is whatever the vendored oracle chain produces (the
tests compare engine output against the oracle two-path, no stored
golden needed).

Replaces the reference's ``make_sample.py`` sampling utility
(``keyword_search/make_sample.py:7-79``) — we synthesize instead of
sampling a dump, per the no-external-data rule.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

VOCAB_SIZE = 50_000
ZIPF_ALPHA = 1.1
_CONS = list("bcdfghjklmnprstvwz")
_VOW = list("aeiou")


def make_vocab(size: int = VOCAB_SIZE) -> list[str]:
    """Deterministic pronounceable words, unique per index."""
    words = []
    nc, nv = len(_CONS), len(_VOW)
    for i in range(size):
        x, syl = i, []
        while True:
            syl.append(_CONS[x % nc] + _VOW[(x // nc) % nv])
            x //= nc * nv
            if x == 0:
                break
        words.append("".join(syl) + str(i % 10))
    return words


def zipf_probs(size: int = VOCAB_SIZE, alpha: float = ZIPF_ALPHA) -> np.ndarray:
    w = 1.0 / np.arange(1, size + 1, dtype=np.float64) ** alpha
    return w / w.sum()


# Dirty constructs cycled through documents (every rule of SURVEY §2.3).
_DIRTY_SNIPPETS = [
    "café menu – list − of ′items′",  # nbsp, dashes, primes
    "() (;) ( ;) (, extra) ( , ; junk)",
    "weird 皖 char and ۝ mark here",
    "line with thumb|300px|caption should vanish",
    'row with scope="col" must go\nand rowspan="2" too\nplus style="x" gone',
    "| table cell line\n! header line\n! ! double bang\n|- row sep\n|} table end",
    " leading space line\nshort\n\n\n\n\n\nsix newlines collapse",
    "sentence , with space comma and space . period ;; double semi",
    'quote ,“ fancy and trailing space \n next',
    "tail content\nSee also\nthis must be cut",
    "other tail\nReferences\ncut too",
    "ext tail\nExternal links\ncut as well",
    "notes tail\nNotes\ngone",
]

_HTML_TMPL = (
    "<!DOCTYPE html><html><head><title>{title}</title>"
    "<style>body {{ color: red }}</style>"
    "<script>var x = 1 &amp;&amp; 2;</script></head>"
    "<body><!-- comment -->\n<h1>{title}</h1>\n{paras}"
    "<div>footer &amp; fine print</div></body></html>"
)


def generate_pandas(n_docs: int, seed: int = 42, vocab_size: int = VOCAB_SIZE) -> pd.DataFrame:
    """The full table as pandas (sandbox scales; Arrow-ships to Spark)."""
    rng = np.random.default_rng(seed)
    vocab = np.array(make_vocab(vocab_size))
    probs = zipf_probs(vocab_size)

    # log-normal doc lengths, median ~200 tokens, capped at 5000
    lens = np.minimum(
        np.maximum(rng.lognormal(np.log(200), 0.8, n_docs).astype(np.int64), 5), 5000
    )
    langs = rng.choice(
        np.array(["en", "de", "fr", "es", "xx"]),
        n_docs,
        p=[0.90, 0.025, 0.025, 0.025, 0.025],
    )
    null_mask = rng.random(n_docs) < 0.02

    total = int(lens.sum())
    draws = rng.choice(vocab, total, p=probs)
    offs = np.concatenate(([0], np.cumsum(lens)))

    urls, texts, htmls = [], [], []
    ts0 = dt.datetime(2024, 10, 1, tzinfo=dt.timezone.utc)
    tss = [ts0 + dt.timedelta(seconds=17 * i) for i in range(n_docs)]
    for i in range(n_docs):
        urls.append(f"https://site{i % 100}.example/page/{i}")
        toks = draws[offs[i] : offs[i + 1]]
        # paragraphs of ~40 tokens
        paras = [" ".join(toks[j : j + 40]) for j in range(0, len(toks), 40)]
        body = "\n\n".join(paras)
        if i % 7 == 0:  # embed a dirty construct at a known cadence
            body = body + "\n" + _DIRTY_SNIPPETS[(i // 7) % len(_DIRTY_SNIPPETS)]
        if i % 97 == 0 and i > 0:  # REDIRECT docs must be filterable
            body = "REDIRECT to elsewhere\n" + body
        if null_mask[i]:
            texts.append(None)
            htmls.append(None)
            continue
        texts.append(body)
        html_paras = "".join(f"<p>{p}</p>\n" for p in body.split("\n\n"))
        htmls.append(
            _HTML_TMPL.format(title=f"doc {i}", paras=html_paras).encode("utf-8")
        )
    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": tss,
            "html": pd.Series(htmls, dtype=object),
            "text": texts,
            "lang": langs,
        }
    )


def generate_docs(spark, n_docs: int, seed: int = 42, vocab_size: int = VOCAB_SIZE):
    """Spark DataFrame of the canonical table with content-derived doc ids."""
    from pyspark.sql import functions as F

    pdf = generate_pandas(n_docs, seed, vocab_size)
    sdf = spark.createDataFrame(
        pdf, schema="url string, warc_ts timestamp, html binary, text string, lang string"
    )
    return sdf.withColumn("doc_id", F.xxhash64("url"))


# ---------------------------------------------------------------------------
# multilingual fixture corpus (unicode analyzer gate — VERDICT r3 ask #2)
# ---------------------------------------------------------------------------
# Every word is exactly ONE token under the ``unicode`` analyzer, drawn
# from six scripts, with uppercase forms so the Unicode lowercase mapping
# is genuinely exercised.  Word-final uppercase sigma is deliberately
# absent (the one known Java/Python-vs-utf8proc case-mapping divergence —
# see sparksearch/analyze.py).  Generated by pure integer arithmetic in
# BOTH engines (Spark `transform(sequence(...))`, DuckDB
# `list_transform(range(...))`), so the corpora are byte-identical.
UNICODE_VOCAB = [
    "café", "CAFÉ", "müller", "straße", "naïve", "résumé",
    "привет", "МИР", "данные", "поиск",
    "ελληνικά", "λόγος", "σύστημα",
    "日本語", "漢字123", "検索", "텍스트", "한국어",
    "مرحبا", "بالعالم", "نص١٢٣",
    "ÜBUNG", "école", "façade",
]
UNICODE_CORPUS_DOCS = 400


def unicode_corpus(spark, n_docs: int = UNICODE_CORPUS_DOCS):
    """(doc_id long, text string) — doc i is ``8 + i % 13`` words, word j
    is ``UNICODE_VOCAB[(i*7 + j*(j+3)) % V]``; pure-JVM generation."""
    from pyspark.sql import functions as F

    v = len(UNICODE_VOCAB)
    vocab_arr = F.array(*[F.lit(w) for w in UNICODE_VOCAB])
    i = F.col("id")
    words = F.transform(
        F.sequence(F.lit(0), (F.lit(7) + i % 13).cast("int")),
        lambda j: F.element_at(
            vocab_arr, ((i * 7 + j * (j + 3)) % v + 1).cast("int")
        ),
    )
    return spark.range(n_docs).select(
        i.alias("doc_id"), F.concat_ws(" ", words).alias("text")
    )


def unicode_corpus_sql(n_docs: int = UNICODE_CORPUS_DOCS) -> str:
    """DuckDB twin of :func:`unicode_corpus` (byte-identical rows)."""
    v = len(UNICODE_VOCAB)
    vocab = "[" + ", ".join("'" + w + "'" for w in UNICODE_VOCAB) + "]"
    return (
        f"SELECT i::BIGINT AS doc_id, "
        f"array_to_string(list_transform(range(0, 8 + (i % 13)::INT), "
        f"j -> {vocab}[((i*7 + j*(j+3)) % {v})::INT + 1]), ' ') AS text "
        f"FROM range(0, {n_docs}) t(i)"
    )


# CJK fixture vocab (VERDICT r4 missing #1): Han (Chinese + Japanese
# kanji), Hiragana, Katakana and mixed words.  Under the unicode
# analyzer's UAX#29-style unigram rule the Han/Hiragana words analyze
# to one token per ideograph while Katakana words stay runs, so a
# corpus of these words exercises sub-word matching — the exact
# behavior a run-tokenizer gets wrong (one giant token per phrase).
CJK_VOCAB = [
    "東京都", "日本語", "検索エンジン", "漢字", "文字列",
    "ひらがな", "カタカナ", "データ", "分散処理", "全文検索",
    "自然言語", "機械学習", "大規模", "索引", "中文分词",
    "北京大学", "これはペン", "転置索引2024",
]
CJK_CORPUS_DOCS = 400


def cjk_corpus(spark, n_docs: int = CJK_CORPUS_DOCS):
    """(doc_id long, text string) — Han/kana fixture corpus; doc i is
    ``6 + i % 11`` words, word j is ``CJK_VOCAB[(i*5 + j*(j+1)) % V]``,
    space-joined; pure-JVM generation, byte-identical DuckDB twin."""
    from pyspark.sql import functions as F

    v = len(CJK_VOCAB)
    vocab_arr = F.array(*[F.lit(w) for w in CJK_VOCAB])
    i = F.col("id")
    words = F.transform(
        F.sequence(F.lit(0), (F.lit(5) + i % 11).cast("int")),
        lambda j: F.element_at(
            vocab_arr, ((i * 5 + j * (j + 1)) % v + 1).cast("int")
        ),
    )
    return spark.range(n_docs).select(
        i.alias("doc_id"), F.concat_ws(" ", words).alias("text")
    )


def cjk_corpus_sql(n_docs: int = CJK_CORPUS_DOCS) -> str:
    """DuckDB twin of :func:`cjk_corpus` (byte-identical rows)."""
    v = len(CJK_VOCAB)
    vocab = "[" + ", ".join("'" + w + "'" for w in CJK_VOCAB) + "]"
    return (
        f"SELECT i::BIGINT AS doc_id, "
        f"array_to_string(list_transform(range(0, 6 + (i % 11)::INT), "
        f"j -> {vocab}[((i*5 + j*(j+1)) % {v})::INT + 1]), ' ') AS text "
        f"FROM range(0, {n_docs}) t(i)"
    )


def reference_queries(vocab_size: int = VOCAB_SIZE) -> list[tuple[int, str, int]]:
    """The 40-query reference set of FIXTURES §2 → (query_id, text, k)."""
    vocab = make_vocab(vocab_size)
    qs: list[tuple[int, str, int]] = []
    qid = 0

    def add(text: str, k: int = 5):
        nonlocal qid
        qs.append((qid, text, k))
        qid += 1

    # 10 single-term: head terms, mid, tail, OOV
    for rank in (0, 1, 2, 10, 100, 1000, 5000, 20000):
        add(vocab[min(rank, vocab_size - 1)])
    add(vocab[3], 1)
    add("zzzqqqoov")  # OOV → empty
    # 20 two–three term
    rng = np.random.default_rng(7)
    for _ in range(20):
        n = int(rng.integers(2, 4))
        ranks = rng.integers(0, min(2000, vocab_size), n)
        add(" ".join(vocab[r] for r in ranks))
    # 5 mixed case / punctuation (analyzer test)
    add(vocab[0].upper())
    add(f"{vocab[1].title()}, {vocab[2]}!")
    add(f"  {vocab[5]}--{vocab[6]}  ")
    add(f"{vocab[7]}'s {vocab[8]}")
    add(f"({vocab[9]}) [{vocab[11]}]")
    # 5 long phrase-like
    for s in range(5):
        ranks = rng.integers(0, min(500, vocab_size), 6)
        add(" ".join(vocab[r] for r in ranks), 100 if s == 0 else 5)
    return qs
