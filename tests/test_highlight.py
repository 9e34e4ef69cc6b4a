"""Token-stream highlighter: fragment window, wrapping, hit parity."""

from pyspark.sql import functions as F

from sparksearch.analyze import tokenize_str
from sparksearch.query.bm25 import bm25_topk_df
from sparksearch.query.highlight import highlight_topk
from sparksearch.synth import make_vocab

_V = make_vocab(2000)
QUERY = f"{_V[0]} {_V[3]}"
K = 8
W = 3


def _expected_snippet(text: str, terms: set[str], w: int = W) -> str:
    toks = tokenize_str(text)
    pos = next(i for i, t in enumerate(toks) if t in terms)  # 0-based
    frag = toks[max(0, pos - w): pos + w + 1]
    return " ".join(f"<em>{t}</em>" if t in terms else t for t in frag)


def test_hits_equal_bm25_topk(spark, corpus):
    """Hit SELECTION is exactly the bm25 top-k; display order is the
    cross-engine deterministic one (rounded score desc, doc_id asc) —
    inside a rounded-score tie that can differ from bm25_topk_df's
    raw-score order, by design (same contract as hybrid fusion)."""
    hl = highlight_topk(corpus, QUERY, K).collect()
    bm = bm25_topk_df(corpus, QUERY, K).collect()
    want = sorted(
        ((r["doc_id"], r["score"]) for r in bm), key=lambda t: (-t[1], t[0])
    )
    assert [(r["doc_id"], r["score"]) for r in hl] == want


def test_snippets_match_python_reference(spark, corpus):
    terms = set(tokenize_str(QUERY))
    hl = {r["doc_id"]: r["snippet"] for r in highlight_topk(corpus, QUERY, K).collect()}
    texts = {
        r["doc_id"]: r["text"]
        for r in corpus.filter(F.col("doc_id").isin(list(hl))).collect()
    }
    for did, snip in hl.items():
        assert snip == _expected_snippet(texts[did], terms), did
        assert "<em>" in snip


def test_window_clamps_at_document_start(spark):
    df = spark.createDataFrame(
        [(1, "target word word word word word word")], "doc_id long, text string"
    )
    got = highlight_topk(df, "target", 1).collect()[0]["snippet"]
    assert got == "<em>target</em> word word word"


def test_all_fragment_occurrences_wrapped(spark):
    df = spark.createDataFrame(
        [(1, "aa bb aa cc aa")], "doc_id long, text string"
    )
    got = highlight_topk(df, "aa", 1).collect()[0]["snippet"]
    assert got == "<em>aa</em> bb <em>aa</em> cc"  # window 3 after anchor 1


def test_empty_query(spark, corpus):
    assert highlight_topk(corpus, "!!!", K).count() == 0
