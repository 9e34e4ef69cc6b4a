"""query_string engine path ≡ exhaustive path (rank + score)."""

import pytest
from pyspark.sql import functions as F

from sparksearch.query.qstring import query_string_search, query_string_topk
from sparksearch.synth import make_vocab

_V = make_vocab(2000)
K = 10


@pytest.fixture(scope="module")
def qs_index(spark, corpus, built_index):
    from sparksearch.index.lexicon import build_lexicon
    from sparksearch.index.positions import build_positions

    if not built_index.meta.get("has_positions"):
        build_positions(spark, corpus, built_index.index_dir)
    build_lexicon(spark, corpus, built_index.index_dir)
    return built_index


def _meta(corpus):
    return corpus.withColumn(
        "grp", F.pmod(F.col("doc_id"), F.lit(5)).cast("string")
    )


@pytest.mark.parametrize(
    "q",
    [
        "{a} {b}",                                  # plain OR
        "({a} OR {b}) AND {c}",                     # group + AND upgrade
        '+{a} -{b} "{c} {d}"',                      # modifiers + phrase
        '"{a} {b}"~2^3 OR {c}',                     # sloppy boosted phrase
        "{w}* AND {c}",                             # wildcard conjunction
        "{a} grp:2^2",                              # field leaf + boost
    ],
)
def test_engine_equals_exhaustive(spark, corpus, qs_index, q):
    doc = _meta(corpus)
    query = q.format(
        a=_V[0], b=_V[3], c=_V[7], d=_V[11], w=_V[0][:3]
    )
    ex = [
        (r["doc_id"], r["score"])
        for r in query_string_topk(doc, query, K).collect()
    ]
    en = [
        (r["doc_id"], r["score"])
        for r in query_string_search(qs_index, query, K, docs=doc).collect()
    ]
    assert en == ex and ex


def test_engine_requires_docs_for_field_leaves(spark, qs_index):
    with pytest.raises(ValueError, match="docs="):
        query_string_search(qs_index, f"{_V[0]} grp:2", K)


def test_engine_oov_only_is_empty(spark, corpus, qs_index):
    assert query_string_search(qs_index, "zzqqxxyy", K, docs=corpus).count() == 0
