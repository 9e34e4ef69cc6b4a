"""Aliases (atomic pointer swap) + index stats."""

import json
import os

import pytest

from sparksearch.index import admin
from sparksearch.pipeline import build_and_load, prepare_corpus
from sparksearch.synth import generate_docs, make_vocab

_V = make_vocab(500)
Q = f"{_V[0]} {_V[3]}"


@pytest.fixture(scope="module")
def two_indexes(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("admin")
    a = prepare_corpus(generate_docs(spark, 150, seed=1), lang="en")
    b = prepare_corpus(generate_docs(spark, 150, seed=2), lang="en")
    ia = build_and_load(spark, a, str(root / "idx_a"), n_units=2)
    ib = build_and_load(spark, b, str(root / "idx_b"), n_units=2)
    return str(root), ia, ib


def test_alias_create_swap_resolve(spark, two_indexes):
    root, ia, ib = two_indexes
    al = os.path.join(root, "live.alias")
    admin.create_alias(al, ia.index_dir)
    assert admin.resolve_alias(al) == os.path.abspath(ia.index_dir)
    with pytest.raises(FileExistsError):
        admin.create_alias(al, ib.index_dir)

    h1 = admin.open_alias(spark, al)
    r1 = [r["doc_id"] for r in h1.search(Q, 5).collect()]
    assert r1 == [r["doc_id"] for r in ia.search(Q, 5).collect()]

    gen = admin.swap_alias(al, ib.index_dir)
    assert gen == 1
    # open handle keeps serving its resolved index (in-flight semantics)
    assert [r["doc_id"] for r in h1.search(Q, 5).collect()] == r1
    # a fresh open follows the swap
    h2 = admin.open_alias(spark, al)
    assert [r["doc_id"] for r in h2.search(Q, 5).collect()] == [
        r["doc_id"] for r in ib.search(Q, 5).collect()
    ]
    # alias file is never torn: always valid JSON with an index_dir
    doc = json.load(open(al))
    assert doc["index_dir"] == os.path.abspath(ib.index_dir)


def test_alias_validation(two_indexes):
    root, ia, _ = two_indexes
    with pytest.raises(FileNotFoundError):
        admin.create_alias(os.path.join(root, "x.alias"), root)  # no meta
    bad = os.path.join(root, "bad.alias")
    with open(bad, "w") as f:
        json.dump({"nope": 1}, f)
    with pytest.raises(ValueError):
        admin.resolve_alias(bad)


def test_index_stats(two_indexes):
    _, ia, _ = two_indexes
    st = admin.index_stats(ia.index_dir)
    assert st["n_docs"] == ia.meta["n_docs"] > 0
    assert st["total_tokens"] > 0 and st["avgdl"] > 0
    assert st["gen"] == ia.meta["gen"]
    assert "postings" in st["components"]
    assert st["components"]["postings"]["bytes"] > 0
    assert st["total_bytes"] >= sum(
        c["bytes"] for c in st["components"].values()
    )
