"""Chunking (C1): Spark vs DuckDB twin + boundary properties."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from sparksearch.analyze import tokenize_str
from sparksearch.ops import chunking as ck

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    return con


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    return sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False, name=None)
    )


def test_chunk_table_matches_oracle(docs, duck):
    sp = ck.chunk_table(docs).toPandas()
    du = duck.sql(ck.chunk_table_sql()).df()
    assert sorted(sp.columns) == sorted(du.columns)
    assert len(sp) == len(du)
    assert _canon(sp) == _canon(du)


def test_chunk_properties(docs):
    """Chunks cover every token; sizes ≤ size; overlap = size−stride."""
    size, overlap = 16, 0.25
    stride = int(size * (1 - overlap))
    rows = ck.chunk_table(docs.limit(50), size, overlap).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.limit(50).collect() if r["text"]}
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, chunks in by_doc.items():
        toks = tokenize_str(texts[doc_id])
        chunks.sort(key=lambda r: r["chunk_idx"])
        for i, c in enumerate(chunks):
            want = toks[i * stride : i * stride + size]
            assert c["chunk_text"].split(" ") == want
            assert c["n_chunk_tokens"] == len(want)
        # full coverage: last chunk reaches the final token
        n = len(toks)
        assert (len(chunks) - 1) * stride + size >= n


def test_wordpiece_mode_matches_oracle(docs, duck):
    """512-wordpiece-approximate window (≈394 analyzer words): Spark and
    DuckDB twins agree, and the derived size is the documented ratio."""
    assert ck.wordpiece_chunk_size() == round(512 / 1.3)
    size = ck.wordpiece_chunk_size()
    sp = ck.chunk_table(docs, size=size).toPandas()
    du = duck.sql(ck.chunk_table_sql(size=size)).df()
    assert sorted(sp.columns) == sorted(du.columns)
    assert len(sp) == len(du)
    assert _canon(sp) == _canon(du)
    # every non-empty doc yields ≥1 chunk even when shorter than 394 words
    n_docs = docs.filter("text IS NOT NULL").count()
    assert sp["doc_id"].nunique() == n_docs


def test_embed_backend_selection(spark, docs, tmp_path):
    """Stub vs real encoder selection (VERDICT r3 ask #9): a fake
    sentence_transformers module shipped to the workers must be picked
    up when use_model=True, and the stub must run when use_model=False
    — same plumbing, zero code change between them."""
    import numpy as np

    fake = tmp_path / "sentence_transformers.py"
    fake.write_text(
        "import numpy as np\n"
        "class SentenceTransformer:\n"
        "    def __init__(self, name): self.name = name\n"
        "    def encode(self, texts):\n"
        "        return np.stack([np.full(8, float(len(t) % 7 + 1), dtype='float32')\n"
        "                         for t in texts])\n"
    )
    spark.sparkContext.addPyFile(str(fake))
    chunks = ck.chunk_table(docs.limit(20))
    real = ck.embed_chunks(chunks, use_model=True).toPandas()
    assert all(len(v) == 8 for v in real["embedding"])
    texts = {
        (r["doc_id"], r["chunk_idx"]): r["chunk_text"]
        for r in chunks.collect()
    }
    for r in real.itertuples(index=False):
        t = texts[(r.doc_id, r.chunk_idx)]
        assert np.allclose(r.embedding, float(len(t) % 7 + 1))
    stub = ck.embed_chunks(chunks, use_model=False).toPandas()
    assert all(len(v) == ck.EMBED_DIM for v in stub["embedding"])
    norms = [float(np.linalg.norm(v)) for v in stub["embedding"]]
    assert all(abs(n - 1.0) < 1e-3 for n in norms)
