"""Structured Streaming: stream results ≡ batch results; incremental
index ingest via foreachBatch converges to the batch-built index."""

import os

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparksearch import streaming as st

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(cols).reset_index(drop=True)


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet").cache()


def test_windowed_stats_match_duckdb(events):
    got = st.windowed_event_stats(events).toPandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    want = con.sql(st.windowed_event_stats_sql()).df()
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)


def test_sessions_match_duckdb(events):
    got = st.user_sessions(events).toPandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    want = con.sql(st.user_sessions_sql()).df()
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)


def test_streaming_windowed_equals_batch(spark, events, tmp_path):
    """availableNow streaming over file drops == one batch pass."""
    src = str(tmp_path / "events_src")
    # three separate file drops → three micro-batches
    events.repartition(3).write.mode("overwrite").parquet(src)
    stream = st.read_events_stream(spark, src, max_files_per_trigger=1)
    got = st.run_available_now(
        st.windowed_event_stats(stream), "win_stats_test"
    ).toPandas()
    want = st.windowed_event_stats(events).toPandas()
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)


def test_stream_index_ingest_converges(spark, tmp_path):
    """Docs streamed in 3 drops → index identical to one batch build
    (after compact: drops 2–3 upsert new docs, whose appended v3
    ordinals are history-dependent until the force-merge renumbers)."""
    from sparksearch.pipeline import prepare_corpus
    from sparksearch.query.topk import InvertedIndex
    from sparksearch.synth import generate_docs, make_vocab
    from tests.test_upsert import _assert_index_equal
    from sparksearch.index.build import build_index
    from sparksearch.index.upsert import compact_index

    corpus = prepare_corpus(generate_docs(spark, 200, seed=33), lang=None).cache()
    src = str(tmp_path / "docs_src")
    for i in range(3):
        corpus.filter(F.pmod("doc_id", F.lit(3)) == i).write.mode(
            "append"
        ).parquet(src)
    kw = dict(n_segments=4, n_buckets=8, n_units=2)
    batch_dir = str(tmp_path / "batch_idx")
    build_index(spark, corpus, batch_dir, **kw)
    stream_dir = str(tmp_path / "stream_idx")
    stream = st.read_docs_stream(spark, src, max_files_per_trigger=1)
    meta = st.stream_index_ingest(spark, stream, stream_dir, **kw)
    assert meta["n_docs"] == corpus.count()
    # queries must agree even BEFORE compact (ordinal assignment is
    # invisible to scoring) ...
    v0 = make_vocab(100)
    q0 = f"{v0[0]} {v0[7]}"
    pre = [
        (r["doc_id"], r["score"])
        for r in InvertedIndex(spark, stream_dir).search(q0, 5).collect()
    ]
    want = [
        (r["doc_id"], r["score"])
        for r in InvertedIndex(spark, batch_dir).search(q0, 5).collect()
    ]
    assert pre == want
    # ... and compact restores canonical rebuild-identical bytes
    compact_index(spark, stream_dir)
    _assert_index_equal(spark, batch_dir, stream_dir)
    # and it answers queries identically
    v = make_vocab(100)
    q = f"{v[0]} {v[7]}"
    a = [(r["doc_id"], r["score"]) for r in InvertedIndex(spark, batch_dir).search(q, 5).collect()]
    b = [(r["doc_id"], r["score"]) for r in InvertedIndex(spark, stream_dir).search(q, 5).collect()]
    assert a == b


def test_stream_tombstones_delete(spark, tmp_path):
    """Null-text rows in the stream are tombstones: the final index must
    equal a batch build over (all docs − tombstoned ids), including an
    id that is added and tombstoned in the SAME micro-batch (tombstone
    wins) and a tombstone for an id never seen (no-op)."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType
    from sparksearch.index.build import build_index
    from sparksearch.index.upsert import compact_index
    from sparksearch.pipeline import prepare_corpus
    from sparksearch.query.topk import InvertedIndex
    from sparksearch.synth import generate_docs, make_vocab
    from tests.test_upsert import _assert_index_equal

    corpus = prepare_corpus(generate_docs(spark, 150, seed=34), lang=None).cache()
    ids = sorted(r["doc_id"] for r in corpus.select("doc_id").collect())
    gone_later = set(ids[::7])      # drop 1: added, drop 2: tombstoned
    gone_same_batch = set(ids[3::7]) - gone_later  # live+tombstone in drop 2
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    src = str(tmp_path / "docs_src")
    half = set(ids[: len(ids) // 2]) | gone_later
    # drop 1: first half of the corpus (includes the to-be-deleted docs)
    corpus.filter(F.col("doc_id").isin(list(half))).write.mode("append").parquet(src)
    # drop 2: the rest, plus tombstones (incl. same-batch ids + unknown id)
    tomb = spark.createDataFrame(
        [(i, None) for i in sorted(gone_later | gone_same_batch) + [123456789]],
        schema,
    )
    corpus.filter(~F.col("doc_id").isin(list(half - gone_same_batch))).unionByName(
        tomb
    ).write.mode("append").parquet(src)

    kw = dict(n_segments=4, n_buckets=8, n_units=2)
    survivors = corpus.filter(
        ~F.col("doc_id").isin(list(gone_later | gone_same_batch))
    )
    batch_dir = str(tmp_path / "batch_idx")
    build_index(spark, survivors, batch_dir, **kw)
    stream_dir = str(tmp_path / "stream_idx")
    stream = st.read_docs_stream(spark, src, max_files_per_trigger=1)
    meta = st.stream_index_ingest(spark, stream, stream_dir, **kw)
    assert meta["n_docs"] == survivors.count()
    v = make_vocab(100)
    q = f"{v[0]} {v[7]}"
    a = [(r["doc_id"], r["score"]) for r in InvertedIndex(spark, batch_dir).search(q, 5).collect()]
    b = [(r["doc_id"], r["score"]) for r in InvertedIndex(spark, stream_dir).search(q, 5).collect()]
    assert a == b
    compact_index(spark, stream_dir)
    _assert_index_equal(spark, batch_dir, stream_dir)
