"""Checkpoint/resume (SURVEY §5.2 item 4) and parallelism determinism (item 5)."""

import os

import pytest
from pyspark.sql import functions as F

from sparksearch.index.build import build_index
from sparksearch.index.manifest import completed_units, read_meta


def _postings_pdf(spark, d):
    return (
        spark.read.parquet(f"{d}/postings")
        .orderBy("term_id", "segment_id", "block_id")
        .toPandas()
    )


def test_kill_resume_identical(spark, corpus, tmp_path):
    killed = str(tmp_path / "killed")
    clean = str(tmp_path / "clean")
    with pytest.raises(RuntimeError, match="injected failure"):
        build_index(spark, corpus, killed, n_units=4, n_buckets=8, _fail_after_unit=1)
    assert completed_units(killed) == {0, 1}
    build_index(spark, corpus, killed, n_units=4, n_buckets=8, resume=True)
    assert completed_units(killed) == {0, 1, 2, 3}
    build_index(spark, corpus, clean, n_units=4, n_buckets=8)
    a, b = _postings_pdf(spark, killed), _postings_pdf(spark, clean)
    assert a.equals(b)
    assert read_meta(killed)["n_docs"] == read_meta(clean)["n_docs"]


def test_resume_noop_when_complete(spark, corpus, tmp_path):
    d = str(tmp_path / "idx")
    build_index(spark, corpus, d, n_units=2, n_buckets=8)
    before = _postings_pdf(spark, d)
    build_index(spark, corpus, d, n_units=2, n_buckets=8, resume=True)
    assert _postings_pdf(spark, d).equals(before)


def test_stage_a_rerun_invalidates_packed_units(spark, corpus, tmp_path):
    """If units committed but the stage-A marker didn't (crash in that
    window), a resume over CHANGED input must repack everything — unit
    markers are cleared whenever stage A re-runs (ADVICE r2)."""
    d = str(tmp_path / "idx")
    clean = str(tmp_path / "clean")
    build_index(spark, corpus, d, n_units=2, n_buckets=8)
    # simulate the crash window: units committed, stage-A marker absent
    os.remove(os.path.join(d, "manifest", "stage_tfrows.json"))
    changed = corpus.withColumn("text", F.concat(F.col("text"), F.lit(" zzzmarker")))
    build_index(spark, changed, d, n_units=2, n_buckets=8, resume=True)
    build_index(spark, changed, clean, n_units=2, n_buckets=8)
    assert _postings_pdf(spark, d).equals(_postings_pdf(spark, clean))


def test_index_invariant_under_parallelism(spark, corpus, tmp_path):
    """Same bytes at different shuffle widths — the two-cluster-size rule's
    determinism prerequisite (throughput side measured in bench.py)."""
    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        build_index(spark, corpus, a_dir, n_units=2, n_buckets=8)
        spark.conf.set("spark.sql.shuffle.partitions", "16")
        build_index(spark, corpus, b_dir, n_units=2, n_buckets=8)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert _postings_pdf(spark, a_dir).equals(_postings_pdf(spark, b_dir))
