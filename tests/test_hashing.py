"""Driver-side xxhash64 must equal Spark's expression bit-for-bit —
term_id resolution happens off-JVM (``query/topk.py``), so any
divergence silently turns every query term OOV."""

import random

import pytest
from pyspark.sql import functions as F

from sparksearch.hashing import term_id_of, xxhash64


def test_matches_spark_expression(spark):
    random.seed(7)
    strs = [
        "", "a", "ab", "abc", "abcd", "abcde", "abcdef", "abcdefg",
        "abcdefgh", "abcdefghi", "0123456789abcdef", "0123456789abcdef0",
        "x" * 31, "x" * 32, "x" * 33, "x" * 39, "x" * 40, "x" * 41,
        "hello world", "naïve café 東京", "\x00\x01",
    ] + [
        "".join(
            random.choice("abcdefghijklmnopqrstuvwxyz0123456789_")
            for _ in range(random.randint(0, 80))
        )
        for _ in range(60)
    ]
    df = spark.createDataFrame([(s,) for s in set(strs)], "s string").select(
        "s", F.xxhash64("s").alias("h")
    )
    for r in df.collect():
        assert term_id_of(r["s"]) == r["h"], repr(r["s"])


def test_signed_range():
    # results are signed int64 like the Spark column
    vals = [xxhash64(bytes([i]) * i) for i in range(64)]
    assert all(-(1 << 63) <= v < (1 << 63) for v in vals)
    assert any(v < 0 for v in vals)


def test_seed_default_is_42():
    assert xxhash64(b"abc") == xxhash64(b"abc", seed=42)
    assert xxhash64(b"abc") != xxhash64(b"abc", seed=0)
