"""date_range / rate / t_test / cumulative_cardinality / percentiles_bucket."""

import datetime as dt
import math

import pytest

from sparksearch.query.aggs import (
    cumulative_cardinality_agg,
    date_range_agg,
    rate_agg,
    t_test_agg,
)
from sparksearch.query.pipeaggs import percentiles_bucket


def _events(spark):
    rows = []
    base = dt.datetime(2024, 1, 1)
    # 3 days: users 1..3 on d0, 2..4 on d1, 1 on d2; values by type
    for day, users in enumerate([[1, 2, 3], [2, 3, 4], [1]]):
        for u in users:
            rows.append(
                (base + dt.timedelta(days=day, hours=u), u, "click",
                 float(10 * u))
            )
    rows.append((base + dt.timedelta(hours=5), 9, "purchase", 100.0))
    rows.append((base + dt.timedelta(days=1, hours=5), 9, "purchase", 140.0))
    return spark.createDataFrame(
        rows, ["ts", "user_id", "event_type", "value"]
    )


def test_date_range_overlap_and_open_ends(spark):
    ev = _events(spark)
    out = date_range_agg(
        ev,
        [
            (None, "2024-01-02 00:00:00"),
            ("2024-01-01 00:00:00", "2024-01-03 00:00:00"),
            ("2024-01-02 00:00:00", None),
        ],
    ).collect()
    assert [(r["bucket_idx"], r["doc_count"]) for r in out] == [
        (0, 4), (1, 8), (2, 5)
    ]
    with pytest.raises(ValueError, match="non-empty"):
        date_range_agg(ev, [])


def test_rate_scales_by_unit_ratio(spark):
    ev = _events(spark)
    out = {
        r["key"]: r["rate"]
        for r in rate_agg(ev, "day", "hour", event_type="click").collect()
    }
    # 3 clicks on d0 → 3/24 per hour
    assert out[dt.datetime(2024, 1, 1)] == round(3 / 24, 6)
    with pytest.raises(ValueError, match="unit"):
        rate_agg(ev, "month", "hour")


def test_t_test_welch_hand_computed(spark):
    ev = _events(spark)
    r = t_test_agg(ev, "value", "click", "purchase").collect()[0]
    a = [10.0, 20.0, 30.0, 20.0, 30.0, 40.0, 10.0]
    bvals = [100.0, 140.0]
    ma, mb = sum(a) / len(a), sum(bvals) / len(bvals)
    va = sum((x - ma) ** 2 for x in a) / (len(a) - 1)
    vb = sum((x - mb) ** 2 for x in bvals) / (len(bvals) - 1)
    sea, seb = va / len(a), vb / len(bvals)
    t = (ma - mb) / math.sqrt(sea + seb)
    dfw = (sea + seb) ** 2 / (
        sea**2 / (len(a) - 1) + seb**2 / (len(bvals) - 1)
    )
    assert r["t_stat"] == round(t, 4)
    assert r["df"] == round(dfw, 4)


def test_cumulative_cardinality_every_bucket(spark):
    ev = _events(spark)
    out = [
        (r["key"], r["cumulative_cardinality"])
        for r in cumulative_cardinality_agg(ev, "day").collect()
    ]
    # d0: users {1,2,3,9} → 4; d1 adds 4 → 5; d2 adds none → 5
    assert out == [
        (dt.datetime(2024, 1, 1), 4),
        (dt.datetime(2024, 1, 2), 5),
        (dt.datetime(2024, 1, 3), 5),
    ]


def test_percentiles_bucket_exact(spark):
    buckets = spark.createDataFrame(
        [("a", 10), ("b", 20), ("c", 40)], ["key", "doc_count"]
    )
    out = {
        r["percent"]: r["value"]
        for r in percentiles_bucket(buckets, (50.0, 100.0)).collect()
    }
    assert out == {50.0: 20.0, 100.0: 40.0}
    with pytest.raises(ValueError, match="non-empty"):
        percentiles_bucket(buckets, ())
