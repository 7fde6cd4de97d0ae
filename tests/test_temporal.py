from __future__ import annotations

import datetime as dt

import pytest

from kgpipe.temporal import asof_join


def _ts(s):
    return dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture()
def quotes_trades(spark):
    trades = spark.createDataFrame(
        [("A", _ts(3), 100), ("A", _ts(10), 200), ("B", _ts(5), 300),
         ("C", _ts(1), 400)],
        "sym string, ts timestamp, qty int",
    )
    quotes = spark.createDataFrame(
        [("A", _ts(1), 10.0), ("A", _ts(3), 11.0), ("A", _ts(7), 12.0),
         ("B", _ts(6), 20.0)],
        "sym string, ts timestamp, px double",
    )
    return trades, quotes


def test_asof_backward_inclusive(quotes_trades):
    trades, quotes = quotes_trades
    out = {(r["sym"], r["qty"]): (r["px_r"], r["ts_r"])
           for r in asof_join(trades, quotes, on="sym").collect()}
    assert out[("A", 100)] == (11.0, _ts(3))   # equal ts matches
    assert out[("A", 200)] == (12.0, _ts(7))   # latest at-or-before
    assert out[("B", 300)] == (None, None)     # quote is later -> no match
    assert out[("C", 400)] == (None, None)     # no quotes at all


def test_asof_backward_strict(quotes_trades):
    trades, quotes = quotes_trades
    out = {(r["sym"], r["qty"]): r["px_r"]
           for r in asof_join(trades, quotes, on="sym",
                              strict=True).collect()}
    assert out[("A", 100)] == 10.0  # equal ts excluded -> falls back to t=1


def test_asof_forward(quotes_trades):
    trades, quotes = quotes_trades
    out = {(r["sym"], r["qty"]): r["px_r"]
           for r in asof_join(trades, quotes, on="sym",
                              direction="forward").collect()}
    assert out[("A", 100)] == 11.0   # equal ts matches forward too
    assert out[("A", 200)] is None   # nothing after t=10
    assert out[("B", 300)] == 20.0   # earliest at-or-after


def test_asof_duplicate_ts_tiebreak(spark):
    left = spark.createDataFrame([("k", _ts(5), 1)],
                                 "id string, ts timestamp, x int")
    right = spark.createDataFrame(
        [("k", _ts(2), 7.0), ("k", _ts(2), 9.0)],
        "id string, ts timestamp, v double",
    )
    out = asof_join(left, right, on="id").collect()
    assert len(out) == 1 and out[0]["v_r"] == 9.0  # greatest value wins


def test_asof_preserves_left_row_count(spark):
    import random

    rng = random.Random(7)
    left = spark.createDataFrame(
        [(f"k{i % 5}", _ts(rng.randint(0, 100)), i) for i in range(200)],
        "id string, ts timestamp, x int",
    )
    right = spark.createDataFrame(
        [(f"k{i % 7}", _ts(rng.randint(0, 100)), float(i)) for i in range(50)],
        "id string, ts timestamp, v double",
    )
    joined = asof_join(left, right, on="id")
    assert joined.count() == 200
    # every matched ts is <= the left ts
    bad = joined.filter("ts_r IS NOT NULL AND ts_r > ts").count()
    assert bad == 0
