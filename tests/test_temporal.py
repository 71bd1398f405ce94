"""Temporal joins (operators/temporal.py): as-of and interval containment.

Strategy mirrors SURVEY.md §5: the scale-path implementation is checked
against (a) hand-computed rows, (b) the independent classic spelling
(union+window for as-of, nested-loop theta-join for interval), and
(c) a physical-plan assertion that the interval join is an equi-join,
not the O(n*m) BroadcastNestedLoopJoin the naive range predicate yields.
"""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from socialmapper_spark.operators.temporal import asof_join, interval_join

TS = dt.datetime


def _left(spark):
    return spark.createDataFrame(
        [
            Row(k="a", ts=TS(2024, 1, 1, 10, 0), ev=1),
            Row(k="a", ts=TS(2024, 1, 1, 12, 0), ev=2),
            Row(k="a", ts=TS(2024, 1, 2, 9, 0), ev=3),
            Row(k="b", ts=TS(2024, 1, 1, 11, 0), ev=4),  # no snapshot yet
            Row(k="b", ts=TS(2024, 1, 3, 11, 0), ev=5),
            Row(k="c", ts=TS(2024, 1, 2, 0, 0), ev=6),  # key absent on right
        ]
    )


def _right(spark):
    return spark.createDataFrame(
        [
            Row(k="a", snap_ts=TS(2024, 1, 1, 9, 0), v=10.0),
            Row(k="a", snap_ts=TS(2024, 1, 1, 12, 0), v=20.0),  # tie with ev=2
            Row(k="a", snap_ts=TS(2024, 1, 2, 8, 0), v=30.0),
            Row(k="b", snap_ts=TS(2024, 1, 2, 0, 0), v=40.0),
        ]
    )


def test_asof_equal_ts_snapshots_pick_greatest_payload(spark):
    """Two snapshots on one key with IDENTICAL ts: the documented
    deterministic tie-break is the greatest payload (struct order) —
    both strategies must agree."""
    left = spark.createDataFrame([Row(k="a", ts=TS(2024, 1, 2), ev=1)])
    right = spark.createDataFrame(
        [
            Row(k="a", snap_ts=TS(2024, 1, 1), v=5.0),
            Row(k="a", snap_ts=TS(2024, 1, 1), v=9.0),
            Row(k="a", snap_ts=TS(2024, 1, 1), v=7.0),
        ]
    )
    for strategy in ("compact", "union"):
        out = asof_join(
            left, right, on="k", left_ts="ts", strategy=strategy
        ).collect()
        assert len(out) == 1 and out[0].v == 9.0, strategy


def _rows(df):
    return sorted(
        df.select("ev", "v").collect(), key=lambda r: r.ev
    )


def test_asof_compact_hand_checked(spark):
    out = asof_join(_left(spark), _right(spark), on="k", left_ts="ts")
    got = {r.ev: (r.v, r.snap_ts) for r in out.collect()}
    assert got[1] == (10.0, TS(2024, 1, 1, 9, 0))
    # inclusive: snapshot at exactly left_ts wins
    assert got[2] == (20.0, TS(2024, 1, 1, 12, 0))
    assert got[3] == (30.0, TS(2024, 1, 2, 8, 0))
    # no snapshot precedes -> nulls, row still present (left join)
    assert got[4] == (None, None)
    assert got[5] == (40.0, TS(2024, 1, 2, 0, 0))
    assert got[6] == (None, None)
    assert out.count() == 6


def test_asof_union_strategy_identical(spark):
    a = asof_join(_left(spark), _right(spark), on="k", left_ts="ts")
    b = asof_join(
        _left(spark), _right(spark), on="k", left_ts="ts", strategy="union"
    )
    assert sorted(a.columns) == sorted(b.columns)
    cols = sorted(a.columns)
    assert sorted(map(tuple, a.select(cols).collect())) == sorted(
        map(tuple, b.select(cols).collect())
    )


def test_asof_strategies_agree_on_fixture(spark):
    """Cross-check compact vs union on a 2k-row deterministic frame with
    hot keys, duplicate timestamps, and keys missing on either side."""
    left = spark.range(2000).select(
        (F.col("id") % 13).alias("k"),
        F.timestamp_seconds(1700000000 + (F.col("id") * 7919) % 86400).alias("ts"),
        F.col("id").alias("ev"),
    )
    right = spark.range(300).select(
        (F.col("id") % 17).alias("k"),
        F.timestamp_seconds(1700000000 + (F.col("id") * 104729) % 86400).alias(
            "snap_ts"
        ),
        (F.col("id") * 1.5).alias("v"),
    )
    a = asof_join(left, right, on="k", left_ts="ts")
    b = asof_join(left, right, on="k", left_ts="ts", strategy="union")
    cols = sorted(a.columns)
    assert a.count() == 2000
    assert sorted(map(tuple, a.select(cols).collect())) == sorted(
        map(tuple, b.select(cols).collect())
    )


def test_asof_multi_key(spark):
    left = spark.createDataFrame(
        [Row(k1="a", k2=1, ts=TS(2024, 1, 2), ev=1)]
    )
    right = spark.createDataFrame(
        [
            Row(k1="a", k2=1, snap_ts=TS(2024, 1, 1), v=1.0),
            Row(k1="a", k2=2, snap_ts=TS(2024, 1, 1, 12), v=2.0),
        ]
    )
    out = asof_join(left, right, on=["k1", "k2"], left_ts="ts").collect()
    assert len(out) == 1 and out[0].v == 1.0


def test_asof_bad_strategy(spark):
    with pytest.raises(ValueError, match="strategy"):
        asof_join(_left(spark), _right(spark), on="k", strategy="nope")


def test_asof_column_clash_rejected(spark):
    """A right payload column sharing a left column's name would silently
    overwrite it — must raise instead."""
    right = _right(spark).withColumnRenamed("v", "ev")
    with pytest.raises(ValueError, match="collide"):
        asof_join(_left(spark), right, on="k", left_ts="ts")


def _points(spark):
    return spark.range(500).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.timestamp_seconds(1700000000 + F.col("id") * 311).alias("ts"),
        F.col("id").alias("pid"),
    )


def _intervals(spark):
    # widths from 1 s to ~8 h: some spill across many 1-h buckets
    return spark.range(40).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id").alias("iid"),
        F.timestamp_seconds(1700000000 + F.col("id") * 3600).alias("start_ts"),
        F.timestamp_seconds(
            1700000000 + F.col("id") * 3600 + 1 + (F.col("id") * F.col("id")) % 28800
        ).alias("end_ts"),
    )


def _naive(points, intervals, keys):
    cond = [points[k] == intervals[k] for k in keys] + [
        points["ts"] >= intervals["start_ts"],
        points["ts"] < intervals["end_ts"],
    ]
    joined = points.join(intervals, cond, "inner")
    return joined.select(
        *[points[c] for c in points.columns],
        *[intervals[c] for c in intervals.columns if c not in keys],
    )


def test_interval_join_matches_naive(spark):
    pts, ivs = _points(spark), _intervals(spark)
    got = interval_join(pts, ivs, on=["g"], bucket_seconds=3600)
    want = _naive(pts, ivs, ["g"])
    cols = sorted(got.columns)
    assert sorted(got.columns) == sorted(want.columns)
    g = sorted(map(tuple, got.select(cols).collect()))
    w = sorted(map(tuple, want.select(cols).collect()))
    assert g == w and len(g) > 0


def test_interval_join_keyless_and_small_buckets(spark):
    """No key columns + a bucket far smaller than the intervals (max
    replication path); still exact and emitted exactly once per pair."""
    pts, ivs = _points(spark).drop("g"), _intervals(spark).drop("g")
    got = interval_join(pts, ivs, bucket_seconds=60)
    want = _naive(pts, ivs, [])
    cols = sorted(got.columns)
    g = sorted(map(tuple, got.select(cols).collect()))
    w = sorted(map(tuple, want.select(cols).collect()))
    assert g == w and len(g) > 0


def test_interval_join_end_exclusive(spark):
    pts = spark.createDataFrame(
        [Row(ts=TS(2024, 1, 1, 1, 0), pid=1), Row(ts=TS(2024, 1, 1, 0, 0), pid=2)]
    )
    ivs = spark.createDataFrame(
        [Row(iid=7, start_ts=TS(2024, 1, 1, 0, 0), end_ts=TS(2024, 1, 1, 1, 0))]
    )
    out = interval_join(pts, ivs).collect()
    # start inclusive, end exclusive
    assert [r.pid for r in out] == [2]


def test_interval_join_is_equi_join(spark):
    """The physical plan must hash on the bucket key — never the
    BroadcastNestedLoopJoin a plain range theta-join lowers to."""
    plan = interval_join(
        _points(spark), _intervals(spark), on=["g"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
    assert ("HashJoin" in plan) or ("SortMergeJoin" in plan)


def _ivals(spark, name, rows):
    return spark.createDataFrame(
        [
            Row(
                **{
                    f"{name}_id": i,
                    "g": g,
                    f"{name}_start": TS(2024, 1, d0, h0, m0),
                    f"{name}_end": TS(2024, 1, d1, h1, m1),
                }
            )
            for i, (g, (d0, h0, m0), (d1, h1, m1)) in enumerate(rows)
        ]
    )


def test_overlap_join_semantics(spark):
    """Overlap, containment, abutment, cross-key, multi-bucket spans —
    checked against a brute-force cross-join oracle."""
    from socialmapper_spark.operators.temporal import interval_overlap_join

    left = _ivals(
        spark,
        "a",
        [
            ("x", (1, 0, 0), (1, 2, 0)),    # 00:00-02:00
            ("x", (1, 2, 0), (1, 3, 0)),    # abuts previous: no match
            ("x", (1, 1, 0), (2, 1, 0)),    # 24h span (many buckets)
            ("y", (1, 0, 30), (1, 0, 45)),  # other key
        ],
    )
    right = _ivals(
        spark,
        "b",
        [
            ("x", (1, 1, 30), (1, 1, 45)),  # inside a0 and a2
            ("x", (1, 2, 0), (1, 2, 30)),   # abuts a0, inside a2, = a1 start
            ("x", (2, 0, 0), (2, 5, 0)),    # overlaps a2 tail only
            ("y", (1, 0, 40), (1, 1, 0)),   # overlaps the y interval
        ],
    )
    got = sorted(
        (r.a_id, r.b_id)
        for r in interval_overlap_join(
            left,
            right,
            left_start="a_start",
            left_end="a_end",
            right_start="b_start",
            right_end="b_end",
            on=["g"],
            bucket_seconds=1800,
        ).collect()
    )
    # brute-force oracle on the same frames
    lc, rc = left.collect(), right.collect()
    want = sorted(
        (a.a_id, b.b_id)
        for a in lc
        for b in rc
        if a.g == b.g and a.a_start < b.b_end and b.b_start < a.a_end
    )
    assert got == want
    assert (0, 0) in got and (2, 2) in got  # overlap + tail-overlap
    assert (1, 0) not in got  # abutting intervals don't match


def test_overlap_join_no_nlj_no_distinct(spark):
    from socialmapper_spark.operators.temporal import interval_overlap_join

    left = _ivals(spark, "a", [("x", (1, 0, 0), (1, 2, 0))])
    right = _ivals(spark, "b", [("x", (1, 1, 0), (1, 3, 0))])
    out = interval_overlap_join(
        left, right, "a_start", "a_end", "b_start", "b_end", on=["g"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_overlap_join_column_clash_rejected(spark):
    from socialmapper_spark.operators.temporal import interval_overlap_join

    left = _ivals(spark, "a", [("x", (1, 0, 0), (1, 2, 0))])
    right = _ivals(spark, "a", [("x", (1, 1, 0), (1, 3, 0))])
    with pytest.raises(ValueError, match="collide"):
        interval_overlap_join(left, right, "a_start", "a_end", "a_start", "a_end", on=["g"])


def test_asof_strategies_agree_on_null_keys_and_ts(spark):
    """Right rows with NULL keys or NULL ts are never pickable under
    compact (NULL equi-join / NULL <= ts); the union strategy's window
    would group/sort them in — both must return identical rows."""
    left = spark.createDataFrame(
        [Row(k="a", ts=TS(2024, 1, 2), ev=1), Row(k=None, ts=TS(2024, 1, 2), ev=2)]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", snap_ts=TS(2024, 1, 1), v=1.0),
            Row(k=None, snap_ts=TS(2024, 1, 1), v=99.0),  # NULL key
            Row(k="a", snap_ts=None, v=88.0),  # NULL ts
        ]
    )
    outs = {
        st: sorted(
            asof_join(left, right, on="k", left_ts="ts", strategy=st).collect(),
            key=lambda r: r.ev,
        )
        for st in ("compact", "union")
    }
    assert outs["compact"] == outs["union"]
    assert outs["compact"][0].v == 1.0  # real snapshot picked
    assert outs["compact"][1].v is None  # NULL-key left row: no match


def test_degenerate_interval_yields_no_buckets(spark):
    """end <= start must produce ZERO bucket replicas, not a descending
    sequence spanning years (the sequence(b0, b1<b0) blow-up)."""
    from socialmapper_spark.operators.temporal import (
        interval_join,
        interval_overlap_join,
    )

    pts = spark.createDataFrame([Row(g="x", ts=TS(2024, 1, 1, 1))])
    bad = spark.createDataFrame(
        [Row(iid=1, g="x", start_ts=TS(2026, 1, 1), end_ts=TS(1970, 1, 2))]
    )
    out = interval_join(pts, bad, point_ts="ts", on=["g"])
    assert out.count() == 0
    # overlap form: the degenerate side simply drops out
    good = spark.createDataFrame(
        [Row(jid=1, g="x", s2=TS(2024, 1, 1), e2=TS(2024, 1, 2))]
    )
    out2 = interval_overlap_join(
        bad.withColumnRenamed("start_ts", "s1").withColumnRenamed("end_ts", "e1"),
        good, "s1", "e1", "s2", "e2", on=["g"],
    )
    assert out2.count() == 0


def test_interval_join_column_clash_rejected(spark):
    from socialmapper_spark.operators.temporal import interval_join

    pts = spark.createDataFrame([Row(g="x", ts=TS(2024, 1, 1, 1), label="p")])
    iv = spark.createDataFrame(
        [Row(g="x", start_ts=TS(2024, 1, 1), end_ts=TS(2024, 1, 2), label="i")]
    )
    with pytest.raises(ValueError, match="collide"):
        interval_join(pts, iv, point_ts="ts", on=["g"])


def test_asof_randomized_strategy_parity_and_oracle(spark):
    """Seeded random frames (duplicate ts, ties, NULL keys, NULL ts):
    compact == union == a Python brute-force as-of oracle."""
    import random

    rng = random.Random(42)
    base = dt.datetime(2024, 1, 1)
    keys = ["a", "b", "c", None]
    lrows = [
        Row(
            k=rng.choice(keys),
            ts=base + dt.timedelta(minutes=rng.randrange(0, 500)),
            ev=i,
        )
        for i in range(200)
    ]
    rrows = [
        Row(
            k=rng.choice(keys),
            snap_ts=(
                None
                if rng.random() < 0.1
                else base + dt.timedelta(minutes=rng.randrange(0, 500))
            ),
            v=float(rng.randrange(0, 50)),
        )
        for i in range(60)
    ]
    left = spark.createDataFrame(lrows)
    right = spark.createDataFrame(rrows)
    outs = {}
    for st in ("compact", "union"):
        outs[st] = sorted(
            (r.ev, r.v, r.snap_ts)
            for r in asof_join(
                left, right, on="k", left_ts="ts", strategy=st
            ).collect()
        )
    assert outs["compact"] == outs["union"]
    # brute force: max (snap_ts, v) among non-null-key/ts rows with
    # snap_ts <= ts and same key (greatest payload breaks ts ties)
    def pick(lr):
        cands = [
            (rr.snap_ts, rr.v)
            for rr in rrows
            if rr.k is not None
            and rr.snap_ts is not None
            and lr.k == rr.k
            and rr.snap_ts <= lr.ts
        ]
        return max(cands) if cands else (None, None)

    want = sorted((lr.ev, pick(lr)[1], pick(lr)[0]) for lr in lrows)
    assert outs["compact"] == want


def test_overlap_randomized_brute_force_parity(spark):
    """Seeded random interval sets (degenerates, ties, multi-bucket
    spans) vs the quadratic Python oracle."""
    import random

    from socialmapper_spark.operators.temporal import interval_overlap_join

    rng = random.Random(7)
    base = dt.datetime(2024, 1, 1)

    def mk(n, pid):
        rows = []
        for i in range(n):
            s = base + dt.timedelta(minutes=rng.randrange(0, 300))
            # ~15% degenerate or empty (end <= start)
            delta = rng.randrange(-30, 120)
            rows.append(
                Row(
                    **{
                        f"{pid}_id": i,
                        "g": rng.choice(["x", "y"]),
                        f"{pid}_start": s,
                        f"{pid}_end": s + dt.timedelta(minutes=delta),
                    }
                )
            )
        return rows

    lrows, rrows = mk(80, "a"), mk(80, "b")
    out = interval_overlap_join(
        spark.createDataFrame(lrows),
        spark.createDataFrame(rrows),
        "a_start", "a_end", "b_start", "b_end",
        on=["g"], bucket_seconds=1800,
    )
    got = sorted((r.a_id, r.b_id) for r in out.collect())
    # the strict-inequality pair test only MEANS "overlap" for
    # non-degenerate intervals; an empty interval (end <= start)
    # overlaps nothing, which is exactly what the operator returns
    want = sorted(
        (a.a_id, b.b_id)
        for a in lrows
        for b in rrows
        if a.g == b.g
        and a.a_end > a.a_start
        and b.b_end > b.b_start
        and a.a_start < b.b_end
        and b.b_start < a.a_end
    )
    assert got == want
