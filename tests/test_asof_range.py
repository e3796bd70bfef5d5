"""Edge semantics for the temporal joins: as-of NULL-before-first and
equal-timestamp matching; range-join closed/open interval boundaries."""

import pandas as pd
from pyspark.sql import functions as F

from europe_gis_spark.operators.asof import asof_join, range_join


def test_asof_edges(spark):
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 1, 2],
                "ts_s": [5, 10, 20, 10],
                "ev": ["before", "at", "after", "otherkey"],
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1], "ts_s": [10, 15], "snap": ["s10", "s15"]})
    )
    got = {
        r.ev: r.snap
        for r in asof_join(left, right, on=["k"], ts_col="ts_s", value_cols=["snap"]).collect()
    }
    assert got["before"] is None  # no prior snapshot
    assert got["at"] == "s10"  # equal timestamp matches (<=)
    assert got["after"] == "s15"  # latest prior, not first
    assert got["otherkey"] is None  # key isolation: k=2 has no snapshots


def test_asof_null_values_carried_atomically(spark):
    """A right row whose value column is legitimately NULL must win over
    an OLDER non-NULL snapshot (DuckDB ASOF semantics), and multiple
    value_cols must come from the SAME right row — never torn."""
    left = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1], "ts_s": [12, 30], "ev": ["mid", "late"]})
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 1],
                "ts_s": [5, 10, 20],
                "a": [1.0, None, 3.0],
                "b": [None, 2.0, None],
            }
        )
    )
    got = {
        r.ev: (r.a, r.b)
        for r in asof_join(
            left, right, on=["k"], ts_col="ts_s", value_cols=["a", "b"]
        ).collect()
    }
    # at ts 12 the latest snapshot is ts=10: a=NULL (not the older 1.0),
    # b=2.0 — both from the ts=10 row
    assert got["mid"] == (None, 2.0)
    # at ts 30 the latest is ts=20: a=3.0, b=NULL (not torn to b=2.0)
    assert got["late"] == (3.0, None)


def test_range_join_boundaries(spark):
    pts = spark.createDataFrame(
        pd.DataFrame({"pid": [1, 2, 3], "v": [10.0, 20.0, 19.999999]})
    )
    iv = spark.createDataFrame(
        pd.DataFrame({"label": ["a"], "lo": [10.0], "hi": [20.0]})
    )
    got = {
        r.pid
        for r in range_join(pts, iv, "v", "lo", "hi", bucket=7.0).collect()
    }
    assert got == {1, 3}  # lo inclusive, hi exclusive
    # bucket width far larger than intervals still exact
    got2 = {
        r.pid
        for r in range_join(pts, iv, "v", "lo", "hi", bucket=1000.0).collect()
    }
    assert got2 == {1, 3}


def test_asof_forward_direction(spark):
    """Forward as-of: earliest right row at-or-after each left ts;
    equal timestamps match; NULL when nothing follows."""
    left = spark.createDataFrame(
        [(1, 10), (1, 25), (1, 40), (2, 5)], "k long, t long"
    )
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 30, "b"), (2, 1, "z")], "k long, t long, v string"
    )
    from europe_gis_spark.operators import asof

    got = {
        (r.k, r.t): r.v
        for r in asof.asof_join(
            left, right, on=["k"], ts_col="t", value_cols=["v"],
            direction="forward",
        ).collect()
    }
    assert got == {(1, 10): "a", (1, 25): "b", (1, 40): None, (2, 5): None}
    import pytest as _pt

    with _pt.raises(ValueError, match="backward|forward"):
        asof.asof_join(left, right, ["k"], "t", ["v"], direction="fwd")


def test_gap_fill_locf_hand_computed(spark):
    """Dense grid, empty buckets carried forward, deterministic
    in-bucket last under same-timestamp ties (event_id breaks)."""
    import datetime as dt

    import pandas as pd

    from europe_gis_spark.operators import asof

    t = lambda d, h=0: dt.datetime(2024, 1, d, h)  # noqa: E731
    ev = spark.createDataFrame(
        pd.DataFrame(
            {
                "event_id": [1, 2, 3, 4, 5],
                "user_id": [7, 7, 7, 7, 9],
                "ts": [t(1, 5), t(1, 9), t(3, 2), t(3, 2), t(2)],
                "value": [10.0, 20.0, 30.0, 40.0, 5.0],
            }
        )
    )
    got = {
        (r.user_id, r.bucket.day): (r.n_events, r.sum_value, r.filled_value)
        for r in asof.gap_fill_locf(ev, "user_id", "ts", "value").collect()
    }
    assert got[(7, 1)] == (2, 30.0, 20.0)  # last of day 1 is ts 09:00
    assert got[(7, 2)] == (0, 0.0, 20.0)  # gap day: carried forward
    # day 3: two events at the SAME ts — max event_id (4) wins
    assert got[(7, 3)] == (2, 70.0, 40.0)
    assert got[(9, 2)] == (1, 5.0, 5.0)
    assert set(got) == {(7, 1), (7, 2), (7, 3), (9, 2)}


def test_merge_intervals_hand_computed(spark):
    """Overlap merges, touching merges (half-open), gap splits; keys
    independent."""
    import pandas as pd

    from europe_gis_spark.operators import asof

    spans = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 1, 1, 2, 2],
                "lo": [0, 5, 10, 40, 0, 100],
                "hi": [7, 12, 20, 45, 3, 110],
            }
        )
    )
    got = sorted(
        (r.k, r.span_lo, r.span_hi, r.n_merged)
        for r in asof.merge_intervals(spans, "k", "lo", "hi").collect()
    )
    # [0,7)+[5,12)+[10,20) chain-merge; [40,45) separate
    assert got == [
        (1, 0, 20, 3),
        (1, 40, 45, 1),
        (2, 0, 3, 1),
        (2, 100, 110, 1),
    ]
    # touching: [0,5) + [5,9) merge (half-open adjacency)
    touch = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1], "lo": [0, 5], "hi": [5, 9]})
    )
    got2 = [
        (r.span_lo, r.span_hi, r.n_merged)
        for r in asof.merge_intervals(touch, "k", "lo", "hi").collect()
    ]
    assert got2 == [(0, 9, 2)]


def test_scd2_history_hand_computed(spark):
    import datetime as dt

    import pandas as pd

    from europe_gis_spark.operators import asof

    t = lambda d: dt.datetime(2024, 3, d)  # noqa: E731
    ev = spark.createDataFrame(
        pd.DataFrame(
            {
                "event_id": [1, 2, 3, 4, 5, 6],
                "k": [1, 1, 1, 1, 1, 2],
                "ts": [t(1), t(2), t(3), t(4), t(5), t(9)],
                "attr": ["a", "a", "b", "b", "a", "z"],
            }
        )
    )
    rows = sorted(
        (r.k, r.attr, r.valid_from.day,
         r.valid_to.day if r.valid_to else None, r.is_current)
        for r in asof.scd2_history(
            ev, "k", "ts", "attr", order_col="event_id"
        ).collect()
    )
    assert rows == [
        (1, "a", 1, 3, False),
        (1, "a", 5, None, True),
        (1, "b", 3, 5, False),
        (2, "z", 9, None, True),
    ]


def test_merge_intervals_random_vs_bruteforce(spark):
    import numpy as np
    import pandas as pd

    from europe_gis_spark.operators import asof

    rng = np.random.default_rng(17)
    n = 400
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 8, n),
            "lo": rng.integers(0, 300, n),
        }
    )
    df["hi"] = df["lo"] + rng.integers(1, 40, n)
    got = sorted(
        (r.k, r.span_lo, r.span_hi, r.n_merged)
        for r in asof.merge_intervals(
            spark.createDataFrame(df), "k", "lo", "hi"
        ).collect()
    )
    ref = []
    for k, grp in df.groupby("k"):
        spans = sorted(zip(grp.lo, grp.hi))
        cur_lo, cur_hi, cnt = None, None, 0
        for lo, hi in spans:
            if cur_lo is None or lo > cur_hi:
                if cur_lo is not None:
                    ref.append((k, cur_lo, cur_hi, cnt))
                cur_lo, cur_hi, cnt = lo, hi, 1
            else:
                cur_hi = max(cur_hi, hi)
                cnt += 1
        ref.append((k, cur_lo, cur_hi, cnt))
    assert got == sorted(ref)


def test_scd2_history_random_vs_bruteforce(spark):
    import datetime as dt

    import numpy as np
    import pandas as pd

    from europe_gis_spark.operators import asof

    rng = np.random.default_rng(23)
    n = 300
    df = pd.DataFrame(
        {
            "event_id": range(n),
            "k": rng.integers(0, 6, n),
            "ts": [
                dt.datetime(2024, 1, 1) + dt.timedelta(hours=int(h))
                # duplicate timestamps on purpose: tie-break must hold
                for h in rng.integers(0, 120, n)
            ],
            "attr": rng.integers(0, 3, n),
        }
    )
    got = {
        (r.k, r.attr, r.valid_from, r.valid_to, r.is_current)
        for r in asof.scd2_history(
            spark.createDataFrame(df), "k", "ts", "attr", order_col="event_id"
        ).collect()
    }
    ref = []
    for k, grp in df.sort_values(["ts", "event_id"]).groupby("k"):
        rows = list(grp.itertuples())
        changes = [
            r for i, r in enumerate(rows)
            if i == 0 or r.attr != rows[i - 1].attr
        ]
        for i, r in enumerate(changes):
            nxt = changes[i + 1].ts if i + 1 < len(changes) else None
            ref.append(
                (k, r.attr, r.ts.to_pydatetime(),
                 nxt.to_pydatetime() if nxt is not None else None,
                 nxt is None)
            )
    assert got == set(ref)


def test_stay_points_islands_and_single_exchange(spark):
    import pytest
    """Hand-built trajectory: two dwell clusters separated by a long
    hop, plus a singleton user. Islands, durations, and exact
    centroids must match; the island aggregation must reuse the
    window's user-keyed exchange (ONE Exchange in the whole plan)."""
    import datetime as dt

    from europe_gis_spark.operators import trajectory

    t0 = dt.datetime(2024, 1, 1)

    def row(eid, user, minutes, x, y):
        return (eid, user, t0 + dt.timedelta(minutes=minutes), float(x), float(y))

    rows = [
        # user 1: dwell A (3 pts, 90 min), hop, dwell B (2 pts, 60 min)
        row(1, 1, 0, 0.5, 0.5),
        row(2, 1, 45, 3.5, 4.5),   # step 5 <= r
        row(3, 1, 90, 0.5, 0.5),
        row(4, 1, 120, 100.5, 100.5),  # hop > r starts island 2
        row(5, 1, 180, 103.5, 104.5),
        # user 2: single point (duration 0 -> filtered)
        row(6, 2, 0, 50.5, 50.5),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, x double, y double"
    )
    out = trajectory.stay_points(df, radius=6.0, min_duration_s=3600)
    got = {(r.user_id, r.island): r for r in out.collect()}
    assert set(got) == {(1, 1), (1, 2)}
    a = got[(1, 1)]
    assert a.n_points == 3 and a.cx == pytest.approx(1.5) and a.cy == pytest.approx(1.8333333333333333, abs=1e-6)
    assert (a.end_ts - a.start_ts).total_seconds() == 5400
    b = got[(1, 2)]
    assert b.n_points == 2 and b.cx == 102.0 and b.cy == 102.5
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1, final


def test_trip_stats_exact_integer_lengths(spark):
    """Hand trajectory across a day boundary: integer-mm step sums,
    max step, and net displacement match a brute-force recompute; a
    single-point day reports zeros; ONE exchange total."""
    import datetime as dt
    import math

    from europe_gis_spark.operators import trajectory

    t0 = dt.datetime(2024, 3, 1)
    rows = [
        (1, 7, t0 + dt.timedelta(minutes=0), 0.5, 0.5),
        (2, 7, t0 + dt.timedelta(minutes=10), 3.5, 4.5),
        (3, 7, t0 + dt.timedelta(minutes=20), 0.25, 0.5),
        (4, 7, t0 + dt.timedelta(days=1), 9.5, 9.5),  # next day: own group
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, x double, y double"
    )
    out = trajectory.trip_stats(df)
    got = {(r.user_id, str(r.day)): r for r in out.collect()}
    d1 = got[(7, "2024-03-01")]
    s1 = math.floor(math.sqrt(3.0**2 + 4.0**2) * 1000)
    s2 = math.floor(math.sqrt(3.25**2 + 4.0**2) * 1000)
    assert (d1.n_points, d1.n_steps) == (3, 2)
    assert d1.total_mm == s1 + s2 and d1.max_step_mm == s2
    assert d1.net_mm == math.floor(math.sqrt(0.25**2) * 1000)
    d2 = got[(7, "2024-03-02")]
    assert (d2.n_points, d2.n_steps, d2.total_mm, d2.max_step_mm, d2.net_mm) == (1, 0, 0, 0, 0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1, final


def test_transition_matrix_hand_computed(spark):
    """Per-key ordered state sequences → first-order transition
    counts; NULL states break chains; keys independent."""
    from europe_gis_spark.operators import trajectory

    rows = [
        (1, 1, "A"), (1, 2, "B"), (1, 3, "B"), (1, 4, None), (1, 5, "A"),
        (2, 1, "B"), (2, 2, "A"),
    ]
    df = spark.createDataFrame(rows, "k long, t long, s string")
    got = {
        (r.from_state, r.to_state): r.n_transitions
        for r in trajectory.transition_matrix(df, "k", "t", "s").collect()
    }
    # NULL at t=4 kills both (B->NULL) and (NULL->A)
    assert got == {("A", "B"): 1, ("B", "B"): 1, ("B", "A"): 1}
