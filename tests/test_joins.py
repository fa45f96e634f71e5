"""Join operators on hand-built data: as-of, interval, broadcast."""

import datetime as dt

from pyspark.sql import functions as F

from faust_spark.joins import asof_join, global_lookup, interval_join


def ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def test_asof_backward_basic(spark):
    left = spark.createDataFrame(
        [("k", ts(10), "L10"), ("k", ts(20), "L20"), ("k", ts(5), "L5")],
        ["k", "t", "lv"],
    )
    right = spark.createDataFrame(
        [("k", ts(8), "R8"), ("k", ts(15), "R15"), ("k", ts(20), "R20")],
        ["k", "t", "rv"],
    )
    out = {
        r.lv: r.rv
        for r in asof_join(left, right, "k", "t", "t").collect()
    }
    # ts=5 → no earlier right row; ts=10 → R8; ts=20 → R20 (ties match)
    assert out == {"L5": None, "L10": "R8", "L20": "R20"}


def test_asof_tiebreak_picks_max(spark):
    left = spark.createDataFrame([("k", ts(30), "L")], ["k", "t", "lv"])
    right = spark.createDataFrame(
        [("k", ts(10), 1, "first"), ("k", ts(10), 9, "ninth")],
        ["k", "t", "seq", "rv"],
    )
    out = asof_join(
        left, right, "k", "t", "t", right_tiebreak="seq"
    ).collect()
    assert out[0].rv == "ninth"


def test_asof_tiebreak_chain_total_order(spark):
    """A SEQUENCE tiebreak compares lexicographically: when the first
    column collides within (key, ts) — as the sf0.1 lineitem fixture
    does on (orderkey, shipdate, linenumber) — the second column must
    decide, in both directions, so the pick is deterministic."""
    left = spark.createDataFrame([("k", ts(30), "L")], ["k", "t", "lv"])
    right = spark.createDataFrame(
        [
            ("k", ts(10), 9, 2.0, "nine-two"),
            ("k", ts(10), 9, 7.0, "nine-seven"),
            ("k", ts(10), 1, 99.0, "one-99"),
        ],
        ["k", "t", "seq", "price", "rv"],
    )
    back = asof_join(
        left, right, "k", "t", "t", right_tiebreak=("seq", "price")
    ).collect()
    assert back[0].rv == "nine-seven"  # max seq, then max price
    fleft = spark.createDataFrame([("k", ts(5), "L")], ["k", "t", "lv"])
    fwd = asof_join(
        fleft, right, "k", "t", "t", direction="forward",
        right_tiebreak=["seq", "price"],
    ).collect()
    assert fwd[0].rv == "nine-seven"
    import pytest

    with pytest.raises(ValueError, match="right_tiebreak"):
        asof_join(
            left, right, "k", "t", "t", right_tiebreak=("seq", "nope")
        )


def test_asof_forward_basic(spark):
    left = spark.createDataFrame(
        [("k", ts(10), "L10"), ("k", ts(20), "L20"), ("k", ts(25), "L25")],
        ["k", "t", "lv"],
    )
    right = spark.createDataFrame(
        [("k", ts(8), "R8"), ("k", ts(15), "R15"), ("k", ts(20), "R20")],
        ["k", "t", "rv"],
    )
    out = {
        r.lv: r.rv
        for r in asof_join(
            left, right, "k", "t", "t", direction="forward"
        ).collect()
    }
    # ts=10 → R15 (earliest >=); ts=20 → R20 (ties match); ts=25 → none
    assert out == {"L10": "R15", "L20": "R20", "L25": None}


def test_asof_forward_tiebreak_picks_max(spark):
    left = spark.createDataFrame([("k", ts(5), "L")], ["k", "t", "lv"])
    right = spark.createDataFrame(
        [("k", ts(10), 1, "first"), ("k", ts(10), 9, "ninth")],
        ["k", "t", "seq", "rv"],
    )
    out = asof_join(
        left, right, "k", "t", "t", direction="forward",
        right_tiebreak="seq",
    ).collect()
    assert out[0].rv == "ninth"


def test_asof_nearest_basic_and_tie_backward(spark):
    """direction="nearest" picks whichever side is closer in time; an
    EQUIDISTANT pair resolves backward (documented contract)."""
    left = spark.createDataFrame(
        [
            ("k", ts(10), "Lnear_b"),   # b at 9 (d=1), f at 14 (d=4)
            ("k", ts(13), "Lnear_f"),   # b at 9 (d=4), f at 14 (d=1)
            ("k", ts(19), "Ltie"),      # b at 14 (d=5), f at 24 (d=5)
            ("k", ts(3), "Lonly_f"),    # nothing at/under 3
            ("k", ts(30), "Lonly_b"),   # nothing at/over 30
        ],
        ["k", "t", "lv"],
    )
    right = spark.createDataFrame(
        [("k", ts(9), "R9"), ("k", ts(14), "R14"), ("k", ts(24), "R24")],
        ["k", "t", "rv"],
    )
    out = {
        r.lv: r.rv
        for r in asof_join(
            left, right, "k", "t", "t", direction="nearest"
        ).collect()
    }
    assert out == {
        "Lnear_b": "R9",
        "Lnear_f": "R14",
        "Ltie": "R14",      # equidistant → backward
        "Lonly_f": "R9",
        "Lonly_b": "R24",
    }


def test_asof_nearest_mixed_timestamp_left_date_right(spark):
    """nearest must promote EACH time column by its OWN type: a
    timestamp left with a DATE right widens __ts to timestamp while the
    carried right ts stays DateType, whose direct cast to double is
    invalid — the distance math promotes per-column."""
    import datetime as dt

    left = spark.createDataFrame(
        [("k", ts(50), "L")], ["k", "t", "lv"]
    )  # ts(50) = 2024-01-01 00:00:50
    right = spark.createDataFrame(
        [
            ("k", dt.date(2023, 12, 30), "Rback"),
            ("k", dt.date(2024, 1, 2), "Rfwd"),
        ],
        ["k", "d", "rv"],
    )
    out = asof_join(
        left, right, "k", "t", "d", direction="nearest"
    ).collect()
    # backward candidate is ~2 days away, forward ~1 day → forward wins
    assert out[0].rv == "Rfwd"


def test_asof_nearest_matches_pandas_merge_asof(spark):
    """Randomized cross-check against pandas.merge_asof nearest mode
    (equidistant rows are excluded from the comparison — pandas' own
    tie rule is asserted separately above as OUR backward contract)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(23)
    n_l, n_r = 120, 80
    lpd = pd.DataFrame(
        {
            "k": rng.integers(0, 5, n_l).astype("int64"),
            "t": rng.integers(0, 10_000, n_l).astype("int64"),
            "lid": np.arange(n_l, dtype="int64"),
        }
    )
    rpd = (
        pd.DataFrame(
            {
                "k": rng.integers(0, 5, n_r).astype("int64"),
                "t": rng.integers(0, 10_000, n_r).astype("int64"),
                "rv": rng.integers(0, 1_000_000, n_r).astype("int64"),
            }
        )
        .drop_duplicates(["k", "t"])
        .reset_index(drop=True)
    )
    # equidistant (backward, forward) candidates: tie-rule territory
    ties = set()
    for _, lrow in lpd.iterrows():
        rts = rpd.loc[rpd.k == lrow.k, "t"]
        back = lrow.t - rts[rts <= lrow.t].max() if (rts <= lrow.t).any() else None
        fwd = rts[rts >= lrow.t].min() - lrow.t if (rts >= lrow.t).any() else None
        if back is not None and fwd is not None and back == fwd and back > 0:
            ties.add(int(lrow.lid))
    expected = pd.merge_asof(
        lpd.sort_values(["t", "lid"]).reset_index(drop=True),
        rpd.sort_values("t").reset_index(drop=True),
        on="t",
        by="k",
        direction="nearest",
    ).set_index("lid")["rv"]
    got = {
        r.lid: r.rv
        for r in asof_join(
            spark.createDataFrame(lpd),
            spark.createDataFrame(rpd),
            on="k",
            left_ts="t",
            right_ts="t",
            direction="nearest",
        ).collect()
    }
    checked = 0
    for lid, rv in expected.items():
        if lid in ties:
            continue
        g = got[lid]
        if pd.isna(rv):
            assert g is None
        else:
            assert g == int(rv)
        checked += 1
    assert checked >= 100  # the tie exclusion must not hollow the test


def test_asof_forward_matches_pandas_merge_asof(spark):
    """Randomized cross-check against pandas.merge_asof forward mode."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    n_l, n_r = 120, 80
    lpd = pd.DataFrame(
        {
            "k": rng.integers(0, 5, n_l).astype("int64"),
            "t": rng.integers(0, 10_000, n_l).astype("int64"),
            "lid": np.arange(n_l, dtype="int64"),
        }
    )
    rpd = pd.DataFrame(
        {
            "k": rng.integers(0, 5, n_r).astype("int64"),
            "t": rng.integers(0, 10_000, n_r).astype("int64"),
            "rv": rng.integers(0, 1_000_000, n_r).astype("int64"),
        }
    ).drop_duplicates(["k", "t"]).reset_index(drop=True)
    expected = pd.merge_asof(
        lpd.sort_values(["t", "lid"]).reset_index(drop=True),
        rpd.sort_values("t").reset_index(drop=True),
        on="t",
        by="k",
        direction="forward",
    ).set_index("lid")["rv"]
    got = {
        r.lid: r.rv
        for r in asof_join(
            spark.createDataFrame(lpd),
            spark.createDataFrame(rpd),
            on="k",
            left_ts="t",
            right_ts="t",
            direction="forward",
        ).collect()
    }
    for lid, rv in expected.items():
        g = got[lid]
        if pd.isna(rv):
            assert g is None
        else:
            assert g == int(rv)


def test_interval_join_keyed(spark):
    left = spark.createDataFrame([("k", ts(100))], ["k", "t"])
    right = spark.createDataFrame(
        [("k", ts(95)), ("k", ts(100)), ("k", ts(104)), ("k", ts(120))],
        ["k", "t"],
    )
    out = interval_join(
        left, right, "t", "t", before=5.0, after=5.0, on="k"
    )
    assert out.count() == 3  # 95, 100, 104 in [95, 105]; 120 out


def test_interval_join_keyless_bucketized(spark):
    left = spark.createDataFrame([(ts(100),)], ["t"])
    right = spark.createDataFrame(
        [(ts(s),) for s in (90, 99, 101, 111)], ["t"]
    )
    out = interval_join(left, right, "t", "t", before=10.0, after=10.0)
    assert out.count() == 3  # 90, 99, 101 within ±10s; 111 out


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized cross-check against pandas.merge_asof (seeded)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    for trial in range(3):
        n_l, n_r = 120, 80
        lpd = pd.DataFrame(
            {
                "k": rng.integers(0, 5, n_l).astype("int64"),
                "t": rng.integers(0, 10_000, n_l).astype("int64"),
                "lid": np.arange(n_l, dtype="int64"),
            }
        )
        rpd = pd.DataFrame(
            {
                "k": rng.integers(0, 5, n_r).astype("int64"),
                "t": rng.integers(0, 10_000, n_r).astype("int64"),
                "rv": rng.integers(0, 1_000_000, n_r).astype("int64"),
            }
        )
        # merge_asof takes the LAST right row <= t; ties on (k, t) in the
        # right frame are resolved by position, so make (k, t) unique
        rpd = rpd.drop_duplicates(["k", "t"]).reset_index(drop=True)
        expected = pd.merge_asof(
            lpd.sort_values(["t", "lid"]).reset_index(drop=True),
            rpd.sort_values("t").reset_index(drop=True),
            on="t",
            by="k",
            direction="backward",
        ).set_index("lid")["rv"]

        out = asof_join(
            spark.createDataFrame(lpd),
            spark.createDataFrame(rpd),
            on="k",
            left_ts="t",
            right_ts="t",
        ).collect()
        got = {r.lid: r.rv for r in out}
        for lid, rv in expected.items():
            g = got[lid]
            if pd.isna(rv):
                assert g is None, f"trial {trial} lid {lid}: {g} != NaN"
            else:
                assert g == int(rv), f"trial {trial} lid {lid}: {g} != {rv}"


def test_interval_join_matches_pandas(spark):
    """Randomized cross-check of keyed AND keyless (bucketized) interval
    joins against a pandas nested-loop reference."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    n_l, n_r = 60, 90
    lpd = pd.DataFrame(
        {
            "k": rng.integers(0, 4, n_l).astype("int64"),
            "lt": rng.integers(0, 5000, n_l).astype("int64"),
            "lid": np.arange(n_l, dtype="int64"),
        }
    )
    rpd = pd.DataFrame(
        {
            "k": rng.integers(0, 4, n_r).astype("int64"),
            "rt": rng.integers(0, 5000, n_r).astype("int64"),
            "rid": np.arange(n_r, dtype="int64"),
        }
    )
    before, after = 120.0, 45.0
    base = dt.datetime(2024, 1, 1)

    def to_ts(s):
        return base + dt.timedelta(seconds=int(s))

    l = spark.createDataFrame(
        [(int(r.k), to_ts(r.lt), int(r.lid)) for r in lpd.itertuples()],
        "k long, t timestamp, lid long",
    )
    r = spark.createDataFrame(
        [(int(x.k), to_ts(x.rt), int(x.rid)) for x in rpd.itertuples()],
        "k long, t timestamp, rid long",
    )
    # pandas reference (nested loop)
    ref_keyed = {
        (int(a.lid), int(b.rid))
        for a in lpd.itertuples()
        for b in rpd.itertuples()
        if a.k == b.k and a.lt - before <= b.rt <= a.lt + after
    }
    got_keyed = {
        (x["lid"], x["rid"])
        for x in interval_join(
            l, r, "t", "t", before=before, after=after, on="k"
        ).collect()
    }
    assert got_keyed == ref_keyed

    ref_keyless = {
        (int(a.lid), int(b.rid))
        for a in lpd.itertuples()
        for b in rpd.itertuples()
        if a.lt - before <= b.rt <= a.lt + after
    }
    got_keyless = {
        (x["lid"], x["rid"])
        for x in interval_join(
            l, r, "t", "t", before=before, after=after
        ).collect()
    }
    assert got_keyless == ref_keyless


def test_global_lookup_is_broadcast(spark):
    fact = spark.createDataFrame([(1, "x"), (2, "y")], ["k", "v"])
    dim = spark.createDataFrame([(1, "dim1")], ["k", "name"])
    out = global_lookup(fact, dim, on="k", how="left")
    assert out.count() == 2
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_interval_join_keyless_subsecond(spark):
    """Sub-second timestamps with fractional width must not lose matches.

    Regression: bucket ids computed from unix_timestamp (whole seconds)
    let the bucket delta reach 2 with width=1.5 — left ts=1.9s landed in
    bucket 0, right ts=3.3s in bucket 2, and the ±1 probe missed a pair
    with diff 1.4 <= after=1.5. Buckets now come from the double epoch.
    """
    def fts(s):
        return dt.datetime(2024, 1, 1) + dt.timedelta(milliseconds=int(s * 1000))

    left = spark.createDataFrame([(fts(1.9), "L")], ["lt", "lv"])
    right = spark.createDataFrame([(fts(3.3), "R")], ["rt", "rv"])
    out = interval_join(left, right, "lt", "rt", before=0.0, after=1.5).collect()
    assert len(out) == 1 and out[0].rv == "R"
    # and the symmetric miss stays a miss (diff 1.6 > 1.5)
    right2 = spark.createDataFrame([(fts(3.5), "R")], ["rt", "rv"])
    assert interval_join(left, right2, "lt", "rt", 0.0, 1.5).count() == 0


def test_asof_output_columns_unique_and_selectable(spark):
    """Regression: left_ts/right_ts rode along in lcols/rcols, emitting
    duplicate column names; out.select(left_ts) raised AMBIGUOUS_REFERENCE."""
    left = spark.createDataFrame([("k", ts(10), "L")], ["k", "t", "lv"])
    right = spark.createDataFrame([("k", ts(8), "R")], ["k", "t", "rv"])
    out = asof_join(left, right, "k", "t", "t")
    assert len(out.columns) == len(set(out.columns)) == 5
    assert out.select("t").collect()[0].t == ts(10)
    row = out.collect()[0]
    assert row.t_right == ts(8) and row.rv == "R"


def test_asof_null_timestamps_never_match(spark):
    """NULL timestamps are unordered: a NULL left ts yields no match in
    BOTH directions (forward previously nulls-first-matched the earliest
    right row), and a NULL right ts is never a match candidate."""
    from pyspark.sql.types import (
        StringType, StructField, StructType, TimestampType,
    )

    schema = StructType(
        [
            StructField("k", StringType()),
            StructField("t", TimestampType()),
            StructField("v", StringType()),
        ]
    )
    left = spark.createDataFrame(
        [("k", None, "Lnull"), ("k", ts(10), "L10")], schema
    )
    right = spark.createDataFrame(
        [("k", None, "Rnull"), ("k", ts(8), "R8"), ("k", ts(15), "R15")],
        schema,
    )
    for direction, want in (
        ("backward", {"Lnull": None, "L10": "R8"}),
        ("forward", {"Lnull": None, "L10": "R15"}),
    ):
        got = {
            r.v: r.rv
            for r in asof_join(
                left,
                right.withColumnRenamed("v", "rv"),
                "k",
                "t",
                "t",
                direction=direction,
            ).collect()
        }
        assert got == want, direction
