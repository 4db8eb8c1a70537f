"""Relational operator semantics: the as-of join (custom operator —
DuckDB ASOF JOIN twin) against a brute-force per-row reference."""

import numpy as np
import pandas as pd
import pyarrow as pa

from osm_jigsaw_ray.pipelines.relational import events_asof_join


def _events_ds(rows):
    import ray.data as rd

    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


EVENTS = [
    # user 1: click@10:00, view@10:05 (matches click 0), click@10:20,
    # error@10:30 (matches click 2, the later one)
    (0, "2024-01-01 10:00:00", 1, "click", 1.0),
    (1, "2024-01-01 10:05:00", 1, "view", 2.0),
    (2, "2024-01-01 10:20:00", 1, "click", 3.0),
    (3, "2024-01-01 10:30:00", 1, "error", 4.0),
    # user 2: view BEFORE any click -> dropped (inner); view after -> kept
    (4, "2024-01-01 09:00:00", 2, "view", 5.0),
    (5, "2024-01-01 09:30:00", 2, "click", 6.0),
    (6, "2024-01-01 09:45:00", 2, "view", 7.0),
    # user 3: no clicks at all -> both rows dropped
    (7, "2024-01-01 08:00:00", 3, "view", 8.0),
    (8, "2024-01-01 08:10:00", 3, "error", 9.0),
    # user 4: two clicks at the SAME ts -> max event_id wins; an event
    # at exactly that ts matches it (allow_exact semantics, ts >= click_ts)
    (9, "2024-01-01 07:00:00", 4, "click", 10.0),
    (10, "2024-01-01 07:00:00", 4, "click", 11.0),
    (11, "2024-01-01 07:00:00", 4, "view", 12.0),
]


def test_asof_join_semantics(ray_session):
    out = (
        events_asof_join(_events_ds(EVENTS), num_partitions=4)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    got = {
        int(r.event_id): (int(r.click_event_id), float(r.click_value))
        for r in out.itertuples()
    }
    assert got == {
        1: (0, 1.0),
        3: (2, 3.0),
        6: (5, 6.0),
        11: (10, 11.0),
    }
    # dropped: 4 (view precedes first click), 7/8 (clickless user)
    assert set(out["event_id"]) == {1, 3, 6, 11}
    # attached click_ts is the click's own timestamp
    assert (
        out.set_index("event_id")["click_ts"].loc[3]
        == np.datetime64("2024-01-01T10:20:00", "us")
    )


def test_asof_join_matches_bruteforce_random(ray_session):
    rng = np.random.RandomState(7)
    n = 400
    rows = []
    base = np.datetime64("2024-06-01T00:00:00", "us")
    for i in range(n):
        rows.append(
            (
                i,
                pd.Timestamp(base + np.timedelta64(int(rng.randint(0, 86_400)), "s")),
                int(rng.randint(0, 12)),
                str(rng.choice(["click", "view", "error"])),
                float(np.floor(rng.rand() * 100) / 2),
            )
        )
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    df["ts"] = df["ts"].astype("datetime64[us]")

    # brute force: for each non-click row scan all clicks of that user
    expected = {}
    clicks = df[df["event_type"] == "click"]
    for r in df[df["event_type"] != "click"].itertuples():
        c = clicks[(clicks["user_id"] == r.user_id) & (clicks["ts"] <= r.ts)]
        if len(c):
            best = c.sort_values(["ts", "event_id"]).iloc[-1]
            expected[int(r.event_id)] = int(best["event_id"])

    out = events_asof_join(_events_ds(rows), num_partitions=4).to_pandas()
    got = {
        int(r.event_id): int(r.click_event_id) for r in out.itertuples()
    }
    assert got == expected


def test_sliding_window_brute_force_parity(ray_session):
    """Random events: engine sliding-window frame (RANGE 3h PRECEDING,
    ts peers included) matches a per-event brute force."""
    from osm_jigsaw_ray.pipelines.relational import events_sliding_window

    rng = np.random.RandomState(11)
    n = 400
    rows = []
    base = pd.Timestamp("2024-03-01")
    for i in range(n):
        rows.append(
            (
                i,
                base + pd.Timedelta(seconds=int(rng.randint(0, 36_000))),
                int(rng.randint(0, 12)),
                "e",
                float(np.round(rng.uniform(-5, 50), 2)),
            )
        )
    out = (
        events_sliding_window(_events_ds(rows), window_minutes=60, num_partitions=4)
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    w = pd.Timedelta(minutes=60)
    for _, r in df.iterrows():
        frame = df[
            (df["user_id"] == r["user_id"])
            & (df["ts"] >= r["ts"] - w)
            & (df["ts"] <= r["ts"])
        ]
        assert out.loc[r["event_id"], "n_win"] == len(frame)
        cents = np.floor(frame["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        assert out.loc[r["event_id"], "sum_cents_win"] == cents.sum()


def test_regional_revenue_local_supplier_rule(ray_session):
    """Q5 semantics: only lineitems whose supplier nation equals the
    customer nation count, dimension filter by region, exact cents."""
    import ray.data as rd

    from osm_jigsaw_ray.pipelines.relational import regional_revenue

    region = rd.from_items(
        [
            {"r_regionkey": 0, "r_name": "EUROPE"},
            {"r_regionkey": 1, "r_name": "ASIA"},
        ]
    )
    nation = rd.from_items(
        [
            {"n_nationkey": 10, "n_name": "FRANCE", "n_regionkey": 0},
            {"n_nationkey": 11, "n_name": "JAPAN", "n_regionkey": 1},
        ]
    )
    customer = rd.from_items(
        [
            {"c_custkey": 1, "c_nationkey": 10},
            {"c_custkey": 2, "c_nationkey": 11},
        ]
    )
    supplier = rd.from_items(
        [
            {"s_suppkey": 5, "s_nationkey": 10},
            {"s_suppkey": 6, "s_nationkey": 11},
        ]
    )
    import numpy as np

    ts = np.datetime64("1996-06-01", "us").item()
    orders = rd.from_items(
        [
            {"o_orderkey": 100, "o_custkey": 1, "o_orderdate": ts},
            {"o_orderkey": 101, "o_custkey": 2, "o_orderdate": ts},
        ]
    )
    lineitem = rd.from_items(
        [
            # FRANCE customer, FRANCE supplier: counts (10.00 * 0.9)
            {"l_orderkey": 100, "l_suppkey": 5, "l_extendedprice": 10.0,
             "l_discount": 0.1},
            # FRANCE customer, JAPAN supplier: local rule drops it
            {"l_orderkey": 100, "l_suppkey": 6, "l_extendedprice": 99.0,
             "l_discount": 0.0},
            # JAPAN customer: outside EUROPE
            {"l_orderkey": 101, "l_suppkey": 6, "l_extendedprice": 50.0,
             "l_discount": 0.0},
        ]
    )
    out = regional_revenue(
        lineitem, orders, customer, supplier, nation, region,
        region_name="EUROPE",
    ).to_pandas()
    assert list(out["n_name"]) == ["FRANCE"]
    assert list(out["revenue_cents"]) == [900]


def test_partial_topk_matches_full_sort(ray_session):
    """partial_topk == sort().limit(k) on a multi-block dataset with
    duplicate sort values (the tie-break column must decide)."""
    import ray.data as rd

    from osm_jigsaw_ray.pipelines.shuffle import partial_topk

    rng = np.random.default_rng(7)
    n = 5000
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            # coarse values force ties across blocks
            "score": rng.integers(0, 50, n).astype(np.float64),
        }
    )
    ds = rd.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)
    ).repartition(13)
    got = (
        partial_topk(ds, [("score", "descending"), ("id", "ascending")], 25)
        .to_pandas()
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["score", "id"], ascending=[False, True])
        .head(25)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["id", "score"]], want[["id", "score"]])


def test_combine_small_single_task_semantics(ray_session):
    """combine_small runs the fn exactly once over ALL rows (partials
    from every block reach one combine) and preserves the fn's output."""
    import ray.data as rd

    from osm_jigsaw_ray.pipelines.shuffle import combine_small

    df = pd.DataFrame({"k": ["a", "b"] * 500, "v": np.arange(1000, dtype=np.int64)})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(7)
    out = combine_small(
        ds,
        lambda d: d.groupby("k", sort=False).agg(s=("v", "sum")).reset_index(),
        batch_format="pandas",
    ).to_pandas()
    want = df.groupby("k", sort=False).agg(s=("v", "sum")).reset_index()
    pd.testing.assert_frame_equal(
        out.sort_values("k").reset_index(drop=True),
        want.sort_values("k").reset_index(drop=True),
    )


def test_lineitem_pricing_partial_combine_exact(ray_session):
    """The partial-then-combine lineitem aggregate is bit-exact vs a
    single-pass pandas reference (integer cents are order-independent)."""
    import ray.data as rd

    from osm_jigsaw_ray.pipelines.relational import lineitem_pricing

    rng = np.random.default_rng(3)
    n = 4000
    df = pd.DataFrame(
        {
            "l_returnflag": rng.choice(["A", "N", "R"], n),
            "l_linestatus": rng.choice(["F", "O"], n),
            "l_quantity": rng.integers(1, 50, n).astype(np.float64),
            "l_extendedprice": np.round(rng.uniform(1.0, 9999.0, n), 2),
            "l_discount": np.round(rng.uniform(0.0, 0.1, n), 2),
            "l_shipdate": pd.to_datetime("1994-01-01")
            + pd.to_timedelta(rng.integers(0, 1500, n), unit="D"),
        }
    )
    df["l_shipdate"] = df["l_shipdate"].astype("datetime64[us]")
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(9)
    got = (
        lineitem_pricing(ds)
        .to_pandas()
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )
    kept = df[df["l_shipdate"] < pd.Timestamp("1996-01-01")].copy()
    kept["qty"] = np.floor(kept["l_quantity"] + 0.5).astype(np.int64)
    kept["price_cents"] = np.floor(kept["l_extendedprice"] * 100.0 + 0.5).astype(
        np.int64
    )
    kept["disc_cents"] = np.floor(
        kept["l_extendedprice"] * (1.0 - kept["l_discount"]) * 100.0 + 0.5
    ).astype(np.int64)
    want = (
        kept.groupby(["l_returnflag", "l_linestatus"])
        .agg(
            sum_qty=("qty", "sum"),
            sum_price_cents=("price_cents", "sum"),
            sum_disc_cents=("disc_cents", "sum"),
            n=("qty", "size"),
        )
        .reset_index()
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
