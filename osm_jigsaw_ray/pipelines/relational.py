"""General relational operators over the TPC-H-ish tables — the engine's
aggregate/join/sort/window surface (SURVEY.md §2.5/§2.6 analogs, plus the
streaming-shaped ``events`` patterns from the Ray guide).

Exact-sum discipline: money sums go through integer cents
(``CAST(ROUND(x*100) AS BIGINT)`` on both engine and oracle side) so the
result is order-independent and bit-identical; float averages/sums are
6-decimal floor-truncated (see ``mlops.trunc6``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .shuffle import combine_small, grouped_map, partial_topk


def count_by_lang(docs: rd.Dataset) -> rd.Dataset:
    """groupby-count/sum over documents (A1 analog).

    The key space is bounded by construction (languages are an enum), so
    the aggregation is per-batch partials + ONE tiny combine task — no
    all-to-all at any corpus size (partials are ≤ langs × blocks rows)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.groupby("lang", sort=False)
            .agg(n=("lang", "size"), sum_chars=("n_chars", "sum"))
            .reset_index()
        )

    partials = docs.select_columns(["lang", "n_chars"]).map_batches(
        partial, batch_format="pandas"
    )
    return combine_small(
        partials,
        lambda df: df.groupby("lang", sort=False)
        .agg(n=("n", "sum"), sum_chars=("sum_chars", "sum"))
        .reset_index(),
        batch_format="pandas",
    )


def lineitem_pricing(lineitem: rd.Dataset, cutoff: str = "1996-01-01") -> rd.Dataset:
    """TPC-H Q1-shaped aggregate: filter by ship date, group by
    returnflag/linestatus.

    The (returnflag, linestatus) key space is a handful of enum values,
    so the whole aggregate is per-batch partials + ONE tiny combine task
    — integer-cents sums are order-independent, so partial-then-combine
    is exact, and no all-to-all ever runs (partials are ≤ keys × blocks
    rows at any corpus size)."""

    def prep(batch: pa.Table) -> pa.Table:
        mask = pc.less(batch["l_shipdate"], pa.scalar(np.datetime64(cutoff, "us")))
        batch = batch.filter(mask)
        # half-up via floor(x+0.5): tie-mode-free, so an SQL oracle using
        # the same expression matches bit-for-bit (numpy/arrow round is
        # half-even, SQL ROUND is half-away — they differ on exact .5)
        def cents64(arr):
            return pc.cast(pc.floor(pc.add(arr, 0.5)), pa.int64())

        df = pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"].to_pandas(),
                "l_linestatus": batch["l_linestatus"].to_pandas(),
                "qty": cents64(batch["l_quantity"]).to_numpy(),
                "price_cents": cents64(
                    pc.multiply(batch["l_extendedprice"], 100.0)
                ).to_numpy(),
                "disc_cents": cents64(
                    pc.multiply(
                        pc.multiply(
                            batch["l_extendedprice"],
                            pc.subtract(pa.scalar(1.0), batch["l_discount"]),
                        ),
                        100.0,
                    )
                ).to_numpy(),
            }
        )
        g = (
            df.groupby(["l_returnflag", "l_linestatus"], sort=False)
            .agg(
                sum_qty=("qty", "sum"),
                sum_price_cents=("price_cents", "sum"),
                sum_disc_cents=("disc_cents", "sum"),
                n=("qty", "size"),
            )
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = lineitem.select_columns(
        [
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ]
    ).map_batches(prep, batch_format="pyarrow")
    return combine_small(
        partials,
        lambda df: df.groupby(["l_returnflag", "l_linestatus"], sort=False)
        .agg(
            sum_qty=("sum_qty", "sum"),
            sum_price_cents=("sum_price_cents", "sum"),
            sum_disc_cents=("sum_disc_cents", "sum"),
            n=("n", "sum"),
        )
        .reset_index(),
        batch_format="pandas",
    )


def segment_revenue(
    orders: rd.Dataset, customer: rd.Dataset, *, join_partitions: int = 8
) -> rd.Dataset:
    """orders ⋈ customer hash join → per-mktsegment order counts + exact
    cents revenue."""

    def cents(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "price_cents": pc.cast(
                    pc.floor(pc.add(pc.multiply(batch["o_totalprice"], 100.0), 0.5)),
                    pa.int64(),
                ),
            }
        )

    o = orders.select_columns(["o_custkey", "o_totalprice"]).map_batches(
        cents, batch_format="pyarrow"
    )
    c = customer.select_columns(["c_custkey", "c_mktsegment"]).map_batches(
        lambda b: pa.table(
            {"o_custkey": pc.cast(b["c_custkey"], pa.int64()), "c_mktsegment": b["c_mktsegment"]}
        ),
        batch_format="pyarrow",
    )
    joined = o.join(c, join_type="inner", num_partitions=join_partitions, on=("o_custkey",))

    # the join is the data-sized exchange; the segment key space is an
    # enum, so the aggregate after it is per-batch partials + one tiny
    # combine (no second all-to-all)
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.groupby("c_mktsegment", sort=False)
            .agg(n_orders=("price_cents", "size"), revenue_cents=("price_cents", "sum"))
            .reset_index()
        )

    return combine_small(
        joined.map_batches(partial, batch_format="pandas"),
        lambda df: df.groupby("c_mktsegment", sort=False)
        .agg(n_orders=("n_orders", "sum"), revenue_cents=("revenue_cents", "sum"))
        .reset_index(),
        batch_format="pandas",
    )


def regional_revenue(
    lineitem: rd.Dataset,
    orders: rd.Dataset,
    customer: rd.Dataset,
    supplier: rd.Dataset,
    nation: rd.Dataset,
    region: rd.Dataset,
    *,
    region_name: str = "ASIA",
    date_lo: str = "1996-01-01",
    date_hi: str = "1998-01-01",
    join_partitions: int = 8,
) -> rd.Dataset:
    """TPC-H Q5 shape — local-supplier revenue per nation of one region:
    customer ⋈ orders ⋈ lineitem ⋈ supplier with c_nationkey =
    s_nationkey, nation/region dimension filter, exact integer-cents
    revenue, ordered revenue DESC.

    Join strategy by side size (the broadcast-vs-shuffle split this
    engine uses everywhere): region/nation/supplier are dimension-tiny
    → ONE broadcast dict each (``ray.put``); orders⋈customer and
    lineitem⋈orders are the data-sized joins → ``Dataset.join`` hash
    shuffles. At full TPC-H scale customer outgrows a broadcast but it
    is already on the shuffle side here; supplier would move to a
    third hash join."""
    import ray

    rkeys = {
        r["r_regionkey"]
        for r in region.take_all()
        if r["r_name"] == region_name
    }
    nations = {
        int(r["n_nationkey"]): r["n_name"]
        for r in nation.take_all()
        if r["n_regionkey"] in rkeys
    }
    supp = {
        int(r["s_suppkey"]): int(r["s_nationkey"])
        for r in supplier.select_columns(["s_suppkey", "s_nationkey"]).take_all()
    }
    # searchsorted lookup arrays: the supplier gather runs vectorized
    # inside the lineitem-sized scan (no per-row dict gets there)
    skeys = np.fromiter(sorted(supp), dtype=np.int64, count=len(supp))
    svals = np.array([supp[int(k)] for k in skeys], dtype=np.int64)
    nkeys = np.fromiter(sorted(nations), dtype=np.int64, count=len(nations))
    nations_ref = ray.put((nations, nkeys, skeys, svals))

    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")

    def o_prep(batch: pa.Table) -> pa.Table:
        d = batch["o_orderdate"]
        keep = pc.and_(
            pc.greater_equal(d, pa.scalar(lo)), pc.less(d, pa.scalar(hi))
        )
        b = batch.filter(keep)
        return pa.table(
            {
                "l_orderkey": pc.cast(b["o_orderkey"], pa.int64()),
                "o_custkey": pc.cast(b["o_custkey"], pa.int64()),
            }
        )

    o = orders.select_columns(
        ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(o_prep, batch_format="pyarrow")
    c = customer.select_columns(["c_custkey", "c_nationkey"]).map_batches(
        lambda b: pa.table(
            {
                "o_custkey": pc.cast(b["c_custkey"], pa.int64()),
                "c_nationkey": pc.cast(b["c_nationkey"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    oc = o.join(
        c, join_type="inner", num_partitions=join_partitions, on=("o_custkey",)
    ).select_columns(["l_orderkey", "c_nationkey"])

    def l_prep(batch: pa.Table) -> pa.Table:
        # cents = floor(ext*(1-disc)*100 + 0.5), left-to-right like the
        # SQL oracle so the doubles match bit-for-bit before the floor
        ext = batch["l_extendedprice"]
        disc = batch["l_discount"]
        cents = pc.cast(
            pc.floor(
                pc.add(
                    pc.multiply(
                        pc.multiply(ext, pc.subtract(1.0, disc)), 100.0
                    ),
                    0.5,
                )
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "l_orderkey": pc.cast(batch["l_orderkey"], pa.int64()),
                "l_suppkey": pc.cast(batch["l_suppkey"], pa.int64()),
                "rev_cents": cents,
            }
        )

    li = lineitem.select_columns(
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(l_prep, batch_format="pyarrow")
    lo_j = li.join(
        oc, join_type="inner", num_partitions=join_partitions, on=("l_orderkey",)
    )

    def partial(batch: pa.Table) -> pa.Table:
        nations_, nkeys_, skeys_, svals_ = ray.get(nations_ref)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        cn = batch["c_nationkey"].to_numpy(zero_copy_only=False)
        idx = np.clip(
            np.searchsorted(skeys_, sk), 0, max(len(skeys_) - 1, 0)
        )
        s_nation = (
            np.where(skeys_[idx] == sk, svals_[idx], -1)
            if len(skeys_)
            else np.full(len(sk), -1, dtype=np.int64)
        )
        keep = (s_nation == cn) & np.isin(cn, nkeys_)
        rev = batch["rev_cents"].to_numpy(zero_copy_only=False)[keep]
        nk = cn[keep]
        df = pd.DataFrame({"nk": nk, "rev": rev}).groupby("nk", as_index=False).sum()
        return pa.table(
            {
                "n_name": pa.array(
                    [nations_[int(k)] for k in df["nk"]], pa.string()
                ),
                "revenue_cents": pa.array(df["rev"].to_numpy(np.int64)),
            }
        )

    # nation key space is bounded (≤ 25 names): partials from the
    # lineitem-sized scan combine in one tiny task that also produces the
    # exact final ordering — no aggregate/sort all-to-all after the joins
    return combine_small(
        lo_j.map_batches(partial, batch_format="pyarrow"),
        lambda df: df.groupby("n_name", sort=False)
        .agg(revenue_cents=("revenue_cents", "sum"))
        .reset_index()
        .sort_values(
            ["revenue_cents", "n_name"], ascending=[False, True]
        )
        .reset_index(drop=True),
        batch_format="pandas",
    )


def top_parts(part: rd.Dataset, k: int = 10) -> rd.Dataset:
    """Global top-k: desc by retail price, id tie-break — per-block
    partial top-k + one tiny combine (:func:`..shuffle.partial_topk`),
    never a full-table sort."""
    return partial_topk(
        part.select_columns(["p_partkey", "p_name", "p_retailprice"]),
        [("p_retailprice", "descending"), ("p_partkey", "ascending")],
        k,
    )


def events_hourly(events: rd.Dataset) -> rd.Dataset:
    """Tumbling 1-hour window per user: count + exact cents value sum
    (values are 2-decimal; integer cents make the sum order-independent).
    Partial per-batch pre-aggregation (user, hour) before the shuffle."""

    # High-cardinality aggregate shape: at this table's grain (~1 row per
    # (user, hour)) Ray's groupby().aggregate() pays ~2.4 ms of Python
    # per GROUP in its sort-merge (measured 25.6 s for 95k groups at
    # sf0.1 regardless of key type, block count, or hash-shuffle mode).
    # Instead: pack the key into one int64, hash it onto a LOW-cardinality
    # partition column, shuffle on that, and run the real per-key
    # aggregation as a vectorized pandas groupby inside each partition
    # group (measured 3.8 s — the shuffle moves the same rows; only the
    # per-group Python changes from 95k groups to `num_partitions`).
    _HOUR_BITS = 21  # ~240 years of hours
    num_partitions = 32

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        hours = (
            batch["ts"].astype("datetime64[ns]").astype(np.int64)
            // 3_600_000_000_000
        )
        uid = batch["user_id"].to_numpy(dtype=np.int64)
        # packed-key domain guard: a pre-1970 ts (negative hour index) or
        # user_id >= 2^42 would silently corrupt the key via sign bits
        if hours.size and (hours.min() < 0 or uid.max() >= (1 << (63 - _HOUR_BITS))):
            raise ValueError(
                "events_hourly: ts before 1970 or user_id >= 2^42 "
                "overflows the packed (user, hour) key"
            )
        batch["key"] = (uid << _HOUR_BITS) | hours
        batch["value_cents"] = np.floor(
            batch["value"].to_numpy() * 100.0 + 0.5
        ).astype(np.int64)
        g = (
            batch.groupby("key", sort=False)
            .agg(n=("event_id", "size"), sum_value_cents=("value_cents", "sum"))
            .reset_index()
        )
        g["__part"] = g["key"].to_numpy() % num_partitions
        return g

    partials = events.select_columns(
        ["event_id", "ts", "user_id", "value"]
    ).map_batches(partial, batch_format="pandas")

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        g = (
            group.groupby("key", sort=False)
            .agg(n=("n", "sum"), sum_value_cents=("sum_value_cents", "sum"))
            .reset_index()
        )
        key = g["key"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "user_id": key >> _HOUR_BITS,
                # timestamp[us] like DuckDB's date_trunc
                "hour": (
                    (key & ((1 << _HOUR_BITS) - 1)) * 3_600_000_000
                ).astype("datetime64[us]"),
                "n": g["n"],
                "sum_value_cents": g["sum_value_cents"],
            }
        )

    return grouped_map(
        partials,
        "__part",
        combine,
        num_partitions=num_partitions,
        batch_format="pandas",
        whole_partition=True,  # sub-groups by the packed key itself
    )


def events_asof_join(
    events: rd.Dataset, *, num_partitions: int = 32
) -> rd.Dataset:
    """As-of join (a custom operator Ray Data lacks): for every
    non-click event, attach the most recent click by the same user at or
    before the event's timestamp (inner: rows with no preceding click
    drop). Matches DuckDB's ``ASOF JOIN`` semantics.

    Scale shape: both sides carry only their needed columns, get a
    ``__part = user_id % P`` partition column, and co-partition through
    ONE hash shuffle (union → groupby(__part) — same rows moved as a
    join, no second exchange). Inside each partition the merge is
    ``pd.merge_asof(by=user_id)`` — a vectorized C merge over the
    partition's (ts)-sorted rows, no per-row Python. Ties where a user
    has several clicks at one timestamp dedupe to the max event_id
    first, so the result is deterministic and SQL-reproducible."""
    slim = events.select_columns(
        ["event_id", "ts", "user_id", "event_type", "value"]
    )

    def tag(batch: pa.Table) -> pa.Table:
        part = (
            batch["user_id"].to_numpy(zero_copy_only=False) % num_partitions
        ).astype(np.int32)
        batch = batch.append_column(
            "__is_left", pc.not_equal(batch["event_type"], pa.scalar("click"))
        )
        return batch.append_column("__part", pa.array(part))

    tagged = slim.map_batches(tag, batch_format="pyarrow")

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        left = group[group["__is_left"]]
        right = group[~group["__is_left"]]
        if left.empty or right.empty:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype=np.int64),
                    "ts": pd.Series([], dtype="datetime64[us]"),
                    "user_id": pd.Series([], dtype=np.int64),
                    "event_type": pd.Series([], dtype=object),
                    "click_event_id": pd.Series([], dtype=np.int64),
                    "click_ts": pd.Series([], dtype="datetime64[us]"),
                    "click_value": pd.Series([], dtype=np.float64),
                }
            )
        # deterministic tie-break: one click per (user, ts), max event_id
        right = right.sort_values(["user_id", "ts", "event_id"]).drop_duplicates(
            ["user_id", "ts"], keep="last"
        )
        right = right.rename(
            columns={"event_id": "click_event_id", "value": "click_value"}
        )[["user_id", "ts", "click_event_id", "click_value"]]
        out = pd.merge_asof(
            left[["event_id", "ts", "user_id", "event_type"]].sort_values("ts"),
            right.sort_values("ts"),
            on="ts",
            by="user_id",
            direction="backward",
        )
        out = out[out["click_event_id"].notna()]
        click_ts = right.set_index("click_event_id")["ts"]
        cid = out["click_event_id"].astype(np.int64)
        return pd.DataFrame(
            {
                "event_id": out["event_id"].astype(np.int64),
                "ts": out["ts"].astype("datetime64[us]"),
                "user_id": out["user_id"].astype(np.int64),
                "event_type": out["event_type"],
                "click_event_id": cid,
                "click_ts": click_ts.loc[cid]
                .to_numpy()
                .astype("datetime64[us]"),
                "click_value": out["click_value"].astype(np.float64),
            }
        )

    return grouped_map(
        tagged,
        "__part",
        merge,
        num_partitions=num_partitions,
        batch_format="pandas",
        whole_partition=True,  # merge_asof keys on user_id in-block
    )


def events_sessions(
    events: rd.Dataset, gap_minutes: int = 30, *, num_partitions: int = 32
) -> rd.Dataset:
    """Sessionization: per user, sessions split on > gap between
    consecutive events (sorted by ts, event_id tie-break).

    User cardinality scales with the corpus, so the shuffle routes
    through ``user_id % num_partitions`` (Ray's sort-merge groupby pays
    ~2.4 ms of Python per group) and the per-user session count is one
    vectorized pass over the partition's (user, ts)-sorted rows."""
    gap_us = np.int64(gap_minutes) * 60 * 1_000_000

    def tag(batch: pa.Table) -> pa.Table:
        part = (
            batch["user_id"].to_numpy(zero_copy_only=False) % num_partitions
        ).astype(np.int32)
        return batch.append_column("__part", pa.array(part))

    def sessions(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy(dtype=np.int64)
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        same_user = np.zeros(len(g), dtype=bool)
        brk = np.zeros(len(g), dtype=np.int64)
        if len(g) > 1:
            same_user[1:] = uid[1:] == uid[:-1]
            brk[1:] = (same_user[1:] & ((ts[1:] - ts[:-1]) > gap_us)).astype(
                np.int64
            )
        u_vals, u_starts = np.unique(uid, return_index=True)
        n_sessions = 1 + np.add.reduceat(brk, u_starts)
        return pd.DataFrame({"user_id": u_vals, "n_sessions": n_sessions})

    return grouped_map(
        events.select_columns(["event_id", "ts", "user_id"]).map_batches(
            tag, batch_format="pyarrow"
        ),
        "__part",
        sessions,
        num_partitions=num_partitions,
        batch_format="pandas",
        whole_partition=True,  # re-sorts and breaks on user_id itself
    )


def events_sliding_window(
    events: rd.Dataset, window_minutes: int = 180, *, num_partitions: int = 32
) -> rd.Dataset:
    """Per-event sliding-window aggregate: for each event, the count and
    integer-cents value sum of the SAME user's events with
    ``ts ∈ [ts − window, ts]`` — SQL ``RANGE BETWEEN <w> PRECEDING AND
    CURRENT ROW`` semantics (ties on ts are peers: every equal-ts row of
    the user is in every peer's frame).

    One ``user_id % num_partitions`` shuffle co-locates each user's
    events; inside the partition the frame bounds come from two
    ``searchsorted`` calls per user segment over the ts-sorted rows and
    the sums from one prefix-sum — O(rows log rows) total, no per-row
    Python. Cents discipline (``floor(v*100+0.5)``) keeps the sum
    order-independent and bit-equal to the SQL oracle."""
    w_us = np.int64(window_minutes) * 60 * 1_000_000

    def tag(batch: pa.Table) -> pa.Table:
        part = (
            batch["user_id"].to_numpy(zero_copy_only=False) % num_partitions
        ).astype(np.int32)
        return batch.append_column("__part", pa.array(part))

    def windowed(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy(dtype=np.int64)
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        cents = np.floor(g["value"].to_numpy(np.float64) * 100.0 + 0.5).astype(
            np.int64
        )
        n = np.empty(len(g), dtype=np.int64)
        s = np.empty(len(g), dtype=np.int64)
        _, starts = np.unique(uid, return_index=True)
        bounds = np.append(starts, len(g))
        for a, b in zip(bounds[:-1], bounds[1:]):
            seg = ts[a:b]
            lo = np.searchsorted(seg, seg - w_us, "left")
            hi = np.searchsorted(seg, seg, "right")
            csum = np.concatenate(([0], np.cumsum(cents[a:b])))
            n[a:b] = hi - lo
            s[a:b] = csum[hi] - csum[lo]
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(dtype=np.int64),
                "n_win": n,
                "sum_cents_win": s,
            }
        )

    return grouped_map(
        events.select_columns(
            ["event_id", "ts", "user_id", "value"]
        ).map_batches(tag, batch_format="pyarrow"),
        "__part",
        windowed,
        num_partitions=num_partitions,
        batch_format="pandas",
        whole_partition=True,  # per-user segments found in-block
    )
