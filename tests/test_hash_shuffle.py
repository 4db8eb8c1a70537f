"""Hash-shuffle strategy parity for the ML / relational / raster
families: every pipeline routed through ``shuffle.grouped_map`` must
return the same rows under ``enable_hash_shuffle`` as under the default
sort shuffle (the tile-write CLI surface is pinned separately in
``test_tiling.test_write_tiles_hash_shuffle_parity``)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from osm_jigsaw_ray.pipelines.shuffle import shuffle_strategy


def _docs_ds():
    import ray.data as rd

    rows = [
        (i, f"the quick brown fox number {i % 7} jumps over the lazy dog "
            f"near the river {'bank' if i % 3 else 'delta'} {i % 5}")
        for i in range(60)
    ]
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def _events_ds():
    import ray.data as rd

    n = 200
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta((np.arange(n) * 137) % 86_400, unit="s"),
            "user_id": (np.arange(n, dtype=np.int64) * 11) % 17,
            "event_type": np.where(np.arange(n) % 4 == 0, "click", "view"),
            "value": np.round(np.arange(n) * 0.25, 2),
        }
    )
    df["ts"] = df["ts"].astype("datetime64[us]")
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _run_all():
    from osm_jigsaw_ray.pipelines import mlops, relational

    docs, events = _docs_ds(), _events_ds()
    out = {}
    out["exact_dedup"] = mlops.exact_dedup(docs).to_pandas()
    out["minhash_neardup"] = mlops.minhash_lsh_dedup(
        docs, num_perm=32, bands=8
    ).to_pandas()
    out["simhash_neardup"] = mlops.simhash_near_dup(docs, max_hamming=3).to_pandas()
    out["sessions"] = relational.events_sessions(events).to_pandas()
    out["asof"] = relational.events_asof_join(events).to_pandas()
    out["sliding"] = relational.events_sliding_window(events).to_pandas()
    emb = pa.table(
        {
            "vec_id": pa.array(np.arange(40), pa.int64()),
            "embedding": pa.array(
                [np.sin(np.arange(8) * (i + 1)).tolist() for i in range(40)],
                pa.list_(pa.float32()),
            ),
        }
    )
    import ray.data as rd

    out["ann"] = mlops.ann_cosine_topk(
        rd.from_arrow(emb), query_ids=[0, 7, 13], k=5
    ).to_pandas()
    return out


def test_ml_relational_hash_parity(ray_session):
    # pin BOTH strategies explicitly: the session default is hash now,
    # so `want` must force sort or the test compares hash to itself
    with shuffle_strategy("sort"):
        want = _run_all()
    with shuffle_strategy("hash"):
        got = _run_all()
    assert set(got) == set(want)
    for name in want:
        pd.testing.assert_frame_equal(
            _canon(got[name]), _canon(want[name]), check_dtype=False
        ), name


def test_small_input_fast_path_matches_exchange(ray_session):
    """grouped_map's small-input single-task apply == the hash exchange
    path (GRAFT_SMALL_SHUFFLE_BYTES=0 disables the fast path), for both
    per-key and whole-partition fns, including multi-block inputs."""
    import numpy as np
    import ray.data as rd

    import osm_jigsaw_ray.pipelines.shuffle as sh
    from osm_jigsaw_ray.pipelines.shuffle import grouped_map, shuffle_strategy

    n = 5000
    tbl = pa.table(
        {
            "k": pa.array([f"g{i % 37}" for i in range(n)]),
            "v": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    ds = rd.from_arrow(tbl).repartition(8)

    def per_key(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "k": group["k"].slice(0, 1),
                "n": pa.array([len(group)], pa.int64()),
                "sum_v": pa.array([pc.sum(group["v"]).as_py()], pa.int64()),
            }
        )

    def whole(part: pa.Table) -> pa.Table:
        df = part.to_pandas().groupby("k", as_index=False).agg(
            n=("v", "size"), sum_v=("v", "sum")
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    def run(**kw):
        with shuffle_strategy("hash"):
            return (
                grouped_map(ds, "k", num_partitions=16, **kw)
                .to_pandas()
                .sort_values("k")
                .reset_index(drop=True)
            )

    orig = sh.SMALL_SHUFFLE_BYTES
    try:
        sh.SMALL_SHUFFLE_BYTES = 64 << 20
        fast_pk = run(fn=per_key)
        fast_wp = run(fn=whole, whole_partition=True)
        sh.SMALL_SHUFFLE_BYTES = 0  # force the exchange path
        slow_pk = run(fn=per_key)
        slow_wp = run(fn=whole, whole_partition=True)
    finally:
        sh.SMALL_SHUFFLE_BYTES = orig
    pd.testing.assert_frame_equal(fast_pk, slow_pk)
    pd.testing.assert_frame_equal(fast_wp, slow_wp)
    assert set(fast_pk["k"]) == {f"g{i}" for i in range(37)}
    assert fast_pk["sum_v"].sum() == n * (n - 1) // 2
