"""Driver-style correctness harness: run every queries() entry and its
oracle_sql() twin at a scale factor, compare row count + schema + sorted
values. Usage: python scripts/check_oracles.py [sf_dir] [name ...]"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(obj):
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v))
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if str(df[c].dtype) in ("float32",):
            df[c] = df[c].astype("float64")
        if str(df[c].dtype) in ("int32", "uint32", "int16"):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name, ray_df, sql_df) -> list[str]:
    problems = []
    if len(ray_df) != len(sql_df):
        problems.append(f"rowcount ray={len(ray_df)} sql={len(sql_df)}")
    a, b = canon(ray_df), canon(sql_df)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns ray={list(a.columns)} sql={list(b.columns)}")
        return problems
    for c in a.columns:
        if len(a) != len(b):
            break
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            ok = np.allclose(
                av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True
            )
        else:
            ok = (av == bv).all()
        if not ok:
            mism = (
                np.nonzero(av != bv)[0][:3]
                if av.dtype.kind != "f"
                else np.nonzero(~np.isclose(av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True))[0][:3]
            )
            problems.append(
                f"col {c} mismatch at rows {mism.tolist()}: "
                f"ray={av[mism].tolist()} sql={bv[mism].tolist()}"
            )
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            ignore_reinit_error=True, logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from osm_jigsaw_ray.pipelines.shuffle import apply_default_strategy

    apply_default_strategy()

    import __ray_entry__ as entry_mod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            failed.append(name)
            continue
        dt = time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"ok    {name}: rows={len(ray_df)} ({dt:.1f}s) [rows-only, no oracle]")
            continue
        try:
            sql_df = con.execute(sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle SQL raised {type(e).__name__}: {e}")
            failed.append(name)
            continue
        problems = compare(name, ray_df, sql_df)
        if problems:
            print(f"FAIL  {name} ({dt:.1f}s): " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"OK    {name}: rows={len(ray_df)} ({dt:.1f}s)")
    ray.shutdown()
    if failed:
        print("FAILED:", failed)
        sys.exit(1)
    print("all oracle checks passed")


if __name__ == "__main__":
    main()
