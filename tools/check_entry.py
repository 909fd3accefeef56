"""Local stand-in for the driver's correctness gate: run every
queries() entry at the given sf, compare SQL-oracled ones against
DuckDB (row count, sorted-column schema, order-insensitive values).

Usage: python tools/check_entry.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd
import ray

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res):
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True)


def compare(name: str, mine: pd.DataFrame, oracle: pd.DataFrame) -> list[str]:
    errs = []
    if len(mine) != len(oracle):
        errs.append(f"rowcount {len(mine)} != {len(oracle)}")
    a, b = canon(mine), canon(oracle)
    if list(a.columns) != list(b.columns):
        errs.append(f"schema {list(a.columns)} != {list(b.columns)}")
        return errs
    # The driver's value hash is dtype-sensitive (int64 vs float64 on
    # bit-equal values hash-mismatches — bit us on orders_moving_sum,
    # CORRECTNESS_r04): require exact dtype parity per column.
    bad_dt = [(c, str(a[c].dtype), str(b[c].dtype)) for c in a.columns
              if a[c].dtype != b[c].dtype]
    if bad_dt:
        errs.append(f"dtype mismatch (engine vs oracle): {bad_dt}")
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].values, b[c].values
            if np.issubdtype(a[c].dtype, np.floating):
                ok = np.array_equal(av, bv) or np.allclose(
                    av.astype(float), bv.astype(float), rtol=0, atol=0,
                    equal_nan=True)
            else:
                ok = (av == bv).all() if len(av) else True
            if not ok:
                bad = np.where(av != bv)[0][:3]
                errs.append(f"col {c} mismatch at rows {bad.tolist()}: "
                            f"{[(av[i], bv[i]) for i in bad]}")
    return errs


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = E.queries(), E.oracle_sql()
    n_ok = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name in oracles:
            try:
                odf = con.execute(oracles[name]).fetchdf()
            except Exception as ex:
                print(f"FAIL {name}: oracle raised {ex}")
                n_fail += 1
                continue
            errs = compare(name, mine, odf)
            if errs:
                print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(errs))
                n_fail += 1
            else:
                print(f"ok   {name} ({dt:.1f}s) rows={len(mine)} [sql]")
                n_ok += 1
        else:
            print(f"ok   {name} ({dt:.1f}s) rows={len(mine)} [rows-only]")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
