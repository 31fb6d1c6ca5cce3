"""Local harness emulating the driver's correctness gate: run each
queries() entry and its oracle_sql() side by side on a testdata dir and
compare row count, schema width, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

import ray

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if hasattr(res, "to_pandas") and not isinstance(res, pd.DataFrame):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Canonicalize like the driver's value-hash: sort columns by name,
    widen ints→int64 / floats→float64 (so int32 vs int64 doesn't flag,
    but int64 vs float64 DOES — that's the HUGEINT drift the driver
    catches), datetimes→datetime64[us], objects→str, then row-sort."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        dt = df[c].dtype
        if pd.api.types.is_datetime64_any_dtype(dt):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(dt):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(dt):
            df[c] = df[c].astype("float64")
        elif dt == object:
            df[c] = df[c].astype(str)
    # sort by non-float columns first: sub-rtol float differences between
    # the engine and DuckDB must not reorder rows and fake a mismatch
    non_float = [c for c in df.columns if not pd.api.types.is_float_dtype(df[c].dtype)]
    floats = [c for c in df.columns if pd.api.types.is_float_dtype(df[c].dtype)]
    return df.sort_values(non_float + floats).reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> str:
    if sorted(got.columns) != sorted(want.columns):
        return f"SCHEMA MISMATCH got={sorted(got.columns)} want={sorted(want.columns)}"
    if len(got) != len(want):
        return f"ROWCOUNT MISMATCH got={len(got)} want={len(want)}"
    g, w = normalize(got), normalize(want)
    # dtype drift (e.g. DuckDB HUGEINT→float64 vs engine int64) fails the
    # driver's value hash even when values are numerically equal — check it
    for c in g.columns:
        if g[c].dtype != w[c].dtype:
            return f"DTYPE MISMATCH col={c} got={g[c].dtype} want={w[c].dtype}"
    try:
        pd.testing.assert_frame_equal(g, w, check_dtype=True, check_exact=False, rtol=1e-12)
    except AssertionError as e:
        return "VALUE MISMATCH: " + str(e).split("\n")[0]
    # column ORDER parity (driver sorts by name, but the judge wants
    # engine output emitted in ORACLE_SQL order — warn, don't fail)
    if list(got.columns) != list(want.columns):
        return f"OK (col order differs: got={list(got.columns)} sql={list(want.columns)})"
    return "OK"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"unknown query name(s): {sorted(unknown)}")
        sys.exit(2)  # a typo must not read as 'all passed'
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = _to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"{name:24s} RAY ERROR: {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in sqls:
            reason = getattr(entrymod, "ROWS_ONLY_REASONS", {}).get(name, "")
            note = f" — {reason}" if reason else ""
            print(f"{name:24s} rows-only: {len(got)} rows, {len(got.columns)} cols{note}")
            continue
        try:
            want = con.sql(sqls[name]).df()
        except Exception as e:
            print(f"{name:24s} SQL ERROR: {e}")
            failures += 1
            continue
        verdict = compare(name, got, want)
        print(f"{name:24s} {verdict}")
        if not verdict.startswith("OK"):  # "OK (col order differs...)" is a warning
            failures += 1
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
