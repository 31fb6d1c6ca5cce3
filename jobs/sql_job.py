"""SQL job entry point — ad-hoc queries against a table directory from
the command line (or `ray job submit` on a real cluster):

    python jobs/sql_job.py "SELECT lang, count(*) AS n FROM documents \
        GROUP BY lang" --sf /root/testdata/sf0.01 [--out /tmp/result]

Compiles the query through fscrawler_ray.pipelines.sqlfront onto Ray
Data primitives (pruned reads, pushed-down predicates, partial-agg
groupbys, the size-aware join front door).  Aggregate results print as
CSV to stdout; projection results stream — printed when small, written
as partitioned parquet when --out is given.  `--explain` prints the
physical plan decisions instead of executing.
"""

from __future__ import annotations

import sys


def main() -> int:
    args = sys.argv[1:]
    if not args or args[0] in ("-h", "--help"):
        print(__doc__)
        return 2
    sql = args[0]
    sf = "/root/testdata/sf0.01"
    out = None
    explain_only = False
    i = 1
    while i < len(args):
        if args[i] == "--sf":
            sf = args[i + 1]
            i += 2
        elif args[i] == "--out":
            out = args[i + 1]
            i += 2
        elif args[i] == "--explain":
            explain_only = True
            i += 1
        else:
            print(f"unknown arg {args[i]!r}")
            return 2

    sys.path.insert(0, ".")
    from fscrawler_ray.pipelines.sqlfront import explain, sql_query

    if explain_only:
        for step, detail in zip(*(explain(sf, sql).column(c).to_pylist() for c in ("step", "detail"))):
            print(f"{step:14s} {detail}")
        return 0

    import ray

    if not ray.is_initialized():
        try:
            ray.init(address="auto", include_dashboard=False, logging_level="ERROR")
        except ConnectionError:
            ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    res = sql_query(sf, sql)
    if hasattr(res, "write_parquet"):  # a streaming Dataset projection
        if out:
            res.write_parquet(out)
            print(f"wrote {out}")
        else:
            df = res.to_pandas()
            print(df.to_csv(index=False), end="")
    else:
        df = res.to_pandas()
        if out:
            import pyarrow.parquet as pq

            import pyarrow as pa

            pq.write_table(pa.Table.from_pandas(df, preserve_index=False), out)
            print(f"wrote {out}")
        else:
            print(df.to_csv(index=False), end="")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
