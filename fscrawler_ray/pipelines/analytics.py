"""SQL-checkable analytics over the driver's TPC-H-ish testdata tables.

Each ``q_*`` function takes ``sf_dir`` and returns a Dataset / pyarrow
Table; ``ORACLE_SQL`` holds the DuckDB-equivalent statement with matching
output column names (the driver compares row-count + schema +
order-insensitive value hash). Reference analogs noted per query
(sql/stats.sql and data_manager.py queries; SURVEY.md §2.4-2.5).

Float discipline: monetary/cumulative doubles are summed as integer cents
(``cast(round(x*100) as bigint)``) on BOTH sides so value hashes are exact.
Reads always prune columns at the parquet scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data.aggregate import Count, Max, Min, Sum

from ..functions.hashing import xxh64_batch
from ..stages.joins import broadcast_join, join


def _read(sf_dir: str, table: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _read_table(sf_dir: str, table: str, columns=None) -> pa.Table:
    import pyarrow.parquet as pq

    return pq.read_table(f"{sf_dir}/{table}.parquet", columns=columns)


def _rename(ds, mapping: dict):
    def f(b: pa.Table) -> pa.Table:
        return b.rename_columns([mapping.get(c, c) for c in b.column_names])

    return ds.map_batches(f, batch_format="pyarrow")


def _select(ds, cols: list[str]):
    """Reorder output columns to match the ORACLE_SQL projection order."""
    return ds.map_batches(lambda b: b.select(cols), batch_format="pyarrow")


def grouped_sum(ds, keys: list[str], sum_cols: dict, count_out: str | None = None):
    """Pre-aggregated groupby: combine per batch with pyarrow's hash
    aggregation (the partial/combiner step), then shuffle only the tiny
    per-block partials through Ray's groupby. This is the
    'push aggregation partial' rule for wide steps — the full-shuffle
    groupby over raw rows is ~5-10× slower at sf0.1.

    sum_cols: {input_col: output_name}; count_out: output name for count(*).
    """
    aggs = [(c, "sum") for c in sum_cols]
    if count_out:
        aggs.append(([], "count_all"))

    def partial(b: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(b, keys).aggregate(aggs)
        names = list(keys) + [f"{c}_partial" for c in sum_cols] + ([count_out + "_partial"] if count_out else [])
        # TableGroupBy puts key columns last in pyarrow 16 — reorder by name
        cols = {}
        for c in sum_cols:
            cols[f"{c}_partial"] = g.column(f"{c}_sum")
        if count_out:
            cols[count_out + "_partial"] = g.column("count_all")
        for k in keys:
            cols[k] = g.column(k)
        t = pa.table(cols)
        return t.select(names)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    final_aggs = [Sum(f"{c}_partial") for c in sum_cols]
    if count_out:
        final_aggs.append(Sum(count_out + "_partial"))
    out = partials.groupby(keys if len(keys) > 1 else keys[0]).aggregate(*final_aggs)
    mapping = {f"sum({c}_partial)": name for c, name in sum_cols.items()}
    if count_out:
        mapping[f"sum({count_out}_partial)"] = count_out
    return _rename(out, mapping)


def _cents(b: pa.Table, src: str, dst: str) -> pa.Table:
    # round half away from zero to match DuckDB's ROUND semantics exactly
    c = pc.round(
        pc.multiply(b.column(src), pa.scalar(100.0)), round_mode="half_towards_infinity"
    ).cast(pa.int64())
    return b.append_column(dst, c)


# ---------------------------------------------------------------------------
# groupby aggregations (A2/A3 analogs — sql/stats.sql:1-13)
# ---------------------------------------------------------------------------


def q_count_by_lang(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["lang"])
    return grouped_sum(ds, ["lang"], {}, count_out="cnt")


def q_chars_by_lang(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["lang", "n_chars"])
    return grouped_sum(ds, ["lang"], {"n_chars": "total_chars"}, count_out="docs")


def q_events_by_type(sf_dir: str):
    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    ds = ds.map_batches(lambda b: _cents(b, "value", "value_cents"), batch_format="pyarrow")
    agg = grouped_sum(ds, ["event_type"], {"value_cents": "total_value_cents"}, count_out="cnt")
    return _select(agg, ["event_type", "cnt", "total_value_cents"])


def q_events_hourly(sf_dir: str):
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def add_cols(b: pa.Table) -> pa.Table:
        # cast to us so the dtype matches DuckDB date_trunc (timestamp[us])
        hour = pc.floor_temporal(b.column("ts"), unit="hour").cast(pa.timestamp("us"))
        b = b.append_column("hour", hour)
        return _cents(b, "value", "value_cents")

    ds = ds.map_batches(add_cols, batch_format="pyarrow").drop_columns(["ts", "value"])
    agg = grouped_sum(ds, ["event_type", "hour"], {"value_cents": "total_value_cents"}, count_out="cnt")
    return _select(agg, ["event_type", "hour", "cnt", "total_value_cents"])


# ---------------------------------------------------------------------------
# top-k (A5 analogs — metrics_observer.py top-10s)
# ---------------------------------------------------------------------------


def q_top10_docs(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    return ds.sort(["n_chars", "doc_id"], descending=[True, False]).limit(10)


def q_top_sources(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["source", "n_chars"])
    agg = grouped_sum(ds, ["source"], {"n_chars": "total_chars"})
    return agg.sort(["total_chars", "source"], descending=[True, False]).limit(10)


def q_top5_orders(sf_dir: str):
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    ds = ds.map_batches(lambda b: _cents(b, "o_totalprice", "price_cents"), batch_format="pyarrow")
    return ds.drop_columns(["o_totalprice"]).sort(
        ["price_cents", "o_orderkey"], descending=[True, False]
    ).limit(5)


# ---------------------------------------------------------------------------
# duplicate finders (A4 — data_manager.py:330-359, sql/stats.sql:15-33)
# ---------------------------------------------------------------------------


def q_dup_sizes(sf_dir: str):
    """Groups of documents sharing n_chars (the (size) duplicate pre-check),
    re-joined to rows — semi-join against the >1 groups."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    groups = ds.groupby("n_chars").count()
    dup_keys = pa.Table.from_pandas(
        groups.to_pandas().query("`count()` > 1")[["n_chars"]], preserve_index=False
    )
    return broadcast_join(ds, dup_keys, on="n_chars", how="semi")


def q_exact_dedup_docs(sf_dir: str):
    """Exact content dedup: first doc_id per distinct text (hash-partitioned
    on the content hash, not the text itself — the A4 wide step)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def add_hash(b: pa.Table) -> pa.Table:
        h = xxh64_batch(b.column("text")).astype(np.int64)
        return b.append_column("text_hash", pa.array(h)).drop_columns(["text"])

    ds = ds.map_batches(add_hash, batch_format="pyarrow")
    out = ds.groupby("text_hash").aggregate(Min("doc_id"), Count())
    out = _rename(out, {"min(doc_id)": "keeper_doc_id", "count()": "copies"})
    return out.drop_columns(["text_hash"])


# ---------------------------------------------------------------------------
# filter chain over events (F-semantics on tabular data)
# ---------------------------------------------------------------------------


def q_filter_chain_events(sf_dir: str):
    """The reference filter chain applied to a plain table: SizeFilter on
    value-cents (deny-null), DateFilter max bound, NameFilter on
    event_type (the AND-ed skip chain)."""
    from ..filters.core import DateFilter, FilterChain, NameFilter, SizeFilter

    chain = FilterChain(
        skip_filters=[
            SizeFilter(min_size=500, max_size=1500),
            DateFilter(max_date=None, min_date=None),
            NameFilter(excluded_names=frozenset({"error"})),
        ]
    )

    def apply(b: pa.Table) -> pa.Table:
        b = _cents(b, "value", "value_cents")
        feat = pa.table(
            {
                "url": b.column("event_type"),
                "name": b.column("event_type"),
                "size": b.column("value_cents"),
                "mtime": b.column("ts").cast(pa.int64()),
            }
        )
        keep = chain.mask(feat)
        return b.filter(pa.array(keep)).select(["event_id", "event_type", "value_cents"])

    return _read(sf_dir, "events", columns=["event_id", "event_type", "value", "ts"]).map_batches(
        apply, batch_format="pyarrow"
    )


def q_regex_filter_docs(sf_dir: str):
    """F6 RegexPatternFilter applied to documents (text as the 'path'):
    authorized regex, IGNORECASE, with the literal-substring fallback quirk
    (which cannot fire here — the pattern is not a literal substring)."""
    from ..filters.core import RegexPatternFilter

    f = RegexPatternFilter(authorized_pattern=r"spark.*window")
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def apply(b: pa.Table) -> pa.Table:
        feat = pa.table({"url": b.column("text")})
        return b.filter(pa.array(f.mask(feat))).select(["doc_id"])

    return ds.map_batches(apply, batch_format="pyarrow")


def q_or_filter_events(sf_dir: str):
    """F9 OrFilter: keep events that pass ANY child filter (click-typed OR
    large-valued) — the notify-filter OR semantics."""
    from ..filters.core import FilterChain, OrFilter, PatternFilter, SizeFilter

    chain = FilterChain(
        notify_filters=[
            OrFilter([PatternFilter(authorized_pattern="click"), SizeFilter(min_size=1800)])
        ]
    )
    ds = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def apply(b: pa.Table) -> pa.Table:
        b = _cents(b, "value", "value_cents")
        feat = pa.table({"url": b.column("event_type"), "size": b.column("value_cents")})
        return b.filter(pa.array(chain.mask(feat))).select(["event_id", "event_type", "value_cents"])

    return ds.map_batches(apply, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# rollups via broadcast joins (A1 analog; L-queries)
# ---------------------------------------------------------------------------


def q_rollup_nation(sf_dir: str):
    cust = _read(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])
    cust = cust.map_batches(lambda b: _cents(b, "c_acctbal", "acct_cents"), batch_format="pyarrow")
    nation = _read_table(sf_dir, "nation", columns=["n_nationkey", "n_name"]).rename_columns(
        ["c_nationkey", "n_name"]
    )
    joined = broadcast_join(cust, nation, on="c_nationkey", how="inner")
    agg = grouped_sum(joined, ["n_name"], {"acct_cents": "total_acct_cents"}, count_out="customers")
    return _select(agg, ["n_name", "customers", "total_acct_cents"])


def q_rollup_region(sf_dir: str):
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    nation = _read_table(sf_dir, "nation", columns=["n_nationkey", "n_regionkey"])
    region = _read_table(sf_dir, "region", columns=["r_regionkey", "r_name"])
    dim = nation.join(region, keys="n_regionkey", right_keys="r_regionkey").select(
        ["n_nationkey", "r_name"]
    ).rename_columns(["c_nationkey", "r_name"])
    joined = broadcast_join(cust, dim, on="c_nationkey", how="inner")
    return _rename(joined.groupby("r_name").count(), {"count()": "customers"})


def q_segment_revenue(sf_dir: str):
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    orders = orders.map_batches(lambda b: _cents(b, "o_totalprice", "price_cents"), batch_format="pyarrow")
    cust = _read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).rename_columns(
        ["o_custkey", "c_mktsegment"]
    )
    joined = join(orders, cust, on="o_custkey", how="inner")
    agg = grouped_sum(joined, ["c_mktsegment"], {"price_cents": "revenue_cents"}, count_out="orders_cnt")
    return _select(agg, ["c_mktsegment", "orders_cnt", "revenue_cents"])


def q_pricing_summary(sf_dir: str):
    """TPC-H Q1-flavored lineitem aggregate (the headline wide aggregation).
    Partial aggregation happens inside map_batches blocks by Ray's hash
    aggregate; the groupby key cardinality is tiny."""
    import datetime as dt

    cutoff = dt.datetime(1998, 9, 1)
    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less_equal(b.column("l_shipdate"), pa.scalar(cutoff)))
        b = _cents(b, "l_quantity", "qty_cents")
        b = _cents(b, "l_extendedprice", "price_cents")
        disc = pc.round(
            pc.multiply(pc.multiply(b.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), b.column("l_discount"))), pa.scalar(100.0)),
            round_mode="half_towards_infinity",
        ).cast(pa.int64())
        b = b.append_column("disc_price_cents", disc)
        return b.select(["l_returnflag", "l_linestatus", "qty_cents", "price_cents", "disc_price_cents"])

    ds = ds.map_batches(prep, batch_format="pyarrow")
    return grouped_sum(
        ds,
        ["l_returnflag", "l_linestatus"],
        {"qty_cents": "sum_qty_cents", "price_cents": "sum_price_cents", "disc_price_cents": "sum_disc_price_cents"},
        count_out="cnt",
    )


# ---------------------------------------------------------------------------
# point/pattern lookups (L1/L3 — data_manager.py:163-167, 278-328)
# ---------------------------------------------------------------------------


def q_like_lookup(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def f(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.equal(b.column("source"), "src5"), pc.match_substring(b.column("text"), "query")
        )
        return b.filter(keep).select(["doc_id", "source"])

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# text ops with SQL oracles
# ---------------------------------------------------------------------------


def q_token_counts(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        t = b.column("text")
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_chars_computed": pc.utf8_length(t).cast(pa.int64()),
                "n_tokens": pc.count_substring_regex(t, r"\S+").cast(pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def q_keywords_exploded(sf_dir: str):
    """Keyword explosion (list column → one row per keyword), the Arrow-native
    answer to the reference's comma-joined keyword string."""
    ds = _read(sf_dir, "part", columns=["p_partkey", "p_name"])

    def f(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("p_name"), " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        keys = np.repeat(b.column("p_partkey").to_numpy(zero_copy_only=False), lens)
        return pa.table({"p_partkey": pa.array(keys), "keyword": pc.list_flatten(toks)})

    return ds.map_batches(f, batch_format="pyarrow")


def q_priority_rating(sf_dir: str):
    """Rating extraction analog (first digit of priority, capped at 5 — the
    rating_file_processor.py:33-39 cap semantics)."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])

    def f(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(b.column("o_orderpriority"), r"(?P<d>[0-9])")
        d = pc.struct_field(m, 0).cast(pa.int64())
        capped = pc.if_else(pc.greater(d, 5), pa.scalar(5, pa.int64()), d)
        return pa.table({"o_orderkey": b.column("o_orderkey"), "rating": capped})

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# sessionization (windowed/stateful op via sorted map_groups)
# ---------------------------------------------------------------------------


def q_user_sessions(sf_dir: str, gap_minutes: int = 30):
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        gaps = g["ts"].diff()
        n = int((gaps.isna() | (gaps > pd.Timedelta(minutes=gap_minutes))).sum())
        return pd.DataFrame({"user_id": [g["user_id"].iloc[0]], "sessions": [n]})

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")


# ---------------------------------------------------------------------------
# junk-only containers analog (A6 — empty_directory_observer.py:50-57)
# ---------------------------------------------------------------------------


def q_error_prone_users(sf_dir: str):
    """Junk-dominated containers analog: users whose error share is ≥ 20%
    (the junk-only-directory whitelist rule, generalized to a threshold so
    the result is non-degenerate at every sf)."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def mark(b: pa.Table) -> pa.Table:
        err = pc.equal(b.column("event_type"), "error").cast(pa.int64())
        return pa.table({"user_id": b.column("user_id"), "is_err": err})

    agg = ds.map_batches(mark, batch_format="pyarrow").groupby("user_id").aggregate(Count(), Sum("is_err"))

    def pick(b: pa.Table) -> pa.Table:
        keep = pc.greater_equal(
            pc.multiply(b.column("sum(is_err)"), pa.scalar(5, pa.int64())), b.column("count()")
        )
        b = b.rename_columns(["user_id", "events", "errors"])
        return b.filter(keep)

    return agg.map_batches(pick, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# round-2 oracle-net growth (VERDICT r01 #10): window functions, per-group
# top-k, temporal rollup, count-distinct, discrete quantile, anti-join,
# union, and the supplier dimension
# ---------------------------------------------------------------------------


def q_running_value(sf_dir: str):
    """Per-user running total of event value (window function analog:
    sorted cumulative sum inside map_groups)."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    ds = ds.map_batches(lambda b: _cents(b, "value", "vc"), batch_format="pyarrow").drop_columns(["value"])

    def running(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": g["user_id"].to_numpy(),
                "running_cents": g["vc"].cumsum().to_numpy(),
            }
        )

    return ds.groupby("user_id").map_groups(running, batch_format="pandas")


def q_top2_orders_per_segment(sf_dir: str):
    """Top-2 orders by price within each market segment (per-group top-k /
    row_number window analog)."""
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    orders = orders.map_batches(lambda b: _cents(b, "o_totalprice", "price_cents"), batch_format="pyarrow").drop_columns(["o_totalprice"])
    cust = _read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).rename_columns(
        ["o_custkey", "c_mktsegment"]
    )
    joined = join(orders, cust, on="o_custkey", how="inner")

    def top2(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["price_cents", "o_orderkey"], ascending=[False, True]).head(2)
        g = g.copy()
        g["rnk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["c_mktsegment", "o_orderkey", "price_cents", "rnk"]]

    return joined.groupby("c_mktsegment").map_groups(top2, batch_format="pandas")


def q_orders_monthly(sf_dir: str):
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        month = pc.floor_temporal(b.column("o_orderdate"), unit="month").cast(pa.timestamp("us"))
        b = b.append_column("month", month)
        return _cents(b, "o_totalprice", "price_cents").drop_columns(["o_orderdate", "o_totalprice"])

    ds = ds.map_batches(prep, batch_format="pyarrow")
    agg = grouped_sum(ds, ["month"], {"price_cents": "revenue_cents"}, count_out="orders_cnt")
    return _select(agg, ["month", "orders_cnt", "revenue_cents"])


def q_distinct_users_by_type(sf_dir: str):
    """count(DISTINCT user_id) per event_type: pair-dedup groupby, then a
    tiny count groupby (the exact two-shuffle distinct pattern; sketches
    would make this one-shuffle approximate)."""
    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    pairs = ds.groupby(["event_type", "user_id"]).count()
    out = pairs.groupby("event_type").count()
    return _rename(out, {"count()": "users"})


def q_approx_distinct_users_by_type(sf_dir: str):
    """The SKETCHED twin of q_distinct_users_by_type: per-key HyperLogLog
    registers folded per block and max-merged — zero shuffles and
    #keys × 4 KB of state where the exact version pays two shuffles.
    Approximate (σ ≈ 1.6% at p=12) yet SQL-CHECKED: the register hash is
    DuckDB's md5_number_upper, the 2^-rank sum folds in exact integer
    arithmetic, and the linear-counting log is the same libm — the oracle
    replays the sketch register-for-register (see ORACLE_SQL entry).
    The accuracy bound vs the exact query stays pytest-asserted
    (tests/test_sketches.py); scale paths use the vectorized xxh64 fold."""
    from ..functions.sketches import hll_distinct_by_key_md5

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    return hll_distinct_by_key_md5(ds, key="event_type", col="user_id", p=12)


def q_median_chars_by_lang(sf_dir: str):
    """Discrete median (quantile_disc 0.5: element at (n-1)//2 of the
    sorted values — matches DuckDB's convention exactly)."""
    ds = _read(sf_dir, "documents", columns=["lang", "n_chars"])

    def med(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["n_chars"].to_numpy())
        return pd.DataFrame({"lang": [g["lang"].iloc[0]], "med_chars": [int(v[(len(v) - 1) // 2])]})

    return ds.groupby("lang").map_groups(med, batch_format="pandas")


def q_users_without_errors(sf_dir: str):
    """Users with no error event in the opening window (broadcast
    anti-join: the early-error user set is tiny by construction, so the
    anti side broadcasts instead of shuffling)."""
    import datetime as dt

    cutoff = dt.datetime(2024, 1, 3)
    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts"])
    err = ds.map_batches(
        lambda b: b.filter(
            pc.and_(pc.equal(b.column("event_type"), "error"), pc.less(b.column("ts"), pa.scalar(cutoff)))
        ).select(["user_id"]),
        batch_format="pyarrow",
    )
    err_ids = np.unique(err.to_pandas()["user_id"].to_numpy())
    err_users = pa.table({"user_id": pa.array(err_ids, pa.int64())})
    users = ds.groupby("user_id").count().drop_columns(["count()"])
    return broadcast_join(users, err_users, on="user_id", how="anti")


def q_union_all_names(sf_dir: str):
    nation = _read(sf_dir, "nation", columns=["n_name"])
    region = _read(sf_dir, "region", columns=["r_name"])
    a = _rename(nation, {"n_name": "name"})
    b = _rename(region, {"r_name": "name"})
    return a.union(b)


def q_supplier_nation(sf_dir: str):
    sup = _read(sf_dir, "supplier", columns=["s_nationkey", "s_acctbal"])
    sup = sup.map_batches(
        lambda b: _cents(b, "s_acctbal", "acct_cents").drop_columns(["s_acctbal"]), batch_format="pyarrow"
    )
    nation = _read_table(sf_dir, "nation", columns=["n_nationkey", "n_name"])

    def widen(b: pa.Table) -> pa.Table:
        idx = b.column_names.index("s_nationkey")
        return b.set_column(idx, "s_nationkey", b.column("s_nationkey").cast(pa.int64()))

    sup = sup.map_batches(widen, batch_format="pyarrow")
    dim = pa.table(
        {
            "s_nationkey": nation.column("n_nationkey").cast(pa.int64()),
            "n_name": nation.column("n_name"),
        }
    )
    joined = broadcast_join(sup, dim, on="s_nationkey", how="inner")
    agg = grouped_sum(joined, ["n_name"], {"acct_cents": "total_acct_cents"}, count_out="suppliers")
    return _select(agg, ["n_name", "suppliers", "total_acct_cents"])


def q_priority_revenue(sf_dir: str):
    """Fact-to-fact join through the AUTO join front door
    (stages.joins.join): it broadcasts the orders key→priority map while
    its metadata-estimated size fits in memory and silently switches to
    the co-partitioned shuffle plan above the threshold — users get the
    scale-safe physical plan without choosing one (VERDICT r02 #5)."""
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice"])
    li = li.map_batches(
        lambda b: _cents(b, "l_extendedprice", "price_cents").drop_columns(["l_extendedprice"]),
        batch_format="pyarrow",
    )
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    orders = _rename(orders, {"o_orderkey": "l_orderkey"})
    joined = join(li, orders, on="l_orderkey", how="inner")
    agg = grouped_sum(joined, ["o_orderpriority"], {"price_cents": "revenue_cents"}, count_out="items")
    return _select(agg, ["o_orderpriority", "items", "revenue_cents"])


def q_rolling_user_value(sf_dir: str):
    """Sliding 1-hour RANGE window per user: for each event, the sum of
    that user's value-cents over [ts - 1h, ts] INCLUDING ts-peers (exact
    SQL RANGE-frame semantics). Vectorized inside map_groups: prefix sums
    + two searchsorted probes per group — no per-row loop."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    ds = ds.map_batches(lambda b: _cents(b, "value", "vc"), batch_format="pyarrow").drop_columns(["value"])

    def rolling(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        vc = g["vc"].to_numpy()
        cum = np.concatenate([[0], np.cumsum(vc)])
        hi = np.searchsorted(ts, ts, side="right")
        lo = np.searchsorted(ts, ts - 3_600_000_000, side="left")
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": g["user_id"].to_numpy(),
                "rolling_cents": cum[hi] - cum[lo],
            }
        )

    return ds.groupby("user_id").map_groups(rolling, batch_format="pandas")


def q_daily_active_users(sf_dir: str):
    """Distinct users per day: pair-dedup groupby then a per-day count —
    the exact two-shuffle distinct (q_distinct_users_by_type's temporal
    twin)."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def day(b: pa.Table) -> pa.Table:
        d = pc.floor_temporal(b.column("ts"), unit="day").cast(pa.timestamp("us"))
        return pa.table({"day": d, "user_id": b.column("user_id")})

    pairs = ds.map_batches(day, batch_format="pyarrow").groupby(["day", "user_id"]).count()
    out = pairs.groupby("day").count()
    return _rename(out, {"count()": "users"})


def q_priority_revenue_copart(sf_dir: str):
    """Same result as q_priority_revenue through the SAME front door, but
    with the broadcast threshold forced to 0 — the planner must take the
    big-big co-partitioned path: both sides shuffle once by key-hash
    bucket and merge Arrow-native per bucket. The SQL oracle is identical,
    which is the point: two physical join strategies, one logical
    answer."""
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice"])
    li = li.map_batches(
        lambda b: _cents(b, "l_extendedprice", "price_cents").drop_columns(["l_extendedprice"]),
        batch_format="pyarrow",
    )
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    orders = _rename(orders, {"o_orderkey": "l_orderkey"})
    joined = join(li, orders, on="l_orderkey", how="inner",
                  broadcast_threshold_bytes=0, n_partitions=32)
    agg = grouped_sum(joined, ["o_orderpriority"], {"price_cents": "revenue_cents"}, count_out="items")
    return _select(agg, ["o_orderpriority", "items", "revenue_cents"])


def q_nation_revenue(sf_dir: str):
    """Three-hop star join (lineitem→orders→customer→nation, the TPC-H
    Q5 shape) composed entirely through the size-aware join() front
    door, then ONE grouped sum.  Each hop re-keys the fact stream and
    immediately drops the spent key so only (new_key, price_cents) ever
    shuffles; the 25-row nation dim rides the last hop as a guaranteed
    broadcast.  Exercises join CHAINING: the planner picks a physical
    strategy per hop from the side sizes, not once per pipeline."""
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice"])
    li = li.map_batches(
        lambda b: _cents(b, "l_extendedprice", "price_cents").drop_columns(["l_extendedprice"]),
        batch_format="pyarrow",
    )
    orders = _rename(
        _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]), {"o_orderkey": "l_orderkey"}
    )
    j1 = join(li, orders, on="l_orderkey", how="inner").drop_columns(["l_orderkey"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    cust = cust.map_batches(
        lambda b: pa.table(
            {
                "o_custkey": b.column("c_custkey").cast(pa.int64()),
                "c_nationkey": b.column("c_nationkey").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    j2 = join(j1, cust, on="o_custkey", how="inner").drop_columns(["o_custkey"])
    nation = _read_table(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    dim = pa.table(
        {
            "c_nationkey": nation.column("n_nationkey").cast(pa.int64()),
            "n_name": nation.column("n_name"),
        }
    )
    j3 = broadcast_join(j2, dim, on="c_nationkey", how="inner")
    agg = grouped_sum(j3, ["n_name"], {"price_cents": "revenue_cents"}, count_out="items")
    return _select(agg, ["n_name", "items", "revenue_cents"])



def q_asof_latest_order(sf_dir: str):
    """AS-OF join (a custom operator Ray Data lacks): each event picks the
    user's most recent order as of the event time. Oracle: DuckDB ASOF
    LEFT JOIN with a deterministic max-orderkey dedup of equal
    (custkey, orderdate) rights — the engine's ``tiebreak`` mirrors it."""
    from ..stages.joins import asof_join

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    od = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice", "o_orderkey"])
    out = asof_join(
        ev,
        od,
        by_left="user_id",
        by_right="o_custkey",
        on_left="ts",
        on_right="o_orderdate",
        right_value_cols=["o_orderdate", "o_totalprice"],
        tiebreak="o_orderkey",
    )
    return _rename(out, {"o_orderdate": "last_order_date", "o_totalprice": "last_order_price"})


def q_event_bursts(sf_dir: str, window_minutes: int = 10):
    """Range self-join (burst detection): ordered same-user event pairs
    within ``window_minutes``. One key-hash shuffle; the per-bucket kernel
    is lexsort + two searchsorteds + vectorized expansion."""
    from ..stages.joins import range_window_pairs

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    out = range_window_pairs(
        ev, by="user_id", on="ts", window=window_minutes * 60 * 1_000_000, id_col="event_id"
    )
    return _rename(out, {"id_a": "ev_a", "id_b": "ev_b"})

def q_revenue_cube(sf_dir: str):
    """Multi-level rollup (GROUPING SETS analog): revenue by
    (segment, year), (segment,), and the grand total. Only the FINEST
    grain runs as a distributed aggregation; the coarser levels derive
    from that (tiny, segments×years-sized) aggregate on the driver —
    never rescanning the fact table. NULL dims mark rolled-up levels,
    mirroring SQL GROUPING SETS output."""
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "o_totalprice", "price_cents")
        yr = pc.year(b.column("o_orderdate")).cast(pa.int64())
        return pa.table(
            {"o_custkey": b.column("o_custkey"), "yr": yr, "price_cents": b.column("price_cents")}
        )

    ds = orders.map_batches(prep, batch_format="pyarrow")
    cust = _read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).rename_columns(
        ["o_custkey", "segment"]
    )
    joined = join(ds, cust, on="o_custkey", how="inner")
    fine = grouped_sum(
        joined, ["segment", "yr"], {"price_cents": "revenue_cents"}, count_out="orders_cnt"
    ).to_pandas()
    seg = fine.groupby("segment", as_index=False)[["orders_cnt", "revenue_cents"]].sum()
    segments = list(fine["segment"]) + list(seg["segment"]) + [None]
    years = [int(y) for y in fine["yr"]] + [None] * (len(seg) + 1)
    cnts = list(fine["orders_cnt"]) + list(seg["orders_cnt"]) + [int(fine["orders_cnt"].sum())]
    revs = list(fine["revenue_cents"]) + list(seg["revenue_cents"]) + [int(fine["revenue_cents"].sum())]
    return pa.table(
        {
            "segment": pa.array(segments, pa.string()),
            "yr": pa.array(years, pa.int64()),
            "orders_cnt": pa.array([int(c) for c in cnts], pa.int64()),
            "revenue_cents": pa.array([int(r) for r in revs], pa.int64()),
        }
    )


def q_order_gaps(sf_dir: str):
    """LAG window analog: per order, days since the same customer's
    previous order (NULL for a customer's first). One per-customer
    map_groups with a vectorized sorted diff — the lag() OVER
    (PARTITION BY ... ORDER BY ...) pattern."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_orderdate", "o_orderkey"])
        gap = (g["o_orderdate"] - g["o_orderdate"].shift(1)).dt.days
        return pd.DataFrame(
            {
                "o_orderkey": g["o_orderkey"].to_numpy(),
                "o_custkey": g["o_custkey"].to_numpy(),
                # float64 with NaN for the first order: nullable BIGINT
                # arrives as float64 from DuckDB's pandas conversion, and
                # the driver's int widening chokes on pandas' masked Int64
                "gap_days": gap.astype(np.float64),
            }
        )

    return ds.groupby("o_custkey").map_groups(gaps, batch_format="pandas")


ORACLE_SQL = {
    "revenue_cube": (
        "SELECT c_mktsegment AS segment, CAST(year(o_orderdate) AS BIGINT) AS yr, "
        "CAST(count(*) AS BIGINT) AS orders_cnt, "
        "cast(sum(cast(round(o_totalprice*100) AS bigint)) AS BIGINT) AS revenue_cents "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "GROUP BY GROUPING SETS ((c_mktsegment, year(o_orderdate)), (c_mktsegment), ())"
    ),
    "order_gaps": (
        "SELECT o_orderkey, o_custkey, date_diff('day', "
        "lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), "
        "o_orderdate) AS gap_days FROM orders"
    ),
    "asof_latest_order": (
        "WITH r AS (SELECT o_custkey, o_orderdate, o_totalprice FROM orders "
        "QUALIFY row_number() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) = 1) "
        "SELECT e.event_id, e.user_id, e.ts, o.o_orderdate AS last_order_date, "
        "o.o_totalprice AS last_order_price "
        "FROM events e ASOF LEFT JOIN r o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate"
    ),
    "event_bursts": (
        "SELECT a.event_id AS ev_a, b.event_id AS ev_b, a.user_id "
        "FROM events a JOIN events b ON a.user_id = b.user_id "
        "AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTES"
    ),
    "count_by_lang": "SELECT lang, count(*) AS cnt FROM documents GROUP BY lang",
    "chars_by_lang": (
        "SELECT lang, cast(sum(n_chars) AS BIGINT) AS total_chars, count(*) AS docs "
        "FROM documents GROUP BY lang"
    ),
    "events_by_type": (
        "SELECT event_type, count(*) AS cnt, "
        "cast(sum(cast(round(value*100) AS bigint)) AS BIGINT) AS total_value_cents "
        "FROM events GROUP BY event_type"
    ),
    "events_hourly": (
        "SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS cnt, "
        "cast(sum(cast(round(value*100) AS bigint)) AS BIGINT) AS total_value_cents "
        "FROM events GROUP BY 1, 2"
    ),
    "top10_docs": "SELECT doc_id, n_chars FROM documents ORDER BY n_chars DESC, doc_id LIMIT 10",
    "top_sources": (
        "SELECT source, cast(sum(n_chars) AS BIGINT) AS total_chars FROM documents GROUP BY source "
        "ORDER BY total_chars DESC, source LIMIT 10"
    ),
    "top5_orders": (
        "SELECT o_orderkey, cast(round(o_totalprice*100) AS bigint) AS price_cents FROM orders "
        "ORDER BY price_cents DESC, o_orderkey LIMIT 5"
    ),
    "dup_sizes": (
        "SELECT doc_id, n_chars FROM documents WHERE n_chars IN "
        "(SELECT n_chars FROM documents GROUP BY n_chars HAVING count(*) > 1)"
    ),
    "exact_dedup_docs": (
        "SELECT min(doc_id) AS keeper_doc_id, count(*) AS copies FROM documents GROUP BY text"
    ),
    "filter_chain_events": (
        "SELECT event_id, event_type, cast(round(value*100) AS bigint) AS value_cents FROM events "
        "WHERE cast(round(value*100) AS bigint) BETWEEN 500 AND 1500 AND event_type <> 'error'"
    ),
    "regex_filter_docs": (
        "SELECT doc_id FROM documents WHERE regexp_matches(text, 'spark.*window', 'i')"
    ),
    "or_filter_events": (
        "SELECT event_id, event_type, cast(round(value*100) AS bigint) AS value_cents FROM events "
        "WHERE event_type LIKE '%click%' OR cast(round(value*100) AS bigint) >= 1800"
    ),
    "rollup_nation": (
        "SELECT n_name, count(*) AS customers, "
        "cast(sum(cast(round(c_acctbal*100) AS bigint)) AS BIGINT) AS total_acct_cents "
        "FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"
    ),
    "rollup_region": (
        "SELECT r_name, count(*) AS customers FROM customer "
        "JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"
    ),
    "segment_revenue": (
        "SELECT c_mktsegment, count(*) AS orders_cnt, "
        "cast(sum(cast(round(o_totalprice*100) AS bigint)) AS BIGINT) AS revenue_cents "
        "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment"
    ),
    "pricing_summary": (
        "SELECT l_returnflag, l_linestatus, "
        "cast(sum(cast(round(l_quantity*100) AS bigint)) AS BIGINT) AS sum_qty_cents, "
        "cast(sum(cast(round(l_extendedprice*100) AS bigint)) AS BIGINT) AS sum_price_cents, "
        "cast(sum(cast(round(l_extendedprice*(1-l_discount)*100) AS bigint)) AS BIGINT) AS sum_disc_price_cents, "
        "count(*) AS cnt FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01' "
        "GROUP BY l_returnflag, l_linestatus"
    ),
    "like_lookup": "SELECT doc_id, source FROM documents WHERE source = 'src5' AND text LIKE '%query%'",
    "token_counts": (
        "SELECT doc_id, length(text) AS n_chars_computed, "
        "len(regexp_extract_all(text, '\\S+')) AS n_tokens FROM documents"
    ),
    "keywords_exploded": "SELECT p_partkey, unnest(string_split(p_name, ' ')) AS keyword FROM part",
    "priority_rating": (
        "SELECT o_orderkey, least(cast(regexp_extract(o_orderpriority, '([0-9])', 1) AS bigint), 5) AS rating "
        "FROM orders"
    ),
    "user_sessions": (
        "WITH x AS (SELECT user_id, ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS d "
        "FROM events) SELECT user_id, cast(sum(CASE WHEN d IS NULL OR d > INTERVAL 30 MINUTE THEN 1 ELSE 0 END) AS bigint) "
        "AS sessions FROM x GROUP BY user_id"
    ),
    "error_prone_users": (
        "SELECT user_id, count(*) AS events, "
        "cast(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors "
        "FROM events GROUP BY user_id HAVING errors * 5 >= count(*)"
    ),
    "running_value": (
        "SELECT event_id, user_id, cast(sum(cast(round(value*100) AS bigint)) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) "
        "AS running_cents FROM events"
    ),
    "top2_orders_per_segment": (
        "WITH ranked AS (SELECT c_mktsegment, o_orderkey, "
        "cast(round(o_totalprice*100) AS bigint) AS price_cents, "
        "row_number() OVER (PARTITION BY c_mktsegment "
        "ORDER BY cast(round(o_totalprice*100) AS bigint) DESC, o_orderkey) AS rnk "
        "FROM orders JOIN customer ON o_custkey = c_custkey) "
        "SELECT c_mktsegment, o_orderkey, price_cents, cast(rnk AS BIGINT) AS rnk "
        "FROM ranked WHERE rnk <= 2"
    ),
    "orders_monthly": (
        "SELECT date_trunc('month', o_orderdate) AS month, count(*) AS orders_cnt, "
        "cast(sum(cast(round(o_totalprice*100) AS bigint)) AS BIGINT) AS revenue_cents "
        "FROM orders GROUP BY 1"
    ),
    "distinct_users_by_type": (
        "SELECT event_type, cast(count(DISTINCT user_id) AS BIGINT) AS users "
        "FROM events GROUP BY event_type"
    ),
    # Replays the HLL sketch register-for-register (p=12, m=4096, cap=53):
    # md5_number_upper == little-endian first 8 md5 bytes (the engine's
    # md5_u64_batch); rank = 53 - bitlen(low 52 bits) via bin() string
    # length (exact, no FP); the 2^-rank sum folds as HUGEINT 2^(53-r);
    # absent registers contribute 2^53 each; linear counting through the
    # same libm ln; half-up final rounding. Bit-identical to
    # hll_estimate_sql_exact by construction.
    "approx_distinct_users_by_type": (
        "WITH h AS ("
        " SELECT event_type, md5_number_upper(CAST(user_id AS VARCHAR)) AS hv"
        " FROM events WHERE user_id IS NOT NULL"
        "), reg AS ("
        " SELECT event_type, hv >> 52 AS idx,"
        "  CASE WHEN hv % 4503599627370496::UBIGINT = 0 THEN 53"
        "       ELSE 53 - length(bin(hv % 4503599627370496::UBIGINT)) END AS rnk"
        " FROM h"
        "), rmax AS ("
        " SELECT event_type, idx, MAX(rnk) AS r FROM reg GROUP BY event_type, idx"
        "), agg AS ("
        " SELECT event_type, COUNT(*) AS cnt,"
        "  SUM(9007199254740992::HUGEINT / CAST(1::UBIGINT << r AS HUGEINT)) AS s_present"
        " FROM rmax GROUP BY event_type"
        "), est AS ("
        " SELECT event_type, 4096 - cnt AS zeros,"
        "  (0.7213 / (1 + 1.079 / 4096)) * 4096 * 4096 * 9007199254740992"
        "   / CAST(s_present + CAST(4096 - cnt AS HUGEINT) * 9007199254740992::HUGEINT AS DOUBLE) AS raw"
        " FROM agg"
        ") SELECT event_type,"
        " CAST(floor(CASE WHEN raw <= 10240.0 AND zeros > 0"
        "   THEN 4096.0 * ln(4096.0 / zeros) ELSE raw END + 0.5) AS BIGINT) AS approx_distinct "
        "FROM est ORDER BY event_type"
    ),
    "median_chars_by_lang": (
        "SELECT lang, cast(quantile_disc(n_chars, 0.5) AS BIGINT) AS med_chars "
        "FROM documents GROUP BY lang"
    ),
    "users_without_errors": (
        "SELECT DISTINCT user_id FROM events WHERE user_id NOT IN "
        "(SELECT DISTINCT user_id FROM events WHERE event_type = 'error' "
        "AND ts < TIMESTAMP '2024-01-03')"
    ),
    "union_all_names": (
        "SELECT n_name AS name FROM nation UNION ALL SELECT r_name AS name FROM region"
    ),
    "supplier_nation": (
        "SELECT n_name, count(*) AS suppliers, "
        "cast(sum(cast(round(s_acctbal*100) AS bigint)) AS BIGINT) AS total_acct_cents "
        "FROM supplier JOIN nation ON s_nationkey = n_nationkey GROUP BY n_name"
    ),
    "priority_revenue": (
        "SELECT o_orderpriority, count(*) AS items, "
        "cast(sum(cast(round(l_extendedprice*100) AS bigint)) AS BIGINT) AS revenue_cents "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY o_orderpriority"
    ),
    "priority_revenue_copart": (
        "SELECT o_orderpriority, count(*) AS items, "
        "cast(sum(cast(round(l_extendedprice*100) AS bigint)) AS BIGINT) AS revenue_cents "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY o_orderpriority"
    ),
    "nation_revenue": (
        "SELECT n_name, count(*) AS items, "
        "cast(sum(cast(round(l_extendedprice*100) AS bigint)) AS BIGINT) AS revenue_cents "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"
    ),
    "daily_active_users": (
        "SELECT date_trunc('day', ts) AS day, cast(count(DISTINCT user_id) AS BIGINT) AS users "
        "FROM events GROUP BY 1"
    ),
    "rolling_user_value": (
        "SELECT event_id, user_id, cast(sum(cast(round(value*100) AS bigint)) OVER "
        "(PARTITION BY user_id ORDER BY ts RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) "
        "AS BIGINT) AS rolling_cents FROM events"
    ),
}

QUERIES = {
    "revenue_cube": q_revenue_cube,
    "order_gaps": q_order_gaps,
    "count_by_lang": q_count_by_lang,
    "chars_by_lang": q_chars_by_lang,
    "events_by_type": q_events_by_type,
    "events_hourly": q_events_hourly,
    "top10_docs": q_top10_docs,
    "top_sources": q_top_sources,
    "top5_orders": q_top5_orders,
    "dup_sizes": q_dup_sizes,
    "exact_dedup_docs": q_exact_dedup_docs,
    "filter_chain_events": q_filter_chain_events,
    "regex_filter_docs": q_regex_filter_docs,
    "or_filter_events": q_or_filter_events,
    "rollup_nation": q_rollup_nation,
    "rollup_region": q_rollup_region,
    "segment_revenue": q_segment_revenue,
    "pricing_summary": q_pricing_summary,
    "like_lookup": q_like_lookup,
    "token_counts": q_token_counts,
    "keywords_exploded": q_keywords_exploded,
    "priority_rating": q_priority_rating,
    "user_sessions": q_user_sessions,
    "error_prone_users": q_error_prone_users,
    "running_value": q_running_value,
    "top2_orders_per_segment": q_top2_orders_per_segment,
    "orders_monthly": q_orders_monthly,
    "distinct_users_by_type": q_distinct_users_by_type,
    "approx_distinct_users_by_type": q_approx_distinct_users_by_type,
    "median_chars_by_lang": q_median_chars_by_lang,
    "users_without_errors": q_users_without_errors,
    "union_all_names": q_union_all_names,
    "supplier_nation": q_supplier_nation,
    "priority_revenue": q_priority_revenue,
    "nation_revenue": q_nation_revenue,
    "priority_revenue_copart": q_priority_revenue_copart,
    "rolling_user_value": q_rolling_user_value,
    "daily_active_users": q_daily_active_users,
    "asof_latest_order": q_asof_latest_order,
    "event_bursts": q_event_bursts,
}


def q_users_customers_outer(sf_dir: str):
    """FULL OUTER join (both-sided unmatched keys preserved): per-user
    event counts ⟗ customer balances on user_id = c_custkey. Routed
    through the join() front door, which always picks the co-partitioned
    plan for outer — the one physical strategy that can emit unmatched
    right rows exactly once."""
    ev = _read(sf_dir, "events", columns=["user_id"])
    users = grouped_sum(ev, ["user_id"], {}, count_out="events")
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])
    cust = cust.map_batches(
        lambda b: _cents(b, "c_acctbal", "acct_cents")
        .rename_columns(["user_id", "c_acctbal", "acct_cents"])
        .drop_columns(["c_acctbal"]),
        batch_format="pyarrow",
    )
    return join(users, cust, on="user_id", how="outer")


ORACLE_SQL["users_customers_outer"] = (
    "WITH u AS (SELECT user_id, count(*) AS events FROM events GROUP BY user_id), "
    "c AS (SELECT c_custkey, cast(round(c_acctbal*100) AS BIGINT) AS acct_cents FROM customer) "
    "SELECT coalesce(u.user_id, c.c_custkey) AS user_id, events, acct_cents "
    "FROM u FULL OUTER JOIN c ON u.user_id = c.c_custkey"
)
QUERIES["users_customers_outer"] = q_users_customers_outer


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_events_pivot(sf_dir: str):
    """Pivot (long → wide): per-user event counts with one column per
    event type. The wide columns are built as 0/1 indicator columns
    INSIDE the partial-aggregation combiner, so the shuffle carries one
    pre-summed row per (block, user) — a pivot is just a grouped_sum
    with k indicator sums, never a per-type scan or a post-join."""
    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def indicators(b: pa.Table) -> pa.Table:
        cols = {"user_id": b.column("user_id")}
        for t in _EVENT_TYPES:
            cols[f"n_{t}"] = pc.cast(pc.equal(b.column("event_type"), t), pa.int64())
        return pa.table(cols)

    wide = ev.map_batches(indicators, batch_format="pyarrow")
    agg = grouped_sum(wide, ["user_id"], {f"n_{t}": f"n_{t}" for t in _EVENT_TYPES})
    return _select(agg, ["user_id"] + [f"n_{t}" for t in _EVENT_TYPES])


ORACLE_SQL["events_pivot"] = (
    "SELECT user_id, "
    + ", ".join(
        f"cast(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}"
        for t in _EVENT_TYPES
    )
    + " FROM events GROUP BY user_id"
)
QUERIES["events_pivot"] = q_events_pivot


def q_value_histogram(sf_dir: str, width: float = 5.0):
    """Equi-width histogram of the events value column (bin = floor(v/w)):
    vectorized binning inside the combiner, then the tiny bin-count
    groupby — the EXACT twin of the mergeable histogram sketch, expressed
    as a first-class aggregation."""
    ev = _read(sf_dir, "events", columns=["value"])

    def binned(b: pa.Table) -> pa.Table:
        bin_id = pc.floor(pc.divide(b.column("value"), width)).cast(pa.int64())
        return pa.table({"bin": bin_id})

    agg = grouped_sum(ev.map_batches(binned, batch_format="pyarrow"), ["bin"], {}, count_out="cnt")
    return _select(agg, ["bin", "cnt"])


ORACLE_SQL["value_histogram"] = (
    "SELECT cast(floor(value / 5.0) AS BIGINT) AS bin, count(*) AS cnt FROM events GROUP BY 1"
)
QUERIES["value_histogram"] = q_value_histogram


def q_value_outliers(sf_dir: str):
    """Per-type tail outlier counts: events strictly above their type's
    exact p90 (quantile_disc convention — the threshold is an actual data
    element, so both engines compare identical float64 bit patterns and
    the value hash stays exact).  The threshold comes from the
    distributed histogram-narrowing quantile (functions/quantiles.py) —
    no group is ever materialized — then broadcasts back for a
    streaming count (the two-phase threshold shape every quality-cutoff
    pipeline uses: score percentile → filter)."""
    from ..functions.quantiles import grouped_quantile_disc

    ev = _read(sf_dir, "events", columns=["event_type", "value"])
    th = grouped_quantile_disc(ev, "event_type", "value", 9, 10, out="p90")
    thr = dict(zip(th.column("event_type").to_pylist(), th.column("p90").to_pylist()))

    # vectorized lookup: binary-search keys against the sorted threshold table
    names = np.array(sorted(thr))
    cuts = np.array([thr[k] for k in names])

    def above(b: pa.Table) -> pa.Table:
        keys = b.column("event_type").to_numpy(zero_copy_only=False)
        vals = b.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        idx = np.minimum(np.searchsorted(names, keys), len(names) - 1)
        # a type absent from the quantile table (all-null values) has a
        # NULL threshold in SQL → its rows drop; mirror that instead of
        # probing a neighbor's threshold
        known = names[idx] == keys
        hit = known & (vals > cuts[idx])
        return pa.table({"event_type": pa.array(keys[hit]), "one": np.ones(int(hit.sum()), np.int64)})

    agg = grouped_sum(ev.map_batches(above, batch_format="pyarrow"), ["event_type"], {"one": "n_above"})
    out = agg.to_pandas()
    out["p90"] = [thr[k] for k in out["event_type"]]
    return pa.table(
        {
            "event_type": pa.array(out["event_type"]),
            "p90": pa.array(out["p90"], pa.float64()),
            "n_above": pa.array(out["n_above"], pa.int64()),
        }
    )


ORACLE_SQL["value_outliers"] = (
    "WITH th AS (SELECT event_type, quantile_disc(value, 0.9) AS p90 FROM events GROUP BY event_type) "
    "SELECT e.event_type, any_value(t.p90) AS p90, CAST(count(*) AS BIGINT) AS n_above "
    "FROM events e JOIN th t USING (event_type) WHERE e.value > t.p90 GROUP BY e.event_type"
)
QUERIES["value_outliers"] = q_value_outliers


def q_doc_deciles(sf_dir: str):
    """Percentile bucketing for quality-cutoff pipelines: assign every
    document its n_chars decile using EXACT global quantile thresholds.
    Scale path: the thresholds come from the value-FREQUENCY table
    (a grouped count over distinct n_chars — small whenever cardinality
    << rows), never a global sort; assignment is one broadcast of 9 ints
    probed with a vectorized searchsorted.  Bucket rule is the
    deterministic threshold-CASE ladder (NOT ntile, whose tie-splitting
    is assignment-order-dependent and thus unhashable)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    dist = (
        grouped_sum(
            ds.map_batches(lambda b: b.select(["n_chars"]), batch_format="pyarrow"),
            ["n_chars"],
            {},
            count_out="cnt",
        )
        .to_pandas()
        .sort_values("n_chars")
    )
    cum = dist["cnt"].cumsum().to_numpy()
    vals = dist["n_chars"].to_numpy()
    n = int(cum[-1])
    # quantile_disc(k/10) = value at 1-based rank ceil(k*n/10)
    ranks = [(k * n + 9) // 10 for k in range(1, 10)]
    thr = vals[np.searchsorted(cum, ranks)]

    def assign(b: pa.Table) -> pa.Table:
        v = b.column("n_chars").to_numpy(zero_copy_only=False)
        dec = 1 + np.searchsorted(thr, v, side="left")  # count of thresholds < v
        return pa.table({"doc_id": b.column("doc_id"), "decile": pa.array(dec, pa.int64())})

    return ds.map_batches(assign, batch_format="pyarrow")


ORACLE_SQL["doc_deciles"] = (
    "WITH th AS (SELECT "
    + ", ".join(f"quantile_disc(n_chars, {k}*0.1) AS t{k}" for k in range(1, 10))
    + " FROM documents) SELECT d.doc_id, CAST(CASE "
    + " ".join(f"WHEN d.n_chars <= t{k} THEN {k}" for k in range(1, 10))
    + " ELSE 10 END AS BIGINT) AS decile FROM documents d, th"
)
QUERIES["doc_deciles"] = q_doc_deciles


def _customer_setop(sf_dir: str, how: str):
    """INTERSECT/EXCEPT DISTINCT as a distinct key reduction + semi/anti
    join through the size-aware front door."""
    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def purchasers(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("event_type"), "purchase"))
        return pa.table({"c_custkey": pc.unique(t.column("user_id").cast(pa.int64()))})

    keys = ev.map_batches(purchasers, batch_format="pyarrow").groupby("c_custkey").count()
    # materialize the distinct-key dim so the front door SEES its size:
    # small → broadcast probe; huge → still the co-partition plan
    keys = keys.map_batches(lambda b: b.select(["c_custkey"]), batch_format="pyarrow").materialize()
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    cust = cust.map_batches(
        lambda b: pa.table(
            {"c_custkey": b.column("c_custkey").cast(pa.int64()), "c_mktsegment": b.column("c_mktsegment")}
        ),
        batch_format="pyarrow",
    )
    return join(cust, keys, on="c_custkey", how=how)


def q_purchasing_customers(sf_dir: str):
    """Set intersection: customers whose key appears among distinct
    purchase-event users."""
    return _customer_setop(sf_dir, "semi")


def q_dormant_customers(sf_dir: str):
    """Set difference: customers with NO purchase event."""
    return _customer_setop(sf_dir, "anti")


ORACLE_SQL["purchasing_customers"] = (
    "SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_mktsegment FROM customer "
    "WHERE c_custkey IN (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')"
)
QUERIES["purchasing_customers"] = q_purchasing_customers
ORACLE_SQL["dormant_customers"] = (
    "SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_mktsegment FROM customer "
    "WHERE c_custkey NOT IN (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')"
)
QUERIES["dormant_customers"] = q_dormant_customers


def q_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape: segment-filtered customers SEMI-prune orders, the
    surviving (order-key, date, priority) dims join the shipdate-filtered
    lineitem stream through the front door, ONE grouped sum, top-10.
    Every filter is applied before its join so only matching keys
    shuffle; revenue uses the integer-cents discipline."""
    import datetime as dt

    cutoff = dt.datetime(1997, 6, 1)
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    keys = cust.map_batches(
        lambda b: pa.table(
            {
                "o_custkey": b.filter(pc.equal(b.column("c_mktsegment"), "BUILDING"))
                .column("c_custkey")
                .cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    # materialize the derived dims so the front door sees REAL sizes and
    # can pick broadcast when they fit (they would shuffle anyway on the
    # co-partition plan, so this adds no data movement at scale)
    keys = keys.materialize()
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"])
    orders = orders.map_batches(
        lambda b: b.filter(pc.less(b.column("o_orderdate"), pa.scalar(cutoff))),
        batch_format="pyarrow",
    )
    orders = join(orders, keys, on="o_custkey", how="semi").drop_columns(["o_custkey"])
    orders = _rename(orders, {"o_orderkey": "l_orderkey"}).materialize()

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater(b.column("l_shipdate"), pa.scalar(cutoff)))
        disc = pc.round(
            pc.multiply(
                pc.multiply(b.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), b.column("l_discount"))),
                pa.scalar(100.0),
            ),
            round_mode="half_towards_infinity",
        ).cast(pa.int64())
        return pa.table({"l_orderkey": b.column("l_orderkey").cast(pa.int64()), "rev_cents": disc})

    li = li.map_batches(prep, batch_format="pyarrow")
    j = join(li, orders, on="l_orderkey", how="inner")
    agg = grouped_sum(j, ["l_orderkey", "o_orderdate", "o_orderpriority"], {"rev_cents": "revenue_cents"})
    out = agg.sort(["revenue_cents", "l_orderkey"], descending=[True, False]).limit(10)
    return _select(out, ["l_orderkey", "revenue_cents", "o_orderdate", "o_orderpriority"])


ORACLE_SQL["shipping_priority"] = (
    "SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey, "
    "CAST(sum(cast(round(l_extendedprice*(1-l_discount)*100) AS bigint)) AS BIGINT) AS revenue_cents, "
    "o_orderdate, o_orderpriority FROM customer, orders, lineitem "
    "WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey "
    "AND o_orderdate < TIMESTAMP '1997-06-01' AND l_shipdate > TIMESTAMP '1997-06-01' "
    "GROUP BY l_orderkey, o_orderdate, o_orderpriority "
    "ORDER BY revenue_cents DESC, l_orderkey LIMIT 10"
)
QUERIES["shipping_priority"] = q_shipping_priority


def q_new_users_daily(sf_dir: str):
    """Growth analytics: first-seen day per user (a grouped MIN with
    per-batch partials), then the day-table-sized daily count with a
    driver-side running total — the exact-cumulative-distinct shape that
    needs NO distinct-state at aggregation time because min(ts) is
    mergeable."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def p(b: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table(
                {"user_id": b.column("user_id"), "ts_us": b.column("ts").cast(pa.int64())}
            ),
            ["user_id"],
        ).aggregate([("ts_us", "min")])
        return pa.table({"user_id": g.column("user_id"), "ts_min_p": g.column("ts_us_min")})

    first = ds.map_batches(p, batch_format="pyarrow").groupby("user_id").aggregate(Min("ts_min_p"))

    def to_day(b: pa.Table) -> pa.Table:
        # floor_temporal (not int64 div, which truncates toward zero and
        # misplaces pre-epoch days): min(date_trunc) ≡ date_trunc(min)
        ts = b.column("min(ts_min_p)").cast(pa.timestamp("us"))
        return pa.table({"d": pc.floor_temporal(ts, unit="day").cast(pa.timestamp("us"))})

    daily = grouped_sum(first.map_batches(to_day, batch_format="pyarrow"), ["d"], {}, count_out="new_users")
    df = daily.to_pandas().sort_values("d").reset_index(drop=True)  # day-table-sized
    df["cum_users"] = df["new_users"].cumsum()
    return pa.table(
        {
            "d": pa.array(df["d"]).cast(pa.timestamp("us")),
            "new_users": pa.array(df["new_users"], pa.int64()),
            "cum_users": pa.array(df["cum_users"], pa.int64()),
        }
    )


ORACLE_SQL["new_users_daily"] = (
    "WITH fd AS (SELECT user_id, date_trunc('day', min(ts)) AS d FROM events GROUP BY user_id) "
    "SELECT d, CAST(count(*) AS BIGINT) AS new_users, "
    "CAST(sum(count(*)) OVER (ORDER BY d) AS BIGINT) AS cum_users FROM fd GROUP BY d"
)
QUERIES["new_users_daily"] = q_new_users_daily


def q_modal_event_type(sf_dir: str):
    """Per-user modal event type (grouped mode with deterministic ties:
    count DESC, type ASC).  Two-level: the (user, type) counts come from
    the partial-aggregated grouped sum; the per-user argmax is ONE more
    grouped reduction over that count table (user-type-cardinality-sized,
    not event-sized) — mode never sees raw events."""
    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])
    cnt = grouped_sum(ev, ["user_id", "event_type"], {}, count_out="cnt")

    def argmax(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cnt", "event_type"], ascending=[False, True]).head(1)
        return pd.DataFrame(
            {
                "user_id": g["user_id"].to_numpy(),
                "modal_type": g["event_type"].to_numpy(),
                "cnt": g["cnt"].to_numpy(),
            }
        )

    return cnt.groupby("user_id").map_groups(argmax, batch_format="pandas")


ORACLE_SQL["modal_event_type"] = (
    "WITH c AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2), "
    "r AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY cnt DESC, event_type) AS rn FROM c) "
    "SELECT user_id, event_type AS modal_type, cnt FROM r WHERE rn = 1"
)
QUERIES["modal_event_type"] = q_modal_event_type


def q_revenue_7d_moving(sf_dir: str):
    """7-day moving sum of daily event value: the daily rollup is the
    wide step (partial-aggregated grouped sum → day-table-sized), the
    moving window is a driver-side sliding sum over that tiny table —
    the scale-correct split for any calendar-window metric."""
    ev = _read(sf_dir, "events", columns=["ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "value", "vc")
        # floor_temporal, not int64 div: integer divide truncates toward
        # zero and lands pre-epoch timestamps on the wrong day
        d = pc.floor_temporal(b.column("ts"), unit="day").cast(pa.timestamp("us"))
        return pa.table({"d": d, "vc": b.column("vc")})

    daily = grouped_sum(ev.map_batches(prep, batch_format="pyarrow"), ["d"], {"vc": "day_cents"})
    df = daily.to_pandas().sort_values("d").reset_index(drop=True)
    vals = df["day_cents"].to_numpy()
    csum = np.concatenate([[0], np.cumsum(vals)])
    # ROWS 6 PRECEDING over the observed-day table (no gap filling), like
    # the SQL window over the same daily rollup
    win = np.array([csum[i + 1] - csum[max(0, i - 6)] for i in range(len(vals))], dtype=np.int64)
    return pa.table(
        {
            "d": pa.array(df["d"]).cast(pa.timestamp("us")),
            "day_cents": pa.array(vals, pa.int64()),
            "mov7_cents": pa.array(win, pa.int64()),
        }
    )


ORACLE_SQL["revenue_7d_moving"] = (
    "WITH daily AS (SELECT date_trunc('day', ts) AS d, "
    "CAST(sum(cast(round(value*100) AS bigint)) AS BIGINT) AS day_cents FROM events GROUP BY 1) "
    "SELECT d, day_cents, CAST(sum(day_cents) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS mov7_cents "
    "FROM daily"
)
QUERIES["revenue_7d_moving"] = q_revenue_7d_moving


def q_sources_by_lang(sf_dir: str):
    """Grouped ordered concat (the collect_list/string_agg family):
    distinct sources per language as one comma-joined sorted string.
    Two-level: the distinct (lang, source) reduction is the wide step
    (grouped count partials), the per-lang ordered join runs over that
    pair table (distinct-pair-sized, never raw rows)."""
    ds = _read(sf_dir, "documents", columns=["lang", "source"])
    # string_agg/count(DISTINCT ...) skip NULLs — drop them pre-concat
    ds = ds.map_batches(
        lambda b: b.filter(pc.is_valid(b.column("source"))), batch_format="pyarrow"
    )
    pairs = grouped_sum(ds, ["lang", "source"], {}, count_out="n")

    def cat(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("source")
        return pd.DataFrame(
            {
                "lang": [g["lang"].iloc[0]],
                "sources": [",".join(g["source"])],
                "n_sources": np.array([len(g)], dtype=np.int64),
            }
        )

    return pairs.groupby("lang").map_groups(cat, batch_format="pandas")


ORACLE_SQL["sources_by_lang"] = (
    "SELECT lang, string_agg(DISTINCT source, ',' ORDER BY source) AS sources, "
    "CAST(count(DISTINCT source) AS BIGINT) AS n_sources FROM documents GROUP BY lang"
)
QUERIES["sources_by_lang"] = q_sources_by_lang


def q_events_unpivot(sf_dir: str):
    """Unpivot (wide → long): melt the per-user pivot back to
    (user_id, event_type, cnt) rows, dropping zero cells to match
    GROUP BY's domain.  The melt is a streaming map_batches over the
    pivot output — one concat of k column-slices per batch, no shuffle
    beyond the pivot's own; round-tripping pivot∘unpivot ≡ the plain
    long-form aggregate is the correctness statement the oracle checks."""
    wide = q_events_pivot(sf_dir)

    def melt(b: pa.Table) -> pa.Table:
        parts = []
        for t in _EVENT_TYPES:
            cnt = b.column(f"n_{t}")
            keep = pc.greater(cnt, 0)
            kept_cnt = cnt.filter(keep)  # len() is empty-batch-safe (pc.sum is null there)
            parts.append(
                pa.table(
                    {
                        "user_id": b.column("user_id").filter(keep),
                        "event_type": pa.array([t] * len(kept_cnt), pa.string()),
                        "cnt": kept_cnt,
                    }
                )
            )
        return pa.concat_tables(parts)

    return wide.map_batches(melt, batch_format="pyarrow")


ORACLE_SQL["events_unpivot"] = (
    "SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2"
)
QUERIES["events_unpivot"] = q_events_unpivot


# ---------------------------------------------------------------------------
# mergeable-statistics batch: moments / cohorts / funnel / pareto
# (reference analog: sql/stats.sql aggregate family — SURVEY.md §2.4)
# ---------------------------------------------------------------------------


def grouped_min(ds, key: str, col: str, out: str, cast_int: bool = True):
    """Grouped MIN with per-batch partials — the mergeable shape shared by
    first-seen/cohort/funnel analytics: each block reduces to at most one
    row per key before the shuffle, so only key-sized partials move.
    Timestamps/ints are carried as int64 (``cast_int``); callers cast back."""

    def p(b: pa.Table) -> pa.Table:
        v = b.column(col)
        if cast_int:
            v = v.cast(pa.int64())
        g = pa.TableGroupBy(pa.table({key: b.column(key), "v": v}), [key]).aggregate([("v", "min")])
        return pa.table({key: g.column(key), "v_p": g.column("v_min")})

    agg = ds.map_batches(p, batch_format="pyarrow").groupby(key).aggregate(Min("v_p"))
    return _rename(agg, {"min(v_p)": out})


def q_value_moments_by_type(sf_dir: str):
    """Exact distributed moments per key: n / Σx / Σx² over integer cents —
    the mergeable-partials form every streaming variance/stddev derives
    from (var = (n·Σx² − (Σx)²)/n²), emitted as raw BIGINT moments so the
    value hash is bit-exact against SQL (a float stddev would diverge from
    DuckDB's Welford path in the last ulp).  One partial-aggregated
    groupby; nothing wider than the 5-key moment table ever shuffles."""
    ev = _read(sf_dir, "events", columns=["event_type", "value"])

    def p(b: pa.Table) -> pa.Table:
        cents = _cents(b, "value", "value_cents").column("value_cents")
        return pa.table(
            {
                "event_type": b.column("event_type"),
                "one": pc.is_valid(cents).cast(pa.int64()),
                "cents": cents,
                "sq": pc.multiply(cents, cents),
            }
        )

    out = grouped_sum(
        ev.map_batches(p, batch_format="pyarrow"),
        ["event_type"],
        {"one": "n", "cents": "sum_cents", "sq": "sumsq_cents"},
    )
    return _select(out, ["event_type", "n", "sum_cents", "sumsq_cents"])


ORACLE_SQL["value_moments_by_type"] = (
    "SELECT event_type, CAST(count(value) AS BIGINT) AS n, "
    "CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_cents, "
    "CAST(sum(CAST(round(value*100) AS BIGINT) * CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sumsq_cents "
    "FROM events GROUP BY event_type"
)
QUERIES["value_moments_by_type"] = q_value_moments_by_type


def q_cohort_retention(sf_dir: str):
    """Weekly cohort retention matrix: users grouped by first-active week,
    counted per weeks-since-cohort offset.  Scale shape: (1) distinct
    (user, week) pairs via a partial-aggregated pair groupby — raw events
    never shuffle; (2) cohort = mergeable min(week) per user; (3) the
    user-sized cohort table joins back through the auto join front door
    (broadcast at test scale, co-partition at 10^10 users); (4) the final
    count groups the tiny (cohort, offset) matrix.  All week arithmetic is
    integer µs on Monday-truncated stamps, so offsets are exact."""
    from ..stages.joins import join as _join

    ev = _read(sf_dir, "events", columns=["user_id", "ts"])
    week_us = 7 * 86400 * 10**6

    def wk(b: pa.Table) -> pa.Table:
        w = pc.floor_temporal(b.column("ts").cast(pa.timestamp("us")), unit="week")
        return pa.table({"user_id": b.column("user_id"), "w": w.cast(pa.int64())})

    pairs = grouped_sum(ev.map_batches(wk, batch_format="pyarrow"), ["user_id", "w"], {}, count_out="c")
    # distinct (user, week) — consumed twice (cohort + join left); one
    # materialize of the pair-sized table beats re-running the events
    # scan and the pair-dedup shuffle a second time
    pairs = _select(pairs, ["user_id", "w"]).materialize()
    cohort = grouped_min(pairs, "user_id", "w", "cohort_w").materialize()  # user-sized: size the join probe

    joined = _join(pairs, cohort, on="user_id", how="inner")

    def off(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort_w": b.column("cohort_w"),
                "offset_weeks": pc.divide(pc.subtract(b.column("w"), b.column("cohort_w")), pa.scalar(week_us)),
            }
        )

    mat = grouped_sum(
        joined.map_batches(off, batch_format="pyarrow"), ["cohort_w", "offset_weeks"], {}, count_out="users"
    )
    t = mat.to_pandas()  # (cohort, offset)-sized
    return pa.table(
        {
            "cohort": pa.array(t["cohort_w"], pa.int64()).cast(pa.timestamp("us")),
            "offset_weeks": pa.array(t["offset_weeks"], pa.int64()),
            "users": pa.array(t["users"], pa.int64()),
        }
    )


ORACLE_SQL["cohort_retention"] = (
    "WITH a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events), "
    "f AS (SELECT user_id, min(w) AS cohort FROM a GROUP BY user_id) "
    "SELECT f.cohort, CAST(datediff('day', f.cohort, a.w) // 7 AS BIGINT) AS offset_weeks, "
    "CAST(count(*) AS BIGINT) AS users FROM a JOIN f USING (user_id) GROUP BY 1, 2"
)
QUERIES["cohort_retention"] = q_cohort_retention


def q_funnel_stages(sf_dir: str):
    """Exact ordered funnel (view → click → purchase, strictly increasing
    ts) via the greedy earliest-transition chain: t1 = min(view), t2 =
    min(click with ts > t1), t3 = min(purchase with ts > t2) — a chain
    exists iff the greedy one does, so three mergeable grouped-mins with a
    user-sized join between stages replace any per-user sequence scan.
    Each stage's event read prunes to its type before the join; the
    stage tables broadcast at test scale and co-partition at 10^10 users
    (auto front door)."""
    from ..stages.joins import join as _join

    def typed(etype: str):
        ev = _read(sf_dir, "events", columns=["user_id", "event_type", "ts"])

        def f(b: pa.Table) -> pa.Table:
            m = pc.equal(b.column("event_type"), pa.scalar(etype))
            kept = b.filter(m)
            return pa.table({"user_id": kept.column("user_id"), "ts": kept.column("ts").cast(pa.int64())})

        return ev.map_batches(f, batch_format="pyarrow")

    prev = grouped_min(typed("view"), "user_id", "ts", "t_prev").materialize()
    counts = [prev.count()]
    for etype in ("click", "purchase"):
        joined = _join(typed(etype), prev, on="user_id", how="inner")

        def later(b: pa.Table) -> pa.Table:
            kept = b.filter(pc.greater(b.column("ts"), b.column("t_prev")))
            return pa.table({"user_id": kept.column("user_id"), "ts": kept.column("ts")})

        prev = grouped_min(joined.map_batches(later, batch_format="pyarrow"), "user_id", "ts", "t_prev").materialize()
        counts.append(prev.count())

    return pa.table(
        {
            "stage": pa.array(["view", "view>click", "view>click>purchase"], pa.string()),
            "users": pa.array(counts, pa.int64()),
        }
    )


ORACLE_SQL["funnel_stages"] = (
    "WITH v AS (SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id), "
    "c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v USING (user_id) "
    "WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id), "
    "p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c USING (user_id) "
    "WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id) "
    "SELECT 'view' AS stage, CAST(count(*) AS BIGINT) AS users FROM v "
    "UNION ALL SELECT 'view>click', CAST(count(*) AS BIGINT) FROM c "
    "UNION ALL SELECT 'view>click>purchase', CAST(count(*) AS BIGINT) FROM p"
)
QUERIES["funnel_stages"] = q_funnel_stages


def q_pareto_sources(sf_dir: str):
    """Pareto / cumulative-share table: sources ranked by total chars with
    a running total — the 'which 20% of sources carry 80% of the corpus'
    report.  The wide step is ONE partial-aggregated groupby; the window
    runs on the source-sized aggregate at the driver with a deterministic
    (chars DESC, source ASC, NULLS LAST) tie order matching the SQL frame."""
    d = _read(sf_dir, "documents", columns=["source", "n_chars"])
    agg = grouped_sum(d, ["source"], {"n_chars": "chars"})
    df = agg.to_pandas().sort_values(
        ["chars", "source"], ascending=[False, True], na_position="last"
    ).reset_index(drop=True)
    df["cum_chars"] = df["chars"].cumsum()
    return pa.table(
        {
            "source": pa.array(df["source"], pa.string()),
            "chars": pa.array(df["chars"], pa.int64()),
            "cum_chars": pa.array(df["cum_chars"], pa.int64()),
        }
    )


ORACLE_SQL["pareto_sources"] = (
    "WITH s AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS chars FROM documents GROUP BY source) "
    "SELECT source, chars, CAST(sum(chars) OVER (ORDER BY chars DESC, source) AS BIGINT) AS cum_chars FROM s"
)
QUERIES["pareto_sources"] = q_pareto_sources


def q_median_value_by_type(sf_dir: str):
    """Exact INTERPOLATED median per key (ANSI percentile_cont) through the
    two-order-statistic histogram-narrowing selector — the continuous twin
    of q_value_outliers' quantile_disc threshold.  No group is ever
    sorted or materialized; the narrowing shuffles only per-(key, bin)
    count partials."""
    from ..functions.quantiles import grouped_quantile_cont

    ev = _read(sf_dir, "events", columns=["event_type", "value"])
    return grouped_quantile_cont(ev, "event_type", "value", 1, 2, out="med")


ORACLE_SQL["median_value_by_type"] = (
    "SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY event_type"
)
QUERIES["median_value_by_type"] = q_median_value_by_type


def q_user_event_entropy(sf_dir: str):
    """Per-user event-type entropy (behavioral diversity score) via the
    merge-friendly identity H = ln(n) − Σc·ln(c)/n: one pair-count
    groupby collapses raw events to (user, type) counts, a second
    grouped sum folds count and c·ln(c) partials per user — entropy
    itself is computed vectorized on the user-sized stream, so no
    per-user probability vector ever materializes."""
    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])
    cnt = grouped_sum(ev, ["user_id", "event_type"], {}, count_out="c")

    def contrib(b: pa.Table) -> pa.Table:
        c = b.column("c").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {"user_id": b.column("user_id"), "c": b.column("c"), "s": pa.array(c * np.log(c))}
        )

    agg = grouped_sum(cnt.map_batches(contrib, batch_format="pyarrow"), ["user_id"], {"c": "n", "s": "s"})

    def ent(b: pa.Table) -> pa.Table:
        n = b.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        s = b.column("s").to_numpy(zero_copy_only=False)
        return pa.table({"user_id": b.column("user_id"), "entropy": pa.array(np.log(n) - s / n)})

    return agg.map_batches(ent, batch_format="pyarrow")


ORACLE_SQL["user_event_entropy"] = (
    "WITH c AS (SELECT user_id, event_type, count(*) AS c FROM events GROUP BY 1, 2) "
    "SELECT user_id, ln(sum(c)) - sum(c * ln(c)) / sum(c) AS entropy FROM c GROUP BY user_id"
)
QUERIES["user_event_entropy"] = q_user_event_entropy


def q_forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape (flat filtered global sum): the shipdate range is
    PUSHED INTO the parquet scan (row-group statistics skip whole groups
    before any bytes decode — at 100 TB the date predicate is the
    difference between scanning a year and scanning the decade), the
    remaining predicates apply per batch, integer-cent partials, ONE
    scalar crosses the cluster.  (Q1's grouped twin is q_pricing_summary.)"""
    from datetime import datetime

    import pyarrow.dataset as pads

    lo, hi = datetime(1996, 1, 1), datetime(1997, 1, 1)
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
        filter=(pads.field("l_shipdate") >= lo) & (pads.field("l_shipdate") < hi),
    )

    def p(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.and_(
                    pc.greater_equal(b.column("l_shipdate"), pa.scalar(lo)),
                    pc.less(b.column("l_shipdate"), pa.scalar(hi)),
                ),
                pc.and_(
                    pc.greater_equal(b.column("l_discount"), pa.scalar(0.05)),
                    pc.less_equal(b.column("l_discount"), pa.scalar(0.07)),
                ),
            ),
            pc.less(b.column("l_quantity"), pa.scalar(24.0)),
        )
        kept = b.filter(m)
        kept = kept.append_column(
            "rev", pc.multiply(kept.column("l_extendedprice"), kept.column("l_discount"))
        )
        s = pc.sum(_cents(kept, "rev", "rev_cents").column("rev_cents"))
        return pa.table({"rev_p": pa.array([s.as_py() if s.is_valid else 0], pa.int64())})

    total = li.map_batches(p, batch_format="pyarrow").sum("rev_p")
    return pa.table({"revenue_cents": pa.array([int(total)], pa.int64())})


ORACLE_SQL["forecast_revenue"] = (
    "SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_cents "
    "FROM lineitem WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01' "
    "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
)
QUERIES["forecast_revenue"] = q_forecast_revenue


def q_top_customers_per_nation(sf_dir: str, k: int = 3):
    """Ranked top-k rows per partition key (the window-function
    row_number() ≤ k shape) WITHOUT a global or per-group sort: the
    shared per-block top-k combiner (sampling.block_group_topk) prunes
    every block to ≤ k rows per nation before the shuffle, and the final
    per-nation selection ranks ≤ k·blocks rows.  Balance ties break on
    c_custkey, making the rank total and reproducible."""
    import pandas as pd

    from .sampling import block_group_topk

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def prune(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        codes = b.column("c_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
        bal = b.column("c_acctbal").to_numpy(zero_copy_only=False).astype(np.float64)
        keys = b.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        return b.take(pa.array(block_group_topk(codes, (keys, -bal), k)))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        bal = g["c_acctbal"].to_numpy().astype(np.float64)
        keys = g["c_custkey"].to_numpy().astype(np.int64)
        order = np.lexsort((keys, -bal))[:k]
        out = g.iloc[order].copy()
        out["rnk"] = np.arange(1, len(out) + 1, dtype=np.int64)
        return out[["c_nationkey", "c_custkey", "c_acctbal", "rnk"]]

    out = cust.map_batches(prune, batch_format="pyarrow").groupby("c_nationkey").map_groups(
        final, batch_format="pandas"
    )

    def widen(b: pa.Table) -> pa.Table:
        return b.set_column(
            b.column_names.index("c_nationkey"), "c_nationkey", b.column("c_nationkey").cast(pa.int64())
        )

    return out.map_batches(widen, batch_format="pyarrow")


ORACLE_SQL["top_customers_per_nation"] = (
    "WITH r AS (SELECT c_nationkey, c_custkey, c_acctbal, row_number() OVER ("
    "PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rnk FROM customer) "
    "SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_custkey, c_acctbal, CAST(rnk AS BIGINT) AS rnk "
    "FROM r WHERE rnk <= 3"
)
QUERIES["top_customers_per_nation"] = q_top_customers_per_nation


def q_winsorized_value_moments(sf_dir: str):
    """Outlier-robust statistics via winsorization: values clipped to
    their type's exact [p05, p95] (quantile_disc elements, so the clip
    compares identical float64 bit patterns on both engines) before the
    integer-cents sum — the curation pattern for heavy-tailed quality
    scores where a trim would bias counts.  Thresholds come from the
    histogram-narrowing quantile (two ranks, two runs, no group ever
    sorted) and broadcast back for one streaming clipped-sum pass."""
    from ..functions.quantiles import grouped_quantile_disc

    ev = _read(sf_dir, "events", columns=["event_type", "value"])
    lo_t = grouped_quantile_disc(ev, "event_type", "value", 1, 20, out="p05")
    hi_t = grouped_quantile_disc(ev, "event_type", "value", 19, 20, out="p95")
    lo_map = dict(zip(lo_t.column("event_type").to_pylist(), lo_t.column("p05").to_pylist()))
    hi_map = dict(zip(hi_t.column("event_type").to_pylist(), hi_t.column("p95").to_pylist()))
    names = np.array(sorted(lo_map))
    lo_cut = np.array([lo_map[k] for k in names])
    hi_cut = np.array([hi_map[k] for k in names])

    def clip(b: pa.Table) -> pa.Table:
        keys = b.column("event_type").to_numpy(zero_copy_only=False)
        vals = b.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        idx = np.minimum(np.searchsorted(names, keys), len(names) - 1)
        known = names[idx] == keys  # all-null-value types have no threshold → drop (SQL join)
        # null values arrive as NaN from numpy: restore them to Arrow nulls
        # (clip propagates NaN; a NaN→int64 cast would raise, and SQL's
        # count(value)/sum skip nulls)
        w = np.clip(vals[known], lo_cut[idx[known]], hi_cut[idx[known]])
        t = pa.table(
            {"event_type": pa.array(keys[known]), "w": pa.array(w, pa.float64(), from_pandas=True)}
        )
        t = _cents(t, "w", "w_cents")
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "one": pc.is_valid(t.column("w_cents")).cast(pa.int64()),
                "w_cents": t.column("w_cents"),
            }
        )

    out = grouped_sum(
        ev.map_batches(clip, batch_format="pyarrow"), ["event_type"], {"one": "n", "w_cents": "wsum_cents"}
    )
    return _select(out, ["event_type", "n", "wsum_cents"])


ORACLE_SQL["winsorized_value_moments"] = (
    "WITH th AS (SELECT event_type, quantile_disc(value, 0.05) AS p05, "
    "quantile_disc(value, 0.95) AS p95 FROM events GROUP BY event_type) "
    "SELECT e.event_type, CAST(count(e.value) AS BIGINT) AS n, "
    "CAST(sum(CAST(round(least(greatest(e.value, t.p05), t.p95) * 100) AS BIGINT)) AS BIGINT) AS wsum_cents "
    "FROM events e JOIN th t USING (event_type) GROUP BY e.event_type"
)
QUERIES["winsorized_value_moments"] = q_winsorized_value_moments


def grouped_max(ds, key: str, col: str, out: str, cast_int: bool = True):
    """Grouped MAX with per-batch partials — the mergeable mirror of
    ``grouped_min`` used by existence tests of the form
    EXISTS(x > threshold) ⟺ max(x) > threshold."""

    def p(b: pa.Table) -> pa.Table:
        v = b.column(col)
        if cast_int:
            v = v.cast(pa.int64())
        g = pa.TableGroupBy(pa.table({key: b.column(key), "v": v}), [key]).aggregate([("v", "max")])
        return pa.table({key: g.column(key), "v_p": g.column("v_max")})

    agg = ds.map_batches(p, batch_format="pyarrow").groupby(key).aggregate(Max("v_p"))
    return _rename(agg, {"max(v_p)": out})


def q_order_priority_late(sf_dir: str):
    """TPC-H Q4 shape (ref sql/stats.sql priority rollups): orders with at
    least one lineitem shipped AFTER the order date, counted per priority.
    The correlated EXISTS(l_shipdate > o_orderdate) is rewritten as a
    mergeable grouped MAX — each block reduces lineitem to ≤1 row per
    order key before the shuffle, the order-sized max table joins orders
    through the size-aware front door, and only the 5-row priority count
    ever reaches the driver."""
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    maxship = grouped_max(li, "l_orderkey", "l_shipdate", "max_ship_us")
    maxship = _rename(maxship, {"l_orderkey": "o_orderkey"}).materialize()
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    j = join(orders, maxship, on="o_orderkey", how="inner")

    def late(b: pa.Table) -> pa.Table:
        keep = pc.greater(b.column("max_ship_us"), b.column("o_orderdate").cast(pa.int64()))
        return pa.table({"o_orderpriority": b.filter(keep).column("o_orderpriority")})

    out = grouped_sum(j.map_batches(late, batch_format="pyarrow"), ["o_orderpriority"], {}, count_out="order_count")
    return _select(out, ["o_orderpriority", "order_count"])


ORACLE_SQL["order_priority_late"] = (
    "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count FROM orders "
    "WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate) "
    "GROUP BY o_orderpriority"
)
QUERIES["order_priority_late"] = q_order_priority_late


def q_returnflag_priority(sf_dir: str):
    """TPC-H Q12 shape: lineitems in a ship-year, split per return flag
    into high-priority (1-URGENT/2-HIGH) vs low-priority order counts.
    The order-priority dim is projected to (key, is_high:int64) before the
    join — the only wide step is the front-door join keyed on order key;
    the conditional CASE aggregation is two partial-aggregated sums."""
    import datetime as dt

    lo, hi = dt.datetime(1998, 1, 1), dt.datetime(1999, 1, 1)
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])

    def prio(b: pa.Table) -> pa.Table:
        is_high = pc.is_in(b.column("o_orderpriority"), value_set=pa.array(["1-URGENT", "2-HIGH"])).cast(pa.int64())
        return pa.table({"l_orderkey": b.column("o_orderkey").cast(pa.int64()), "is_high": is_high})

    dim = orders.map_batches(prio, batch_format="pyarrow").materialize()
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag", "l_shipdate"])

    def prep(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(b.column("l_shipdate"), pa.scalar(lo)),
            pc.less(b.column("l_shipdate"), pa.scalar(hi)),
        )
        b = b.filter(m)
        return pa.table(
            {"l_orderkey": b.column("l_orderkey").cast(pa.int64()), "l_returnflag": b.column("l_returnflag")}
        )

    j = join(li.map_batches(prep, batch_format="pyarrow"), dim, on="l_orderkey", how="inner")

    def split(b: pa.Table) -> pa.Table:
        ih = b.column("is_high")
        return pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "high": ih,
                "low": pc.subtract(pa.scalar(1, pa.int64()), ih),
            }
        )

    out = grouped_sum(
        j.map_batches(split, batch_format="pyarrow"),
        ["l_returnflag"],
        {"high": "high_line_count", "low": "low_line_count"},
    )
    return _select(out, ["l_returnflag", "high_line_count", "low_line_count"])


ORACLE_SQL["returnflag_priority"] = (
    "SELECT l_returnflag, "
    "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
    "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count "
    "FROM orders, lineitem WHERE o_orderkey = l_orderkey "
    "AND l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1999-01-01' "
    "GROUP BY l_returnflag"
)
QUERIES["returnflag_priority"] = q_returnflag_priority


def q_promo_revenue_monthly(sf_dir: str):
    """TPC-H Q14 shape: per ship-month, PROMO-part revenue vs total
    revenue.  The part dim shrinks to (key, is_promo:int64) and rides the
    broadcast path of the front door; numerator/denominator are emitted as
    raw integer-cents sums (never a float percentage) so the value hash is
    bit-exact against SQL."""
    part = _read(sf_dir, "part", columns=["p_partkey", "p_type"])

    def dim(b: pa.Table) -> pa.Table:
        promo = pc.equal(b.column("p_type"), "PROMO").cast(pa.int64())
        return pa.table({"l_partkey": b.column("p_partkey").cast(pa.int64()), "is_promo": promo})

    dim_ds = part.map_batches(dim, batch_format="pyarrow").materialize()
    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def prep(b: pa.Table) -> pa.Table:
        mo = pc.floor_temporal(b.column("l_shipdate"), unit="month").cast(pa.timestamp("us"))
        rev = pc.round(
            pc.multiply(
                pc.multiply(b.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), b.column("l_discount"))),
                pa.scalar(100.0),
            ),
            round_mode="half_towards_infinity",
        ).cast(pa.int64())
        return pa.table({"l_partkey": b.column("l_partkey").cast(pa.int64()), "mo": mo, "rev": rev})

    j = join(li.map_batches(prep, batch_format="pyarrow"), dim_ds, on="l_partkey", how="inner")

    def split(b: pa.Table) -> pa.Table:
        rev = b.column("rev")
        return pa.table({"mo": b.column("mo"), "promo": pc.multiply(rev, b.column("is_promo")), "total": rev})

    out = grouped_sum(
        j.map_batches(split, batch_format="pyarrow"), ["mo"], {"promo": "promo_cents", "total": "total_cents"}
    )
    return _select(out, ["mo", "promo_cents", "total_cents"])


ORACLE_SQL["promo_revenue_monthly"] = (
    "SELECT date_trunc('month', l_shipdate) AS mo, "
    "CAST(sum(CASE WHEN p_type = 'PROMO' THEN CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS promo_cents, "
    "CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS total_cents "
    "FROM lineitem, part WHERE l_partkey = p_partkey GROUP BY 1"
)
QUERIES["promo_revenue_monthly"] = q_promo_revenue_monthly


def q_part_supplier_variety(sf_dir: str):
    """TPC-H Q16 shape: distinct supplier count per (brand, size), with a
    supplier denylist anti-joined out.  Scale plan: (1) lineitem reduces
    to distinct (part, supplier) pairs via a partial-aggregated pair
    groupby — raw lineitems never shuffle; (2) the tiny denylist anti-join
    and the part dim join both ride the front door; (3) count(DISTINCT)
    is the exact two-groupby pattern (triple-dedup, then count)."""
    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    pairs = grouped_sum(li, ["l_partkey", "l_suppkey"], {}, count_out="n")
    pairs = pairs.map_batches(lambda b: b.select(["l_partkey", "l_suppkey"]), batch_format="pyarrow").materialize()

    supp = _read(sf_dir, "supplier", columns=["s_suppkey"])

    def denylist(b: pa.Table) -> pa.Table:
        k = b.column("s_suppkey").cast(pa.int64())
        # k % 3 == 0 via truncated integer divide (pyarrow has no mod kernel)
        mod = pc.subtract(k, pc.multiply(pc.divide(k, pa.scalar(3, pa.int64())), pa.scalar(3, pa.int64())))
        return pa.table({"l_suppkey": k.filter(pc.equal(mod, pa.scalar(0, pa.int64())))})

    bad = supp.map_batches(denylist, batch_format="pyarrow").materialize()
    pairs = join(pairs, bad, on="l_suppkey", how="anti").materialize()

    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"])
    pdim = part.map_batches(
        lambda b: pa.table(
            {
                "l_partkey": b.column("p_partkey").cast(pa.int64()),
                "p_brand": b.column("p_brand"),
                "p_size": b.column("p_size"),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    trip = join(pairs, pdim, on="l_partkey", how="inner")
    # distinct (brand, size, supplier) triples, then the tiny count groupby
    trip = grouped_sum(trip, ["p_brand", "p_size", "l_suppkey"], {}, count_out="m")
    out = grouped_sum(trip, ["p_brand", "p_size"], {}, count_out="supplier_cnt")

    def fix(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_brand": b.column("p_brand"),
                "p_size": b.column("p_size").cast(pa.int32()),
                "supplier_cnt": b.column("supplier_cnt"),
            }
        )

    return out.map_batches(fix, batch_format="pyarrow")


ORACLE_SQL["part_supplier_variety"] = (
    "SELECT p_brand, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt "
    "FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) li JOIN part ON l_partkey = p_partkey "
    "WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey % 3 = 0) "
    "GROUP BY p_brand, p_size"
)
QUERIES["part_supplier_variety"] = q_part_supplier_variety


def q_pps_sample_docs(sf_dir: str, k: int = 10, bucket: int = 4096):
    """Deterministic probability-proportional-to-size (systematic) sample:
    k docs per lang, selected where the doc-id-ordered cumulative n_chars
    crosses an equally-spaced weight threshold — ALL-INTEGER arithmetic,
    so the selected row set matches SQL window functions bit-exactly (no
    float ranking boundary, unlike u^(1/w) reservoir keys).

    Scale shape: the ordered per-lang running sum is split by contiguous
    doc-id buckets — pass 1 is a partial-aggregated (lang, bucket) sum
    whose exclusive prefix (bucket-table-sized, NOT doc-sized) is computed
    on the driver and broadcast via ray.put; pass 2 is a bounded-size
    groupby(lang, bucket).map_groups that adds its bucket's offset and
    applies the threshold-crossing predicate locally.  Raw docs shuffle
    exactly once (the bucket groupby)."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])

    def pre(b: pa.Table) -> pa.Table:
        bkt = pc.divide(b.column("doc_id"), pa.scalar(bucket, pa.int64()))
        return pa.table(
            {"lang": b.column("lang"), "bkt": bkt, "doc_id": b.column("doc_id"), "n_chars": b.column("n_chars")}
        )

    pre_ds = docs.map_batches(pre, batch_format="pyarrow").materialize()

    bsums = grouped_sum(pre_ds, ["lang", "bkt"], {"n_chars": "bsum"}).to_pandas()
    bsums = bsums.sort_values(["lang", "bkt"]).reset_index(drop=True)
    bsums["offset"] = bsums.groupby("lang")["bsum"].cumsum() - bsums["bsum"]
    offsets = {(r.lang, r.bkt): int(r.offset) for r in bsums.itertuples()}
    totals = bsums.groupby("lang")["bsum"].sum().astype("int64").to_dict()
    state_ref = ray.put((offsets, totals))

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        offs, tots = ray.get(state_ref)
        g = g.sort_values("doc_id")
        lang, bkt = g["lang"].iat[0], int(g["bkt"].iat[0])
        w = g["n_chars"].to_numpy(dtype=np.int64)
        cum = offs[(lang, bkt)] + np.cumsum(w)
        total = tots[lang]
        sel = (cum * k) // total > ((cum - w) * k) // total
        g = g.loc[sel]
        return pd.DataFrame(
            {"doc_id": g["doc_id"].to_numpy(), "lang": g["lang"].to_numpy(), "n_chars": g["n_chars"].to_numpy()}
        )

    return pre_ds.groupby(["lang", "bkt"]).map_groups(pick, batch_format="pandas")


ORACLE_SQL["pps_sample_docs"] = (
    "WITH w AS (SELECT doc_id, lang, n_chars, "
    "sum(n_chars) OVER (PARTITION BY lang ORDER BY doc_id) AS cum, "
    "sum(n_chars) OVER (PARTITION BY lang) AS total FROM documents) "
    "SELECT doc_id, lang, n_chars FROM w WHERE (cum*10)//total > ((cum-n_chars)*10)//total"
)
QUERIES["pps_sample_docs"] = q_pps_sample_docs


def q_orders_range30(sf_dir: str):
    """Trailing-30-day RANGE-frame window over daily order revenue — the
    gap-aware calendar twin of the ROWS-frame q_revenue_7d_moving: days
    with no neighbors within 30 days contribute only themselves.  The wide
    step is the partial-aggregated daily rollup; the window runs over the
    tiny day table with a searchsorted lower bound."""
    orders = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        d = pc.floor_temporal(b.column("o_orderdate"), unit="day").cast(pa.timestamp("us"))
        b = pa.table({"d": d, "o_totalprice": b.column("o_totalprice")})
        return _cents(b, "o_totalprice", "vc").drop_columns(["o_totalprice"])

    daily = grouped_sum(orders.map_batches(prep, batch_format="pyarrow"), ["d"], {"vc": "day_cents"})
    df = daily.to_pandas().sort_values("d").reset_index(drop=True)
    day_us = df["d"].to_numpy().astype("datetime64[us]").astype(np.int64)
    vals = df["day_cents"].to_numpy(dtype=np.int64)
    csum = np.concatenate([[0], np.cumsum(vals)])
    lo = np.searchsorted(day_us, day_us - 29 * 86_400_000_000, side="left")
    win = csum[1 : len(vals) + 1] - csum[lo]
    return pa.table(
        {
            "d": pa.array(df["d"]).cast(pa.timestamp("us")),
            "day_cents": pa.array(vals, pa.int64()),
            "mov30_cents": pa.array(win, pa.int64()),
        }
    )


ORACLE_SQL["orders_range30"] = (
    "WITH daily AS (SELECT date_trunc('day', o_orderdate) AS d, "
    "CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS day_cents FROM orders GROUP BY 1) "
    "SELECT d, day_cents, CAST(sum(day_cents) OVER (ORDER BY d "
    "RANGE BETWEEN INTERVAL 29 DAYS PRECEDING AND CURRENT ROW) AS BIGINT) AS mov30_cents FROM daily"
)
QUERIES["orders_range30"] = q_orders_range30


def q_purchases_near_errors(sf_dir: str, window_hours: int = 1):
    """Two-stream BAND join: every (purchase, error) event pair from the
    same user within ±1 hour — the symmetric time-proximity correlation
    (attribution windows, label joining around an anchor event) that
    neither an equi-join nor an as-of join expresses, and that
    range_window_pairs (ordered SELF pairs, one stream) doesn't either.
    One key-hash shuffle of both filtered streams; the per-bucket kernel
    sorts the error side once and answers each purchase probe with two
    searchsorteds (stages/joins.band_join_ids)."""
    from ..stages.joins import band_join_ids

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])

    def pick(kind: str):
        def f(b: pa.Table) -> pa.Table:
            t = b.filter(pc.equal(b.column("event_type"), kind))
            return pa.table(
                {"event_id": t.column("event_id"), "user_id": t.column("user_id"), "ts": t.column("ts")}
            )

        return f

    purchases = ev.map_batches(pick("purchase"), batch_format="pyarrow")
    errors = ev.map_batches(pick("error"), batch_format="pyarrow")
    out = band_join_ids(
        purchases,
        errors,
        by_left="user_id",
        by_right="user_id",
        on_left="ts",
        on_right="ts",
        window=window_hours * 3_600_000_000,
        left_id="event_id",
        right_id="event_id",
    )
    return _rename(out, {"event_id": "purchase_id", "event_id_r": "error_id"})


ORACLE_SQL["purchases_near_errors"] = (
    "SELECT p.event_id AS purchase_id, e.event_id AS error_id FROM events p, events e "
    "WHERE p.event_type = 'purchase' AND e.event_type = 'error' AND p.user_id = e.user_id "
    "AND e.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts + INTERVAL 1 HOUR"
)
QUERIES["purchases_near_errors"] = q_purchases_near_errors


def q_min_cost_supplier(sf_dir: str):
    """TPC-H Q2 shape (argmin join): for every part, the supplier(s)
    offering its minimum line price.  The per-part float MIN is a
    mergeable partial aggregate (block-level TableGroupBy min, then the
    part-sized shuffle); the argmin itself is an equality join back
    against the fact stream — the min is a data element copied bit-exact,
    so the float == filter matches SQL exactly.  Ties all survive
    (deterministic SET, no ranking boundary).  Price emitted as integer
    cents for the value hash."""
    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_extendedprice"])

    def p(b: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table({"l_partkey": b.column("l_partkey"), "v": b.column("l_extendedprice")}), ["l_partkey"]
        ).aggregate([("v", "min")])
        return pa.table({"l_partkey": g.column("l_partkey"), "v_p": g.column("v_min")})

    mins = li.map_batches(p, batch_format="pyarrow").groupby("l_partkey").aggregate(Min("v_p"))
    mins = _rename(mins, {"min(v_p)": "min_price"}).materialize()
    j = join(li, mins, on="l_partkey", how="inner")

    def argmin(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("l_extendedprice"), b.column("min_price")))
        b = _cents(b, "min_price", "min_price_cents")
        return pa.table(
            {
                "l_partkey": b.column("l_partkey").cast(pa.int64()),
                "l_suppkey": b.column("l_suppkey").cast(pa.int64()),
                "min_price_cents": b.column("min_price_cents"),
            }
        )

    # a tying supplier may appear on several lines of the same part —
    # dedup the (part, supplier) pairs like SQL's DISTINCT
    out = grouped_sum(
        j.map_batches(argmin, batch_format="pyarrow"),
        ["l_partkey", "l_suppkey", "min_price_cents"],
        {},
        count_out="n",
    )
    return _select(out, ["l_partkey", "l_suppkey", "min_price_cents"])


ORACLE_SQL["min_cost_supplier"] = (
    "WITH m AS (SELECT l_partkey, min(l_extendedprice) AS mp FROM lineitem GROUP BY 1) "
    "SELECT DISTINCT CAST(l.l_partkey AS BIGINT) AS l_partkey, CAST(l.l_suppkey AS BIGINT) AS l_suppkey, "
    "CAST(round(m.mp*100) AS BIGINT) AS min_price_cents "
    "FROM lineitem l JOIN m ON l.l_partkey = m.l_partkey AND l.l_extendedprice = m.mp"
)
QUERIES["min_cost_supplier"] = q_min_cost_supplier


def q_value_hour_moments(sf_dir: str):
    """Bivariate CROSS moments per event type: n / Σx / Σy / Σxy over
    (value-cents, hour-of-day) — the mergeable building block of
    covariance/correlation (cov = (n·Σxy − Σx·Σy)/n²), emitted as raw
    BIGINTs so the hash is bit-exact (a float corr would diverge from
    DuckDB in the last ulp).  Same partial-aggregated shape as the
    univariate q_value_moments_by_type."""
    ev = _read(sf_dir, "events", columns=["event_type", "value", "ts"])

    def p(b: pa.Table) -> pa.Table:
        cents = _cents(b, "value", "vc").column("vc")
        hour = pc.hour(b.column("ts")).cast(pa.int64())
        valid = pc.is_valid(cents)
        return pa.table(
            {
                "event_type": b.column("event_type"),
                "one": valid.cast(pa.int64()),
                "x": pc.if_else(valid, cents, pa.scalar(0, pa.int64())),
                "y": pc.if_else(valid, hour, pa.scalar(0, pa.int64())),
                "xy": pc.if_else(valid, pc.multiply(cents, hour), pa.scalar(0, pa.int64())),
            }
        )

    out = grouped_sum(
        ev.map_batches(p, batch_format="pyarrow"),
        ["event_type"],
        {"one": "n", "x": "sum_x", "y": "sum_y", "xy": "sum_xy"},
    )
    return _select(out, ["event_type", "n", "sum_x", "sum_y", "sum_xy"])


ORACLE_SQL["value_hour_moments"] = (
    "SELECT event_type, CAST(count(value) AS BIGINT) AS n, "
    "CAST(sum(CASE WHEN value IS NULL THEN 0 ELSE CAST(round(value*100) AS BIGINT) END) AS BIGINT) AS sum_x, "
    "CAST(sum(CASE WHEN value IS NULL THEN 0 ELSE CAST(hour(ts) AS BIGINT) END) AS BIGINT) AS sum_y, "
    "CAST(sum(CASE WHEN value IS NULL THEN 0 ELSE CAST(round(value*100) AS BIGINT) * CAST(hour(ts) AS BIGINT) END) AS BIGINT) AS sum_xy "
    "FROM events GROUP BY event_type"
)
QUERIES["value_hour_moments"] = q_value_hour_moments


def _rev_cents(b: pa.Table) -> pa.Array:
    """Per-line discounted revenue as integer cents (the round-per-line
    discipline shared by every revenue query)."""
    return pc.round(
        pc.multiply(
            pc.multiply(b.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), b.column("l_discount"))),
            pa.scalar(100.0),
        ),
        round_mode="half_towards_infinity",
    ).cast(pa.int64())


def q_small_qty_loss(sf_dir: str):
    """TPC-H Q17 shape (correlated avg subquery): revenue locked up in
    lines whose quantity is below 20% of their part's average.  The
    fractional avg comparison is cross-multiplied into exact integers
    (qty·5·n < Σqty — no float boundary can flip a row), the per-part
    (n, Σqty) stats are a mergeable grouped_sum broadcast back through
    the join front door, and the brand dim joins AFTER the selective
    quantity filter so only qualifying lines carry it."""
    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def units(b: pa.Table) -> pa.Table:
        b = _cents(b, "l_quantity", "qty_units")
        return pa.table(
            {
                "l_partkey": b.column("l_partkey").cast(pa.int64()),
                "qty_units": b.column("qty_units"),
                "l_extendedprice": b.column("l_extendedprice"),
            }
        )

    liu = li.map_batches(units, batch_format="pyarrow")
    stats = grouped_sum(liu.drop_columns(["l_extendedprice"]), ["l_partkey"], {"qty_units": "sum_units"}, count_out="n")
    stats = stats.materialize()  # part-sized dim: let the front door size it
    j = join(liu, stats, on="l_partkey", how="inner")

    def low(b: pa.Table) -> pa.Table:
        keep = pc.less(
            pc.multiply(pc.multiply(b.column("qty_units"), pa.scalar(5, pa.int64())), b.column("n")),
            b.column("sum_units"),
        )
        b = b.filter(keep)
        b = _cents(b, "l_extendedprice", "price_cents")
        return pa.table({"l_partkey": b.column("l_partkey"), "price_cents": b.column("price_cents")})

    lows = j.map_batches(low, batch_format="pyarrow")
    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand"])
    part = part.map_batches(
        lambda b: pa.table({"l_partkey": b.column("p_partkey").cast(pa.int64()), "p_brand": b.column("p_brand")}),
        batch_format="pyarrow",
    ).materialize()
    out = grouped_sum(join(lows, part, on="l_partkey", how="inner"), ["p_brand"], {"price_cents": "loss_cents"}, count_out="n_lines")
    return _select(out, ["p_brand", "n_lines", "loss_cents"])


ORACLE_SQL["small_qty_loss"] = (
    "WITH s AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n, "
    "CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_units FROM lineitem GROUP BY 1) "
    "SELECT p.p_brand, CAST(count(*) AS BIGINT) AS n_lines, "
    "CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)) AS BIGINT) AS loss_cents "
    "FROM lineitem l JOIN s ON l.l_partkey = s.l_partkey JOIN part p ON p.p_partkey = l.l_partkey "
    "WHERE CAST(round(l.l_quantity*100) AS BIGINT) * 5 * s.n < s.sum_units "
    "GROUP BY p.p_brand"
)
QUERIES["small_qty_loss"] = q_small_qty_loss


def q_large_orders(sf_dir: str):
    """TPC-H Q18 shape (HAVING over a fact groupby, then dims): orders
    whose total quantity exceeds 200 units, decorated with customer and
    order dims, top-100 by price.  The only wide step is the order-keyed
    grouped_sum; the surviving key set is HAVING-selective so it rides
    the join front door as a broadcast dim; quantities stay integer
    centi-units end to end."""
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def units(b: pa.Table) -> pa.Table:
        b = _cents(b, "l_quantity", "qty_units")
        return pa.table({"l_orderkey": b.column("l_orderkey").cast(pa.int64()), "qty_units": b.column("qty_units")})

    per_order = grouped_sum(li.map_batches(units, batch_format="pyarrow"), ["l_orderkey"], {"qty_units": "total_units"})
    big = per_order.map_batches(
        lambda b: b.filter(pc.greater(b.column("total_units"), pa.scalar(20_000, pa.int64()))),
        batch_format="pyarrow",
    ).materialize()

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"])

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "o_totalprice", "price_cents")
        return pa.table(
            {
                "l_orderkey": b.column("o_orderkey").cast(pa.int64()),
                "o_custkey": b.column("o_custkey").cast(pa.int64()),
                "o_orderdate": b.column("o_orderdate"),
                "price_cents": b.column("price_cents"),
            }
        )

    j = join(orders.map_batches(prep, batch_format="pyarrow"), big, on="l_orderkey", how="inner")
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    cust = cust.map_batches(
        lambda b: pa.table({"o_custkey": b.column("c_custkey").cast(pa.int64()), "c_name": b.column("c_name")}),
        batch_format="pyarrow",
    ).materialize()
    j = join(j, cust, on="o_custkey", how="inner")
    out = j.sort(["price_cents", "l_orderkey"], descending=[True, False]).limit(100)
    return _select(out, ["c_name", "o_custkey", "l_orderkey", "o_orderdate", "price_cents", "total_units"])


ORACLE_SQL["large_orders"] = (
    "WITH big AS (SELECT l_orderkey, CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS total_units "
    "FROM lineitem GROUP BY 1 HAVING total_units > 20000) "
    "SELECT c.c_name, CAST(o.o_custkey AS BIGINT) AS o_custkey, CAST(o.o_orderkey AS BIGINT) AS l_orderkey, "
    "o.o_orderdate, CAST(round(o.o_totalprice*100) AS BIGINT) AS price_cents, big.total_units "
    "FROM orders o JOIN big ON o.o_orderkey = big.l_orderkey JOIN customer c ON c.c_custkey = o.o_custkey "
    "ORDER BY price_cents DESC, l_orderkey LIMIT 100"
)
QUERIES["large_orders"] = q_large_orders


def q_rich_dormant_by_nation(sf_dir: str):
    """TPC-H Q22 shape (scalar-subquery threshold + NOT EXISTS): customers
    whose balance beats the average positive balance AND who made no
    purchase (every testdata customer has orders, so the NOT EXISTS
    runs against purchase events), rolled up by nation.  The global avg
    is a two-number partial aggregate (Σ, n) broadcast as an exact
    integer cross-multiply (bal·n > Σ — no float avg crosses the wire);
    the NOT EXISTS is an anti-join against the distinct purchaser key
    set through the front door."""
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def bal(b: pa.Table) -> pa.Table:
        b = _cents(b, "c_acctbal", "bal_cents")
        return pa.table(
            {
                "c_custkey": b.column("c_custkey").cast(pa.int64()),
                "c_nationkey": b.column("c_nationkey").cast(pa.int64()),
                "bal_cents": b.column("bal_cents"),
            }
        )

    cb = cust.map_batches(bal, batch_format="pyarrow").materialize()

    def pos_partial(b: pa.Table) -> pa.Table:
        p = b.filter(pc.greater(b.column("bal_cents"), pa.scalar(0, pa.int64())))
        return pa.table(
            {"s": [pc.sum(p.column("bal_cents")).as_py() or 0], "n": pa.array([p.num_rows], pa.int64())}
        )

    parts = cb.map_batches(pos_partial, batch_format="pyarrow").to_pandas()
    s_total, n_total = int(parts["s"].sum()), int(parts["n"].sum())

    def rich(b: pa.Table) -> pa.Table:
        return b.filter(
            pc.greater(
                pc.multiply(b.column("bal_cents"), pa.scalar(n_total, pa.int64())),
                pa.scalar(s_total, pa.int64()),
            )
        )

    rich_ds = cb.map_batches(rich, batch_format="pyarrow")
    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])
    keys = (
        ev.map_batches(
            lambda b: pa.table(
                {
                    "c_custkey": pc.unique(
                        b.filter(pc.equal(b.column("event_type"), "purchase")).column("user_id").cast(pa.int64())
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("c_custkey")
        .count()
        .map_batches(lambda b: b.select(["c_custkey"]), batch_format="pyarrow")
        .materialize()
    )
    dormant = join(rich_ds, keys, on="c_custkey", how="anti")
    out = grouped_sum(dormant, ["c_nationkey"], {"bal_cents": "total_bal_cents"}, count_out="n_cust")
    return _select(out, ["c_nationkey", "n_cust", "total_bal_cents"])


ORACLE_SQL["rich_dormant_by_nation"] = (
    "WITH cb AS (SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey, "
    "CAST(round(c_acctbal*100) AS BIGINT) AS bal_cents FROM customer), "
    "t AS (SELECT CAST(sum(bal_cents) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n FROM cb WHERE bal_cents > 0) "
    "SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_cust, CAST(sum(bal_cents) AS BIGINT) AS total_bal_cents "
    "FROM cb, t WHERE bal_cents * t.n > t.s "
    "AND NOT EXISTS (SELECT 1 FROM events e WHERE e.event_type = 'purchase' AND e.user_id = cb.c_custkey) "
    "GROUP BY c_nationkey"
)
QUERIES["rich_dormant_by_nation"] = q_rich_dormant_by_nation


def q_top_supplier(sf_dir: str):
    """TPC-H Q15 shape (argmax over an aggregate): the supplier(s) with
    the maximum quarterly revenue.  Revenue is a supplier-keyed
    grouped_sum in exact cents; the global max is a one-row aggregate;
    ties survive via the integer equality filter (no ranking boundary);
    the name dim joins only the winner rows."""
    import datetime as dt

    lo, hi = dt.datetime(1997, 1, 1), dt.datetime(1997, 4, 1)
    li = _read(sf_dir, "lineitem", columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def prep(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(b.column("l_shipdate"), pa.scalar(lo)), pc.less(b.column("l_shipdate"), pa.scalar(hi))
        )
        b = b.filter(m)
        return pa.table({"s_suppkey": b.column("l_suppkey").cast(pa.int64()), "rev_cents": _rev_cents(b)})

    rev = grouped_sum(li.map_batches(prep, batch_format="pyarrow"), ["s_suppkey"], {"rev_cents": "total_revenue_cents"})
    rev = rev.materialize()
    mx = rev.max("total_revenue_cents")
    winners = rev.map_batches(
        lambda b: b.filter(pc.equal(b.column("total_revenue_cents"), pa.scalar(mx, pa.int64()))),
        batch_format="pyarrow",
    )
    sup = _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    sup = sup.map_batches(
        lambda b: pa.table({"s_suppkey": b.column("s_suppkey").cast(pa.int64()), "s_name": b.column("s_name")}),
        batch_format="pyarrow",
    ).materialize()
    out = join(winners, sup, on="s_suppkey", how="inner")
    return _select(out, ["s_suppkey", "s_name", "total_revenue_cents"])


ORACLE_SQL["top_supplier"] = (
    "WITH rev AS (SELECT CAST(l_suppkey AS BIGINT) AS s_suppkey, "
    "CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS total_revenue_cents "
    "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01' GROUP BY 1) "
    "SELECT r.s_suppkey, s.s_name, r.total_revenue_cents FROM rev r JOIN supplier s ON s.s_suppkey = r.s_suppkey "
    "WHERE r.total_revenue_cents = (SELECT max(total_revenue_cents) FROM rev)"
)
QUERIES["top_supplier"] = q_top_supplier


def q_customer_balance_windows(sf_dir: str, k: int = 4, bucket_cents: int = 100_000):
    """Ranking-window family in one pass: ntile(k), percent_rank and
    cume_dist per nation over balance cents — via the TWO-LEVEL SCAN, not
    a whole-partition map_groups (a nation is corpus/25 at 10^10 rows; no
    task may hold one).  Rows bucket by VALUE RANGE (bal_cents //
    bucket_cents — a prefix of the sort order, and ties can never span a
    bucket), per-(nation, bucket) counts roll up small, the driver
    broadcasts exclusive offsets + nation totals, and each bounded bucket
    group computes its rows' global positions locally:

    - ntile(k) = SQL remainder rule on the global position;
    - percent_rank = (global first-occurrence rank − 1)/(n − 1) — the
      first occurrence is bucket-local because ties stay in-bucket;
    - cume_dist = global right-edge / n.
    All divisions are exact small-integer / small-integer, bit-identical
    to DuckDB's."""
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "c_acctbal", "bal_cents")
        bkt = np.floor_divide(
            b.column("bal_cents").to_numpy(zero_copy_only=False), bucket_cents
        )
        return pa.table(
            {
                "c_custkey": b.column("c_custkey").cast(pa.int64()),
                "c_nationkey": b.column("c_nationkey").cast(pa.int64()),
                "bal_cents": b.column("bal_cents"),
                "bkt": pa.array(bkt, pa.int64()),
            }
        )

    pre = cust.map_batches(prep, batch_format="pyarrow").materialize()
    stats = grouped_sum(pre, ["c_nationkey", "bkt"], {}, count_out="n").to_pandas()
    stats = stats.sort_values(["c_nationkey", "bkt"]).reset_index(drop=True)
    stats["off"] = stats.groupby("c_nationkey")["n"].cumsum() - stats["n"]
    offs = {(r.c_nationkey, r.bkt): int(r.off) for r in stats.itertuples()}
    tots = stats.groupby("c_nationkey")["n"].sum().astype("int64").to_dict()
    state_ref = ray.put((offs, tots))

    def windows(g: pd.DataFrame) -> pd.DataFrame:
        offs_, tots_ = ray.get(state_ref)
        g = g.sort_values(["bal_cents", "c_custkey"])
        nation, bkt = int(g["c_nationkey"].iat[0]), int(g["bkt"].iat[0])
        base = offs_[(nation, bkt)]
        n = tots_[nation]
        vals = g["bal_cents"].to_numpy()
        pos = base + np.arange(len(g), dtype=np.int64)
        q, rem = divmod(n, k)
        tile = np.where(pos < rem * (q + 1), pos // (q + 1), rem + (pos - rem * (q + 1)) // max(q, 1)) + 1
        rank = base + np.searchsorted(vals, vals, side="left") + 1
        cume = base + np.searchsorted(vals, vals, side="right")
        pr = (rank - 1) / (n - 1) if n > 1 else np.zeros(len(g))
        return pd.DataFrame(
            {
                "c_custkey": g["c_custkey"].to_numpy(),
                "c_nationkey": g["c_nationkey"].to_numpy(),
                "bal_cents": vals,
                "quartile": tile.astype(np.int64),
                "pr": pr,
                "cd": cume / n,
            }
        )

    return pre.groupby(["c_nationkey", "bkt"]).map_groups(windows, batch_format="pandas")


ORACLE_SQL["customer_balance_windows"] = (
    "WITH cb AS (SELECT CAST(c_custkey AS BIGINT) AS c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey, "
    "CAST(round(c_acctbal*100) AS BIGINT) AS bal_cents FROM customer) "
    "SELECT c_custkey, c_nationkey, bal_cents, "
    "ntile(4) OVER (PARTITION BY c_nationkey ORDER BY bal_cents, c_custkey) AS quartile, "
    "percent_rank() OVER (PARTITION BY c_nationkey ORDER BY bal_cents) AS pr, "
    "cume_dist() OVER (PARTITION BY c_nationkey ORDER BY bal_cents) AS cd FROM cb"
)
QUERIES["customer_balance_windows"] = q_customer_balance_windows


def q_lang_list_by_source(sf_dir: str):
    """collect_list analog (SQL string_agg): the sorted distinct language
    roster per source as one comma-joined string + its cardinality.  The
    distinct (source, lang) pair set is the only wide step (pair-keyed
    groupby); the roster assembly runs on the pair-sized survivors — at
    10^10 docs the pair table is |sources|×|langs|, not |docs|."""
    docs = _read(sf_dir, "documents", columns=["source", "lang"])
    pairs = grouped_sum(docs, ["source", "lang"], {}, count_out="cnt")

    def roster(g: pd.DataFrame) -> pd.DataFrame:
        langs = sorted(g["lang"].tolist())
        return pd.DataFrame({"source": [g["source"].iat[0]], "langs": [",".join(langs)], "n_langs": [len(langs)]})

    out = pairs.groupby("source").map_groups(roster, batch_format="pandas")
    return out.map_batches(
        lambda b: pa.table(
            {"source": b.column("source"), "langs": b.column("langs"), "n_langs": b.column("n_langs").cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )


ORACLE_SQL["lang_list_by_source"] = (
    "WITH d AS (SELECT DISTINCT source, lang FROM documents) "
    "SELECT source, string_agg(lang, ',' ORDER BY lang) AS langs, CAST(count(*) AS BIGINT) AS n_langs "
    "FROM d GROUP BY source"
)
QUERIES["lang_list_by_source"] = q_lang_list_by_source


def q_event_transitions(sf_dir: str):
    """Markov transition matrix over user event streams: count of each
    (event_type → next event_type) adjacency under LEAD ordering
    (ts, event_id).  Users co-partition once; the per-user kernel is a
    sort + shift; the pair counts pre-aggregate per group before the tiny
    (|types|²)-row final rollup."""
    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        a = g["event_type"].to_numpy()
        if len(a) < 2:
            return pd.DataFrame(
                {
                    "a": pd.Series([], dtype=object),
                    "b": pd.Series([], dtype=object),
                    "n_partial": pd.Series([], dtype=np.int64),
                }
            )
        df = pd.DataFrame({"a": a[:-1], "b": a[1:]})
        out = df.groupby(["a", "b"], sort=False).size().reset_index(name="n_partial")
        out["n_partial"] = out["n_partial"].astype(np.int64)
        return out

    partials = ev.groupby("user_id").map_groups(pairs, batch_format="pandas")
    out = partials.groupby(["a", "b"]).aggregate(Sum("n_partial"))
    out = _rename(out, {"sum(n_partial)": "n"})
    return out.map_batches(
        lambda b: pa.table({"a": b.column("a"), "b": b.column("b"), "n": b.column("n").cast(pa.int64())}),
        batch_format="pyarrow",
    )


ORACLE_SQL["event_transitions"] = (
    "WITH w AS (SELECT event_type AS a, "
    "lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS b FROM events) "
    "SELECT a, b, CAST(count(*) AS BIGINT) AS n FROM w WHERE b IS NOT NULL GROUP BY a, b"
)
QUERIES["event_transitions"] = q_event_transitions


def q_returned_revenue_customers(sf_dir: str, k: int = 20):
    """TPC-H Q10 shape (returned-item ranking): revenue lost to returns
    per customer inside a quarter, top-k.  Return-flag and date filters
    apply before either join; the surviving order keys ride the front
    door; one customer-keyed grouped sum, then the k-row sort."""
    import datetime as dt

    lo, hi = dt.datetime(1997, 1, 1), dt.datetime(1997, 4, 1)
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def in_window(b: pa.Table) -> pa.Table:
        t = b.filter(
            pc.and_(
                pc.greater_equal(b.column("o_orderdate"), pa.scalar(lo)),
                pc.less(b.column("o_orderdate"), pa.scalar(hi)),
            )
        )
        return pa.table(
            {
                "l_orderkey": t.column("o_orderkey").cast(pa.int64()),
                "o_custkey": t.column("o_custkey").cast(pa.int64()),
            }
        )

    okeys = orders.map_batches(in_window, batch_format="pyarrow").materialize()
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"])

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("l_returnflag"), "R"))
        return pa.table({"l_orderkey": b.column("l_orderkey").cast(pa.int64()), "rev_cents": _rev_cents(b)})

    j = join(li.map_batches(prep, batch_format="pyarrow"), okeys, on="l_orderkey", how="inner")
    per_cust = grouped_sum(j, ["o_custkey"], {"rev_cents": "revenue_cents"})
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name", "c_nationkey"])
    cust = cust.map_batches(
        lambda b: pa.table(
            {
                "o_custkey": b.column("c_custkey").cast(pa.int64()),
                "c_name": b.column("c_name"),
                "c_nationkey": b.column("c_nationkey").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    out = join(per_cust, cust, on="o_custkey", how="inner")
    out = out.sort(["revenue_cents", "o_custkey"], descending=[True, False]).limit(k)
    return _select(out, ["o_custkey", "c_name", "c_nationkey", "revenue_cents"])


ORACLE_SQL["returned_revenue_customers"] = (
    "SELECT CAST(o.o_custkey AS BIGINT) AS o_custkey, c.c_name, CAST(c.c_nationkey AS BIGINT) AS c_nationkey, "
    "CAST(sum(CAST(round(l.l_extendedprice*(1-l.l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents "
    "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey JOIN customer c ON c.c_custkey = o.o_custkey "
    "WHERE l.l_returnflag = 'R' AND o.o_orderdate >= TIMESTAMP '1997-01-01' AND o.o_orderdate < TIMESTAMP '1997-04-01' "
    "GROUP BY o.o_custkey, c.c_name, c.c_nationkey ORDER BY revenue_cents DESC, o_custkey LIMIT 20"
)
QUERIES["returned_revenue_customers"] = q_returned_revenue_customers


def q_order_count_distribution(sf_dir: str):
    """TPC-H Q13 shape (distribution of counts): how many customers
    placed exactly N orders, INCLUDING the zero bucket.  Two tiny
    cascaded grouped counts (orders → per-customer count → per-count
    customers); the zero bucket is total-customers minus
    customers-with-orders — one scalar, no outer join of the fact
    table."""
    orders = _read(sf_dir, "orders", columns=["o_custkey"])
    per_cust = grouped_sum(orders, ["o_custkey"], {}, count_out="c_count").materialize()
    dist = grouped_sum(per_cust, ["c_count"], {}, count_out="custdist")
    n_customers = _read(sf_dir, "customer", columns=["c_custkey"]).count()
    n_with = per_cust.count()
    batches = [b.select(["c_count", "custdist"]) for b in dist.iter_batches(batch_format="pyarrow")]
    empty = pa.table({"c_count": pa.array([], pa.int64()), "custdist": pa.array([], pa.int64())})
    t = pa.concat_tables(batches) if batches else empty
    if n_customers > n_with:
        t = pa.concat_tables(
            [t, pa.table({"c_count": pa.array([0], pa.int64()), "custdist": pa.array([n_customers - n_with], pa.int64())})]
        )
    return t


ORACLE_SQL["order_count_distribution"] = (
    "SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM ("
    "SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count "
    "FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey GROUP BY c.c_custkey) "
    "GROUP BY c_count"
)
QUERIES["order_count_distribution"] = q_order_count_distribution


def q_disjunctive_revenue(sf_dir: str):
    """TPC-H Q19 shape (disjunctive multi-branch predicate): revenue from
    three OR-ed (brand, size-range, quantity-range) branches.  The
    quantity SUPERSET filter [1, 30] pushes down before the join; the
    part dim carries only (brand, size); the branch disjunction evaluates
    vectorized post-join.  One global two-number aggregate."""
    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])

    def prep(b: pa.Table) -> pa.Table:
        q = b.column("l_quantity")
        b = b.filter(pc.and_(pc.greater_equal(q, pa.scalar(1.0)), pc.less_equal(q, pa.scalar(30.0))))
        return pa.table(
            {
                "l_partkey": b.column("l_partkey").cast(pa.int64()),
                "l_quantity": b.column("l_quantity"),
                "rev_cents": _rev_cents(b),
            }
        )

    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"])
    part = part.map_batches(
        lambda b: pa.table(
            {
                "l_partkey": b.column("p_partkey").cast(pa.int64()),
                "p_brand": b.column("p_brand"),
                "p_size": b.column("p_size").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    j = join(li.map_batches(prep, batch_format="pyarrow"), part, on="l_partkey", how="inner")

    def branches(b: pa.Table) -> pa.Table:
        q, br, sz = b.column("l_quantity"), b.column("p_brand"), b.column("p_size")

        def leg(brand, smax, qlo, qhi):
            return pc.and_(
                pc.and_(pc.equal(br, brand), pc.less_equal(sz, pa.scalar(smax, pa.int64()))),
                pc.and_(pc.greater_equal(q, pa.scalar(float(qlo))), pc.less_equal(q, pa.scalar(float(qhi)))),
            )

        keep = pc.or_(pc.or_(leg("Brand#12", 15, 1, 11), leg("Brand#23", 25, 10, 20)), leg("Brand#4", 50, 20, 30))
        t = b.filter(keep)
        return pa.table(
            {
                "n_lines": pa.array([t.num_rows], pa.int64()),
                "rev_p": pa.array([pc.sum(t.column("rev_cents")).as_py() or 0], pa.int64()),
            }
        )

    parts_t = j.map_batches(branches, batch_format="pyarrow").to_pandas()
    return pa.table(
        {
            "n_lines": pa.array([int(parts_t["n_lines"].sum())], pa.int64()),
            "revenue_cents": pa.array([int(parts_t["rev_p"].sum())], pa.int64()),
        }
    )


ORACLE_SQL["disjunctive_revenue"] = (
    "SELECT CAST(count(*) AS BIGINT) AS n_lines, "
    "CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents "
    "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey WHERE "
    "(p.p_brand = 'Brand#12' AND p.p_size <= 15 AND l.l_quantity BETWEEN 1 AND 11) OR "
    "(p.p_brand = 'Brand#23' AND p.p_size <= 25 AND l.l_quantity BETWEEN 10 AND 20) OR "
    "(p.p_brand = 'Brand#4'  AND p.p_size <= 50 AND l.l_quantity BETWEEN 20 AND 30)"
)
QUERIES["disjunctive_revenue"] = q_disjunctive_revenue


def q_late_sole_suppliers(sf_dir: str, late_days: int = 60):
    """TPC-H Q21 shape (sole-blame correlated EXISTS, re-expressed as
    aggregates): in multi-supplier orders where EXACTLY ONE supplier
    shipped late (> orderdate + late_days), charge that supplier.  The
    EXISTS/NOT-EXISTS pair collapses into per-order distinct counts:
    (#suppliers, #late suppliers) — pair-dedup grouped MAX of the late
    flag, then an order-keyed rollup, then one join back to pick the
    guilty supplier rows.  Everything integer; every shuffle is keyed by
    order or supplier."""
    orders = _rename(
        _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"]), {"o_orderkey": "l_orderkey"}
    ).materialize()
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_shipdate"])
    j = join(li, orders, on="l_orderkey", how="inner")

    def flag(b: pa.Table) -> pa.Table:
        late = pc.greater(
            b.column("l_shipdate"),
            pc.add(b.column("o_orderdate"), pa.scalar(np.timedelta64(late_days * 86400, "s"))),
        )
        return pa.table(
            {
                "l_orderkey": b.column("l_orderkey").cast(pa.int64()),
                "l_suppkey": b.column("l_suppkey").cast(pa.int64()),
                "late": late.cast(pa.int64()),
            }
        )

    flagged = j.map_batches(flag, batch_format="pyarrow")

    # ONE shuffle: bucket lines by hash(orderkey) so every order's lines
    # land in the same bounded bucket task, then run the whole correlated
    # logic — pair-dedup late MAX, per-order (#suppliers, #late), the
    # exactly-one-late filter and the culprit pick — VECTORIZED inside
    # the bucket kernel (round 3 used pair-groupby + order-rollup + semi
    # join back: three wide ops where one suffices; the three-shuffle
    # plan cost ~2× at sf0.1)
    n_buckets = 64

    def bucketize(b: pa.Table) -> pa.Table:
        from ..functions.hashing import xxh64_u64

        o = b.column("l_orderkey").to_numpy(zero_copy_only=False)
        bkt = (xxh64_u64(o.view(np.uint64), seed=41) % np.uint64(n_buckets)).astype(np.int64)
        return b.append_column("__b", pa.array(bkt))

    def culprits(g: pd.DataFrame) -> pd.DataFrame:
        o = g["l_orderkey"].to_numpy(dtype=np.int64)
        s = g["l_suppkey"].to_numpy(dtype=np.int64)
        late = g["late"].to_numpy(dtype=np.int64)
        # pair-dedup with late = max over the pair's lines (suppkey fits
        # in the low bits: TPC-H suppkeys ≪ 2^20)
        comb = (o << np.int64(20)) | s
        order = np.lexsort((-late, comb))
        comb_s, late_s, o_s, s_s = comb[order], late[order], o[order], s[order]
        first = np.r_[True, comb_s[1:] != comb_s[:-1]]
        po, ps, pl = o_s[first], s_s[first], late_s[first]  # distinct pairs, max late
        # per-order rollup over the pair rows (sorted by comb → by order)
        ostart = np.r_[True, po[1:] != po[:-1]]
        oid = np.cumsum(ostart) - 1
        ns = np.bincount(oid)
        nl = np.bincount(oid, weights=pl).astype(np.int64)
        guilty = (ns > 1) & (nl == 1)
        m = guilty[oid] & (pl == 1)
        return pd.DataFrame({"l_suppkey": ps[m]})

    culprit = (
        flagged.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(culprits, batch_format="pandas")
    )
    out = grouped_sum(culprit, ["l_suppkey"], {}, count_out="numwait")
    sup = _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    sup = sup.map_batches(
        lambda b: pa.table({"l_suppkey": b.column("s_suppkey").cast(pa.int64()), "s_name": b.column("s_name")}),
        batch_format="pyarrow",
    ).materialize()
    out = join(out, sup, on="l_suppkey", how="inner")
    return _select(out, ["l_suppkey", "s_name", "numwait"])


ORACLE_SQL["late_sole_suppliers"] = (
    "WITH pairs AS (SELECT CAST(l.l_orderkey AS BIGINT) AS l_orderkey, CAST(l.l_suppkey AS BIGINT) AS l_suppkey, "
    "max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END) AS late_any "
    "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey GROUP BY 1, 2), "
    "per_order AS (SELECT l_orderkey, count(*) AS ns, sum(late_any) AS nl FROM pairs GROUP BY 1) "
    "SELECT p.l_suppkey, s.s_name, CAST(count(*) AS BIGINT) AS numwait "
    "FROM pairs p JOIN per_order o ON p.l_orderkey = o.l_orderkey JOIN supplier s ON s.s_suppkey = p.l_suppkey "
    "WHERE p.late_any = 1 AND o.ns > 1 AND o.nl = 1 GROUP BY p.l_suppkey, s.s_name"
)
QUERIES["late_sole_suppliers"] = q_late_sole_suppliers


def q_events_hopping(sf_dir: str, hop_min: int = 30, win_min: int = 60):
    """HOPPING-window aggregate (60-min windows every 30 min): each event
    lands in win/hop overlapping windows, so the map stage REPLICATES the
    row once per covering window (the standard streaming-SQL lowering of
    HOP to a flat-map + tumbling groupby) and one grouped_sum folds the
    partials.  Window keys are integer epoch-microseconds — no timestamp
    arithmetic crosses an engine boundary."""
    assert win_min % hop_min == 0, "window must be a multiple of the hop"
    hop_us = hop_min * 60_000_000
    n_cover = win_min // hop_min
    ev = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def replicate(b: pa.Table) -> pa.Table:
        b = _cents(b, "value", "vc")
        # null → 0 like the oracle's CASE, so an all-null window still
        # sums to 0 instead of null
        b = b.set_column(
            b.schema.get_field_index("vc"),
            "vc",
            pc.fill_null(b.column("vc"), pa.scalar(0, pa.int64())),
        )
        w0 = pc.multiply(
            pc.divide(b.column("ts").cast(pa.int64()), pa.scalar(hop_us, pa.int64())),
            pa.scalar(hop_us, pa.int64()),
        )
        parts = []
        for i in range(n_cover):
            parts.append(
                pa.table(
                    {
                        "event_type": b.column("event_type"),
                        "win_us": pc.subtract(w0, pa.scalar(i * hop_us, pa.int64())),
                        "vc": b.column("vc"),
                    }
                )
            )
        return pa.concat_tables(parts)

    agg = grouped_sum(ev.map_batches(replicate, batch_format="pyarrow"), ["event_type", "win_us"], {"vc": "total_cents"}, count_out="cnt")
    return _select(agg, ["event_type", "win_us", "cnt", "total_cents"])


ORACLE_SQL["events_hopping"] = (
    "WITH w AS (SELECT event_type, "
    "CASE WHEN value IS NULL THEN 0 ELSE CAST(round(value*100) AS BIGINT) END AS vc, "
    "(epoch_us(ts)//1800000000)*1800000000 AS w0 FROM events), "
    "b AS (SELECT event_type, vc, w0 AS win_us FROM w "
    "UNION ALL SELECT event_type, vc, w0 - 1800000000 FROM w) "
    "SELECT event_type, win_us, CAST(count(*) AS BIGINT) AS cnt, "
    "CAST(sum(vc) AS BIGINT) AS total_cents FROM b GROUP BY event_type, win_us"
)
QUERIES["events_hopping"] = q_events_hopping


def _nation_map(sf_dir: str, key_out: str, name_out: str) -> pa.Table:
    t = _read_table(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    return pa.table({key_out: t.column("n_nationkey").cast(pa.int64()), name_out: t.column("n_name")})


def q_nation_trade_volume(sf_dir: str):
    """TPC-H Q7 shape (two-sided dimension decoration): shipped revenue
    between every ORDERED (supplier nation → customer nation) pair per
    ship-year, cross-border only.  The supplier→nation and nation-name
    maps are guaranteed broadcasts; the orders hop re-keys the fact
    stream through the front door; ONE grouped sum at the
    (25×25×years)-row grain."""
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": b.column("l_orderkey").cast(pa.int64()),
                "s_suppkey": b.column("l_suppkey").cast(pa.int64()),
                "ship_year": pc.year(b.column("l_shipdate")).cast(pa.int64()),
                "rev_cents": _rev_cents(b),
            }
        )

    sup = _read_table(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    sup_nat = pa.table(
        {"s_suppkey": sup.column("s_suppkey").cast(pa.int64()), "nk": sup.column("s_nationkey").cast(pa.int64())}
    ).join(_nation_map(sf_dir, "nk", "supp_nation"), keys="nk").drop_columns(["nk"])
    j = join(li.map_batches(prep, batch_format="pyarrow"), sup_nat, on="s_suppkey", how="inner")
    orders = _rename(
        _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]), {"o_orderkey": "l_orderkey"}
    )
    orders = orders.map_batches(
        lambda b: pa.table(
            {"l_orderkey": b.column("l_orderkey").cast(pa.int64()), "c_custkey": b.column("o_custkey").cast(pa.int64())}
        ),
        batch_format="pyarrow",
    ).materialize()
    j = join(j, orders, on="l_orderkey", how="inner")
    cust = _read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    cust_nat = pa.table(
        {"c_custkey": cust.column("c_custkey").cast(pa.int64()), "nk": cust.column("c_nationkey").cast(pa.int64())}
    ).join(_nation_map(sf_dir, "nk", "cust_nation"), keys="nk").drop_columns(["nk"])
    j = join(j, cust_nat, on="c_custkey", how="inner")
    j = j.map_batches(
        lambda b: b.filter(pc.not_equal(b.column("supp_nation"), b.column("cust_nation"))),
        batch_format="pyarrow",
    )
    out = grouped_sum(j, ["supp_nation", "cust_nation", "ship_year"], {"rev_cents": "revenue_cents"})
    return _select(out, ["supp_nation", "cust_nation", "ship_year", "revenue_cents"])


ORACLE_SQL["nation_trade_volume"] = (
    "SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation, "
    "CAST(year(l.l_shipdate) AS BIGINT) AS ship_year, "
    "CAST(sum(CAST(round(l.l_extendedprice*(1-l.l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents "
    "FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey "
    "JOIN nation ns ON ns.n_nationkey = s.s_nationkey "
    "JOIN orders o ON o.o_orderkey = l.l_orderkey "
    "JOIN customer c ON c.c_custkey = o.o_custkey "
    "JOIN nation nc ON nc.n_nationkey = c.c_nationkey "
    "WHERE ns.n_name <> nc.n_name GROUP BY 1, 2, 3"
)
QUERIES["nation_trade_volume"] = q_nation_trade_volume


def q_market_share(sf_dir: str, region: str = "EUROPE"):
    """TPC-H Q8 shape (share-of-total): per ship-year, each supplier
    nation's revenue into one customer REGION, alongside the year total —
    numerator and denominator emitted as raw integer cents (the share is
    their quotient; a float share would cost the exact hash).  The year
    totals are a second, years-sized aggregate joined back broadcast."""
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": b.column("l_orderkey").cast(pa.int64()),
                "s_suppkey": b.column("l_suppkey").cast(pa.int64()),
                "ship_year": pc.year(b.column("l_shipdate")).cast(pa.int64()),
                "rev_cents": _rev_cents(b),
            }
        )

    # customers of the region — semi-prune orders before the fact join
    nat = _read_table(sf_dir, "nation", columns=["n_nationkey", "n_regionkey"])
    reg = _read_table(sf_dir, "region", columns=["r_regionkey", "r_name"])
    reg_keys = set(
        reg.filter(pc.equal(reg.column("r_name"), region)).column("r_regionkey").to_pylist()
    )
    nat_keys = nat.filter(
        pc.is_in(nat.column("n_regionkey"), value_set=pa.array(sorted(reg_keys), nat.column("n_regionkey").type))
    ).column("n_nationkey")
    cust = _read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    cust_in = cust.filter(pc.is_in(cust.column("c_nationkey"), value_set=nat_keys))
    cust_dim = pa.table({"c_custkey": cust_in.column("c_custkey").cast(pa.int64())})
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    orders = orders.map_batches(
        lambda b: pa.table(
            {"l_orderkey": b.column("o_orderkey").cast(pa.int64()), "c_custkey": b.column("o_custkey").cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )
    okeys = join(orders, cust_dim, on="c_custkey", how="semi").drop_columns(["c_custkey"]).materialize()
    j = join(li.map_batches(prep, batch_format="pyarrow"), okeys, on="l_orderkey", how="semi")
    sup = _read_table(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    sup_nat = pa.table(
        {"s_suppkey": sup.column("s_suppkey").cast(pa.int64()), "nk": sup.column("s_nationkey").cast(pa.int64())}
    ).join(_nation_map(sf_dir, "nk", "supp_nation"), keys="nk").drop_columns(["nk"])
    j = join(j, sup_nat, on="s_suppkey", how="inner")
    per = grouped_sum(j, ["ship_year", "supp_nation"], {"rev_cents": "nation_cents"}).materialize()
    totals = grouped_sum(per, ["ship_year"], {"nation_cents": "year_cents"})
    tb = [b.select(["ship_year", "year_cents"]) for b in totals.iter_batches(batch_format="pyarrow")]
    totals_t = (
        pa.concat_tables(tb)
        if tb
        else pa.table({"ship_year": pa.array([], pa.int64()), "year_cents": pa.array([], pa.int64())})
    )
    out = join(per, totals_t, on="ship_year", how="inner")
    return _select(out, ["ship_year", "supp_nation", "nation_cents", "year_cents"])


ORACLE_SQL["market_share"] = (
    "WITH base AS (SELECT CAST(year(l.l_shipdate) AS BIGINT) AS ship_year, ns.n_name AS supp_nation, "
    "CAST(round(l.l_extendedprice*(1-l.l_discount)*100) AS BIGINT) AS rc "
    "FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey "
    "JOIN customer c ON c.c_custkey = o.o_custkey "
    "JOIN nation nc ON nc.n_nationkey = c.c_nationkey "
    "JOIN region r ON r.r_regionkey = nc.n_regionkey AND r.r_name = 'EUROPE' "
    "JOIN supplier s ON s.s_suppkey = l.l_suppkey "
    "JOIN nation ns ON ns.n_nationkey = s.s_nationkey) "
    "SELECT ship_year, supp_nation, CAST(sum(rc) AS BIGINT) AS nation_cents, "
    "CAST(sum(sum(rc)) OVER (PARTITION BY ship_year) AS BIGINT) AS year_cents "
    "FROM base GROUP BY ship_year, supp_nation"
)
QUERIES["market_share"] = q_market_share


KFOLD_K = 5


def q_kfold_assign(sf_dir: str, k: int = KFOLD_K):
    """Deterministic stratified k-fold assignment for cross-validation:
    fold = rank of md5(doc_id) WITHIN the doc's language stratum, mod k —
    every stratum contributes to every fold as evenly as arithmetic
    allows (fold counts within a stratum differ by ≤ 1), unlike a plain
    hash%k which only balances in expectation.  The stratum rank is the
    epoch_shuffle two-pass DISTRIBUTED rank (per-block (lang, hash-top-
    bits) histograms → broadcast prefix-sum offsets → bounded
    (lang, bucket) groups emit offset + local rank), so no task ever
    holds a whole stratum; the SQL oracle replays it with one
    ROW_NUMBER window."""
    from ray.data.aggregate import Sum

    from ..functions.sketches import md5_u64_batch

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    bits = 8
    shift = np.uint64(64 - bits)

    def hash_rows(b: pa.Table) -> pa.Table:
        h = md5_u64_batch(pc.cast(b.column("doc_id"), pa.string()))
        return pa.table(
            {
                "doc_id": b.column("doc_id").cast(pa.int64()),
                "lang": b.column("lang"),
                "h": pa.array(h.view(np.int64)),
                "bkt": pa.array((h >> shift).astype(np.int64)),
            }
        )

    hashed = docs.map_batches(hash_rows, batch_format="pyarrow").materialize()

    def hist(b: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(b.select(["lang", "bkt"]), ["lang", "bkt"]).aggregate([([], "count_all")])
        return pa.table({"lang": g.column("lang"), "bkt": g.column("bkt"), "n": g.column("count_all")})

    counts: dict[str, np.ndarray] = {}
    for t in (
        hashed.map_batches(hist, batch_format="pyarrow").groupby(["lang", "bkt"]).aggregate(Sum("n"))
    ).iter_batches(batch_format="pyarrow"):
        for lang, bkt, n in zip(
            t.column("lang").to_pylist(), t.column("bkt").to_pylist(), t.column("sum(n)").to_pylist()
        ):
            counts.setdefault(lang, np.zeros(1 << bits, np.int64))[bkt] = n
    offsets = {
        lang: np.r_[0, np.cumsum(c[:-1])] for lang, c in counts.items()
    }

    def rank_fold(g):
        import pandas as pd

        order = np.lexsort((g["doc_id"].to_numpy(), g["h"].to_numpy().view(np.uint64)))
        off = offsets[g["lang"].iat[0]][int(g["bkt"].iat[0])]
        rank = np.empty(len(g), np.int64)
        rank[order] = off + np.arange(len(g))
        return pd.DataFrame(
            {"doc_id": g["doc_id"], "lang": g["lang"], "fold": rank % k}
        )

    return hashed.groupby(["lang", "bkt"]).map_groups(rank_fold, batch_format="pandas")


def q_train_test_split(sf_dir: str, train_pct: int = 90):
    """Deterministic corpus splitting, the two standard modes in one
    output: a per-document hash split (Knuth multiplicative hash of
    doc_id — SQL-expressible, so the assignment is engine-independent and
    RE-RUNNABLE) and a leakage-safe per-SOURCE split (every doc of a
    source lands on the same side, the decontamination-friendly variant).
    All-integer arithmetic; stateless map_batches, zero shuffles."""
    import hashlib

    docs = _read(sf_dir, "documents", columns=["doc_id", "source"])
    m = np.uint64(2654435761)
    cut = np.uint64((train_pct * (1 << 32)) // 100)
    # hex threshold for the md5-prefix comparison (fixed-width lowercase
    # hex compares lexicographically == numerically)
    hex_cut = f"{int(cut):08x}"

    def split(b: pa.Table) -> pa.Table:
        d = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            doc_hash = (d * m) % np.uint64(1 << 32)
        src = b.column("source")
        # md5 is the shared string hash (computable on ANY engine); sources
        # are corpus-label cardinality, so hash uniques and map back
        uniq = pc.unique(src).to_pylist()
        # NULL source → 'test', matching the SQL CASE (NULL comparison
        # falls through to ELSE); only valid sources hash
        pref = {s: hashlib.md5(s.encode()).hexdigest()[:8] for s in uniq if s is not None}
        src_split = np.array(
            ["train" if (s is not None and pref[s] < hex_cut) else "test" for s in src.to_pylist()],
            dtype=object,
        )
        doc_split = np.where(doc_hash < cut, "train", "test")
        return pa.table(
            {
                "doc_id": b.column("doc_id").cast(pa.int64()),
                "doc_split": pa.array(doc_split.tolist(), pa.string()),
                "source_split": pa.array(src_split.tolist(), pa.string()),
            }
        )

    return docs.map_batches(split, batch_format="pyarrow")


ORACLE_SQL["train_test_split"] = (
    "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
    "CASE WHEN (doc_id * 2654435761) % 4294967296 < 3865470566 THEN 'train' ELSE 'test' END AS doc_split, "
    "CASE WHEN substr(md5(source), 1, 8) < 'e6666666' THEN 'train' ELSE 'test' END AS source_split "
    "FROM documents"
)
QUERIES["train_test_split"] = q_train_test_split
ORACLE_SQL["kfold_assign"] = (
    "WITH r AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, "
    "ROW_NUMBER() OVER (PARTITION BY lang "
    "ORDER BY md5_number_upper(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS rnk FROM documents) "
    f"SELECT doc_id, lang, CAST(rnk % {KFOLD_K} AS BIGINT) AS fold FROM r"
)
QUERIES["kfold_assign"] = q_kfold_assign


def q_rolling_wau(sf_dir: str, window_days: int = 7):
    """Trailing-7-day distinct users per day (the WAU curve): COUNT
    DISTINCT over a sliding RANGE frame, which SQL window functions can't
    express — the standard lowering is pair replication: each distinct
    (day, user) pair claims every day in [day, day+6] (flat-map ×W), a
    second pair-dedup collapses multi-visit users inside the window, and
    a day-keyed count finishes.  Three pair-keyed grouped steps, nothing
    driver-side; emitted days restrict to days that EXIST in the data
    (the SQL mirror joins the day list)."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts"])
    day_us = 86_400_000_000
    n_buckets = 64

    # Users are hash-partitioned into buckets, so a user's whole history
    # lives in ONE bounded group and the entire lowering — (user, day)
    # dedup, ×W window replication, within-window dedup, per-day counts —
    # runs vectorized inside the bucket kernel; per-bucket distinct
    # counts SUM correctly across buckets because user sets are disjoint.
    # ONE bucket shuffle (over per-block pre-deduped pairs) + one tiny
    # (days × buckets)-row rollup replaces round 3's three pair-keyed
    # grouped steps (~2× at sf0.1).
    def day_pairs(b: pa.Table) -> pa.Table:
        from ..functions.hashing import xxh64_u64

        d = pc.floor_temporal(b.column("ts"), unit="day").cast(pa.timestamp("us")).cast(pa.int64())
        u = b.column("user_id").cast(pa.int64()).to_numpy(zero_copy_only=False)
        didx = d.to_numpy(zero_copy_only=False) // day_us
        comb = np.unique((u.astype(np.int64) << np.int64(16)) | didx)  # block-local dedup
        uu, dd = comb >> np.int64(16), comb & np.int64(0xFFFF)
        bkt = (xxh64_u64(uu.view(np.uint64), seed=43) % np.uint64(n_buckets)).astype(np.int64)
        return pa.table(
            {
                "__b": pa.array(bkt),
                "user_id": pa.array(uu),
                "didx": pa.array(dd),
            }
        )

    def window_counts(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(dtype=np.int64)
        d = g["didx"].to_numpy(dtype=np.int64)
        comb = np.unique((u << np.int64(16)) | d)  # global (user, day) dedup
        # ×W replication + within-window dedup (day sits in the low bits,
        # the window never carries: day index ≪ 2^16 − W)
        claims = np.unique(
            np.concatenate([comb + np.int64(i) for i in range(window_days)])
        )
        wau_days, wau_p = np.unique(claims & np.int64(0xFFFF), return_counts=True)
        obs_days = np.unique(comb & np.int64(0xFFFF))
        obs = np.isin(wau_days, obs_days).astype(np.int64)
        return pd.DataFrame(
            {"didx": wau_days, "wau_p": wau_p.astype(np.int64), "obs_p": obs}
        )

    partials = (
        ev.map_batches(day_pairs, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(window_counts, batch_format="pandas")
    )
    out = grouped_sum(partials, ["didx"], {"wau_p": "wau", "obs_p": "obs"})

    def fin(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater(b.column("obs"), pa.scalar(0, pa.int64())))
        return pa.table(
            {
                "day": pc.multiply(b.column("didx"), pa.scalar(day_us, pa.int64())).cast(pa.timestamp("us")),
                "wau": b.column("wau").cast(pa.int64()),
            }
        )

    return out.map_batches(fin, batch_format="pyarrow")


ORACLE_SQL["rolling_wau"] = (
    "WITH pairs AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events), "
    "days AS (SELECT DISTINCT day FROM pairs) "
    "SELECT d.day AS day, CAST(count(DISTINCT p.user_id) AS BIGINT) AS wau "
    "FROM days d JOIN pairs p ON p.day BETWEEN d.day - INTERVAL 6 DAY AND d.day "
    "GROUP BY d.day"
)
QUERIES["rolling_wau"] = q_rolling_wau


def q_validate_docs(sf_dir: str):
    """Data-quality validation suite over the documents table — the
    Great-Expectations shape as Dataset ops, one row per rule with its
    violation count: null text, non-positive length, length/text
    disagreement, unknown language, duplicate doc_id.  The scalar rules
    fold as per-block integer partials (one tiny global sum); the
    uniqueness rule is the only keyed step and pre-aggregates per block
    before its groupby.  Rule names sort deterministically."""
    # materialized: consumed by BOTH the scalar-rules pass and the
    # uniqueness groupby (an unmaterialized Dataset re-reads per consumer)
    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang", "n_chars"]).materialize()
    langs = pa.array(["en", "fr", "de", "es", "zh"])

    def partial(b: pa.Table) -> pa.Table:
        null_text = pc.sum(pc.is_null(b.column("text")).cast(pa.int64())).as_py() or 0
        npos = pc.sum(pc.less_equal(b.column("n_chars"), 0).cast(pa.int64())).as_py() or 0
        tlen = pc.utf8_length(pc.fill_null(b.column("text"), ""))
        mismatch = pc.sum(pc.not_equal(tlen.cast(pa.int64()), b.column("n_chars").cast(pa.int64())).cast(pa.int64())).as_py() or 0
        # SQL NOT IN semantics: a NULL lang is neither in nor out (the
        # FILTER drops it) — count only VALID unknown values
        badlang = pc.sum(
            pc.and_(pc.invert(pc.is_in(b.column("lang"), value_set=langs)), pc.is_valid(b.column("lang"))).cast(
                pa.int64()
            )
        ).as_py() or 0
        return pa.table(
            {
                "rule": pa.array(["null_text", "nonpositive_len", "len_mismatch", "unknown_lang"]),
                "v": pa.array([null_text, npos, mismatch, badlang], pa.int64()),
            }
        )

    scalars = grouped_sum(docs.map_batches(partial, batch_format="pyarrow"), ["rule"], {"v": "violations"})
    dup_keys = grouped_sum(docs.map_batches(lambda b: b.select(["doc_id"]), batch_format="pyarrow"), ["doc_id"], {}, count_out="c")
    dups = dup_keys.map_batches(
        lambda b: pa.table(
            {
                "rule": pa.array(["dup_doc_id"] * 1),
                "violations": pa.array(
                    [int(pc.sum(pc.subtract(b.column("c"), pa.scalar(1, pa.int64()))).as_py() or 0)], pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )
    # fold the per-block dup partials into one row
    dup_total = grouped_sum(dups, ["rule"], {"violations": "violations"})
    out = scalars.union(dup_total)
    return _select(out, ["rule", "violations"])


ORACLE_SQL["validate_docs"] = (
    "SELECT 'null_text' AS rule, CAST(count(*) FILTER (text IS NULL) AS BIGINT) AS violations FROM documents "
    "UNION ALL SELECT 'nonpositive_len', CAST(count(*) FILTER (n_chars <= 0) AS BIGINT) FROM documents "
    "UNION ALL SELECT 'len_mismatch', CAST(count(*) FILTER (length(COALESCE(text, '')) <> n_chars) AS BIGINT) FROM documents "
    "UNION ALL SELECT 'unknown_lang', CAST(count(*) FILTER (lang NOT IN ('en','fr','de','es','zh')) AS BIGINT) FROM documents "
    "UNION ALL SELECT 'dup_doc_id', CAST(count(*) - count(DISTINCT doc_id) AS BIGINT) FROM documents"
)
QUERIES["validate_docs"] = q_validate_docs


def q_orphan_orders(sf_dir: str):
    """Referential-integrity check (FK validation as a flagged left
    join): per order status, how many orders DO resolve to a customer
    row and how many are orphans — the constraint report every ingest
    pipeline runs before publishing a snapshot (emitting both sides
    keeps the result non-degenerate on clean data)."""
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderstatus"])
    orders = orders.map_batches(
        lambda b: pa.table(
            {"c_custkey": b.column("o_custkey").cast(pa.int64()), "o_orderstatus": b.column("o_orderstatus")}
        ),
        batch_format="pyarrow",
    )
    cust = _read(sf_dir, "customer", columns=["c_custkey"])
    cust = cust.map_batches(
        lambda b: pa.table(
            {
                "c_custkey": b.column("c_custkey").cast(pa.int64()),
                "__m": pa.array(np.ones(b.num_rows, np.int8)),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    j = join(orders, cust, on="c_custkey", how="left")

    def flags(b: pa.Table) -> pa.Table:
        m = pc.is_valid(b.column("__m")).cast(pa.int64())
        return pa.table(
            {
                "o_orderstatus": b.column("o_orderstatus"),
                "matched": m,
                "orphans": pc.subtract(pa.scalar(1, pa.int64()), m),
            }
        )

    out = grouped_sum(j.map_batches(flags, batch_format="pyarrow"), ["o_orderstatus"], {"matched": "matched", "orphans": "orphans"})
    return _select(out, ["o_orderstatus", "matched", "orphans"])


ORACLE_SQL["orphan_orders"] = (
    "SELECT o_orderstatus, "
    "CAST(count(*) FILTER (c.c_custkey IS NOT NULL) AS BIGINT) AS matched, "
    "CAST(count(*) FILTER (c.c_custkey IS NULL) AS BIGINT) AS orphans "
    "FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey "
    "GROUP BY o_orderstatus"
)
QUERIES["orphan_orders"] = q_orphan_orders


def q_event_cooccurrence(sf_dir: str):
    """Market-basket co-occurrence: for every unordered event-type pair,
    how many users exhibit BOTH — the association signal item-recommender
    pipelines start from.  Distinct (user, type) pairs reduce first (one
    pair-keyed groupby); the per-user basket expansion is bounded by the
    type-alphabet size; one tiny pair-count rollup finishes."""
    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])
    pairs = grouped_sum(ev, ["user_id", "event_type"], {}, count_out="c")

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(g["event_type"].to_numpy(dtype=object))
        if len(ts) < 2:
            return pd.DataFrame({"a": pd.Series([], dtype=object), "b": pd.Series([], dtype=object)})
        ia, ib = np.triu_indices(len(ts), k=1)
        return pd.DataFrame({"a": ts[ia], "b": ts[ib]})

    baskets = pairs.groupby("user_id").map_groups(expand, batch_format="pandas")
    out = grouped_sum(baskets, ["a", "b"], {}, count_out="users")
    return _select(out, ["a", "b", "users"])


ORACLE_SQL["event_cooccurrence"] = (
    "WITH d AS (SELECT DISTINCT user_id, event_type FROM events) "
    "SELECT x.event_type AS a, y.event_type AS b, CAST(count(*) AS BIGINT) AS users "
    "FROM d x JOIN d y ON x.user_id = y.user_id AND x.event_type < y.event_type "
    "GROUP BY x.event_type, y.event_type"
)
QUERIES["event_cooccurrence"] = q_event_cooccurrence


def q_revenue_yoy(sf_dir: str):
    """Year-over-year comparison: each month's order revenue beside the
    same month one year earlier (NULL when no prior year) — the growth
    view every revenue dashboard opens with.  The wide step is ONE
    monthly grouped sum; the self-alignment runs on the months-sized
    rollup (a driver-side dict probe here; at a 10³-month horizon this
    table is always tiny)."""
    orders = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        mo = pc.floor_temporal(b.column("o_orderdate"), unit="month").cast(pa.timestamp("us"))
        b = _cents(b, "o_totalprice", "vc")
        return pa.table({"mo": mo, "vc": b.column("vc")})

    monthly = grouped_sum(orders.map_batches(prep, batch_format="pyarrow"), ["mo"], {"vc": "rev_cents"})
    df = monthly.to_pandas()
    prev = {}
    for r in df.itertuples():
        ts = pd.Timestamp(r.mo)
        prev[ts.replace(year=ts.year + 1)] = int(r.rev_cents)
    out_prev = [prev.get(pd.Timestamp(m)) for m in df["mo"]]
    return pa.table(
        {
            "mo": pa.array(df["mo"]).cast(pa.timestamp("us")),
            "rev_cents": pa.array(df["rev_cents"].astype(np.int64)),
            "prev_year_cents": pa.array(out_prev, pa.int64()),
        }
    )


ORACLE_SQL["revenue_yoy"] = (
    "WITH m AS (SELECT date_trunc('month', o_orderdate) AS mo, "
    "CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS rev_cents FROM orders GROUP BY 1) "
    "SELECT a.mo, a.rev_cents, b.rev_cents AS prev_year_cents "
    "FROM m a LEFT JOIN m b ON b.mo + INTERVAL 12 MONTH = a.mo"
)
QUERIES["revenue_yoy"] = q_revenue_yoy


def q_value_mad_by_type(sf_dir: str):
    """Robust dispersion per key: MEDIAN ABSOLUTE DEVIATION via two
    chained exact-quantile passes (median, then median of |x − med|) —
    the outlier-resistant twin of q_value_moments_by_type's variance.
    Each pass is the histogram-narrowing selector (per-(key, bin) count
    partials only); the per-key medians broadcast as a tiny dict between
    them.  |x − med| is the identical float op on both engines, so the
    deviation multiset — and the interpolated median over it — match."""
    from ..functions.quantiles import grouped_quantile_cont

    ev = _read(sf_dir, "events", columns=["event_type", "value"]).materialize()
    med = grouped_quantile_cont(ev, "event_type", "value", 1, 2, out="med").to_pandas()
    med_map = dict(zip(med["event_type"], med["med"]))
    med_ref = ray.put(med_map)

    def dev(b: pa.Table) -> pa.Table:
        m = ray.get(med_ref)
        # SQL NULL-skip parity: a NULL value contributes no deviation row
        # (NaN would read as VALID and poison the narrowing histogram)
        b = b.filter(pc.is_valid(b.column("value")))
        v = b.column("value").to_numpy(zero_copy_only=False)
        centers = np.array([m.get(t, np.nan) for t in b.column("event_type").to_pylist()])
        return pa.table(
            {"event_type": b.column("event_type"), "absdev": pa.array(np.abs(v - centers))}
        )

    # materialized: the quantile selector consumes its input several times
    devs = ev.map_batches(dev, batch_format="pyarrow").materialize()
    return grouped_quantile_cont(devs, "event_type", "absdev", 1, 2, out="mad")


ORACLE_SQL["value_mad_by_type"] = (
    "WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS m FROM events GROUP BY 1) "
    "SELECT e.event_type, quantile_cont(abs(e.value - med.m), 0.5) AS mad "
    "FROM events e JOIN med USING (event_type) GROUP BY e.event_type"
)
QUERIES["value_mad_by_type"] = q_value_mad_by_type


def q_events_dow_hour(sf_dir: str):
    """Calendar heatmap: event count + value cents by (ISO day-of-week,
    hour) — the 7×24 seasonality grid.  One partial-aggregated groupby;
    the only subtlety is calendar parity: pyarrow day_of_week is
    0=Monday, DuckDB isodow is 1=Monday, aligned by +1."""
    ev = _read(sf_dir, "events", columns=["ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "value", "vc")
        return pa.table(
            {
                "dow": pc.add(pc.day_of_week(b.column("ts")), pa.scalar(1, pa.int64())).cast(pa.int64()),
                "hour": pc.hour(b.column("ts")).cast(pa.int64()),
                "vc": pc.fill_null(b.column("vc"), pa.scalar(0, pa.int64())),
            }
        )

    agg = grouped_sum(ev.map_batches(prep, batch_format="pyarrow"), ["dow", "hour"], {"vc": "total_cents"}, count_out="cnt")
    return _select(agg, ["dow", "hour", "cnt", "total_cents"])


ORACLE_SQL["events_dow_hour"] = (
    "SELECT CAST(isodow(ts) AS BIGINT) AS dow, CAST(hour(ts) AS BIGINT) AS hour, "
    "CAST(count(*) AS BIGINT) AS cnt, "
    "CAST(sum(CASE WHEN value IS NULL THEN 0 ELSE CAST(round(value*100) AS BIGINT) END) AS BIGINT) AS total_cents "
    "FROM events GROUP BY 1, 2"
)
QUERIES["events_dow_hour"] = q_events_dow_hour


def q_urgent_revenue_bloom(sf_dir: str):
    """Bloom-join showcase: revenue of lineitems belonging to URGENT
    orders, pruned by a broadcast Bloom of the urgent order keys (the
    crawl seen-set's filter as a join accelerator) with exact
    verification — identical answer to the plain semi join, ~5× smaller
    broadcast at scale.  One global two-number aggregate."""
    from ..stages.joins import bloom_semi_join

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    # filter INSIDE the tasks: only the urgent keys cross to the driver
    urgent = orders.map_batches(
        lambda b: pa.table(
            {
                "o_orderkey": b.filter(pc.equal(b.column("o_orderpriority"), "1-URGENT"))
                .column("o_orderkey")
                .cast(pa.int64())
            }
        ),
        batch_format="pyarrow",
    )
    keys_parts = [
        b.column("o_orderkey").to_numpy(zero_copy_only=False)
        for b in urgent.iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    keys = np.concatenate(keys_parts) if keys_parts else np.empty(0, np.int64)
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])
    li = li.map_batches(
        lambda b: pa.table({"l_orderkey": b.column("l_orderkey").cast(pa.int64()), "rev_cents": _rev_cents(b)}),
        batch_format="pyarrow",
    )
    hit = bloom_semi_join(li, keys.astype(np.int64), on="l_orderkey")
    parts = hit.map_batches(
        lambda b: pa.table(
            {"n_lines": pa.array([b.num_rows], pa.int64()), "rc": pa.array([pc.sum(b.column("rev_cents")).as_py() or 0], pa.int64())}
        ),
        batch_format="pyarrow",
    ).to_pandas()
    return pa.table(
        {
            "n_lines": pa.array([int(parts["n_lines"].sum())], pa.int64()),
            "revenue_cents": pa.array([int(parts["rc"].sum())], pa.int64()),
        }
    )


ORACLE_SQL["urgent_revenue_bloom"] = (
    "SELECT CAST(count(*) AS BIGINT) AS n_lines, "
    "CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents "
    "FROM lineitem l WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey "
    "AND o.o_orderpriority = '1-URGENT')"
)
QUERIES["urgent_revenue_bloom"] = q_urgent_revenue_bloom


def q_value_quartiles_by_type(sf_dir: str):
    """Quartile bands per key (P25/P50/P75 of value cents) — three exact
    histogram-narrowing selections over INTEGER cents joined into one
    band table; the box-plot backbone without any per-group sort."""
    from ..functions.quantiles import grouped_quantile_disc

    ev = _read(sf_dir, "events", columns=["event_type", "value"])
    ev = ev.map_batches(lambda b: _cents(b, "value", "vc"), batch_format="pyarrow").drop_columns(["value"]).materialize()
    q1 = grouped_quantile_disc(ev, "event_type", "vc", 1, 4, out="q1_cents")
    q2 = grouped_quantile_disc(ev, "event_type", "vc", 2, 4, out="med_cents")
    q3 = grouped_quantile_disc(ev, "event_type", "vc", 3, 4, out="q3_cents")
    out = q1.join(q2, keys="event_type").join(q3, keys="event_type")
    return pa.table(
        {
            "event_type": out.column("event_type"),
            "q1_cents": out.column("q1_cents").cast(pa.int64()),
            "med_cents": out.column("med_cents").cast(pa.int64()),
            "q3_cents": out.column("q3_cents").cast(pa.int64()),
        }
    )


ORACLE_SQL["value_quartiles_by_type"] = (
    "WITH c AS (SELECT event_type, CAST(round(value*100) AS BIGINT) AS vc FROM events WHERE value IS NOT NULL) "
    "SELECT event_type, CAST(quantile_disc(vc, 0.25) AS BIGINT) AS q1_cents, "
    "CAST(quantile_disc(vc, 0.5) AS BIGINT) AS med_cents, "
    "CAST(quantile_disc(vc, 0.75) AS BIGINT) AS q3_cents FROM c GROUP BY event_type"
)
QUERIES["value_quartiles_by_type"] = q_value_quartiles_by_type


def q_scaled_doclen_by_lang(sf_dir: str):
    """Feature engineering: min-max normalized document length within
    each language (the per-group scaler every tabular-ML pipeline
    applies before training).  Grouped min+max reduce as per-block
    partials; the lang-sized band table broadcasts; the scale itself is
    one vectorized map — a single int-int float division on both
    engines, so even the floats hash-match."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"]).materialize()

    def pminmax(b: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(b.select(["lang", "n_chars"]), ["lang"]).aggregate(
            [("n_chars", "min"), ("n_chars", "max")]
        )
        return pa.table(
            {"lang": g.column("lang"), "mn_p": g.column("n_chars_min"), "mx_p": g.column("n_chars_max")}
        )

    bands = (
        docs.map_batches(pminmax, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Min("mn_p"), Max("mx_p"))
        .to_pandas()
    )
    band_ref = ray.put(
        {r.lang: (int(r[1]), int(r[2])) for r in bands.itertuples(index=False)}
    )

    def scale(b: pa.Table) -> pa.Table:
        m = ray.get(band_ref)
        langs = b.column("lang").to_pylist()
        mn = np.array([m[l][0] for l in langs], dtype=np.float64)
        mx = np.array([m[l][1] for l in langs], dtype=np.float64)
        x = b.column("n_chars").to_numpy(zero_copy_only=False).astype(np.float64)
        span = mx - mn
        scaled = np.where(span > 0, (x - mn) / np.where(span > 0, span, 1.0), 0.0)
        return pa.table(
            {"doc_id": b.column("doc_id").cast(pa.int64()), "lang": b.column("lang"), "scaled_len": pa.array(scaled)}
        )

    return docs.map_batches(scale, batch_format="pyarrow")


ORACLE_SQL["scaled_doclen_by_lang"] = (
    "WITH b AS (SELECT lang, min(n_chars) AS mn, max(n_chars) AS mx FROM documents GROUP BY 1) "
    "SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.lang, "
    "CASE WHEN b.mx > b.mn THEN (d.n_chars - b.mn) / CAST(b.mx - b.mn AS DOUBLE) ELSE 0.0 END AS scaled_len "
    "FROM documents d JOIN b USING (lang)"
)
QUERIES["scaled_doclen_by_lang"] = q_scaled_doclen_by_lang


def q_user_interarrival_median(sf_dir: str):
    """Behavioral cadence: each user's MEDIAN inter-event gap in
    microseconds (the session-timeout calibration statistic).  Users
    co-partition once; inside each (bounded) user group the gaps are one
    vectorized diff over the (ts, event_id)-sorted stream and the median
    interpolates the two middle order statistics exactly like SQL's
    quantile_cont — integer gaps, dyadic quantile, so the float matches
    bit-for-bit.  Users with < 2 events have no gap and are absent (SQL
    join semantics)."""
    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        t = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        if len(t) < 2:
            return pd.DataFrame(
                {"user_id": pd.Series([], dtype=np.int64), "median_gap_us": pd.Series([], dtype=np.float64)}
            )
        d = np.diff(t).astype(np.float64)
        return pd.DataFrame(
            {"user_id": [int(g["user_id"].iat[0])], "median_gap_us": [float(np.median(d))]}
        )

    return ev.groupby("user_id").map_groups(gaps, batch_format="pandas")


ORACLE_SQL["user_interarrival_median"] = (
    "WITH g AS (SELECT user_id, epoch_us(ts) - lag(epoch_us(ts)) OVER "
    "(PARTITION BY user_id ORDER BY ts, event_id) AS gap FROM events) "
    "SELECT CAST(user_id AS BIGINT) AS user_id, quantile_cont(CAST(gap AS DOUBLE), 0.5) AS median_gap_us "
    "FROM g WHERE gap IS NOT NULL GROUP BY user_id"
)
QUERIES["user_interarrival_median"] = q_user_interarrival_median


def q_source_lang_lift(sf_dir: str):
    """Association LIFT between source and language — observed joint count
    against the independence expectation, emitted as the exact integer
    pair (n_joint·N, n_source·n_lang) so lift = left/right without any
    float crossing the engine boundary.  Three tiny grouped counts (joint,
    two marginals) and one broadcast decoration of the joint table."""
    docs = _read(sf_dir, "documents", columns=["source", "lang"]).materialize()
    joint = grouped_sum(docs, ["source", "lang"], {}, count_out="n_joint").materialize()
    src = grouped_sum(docs, ["source"], {}, count_out="n_src").to_pandas()
    lng = grouped_sum(docs, ["lang"], {}, count_out="n_lang").to_pandas()
    total = int(src["n_src"].sum())
    maps_ref = ray.put(
        (dict(zip(src["source"], src["n_src"].astype(int))), dict(zip(lng["lang"], lng["n_lang"].astype(int))), total)
    )

    def lift(b: pa.Table) -> pa.Table:
        s_map, l_map, n = ray.get(maps_ref)
        nj = b.column("n_joint").to_numpy(zero_copy_only=False).astype(np.int64)
        ns = np.array([s_map[s] for s in b.column("source").to_pylist()], dtype=np.int64)
        nl = np.array([l_map[t] for t in b.column("lang").to_pylist()], dtype=np.int64)
        return pa.table(
            {
                "source": b.column("source"),
                "lang": b.column("lang"),
                "obs_scaled": pa.array(nj * n, pa.int64()),
                "exp_scaled": pa.array(ns * nl, pa.int64()),
            }
        )

    return joint.map_batches(lift, batch_format="pyarrow")


ORACLE_SQL["source_lang_lift"] = (
    "WITH j AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS nj FROM documents GROUP BY 1, 2), "
    "s AS (SELECT source, CAST(count(*) AS BIGINT) AS ns FROM documents GROUP BY 1), "
    "l AS (SELECT lang, CAST(count(*) AS BIGINT) AS nl FROM documents GROUP BY 1), "
    "t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents) "
    "SELECT j.source, j.lang, CAST(j.nj * t.n AS BIGINT) AS obs_scaled, "
    "CAST(s.ns * l.nl AS BIGINT) AS exp_scaled "
    "FROM j JOIN s USING (source) JOIN l USING (lang), t"
)
QUERIES["source_lang_lift"] = q_source_lang_lift


def q_slow_orders_by_priority(sf_dir: str):
    """TPC-H Q4 shape (EXISTS semi join lowered to a pre-aggregated max):
    per order priority, how many orders have ANY lineitem shipping ≥ 60
    days after the order date.  EXISTS(l_shipdate ≥ o_orderdate + 60d)
    ⇔ max(l_shipdate) ≥ o_orderdate + 60d, so the lineitem side collapses
    to ONE grouped max per order key BEFORE the join — the semi join
    never sees lineitem fan-out (the partial-aggregation stance every
    wide step here takes)."""
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])

    def pmax(b: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table(
                {
                    "o_orderkey": b.column("l_orderkey").cast(pa.int64()),
                    "ship": b.column("l_shipdate").cast(pa.timestamp("us")).cast(pa.int64()),
                }
            ),
            ["o_orderkey"],
        ).aggregate([("ship", "max")])
        return pa.table({"o_orderkey": g.column("o_orderkey"), "ship_p": g.column("ship_max")})

    mx = li.map_batches(pmax, batch_format="pyarrow").groupby("o_orderkey").aggregate(Max("ship_p"))
    mx = mx.map_batches(lambda b: b.rename_columns(["o_orderkey", "max_ship"]), batch_format="pyarrow")
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    orders = orders.map_batches(
        lambda b: pa.table(
            {
                "o_orderkey": b.column("o_orderkey").cast(pa.int64()),
                "odate": b.column("o_orderdate").cast(pa.timestamp("us")).cast(pa.int64()),
                "o_orderpriority": b.column("o_orderpriority"),
            }
        ),
        batch_format="pyarrow",
    )
    j = join(orders, mx.materialize(), on="o_orderkey", how="left")

    def flags(b: pa.Table) -> pa.Table:
        ms = b.column("max_ship")
        late = pc.and_kleene(
            pc.is_valid(ms),
            pc.greater_equal(
                pc.coalesce(ms, pa.scalar(0, pa.int64())),
                pc.add(b.column("odate"), pa.scalar(60 * 86_400 * 1_000_000, pa.int64())),
            ),
        ).cast(pa.int64())
        return pa.table(
            {
                "o_orderpriority": b.column("o_orderpriority"),
                "n_orders": pa.array(np.ones(b.num_rows, np.int64)),
                "n_slow": late,
            }
        )

    agg = grouped_sum(j.map_batches(flags, batch_format="pyarrow"), ["o_orderpriority"], {"n_orders": "n_orders", "n_slow": "n_slow"})
    return _select(agg, ["o_orderpriority", "n_orders", "n_slow"])


ORACLE_SQL["slow_orders_by_priority"] = (
    "WITH m AS (SELECT l_orderkey AS o_orderkey, max(l_shipdate) AS max_ship "
    "FROM lineitem GROUP BY 1) "
    "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders, "
    "CAST(count(*) FILTER (m.max_ship >= o.o_orderdate + INTERVAL 60 DAY) AS BIGINT) AS n_slow "
    "FROM orders o LEFT JOIN m USING (o_orderkey) GROUP BY o_orderpriority"
)
QUERIES["slow_orders_by_priority"] = q_slow_orders_by_priority


def q_supplier_diversity(sf_dir: str):
    """TPC-H Q16 shape (distinct-count join with an excluded-supplier
    anti list): per (p_brand, p_size), how many DISTINCT suppliers ship
    the part — excluding suppliers in bad standing (s_acctbal < 0, the
    'complaints' analog), with partsupp evidence taken from lineitem.
    Distinct = one (brand, size, suppkey)-keyed dedup groupby before the
    counting groupby; the exclusion list is negative-balance suppliers,
    broadcast as an is_in mask (never a shuffle)."""
    bad = _read_table(sf_dir, "supplier", columns=["s_suppkey", "s_acctbal"])
    bad_keys = pa.array(
        bad.filter(pc.less(bad.column("s_acctbal"), 0.0)).column("s_suppkey").cast(pa.int64())
    )
    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    li = li.map_batches(
        lambda b: pa.table(
            {
                "p_partkey": b.column("l_partkey").cast(pa.int64()),
                "suppkey": b.column("l_suppkey").cast(pa.int64()),
            }
        ).filter(
            pc.invert(pc.is_in(b.column("l_suppkey").cast(pa.int64()), value_set=bad_keys))
        ),
        batch_format="pyarrow",
    )
    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"])
    part = part.map_batches(
        lambda b: pa.table(
            {
                "p_partkey": b.column("p_partkey").cast(pa.int64()),
                "p_brand": b.column("p_brand"),
                "p_size": b.column("p_size").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    j = join(li, part, on="p_partkey", how="inner")
    distinct = j.groupby(["p_brand", "p_size", "suppkey"]).aggregate(Count())
    cnt = distinct.groupby(["p_brand", "p_size"]).aggregate(Count())
    cnt = cnt.map_batches(
        lambda b: pa.table(
            {
                "p_brand": b.column("p_brand"),
                "p_size": b.column("p_size"),
                "supplier_cnt": b.column("count()").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    return _select(cnt, ["p_brand", "p_size", "supplier_cnt"])


ORACLE_SQL["supplier_diversity"] = (
    "SELECT p_brand, CAST(p_size AS BIGINT) AS p_size, "
    "CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt "
    "FROM lineitem JOIN part ON p_partkey = l_partkey "
    "WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) "
    "GROUP BY p_brand, p_size"
)
QUERIES["supplier_diversity"] = q_supplier_diversity


IDLE_ORDER_CAP = 4  # 'idle' = fewer than this many orders


def q_idle_rich_customers(sf_dir: str):
    """TPC-H Q22 shape (global-scalar threshold + order-count left join):
    per market segment, how many customers are 'idle rich' — balance
    above the average POSITIVE balance AND fewer than IDLE_ORDER_CAP
    orders — plus their combined balance, alongside the segment's total
    customer count (both sides emitted so the report is non-degenerate
    on busy data).  The average is a broadcast scalar in exact integer
    cents (sum_cents, n_pos), so the threshold compare is the
    cross-multiplied integer bal·n_pos > s_pos — no float mean drift;
    the per-customer order count is a pre-aggregated custkey-bounded
    table joined through the size-aware front door."""
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_acctbal", "c_mktsegment"])

    def cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": b.column("c_custkey").cast(pa.int64()),
                "bal_cents": pc.cast(pc.round(pc.multiply(b.column("c_acctbal"), 100.0)), pa.int64()),
                "c_mktsegment": b.column("c_mktsegment"),
            }
        )

    cds = cust.map_batches(cents, batch_format="pyarrow").materialize()
    # global scalar: (sum of positive balances in cents, count) — exact ints
    parts = [
        b
        for b in cds.map_batches(
            lambda b: pa.table(
                {
                    "s": pa.array(
                        [pc.sum(b.filter(pc.greater(b.column("bal_cents"), 0)).column("bal_cents")).as_py() or 0],
                        pa.int64(),
                    ),
                    "n": pa.array([pc.sum(pc.greater(b.column("bal_cents"), 0).cast(pa.int64())).as_py() or 0], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow")
    ]
    tot = pa.concat_tables(parts)
    s_pos = int(pc.sum(tot.column("s")).as_py() or 0)
    n_pos = int(pc.sum(tot.column("n")).as_py() or 0)
    # per-customer order counts (custkey-bounded, pre-aggregated)
    okeys = _read(sf_dir, "orders", columns=["o_custkey"]).groupby("o_custkey").aggregate(Count())
    okeys = okeys.map_batches(
        lambda b: pa.table(
            {
                "c_custkey": b.column("o_custkey").cast(pa.int64()),
                "n_orders_c": b.column("count()").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    j = join(cds, okeys.materialize(), on="c_custkey", how="left")

    def pick(b: pa.Table) -> pa.Table:
        nc = pc.coalesce(b.column("n_orders_c"), pa.scalar(0, pa.int64()))
        # bal > avg_pos ⇔ bal·n_pos > s_pos (n_pos > 0; exact integers)
        rich = pc.greater(pc.multiply(b.column("bal_cents"), n_pos), s_pos)
        idle = pc.less(nc, IDLE_ORDER_CAP)
        m = pc.and_(rich, idle).cast(pa.int64())
        return pa.table(
            {
                "c_mktsegment": b.column("c_mktsegment"),
                "n_customers": pa.array(np.ones(b.num_rows, np.int64)),
                "n_idle_rich": m,
                "idle_rich_bal_cents": pc.multiply(b.column("bal_cents"), m),
            }
        )

    agg = grouped_sum(
        j.map_batches(pick, batch_format="pyarrow"),
        ["c_mktsegment"],
        {
            "n_customers": "n_customers",
            "n_idle_rich": "n_idle_rich",
            "idle_rich_bal_cents": "idle_rich_bal_cents",
        },
    )
    return _select(agg, ["c_mktsegment", "n_customers", "n_idle_rich", "idle_rich_bal_cents"])


ORACLE_SQL["idle_rich_customers"] = (
    "WITH c AS (SELECT c_custkey, c_mktsegment, "
    "CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents FROM customer), "
    "t AS (SELECT CAST(sum(bal_cents) AS BIGINT) AS s_pos, "
    "CAST(count(*) AS BIGINT) AS n_pos FROM c WHERE bal_cents > 0), "
    "o AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS nc FROM orders GROUP BY 1), "
    "j AS (SELECT c.*, COALESCE(o.nc, 0) AS nc FROM c LEFT JOIN o ON o.o_custkey = c.c_custkey), "
    "f AS (SELECT c_mktsegment, bal_cents, CASE WHEN bal_cents * t.n_pos > t.s_pos "
    f"AND nc < {IDLE_ORDER_CAP} THEN 1 ELSE 0 END AS m FROM j, t) "
    "SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers, "
    "CAST(sum(m) AS BIGINT) AS n_idle_rich, "
    "CAST(sum(bal_cents * m) AS BIGINT) AS idle_rich_bal_cents "
    "FROM f GROUP BY c_mktsegment"
)
QUERIES["idle_rich_customers"] = q_idle_rich_customers


ANOMALY_K = 3  # MAD multiplier


def q_daily_anomalies(sf_dir: str, k: int = ANOMALY_K):
    """Time-series anomaly detection on the event stream (the ops-review
    shape: which DAYS were abnormal per event type): day totals in exact
    integer cents → per-type median and MAD (median absolute deviation,
    the robust spread) → flag days with |total − med| > k·MAD.

    Scale shape: ONE keyed shuffle builds the (type × day)-bounded
    day-total table (per-block partials first); the median/MAD/flag math
    runs on that bounded table driver-side — output-sized state, the
    union-find stance.  All arithmetic is integer (quantile_disc keeps
    the median an actual data element), so DuckDB replays bit-for-bit."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": b.column("event_type"),
                "day": pc.floor_temporal(b.column("ts"), unit="day").cast(pa.timestamp("us")),
                "cents": pc.cast(pc.round(pc.multiply(b.column("value"), 100.0)), pa.int64()),
            }
        )
        g = pa.TableGroupBy(t, ["event_type", "day"]).aggregate([("cents", "sum")])
        return g.rename_columns(["event_type", "day", "cents"])

    days = grouped_sum(
        ds.map_batches(prep, batch_format="pyarrow"), ["event_type", "day"], {"cents": "total_cents"}
    )
    t = pa.concat_tables(
        [b for b in days.iter_batches(batch_format="pyarrow") if b.num_rows]
        or [
            pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "day": pa.array([], pa.timestamp("us")),
                    "total_cents": pa.array([], pa.int64()),
                }
            )
        ]
    )
    if not t.num_rows:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "day": pa.array([], pa.timestamp("us")),
                "total_cents": pa.array([], pa.int64()),
                "abs_dev": pa.array([], pa.int64()),
                "is_outlier": pa.array([], pa.int64()),
            }
        )
    df = t.to_pandas()

    def q_disc(v: np.ndarray) -> int:
        s = np.sort(v)
        return int(s[int(np.floor((len(s) - 1) * 0.5))])  # quantile_disc(0.5)

    med = df.groupby("event_type")["total_cents"].apply(lambda v: q_disc(v.to_numpy()))
    df["med"] = df["event_type"].map(med)
    df["abs_dev"] = (df["total_cents"] - df["med"]).abs()
    mad = df.groupby("event_type")["abs_dev"].apply(lambda v: q_disc(v.to_numpy()))
    df["mad"] = df["event_type"].map(mad)
    df["is_outlier"] = (df["abs_dev"] > k * df["mad"]).astype("int64")
    out = df.sort_values(["event_type", "day"])
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "day": pa.array(out["day"].to_numpy(), pa.timestamp("us")),
            "total_cents": pa.array(out["total_cents"].to_numpy(), pa.int64()),
            "abs_dev": pa.array(out["abs_dev"].to_numpy(), pa.int64()),
            "is_outlier": pa.array(out["is_outlier"].to_numpy(), pa.int64()),
        }
    )


ORACLE_SQL["daily_anomalies"] = (
    "WITH d AS (SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, "
    "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents "
    "FROM events GROUP BY 1, 2), "
    "m AS (SELECT event_type, quantile_disc(total_cents, 0.5) AS med FROM d GROUP BY 1), "
    "dd AS (SELECT d.*, abs(d.total_cents - m.med) AS abs_dev FROM d JOIN m USING (event_type)), "
    "md AS (SELECT event_type, quantile_disc(abs_dev, 0.5) AS mad FROM dd GROUP BY 1) "
    "SELECT dd.event_type, dd.day, dd.total_cents, CAST(dd.abs_dev AS BIGINT) AS abs_dev, "
    f"CAST(CASE WHEN dd.abs_dev > {ANOMALY_K} * md.mad THEN 1 ELSE 0 END AS BIGINT) AS is_outlier "
    "FROM dd JOIN md USING (event_type)"
)
QUERIES["daily_anomalies"] = q_daily_anomalies


PSI_BINS = 10  # fixed-width value deciles for the drift report


def q_psi_drift(sf_dir: str, bins: int = PSI_BINS):
    """Population-Stability-Index drift report over the event stream: the
    value distribution of the stream's first half (by time midpoint) vs
    its second half, binned into fixed-width micro-value bins, with the
    per-bin PSI contribution in micro-nats (+1 smoothing so empty bins
    are defined).  The monitoring primitive that catches a silent
    upstream distribution change between two crawl/ingest windows —
    PSI > 0.2 is the classic retrain/alarm threshold.

    Two streaming passes: per-block (min, max) partials for the time
    midpoint + value range, then a grouped count by (window, bin); the
    PSI arithmetic runs on the bins-bounded table."""
    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def ranges(b: pa.Table) -> pa.Table:
        ts = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        vm = np.floor(b.column("value").to_numpy(zero_copy_only=False) * 1e6 + 0.5).astype(
            np.int64
        )
        return pa.table(
            {
                "t0": pa.array([int(ts.min())], pa.int64()),
                "t1": pa.array([int(ts.max())], pa.int64()),
                "v0": pa.array([int(vm.min())], pa.int64()),
                "v1": pa.array([int(vm.max())], pa.int64()),
            }
        )

    parts = pa.concat_tables(
        list(ds.map_batches(ranges, batch_format="pyarrow").iter_batches(batch_format="pyarrow"))
    )
    t0 = int(pc.min(parts.column("t0")).as_py())
    t1 = int(pc.max(parts.column("t1")).as_py())
    v0 = int(pc.min(parts.column("v0")).as_py())
    v1 = int(pc.max(parts.column("v1")).as_py())
    mid = (t0 + t1) // 2
    width = v1 - v0 + 1

    def assign(b: pa.Table) -> pa.Table:
        ts = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        vm = np.floor(b.column("value").to_numpy(zero_copy_only=False) * 1e6 + 0.5).astype(
            np.int64
        )
        return pa.table(
            {
                "late": pa.array((ts >= mid).astype(np.int64)),
                "bin": pa.array(np.minimum(bins - 1, (vm - v0) * bins // width)),
            }
        )

    g = (
        grouped_sum(ds.map_batches(assign, batch_format="pyarrow"), ["late", "bin"], {}, count_out="n")
        .to_pandas()
    )  # ≤ 2 × bins rows
    grid = np.zeros((2, bins), dtype=np.int64)
    for _, r in g.iterrows():
        grid[int(r["late"]), int(r["bin"])] = int(r["n"])
    na, nb = int(grid[0].sum()), int(grid[1].sum())
    pa_ = (grid[0] + 1.0) / (na + float(bins))
    pb_ = (grid[1] + 1.0) / (nb + float(bins))
    psi = np.floor((pa_ - pb_) * np.log(pa_ / pb_) * 1e6 + 0.5).astype(np.int64)
    return pa.table(
        {
            "bin": pa.array(np.arange(bins, dtype=np.int64)),
            "n_early": pa.array(grid[0]),
            "n_late": pa.array(grid[1]),
            "psi_micro": pa.array(psi),
        }
    )


ORACLE_SQL["psi_drift"] = (
    "WITH e AS (SELECT CAST(epoch_us(ts) AS BIGINT) AS tsu, "
    "CAST(round(value * 1000000) AS BIGINT) AS vm FROM events), "
    "r AS (SELECT min(tsu) AS t0, max(tsu) AS t1, min(vm) AS v0, max(vm) AS v1 FROM e), "
    "a AS (SELECT CASE WHEN tsu >= (t0 + t1) // 2 THEN 1 ELSE 0 END AS late, "
    f"least({PSI_BINS - 1}, (vm - v0) * {PSI_BINS} // (v1 - v0 + 1)) AS bin FROM e, r), "
    "g AS (SELECT bin, CAST(sum(CASE WHEN late = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_early, "
    "CAST(sum(CASE WHEN late = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_late FROM a GROUP BY bin), "
    f"bgrid AS (SELECT unnest(generate_series(0, {PSI_BINS - 1})) AS bin), "
    "filled AS (SELECT CAST(bgrid.bin AS BIGINT) AS bin, coalesce(n_early, 0) AS n_early, "
    "coalesce(n_late, 0) AS n_late FROM bgrid LEFT JOIN g ON g.bin = bgrid.bin), "
    "tot AS (SELECT sum(n_early) AS na, sum(n_late) AS nb FROM filled) "
    "SELECT bin, n_early, n_late, "
    f"CAST(floor(((n_early + 1.0) / (na + {float(PSI_BINS)}) - (n_late + 1.0) / (nb + {float(PSI_BINS)})) "
    f"* ln(((n_early + 1.0) / (na + {float(PSI_BINS)})) / ((n_late + 1.0) / (nb + {float(PSI_BINS)}))) "
    "* 1000000 + 0.5) AS BIGINT) AS psi_micro FROM filled, tot"
)
QUERIES["psi_drift"] = q_psi_drift


# ---------------------------------------------------------------------------
# TPC-H Q9 / Q11 / Q20 shapes (adapted: this corpus has no partsupp table,
# so supply-cost terms are dropped / availability terms become shipped-share
# predicates — the JOIN/aggregate/subquery-threshold shapes are intact).
# Completes the 22-of-22 TPC-H shape sweep.
# ---------------------------------------------------------------------------


def q_profit_by_nation_year(sf_dir: str, name_token: str = "blue"):
    """Q9 shape (product-type profit): lineitem filtered through a
    part-name semi-join (broadcast is_in — parts with ``name_token``),
    joined to orders for the year and supplier→nation for the group key;
    profit = Σ extendedprice·(1−discount) in exact integer cents.  Three
    joins through the size-aware front door; one (nation, year)
    groupby."""
    part = _read(sf_dir, "part", columns=["p_partkey", "p_name"])

    def pick(b: pa.Table) -> pa.Table:
        m = pc.match_substring(b.column("p_name"), name_token)
        return pa.table({"l_partkey": b.column("p_partkey").filter(m).cast(pa.int64())})

    keys = [
        i
        for b in part.map_batches(pick, batch_format="pyarrow").iter_batches(batch_format="pyarrow")
        for i in b.column("l_partkey").to_pylist()
    ]  # part-table-bounded (dimension), broadcast as an is_in set
    key_set = pa.array(sorted(keys), pa.int64())

    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(b.column("l_partkey").cast(pa.int64()), value_set=key_set))
        disc = pc.round(
            pc.multiply(
                pc.multiply(
                    b.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), b.column("l_discount"))
                ),
                pa.scalar(100.0),
            ),
            round_mode="half_towards_infinity",
        ).cast(pa.int64())
        return pa.table(
            {
                "l_orderkey": b.column("l_orderkey"),
                "l_suppkey": b.column("l_suppkey"),
                "profit_cents": disc,
            }
        )

    li = li.map_batches(prep, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])

    def oyear(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": b.column("o_orderkey"),
                "o_year": pc.year(b.column("o_orderdate")).cast(pa.int64()),
            }
        )

    j1 = join(li, orders.map_batches(oyear, batch_format="pyarrow"), on="l_orderkey", how="inner")
    sup = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    nat = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    snat = join(
        _rename(sup, {"s_suppkey": "l_suppkey"}),
        _rename(nat, {"n_nationkey": "s_nationkey"}),
        on="s_nationkey",
        how="inner",
    )
    j2 = join(j1, _select(snat, ["l_suppkey", "n_name"]), on="l_suppkey", how="inner")
    agg = grouped_sum(j2, ["n_name", "o_year"], {"profit_cents": "profit_cents"}, count_out="items")
    return _select(agg, ["n_name", "o_year", "items", "profit_cents"])


IMPORTANT_PAIR_MULTIPLE = 3  # pairs worth more than 3x the mean pair value


def q_important_part_suppliers(sf_dir: str, multiple: int = IMPORTANT_PAIR_MULTIPLE):
    """Q11 shape (important stock): revenue per (partkey, suppkey) pair,
    kept only when the pair exceeds a GLOBAL scalar threshold — the
    scalar-subquery shape.  The cut is scale-free (``multiple``× the
    mean pair value, so it bites at every sf) and exact-integer: the
    predicate is pair_cents·n_pairs > total_cents·multiple (no float
    share)."""
    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_extendedprice"])
    li = li.map_batches(
        lambda b: _cents(b, "l_extendedprice", "pc_").drop_columns(["l_extendedprice"]),
        batch_format="pyarrow",
    )
    pairs = grouped_sum(li, ["l_partkey", "l_suppkey"], {"pc_": "pair_cents"}).materialize()
    total = n_pairs = 0
    for b in pairs.iter_batches(batch_format="pyarrow"):
        total += int(pc.sum(b.column("pair_cents")).as_py() or 0)
        n_pairs += b.num_rows

    def keep(b: pa.Table) -> pa.Table:
        v = b.column("pair_cents").to_numpy(zero_copy_only=False).astype(object)
        m = pa.array([int(x) * n_pairs > total * multiple for x in v], pa.bool_())
        return b.filter(m)

    return pairs.map_batches(keep, batch_format="pyarrow")


DOMINANT_FAIR_MULTIPLE = 2  # supplier ships > 2x its fair (1/n-supplier) share


def q_dominant_suppliers(sf_dir: str, name_token: str = "cold", multiple: int = DOMINANT_FAIR_MULTIPLE):
    """Q20 shape (excess availability → semi-join on a quantity
    threshold): for parts whose name carries ``name_token``, suppliers
    whose shipped quantity exceeds ``multiple``× their FAIR share of the
    part's total (total/n_suppliers — scale-free, so the cut bites at
    every sf) — then the supplier dimension decorates the surviving
    keys.  Quantities are exact integer cents; the share predicate is
    pure integer cross-multiplication: pair·n_suppliers > total·m."""
    part = _read(sf_dir, "part", columns=["p_partkey", "p_name"])

    def pick(b: pa.Table) -> pa.Table:
        m = pc.match_substring(b.column("p_name"), name_token)
        return pa.table({"l_partkey": b.column("p_partkey").filter(m).cast(pa.int64())})

    keys = [
        i
        for b in part.map_batches(pick, batch_format="pyarrow").iter_batches(batch_format="pyarrow")
        for i in b.column("l_partkey").to_pylist()
    ]
    key_set = pa.array(sorted(keys), pa.int64())

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_quantity"])

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(b.column("l_partkey").cast(pa.int64()), value_set=key_set))
        return _cents(b, "l_quantity", "qty_cents").select(["l_partkey", "l_suppkey", "qty_cents"])

    li = li.map_batches(prep, batch_format="pyarrow")
    pair = grouped_sum(li, ["l_partkey", "l_suppkey"], {"qty_cents": "pair_qty"}).materialize()
    tot = grouped_sum(pair, ["l_partkey"], {"pair_qty": "part_qty"}, count_out="n_sup")
    j = join(pair, tot, on="l_partkey", how="inner")

    def keep(b: pa.Table) -> pa.Table:
        pq_ = b.column("pair_qty").to_numpy(zero_copy_only=False).astype(np.int64)
        tq = b.column("part_qty").to_numpy(zero_copy_only=False).astype(np.int64)
        ns = b.column("n_sup").to_numpy(zero_copy_only=False).astype(np.int64)
        m = pq_ * ns > tq * multiple
        return pa.table(
            {
                "l_partkey": b.column("l_partkey").filter(pa.array(m)),
                "l_suppkey": b.column("l_suppkey").filter(pa.array(m)),
                "pair_qty": pa.array(pq_[m]),
                "part_qty": pa.array(tq[m]),
            }
        )

    surv = j.map_batches(keep, batch_format="pyarrow")
    sup = _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    out = join(surv, _rename(sup, {"s_suppkey": "l_suppkey"}), on="l_suppkey", how="inner")
    return _select(out, ["l_partkey", "l_suppkey", "s_name", "pair_qty", "part_qty"])


QUERIES["profit_by_nation_year"] = q_profit_by_nation_year
QUERIES["important_part_suppliers"] = q_important_part_suppliers
QUERIES["dominant_suppliers"] = q_dominant_suppliers

ORACLE_SQL["profit_by_nation_year"] = (
    "SELECT n.n_name, CAST(year(o.o_orderdate) AS BIGINT) AS o_year, "
    "CAST(count(*) AS BIGINT) AS items, "
    "CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS profit_cents "
    "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey "
    "JOIN orders o ON o.o_orderkey = l.l_orderkey "
    "JOIN supplier s ON s.s_suppkey = l.l_suppkey "
    "JOIN nation n ON n.n_nationkey = s.s_nationkey "
    "WHERE p.p_name LIKE '%blue%' "
    "GROUP BY n.n_name, year(o.o_orderdate)"
)
ORACLE_SQL["important_part_suppliers"] = (
    "WITH pr AS (SELECT l_partkey, l_suppkey, "
    "SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS pair_cents "
    "FROM lineitem GROUP BY l_partkey, l_suppkey), "
    "t AS (SELECT SUM(pair_cents) AS total, COUNT(*) AS n FROM pr) "
    "SELECT l_partkey, l_suppkey, CAST(pair_cents AS BIGINT) AS pair_cents FROM pr, t "
    f"WHERE CAST(pair_cents AS HUGEINT) * t.n > t.total * {IMPORTANT_PAIR_MULTIPLE}"
)
ORACLE_SQL["dominant_suppliers"] = (
    "WITH li AS (SELECT l_partkey, l_suppkey, "
    "CAST(round(l_quantity * 100) AS BIGINT) AS qc FROM lineitem "
    "WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%cold%')), "
    "pr AS (SELECT l_partkey, l_suppkey, SUM(qc) AS pair_qty FROM li GROUP BY l_partkey, l_suppkey), "
    "t AS (SELECT l_partkey, SUM(pair_qty) AS part_qty, COUNT(*) AS n_sup FROM pr GROUP BY l_partkey) "
    "SELECT pr.l_partkey, pr.l_suppkey, s.s_name, "
    "CAST(pr.pair_qty AS BIGINT) AS pair_qty, CAST(t.part_qty AS BIGINT) AS part_qty "
    "FROM pr JOIN t USING (l_partkey) JOIN supplier s ON s.s_suppkey = pr.l_suppkey "
    f"WHERE CAST(pr.pair_qty AS HUGEINT) * t.n_sup > CAST(t.part_qty AS HUGEINT) * {DOMINANT_FAIR_MULTIPLE}"
)


def q_table_analyze(sf_dir: str):
    """ANALYZE-style optimizer statistics over the documents table: per
    column, row count, null count, exact distinct count, and min/max
    rendered as VARCHAR (the stats a cost-based planner or a data-quality
    monitor collects before scheduling a 100-TB scan).

    Shape: null/min/max ride ONE streaming pass of per-block partials
    (pyarrow aggregate kernels) folded on the driver (4 numbers per
    block); each distinct count is a key-sized groupby-count (exact —
    the production path for high-cardinality columns is the certified
    HLL in approx_distinct_users_by_type; doc_id's ndv equals the row
    count and a planner would special-case primary keys)."""
    cols = ["doc_id", "lang", "source", "n_chars"]
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=cols)

    def partial(b: pa.Table) -> pa.Table:
        row = {"n": pa.array([b.num_rows], pa.int64())}
        for c in cols:
            col = b.column(c)
            row[f"nulls_{c}"] = pa.array([col.null_count], pa.int64())
            mn = pc.min_max(col)
            row[f"min_{c}"] = pa.array([str(mn["min"].as_py())], pa.string())
            row[f"max_{c}"] = pa.array([str(mn["max"].as_py())], pa.string())
        return pa.table(row)

    n = 0
    nulls = {c: 0 for c in cols}
    mins: dict = {}
    maxs: dict = {}
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for i in range(b.num_rows):
            n += b.column("n")[i].as_py()
            for c in cols:
                nulls[c] += b.column(f"nulls_{c}")[i].as_py()
                lo, hi = b.column(f"min_{c}")[i].as_py(), b.column(f"max_{c}")[i].as_py()
                # fold as the ORIGINAL type ordering: numeric cols compare
                # numerically, strings lexically
                key = (int(lo), int(hi)) if c in ("doc_id", "n_chars") else (lo, hi)
                if c not in mins or key[0] < mins[c][0]:
                    mins[c] = (key[0], lo)
                if c not in maxs or key[1] > maxs[c][0]:
                    maxs[c] = (key[1], hi)

    ndv = {}
    for c in cols:
        ndv[c] = ds.groupby(c).count().count()

    return pa.table(
        {
            "column": pa.array(cols, pa.string()),
            "n": pa.array([n] * len(cols), pa.int64()),
            "n_nulls": pa.array([nulls[c] for c in cols], pa.int64()),
            "n_distinct": pa.array([ndv[c] for c in cols], pa.int64()),
            "min_str": pa.array([mins[c][1] for c in cols], pa.string()),
            "max_str": pa.array([maxs[c][1] for c in cols], pa.string()),
        }
    )


ORACLE_SQL["table_analyze"] = " UNION ALL ".join(
    "SELECT '{c}' AS \"column\", CAST(count(*) AS BIGINT) AS n, "
    "CAST(count(*) - count({c}) AS BIGINT) AS n_nulls, "
    "CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct, "
    "CAST(min({c}) AS VARCHAR) AS min_str, CAST(max({c}) AS VARCHAR) AS max_str "
    "FROM documents".format(c=c)
    for c in ("doc_id", "lang", "source", "n_chars")
)
QUERIES["table_analyze"] = q_table_analyze


def q_daily_cusum(sf_dir: str):
    """CUSUM change-point detection over daily event value totals — the
    classic mean-shift monitor beside psi_drift's distribution monitor:
    with daily micro-value sums x_i and grand total S over n days, the
    demeaned cumulative sum scaled by n is C_k = Σ_{i≤k} (n·x_i − S) —
    all integer, no division — and the change-point is the day of max
    |C_k| (ties → earliest day).  Output: per-day (day, x_micro,
    cusum_scaled, is_changepoint).

    One day-keyed grouped sum over the stream; the CUSUM scan runs on
    the days-bounded table."""
    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def slim(b: pa.Table) -> pa.Table:
        ts = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        vm = np.floor(b.column("value").to_numpy(zero_copy_only=False) * 1e6 + 0.5).astype(
            np.int64
        )
        return pa.table(
            {
                "day": pa.array(ts // 86_400_000_000, pa.int64()),
                "vm": pa.array(vm),
            }
        )

    g = (
        grouped_sum(ds.map_batches(slim, batch_format="pyarrow"), ["day"], {"vm": "x"})
        .to_pandas()
        .sort_values("day")
    )
    x = g["x"].astype(int).to_numpy()
    days = g["day"].astype(int).to_numpy()
    n = len(x)
    S = int(x.sum())
    c = np.cumsum(n * x.astype(object) - S)  # object → Python ints, no overflow
    absmax = max(abs(int(v)) for v in c) if n else 0
    flags = np.zeros(n, dtype=np.int64)
    for i, v in enumerate(c):  # days-bounded
        if abs(int(v)) == absmax:
            flags[i] = 1
            break
    return pa.table(
        {
            "day": pa.array(days, pa.int64()),
            "x_micro": pa.array(x, pa.int64()),
            "cusum_scaled": pa.array([int(v) for v in c], pa.int64()),
            "is_changepoint": pa.array(flags),
        }
    )


ORACLE_SQL["daily_cusum"] = (
    "WITH d AS (SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day, "
    "CAST(round(value * 1000000) AS BIGINT) AS vm FROM events), "
    "g AS (SELECT day, CAST(sum(vm) AS BIGINT) AS x FROM d GROUP BY day), "
    "t AS (SELECT CAST(count(*) AS HUGEINT) AS n, CAST(sum(x) AS HUGEINT) AS s FROM g), "
    "c AS (SELECT day, x, CAST(sum(t.n * x - t.s) OVER (ORDER BY day "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT) AS cs FROM g, t), "
    "m AS (SELECT max(abs(cs)) AS am FROM c), "
    "f AS (SELECT min(day) AS cp FROM c, m WHERE abs(cs) = m.am) "
    "SELECT c.day, c.x AS x_micro, CAST(c.cs AS BIGINT) AS cusum_scaled, "
    "CAST(CASE WHEN c.day = f.cp THEN 1 ELSE 0 END AS BIGINT) AS is_changepoint "
    "FROM c, f"
)
QUERIES["daily_cusum"] = q_daily_cusum
