"""grouped_quantile_disc: exact parity with DuckDB's quantile_disc under
forced histogram narrowing, duplicates, constant groups, and singletons."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray

from fscrawler_ray.functions.quantiles import grouped_quantile_disc, _rank_of


def _duck_disc(keys, vals, q):
    con = duckdb.connect()
    con.register("t", pa.table({"k": keys, "v": vals}))
    return dict(
        con.execute(f"SELECT k, quantile_disc(v, {q}) FROM t WHERE v IS NOT NULL GROUP BY k").fetchall()
    )


def _engine_disc(keys, vals, q_num, q_den, **kw):
    ds = ray.data.from_arrow(pa.table({"k": keys, "v": vals})).repartition(7)
    t = grouped_quantile_disc(ds, "k", "v", q_num, q_den, **kw)
    return dict(zip(t.column("k").to_pylist(), t.column("q_value").to_pylist()))


def test_rank_convention_matches_duckdb():
    # quantile_disc = sorted[ceil(q*n)-1], exact rational arithmetic
    con = duckdb.connect()
    for n in (1, 2, 3, 4, 5, 10, 11, 97):
        for q_num, q_den in ((1, 2), (9, 10), (1, 4), (99, 100), (1, 1)):
            vals = list(range(1, n + 1))
            got = con.execute(
                f"SELECT quantile_disc(x, {q_num}/{q_den}::DECIMAL(18,6)) FROM (SELECT unnest({vals}) AS x)"
            ).fetchone()[0]
            assert vals[_rank_of(q_num, q_den, n) - 1] == got, (n, q_num, q_den)


def test_grouped_quantile_random_parity():
    rng = np.random.default_rng(7)
    n = 5000
    keys = rng.choice(["a", "b", "c", "d"], size=n).tolist()
    vals = np.round(rng.normal(100, 30, size=n), 2)
    for q_num, q_den in ((1, 2), (9, 10), (1, 10)):
        want = _duck_disc(keys, vals, f"{q_num}/{q_den}::DECIMAL(18,6)")
        got = _engine_disc(keys, vals, q_num, q_den)
        assert got == pytest.approx(want)


def test_forced_narrowing_is_exact():
    """collect_limit far below the group size forces ≥1 histogram pass;
    duplicates pile mass into single bins."""
    rng = np.random.default_rng(11)
    n = 20000
    keys = rng.choice(["x", "y"], size=n).tolist()
    # heavy duplicates: only 50 distinct values
    vals = rng.choice(np.round(rng.uniform(0, 1000, 50), 1), size=n)
    want = _duck_disc(keys, vals, "0.9")
    got = _engine_disc(keys, vals, 9, 10, collect_limit=200, n_bins=16, max_levels=6)
    assert got == pytest.approx(want)


def test_constant_group_and_singleton():
    keys = ["c"] * 1000 + ["s"]
    vals = [42.0] * 1000 + [7.0]
    got = _engine_disc(keys, vals, 1, 2, collect_limit=10, n_bins=8)
    assert got == {"c": 42.0, "s": 7.0}


def test_nulls_ignored_and_all_null_group_dropped():
    keys = ["a"] * 4 + ["z"] * 3
    vals = [1.0, None, 3.0, 2.0] + [None, None, None]
    got = _engine_disc(keys, vals, 1, 2)
    assert got == {"a": 2.0}


def test_heavy_duplicates_resolve_without_collection():
    # a bin holding ONE distinct value resolves via the min==max shortcut,
    # even when its count far exceeds collect_limit
    keys = ["k"] * 5000
    vals = [1.0] * 2500 + [2.0] * 2500
    got = _engine_disc(keys, vals, 1, 2, collect_limit=100, n_bins=4, max_levels=3)
    assert got == {"k": 1.0}  # rank ceil(0.5*5000)=2500 → last 1.0


def test_collect_limit_violation_raises():
    keys = ["k"] * 5000
    vals = np.linspace(0.0, 1.0, 5000)
    with pytest.raises(RuntimeError, match="collect_limit"):
        _engine_disc(keys, vals, 1, 2, collect_limit=100, n_bins=4, max_levels=0)


def test_value_outliers_matches_oracle_sf0001():
    from fscrawler_ray.pipelines.analytics import ORACLE_SQL, q_value_outliers

    t = q_value_outliers("/root/testdata/sf0.001")
    df = t.to_pandas().sort_values("event_type").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet('/root/testdata/sf0.001/events.parquet')"
    )
    want = con.execute(ORACLE_SQL["value_outliers"]).fetchdf().sort_values("event_type").reset_index(drop=True)
    assert df["event_type"].tolist() == want["event_type"].tolist()
    assert df["p90"].tolist() == pytest.approx(want["p90"].tolist(), abs=0)
    assert df["n_above"].tolist() == want["n_above"].tolist()


def test_doc_deciles_tie_ladder_matches_duckdb(tmp_path):
    """Duplicated threshold values: the searchsorted ladder must match the
    SQL CASE ladder exactly (first-match wins)."""
    import pyarrow.parquet as pq

    rng = np.random.default_rng(2)
    n = 400
    # heavy ties: only 7 distinct lengths
    chars = rng.choice([10, 20, 20, 30, 50, 80, 130], size=n).astype("int64")
    t = pa.table({"doc_id": pa.array(range(n), pa.int64()), "n_chars": chars,
                  "text": pa.array(["x"] * n), "lang": pa.array(["en"] * n),
                  "source": pa.array(["s"] * n)})
    pq.write_table(t, tmp_path / "documents.parquet")

    from fscrawler_ray.pipelines.analytics import ORACLE_SQL, q_doc_deciles

    got = q_doc_deciles(str(tmp_path)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')")
    want = con.execute(ORACLE_SQL["doc_deciles"]).fetchdf().sort_values("doc_id").reset_index(drop=True)
    assert got["decile"].tolist() == want["decile"].tolist()


def test_empty_input_preserves_int_key_dtype():
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2], pa.int64()), "v": pa.array([None, None], pa.float64())})
    )
    t = grouped_quantile_disc(ds, "k", "v", 1, 2)
    assert t.num_rows == 0
    assert t.schema.field("k").type == pa.int64()


from hypothesis import given, settings, strategies as st


@settings(max_examples=12, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.sampled_from(["g1", "g2", "g3"]),
            st.one_of(
                st.integers(-1000, 1000).map(float),
                st.sampled_from([0.5, -7.25, 123.75]),  # exact-binary repeats → ties
            ),
        ),
        min_size=1,
        max_size=300,
    ),
    q=st.sampled_from([(1, 2), (9, 10), (1, 10), (3, 4), (1, 1)]),
)
def test_grouped_quantile_fuzz_vs_duckdb(data, q):
    keys = [k for k, _ in data]
    vals = [v for _, v in data]
    want = _duck_disc(keys, vals, f"{q[0]}/{q[1]}::DECIMAL(18,6)")
    got = _engine_disc(keys, vals, q[0], q[1], collect_limit=16, n_bins=8, max_levels=8)
    assert got == want
