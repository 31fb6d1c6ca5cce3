"""SQL front door: parser contract + compiled-pipeline ≡ DuckDB on
ad-hoc queries beyond the canned certified set."""

import duckdb
import pandas as pd
import pytest

from fscrawler_ray.pipelines.sqlfront import SqlError, parse, sql_query

SF = "/root/testdata/sf0.001"


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("orders", "lineitem", "customer", "documents", "events"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.sql(sql).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _run(sql: str) -> pd.DataFrame:
    out = sql_query(SF, sql)
    return out.to_pandas() if not isinstance(out, pd.DataFrame) else out


@pytest.mark.parametrize(
    "sql",
    [
        # each exercises a different lowering path than the canned set
        "SELECT event_type, count(*) AS n FROM events GROUP BY event_type",
        "SELECT user_id, max(value) AS mx, min(value) AS lo, count(*) AS n "
        "FROM events WHERE value >= 10 AND event_type = 'view' GROUP BY user_id",
        "SELECT doc_id, lang FROM documents WHERE n_chars > 400 ORDER BY doc_id LIMIT 7",
        "SELECT count(*) AS n FROM customer WHERE c_mktsegment <> 'BUILDING'",
        "SELECT l_linestatus, sum(l_quantity) AS q FROM lineitem GROUP BY l_linestatus "
        "ORDER BY q DESC",
    ],
)
def test_adhoc_equivalence(sql):
    got, want = _norm(_run(sql)), _norm(_duck(sql))
    pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=1e-12)


def test_parser_rejects_garbage():
    for bad in (
        "DELETE FROM orders",
        "SELECT * FROM orders",                          # bare * unsupported
        "SELECT sum(x) FROM orders",                     # aggregate without alias
        "SELECT a, sum(b) AS s FROM orders",             # bare col without GROUP BY
        "SELECT a FROM nope_table",
        "SELECT a FROM orders WHERE a LIKE 'x'",         # unsupported operator
        "SELECT a FROM orders; DROP TABLE orders",       # trailing tokens
    ):
        with pytest.raises(SqlError):
            plan = parse(bad)
            # some plans only fail at semantic checks inside parse; if
            # parse returned, force the failure explicitly
            raise SqlError(f"accepted: {plan}")


def test_parser_plan_shape():
    p = parse(
        "SELECT lang, count(*) AS n FROM documents WHERE n_chars >= 10 "
        "AND lang <> 'de' GROUP BY lang ORDER BY n DESC, lang LIMIT 3"
    )
    assert p["table"] == "documents"
    assert p["where"] == [("n_chars", ">=", 10), ("lang", "<>", "de")]
    assert p["group"] == ["lang"]
    assert p["order"] == [("n", True), ("lang", False)]
    assert p["limit"] == 3


@pytest.mark.parametrize(
    "sql",
    [
        # join paths beyond the canned set: qualified refs, global agg
        # over a join, avg with nulls on the probe side
        "SELECT count(*) AS n, max(o_totalprice) AS mx FROM orders "
        "JOIN customer ON customer.c_custkey = orders.o_custkey "
        "WHERE c_mktsegment = 'MACHINERY'",
        "SELECT c_mktsegment, avg(o_totalprice) AS ap FROM orders "
        "JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment "
        "ORDER BY c_mktsegment",
        "SELECT event_type, avg(value) AS av, count(*) AS n FROM events "
        "GROUP BY event_type ORDER BY event_type",
    ],
)
def test_join_avg_equivalence(sql):
    got, want = _norm(_run(sql)), _norm(_duck(sql))
    pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=1e-12)


def test_join_on_order_normalized():
    """ON a.x = b.y and ON b.y = a.x compile to the same plan."""
    a = parse("SELECT o_orderkey FROM orders JOIN customer ON o_custkey = c_custkey")
    b = parse("SELECT o_orderkey FROM orders JOIN customer ON c_custkey = o_custkey")
    assert a["join"]["table"] == b["join"]["table"] == "customer"
    assert set(a["join"]["on"]) == set(b["join"]["on"])


def test_having_equivalence_and_guard():
    sql = (
        "SELECT lang, count(*) AS n FROM documents GROUP BY lang "
        "HAVING n > 5 AND lang <> 'de' ORDER BY lang"
    )
    got, want = _norm(_run(sql)), _norm(_duck(sql))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    with pytest.raises(SqlError):
        parse("SELECT doc_id FROM documents HAVING doc_id > 3")  # no GROUP BY
    with pytest.raises(SqlError):
        parse(
            "SELECT lang, count(*) AS n FROM documents GROUP BY lang HAVING zz > 1"
        )  # unknown alias


def test_distinct_equivalence_and_guard():
    sql = "SELECT DISTINCT event_type FROM events WHERE value > 50 ORDER BY event_type"
    got, want = _norm(_run(sql)), _norm(_duck(sql))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    with pytest.raises(SqlError):
        parse("SELECT DISTINCT lang, count(*) AS n FROM documents GROUP BY lang")


def test_explain_plan_decisions():
    """EXPLAIN pins the compiler's physical decisions: per-side
    pushdown assignment, broadcast choice for a small join side, driver
    vs distributed ordering."""
    from fscrawler_ray.pipelines.sqlfront import explain

    e = explain(
        SF,
        "SELECT c_mktsegment, count(*) AS n FROM orders "
        "JOIN customer ON o_custkey = c_custkey "
        "WHERE o_totalprice > 1000 AND c_mktsegment <> 'AUTO' "
        "GROUP BY c_mktsegment ORDER BY n DESC",
    ).to_pandas()
    steps = dict(zip(e["step"] + ":" + e["detail"], [1] * len(e)))
    details = {s: d for s, d in zip(e["step"], e["detail"])}
    assert details["join_strategy"] == "broadcast"  # customer.parquet ≪ 64 MB
    pd_rows = e[e["step"] == "pushdown"]["detail"].tolist()
    assert any(d.startswith("orders:") and "o_totalprice" in d for d in pd_rows)
    assert any(d.startswith("customer:") and "c_mktsegment" in d for d in pd_rows)
    assert details["order"] == "driver (output-sized)"

    e2 = explain(SF, "SELECT doc_id FROM documents ORDER BY doc_id LIMIT 5").to_pandas()
    d2 = {s: d for s, d in zip(e2["step"], e2["detail"])}
    assert d2["order"] == "distributed sort" and d2["limit"] == "5"


def test_grammar_fuzz_equivalence():
    """Seeded grammar fuzz: randomly composed queries from the dialect
    agree with DuckDB on every run (the generalization evidence beyond
    hand-picked cases)."""
    import random

    rng = random.Random(20260821)
    int_cols = {"documents": ["doc_id", "n_chars"], "events": ["event_id", "user_id"]}
    str_cols = {"documents": ["lang", "source"], "events": ["event_type"]}
    dbl_cols = {"documents": [], "events": ["value"]}

    def gen(table: str) -> str:
        s = str_cols[table]
        i = int_cols[table]
        d = dbl_cols[table]
        key = rng.choice(s)
        aggs = [f"count(*) AS n"]
        if d and rng.random() < 0.7:
            c = rng.choice(d)
            aggs.append(f"{rng.choice(['sum', 'min', 'max', 'avg'])}({c}) AS a1")
        if rng.random() < 0.5:
            aggs.append(f"{rng.choice(['min', 'max'])}({rng.choice(i)}) AS a2")
        conds = []
        if rng.random() < 0.8:
            conds.append(f"{rng.choice(i)} {rng.choice(['<', '>', '<=', '>='])} {rng.randrange(1000)}")
        if rng.random() < 0.4:
            conds.append(f"{rng.choice(s)} <> 'zzz'")
        q = f"SELECT {key}, {', '.join(aggs)} FROM {table}"
        if conds:
            q += " WHERE " + " AND ".join(conds)
        q += f" GROUP BY {key}"
        if rng.random() < 0.4:
            q += " HAVING n >= 1"
        q += f" ORDER BY {key}"
        return q

    for _ in range(6):
        sql = gen(rng.choice(["documents", "events"]))
        got, want = _norm(_run(sql)), _norm(_duck(sql))
        pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=1e-12), sql


def test_window_rank_equivalence_and_guards():
    sql = (
        "SELECT user_id, event_id, row_number() OVER (PARTITION BY user_id "
        "ORDER BY value DESC, event_id) AS r FROM events "
        "WHERE value > 20 QUALIFY r <= 3 ORDER BY user_id, r LIMIT 60"
    )
    got, want = _norm(_run(sql)), _norm(_duck(sql))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    with pytest.raises(SqlError):
        parse("SELECT count(*) AS n, row_number() OVER (PARTITION BY a ORDER BY b) AS r FROM events")
    with pytest.raises(SqlError):
        parse("SELECT event_id FROM events QUALIFY r <= 2")  # no window item


def test_left_join_semantics():
    """LEFT JOIN: right-side WHERE predicates apply POST-join (SQL's
    NULL-drop semantics), left-side predicates still push down; count(col)
    is NULL-correct."""
    sql = (
        "SELECT c_custkey, count(o_orderkey) AS n FROM customer "
        "LEFT JOIN orders ON c_custkey = o_custkey "
        "WHERE c_acctbal > 0 GROUP BY c_custkey ORDER BY c_custkey LIMIT 40"
    )
    got, want = _norm(_run(sql)), _norm(_duck(sql))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # a right-side predicate turns unmatched rows into drops, like SQL
    sql2 = (
        "SELECT c_custkey, count(*) AS n FROM customer "
        "LEFT JOIN orders ON c_custkey = o_custkey "
        "WHERE o_totalprice > 100000 GROUP BY c_custkey ORDER BY c_custkey LIMIT 40"
    )
    got2, want2 = _norm(_run(sql2)), _norm(_duck(sql2))
    pd.testing.assert_frame_equal(got2, want2, check_dtype=False)


def test_count_distinct_equivalence():
    for sql in (
        "SELECT lang, count(DISTINCT source) AS s, count(*) AS n FROM documents "
        "GROUP BY lang ORDER BY lang",
        "SELECT count(DISTINCT user_id) AS u FROM events WHERE value > 10",
    ):
        got, want = _norm(_run(sql)), _norm(_duck(sql))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    with pytest.raises(SqlError):
        parse("SELECT sum(DISTINCT value) AS s FROM events")


def test_between_equivalence():
    sql = (
        "SELECT event_type, count(*) AS n FROM events "
        "WHERE value BETWEEN 25 AND 75 AND event_type <> 'error' "
        "GROUP BY event_type ORDER BY event_type"
    )
    got, want = _norm(_run(sql)), _norm(_duck(sql))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_in_list_equivalence():
    sql = (
        "SELECT event_type, count(*) AS n FROM events "
        "WHERE event_type IN ('view', 'click') AND value > 5 "
        "GROUP BY event_type ORDER BY event_type"
    )
    got, want = _norm(_run(sql)), _norm(_duck(sql))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
