"""SQL front door: compile a restricted SQL dialect straight into Ray
Data pipelines.

The reference exposes its engine only through Python entry points
(SURVEY §3); real users of a data engine ask for SQL.  This module
parses a small deterministic dialect —

    SELECT [DISTINCT] item [, item]*
    FROM table [[LEFT] JOIN table2 ON key1 = key2]
    [WHERE cond [AND cond]*]
    [GROUP BY col [, col]*]
    [HAVING cond [AND cond]*]
    [QUALIFY rank_alias op int]
    [ORDER BY key [ASC|DESC] [, key ...]]
    [LIMIT n]

    item  := col | agg(col) AS alias | count(*) AS alias
           | count(DISTINCT col) AS alias
           | row_number() OVER (PARTITION BY col
                                ORDER BY key [DESC] [, ...]) AS alias
    agg   := sum | min | max | count | avg
    cond  := col op literal        op ∈ {=, <>, <, <=, >, >=}
           | col BETWEEN lit AND lit
           | col IN (lit [, lit]*)

Identifiers may be table-qualified (``orders.o_custkey``); the
qualifier is stripped (column names are unique across the schema).
The equi-join lowers through the size-aware joins front door
(broadcast below the threshold, co-partitioned shuffle above), with
single-table WHERE conjuncts PUSHED DOWN below the join so doomed
rows never shuffle.  ``avg`` lowers to exact grouped sum ÷ non-null
count — the identical IEEE division DuckDB's avg performs.

— and lowers it onto the engine's own scale-shaped primitives:

- column pruning at the read (only referenced columns leave storage);
- WHERE as ONE vectorized pyarrow mask per batch (zero shuffles);
- GROUP BY sums/counts through analytics.grouped_sum (per-block
  partial aggregation, the push-partials rule) and min/max through
  Ray's grouped aggregate;
- ORDER BY / LIMIT as Dataset.sort + limit (distributed sample sort).

The certification story is the strongest in the repo: the DuckDB
oracle for a front-door query IS THE QUERY ITSELF — no translation
layer to trust, byte-identical semantics or the driver flags it.

Scale posture: everything is streaming map_batches + the engine's
existing partial-agg groupby; the only materialization is the final
result (output-sized by construction for aggregate queries; projection
queries stream to the caller as a Dataset).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

import ray

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

_AGGS = ("sum", "min", "max", "count", "avg")

_TOKEN = re.compile(
    r"\s*(?:(?P<str>'(?:[^']|'')*')|(?P<num>-?\d+\.?\d*)|(?P<op><>|<=|>=|[=<>(),*.])"
    r"|(?P<word>[A-Za-z_][A-Za-z_0-9]*))"
)


class SqlError(ValueError):
    pass


def _tokenize(sql: str) -> list[tuple[str, str]]:
    out = []
    i = 0
    while i < len(sql):
        m = _TOKEN.match(sql, i)
        if not m:
            if sql[i:].strip() == "":
                break
            raise SqlError(f"cannot tokenize at: {sql[i:i+20]!r}")
        i = m.end()
        for kind in ("str", "num", "op", "word"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    return out


class _P:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self) -> tuple[str, str] | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> tuple[str, str]:
        t = self.peek()
        if t is None:
            raise SqlError("unexpected end of query")
        self.i += 1
        return t

    def kw(self, *words: str) -> bool:
        """Consume the keyword sequence if present (case-insensitive)."""
        save = self.i
        for w in words:
            t = self.peek()
            if t is None or t[0] != "word" or t[1].lower() != w:
                self.i = save
                return False
            self.i += 1
        return True

    def expect_word(self) -> str:
        k, v = self.next()
        if k != "word":
            raise SqlError(f"expected identifier, got {v!r}")
        return v

    def expect_op(self, op: str) -> None:
        k, v = self.next()
        if k != "op" or v != op:
            raise SqlError(f"expected {op!r}, got {v!r}")

    def ident(self) -> str:
        """A possibly table-qualified identifier; the qualifier is
        stripped (column names are unique across the test schema)."""
        name = self.expect_word()
        if self.peek() == ("op", "."):
            self.next()
            name = self.expect_word()
        return name


def parse(sql: str) -> dict:
    """Parse the restricted grammar into a plan dict."""
    p = _P(_tokenize(sql))
    if not p.kw("select"):
        raise SqlError("query must start with SELECT")
    distinct = p.kw("distinct")
    items: list[dict] = []
    while True:
        k, v = p.next()
        if k == "word" and v.lower() == "row_number" and p.peek() == ("op", "("):
            p.expect_op("(")
            p.expect_op(")")
            if not p.kw("over"):
                raise SqlError("row_number() needs OVER (...)")
            p.expect_op("(")
            if not p.kw("partition", "by"):
                raise SqlError("OVER needs PARTITION BY")
            part_col = p.ident()
            if not p.kw("order", "by"):
                raise SqlError("OVER needs ORDER BY")
            wkeys: list[tuple[str, bool]] = []
            while True:
                wc = p.ident()
                wd = False
                if p.kw("desc"):
                    wd = True
                elif p.kw("asc"):
                    pass
                wkeys.append((wc, wd))
                if p.peek() == ("op", ","):
                    p.next()
                    continue
                break
            p.expect_op(")")
            if not p.kw("as"):
                raise SqlError("row_number() needs an AS alias")
            alias = p.expect_word()
            items.append(
                {
                    "kind": "winrank",
                    "part": part_col,
                    "keys": wkeys,
                    "alias": alias,
                }
            )
        elif k == "word" and v.lower() in _AGGS and p.peek() == ("op", "("):
            fn = v.lower()
            p.expect_op("(")
            nk, nv = p.next()
            distinct_agg = False
            if nk == "word" and nv.lower() == "distinct":
                if fn != "count":
                    raise SqlError(f"{fn}(DISTINCT ...) is unsupported")
                distinct_agg = True
                nk, nv = p.next()
            if nv == "*":
                if fn != "count" or distinct_agg:
                    raise SqlError(f"{fn}(*) is not a thing")
                col = "*"
            elif nk == "word":
                col = nv
                if p.peek() == ("op", "."):
                    p.next()
                    col = p.expect_word()
            else:
                raise SqlError(f"expected column in {fn}(...), got {nv!r}")
            p.expect_op(")")
            if not p.kw("as"):
                raise SqlError(f"aggregate {fn}({col}) needs an AS alias")
            alias = p.expect_word()
            items.append(
                {
                    "kind": "agg",
                    "fn": "count_distinct" if distinct_agg else fn,
                    "col": col,
                    "alias": alias,
                }
            )
        elif k == "word":
            col = v
            if p.peek() == ("op", "."):
                p.next()
                col = p.expect_word()
            items.append({"kind": "col", "col": col, "alias": col})
        else:
            raise SqlError(f"unexpected select item {v!r}")
        if p.peek() == ("op", ","):
            p.next()
            continue
        break
    if not p.kw("from"):
        raise SqlError("expected FROM")
    table = p.expect_word().lower()
    if table not in TABLES:
        raise SqlError(f"unknown table {table!r}")
    join = None
    jhow = None
    if p.kw("left", "join"):
        jhow = "left"
    elif p.kw("inner", "join") or p.kw("join"):
        jhow = "inner"
    if jhow:
        t2 = p.expect_word().lower()
        if t2 not in TABLES:
            raise SqlError(f"unknown join table {t2!r}")
        if not p.kw("on"):
            raise SqlError("JOIN needs ON")
        c1 = p.ident()
        p.expect_op("=")
        c2 = p.ident()
        join = {"table": t2, "on": (c1, c2), "how": jhow}
    def _lit() -> object:
        lk, lv = p.next()
        if lk == "num":
            return float(lv) if "." in lv else int(lv)
        if lk == "str":
            return lv[1:-1].replace("''", "'")
        raise SqlError(f"expected literal, got {lv!r}")

    where: list[tuple[str, str, object]] = []
    if p.kw("where"):
        while True:
            col = p.ident()
            if p.kw("between"):
                lo = _lit()
                if not p.kw("and"):
                    raise SqlError("BETWEEN needs AND")
                hi = _lit()
                where.append((col, ">=", lo))
                where.append((col, "<=", hi))
            elif p.kw("in"):
                p.expect_op("(")
                vals = [_lit()]
                while p.peek() == ("op", ","):
                    p.next()
                    vals.append(_lit())
                p.expect_op(")")
                where.append((col, "in", tuple(vals)))
            else:
                k, op = p.next()
                if k != "op" or op not in ("=", "<>", "<", "<=", ">", ">="):
                    raise SqlError(f"bad comparison operator {op!r}")
                where.append((col, op, _lit()))
            if not p.kw("and"):
                break
    group: list[str] = []
    if p.kw("group", "by"):
        while True:
            group.append(p.ident())
            if p.peek() == ("op", ","):
                p.next()
                continue
            break
    having: list[tuple[str, str, object]] = []
    if p.kw("having"):
        if not group:
            raise SqlError("HAVING needs GROUP BY")
        while True:
            col = p.ident()
            k, op = p.next()
            if k != "op" or op not in ("=", "<>", "<", "<=", ">", ">="):
                raise SqlError(f"bad comparison operator {op!r}")
            lk, lv = p.next()
            if lk == "num":
                lit: object = float(lv) if "." in lv else int(lv)
            elif lk == "str":
                lit = lv[1:-1].replace("''", "'")
            else:
                raise SqlError(f"expected literal, got {lv!r}")
            having.append((col, op, lit))
            if not p.kw("and"):
                break
    qualify: list[tuple[str, str, object]] = []
    if p.kw("qualify"):
        while True:
            col = p.ident()
            k, op = p.next()
            if k != "op" or op not in ("=", "<>", "<", "<=", ">", ">="):
                raise SqlError(f"bad comparison operator {op!r}")
            lk, lv = p.next()
            if lk != "num" or "." in lv:
                raise SqlError("QUALIFY compares a window rank to an integer")
            qualify.append((col, op, int(lv)))
            if not p.kw("and"):
                break
    order: list[tuple[str, bool]] = []
    if p.kw("order", "by"):
        while True:
            col = p.ident()
            desc = False
            if p.kw("desc"):
                desc = True
            elif p.kw("asc"):
                pass
            order.append((col, desc))
            if p.peek() == ("op", ","):
                p.next()
                continue
            break
    limit = None
    if p.kw("limit"):
        lk, lv = p.next()
        if lk != "num" or "." in lv:
            raise SqlError("LIMIT needs an integer")
        limit = int(lv)
    if p.peek() is not None:
        raise SqlError(f"trailing tokens at {p.peek()[1]!r}")

    aggs = [it for it in items if it["kind"] == "agg"]
    cols = [it for it in items if it["kind"] == "col"]
    wins = [it for it in items if it["kind"] == "winrank"]
    if len(wins) > 1:
        raise SqlError("at most one row_number() per query")
    if wins and (aggs or group or distinct):
        raise SqlError("row_number() combines only with bare projections")
    if qualify:
        if not wins:
            raise SqlError("QUALIFY needs a row_number() item")
        bad = [c for c, _, _ in qualify if c != wins[0]["alias"]]
        if bad:
            raise SqlError(f"QUALIFY may only reference {wins[0]['alias']!r}: {bad}")
    if distinct and (aggs or group):
        raise SqlError("DISTINCT combines only with bare projections")
    if aggs and not group and cols:
        raise SqlError("bare columns beside aggregates need GROUP BY")
    if group:
        bad = [c["col"] for c in cols if c["col"] not in group]
        if bad:
            raise SqlError(f"non-grouped bare columns: {bad}")
    if having:
        legal = set(group) | {it["alias"] for it in items}
        bad = [c for c, _, _ in having if c not in legal]
        if bad:
            raise SqlError(f"HAVING references unknown columns: {bad}")
    return {
        "items": items,
        "table": table,
        "join": join,
        "where": where,
        "group": group,
        "having": having,
        "qualify": qualify,
        "order": order,
        "limit": limit,
        "distinct": distinct,
    }


def _mask(b: pa.Table, where) -> pa.Table:
    m = None
    ops = {
        "=": pc.equal,
        "<>": pc.not_equal,
        "<": pc.less,
        "<=": pc.less_equal,
        ">": pc.greater,
        ">=": pc.greater_equal,
    }
    for col, op, lit in where:
        if op == "in":
            c = pc.is_in(b.column(col), value_set=pa.array(list(lit)))
        else:
            c = ops[op](b.column(col), pa.scalar(lit))
        m = c if m is None else pc.and_kleene(m, c)
    return b.filter(pc.fill_null(m, False)) if m is not None else b


def sql_query(sf_dir: str, sql: str):
    """Compile + run ``sql`` over the parquet tables in ``sf_dir``.
    Returns a Ray Dataset (streaming) for projection queries, a
    pyarrow Table for aggregates (output-sized)."""
    import numpy as np

    from ray.data.aggregate import Count, Max, Min, Sum

    from .analytics import grouped_sum

    plan = parse(sql)
    needed = set(plan["group"])
    for it in plan["items"]:
        if it["kind"] == "col":
            needed.add(it["col"])
        elif it["kind"] == "winrank":
            needed.add(it["part"])
            needed.update(c for c, _ in it["keys"])
        elif it["col"] != "*":
            needed.add(it["col"])
    for col, _, _ in plan["where"]:
        needed.add(col)
    for col, _ in plan["order"]:
        if col not in {it["alias"] for it in plan["items"]}:
            needed.add(col)

    def scan(table: str, extra: set[str], pushdown: bool = True):
        """Pruned read + single-table predicate PUSHDOWN: every WHERE
        conjunct whose column lives in this table filters before any
        join — rows that can't survive never shuffle.  ``pushdown=False``
        reads pruned but defers predicates (required for the NULL-
        producing side of an outer join, where a pre-join filter would
        change which left rows survive)."""
        cols = set(_table_columns(sf_dir, table))
        local_w = [(c, o, l) for c, o, l in plan["where"] if c in cols]
        d = ray.data.read_parquet(
            f"{sf_dir}/{table}.parquet",
            columns=sorted((needed | extra) & cols),
        )
        if pushdown and local_w:
            d = d.map_batches(lambda b, w=local_w: _mask(b, w), batch_format="pyarrow")
        return d, cols

    if plan["join"]:
        from ..stages.joins import join as _join

        c1, c2 = plan["join"]["on"]
        lcols = set(_table_columns(sf_dir, plan["table"]))
        # normalize ON order: lk belongs to the left (FROM) table
        lk, rk = (c1, c2) if c1 in lcols else (c2, c1)
        if lk not in lcols:
            raise SqlError(f"join key {c1!r}/{c2!r} not found in {plan['table']}")
        how = plan["join"].get("how", "inner")
        left, _ = scan(plan["table"], {lk})
        # LEFT JOIN: right-side predicates must NOT filter before the
        # join (they'd drop unmatched left rows that SQL keeps as NULLs);
        # they apply post-join, where WHERE's NULL-drops semantics match
        right, rcols = scan(plan["join"]["table"], {rk}, pushdown=(how == "inner"))
        if rk not in rcols:
            raise SqlError(f"join key {rk!r} not found in {plan['join']['table']}")
        # unknown where-columns fail loudly rather than silently no-op
        for c, _, _2 in plan["where"]:
            if c not in lcols and c not in rcols:
                raise SqlError(f"WHERE column {c!r} not in either table")

        def keyed(b: pa.Table, rk=rk, lk=lk) -> pa.Table:
            return b.rename_columns([lk if n == rk else n for n in b.column_names])

        ds = _join(left, right.map_batches(keyed, batch_format="pyarrow"), on=lk, how=how)
        if how == "left":
            post_w = [(c, o, l) for c, o, l in plan["where"] if c in rcols and c not in lcols]
            if post_w:
                ds = ds.map_batches(lambda b, w=post_w: _mask(b, w), batch_format="pyarrow")
    else:
        ds, tcols = scan(plan["table"], set())
        for c, _, _2 in plan["where"]:
            if c not in tcols:
                raise SqlError(f"WHERE column {c!r} not in {plan['table']}")

    aggs = [it for it in plan["items"] if it["kind"] == "agg"]
    if aggs and plan["group"]:
        sums = {it["col"]: it["alias"] for it in aggs if it["fn"] == "sum"}
        counts = [it for it in aggs if it["fn"] == "count"]
        minmax = [it for it in aggs if it["fn"] in ("min", "max")]
        avgs = [it for it in aggs if it["fn"] == "avg"]
        cdists = [it for it in aggs if it["fn"] == "count_distinct"]
        star_counts = [it for it in counts if it["col"] == "*"]
        col_counts = [it for it in counts if it["col"] != "*"]
        count_out = star_counts[0]["alias"] if star_counts else None
        if len(star_counts) > 1:
            raise SqlError("at most one count(*) per query")
        if col_counts:
            # count(col) = non-null count: a derived 0/1 validity column
            # summed through the partial-agg path (NULL-correct under
            # LEFT JOIN, where unmatched rows carry NULL right columns)
            def with_cc(b: pa.Table, cc=col_counts) -> pa.Table:
                for it in cc:
                    b = b.append_column(
                        f"__cc_{it['alias']}",
                        pc.cast(pc.is_valid(b.column(it["col"])), pa.int64()),
                    )
                return b

            ds = ds.map_batches(with_cc, batch_format="pyarrow")
            for it in col_counts:
                sums[f"__cc_{it['alias']}"] = it["alias"]
        if avgs:
            # avg = exact grouped sum / NON-NULL count, both through the
            # partial-agg path (a derived 0/1 validity column sums to the
            # non-null count) — the final division is the identical
            # IEEE double op DuckDB's avg performs on the same operands
            for it in avgs:
                if it["col"] in sums:
                    raise SqlError("a column cannot be both sum'd and avg'd")
                sums[it["col"]] = f"__avgsum_{it['alias']}"

            def with_nn(b: pa.Table, avgs=avgs) -> pa.Table:
                for it in avgs:
                    b = b.append_column(
                        f"__nn_{it['alias']}",
                        pc.cast(pc.is_valid(b.column(it["col"])), pa.int64()),
                    )
                return b

            ds = ds.map_batches(with_nn, batch_format="pyarrow")
            for it in avgs:
                sums[f"__nn_{it['alias']}"] = f"__avgn_{it['alias']}"
        parts = []
        if sums or count_out:
            parts.append(grouped_sum(ds, plan["group"], sums, count_out=count_out))
        for it in cdists:
            # count(DISTINCT col): block-local (keys, col) dedup partial,
            # one keyed dedup groupby, then a keys-only grouped count —
            # the distinct shuffle ships unique pairs, never raw rows
            keys_col = plan["group"] + [it["col"]]

            def dd_local(b: pa.Table, kc=keys_col) -> pa.Table:
                return pa.TableGroupBy(b.select(kc), kc).aggregate([]).select(kc)

            pairs = (
                ds.map_batches(dd_local, batch_format="pyarrow")
                .groupby(keys_col if len(keys_col) > 1 else keys_col[0])
                .count()
            )
            slim_keys = pairs.map_batches(
                lambda b, g=plan["group"]: b.select(g), batch_format="pyarrow"
            )
            parts.append(
                grouped_sum(slim_keys, plan["group"], {}, count_out=it["alias"])
            )
        if minmax:
            ray_aggs = [
                (Min(it["col"]) if it["fn"] == "min" else Max(it["col"])) for it in minmax
            ]
            g = ds.groupby(plan["group"] if len(plan["group"]) > 1 else plan["group"][0]).aggregate(*ray_aggs)

            def rn(b: pa.Table) -> pa.Table:
                names = {
                    f"{it['fn']}({it['col']})": it["alias"] for it in minmax
                }
                return b.rename_columns([names.get(c, c) for c in b.column_names])

            parts.append(g.map_batches(rn, batch_format="pyarrow"))
        res = None
        for t in parts:
            bs = list(t.iter_batches(batch_format="pyarrow"))
            if not bs:
                res = None  # zero groups: every part is empty too
                break
            t = pa.concat_tables(bs)
            res = t if res is None else res.join(t, keys=plan["group"], join_type="inner")
        if res is None:
            # zero groups survived WHERE: emit a TYPED empty result
            import pyarrow.parquet as _pq

            src = _pq.read_schema(f"{sf_dir}/{plan['table']}.parquet")
            src2 = (
                _pq.read_schema(f"{sf_dir}/{plan['join']['table']}.parquet")
                if plan["join"]
                else None
            )

            def typ(col: str):
                if src2 is not None and col in src2.names and col not in src.names:
                    return src2.field(col).type
                return src.field(col).type

            fields = {}
            for g in plan["group"]:
                fields[g] = pa.array([], typ(g))
            for it in aggs:
                if it["fn"] in ("count", "count_distinct"):
                    fields[it["alias"]] = pa.array([], pa.int64())
                elif it["fn"] == "avg":
                    fields[it["alias"]] = pa.array([], pa.float64())
                else:
                    fields[it["alias"]] = pa.array([], typ(it["col"]))
            return pa.table(fields).select([it["alias"] for it in plan["items"]])
        for it in avgs:
            s = res.column(f"__avgsum_{it['alias']}")
            n = res.column(f"__avgn_{it['alias']}")
            res = res.append_column(
                it["alias"],
                pc.divide(pc.cast(s, pa.float64()), pc.cast(n, pa.float64())),
            )
            res = res.drop_columns([f"__avgsum_{it['alias']}", f"__avgn_{it['alias']}"])
        out = res
    elif aggs:
        # global aggregate, one output row
        cols = {}
        state: dict[str, object] = {}
        cd_vals: dict[str, int] = {}
        for it in [a for a in aggs if a["fn"] == "count_distinct"]:
            col = it["col"]

            def dd1(b: pa.Table, c=col) -> pa.Table:
                return pa.TableGroupBy(b.select([c]), [c]).aggregate([]).select([c])

            cd_vals[it["alias"]] = (
                ds.map_batches(dd1, batch_format="pyarrow").groupby(col).count().count()
            )
        aggs = [a for a in aggs if a["fn"] != "count_distinct"]

        def part(b: pa.Table) -> pa.Table:
            vals = {}
            for it in aggs:
                if it["fn"] == "count":
                    vals[it["alias"]] = (
                        b.num_rows if it["col"] == "*" else int(pc.count(b.column(it["col"])).as_py())
                    )
                elif it["fn"] == "sum":
                    vals[it["alias"]] = pc.sum(b.column(it["col"])).as_py() or 0
                elif it["fn"] == "avg":
                    vals["__avgsum_" + it["alias"]] = pc.sum(b.column(it["col"])).as_py() or 0
                    vals["__avgn_" + it["alias"]] = int(pc.count(b.column(it["col"])).as_py())
                elif it["fn"] == "min":
                    vals[it["alias"]] = pc.min(b.column(it["col"])).as_py()
                else:
                    vals[it["alias"]] = pc.max(b.column(it["col"])).as_py()
            return pa.table({k: pa.array([v]) for k, v in vals.items()})

        folds = []
        for it in aggs:
            if it["fn"] == "avg":
                folds.append(("sum", "__avgsum_" + it["alias"]))
                folds.append(("count", "__avgn_" + it["alias"]))
            else:
                folds.append((it["fn"], it["alias"]))
        for b in (
            ds.map_batches(part, batch_format="pyarrow").iter_batches(batch_format="pyarrow")
            if aggs
            else ()
        ):
            for fn, a in folds:
                for v in b.column(a).to_pylist():  # one row per input block
                    if a not in state or state[a] is None:
                        state[a] = v
                    elif v is not None:
                        if fn in ("count", "sum"):
                            state[a] = state[a] + v
                        elif fn == "min":
                            state[a] = min(state[a], v)
                        else:
                            state[a] = max(state[a], v)
        vals = {}
        for it in aggs:
            if it["fn"] == "avg":
                n = state.get("__avgn_" + it["alias"]) or 0
                s = state.get("__avgsum_" + it["alias"])
                vals[it["alias"]] = (float(s) / float(n)) if n else None
            else:
                vals[it["alias"]] = state.get(it["alias"])
        for a, v in cd_vals.items():
            vals[a] = int(v)
        out = pa.table({k: pa.array([v]) for k, v in vals.items()})
    elif any(it["kind"] == "winrank" for it in plan["items"]):
        # row_number() OVER (PARTITION BY k ORDER BY ...): ONE key-hash
        # shuffle, then the rank materializes inside each bounded group
        # kernel; QUALIFY prunes there too, so only surviving rows leave
        # the group (the distributed per-group top-n shape)
        import pandas as pd

        w = next(it for it in plan["items"] if it["kind"] == "winrank")
        out_cols = [it["alias"] for it in plan["items"]]
        qual = plan.get("qualify") or []

        def rank_kernel(g: pd.DataFrame, w=w, qual=qual, out_cols=out_cols) -> pd.DataFrame:
            import numpy as np

            g2 = g.sort_values(
                [c for c, _ in w["keys"]],
                ascending=[not d for _, d in w["keys"]],
                kind="mergesort",
            ).copy()
            g2[w["alias"]] = np.arange(1, len(g2) + 1, dtype=np.int64)
            for c, op, lit in qual:
                col = g2[c]
                g2 = g2[
                    {
                        "=": col == lit,
                        "<>": col != lit,
                        "<": col < lit,
                        "<=": col <= lit,
                        ">": col > lit,
                        ">=": col >= lit,
                    }[op]
                ]
            return g2[out_cols]

        ds = ds.groupby(w["part"]).map_groups(rank_kernel, batch_format="pandas")
        if plan["order"]:
            ds = ds.sort(
                [c for c, _ in plan["order"]], descending=[d for _, d in plan["order"]]
            )
        if plan["limit"] is not None:
            ds = ds.limit(plan["limit"])
        return ds
    else:
        proj = [it["col"] for it in plan["items"]]
        ds = ds.map_batches(lambda b, p=proj: b.select(p), batch_format="pyarrow")
        if plan.get("distinct"):
            # distinct = per-block local dedup partial, then one keyed
            # groupby — the dedup shuffle ships unique rows only
            def local(b: pa.Table, p=proj) -> pa.Table:
                return pa.TableGroupBy(b, p).aggregate([]).select(p)

            ds = ds.map_batches(local, batch_format="pyarrow").groupby(
                proj if len(proj) > 1 else proj[0]
            ).count()
            ds = ds.map_batches(lambda b, p=proj: b.select(p), batch_format="pyarrow")
        if plan["order"]:
            ds = ds.sort(
                [c for c, _ in plan["order"]], descending=[d for _, d in plan["order"]]
            )
        if plan["limit"] is not None:
            ds = ds.limit(plan["limit"])
        return ds

    # HAVING filters the output-sized aggregate table (group-count rows)
    if plan.get("having"):
        out = _mask(out, plan["having"])
    # aggregate outputs: driver-side order/limit on the output-sized table
    if plan["order"]:
        import numpy as _np

        df = out.to_pandas()
        df = df.sort_values(
            [c for c, _ in plan["order"]],
            ascending=[not d for _, d in plan["order"]],
            kind="mergesort",
        )
        if plan["limit"] is not None:
            df = df.head(plan["limit"])
        out = pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False)
    elif plan["limit"] is not None:
        out = out.slice(0, plan["limit"])
    # column order as written in SELECT
    return out.select([it["alias"] for it in plan["items"]])


_COLS_CACHE: dict[tuple[str, str], list[str]] = {}


def _table_columns(sf_dir: str, table: str) -> list[str]:
    key = (sf_dir, table)
    if key not in _COLS_CACHE:
        import pyarrow.parquet as pq

        _COLS_CACHE[key] = pq.read_schema(f"{sf_dir}/{table}.parquet").names
    return _COLS_CACHE[key]


# ---------------------------------------------------------------------------
# certified front-door queries: the oracle for each one IS the SQL string


# Dialect caveat encoded in the canned set: DuckDB's pandas bridge
# widens integer SUMs (HUGEINT) to float64, so certified queries sum
# integer-VALUED double columns (l_quantity) — IEEE addition of
# integer-valued doubles is exact in any order below 2^53, giving
# bit-identical sums with no dtype drift.  count(*) is int64 on both
# sides; min/max pass values through exactly.
FRONT_QUERIES: dict[str, str] = {
    # projection + filter + order + limit (column pruning at the read)
    "sqlfront_filter": (
        "SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_totalprice > 100000 AND o_orderstatus = 'F' "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 50"
    ),
    # grouped sum + count through the partial-agg path
    "sqlfront_group": (
        "SELECT l_returnflag, sum(l_quantity) AS qty, count(*) AS n FROM lineitem "
        "WHERE l_quantity < 30 GROUP BY l_returnflag"
    ),
    # grouped min/max through Ray's grouped aggregate
    "sqlfront_minmax": (
        "SELECT c_mktsegment, min(c_acctbal) AS lo, max(c_acctbal) AS hi "
        "FROM customer GROUP BY c_mktsegment"
    ),
    # global aggregate fold
    "sqlfront_global": (
        "SELECT count(*) AS n, sum(l_quantity) AS qty, max(l_quantity) AS mx "
        "FROM lineitem WHERE l_linenumber = 1"
    ),
    # multi-key group + order on an aggregate alias
    "sqlfront_multikey": (
        "SELECT lang, source, count(*) AS n FROM documents "
        "GROUP BY lang, source ORDER BY n DESC, lang, source LIMIT 20"
    ),
    # equi-join through the size-aware front door with predicate pushdown
    "sqlfront_join": (
        "SELECT c_mktsegment, count(*) AS n FROM orders "
        "JOIN customer ON o_custkey = c_custkey "
        "WHERE o_totalprice > 50000 GROUP BY c_mktsegment"
    ),
    # join + projection + order + limit (both sides pruned and filtered)
    "sqlfront_join_proj": (
        "SELECT o_orderkey, c_name FROM orders "
        "JOIN customer ON orders.o_custkey = customer.c_custkey "
        "WHERE o_orderstatus = 'O' AND c_mktsegment = 'BUILDING' "
        "ORDER BY o_orderkey LIMIT 30"
    ),
    # avg = exact sum / non-null count (integer-valued doubles ⇒ exact)
    "sqlfront_avg": (
        "SELECT l_returnflag, avg(l_quantity) AS aq, count(*) AS n "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    # LEFT JOIN with NULL-correct count(col): unmatched customers keep
    # their row (count(*)) but contribute 0 to count(o_orderkey)
    "sqlfront_left_join": (
        "SELECT c_mktsegment, count(*) AS n_rows, count(o_orderkey) AS n_orders "
        "FROM customer LEFT JOIN orders ON c_custkey = o_custkey "
        "GROUP BY c_mktsegment ORDER BY c_mktsegment"
    ),
    # window rank: per-customer order ranking + QUALIFY top-2, the
    # distributed per-group top-n shape (total order ⇒ deterministic)
    "sqlfront_window": (
        "SELECT o_custkey, o_orderkey, "
        "row_number() OVER (PARTITION BY o_custkey "
        "ORDER BY o_totalprice DESC, o_orderkey) AS r "
        "FROM orders QUALIFY r <= 2 ORDER BY o_custkey, r"
    ),
    # window over a join: rank joined rows per segment, keep top-3
    "sqlfront_join_window": (
        "SELECT c_mktsegment, o_orderkey, "
        "row_number() OVER (PARTITION BY c_mktsegment "
        "ORDER BY o_totalprice DESC, o_orderkey) AS r "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "QUALIFY r <= 3 ORDER BY c_mktsegment, r"
    ),
    # IN-list membership as a vectorized is_in mask
    "sqlfront_in": (
        "SELECT lang, count(*) AS n FROM documents "
        "WHERE lang IN ('en', 'fr', 'zh') GROUP BY lang ORDER BY lang"
    ),
    # BETWEEN (inclusive range) desugars to two pushed-down comparisons
    "sqlfront_between": (
        "SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS q FROM lineitem "
        "WHERE l_quantity BETWEEN 10 AND 20 GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    # count(DISTINCT col): per-group distinct-pair dedup then a count
    "sqlfront_count_distinct": (
        "SELECT event_type, count(DISTINCT user_id) AS u, count(*) AS n "
        "FROM events GROUP BY event_type ORDER BY event_type"
    ),
    # DISTINCT projection: block-local dedup partial + one keyed groupby
    "sqlfront_distinct": (
        "SELECT DISTINCT lang, source FROM documents ORDER BY lang, source"
    ),
    # HAVING over an aggregate alias (post-aggregation, group-sized)
    "sqlfront_having": (
        "SELECT user_id, count(*) AS n FROM events "
        "GROUP BY user_id HAVING n >= 20 ORDER BY n DESC, user_id LIMIT 25"
    ),
}


def explain(sf_dir: str, sql: str) -> pa.Table:
    """Physical-plan introspection (the EXPLAIN analog): one row per
    plan decision so users can SEE the pushdowns and join strategy the
    compiler picked without running the query.  Introspection only —
    no query execution, no oracle (the plan is engine-internal by
    definition); the contract is pytest-pinned."""
    plan = parse(sql)
    rows: list[tuple[str, str]] = [("scan", plan["table"])]
    lcols = set(_table_columns(sf_dir, plan["table"]))
    if plan["join"]:
        rcols = set(_table_columns(sf_dir, plan["join"]["table"]))
        c1, c2 = plan["join"]["on"]
        lk, rk = (c1, c2) if c1 in lcols else (c2, c1)
        rows.append(("scan", plan["join"]["table"]))
        rows.append(("join_key", f"{lk} = {rk}"))
        import os

        rbytes = sum(
            os.path.getsize(os.path.join(d, f))
            for d, _, fs in os.walk(f"{sf_dir}")
            for f in fs
            if f == f"{plan['join']['table']}.parquet"
        )
        from ..stages.joins import DEFAULT_BROADCAST_BYTES

        rows.append(
            (
                "join_strategy",
                "broadcast" if rbytes <= DEFAULT_BROADCAST_BYTES else "copartition",
            )
        )
        for c, op, lit in plan["where"]:
            side = plan["table"] if c in lcols else plan["join"]["table"]
            rows.append(("pushdown", f"{side}: {c} {op} {lit!r}"))
    else:
        for c, op, lit in plan["where"]:
            rows.append(("pushdown", f"{plan['table']}: {c} {op} {lit!r}"))
    aggs = [it for it in plan["items"] if it["kind"] == "agg"]
    if plan["group"]:
        kinds = sorted({it["fn"] for it in aggs})
        path = "partial-agg groupby" if set(kinds) <= {"sum", "count", "avg"} else "grouped aggregate"
        rows.append(("aggregate", f"group by {', '.join(plan['group'])} via {path}"))
    elif aggs:
        rows.append(("aggregate", "global streaming fold"))
    if plan.get("distinct"):
        rows.append(("distinct", "block-local partial + keyed groupby"))
    if plan.get("having"):
        rows.append(("having", f"{len(plan['having'])} post-agg filter(s)"))
    if plan["order"]:
        where_run = "driver (output-sized)" if (aggs or plan["group"]) else "distributed sort"
        rows.append(("order", where_run))
    if plan["limit"] is not None:
        rows.append(("limit", str(plan["limit"])))
    return pa.table(
        {
            "step": pa.array([r[0] for r in rows], pa.string()),
            "detail": pa.array([r[1] for r in rows], pa.string()),
        }
    )
