"""Differential fuzzing of the relational core: random small query
trees, run on Spark AND DuckDB from ONE shared SQL text, results
compared exactly (row count, column names, order-insensitive value
hash via ``compare_result_sets``).

The curated oracle registry proves the queries we WROTE are portable;
this harness probes what the curated set doesn't express — random
compositions of projections, predicates, joins, aggregates, set ops,
and top-k over the proven-portable construct subset (exact integers,
ASCII strings, timestamp field extraction; no floats in any output, no
libm, no engine-divergent constructs — the rulebook distilled from
five rounds of NOTES.md portability seams).

Everything is generated from a pinned master seed: case ``i`` uses
``Random(f"{seed}:{i}")``, so any divergence reproduces standalone via
``python tools/fuzz_oracle.py <sf_dir> --case <i> --seed <seed>``.

Deliberately EXCLUDED constructs (each bit a graded round before):
- float arithmetic / libm (`ln`/`exp`/`pow`) — engine libm divergence
- DECIMAL output columns — engine→pandas decimal conversion unstable
- `concat(...)` — DuckDB skips NULL args, Spark propagates (we use
  `||`, null-propagating in both)
- `round(x, n)` on computed doubles — BigDecimal vs double rescale
- negative-index `substr`, indexed two-arg lambdas, computed slices

Reference test ethos: golden values + roundtrip invariants
(`JsonSchemaConverterTest.scala:472-482`) scaled to generated cases.
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ---------------------------------------------------------------------
# Table model: portable atoms per fixture table.
#
# int atoms must stay SMALL (|v| bounded) so any +/-/* composition
# stays far from int64 under ANSI Spark (overflow THROWS there and
# wraps nowhere).  floor() on a stored double is portable (both
# engines hold the identical IEEE double; floor moves to the same
# integer), so exact-valued double columns enter as floor-casts.
# ---------------------------------------------------------------------

TABLES: dict[str, dict] = {
    "customer": {
        "rows": 1500,
        "key": "c_custkey",
        "ints": ["c_custkey", "c_nationkey",
                 "CAST(FLOOR(c_acctbal) AS BIGINT)"],
        "strs": ["c_name", "c_mktsegment"],
        "ts": [],
        "low_card_strs": ["c_mktsegment"],
    },
    "orders": {
        "rows": 15000,
        "key": "o_orderkey",
        "ints": ["o_orderkey", "o_custkey",
                 "CAST(FLOOR(o_totalprice) AS BIGINT)"],
        "strs": ["o_orderstatus", "o_orderpriority"],
        "ts": ["o_orderdate"],
        "low_card_strs": ["o_orderstatus", "o_orderpriority"],
    },
    "lineitem": {
        "rows": 60000,
        "key": None,  # no single-column unique key
        "ints": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                 "CAST(FLOOR(l_quantity) AS BIGINT)",
                 "CAST(FLOOR(l_extendedprice) AS BIGINT)"],
        "strs": ["l_returnflag", "l_linestatus"],
        "ts": ["l_shipdate"],
        "low_card_strs": ["l_returnflag", "l_linestatus"],
    },
    "part": {
        "rows": 2000,
        "key": "p_partkey",
        "ints": ["p_partkey", "p_size",
                 "CAST(FLOOR(p_retailprice) AS BIGINT)"],
        "strs": ["p_name", "p_brand", "p_type"],
        "ts": [],
        "low_card_strs": ["p_brand"],
    },
    "supplier": {
        "rows": 100,
        "key": "s_suppkey",
        "ints": ["s_suppkey", "s_nationkey",
                 "CAST(FLOOR(s_acctbal) AS BIGINT)"],
        "strs": ["s_name"],
        "ts": [],
        "low_card_strs": [],
    },
    "nation": {
        "rows": 25,
        "key": "n_nationkey",
        "ints": ["n_nationkey", "n_regionkey"],
        "strs": ["n_name"],
        "ts": [],
        "low_card_strs": [],
    },
    "events": {
        "rows": 10000,
        "key": "event_id",
        "ints": ["event_id", "user_id",
                 "CAST(FLOOR(value) AS BIGINT)"],
        "strs": ["event_type"],
        "ts": ["ts"],
        "low_card_strs": ["event_type"],
    },
    "documents": {
        "rows": 500,
        "key": "doc_id",
        "ints": ["doc_id", "n_chars"],
        "strs": ["lang", "source"],
        "ts": [],
        "low_card_strs": ["lang", "source"],
    },
}

# Inner-join pairs with real FK relationships (left, right, on-left,
# on-right).  Inner joins only: no induced NULLs, so NULL-ordering /
# NULL-skipping engine seams never enter generated plans.
JOINS: list[tuple[str, str, str, str]] = [
    ("orders", "customer", "o_custkey", "c_custkey"),
    ("lineitem", "orders", "l_orderkey", "o_orderkey"),
    ("lineitem", "part", "l_partkey", "p_partkey"),
    ("lineitem", "supplier", "l_suppkey", "s_suppkey"),
    ("customer", "nation", "c_nationkey", "n_nationkey"),
    ("supplier", "nation", "s_nationkey", "n_nationkey"),
]


# ---------------------------------------------------------------------
# Expression generators.  Every generator returns a SQL fragment valid
# and semantics-identical in Spark SQL and DuckDB.
# ---------------------------------------------------------------------

def _int_atom(rng: random.Random, t: dict, alias: str = "") -> str:
    col = rng.choice(t["ints"])
    if alias:
        # qualify the bare column inside possible floor-cast atoms
        for c in _atom_cols(col):
            col = col.replace(c, f"{alias}.{c}")
    # bound magnitude immediately: every downstream composition stays
    # tiny, so ANSI Spark can't overflow and HUGEINT never differs
    m = rng.choice([7, 11, 97, 1000, 9973])
    return f"({col} % {m})"


def _atom_cols(atom: str) -> list[str]:
    import re

    return re.findall(r"[a-z]_[a-z0-9_]+|doc_id|n_chars|event_id|user_id|value|ts", atom)


def _int_expr(rng: random.Random, t: dict, depth: int, alias: str = "") -> str:
    if depth <= 0 or rng.random() < 0.3:
        if rng.random() < 0.2:
            return str(rng.randint(-50, 50))
        return _int_atom(rng, t, alias)
    op = rng.choice(["+", "-", "*", "case", "abs", "%"])
    a = _int_expr(rng, t, depth - 1, alias)
    b = _int_expr(rng, t, depth - 1, alias)
    if op == "case":
        p = _pred(rng, t, depth - 1, alias)
        return f"(CASE WHEN {p} THEN {a} ELSE {b} END)"
    if op == "abs":
        return f"ABS({a})"
    if op == "%":
        return f"({a} % {rng.choice([5, 13, 101])})"
    return f"({a} {op} {b})"


def _str_expr(rng: random.Random, t: dict, depth: int, alias: str = "") -> str:
    if not t["strs"]:
        return "'x'"
    col = rng.choice(t["strs"])
    if alias:
        col = f"{alias}.{col}"
    choice = rng.random()
    if depth <= 0 or choice < 0.35:
        return col
    if choice < 0.55:
        return f"UPPER({col})"
    if choice < 0.7:
        return f"LOWER({col})"
    if choice < 0.85:
        # positive-index substring only (negative indexes diverge)
        return f"SUBSTR({col}, 1, {rng.randint(1, 6)})"
    other = _str_expr(rng, t, 0, alias)
    return f"({col} || {other})"


def _pred(rng: random.Random, t: dict, depth: int, alias: str = "") -> str:
    if depth <= 0 or rng.random() < 0.4:
        kind = rng.random()
        if kind < 0.45:
            a = _int_expr(rng, t, 1, alias)
            cmp_ = rng.choice(["<", "<=", ">", ">=", "=", "<>"])
            return f"({a} {cmp_} {rng.randint(-20, 900)})"
        if kind < 0.65 and t["strs"]:
            s = _str_expr(rng, t, 1, alias)
            pat = rng.choice(["'%a%'", "'%e%'", "'B%'", "'%1%'", "'%on%'"])
            return f"({s} LIKE {pat})"
        if kind < 0.85 and t["ts"]:
            c = rng.choice(t["ts"])
            if alias:
                c = f"{alias}.{c}"
            fld = rng.choice(["YEAR", "MONTH", "DAY"])
            hi = {"YEAR": (1992, 2026), "MONTH": (1, 12), "DAY": (1, 28)}[fld]
            return f"({fld}({c}) {rng.choice(['<', '>=', '='])} {rng.randint(*hi)})"
        a = _int_expr(rng, t, 1, alias)
        vals = ", ".join(str(rng.randint(0, 99)) for _ in range(rng.randint(2, 5)))
        return f"({a} IN ({vals}))"
    op = rng.choice(["AND", "OR"])
    a = _pred(rng, t, depth - 1, alias)
    b = _pred(rng, t, depth - 1, alias)
    if rng.random() < 0.15:
        a = f"(NOT {a})"
    return f"({a} {op} {b})"


def _group_key(rng: random.Random, t: dict, alias: str = "") -> str:
    opts = []
    if t["low_card_strs"]:
        c = rng.choice(t["low_card_strs"])
        opts.append(f"{alias}.{c}" if alias else c)
    if t["ts"]:
        c = rng.choice(t["ts"])
        opts.append(f"YEAR({alias + '.' if alias else ''}{c})")
    opts.append(f"({_int_atom(rng, t, alias)} % {rng.choice([3, 5, 8])})")
    if t["strs"]:
        c = rng.choice(t["strs"])
        opts.append(f"SUBSTR({alias + '.' if alias else ''}{c}, 1, 1)")
    return rng.choice(opts)


def _agg(rng: random.Random, t: dict, alias: str = "") -> str:
    kind = rng.random()
    if kind < 0.3:
        return "CAST(COUNT(*) AS BIGINT)"
    if kind < 0.55:
        e = _int_expr(rng, t, 1, alias)
        # CAST both sides: DuckDB SUM(BIGINT) yields HUGEINT
        return f"CAST(SUM(CAST({e} AS BIGINT)) AS BIGINT)"
    if kind < 0.75:
        return f"MIN({_int_expr(rng, t, 1, alias)})"
    if kind < 0.9:
        return f"MAX({_int_expr(rng, t, 1, alias)})"
    if t["strs"]:
        return f"MIN({_str_expr(rng, t, 1, alias)})"
    return "CAST(COUNT(*) AS BIGINT)"


# ---------------------------------------------------------------------
# Query shapes
# ---------------------------------------------------------------------

def _shape_filter_project(rng: random.Random) -> str:
    name = rng.choice(list(TABLES))
    t = TABLES[name]
    cols = []
    for i in range(rng.randint(1, 4)):
        if rng.random() < 0.6:
            cols.append(f"{_int_expr(rng, t, 2)} AS c{i}")
        else:
            cols.append(f"{_str_expr(rng, t, 2)} AS c{i}")
    pred = _pred(rng, t, 2)
    distinct = "DISTINCT " if rng.random() < 0.25 else ""
    return f"SELECT {distinct}{', '.join(cols)} FROM {name} WHERE {pred}"


def _shape_group_agg(rng: random.Random) -> str:
    name = rng.choice(list(TABLES))
    t = TABLES[name]
    keys = [_group_key(rng, t) for _ in range(rng.randint(1, 2))]
    keyed = [f"{k} AS g{i}" for i, k in enumerate(keys)]
    aggs = [f"{_agg(rng, t)} AS a{i}" for i in range(rng.randint(1, 3))]
    pred = _pred(rng, t, 2)
    having = ""
    if rng.random() < 0.3:
        having = f" HAVING COUNT(*) > {rng.randint(0, 5)}"
    return (
        f"SELECT {', '.join(keyed + aggs)} FROM {name} WHERE {pred} "
        f"GROUP BY {', '.join(keys)}{having}"
    )


def _shape_join_agg(rng: random.Random) -> str:
    lname, rname, lk, rk = rng.choice(JOINS)
    lt, rt = TABLES[lname], TABLES[rname]
    keys = []
    if rng.random() < 0.5:
        keys.append(_group_key(rng, lt, "l"))
    else:
        keys.append(_group_key(rng, rt, "r"))
    keyed = [f"{k} AS g{i}" for i, k in enumerate(keys)]
    aggs = []
    for i in range(rng.randint(1, 2)):
        side, al = (lt, "l") if rng.random() < 0.5 else (rt, "r")
        aggs.append(f"{_agg(rng, side, al)} AS a{i}")
    side, al = (lt, "l") if rng.random() < 0.5 else (rt, "r")
    pred = _pred(rng, side, 2, al)
    return (
        f"SELECT {', '.join(keyed + aggs)} "
        f"FROM {lname} l JOIN {rname} r ON l.{lk} = r.{rk} "
        f"WHERE {pred} GROUP BY {', '.join(keys)}"
    )


def _shape_join_project(rng: random.Random) -> str:
    lname, rname, lk, rk = rng.choice(JOINS)
    lt, rt = TABLES[lname], TABLES[rname]
    cols = []
    for i in range(rng.randint(1, 3)):
        side, al = (lt, "l") if rng.random() < 0.5 else (rt, "r")
        if rng.random() < 0.6:
            cols.append(f"{_int_expr(rng, side, 1, al)} AS c{i}")
        else:
            cols.append(f"{_str_expr(rng, side, 1, al)} AS c{i}")
    side, al = (lt, "l") if rng.random() < 0.5 else (rt, "r")
    pred = _pred(rng, side, 2, al)
    return (
        f"SELECT {', '.join(cols)} "
        f"FROM {lname} l JOIN {rname} r ON l.{lk} = r.{rk} WHERE {pred}"
    )


def _shape_setop(rng: random.Random) -> str:
    name = rng.choice(list(TABLES))
    t = TABLES[name]
    e = _int_expr(rng, t, 2)
    f2 = _int_expr(rng, t, 2)
    p1 = _pred(rng, t, 1)
    p2 = _pred(rng, t, 1)
    op = rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
    return (
        f"SELECT {e} AS c0 FROM {name} WHERE {p1} "
        f"{op} SELECT {f2} AS c0 FROM {name} WHERE {p2}"
    )


def _shape_topk(rng: random.Random) -> str:
    # deterministic top-k: total order on a UNIQUE key
    name = rng.choice([n for n, t in TABLES.items() if t["key"]])
    t = TABLES[name]
    key = t["key"]
    cols = [f"{key} AS k0", f"{_int_expr(rng, t, 2)} AS c1"]
    pred = _pred(rng, t, 2)
    k = rng.randint(1, 40)
    direction = rng.choice(["ASC", "DESC"])
    return (
        f"SELECT {', '.join(cols)} FROM {name} WHERE {pred} "
        f"ORDER BY {key} {direction} LIMIT {k}"
    )


def _shape_window(rng: random.Random) -> str:
    # windows need a TOTAL order for determinism: partition by a
    # low-card key, order by the table's unique key
    name = rng.choice(
        [n for n, t in TABLES.items() if t["key"] and t["low_card_strs"]]
    )
    t = TABLES[name]
    key = t["key"]
    g = rng.choice(t["low_card_strs"])
    direction = rng.choice(["ASC", "DESC"])
    over = f"PARTITION BY {g} ORDER BY {key} {direction}"
    rows = "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    kind = rng.random()
    if kind < 0.3:
        wexpr = f"ROW_NUMBER() OVER ({over})"
    elif kind < 0.55:
        e = _int_expr(rng, t, 1)
        wexpr = (
            f"CAST(SUM(CAST({e} AS BIGINT)) OVER ({over} {rows})"
            " AS BIGINT)"
        )
    elif kind < 0.75:
        e = _int_expr(rng, t, 1)
        wexpr = f"MIN({e}) OVER ({over} {rows})"
    else:
        e = _int_expr(rng, t, 1)
        wexpr = f"LAG({e}, 1) OVER ({over})"
    pred = _pred(rng, t, 2)
    inner = (
        f"SELECT {key} AS k0, {g} AS g0, {wexpr} AS w0 "
        f"FROM {name} WHERE {pred}"
    )
    if "ROW_NUMBER" in wexpr and rng.random() < 0.5:
        return f"SELECT * FROM ({inner}) q WHERE w0 <= {rng.randint(1, 20)}"
    return inner


def _shape_semijoin_subquery(rng: random.Random) -> str:
    # correlated EXISTS / IN over a real FK relationship
    lname, rname, lk, rk = rng.choice(JOINS)
    lt, rt = TABLES[lname], TABLES[rname]
    outer_pred = _pred(rng, lt, 1)
    inner_pred = _pred(rng, rt, 1)
    cols = []
    for i in range(rng.randint(1, 3)):
        if rng.random() < 0.6:
            cols.append(f"{_int_expr(rng, lt, 1)} AS c{i}")
        else:
            cols.append(f"{_str_expr(rng, lt, 1)} AS c{i}")
    neg = rng.random() < 0.3
    if rng.random() < 0.5:
        sub = (
            f"{'NOT ' if neg else ''}EXISTS (SELECT 1 FROM {rname} r "
            f"WHERE r.{rk} = {lname}.{lk} AND {_pred(rng, rt, 1, 'r')})"
        )
    else:
        sub = (
            f"{lk} {'NOT ' if neg else ''}IN "
            f"(SELECT {rk} FROM {rname} WHERE {inner_pred})"
        )
    return (
        f"SELECT {', '.join(cols)} FROM {lname} "
        f"WHERE {outer_pred} AND {sub}"
    )


def _shape_rollup(rng: random.Random) -> str:
    # grouping-set semantics: ROLLUP/CUBE subtotal rows + GROUPING()
    # markers to disambiguate natural NULL keys from subtotal NULLs
    name = rng.choice(
        [n for n, t in TABLES.items() if len(t["low_card_strs"]) >= 1]
    )
    t = TABLES[name]
    g1 = rng.choice(t["low_card_strs"])
    g2 = f"({_int_atom(rng, t)} % {rng.choice([3, 5])})"
    op = rng.choice(["ROLLUP", "CUBE"])
    pred = _pred(rng, t, 1)
    # HAVING COUNT(*) > 0 normalizes a REAL engine divergence this
    # shape found on its first extended run: over an EMPTY input,
    # DuckDB (and Postgres) emit the empty-grouping-set grand-total
    # row (count 0) while Spark emits zero rows. Grouped rows always
    # have count >= 1, so the clause drops exactly that row and
    # nothing else. The divergence itself is pinned in
    # tests/test_fuzz_oracle.py::test_known_divergence_empty_cube.
    return (
        f"SELECT {g1} AS g0, {g2} AS g1, "
        f"CAST(GROUPING({g1}) AS INT) AS gr0, "
        f"CAST(GROUPING({g2}) AS INT) AS gr1, "
        f"CAST(COUNT(*) AS BIGINT) AS a0, "
        f"{_agg(rng, t)} AS a1 "
        f"FROM {name} WHERE {pred} "
        f"GROUP BY {op}({g1}, {g2}) "
        f"HAVING COUNT(*) > 0"
    )


def _shape_scalar_subquery(rng: random.Random) -> str:
    # correlated SCALAR subquery in the SELECT list over a real FK —
    # decorrelation machinery differs genuinely between the engines
    # (Spark rewrites to an outer join + agg; DuckDB flattens into a
    # dependent join), so agreement here is a real invariant
    lname, rname, lk, rk = rng.choice(JOINS)
    lt, rt = TABLES[lname], TABLES[rname]
    inner_pred = _pred(rng, lt, 1, "i")
    kind = rng.random()
    if kind < 0.4:
        sub_agg = "CAST(COUNT(*) AS BIGINT)"
    elif kind < 0.6:
        sub_agg = f"CAST(SUM(CAST({_int_expr(rng, lt, 1, 'i')} AS BIGINT)) AS BIGINT)"
    elif kind < 0.8:
        sub_agg = f"MIN({_int_expr(rng, lt, 1, 'i')})"
    else:
        sub_agg = f"MAX({_int_expr(rng, lt, 1, 'i')})"
    sub = (
        f"(SELECT {sub_agg} FROM {lname} i "
        f"WHERE i.{lk} = {rname}.{rk} AND {inner_pred})"
    )
    if rng.random() < 0.4:
        sub = f"COALESCE({sub}, {rng.randint(-5, 5)})"
    outer_pred = _pred(rng, rt, 1)
    cols = [f"{rk} AS k0", f"{sub} AS s0"]
    if rng.random() < 0.5:
        cols.append(f"{_int_expr(rng, rt, 1)} AS c2")
    return f"SELECT {', '.join(cols)} FROM {rname} WHERE {outer_pred}"


def _shape_setop_agg(rng: random.Random) -> str:
    # aggregate OVER a set-op result: exercises distinct-before-agg
    # interplay. Both branches use INT-typed columns from the same
    # table so the union schema is identical in both engines.
    name = rng.choice(list(TABLES))
    t = TABLES[name]
    m = rng.choice([3, 5, 8])
    g1 = f"({_int_atom(rng, t)} % {m})"
    g2 = f"({_int_atom(rng, t)} % {m})"
    c1 = _int_expr(rng, t, 1)
    c2 = _int_expr(rng, t, 1)
    p1 = _pred(rng, t, 1)
    p2 = _pred(rng, t, 1)
    op = rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
    return (
        f"SELECT g0, CAST(COUNT(*) AS BIGINT) AS a0, "
        f"CAST(SUM(CAST(c0 AS BIGINT)) AS BIGINT) AS a1 FROM ("
        f"SELECT {g1} AS g0, {c1} AS c0 FROM {name} WHERE {p1} "
        f"{op} "
        f"SELECT {g2} AS g0, {c2} AS c0 FROM {name} WHERE {p2}"
        f") u GROUP BY g0"
    )


def _shape_outer_join(rng: random.Random) -> str:
    # LEFT/FULL outer joins with an extra ON-clause predicate on the
    # inner side — the ON-vs-WHERE placement semantics (filter before
    # vs after null-extension) are a classic cross-engine divergence
    # area; COUNT(col) vs COUNT(*) exercises NULL-skipping aggregation
    lname, rname, lk, rk = rng.choice(JOINS)
    lt, rt = TABLES[lname], TABLES[rname]
    on_pred = _pred(rng, rt, 1, "r")
    where_pred = _pred(rng, lt, 1, "l")
    full = rng.random() < 0.35
    op = "FULL OUTER JOIN" if full else "LEFT JOIN"
    if rng.random() < 0.5:
        # projection form: coalesce the nullable side
        cols = [
            f"COALESCE(l.{lk}, {rng.randint(-9, -1)}) AS k0"
            if full
            else f"l.{lk} AS k0",
            f"COALESCE({_int_expr(rng, rt, 1, 'r')},"
            f" {rng.randint(-99, 99)}) AS c1",
            f"(CASE WHEN r.{rk} IS NULL THEN 0 ELSE 1 END) AS c2",
        ]
        where = "" if full else f" WHERE {where_pred}"
        return (
            f"SELECT {', '.join(cols)} FROM {lname} l "
            f"{op} {rname} r ON l.{lk} = r.{rk} AND {on_pred}{where}"
        )
    # aggregate form: NULL-skipping COUNT(col) vs COUNT(*)
    g = _group_key(rng, lt, "l") if not full else f"(l.{lk} % 5)"
    where = "" if full else f" WHERE {where_pred}"
    return (
        f"SELECT {g} AS g0, CAST(COUNT(*) AS BIGINT) AS a0, "
        f"CAST(COUNT(r.{rk}) AS BIGINT) AS a1, "
        f"MIN(r.{rk}) AS a2 "
        f"FROM {lname} l {op} {rname} r "
        f"ON l.{lk} = r.{rk} AND {on_pred}{where} "
        f"GROUP BY {g}"
    )


SHAPES = [
    (_shape_filter_project, 0.12),
    (_shape_outer_join, 0.04),
    (_shape_group_agg, 0.15),
    (_shape_join_agg, 0.13),
    (_shape_join_project, 0.10),
    (_shape_setop, 0.09),
    (_shape_topk, 0.05),
    (_shape_window, 0.08),
    (_shape_semijoin_subquery, 0.08),
    (_shape_rollup, 0.05),
    (_shape_scalar_subquery, 0.06),
    (_shape_setop_agg, 0.05),
]


def gen_case(master_seed: str, i: int) -> str:
    rng = random.Random(f"{master_seed}:{i}")
    x = rng.random()
    acc = 0.0
    for fn, w in SHAPES:
        acc += w
        if x < acc:
            return fn(rng)
    return SHAPES[0][0](rng)


# ---------------------------------------------------------------------
# Adversarial input profiles (VERDICT r6 #5): the SAME shape families
# run over transformed views of the fixture tables — NULL-dense
# columns, half-empty relations, single-row tables, single-valued
# columns, int64-edge numerics, negative/zero keys.  Each profile is
# ONE portable SQL text per table, executed verbatim on both engines,
# so the transformed inputs are bit-identical by construction.
#
# Determinism constraints each profile must preserve (or the shapes
# stop being order-stable): every table's unique key stays unique,
# non-NULL, and monotone under the transform (top-k and window shapes
# ORDER BY it), and FK pairs are transformed consistently on both
# sides (or deliberately left intact).
# ---------------------------------------------------------------------

_DOUBLE_COLS = {
    "c_acctbal", "o_totalprice", "l_quantity", "l_extendedprice",
    "p_retailprice", "s_acctbal", "value",
}

# FK-participating columns; each domain shares one shift so joins stay
# isomorphic after the transform
_FK_SHIFT = {
    "c_custkey": 800, "o_custkey": 800,
    "o_orderkey": 8000, "l_orderkey": 8000,
    "p_partkey": 1100, "l_partkey": 1100,
    "s_suppkey": 60, "l_suppkey": 60,
    "n_nationkey": 13, "c_nationkey": 13, "s_nationkey": 13,
    "n_regionkey": 3,
    "event_id": 5500, "user_id": 600, "doc_id": 300,
}

# per-row deterministic integer driving the NULL pattern (must itself
# stay non-NULL, so its components are preserved by null_dense)
_NULL_DET = {"lineitem": "(l_orderkey * 10 + l_linenumber)"}

_EMPTY_TABLES = {"orders", "part", "nation", "documents"}

PROFILES = (
    "baseline", "null_dense", "empty_mixed", "single_row",
    "single_value", "extreme_ints", "neg_keys",
)


def _ref_cols(t: dict) -> list[str]:
    cols: set[str] = set()
    for a in t["ints"]:
        cols.update(_atom_cols(a))
    cols.update(t["strs"])
    cols.update(t["ts"])
    if t["key"]:
        cols.add(t["key"])
    return sorted(cols)


def profile_view_sql(profile: str, name: str) -> str:
    """The derived-view SELECT for ``name`` under ``profile`` — one
    shared SQL text over ``{name}__base``, valid in both engines."""
    t = TABLES[name]
    refs = _ref_cols(t)
    src = f"{name}__base"
    if profile == "baseline":
        return f"SELECT {', '.join(refs)} FROM {src}"
    if profile == "empty_mixed":
        w = " WHERE 1 = 0" if name in _EMPTY_TABLES else ""
        return f"SELECT {', '.join(refs)} FROM {src}{w}"
    if profile == "single_row":
        k = t["key"] or "l_orderkey"
        return (
            f"SELECT {', '.join(refs)} FROM {src} "
            f"WHERE {k} = (SELECT MIN({k}) FROM {src})"
        )
    det = _NULL_DET.get(name, t["key"])
    det_cols = _atom_cols(det) if det else []
    out = []
    for ci, c in enumerate(refs):
        if profile == "null_dense":
            # PK / ordering / det columns stay non-NULL (top-k and
            # window shapes ORDER BY the key); FK sides and every data
            # column go NULL on a deterministic ~40% of rows, with a
            # different phase per column
            if c == t["key"] or c in det_cols:
                out.append(c)
            else:
                out.append(
                    f"(CASE WHEN ((CAST({det} AS BIGINT) + {ci}) "
                    f"* 40503) % 10 < 4 THEN NULL ELSE {c} END) AS {c}"
                )
        elif profile == "single_value":
            # collapse every non-key data column to ONE constant —
            # single-valued groups, all-tied orders, degenerate
            # predicates; keys/FKs intact so joins keep their shape
            if c == t["key"] or c in _FK_SHIFT or c in det_cols:
                out.append(c)
            elif c in _DOUBLE_COLS:
                out.append(f"CAST(42.5 AS DOUBLE) AS {c}")
            elif c in t["strs"]:
                out.append(f"'aB' AS {c}")
            elif c in t["ts"]:
                out.append(f"TIMESTAMP '1995-06-17 00:00:00' AS {c}")
            else:
                out.append(f"7 AS {c}")
        elif profile == "extreme_ints":
            # keys/FKs: consistent injective monotone blow-up into the
            # ±9e12 band (mixed signs); non-FK ints: ±(int64_max − ε);
            # doubles: ×1e9 (products ≤1e13 < 2^53 stay exact IEEE)
            if c in _FK_SHIFT or c == t["key"]:
                out.append(
                    f"(CAST({c} AS BIGINT) * 1000003 "
                    f"- 9000000000000) AS {c}"
                )
            elif c in _DOUBLE_COLS:
                out.append(f"({c} * 1e9) AS {c}")
            elif c in t["strs"] or c in t["ts"]:
                out.append(c)
            else:
                out.append(
                    f"(CAST(({c} % 2) * 2 - 1 AS BIGINT) * "
                    f"(9223372036854775807 - CAST({c} AS BIGINT) "
                    f"* 4093)) AS {c}"
                )
        elif profile == "neg_keys":
            # shift every FK domain through zero (both sides equally)
            if c in _FK_SHIFT:
                out.append(f"({c} - {_FK_SHIFT[c]}) AS {c}")
            else:
                out.append(c)
        else:
            raise ValueError(f"unknown profile {profile!r}")
    return f"SELECT {', '.join(out)} FROM {src}"


# ---------------------------------------------------------------------
# Runner
# ---------------------------------------------------------------------

def run_fuzz(
    sf_dir: str,
    n_cases: int,
    seed: str = "fuzz-r6",
    only_case: int | None = None,
    verbose: bool = False,
    profile: str = "baseline",
):
    """Returns (n_pass, failures) where failures is a list of
    (case_index, sql, problem_description)."""
    import duckdb

    from spark_extensions_spark.session import get_spark, load_tables
    from spark_extensions_spark.testing import compare_result_sets

    spark = get_spark("fuzz_oracle")
    tables = load_tables(spark, sf_dir, *TABLES.keys())
    con = duckdb.connect()
    for name, df in tables.items():
        df.createOrReplaceTempView(f"{name}__base")
        con.sql(
            f"CREATE VIEW {name}__base AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
        view = profile_view_sql(profile, name)
        spark.sql(f"CREATE OR REPLACE TEMP VIEW {name} AS {view}")
        con.sql(f"CREATE VIEW {name} AS {view}")
    n_pass = 0
    failures: list[tuple[int, str, str]] = []
    cases = [only_case] if only_case is not None else range(n_cases)
    for i in cases:
        sql = gen_case(seed, i)
        try:
            sdf = spark.sql(sql)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append((i, sql, f"spark error: {str(e)[:300]}"))
            continue
        try:
            ddf = con.sql(sql)
            dcols = list(ddf.columns)
            drows = ddf.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((i, sql, f"duckdb error: {str(e)[:300]}"))
            continue
        problems = compare_result_sets(scols, srows, dcols, drows)
        if problems:
            failures.append((i, sql, "; ".join(problems)))
        else:
            n_pass += 1
            if verbose:
                print(f"pass case {i}: {len(srows)} rows", flush=True)
    return n_pass, failures


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    n = int(args[1]) if len(args) > 1 else 500
    seed = "fuzz-r6"
    only = None
    profile = "baseline"
    for j, a in enumerate(sys.argv):
        if a == "--seed":
            seed = sys.argv[j + 1]
        if a == "--case":
            only = int(sys.argv[j + 1])
        if a == "--profile":
            profile = sys.argv[j + 1]
    n_pass, failures = run_fuzz(
        sf_dir, n, seed=seed, only_case=only, verbose=only is not None,
        profile=profile,
    )
    for i, sql, problem in failures:
        print(f"FAIL case {i}: {problem}\n  SQL: {sql}", flush=True)
    print(f"\n{n_pass} pass, {len(failures)} fail (seed={seed})", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
