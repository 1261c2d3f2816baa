"""Property tests (SURVEY.md §5/§7 step 7): hypothesis-generated random
filters and joins over the fixture schemas, dialect-parsed, built, and
checked against DuckDB on identical data.

These sweep the predicate/join space the 16 hand-written corpus queries
sample only pointwise: every comparison operator × every column type ×
random literals (including out-of-range ones that select nothing), and every
FK edge of the e-commerce schema with a random extra filter stacked on.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spj_query_engine_spark.dialect import parse
from spj_query_engine_spark.plans import build_plan

from tests.conftest import assert_same_result

OPS = ["<", ">", "<=", ">=", "=", "!="]

#: (table, int column, literal range incl. out-of-domain values)
INT_COLS = [
    ("CUSTOMER", "cid", 220),
    ("CUSTOMER", "gender", 3),
    ("CARTDETAILS", "qty", 55),
    ("BILL", "amount", 2600),
]

#: FK edges of the e-commerce schema (child, child col, parent, parent col)
JOIN_EDGES = [
    ("CART", "cid", "CUSTOMER", "cid"),
    ("CARTDETAILS", "cartid", "CART", "cartid"),
    ("BILL", "iid", "CARTDETAILS", "iid"),
]

_SETTINGS = dict(
    max_examples=20,
    deadline=None,
    derandomize=True,  # stable example set — no flakes in unattended runs
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@pytest.fixture(scope="module")
def duck_ecom(ecommerce_pdf):
    con = duckdb.connect()
    for name, pdf in ecommerce_pdf.items():
        con.register(name, pdf)
    yield con
    con.close()


@given(
    pick=st.sampled_from(INT_COLS),
    op=st.sampled_from(OPS),
    frac=st.floats(min_value=0.0, max_value=1.0),
)
@settings(**_SETTINGS)
def test_random_filters(spark, ecommerce, duck_ecom, pick, op, frac):
    table, col, hi = pick
    lit = int(frac * hi)
    sql = f'SELECT {table}.{col} FROM {table} WHERE {table}.{col}{op}"{lit}"'
    oracle = f"SELECT {col} FROM {table} WHERE {col} {'<>' if op == '!=' else op} {lit}"
    df = build_plan(spark, ecommerce, parse(sql))
    assert_same_result(df, duck_ecom, oracle)


@given(
    edge=st.sampled_from(JOIN_EDGES),
    op=st.sampled_from(OPS),
    pick=st.sampled_from(INT_COLS),
    frac=st.floats(min_value=0.0, max_value=1.0),
)
@settings(**_SETTINGS)
def test_random_join_plus_filter(spark, ecommerce, duck_ecom, edge, op, pick, frac):
    child, ckey, parent, pkey = edge
    ftable, fcol, hi = pick
    lit = int(frac * hi)
    if ftable not in (child, parent):
        ftable, fcol, hi = child, ckey, 220
        lit = int(frac * hi)
    sql = (
        f"SELECT {child}.{ckey} FROM {child},{parent} "
        f'WHERE {child}.{ckey}={parent}.{pkey},{ftable}.{fcol}{op}"{lit}"'
    )
    oracle = (
        f"SELECT {child}.{ckey} AS {child}_{ckey} FROM {child} JOIN {parent} "
        f"ON {child}.{ckey} = {parent}.{pkey} "
        f"WHERE {ftable}.{fcol} {'<>' if op == '!=' else op} {lit}"
    )
    df = build_plan(spark, ecommerce, parse(sql))
    assert_same_result(df, duck_ecom, oracle)


#: (table, group col, agg col) — all bare-unambiguous within their query
GROUP_AGG_COMBOS = [
    ("CUSTOMER", "gender", "cid"),
    ("CART", "cid", "cartid"),
    ("CARTDETAILS", "cartid", "qty"),
    ("BILL", "iid", "amount"),
]

AGG_FUNCS = ["MAX", "MIN", "SUM", "COUNT", "AVG"]

#: join edge + (group table, group col, agg table, agg col), chosen so every
#: display name is unambiguous across the query's two tables
JOIN_GROUP_COMBOS = [
    ("CART", "cid", "CUSTOMER", "cid", "CUSTOMER", "gender", "CART", "cartid"),
    ("CARTDETAILS", "cartid", "CART", "cartid", "CART", "status", "CARTDETAILS", "qty"),
    ("BILL", "iid", "CARTDETAILS", "iid", "CARTDETAILS", "cartid", "BILL", "amount"),
]


def _oracle_agg(func: str, col: str) -> str:
    """DuckDB spelling of an aggregate, matching Spark's result dtype
    (SUM(int) is HUGEINT in DuckDB → cast back to BIGINT)."""
    expr = f"{func}({col})"
    if func in ("SUM", "COUNT"):
        expr = f"CAST({expr} AS BIGINT)"
    return f"{expr} AS {func.lower()}_{col}"


@given(
    combo=st.sampled_from(GROUP_AGG_COMBOS),
    func=st.sampled_from(AGG_FUNCS),
)
@settings(**_SETTINGS)
def test_random_groupby_aggregate(spark, ecommerce, duck_ecom, combo, func):
    table, gcol, acol = combo
    sql = f"SELECT {table}.{gcol}, {func}({table}.{acol}) FROM {table} GROUPBY {table}.{gcol}"
    oracle = f"SELECT {gcol}, {_oracle_agg(func, acol)} FROM {table} GROUP BY {gcol}"
    df = build_plan(spark, ecommerce, parse(sql))
    assert_same_result(df, duck_ecom, oracle, float_tol=1e-12 if func == "AVG" else 0.0)


@given(
    combo=st.sampled_from(GROUP_AGG_COMBOS),
    func=st.sampled_from(AGG_FUNCS),
)
@settings(**_SETTINGS)
def test_random_global_aggregate(spark, ecommerce, duck_ecom, combo, func):
    table, _gcol, acol = combo
    sql = f"SELECT {func}({table}.{acol}) FROM {table}"
    oracle = f"SELECT {_oracle_agg(func, acol)} FROM {table}"
    df = build_plan(spark, ecommerce, parse(sql))
    assert_same_result(df, duck_ecom, oracle, float_tol=1e-12 if func == "AVG" else 0.0)


@given(
    combo=st.sampled_from(JOIN_GROUP_COMBOS),
    func=st.sampled_from(["MAX", "SUM", "COUNT", "AVG"]),
)
@settings(**_SETTINGS)
def test_random_join_groupby_aggregate(spark, ecommerce, duck_ecom, combo, func):
    child, ckey, parent, pkey, gtab, gcol, atab, acol = combo
    sql = (
        f"SELECT {gtab}.{gcol}, {func}({atab}.{acol}) FROM {child},{parent} "
        f"WHERE {child}.{ckey}={parent}.{pkey} GROUPBY {gtab}.{gcol}"
    )
    oracle = (
        f"SELECT {gtab}.{gcol}, {_oracle_agg(func, acol).replace(f'{func}({acol})', f'{func}({atab}.{acol})')} "
        f"FROM {child} JOIN {parent} ON {child}.{ckey} = {parent}.{pkey} "
        f"GROUP BY {gtab}.{gcol}"
    )
    df = build_plan(spark, ecommerce, parse(sql))
    assert_same_result(df, duck_ecom, oracle, float_tol=1e-12 if func == "AVG" else 0.0)


@given(
    edge=st.sampled_from(JOIN_EDGES),
    distinct=st.booleans(),
)
@settings(**_SETTINGS)
def test_random_join_projection_distinct(spark, ecommerce, duck_ecom, edge, distinct):
    child, ckey, parent, pkey = edge
    kw = "DISTINCT " if distinct else ""
    sql = f"SELECT {kw}{parent}.{pkey} FROM {child},{parent} WHERE {child}.{ckey}={parent}.{pkey}"
    oracle = (
        f"SELECT {kw}{parent}.{pkey} AS {parent}_{pkey} FROM {child} JOIN {parent} "
        f"ON {child}.{ckey} = {parent}.{pkey}"
    )
    df = build_plan(spark, ecommerce, parse(sql))
    assert_same_result(df, duck_ecom, oracle)


@given(
    tokens=st.lists(
        st.sampled_from(
            ["SELECT", "FROM", "WHERE", "GROUPBY", "ORDERBY", "DISTINCT",
             "MAX", "(", ")", ",", ".", "*", "=", "<", ">", "<=", ">=", "!=",
             'T', 'a', '"1"', '"x"']
        ),
        min_size=0,
        max_size=12,
    )
)
@settings(max_examples=200, deadline=None, derandomize=True)
def test_parser_total_on_garbage(tokens):
    """The parser is TOTAL over arbitrary token soup: any input either
    parses to an AST or raises DialectParseError — never a crash, hang, or
    foreign exception (the reference's parser stack simply exits on bad
    input; ours must be a library-safe function)."""
    from spj_query_engine_spark.dialect import parse
    from spj_query_engine_spark.dialect.parser import DialectParseError

    text = " ".join(tokens)
    for extended in (False, True):
        try:
            parse(text, extended=extended)
        except DialectParseError:
            pass


@given(
    doc_lens=st.lists(
        st.integers(min_value=0, max_value=70), min_size=1, max_size=10
    ),
    vocab=st.integers(min_value=1, max_value=10),
)
@settings(**_SETTINGS)
def test_random_docs_boilerplate_and_chunks(spark, doc_lens, vocab):
    """Token-count boundary sweep for the block/window document operators:
    random doc lengths (0, 1, exact block multiples, …) with a small vocab
    (forcing heavy corpus-wide block repetition) must match the DuckDB
    oracles value-for-value for both d15 (strip_boilerplate) and p06
    (overlap_chunks)."""
    import pandas as pd

    from spj_query_engine_spark.operators.dedup import (
        strip_boilerplate,
        strip_boilerplate_sql,
    )
    from spj_query_engine_spark.operators.sampling import (
        overlap_chunks,
        overlap_chunks_sql,
    )

    docs = pd.DataFrame(
        {
            "doc_id": range(len(doc_lens)),
            "text": [
                " ".join(f"w{(i * 7 + j) % vocab}" for j in range(n))
                for i, n in enumerate(doc_lens)
            ],
        }
    )
    sdf = spark.createDataFrame(docs)
    con = duckdb.connect()
    con.register("documents", docs)
    try:
        assert_same_result(strip_boilerplate(sdf), con, strip_boilerplate_sql())
        assert_same_result(overlap_chunks(sdf), con, overlap_chunks_sql())
    finally:
        con.close()


@given(
    n_users=st.integers(min_value=1, max_value=5),
    n_events=st.integers(min_value=1, max_value=40),
    gap_minutes=st.integers(min_value=1, max_value=2000),
)
@settings(**_SETTINGS)
def test_random_event_streams_ledger_ops(spark, n_users, n_events, gap_minutes):
    """Random event streams (deterministic pseudo-random layout) through
    the growth-accounting ledger and transition matrix, each compared
    value-for-value against its DuckDB oracle; the ledger invariant
    new+retained+resurrected=active must hold on every row."""
    import pandas as pd

    from spj_query_engine_spark.operators.temporal import (
        event_transitions,
        event_transitions_sql,
        growth_accounting,
        growth_accounting_sql,
    )

    types = ["view", "click", "purchase"]
    rows = []
    for i in range(n_events):
        u = (i * 7919) % n_users
        t = pd.Timestamp("2024-01-01") + pd.Timedelta(
            minutes=(i * 104729) % (gap_minutes * n_events)
        )
        rows.append((i, u, t, types[(i * 31) % 3], 1.0))
    pdf = pd.DataFrame(
        rows, columns=["event_id", "user_id", "ts", "event_type", "value"]
    )
    sdf = spark.createDataFrame(pdf)
    con = duckdb.connect()
    con.register("events", pdf)
    try:
        assert_same_result(growth_accounting(sdf), con, growth_accounting_sql())
        assert_same_result(event_transitions(sdf), con, event_transitions_sql())
    finally:
        con.close()
    for r in growth_accounting(sdf).collect():
        assert r["n_new"] + r["n_retained"] + r["n_resurrected"] == r["n_active"]


@given(
    n_users=st.integers(min_value=1, max_value=5),
    n_events=st.integers(min_value=1, max_value=40),
    gap_minutes=st.integers(min_value=1, max_value=2000),
)
@settings(**_SETTINGS)
def test_random_event_streams_scd2_cdc(spark, n_users, n_events, gap_minutes):
    """Random event streams through the SCD2 interval build and the CDC
    apply, each compared value-for-value against its DuckDB oracle; the
    SCD2 invariants (intervals tile each user's timeline without overlap,
    exactly one open interval per user) must hold on every stream."""
    import pandas as pd

    from spj_query_engine_spark.operators.temporal import (
        cdc_apply,
        cdc_apply_sql,
        status_intervals,
        status_intervals_sql,
    )

    types = ["view", "click", "purchase", "signup", "error"]
    rows = []
    for i in range(n_events):
        u = (i * 7919) % n_users
        t = pd.Timestamp("2024-01-01") + pd.Timedelta(
            minutes=(i * 104729) % (gap_minutes * n_events)
        )
        rows.append((i, u, t, types[(i * 31) % 5], 1.0))
    pdf = pd.DataFrame(
        rows, columns=["event_id", "user_id", "ts", "event_type", "value"]
    )
    sdf = spark.createDataFrame(pdf)
    con = duckdb.connect()
    con.register("events", pdf)
    try:
        assert_same_result(status_intervals(sdf), con, status_intervals_sql())
        assert_same_result(cdc_apply(sdf), con, cdc_apply_sql())
    finally:
        con.close()
    per_user: dict = {}
    for r in status_intervals(sdf).collect():
        per_user.setdefault(r["user_id"], []).append(r)
    for user_rows in per_user.values():
        user_rows.sort(key=lambda r: r["island"])
        opens = [r for r in user_rows if r["valid_to_ms"] is None]
        assert len(opens) == 1 and opens[0] is user_rows[-1]
        for a, b in zip(user_rows, user_rows[1:]):
            assert a["valid_to_ms"] == b["valid_from_ms"]  # gap-free tiling


@given(
    n_points=st.integers(min_value=1, max_value=60),
    seed=st.integers(min_value=0, max_value=10_000),
)
@settings(**_SETTINGS)
def test_random_skyline_matches_bruteforce(spark, n_points, seed):
    """q51's two-phase distributed skyline == the O(n²) dominance
    definition on random (price, size) point sets, ties included."""
    pts = []
    for i in range(n_points):
        h = (seed * 31 + i * 2654435761) % (1 << 32)
        pts.append((i, float((h >> 8) % 17), int(h % 13)))

    def dominated(p, q):  # q dominates p
        return (
            q[1] <= p[1]
            and q[2] >= p[2]
            and (q[1] < p[1] or q[2] > p[2])
        )

    expect = {
        p[0] for p in pts if not any(dominated(p, q) for q in pts if q is not p)
    }
    from spj_query_engine_spark.workload.parity import q51_skyline  # noqa: F401
    from spj_query_engine_spark.workload import REGISTRY
    import os, tempfile

    df = spark.createDataFrame(
        pts, "p_partkey long, p_retailprice double, p_size int"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "part.parquet"))
        got = {
            r["p_partkey"]
            for r in REGISTRY["q51_skyline"].fn(spark, d).collect()
        }
    assert got == expect


@given(
    n_nodes=st.integers(min_value=3, max_value=12),
    density=st.integers(min_value=1, max_value=6),
    salt=st.integers(min_value=0, max_value=1000),
)
@settings(**_SETTINGS)
def test_random_graph_triangle_counts(spark, n_nodes, density, salt):
    """Random graphs through the degree-oriented wedge join vs brute-force
    itertools triangle enumeration — every node's triangle count must match
    exactly (the orientation argument is subtle enough to deserve a sweep)."""
    from itertools import combinations

    from spj_query_engine_spark.operators.dedup import triangle_counts_from_pairs

    edges = sorted(
        {
            (a, b)
            for a, b in combinations(range(n_nodes), 2)
            if (a * 7919 + b * 104729 + salt) % 10 < density
        }
    )
    if not edges:
        return
    adj = {n: set() for n in range(n_nodes)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    expected: dict[int, int] = {}
    for a, b, c in combinations(range(n_nodes), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                expected[n] = expected.get(n, 0) + 1
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["n_triangles"]
        for r in triangle_counts_from_pairs(pairs).collect()
    }
    assert got == expected


@given(
    counts=st.lists(st.integers(min_value=1, max_value=60), min_size=1, max_size=5),
)
@settings(**_SETTINGS)
def test_random_source_temperature_sample(spark, counts):
    """Random skewed source-size distributions through temperature_sample vs
    its DuckDB oracle (rate derivation exercises sqrt/decimal/ppm math far
    beyond the fixture's four sources)."""
    import pandas as pd

    from spj_query_engine_spark.operators.sampling import (
        temperature_sample,
        temperature_sample_sql,
    )

    rows = []
    did = 0
    for s, n in enumerate(counts):
        for _ in range(n):
            rows.append((did, f"src{s}"))
            did += 1
    pdf = pd.DataFrame(rows, columns=["doc_id", "source"])
    sdf = spark.createDataFrame(pdf)
    con = duckdb.connect()
    con.register("documents", pdf)
    try:
        assert_same_result(
            temperature_sample(sdf), con, temperature_sample_sql()
        )
    finally:
        con.close()


@given(
    n_types=st.integers(min_value=1, max_value=3),
    n_days=st.integers(min_value=1, max_value=15),
    spike=st.integers(min_value=0, max_value=500),
)
@settings(**_SETTINGS)
def test_daily_anomalies_match_exact_zscore(spark, n_types, n_days, spike):
    """The BIGINT anomaly inequality must agree with the exact rational
    z-score test ((x-mean)^2 > k^2 * var computed in fractions.Fraction) on
    random count tables with planted spikes."""
    from fractions import Fraction

    import pandas as pd

    from spj_query_engine_spark.operators.temporal import ZSCORE_K, daily_anomalies

    rows = []
    eid = 0
    for t in range(n_types):
        for d in range(n_days):
            n = 1 + (t * 7919 + d * 104729) % 7
            if d == 0:
                n += spike
            for _ in range(n):
                rows.append(
                    (
                        eid,
                        pd.Timestamp("2024-01-01") + pd.Timedelta(days=d, minutes=eid % 60),
                        0,
                        f"type{t}",
                        1.0,
                        "{}",
                    )
                )
                eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    sdf = spark.createDataFrame(pdf)
    got = daily_anomalies(sdf).collect()
    by_type: dict[str, list[int]] = {}
    for r in got:
        by_type.setdefault(r["event_type"], []).append(r["n"])
    for r in got:
        xs = by_type[r["event_type"]]
        mean = Fraction(sum(xs), len(xs))
        var = sum((Fraction(x) - mean) ** 2 for x in xs) / len(xs)
        expect = (Fraction(r["n"]) - mean) ** 2 > ZSCORE_K**2 * var
        assert r["is_anomaly"] == expect, (r, mean, var)


@given(
    doc_lens=st.lists(st.integers(min_value=0, max_value=12), min_size=1, max_size=6),
    vocab=st.integers(min_value=1, max_value=4),
)
@settings(**_SETTINGS)
def test_random_docs_bigram_lm(spark, doc_lens, vocab):
    """Random tiny-vocabulary corpora through bigram_lm_score vs its DuckDB
    oracle — small vocabularies force heavy bigram collisions, the regime
    where the integer floor-division probabilities are most exercised."""
    import pandas as pd

    from spj_query_engine_spark.operators.textops import (
        bigram_lm_score,
        bigram_lm_score_sql,
    )

    words = [f"w{i}" for i in range(vocab)]
    docs = []
    for d, ln in enumerate(doc_lens):
        toks = [words[(d * 31 + i * 7) % vocab] for i in range(ln)]
        docs.append((d, " ".join(toks)))
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    sdf = spark.createDataFrame(pdf)
    con = duckdb.connect()
    con.register("documents", pdf)
    try:
        assert_same_result(bigram_lm_score(sdf), con, bigram_lm_score_sql())
    finally:
        con.close()


@given(
    edge=st.sampled_from(JOIN_EDGES),
    kind=st.sampled_from(["JOIN", "LEFT JOIN"]),
    op=st.sampled_from(OPS),
    frac=st.floats(min_value=0.0, max_value=1.0),
)
@settings(**_SETTINGS)
def test_random_explicit_joins(spark, ecommerce, duck_ecom, edge, kind, op, frac):
    """Random explicit-join queries (extended grammar) vs DuckDB: INNER and
    LEFT chains over every FK edge with a random post-join WHERE — the WHERE
    must apply AFTER the join (null-extension drops under a right-side
    filter), which is exactly what the oracle computes."""
    child, ckey, parent, pkey = edge
    lit = int(frac * 220)
    sql = (
        f"SELECT {child}.{ckey} FROM {parent} {kind} {child} "
        f"ON {parent}.{pkey}={child}.{ckey} "
        f'WHERE {child}.{ckey}{op}"{lit}"'
    )
    duck_kind = "LEFT JOIN" if kind == "LEFT JOIN" else "JOIN"
    oracle = (
        f"SELECT {child}.{ckey} AS {child}_{ckey} FROM {parent} {duck_kind} {child} "
        f"ON {parent}.{pkey} = {child}.{ckey} "
        f"WHERE {child}.{ckey} {'<>' if op == '!=' else op} {lit}"
    )
    df = build_plan(spark, ecommerce, parse(sql, extended=True))
    assert_same_result(df, duck_ecom, oracle)


@given(
    combo=st.sampled_from(
        [("CUSTOMER", "gender", "cid"), ("CARTDETAILS", "qty", "iid")]
    ),
    func=st.sampled_from(["COUNT", "MAX", "MIN", "SUM"]),
)
@settings(**_SETTINGS)
def test_random_window_aggregates(spark, ecommerce, duck_ecom, combo, func):
    """Random AGG(x) OVER (PARTITIONBY p ORDERBY o) through the extended
    grammar vs DuckDB's default-frame window — RANGE peers make tied order
    keys deterministic in both engines (integer columns, exact values)."""
    table, part, val = combo
    sql = (
        f"SELECT {table}.{part}, {func}({table}.{val}) OVER "
        f"(PARTITIONBY {table}.{part} ORDERBY {table}.{val}) FROM {table}"
    )
    oracle = (
        f"SELECT {part}, CAST({func}({val}) OVER "
        f"(PARTITION BY {part} ORDER BY {val}) AS BIGINT) AS {func.lower()}_{val} "
        f"FROM {table}"
    )
    df = build_plan(spark, ecommerce, parse(sql, extended=True))
    assert_same_result(df, duck_ecom, oracle)


@given(
    n_nodes=st.integers(min_value=3, max_value=12),
    density=st.integers(min_value=1, max_value=6),
    salt=st.integers(min_value=0, max_value=1000),
)
@settings(**_SETTINGS)
def test_random_graph_kcore_and_bfs(spark, n_nodes, density, salt):
    """Random graphs through bounded k-core peeling and bounded-hop BFS vs
    brute-force Python: with round/hop budgets ≥ node count both must equal
    the exact fixed-point answers."""
    from itertools import combinations

    from spj_query_engine_spark.operators.dedup import (
        KCORE_K,
        bfs_from_pairs,
        kcore_from_pairs,
    )

    edges = sorted(
        {
            (a, b)
            for a, b in combinations(range(n_nodes), 2)
            if (a * 104729 + b * 7919 + salt) % 10 < density
        }
    )
    if not edges:
        return
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    # exact k-core by full fixed-point peeling (deep-copied: the peel
    # mutates neighbor sets and the BFS below needs the original graph)
    live = {u: set(vs) for u, vs in adj.items()}
    while True:
        drop = [u for u, vs in live.items() if len(vs) < KCORE_K]
        if not drop:
            break
        for u in drop:
            for v in live[u]:
                live[v].discard(u)
            del live[u]
    expected_core = {u: len(vs) for u, vs in live.items()}

    # exact BFS from seeds (< 3) capped at n hops
    seeds = [u for u in adj if u % 3 == 0]
    expected_dist: dict[int, int] = {u: 0 for u in seeds}
    frontier = list(seeds)
    d = 0
    while frontier and d < n_nodes:
        d += 1
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in expected_dist:
                    expected_dist[v] = d
                    nxt.append(v)
        frontier = nxt

    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got_core = {
        r["doc_id"]: r["core_deg"]
        for r in kcore_from_pairs(pairs, rounds=n_nodes).collect()
    }
    assert got_core == expected_core
    got_dist = {
        r["doc_id"]: r["dist"]
        for r in bfs_from_pairs(pairs, seed_mod=3, hops=n_nodes).collect()
    }
    assert got_dist == expected_dist


@given(
    doc_lens=st.lists(st.integers(min_value=0, max_value=10), min_size=1, max_size=5),
    vocab=st.integers(min_value=1, max_value=3),
)
@settings(**_SETTINGS)
def test_random_docs_bpe_apply(spark, doc_lens, vocab):
    """Random tiny-vocabulary corpora through bpe_apply vs a brute-force
    Python BPE (global top pair by (count desc, pair asc), greedy
    left-to-right non-overlapping merge) — token counts AND digests must
    match; tiny vocabularies force the run-parity edge cases ((x,x) pairs
    in long runs)."""
    import hashlib
    from collections import Counter

    import pandas as pd

    from spj_query_engine_spark.operators.textops import BPE_ROUNDS, bpe_apply

    words = [f"w{i}" for i in range(vocab)]
    corpus = {
        d: [words[(d * 13 + i * 5) % vocab] for i in range(ln)]
        for d, ln in enumerate(doc_lens)
    }

    def merge_once(docs_toks):
        pairs = Counter()
        for toks in docs_toks.values():
            for x, y in zip(toks, toks[1:]):
                pairs[(x, y)] += 1
        if not pairs:
            return docs_toks
        (a, b), _ = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        out = {}
        for d, toks in docs_toks.items():
            new, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    new.append(a + b)
                    i += 2
                else:
                    new.append(toks[i])
                    i += 1
            out[d] = new
        return out

    expected = dict(corpus)
    for _ in range(BPE_ROUNDS):
        expected = merge_once(expected)

    pdf = pd.DataFrame(
        [(d, " ".join(toks)) for d, toks in corpus.items()],
        columns=["doc_id", "text"],
    )
    sdf = spark.createDataFrame(pdf)
    got = {
        r["doc_id"]: (r["n_tokens"], r["digest"]) for r in bpe_apply(sdf).collect()
    }
    want = {
        d: (len(toks), hashlib.md5(" ".join(toks).encode()).hexdigest())
        for d, toks in expected.items()
    }
    assert got == want


@given(
    n_types=st.integers(min_value=1, max_value=4),
    n_events=st.integers(min_value=1, max_value=200),
    chunk_span=st.sampled_from([1, 3, 8, 64]),
)
@settings(**_SETTINGS)
def test_lateness_scan_matches_plain_window(spark, n_types, n_events, chunk_span):
    """The two-level parallel prefix scan (chunked running max + broadcast
    prior-chunk prefix max) must equal the plain one-window-per-type form on
    ANY stream — tiny chunk_span values force many chunk boundaries, the
    exact place a prefix-scan bug would hide."""
    import pandas as pd

    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from spj_query_engine_spark.operators.temporal import _lateness_scan

    rows = []
    for i in range(n_events):
        # non-monotone event times with repeats; sparse non-contiguous ids
        ts = pd.Timestamp("2024-01-01") + pd.Timedelta(
            seconds=((i * 104729) % 997) - 400
        )
        rows.append((i * 3 + (i % 2), f"t{(i * 31) % n_types}", ts))
    pdf = pd.DataFrame(rows, columns=["event_id", "event_type", "ts"])
    sdf = spark.createDataFrame(pdf)
    got = sorted(
        (r["event_type"], r["late_ms"])
        for r in _lateness_scan(sdf, chunk_span=chunk_span).collect()
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ts_ms = F.unix_millis(F.col("ts").cast("timestamp"))
    plain = sdf.select(
        "event_type", (F.max(ts_ms).over(w) - ts_ms).alias("late_ms")
    )
    want = sorted((r["event_type"], r["late_ms"]) for r in plain.collect())
    assert got == want


@given(seed=st.integers(min_value=0, max_value=10_000))
@settings(**_SETTINGS)
def test_knn_join_single_cell_equals_bruteforce(spark, seed):
    """With one cell and one probe every vector is candidate to every other,
    so the cell-keyed rerank (similarity._ivf_rerank) must reproduce the
    exact all-pairs top-k — the equivalence that pins the rerank's join
    shape, norm hoisting and tie order to brute-force ground truth."""
    import pandas as pd

    from spj_query_engine_spark.operators.similarity import knn_join

    n, dim, k = 30, 8, 3
    rows = []
    for i in range(n):
        vec = [float(((i * 7919 + j * 104729 + seed) % 97) - 48) for j in range(dim)]
        if all(v == 0.0 for v in vec):
            vec[0] = 1.0
        rows.append((i, vec))
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    sdf = spark.createDataFrame(pdf)
    got = {
        (r["vec_id"], r["rank"]): (r["nbr_id"], r["cosine"])
        for r in knn_join(sdf, k=k, n_cells=1, n_probe=1).collect()
    }

    import math

    def cos(a, b):
        dot = 0.0
        for x, y in zip(a, b):
            dot += float(x) * float(y)
        na = math.sqrt(sum(float(x) * float(x) for x in a))
        nb = math.sqrt(sum(float(x) * float(x) for x in b))
        return math.floor(dot / (na * nb) * 1e6 + 0.5) / 1e6

    vecs = dict(rows)
    for i in range(n):
        scored = sorted(
            ((cos(vecs[i], vecs[j]), j) for j in range(n) if j != i),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        for rk, (c, j) in enumerate(scored, start=1):
            nbr, got_c = got[(i, rk)]
            assert nbr == j and abs(got_c - c) < 1e-9, (i, rk, (j, c), (nbr, got_c))
