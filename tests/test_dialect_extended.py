"""Extended-grammar front end: HAVING / LIMIT / ASC|DESC / set ops behind
``parse(..., extended=True)``, while STRICT mode keeps rejecting all of them
(the reference grammar, parser.cup:155-191, has none of these tokens).
"""

from __future__ import annotations

import pytest

from spj_query_engine_spark.dialect import parse
from spj_query_engine_spark.dialect.parser import DialectParseError
from spj_query_engine_spark.dialect.ast import SetQuery
from spj_query_engine_spark.plans import build_plan

from tests.conftest import assert_same_result


# ---- parsing ----


def test_parse_having_limit_desc():
    q = parse(
        'SELECT T.g, SUM(T.x) FROM T GROUPBY T.g HAVING SUM(T.x)>"10", T.g<"5" '
        'ORDERBY T.g DESC LIMIT "3"',
        extended=True,
    )
    assert [(h.agg, str(h.attr), h.op, h.rhs) for h in q.having] == [
        ("SUM", "T.x", ">", "10"),
        (None, "T.g", "<", "5"),
    ]
    assert q.orderby_desc == [True]
    assert q.limit == 3


def test_parse_set_ops_left_assoc():
    q = parse(
        "SELECT T.a FROM T UNION SELECT U.a FROM U EXCEPT SELECT V.a FROM V",
        extended=True,
    )
    assert isinstance(q, SetQuery) and q.op == "EXCEPT"
    assert isinstance(q.left, SetQuery) and q.left.op == "UNION"


@pytest.mark.parametrize(
    "sql",
    [
        'SELECT T.g FROM T GROUPBY T.g HAVING T.g>"1"',
        'SELECT T.a FROM T LIMIT "5"',
        "SELECT T.a FROM T ORDERBY T.a DESC",
        "SELECT T.a FROM T UNION SELECT U.a FROM U",
    ],
)
def test_strict_mode_rejects_extensions(sql):
    with pytest.raises(DialectParseError):
        parse(sql)  # extended=False: reference grammar, extensions are errors


def test_extended_mode_still_parses_strict_queries():
    strict_sql = 'SELECT T.a, MAX(T.b) FROM T WHERE T.a>"1" GROUPBY T.a ORDERBY T.a'
    a, b = parse(strict_sql), parse(strict_sql, extended=True)
    assert a == b


def test_limit_requires_integer_literal():
    with pytest.raises(DialectParseError):
        parse('SELECT T.a FROM T LIMIT "ten"', extended=True)


# ---- execution vs DuckDB on the e-commerce fixture ----


@pytest.fixture(scope="module")
def duck(ecommerce_duck):
    return ecommerce_duck


def test_having_executes(spark, ecommerce, duck):
    df = build_plan(
        spark,
        ecommerce,
        parse(
            "SELECT CARTDETAILS.cartid, SUM(CARTDETAILS.qty) FROM CARTDETAILS "
            'GROUPBY CARTDETAILS.cartid HAVING SUM(CARTDETAILS.qty)>"40"',
            extended=True,
        ),
    )
    assert_same_result(
        df,
        duck,
        "SELECT cartid, CAST(SUM(qty) AS BIGINT) AS sum_qty FROM CARTDETAILS "
        "GROUP BY cartid HAVING SUM(qty) > 40",
    )


def test_having_agg_not_in_select(spark, ecommerce, duck):
    # the HAVING aggregate is computed but not projected
    df = build_plan(
        spark,
        ecommerce,
        parse(
            "SELECT BILL.iid FROM BILL GROUPBY BILL.iid "
            'HAVING COUNT(BILL.amount)>"2"',
            extended=True,
        ),
    )
    assert_same_result(
        df, duck, "SELECT iid FROM BILL GROUP BY iid HAVING COUNT(amount) > 2"
    )


def test_orderby_desc_limit_topk(spark, ecommerce, duck):
    df = build_plan(
        spark,
        ecommerce,
        parse(
            'SELECT BILL.billid, BILL.amount FROM BILL WHERE BILL.amount>"2000" '
            'ORDERBY BILL.amount DESC, BILL.billid ASC LIMIT "5"',
            extended=True,
        ),
    )
    # deterministic top-k (amount DESC, billid ASC tie-break) — order-insensitive
    # compare still proves the SET is the true top 5
    assert_same_result(
        df,
        duck,
        "SELECT billid, amount FROM BILL WHERE amount > 2000 "
        "ORDER BY amount DESC, billid ASC LIMIT 5",
    )


def test_union_executes(spark, ecommerce, duck):
    df = build_plan(
        spark,
        ecommerce,
        parse(
            'SELECT CART.cid FROM CART WHERE CART.cid<"20" UNION '
            'SELECT CUSTOMER.cid FROM CUSTOMER WHERE CUSTOMER.cid<"10"',
            extended=True,
        ),
    )
    assert_same_result(
        df,
        duck,
        "SELECT cid FROM CART WHERE cid < 20 UNION "
        "SELECT cid FROM CUSTOMER WHERE cid < 10",
    )


def test_except_executes(spark, ecommerce, duck):
    df = build_plan(
        spark,
        ecommerce,
        parse(
            "SELECT CUSTOMER.cid FROM CUSTOMER EXCEPT SELECT CART.cid FROM CART",
            extended=True,
        ),
    )
    assert_same_result(
        df, duck, "SELECT cid FROM CUSTOMER EXCEPT SELECT cid FROM CART"
    )


def test_orderby_aggregate_topk(spark, ecommerce, duck):
    # ORDER BY the aggregate itself (extended grammar) — the natural top-k
    df = build_plan(
        spark,
        ecommerce,
        parse(
            "SELECT CARTDETAILS.cartid, SUM(CARTDETAILS.qty) FROM CARTDETAILS "
            "GROUPBY CARTDETAILS.cartid "
            'ORDERBY SUM(CARTDETAILS.qty) DESC, CARTDETAILS.cartid ASC LIMIT "5"',
            extended=True,
        ),
    )
    assert_same_result(
        df,
        duck,
        "SELECT cartid, CAST(SUM(qty) AS BIGINT) AS sum_qty FROM CARTDETAILS "
        "GROUP BY cartid ORDER BY sum_qty DESC, cartid ASC LIMIT 5",
    )


def test_orderby_aggregate_requires_selected(spark, ecommerce):
    from spj_query_engine_spark.plans.builder import PlanError

    with pytest.raises(PlanError):
        build_plan(
            spark,
            ecommerce,
            parse(
                "SELECT CARTDETAILS.cartid FROM CARTDETAILS "
                "GROUPBY CARTDETAILS.cartid ORDERBY SUM(CARTDETAILS.qty) DESC",
                extended=True,
            ),
        ).collect()


def test_having_preserves_groupby_drop_semantics(spark, ecommerce, duck):
    """GROUPBY-without-select-aggregates drops non-key select columns
    (reference semantics); adding a HAVING aggregate must keep that
    projection rule, not reject the query."""
    df = build_plan(
        spark,
        ecommerce,
        parse(
            "SELECT CARTDETAILS.cartid, CARTDETAILS.qty FROM CARTDETAILS "
            'GROUPBY CARTDETAILS.cartid HAVING COUNT(CARTDETAILS.qty)>"1"',
            extended=True,
        ),
    )
    assert df.columns == ["cartid"]  # qty dropped, as without HAVING
    assert_same_result(
        df,
        duck,
        "SELECT cartid FROM CARTDETAILS GROUP BY cartid HAVING COUNT(qty) > 1",
    )


def test_strict_mode_rejects_over():
    from spj_query_engine_spark.dialect import parse
    from spj_query_engine_spark.dialect.parser import DialectParseError

    with pytest.raises(DialectParseError):
        parse(
            "SELECT SUM(orders.o_totalprice) OVER (PARTITIONBY orders.o_custkey) "
            "FROM orders"
        )


def test_extended_parses_over_variants():
    from spj_query_engine_spark.dialect import parse

    q = parse(
        "SELECT orders.o_custkey, SUM(orders.o_totalprice) OVER "
        "(PARTITIONBY orders.o_custkey ORDERBY orders.o_orderdate) FROM orders",
        extended=True,
    )
    item = q.select_list[1]
    assert item.agg == "SUM" and item.over is not None
    assert [a.column for a in item.over.partition] == ["o_custkey"]
    assert [a.column for a in item.over.order] == ["o_orderdate"]
    # bare OVER () = whole-relation window
    q2 = parse(
        "SELECT COUNT(orders.o_orderkey) OVER () FROM orders", extended=True
    )
    assert q2.select_list[0].over is not None
    assert q2.select_list[0].over.partition == ()


def test_window_groupby_mix_rejected(spark):
    from spj_query_engine_spark.catalog import load_tables
    from spj_query_engine_spark.dialect import parse
    from spj_query_engine_spark.plans import build_plan
    from spj_query_engine_spark.plans.builder import PlanError

    tables = load_tables(spark, "/root/testdata/sf0.001", ("orders",))
    q = parse(
        "SELECT SUM(orders.o_totalprice) OVER (PARTITIONBY orders.o_custkey) "
        "FROM orders GROUPBY orders.o_custkey",
        extended=True,
    )
    with pytest.raises(PlanError):
        build_plan(spark, tables, q)


def test_strict_mode_rejects_explicit_join():
    from spj_query_engine_spark.dialect import parse
    from spj_query_engine_spark.dialect.parser import DialectParseError

    with pytest.raises(DialectParseError):
        parse(
            "SELECT customer.c_custkey FROM customer "
            "LEFT JOIN orders ON customer.c_custkey = orders.o_custkey"
        )


def test_explicit_join_where_applies_after_left_join(spark):
    """In explicit-join mode WHERE is post-join (SQL semantics): filtering
    the RIGHT side of a LEFT JOIN in WHERE drops the null-extended rows,
    unlike the same predicate inside ON."""
    from spj_query_engine_spark.catalog import load_tables
    from spj_query_engine_spark.dialect import parse
    from spj_query_engine_spark.plans import build_plan

    tables = load_tables(spark, "/root/testdata/sf0.001", ("customer", "orders"))
    left_only = build_plan(
        spark,
        tables,
        parse(
            "SELECT customer.c_custkey, orders.o_orderkey FROM customer "
            "LEFT JOIN orders ON customer.c_custkey = orders.o_custkey "
            'WHERE orders.o_orderstatus = "O"',
            extended=True,
        ),
    )
    # every surviving row has a real order (WHERE killed the null extension)
    assert left_only.filter("o_orderkey IS NULL").count() == 0
    inner_equiv = build_plan(
        spark,
        tables,
        parse(
            "SELECT customer.c_custkey, orders.o_orderkey FROM customer, orders "
            "WHERE customer.c_custkey = orders.o_custkey, "
            'orders.o_orderstatus = "O"',
            extended=True,
        ),
    )
    assert left_only.count() == inner_equiv.count()


def test_mixed_comma_and_join_rejected():
    from spj_query_engine_spark.dialect import parse
    from spj_query_engine_spark.dialect.parser import DialectParseError

    with pytest.raises(DialectParseError):
        parse(
            "SELECT nation.n_name FROM region, nation "
            "JOIN supplier ON nation.n_nationkey = supplier.s_nationkey",
            extended=True,
        )
