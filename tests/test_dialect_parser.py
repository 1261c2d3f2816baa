"""Parser tests: the full 16-query reference corpus must parse, and the IR
must reproduce the reference's condition-splitting semantics
(SQLQuery.java:51-68)."""

from __future__ import annotations

import glob
import os

import pytest

from spj_query_engine_spark.dialect import Attr, parse
from spj_query_engine_spark.dialect.parser import DialectParseError

# Vendored copy of the reference's 16-query test corpus
# (test-queries/*.sql) so the parity parametrization can never silently
# vanish when /root/reference is absent.
_CORPUS_DIR = os.path.join(os.path.dirname(__file__), "reference_queries")
REF_QUERIES = sorted(glob.glob(os.path.join(_CORPUS_DIR, "*.sql")))


def test_corpus_vendored_completely():
    # Hard failure if the vendored corpus goes missing or is truncated.
    assert len(REF_QUERIES) == 16, REF_QUERIES
    live = sorted(glob.glob("/root/reference/test-queries/*.sql"))
    if live:  # when the reference is present, the vendored copy must match it
        assert [os.path.basename(p) for p in live] == [
            os.path.basename(p) for p in REF_QUERIES
        ]
        for lp, vp in zip(live, REF_QUERIES):
            assert open(lp).read() == open(vp).read(), lp


@pytest.mark.parametrize("path", REF_QUERIES, ids=[os.path.basename(p) for p in REF_QUERIES])
def test_reference_corpus_parses(path):
    q = parse(open(path).read())
    assert q.from_list


def test_condition_split_semantics():
    q = parse(
        'SELECT A.x FROM A, B WHERE A.x = B.y, A.x > "5", A.x < A.z'
    )
    joins = q.join_conditions
    sels = q.selection_conditions
    # cross-table attr compare → join list
    assert len(joins) == 1 and joins[0].rhs == Attr("B", "y")
    # literal compare AND same-table attr compare → selection list
    assert len(sels) == 2
    assert sels[0].rhs == "5" and sels[1].rhs == Attr("A", "z")


def test_star_distinct_groupby_orderby():
    q = parse("SELECT DISTINCT * FROM T GROUPBY T.a, T.b ORDERBY T.a")
    assert q.is_star and q.is_distinct
    assert q.groupby == [Attr("T", "a"), Attr("T", "b")]
    assert q.orderby == [Attr("T", "a")]


def test_aggregates_parse():
    q = parse("SELECT T.g, MAX(T.x), COUNT(T.y), AVG(T.z) FROM T GROUPBY T.g")
    aggs = [(s.agg, str(s.attr)) for s in q.agg_items]
    assert aggs == [("MAX", "T.x"), ("COUNT", "T.y"), ("AVG", "T.z")]


def test_all_six_relops():
    for op in ("<", ">", "<=", ">=", "=", "!="):
        q = parse(f'SELECT T.a FROM T WHERE T.a {op} "1"')
        assert q.conditions[0].op == op


def test_quoted_literals_only():
    # The dialect has no numeric literal token (scaner.lex) — bare numbers
    # must be a parse error.
    with pytest.raises(DialectParseError):
        parse("SELECT T.a FROM T WHERE T.a > 5")


def test_unqualified_attr_rejected():
    with pytest.raises(DialectParseError):
        parse("SELECT a FROM T")


@pytest.mark.parametrize(
    "sql",
    [
        'SELECT T.a FROM T WHERE T.a="1" OR T.b="2"',  # no OR (comma = AND)
        "SELECT t.a FROM CUSTOMER t",  # no table aliases (parser.cup:142-153)
        "SELECT T.a FROM T LIMIT 5",  # no LIMIT token in the grammar
    ],
)
def test_out_of_grammar_rejected(sql):
    with pytest.raises(DialectParseError):
        parse(sql)
