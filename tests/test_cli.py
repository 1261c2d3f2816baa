"""CLI driver (__main__) — the QueryMain analog, run in-process."""

from __future__ import annotations

import glob

from spj_query_engine_spark.__main__ import main

from tests.conftest import SF_DIR


def test_cli_end_to_end(spark, tmp_path, capsys):
    qfile = tmp_path / "q.sql"
    qfile.write_text(
        'SELECT customer.c_mktsegment, COUNT(orders.o_orderkey) '
        "FROM customer, orders WHERE customer.c_custkey = orders.o_custkey "
        "GROUPBY customer.c_mktsegment"
    )
    out = str(tmp_path / "res")
    rc = main([str(qfile), out, "--tables", SF_DIR, "--explain", "--yes"])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "== plan report ==" in printed
    header = open(f"{out}/_header", encoding="utf-8").read().strip()
    assert header == "c_mktsegment\tcount_o_orderkey"
    rows = []
    for part in glob.glob(f"{out}/part-*.txt"):
        rows += open(part, encoding="utf-8").read().splitlines()
    assert len(rows) == 5  # five market segments
    assert all("\t" in r for r in rows)


def test_cli_extended_grammar_flag(spark, tmp_path):
    qfile = tmp_path / "qe.sql"
    qfile.write_text(
        "SELECT orders.o_custkey, COUNT(orders.o_orderkey) FROM orders "
        'GROUPBY orders.o_custkey HAVING COUNT(orders.o_orderkey)>"15" '
        'ORDERBY orders.o_custkey DESC LIMIT "5"'
    )
    out = str(tmp_path / "res_ext")
    rc = main([str(qfile), out, "--tables", SF_DIR, "--extended-grammar", "--yes"])
    assert rc == 0
    rows = []
    for part in glob.glob(f"{out}/part-*.txt"):
        rows += open(part, encoding="utf-8").read().splitlines()
    assert len(rows) == 5  # LIMIT applied
    # strict mode rejects the same file
    import pytest

    from spj_query_engine_spark.dialect.parser import DialectParseError

    with pytest.raises(DialectParseError):
        main([str(qfile), str(tmp_path / "res_strict"), "--tables", SF_DIR, "--yes"])
