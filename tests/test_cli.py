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
