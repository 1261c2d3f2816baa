"""CLI driver — the ``QueryMain`` analog.

Reference: ``java QueryMain <queryfile> <resultfile> <pagesize> <numbuffer>``
parses one dialect query, prints the chosen plan + estimated cost, asks for
confirmation, executes, and writes a tab-separated result file
(``src/QueryMain.java:21-59`` in ``/root/reference/``).

Here::

    python -m spj_query_engine_spark <queryfile> <resultfile> \
        [--tables DIR] [--explain] [--yes]

``pagesize``/``numbuffer`` have no equivalent (Spark's memory manager owns
paging); ``--explain`` prints the plan report (the ``printFinalPlan`` analog)
and ``--yes`` skips the interactive confirmation, mirroring the reference's
prompt loop.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="spj_query_engine_spark")
    ap.add_argument("queryfile", help="file containing one dialect query")
    ap.add_argument("resultfile", help="output path (directory of text parts)")
    ap.add_argument(
        "--tables",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"),
        help="directory of <table>.parquet files",
    )
    ap.add_argument("--explain", action="store_true", help="print the plan report")
    ap.add_argument(
        "--yes", action="store_true", help="skip the confirm prompt (QueryMain parity)"
    )
    ap.add_argument(
        "--extended-grammar",
        action="store_true",
        help="enable the superset grammar (HAVING / LIMIT / ASC|DESC / "
        "UNION|INTERSECT|EXCEPT); default is the strict reference grammar",
    )
    args = ap.parse_args(argv)

    from spj_query_engine_spark.catalog import load_tables
    from spj_query_engine_spark.dialect import parse
    from spj_query_engine_spark.plans import build_plan
    from spj_query_engine_spark.plans.report import explain_report
    from spj_query_engine_spark.session import get_spark
    from spj_query_engine_spark.sources.sink import write_result_text

    with open(args.queryfile, encoding="utf-8") as fh:
        sql = fh.read()

    spark = get_spark(app_name="spj-query")
    tables = load_tables(spark, args.tables)
    df = build_plan(spark, tables, parse(sql, extended=args.extended_grammar))

    if args.explain:
        print(explain_report(df))
    if not args.yes:
        ans = input("execute? [y/n] ").strip().lower()
        if ans not in ("y", "yes", ""):
            print("aborted")
            return 1

    t0 = time.time()
    write_result_text(df, args.resultfile)
    print(f"result written to {args.resultfile} in {time.time() - t0:.2f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
