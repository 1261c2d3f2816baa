#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every queries() entry
through Spark AND its oracle_sql() through DuckDB on the same parquet tables,
compare order-insensitively, print a per-query verdict.

Usage: python scripts/check_correctness.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spj_query_engine_spark.catalog import TABLES, table_path
from spj_query_engine_spark.session import get_spark
from spj_query_engine_spark.testing import compare_frames

import __spark_entry__ as entrymod


def _driver_sortable(pdf) -> str | None:
    """Replicate the DRIVER's canonicalization hazard: it sorts the raw
    frame by every column with pandas, so array/map/struct cells
    (numpy.ndarray / dict — unhashable) abort the compare even though our
    local normalize() tuple-izes them (CORRECTNESS_r02: m01, u01).  Returns
    the error string if the driver would blow up, else None."""
    try:
        if len(pdf.columns):
            pdf.sort_values(by=list(pdf.columns))
        return None
    except TypeError as exc:
        return f"driver canonicalization would fail: {exc}"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2:]

    spark = get_spark(app_name="check_correctness")
    con = duckdb.connect()
    for name in TABLES:
        path = table_path(sf_dir, name)
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results: dict[str, dict] = {}
    failed = []
    for name, fn in queries.items():
        if name_filter and not any(f in name for f in name_filter):
            continue
        t0 = time.time()
        try:
            actual = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            results[name] = {"status": "spark_error", "error": str(exc)[:500]}
            failed.append(name)
            print(f"  {name}: SPARK ERROR {str(exc)[:200]}")
            continue
        if name not in oracles:
            results[name] = {"status": "rows_only", "rows": len(actual)}
            print(f"  {name}: rows-only ({len(actual)} rows) [{time.time() - t0:.1f}s]")
            continue
        try:
            expected = con.execute(oracles[name]).fetch_df()
        except Exception as exc:  # noqa: BLE001
            results[name] = {"status": "oracle_error", "error": str(exc)[:500]}
            failed.append(name)
            print(f"  {name}: ORACLE ERROR {str(exc)[:200]}")
            continue
        canon_err = _driver_sortable(actual) or _driver_sortable(expected)
        if canon_err:
            results[name] = {"status": "driver_canon_error", "error": canon_err}
            failed.append(name)
            print(f"  {name}: DRIVER CANON ERROR {canon_err[:200]}")
            continue
        errors = compare_frames(actual, expected)
        if errors:
            results[name] = {"status": "mismatch", "errors": errors[:5]}
            failed.append(name)
            print(f"  {name}: MISMATCH {errors[:2]}")
        else:
            results[name] = {"status": "match", "rows": len(actual)}
            print(f"  {name}: match ({len(actual)} rows) [{time.time() - t0:.1f}s]")

    out_path = os.environ.get("SPJ_CORRECTNESS_OUT")
    if out_path:
        import datetime

        with open(out_path, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "ts": datetime.datetime.now(datetime.timezone.utc)
                    .isoformat(timespec="seconds")
                    .replace("+00:00", "Z"),
                    "failed": failed,
                    "results": results,
                },
                fh,
                indent=1,
            )
    print(json.dumps({"sf_dir": sf_dir, "failed": failed, "total": len(results)}))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
