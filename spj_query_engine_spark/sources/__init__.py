"""Sources & sinks — the reference's data-preparation and result paths.

Reference pipeline (SURVEY.md §3.2): a hand-written ``<T>.det`` schema spec is
consumed by ``RandomDB`` (``src/RandomDB.java:17-176`` in ``/root/reference/``)
to emit ``<T>.md`` (schema), ``<T>.txt`` (tab-separated rows), ``<T>.stat``
(row count + NDV); ``ConvertTxtToTbl`` (``src/ConvertTxtToTbl.java:18-73``)
then serializes ``.txt`` to the engine's ``.tbl`` tuple files.  Results come
out of ``QueryMain`` as a tab-separated text file with ``-NULL-`` for nulls
(``src/QueryMain.java:230-244``).

Spark-first equivalents:

* :mod:`.schema` — ``.det`` text → :class:`TableSpec` → ``StructType``.
* :mod:`.generator` — distributed deterministic random table generation
  (replaces the single-threaded, wall-clock-seeded ``RandomDB``).
* :mod:`.readers` — tab-text (the ``.txt`` format), CSV and JSON sources;
  parquet is the native path in :mod:`spj_query_engine_spark.catalog`.
* :mod:`.sink` — the reference's result format as a distributed text write.
"""

from spj_query_engine_spark.sources.schema import ColumnSpec, TableSpec, parse_det, spec_to_struct
from spj_query_engine_spark.sources.generator import generate_table, compute_stats
from spj_query_engine_spark.sources.readers import read_tab_text, read_csv, read_json
from spj_query_engine_spark.sources.sink import collect_result, result_lines, write_result_text

__all__ = [
    "ColumnSpec",
    "TableSpec",
    "parse_det",
    "spec_to_struct",
    "generate_table",
    "compute_stats",
    "read_tab_text",
    "read_csv",
    "read_json",
    "collect_result",
    "result_lines",
    "write_result_text",
]
