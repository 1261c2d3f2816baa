"""spj_query_engine_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference SPJ-Query-Engine (a single-threaded Volcano-style Java engine; see
SURVEY.md), re-expressed Spark-first:

* The reference's operator tree (Scan / Select / Project / Join / Distinct /
  GroupBy — ``src/qp/operators/*`` in the reference) becomes declarative
  DataFrame plan builders (:mod:`spj_query_engine_spark.operators.core`); the
  Volcano ``open()/next()/close()`` page loop, buffer manager, spill files and
  the randomized join-order optimizer all collapse into Catalyst + AQE.
* The reference SQL dialect (comma-AND, ``GROUPBY``/``ORDERBY`` keywords,
  all-quoted literals, mandatory ``TABLE.col``; grammar in
  ``src/qp/parser/parser.cup``) is parsed by a small recursive-descent
  front-end (:mod:`spj_query_engine_spark.dialect`) into the same builders.
* Capabilities the reference parses but aborts on (aggregates, ORDERBY) are
  implemented properly (``groupBy().agg()`` / ``orderBy``) — see SURVEY.md §7
  decision D2.
* Beyond-reference, large-scale training-data-pipeline operators (dedup,
  similarity search, text analysis, temporal joins, streaming ingest,
  multimodal columns) live under :mod:`spj_query_engine_spark.operators` and
  :mod:`spj_query_engine_spark.streaming`.

Everything here is built on public Apache Spark APIs only.
"""

__version__ = "0.1.0"

from spj_query_engine_spark.session import get_spark, tune_session  # noqa: F401
from spj_query_engine_spark.catalog import TABLES, load_tables, register_tables  # noqa: F401
