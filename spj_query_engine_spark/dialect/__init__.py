"""Reference-dialect SQL front-end.

Parses the restricted SQL dialect of the reference engine (grammar:
``src/qp/parser/parser.cup``, lexer: ``src/qp/parser/scaner.lex`` in
/root/reference) into a :class:`~spj_query_engine_spark.dialect.ast.SQLQuery`
IR and builds a DataFrame plan from it.

Dialect quirks preserved (SURVEY.md §2.2):

* WHERE conditions are comma-separated and implicitly ANDed.
* All literals are quoted strings, coerced by column type at eval time.
* ``GROUPBY`` / ``ORDERBY`` are single keywords.
* Attributes are always ``TABLE.col``; no aliases, no self-joins.
* Cross-table ``attr op attr`` → join condition; same-table → selection.
* GROUPBY without aggregates = distinct grouping keys.
"""

from spj_query_engine_spark.dialect.ast import Attr, Condition, SelectItem, SQLQuery  # noqa: F401
from spj_query_engine_spark.dialect.parser import parse  # noqa: F401
