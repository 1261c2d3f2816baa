"""Recursive-descent parser for the reference SQL dialect.

Grammar transcribed from the reference's java_cup spec
(``src/qp/parser/parser.cup:79-227``) and JLex spec
(``src/qp/parser/scaner.lex``)::

    query     := SELECT [DISTINCT] selectlist FROM tablelist
                 [WHERE condlist] [GROUPBY attrlist] [ORDERBY attrlist]
    selectlist:= '*' | selitem (',' selitem)*
    selitem   := attr | AGGFUNC '(' attr ')'
    AGGFUNC   := MAX | MIN | SUM | COUNT | AVG
    tablelist := ID (',' ID)*
    condlist  := cond (',' cond)*            -- comma = AND
    cond      := attr relop (LITERAL | attr)
    relop     := '<' | '>' | '<=' | '>=' | '=' | '!='
    attr      := ID '.' ID                   -- always qualified
    LITERAL   := '"' chars '"'               -- ALL literals are quoted

No OR/NOT/parens/IN/LIKE/BETWEEN/IS NULL, no numeric literal token, no table
aliases, no LIMIT — exactly the reference surface (SURVEY.md §2.2).
"""

from __future__ import annotations

import re

from spj_query_engine_spark.dialect.ast import Attr, Condition, SelectItem, SQLQuery

_KEYWORDS = {"SELECT", "DISTINCT", "FROM", "WHERE", "GROUPBY", "ORDERBY"}
_AGG_FUNCS = {"MAX", "MIN", "SUM", "COUNT", "AVG"}
_RELOPS = ("<=", ">=", "!=", "<", ">", "=")

_TOKEN_RE = re.compile(
    r"""
    \s+
  | "(?P<lit>[^"]*)"
  | (?P<relop><=|>=|!=|<|>|=)
  | (?P<punct>[,.()*])
  | (?P<word>[A-Za-z_][A-Za-z0-9_]*)
    """,
    re.VERBOSE,
)


class DialectParseError(ValueError):
    pass


def _tokenize(text: str) -> list[tuple[str, str]]:
    tokens: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise DialectParseError(f"lexical error at offset {pos}: {text[pos:pos + 20]!r}")
        pos = m.end()
        if m.lastgroup is None:  # whitespace
            continue
        kind = m.lastgroup
        value = m.group(kind)
        if kind == "word" and value.upper() in (_KEYWORDS | _AGG_FUNCS):
            tokens.append(("kw", value.upper()))
        else:
            tokens.append((kind, value))
    tokens.append(("eof", ""))
    return tokens


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.tokens = tokens
        self.i = 0

    def peek(self) -> tuple[str, str]:
        return self.tokens[self.i]

    def next(self) -> tuple[str, str]:
        tok = self.tokens[self.i]
        self.i += 1
        return tok

    def expect(self, kind: str, value: str | None = None) -> str:
        k, v = self.next()
        if k != kind or (value is not None and v != value):
            raise DialectParseError(f"expected {value or kind}, got {v!r}")
        return v

    def accept_kw(self, word: str) -> bool:
        if self.peek() == ("kw", word):
            self.i += 1
            return True
        return False

    # ---- grammar ----

    def query(self) -> SQLQuery:
        self.expect("kw", "SELECT")
        is_distinct = self.accept_kw("DISTINCT")
        select_list = self.select_list()
        self.expect("kw", "FROM")
        from_list = self.id_list()
        conditions: list[Condition] = []
        groupby: list[Attr] = []
        orderby: list[Attr] = []
        if self.accept_kw("WHERE"):
            conditions = self.cond_list()
        if self.accept_kw("GROUPBY"):
            groupby = self.attr_list()
        if self.accept_kw("ORDERBY"):
            orderby = self.attr_list()
        self.expect("eof")
        return SQLQuery(select_list, from_list, conditions, groupby, orderby, is_distinct)

    def select_list(self) -> list[SelectItem]:
        if self.peek() == ("punct", "*"):
            self.next()
            return []  # empty list ⇒ SELECT * (parser.cup:84-89)
        items = [self.select_item()]
        while self.peek() == ("punct", ","):
            self.next()
            items.append(self.select_item())
        return items

    def select_item(self) -> SelectItem:
        kind, value = self.peek()
        if kind == "kw" and value in _AGG_FUNCS:
            self.next()
            self.expect("punct", "(")
            attr = self.attr()
            self.expect("punct", ")")
            return SelectItem(attr, agg=value)
        return SelectItem(self.attr())

    def id_list(self) -> list[str]:
        ids = [self.expect("word")]
        while self.peek() == ("punct", ","):
            self.next()
            ids.append(self.expect("word"))
        return ids

    def attr(self) -> Attr:
        table = self.expect("word")
        self.expect("punct", ".")
        column = self.expect("word")
        return Attr(table, column)

    def attr_list(self) -> list[Attr]:
        attrs = [self.attr()]
        while self.peek() == ("punct", ","):
            self.next()
            attrs.append(self.attr())
        return attrs

    def cond_list(self) -> list[Condition]:
        conds = [self.cond()]
        while self.peek() == ("punct", ","):
            self.next()
            conds.append(self.cond())
        return conds

    def cond(self) -> Condition:
        lhs = self.attr()
        kind, op = self.next()
        if kind != "relop":
            raise DialectParseError(f"expected comparison operator, got {op!r}")
        kind, value = self.peek()
        if kind == "lit":
            self.next()
            return Condition(lhs, op, value)
        return Condition(lhs, op, self.attr())


def parse(text: str) -> SQLQuery:
    """Parse one dialect query (the reference reads a single query per file,
    ``QueryMain.java:82-106``)."""
    return _Parser(_tokenize(text)).query()
