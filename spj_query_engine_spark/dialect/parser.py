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

``parse(text, extended=True)`` opts into a superset grammar (OFF by default —
strict mode rejects every extension, preserving the reference's
out-of-grammar behavior)::

    queryexpr := query ((UNION|INTERSECT|EXCEPT) query)*   -- left-assoc,
                                                              distinct set ops
    query     := ... [HAVING havelist] [ORDERBY orditem (',' orditem)*]
                 [LIMIT LITERAL]
    havelist  := havecond (',' havecond)*                  -- comma = AND
    havecond  := AGGFUNC '(' attr ')' relop LITERAL | attr relop LITERAL
    orditem   := (attr | AGGFUNC '(' attr ')') [ASC|DESC]

Literals stay quoted (including the LIMIT count) — the extension adds no new
token kinds, only keywords, so every strict query parses identically in both
modes.
"""

from __future__ import annotations

import re

from spj_query_engine_spark.dialect.ast import (
    Attr,
    Condition,
    HavingCond,
    JoinClause,
    SelectItem,
    SetQuery,
    SQLQuery,
    WindowSpec,
)

_KEYWORDS = {"SELECT", "DISTINCT", "FROM", "WHERE", "GROUPBY", "ORDERBY"}
_AGG_FUNCS = {"MAX", "MIN", "SUM", "COUNT", "AVG"}
_EXT_KEYWORDS = {
    "HAVING", "LIMIT", "UNION", "INTERSECT", "EXCEPT", "ASC", "DESC",
    "OVER", "PARTITIONBY", "JOIN", "LEFT", "ON",
}
_SET_OPS = {"UNION", "INTERSECT", "EXCEPT"}
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


def _tokenize(text: str, extended: bool = False) -> list[tuple[str, str]]:
    keywords = _KEYWORDS | _AGG_FUNCS | (_EXT_KEYWORDS if extended else set())
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
        if kind == "word" and value.upper() in keywords:
            tokens.append(("kw", value.upper()))
        else:
            tokens.append((kind, value))
    tokens.append(("eof", ""))
    return tokens


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]], extended: bool = False):
        self.tokens = tokens
        self.extended = extended
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

    def query_expr(self) -> SQLQuery | SetQuery:
        """Top level: a single query (strict), optionally chained with
        UNION/INTERSECT/EXCEPT (extended), left-associative."""
        node: SQLQuery | SetQuery = self.query()
        while self.extended and self.peek()[0] == "kw" and self.peek()[1] in _SET_OPS:
            _, op = self.next()
            node = SetQuery(op, node, self.query())
        self.expect("eof")
        return node

    def query(self) -> SQLQuery:
        self.expect("kw", "SELECT")
        is_distinct = self.accept_kw("DISTINCT")
        select_list = self.select_list()
        self.expect("kw", "FROM")
        from_list, joins = self.from_clause()
        conditions: list[Condition] = []
        groupby: list[Attr] = []
        orderby: list[Attr] = []
        having: list[HavingCond] = []
        orderby_desc: list[bool] = []
        orderby_agg: list[str | None] = []
        limit: int | None = None
        if self.accept_kw("WHERE"):
            conditions = self.cond_list()
        if self.accept_kw("GROUPBY"):
            groupby = self.attr_list()
        if self.extended and self.accept_kw("HAVING"):
            having = self.having_list()
        if self.accept_kw("ORDERBY"):
            if self.extended:
                orderby, orderby_desc, orderby_agg = self.order_list()
                if not any(orderby_desc):
                    orderby_desc = []  # all-ascending ≡ strict parse
                if not any(a is not None for a in orderby_agg):
                    orderby_agg = []  # plain-attr ordering ≡ strict parse
            else:
                orderby = self.attr_list()
        if self.extended and self.accept_kw("LIMIT"):
            lit = self.expect("lit")
            try:
                limit = int(lit)
            except ValueError:
                raise DialectParseError(f"LIMIT expects an integer literal, got {lit!r}")
        return SQLQuery(
            select_list,
            from_list,
            conditions,
            groupby,
            orderby,
            is_distinct,
            having=having,
            orderby_desc=orderby_desc,
            orderby_agg=orderby_agg,
            limit=limit,
            joins=joins,
        )

    def from_clause(self) -> tuple[list[str], list[JoinClause]]:
        """Strict: comma table list.  Extended adds explicit left-deep join
        chains — ``t1 [LEFT] JOIN t2 ON cond ...`` (ON takes ONE condition;
        extra inner-join residuals belong in WHERE, which in explicit-join
        mode applies AFTER the joins, standard SQL semantics)."""
        tables = [self.expect("word")]
        joins: list[JoinClause] = []
        while True:
            if self.peek() == ("punct", ","):
                if joins:
                    raise DialectParseError(
                        "cannot mix comma FROM items with explicit JOIN syntax"
                    )
                self.next()
                tables.append(self.expect("word"))
                continue
            if self.extended and self.peek()[0] == "kw" and self.peek()[1] in ("JOIN", "LEFT"):
                if len(tables) > 1 and not joins:
                    raise DialectParseError(
                        "cannot mix comma FROM items with explicit JOIN syntax"
                    )
                kind = "inner"
                if self.accept_kw("LEFT"):
                    kind = "left"
                self.expect("kw", "JOIN")
                tbl = self.expect("word")
                self.expect("kw", "ON")
                cond = self.cond()
                tables.append(tbl)
                joins.append(JoinClause(tbl, kind, cond))
                continue
            return tables, joins

    def having_list(self) -> list[HavingCond]:
        conds = [self.having_cond()]
        while self.peek() == ("punct", ","):
            self.next()
            conds.append(self.having_cond())
        return conds

    def having_cond(self) -> HavingCond:
        kind, value = self.peek()
        agg = None
        if kind == "kw" and value in _AGG_FUNCS:
            self.next()
            agg = value
            self.expect("punct", "(")
            attr = self.attr()
            self.expect("punct", ")")
        else:
            attr = self.attr()
        kind, op = self.next()
        if kind != "relop":
            raise DialectParseError(f"expected comparison operator, got {op!r}")
        rhs = self.expect("lit")
        return HavingCond(attr, op, rhs, agg=agg)

    def order_list(self) -> tuple[list[Attr], list[bool], list[str | None]]:
        attrs: list[Attr] = []
        descs: list[bool] = []
        aggs: list[str | None] = []
        while True:
            kind, value = self.peek()
            if kind == "kw" and value in _AGG_FUNCS:
                self.next()
                aggs.append(value)
                self.expect("punct", "(")
                attrs.append(self.attr())
                self.expect("punct", ")")
            else:
                aggs.append(None)
                attrs.append(self.attr())
            if self.accept_kw("DESC"):
                descs.append(True)
            else:
                self.accept_kw("ASC")
                descs.append(False)
            if self.peek() == ("punct", ","):
                self.next()
                continue
            return attrs, descs, aggs

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
            over = None
            if self.extended and self.accept_kw("OVER"):
                over = self.window_spec()
            return SelectItem(attr, agg=value, over=over)
        return SelectItem(self.attr())

    def window_spec(self) -> WindowSpec:
        """Extended grammar: ``( [PARTITIONBY attrlist] [ORDERBY attrlist] )``
        — the same smashed-keyword convention as GROUPBY/ORDERBY."""
        self.expect("punct", "(")
        partition: list[Attr] = []
        order: list[Attr] = []
        if self.accept_kw("PARTITIONBY"):
            partition = self.attr_list()
        if self.accept_kw("ORDERBY"):
            order = self.attr_list()
        self.expect("punct", ")")
        return WindowSpec(tuple(partition), tuple(order))

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


def parse(text: str, extended: bool = False) -> SQLQuery | SetQuery:
    """Parse one dialect query (the reference reads a single query per file,
    ``QueryMain.java:82-106``).  ``extended=True`` enables the superset
    grammar (HAVING / LIMIT / ASC|DESC / set ops); the default strict mode
    rejects those exactly as the reference grammar would."""
    return _Parser(_tokenize(text, extended), extended).query_expr()
