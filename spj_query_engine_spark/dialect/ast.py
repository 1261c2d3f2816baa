"""IR for the reference dialect — the analog of the reference's ``SQLQuery``
(``src/qp/utils/SQLQuery.java:11-24``): six lists + a distinct flag, with the
WHERE list split into selection vs join conditions by table analysis
(``SQLQuery.java:51-68``)."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Attr:
    """A ``TABLE.col`` attribute (the dialect has no bare columns —
    ``parser.cup:193-196``)."""

    table: str
    column: str

    def __str__(self) -> str:
        return f"{self.table}.{self.column}"


@dataclass(frozen=True)
class WindowSpec:
    """Extended-grammar OVER clause: ``OVER (PARTITIONBY attrs [ORDERBY
    attrs])``.  With an ORDERBY the frame is the SQL default (RANGE
    UNBOUNDED PRECEDING..CURRENT ROW — running aggregate, ties are peers);
    without one it spans the whole partition.  Strict mode never produces
    this node (the reference grammar has no OVER token)."""

    partition: tuple[Attr, ...] = ()
    order: tuple[Attr, ...] = ()


@dataclass(frozen=True)
class SelectItem:
    """Select-list entry: a plain attribute or ``AGG(attr)``
    (``parser.cup:197-221``); extended grammar adds ``AGG(attr) OVER
    (...)`` window items."""

    attr: Attr
    agg: str | None = None  # MAX | MIN | SUM | COUNT | AVG | None
    over: "WindowSpec | None" = None  # extended grammar only


@dataclass(frozen=True)
class Condition:
    """``lhs op rhs`` where rhs is a quoted literal or another attribute
    (``src/qp/utils/Condition.java``)."""

    lhs: Attr
    op: str  # one of < > <= >= = !=
    rhs: Attr | str  # Attr → attribute compare; str → literal (always quoted)

    @property
    def is_attr_compare(self) -> bool:
        return isinstance(self.rhs, Attr)

    @property
    def is_join(self) -> bool:
        """Cross-table attribute compares are join conditions; same-table
        ones are selections (``SQLQuery.java:51-68``)."""
        return self.is_attr_compare and self.rhs.table != self.lhs.table


@dataclass(frozen=True)
class HavingCond:
    """Extended-grammar HAVING entry: ``AGG(attr) relop literal`` (or a bare
    ``attr relop literal`` over a grouping key).  Not part of the reference
    grammar (parser.cup:155-191 has no HAVING token) — only produced with
    ``parse(..., extended=True)``."""

    attr: Attr
    op: str
    rhs: str  # quoted literal, coerced by the builder against the agg dtype
    agg: str | None = None  # None → condition on a grouping key


@dataclass(frozen=True)
class JoinClause:
    """Extended-grammar explicit join step: ``[LEFT] JOIN table ON cond``.
    Joins chain left-deep in declared order; strict mode (comma FROM list +
    WHERE join conditions) never produces these."""

    table: str
    kind: str  # "inner" | "left"
    cond: Condition


@dataclass
class SQLQuery:
    select_list: list[SelectItem]  # empty ⇒ SELECT * (parser.cup:84-89)
    from_list: list[str]
    conditions: list[Condition] = field(default_factory=list)
    groupby: list[Attr] = field(default_factory=list)
    orderby: list[Attr] = field(default_factory=list)
    is_distinct: bool = False
    # --- extended grammar only (empty/None under the strict reference mode) ---
    having: list[HavingCond] = field(default_factory=list)
    orderby_desc: list[bool] = field(default_factory=list)  # parallel to orderby
    orderby_agg: list[str | None] = field(default_factory=list)  # parallel; AGG name or None
    limit: int | None = None
    joins: list["JoinClause"] = field(default_factory=list)  # explicit-join chain

    @property
    def is_star(self) -> bool:
        return not self.select_list

    @property
    def selection_conditions(self) -> list[Condition]:
        return [c for c in self.conditions if not c.is_join]

    @property
    def join_conditions(self) -> list[Condition]:
        return [c for c in self.conditions if c.is_join]

    @property
    def agg_items(self) -> list[SelectItem]:
        return [s for s in self.select_list if s.agg]


@dataclass
class SetQuery:
    """Extended-grammar compound query: ``left OP right`` with SQL distinct
    set semantics (UNION | INTERSECT | EXCEPT), left-associative chains.
    Strict mode never produces this node."""

    op: str  # UNION | INTERSECT | EXCEPT
    left: "SQLQuery | SetQuery"
    right: "SQLQuery | SetQuery"
