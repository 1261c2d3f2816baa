"""Build a DataFrame plan from a dialect :class:`SQLQuery`.

This is the analog of the reference's ``RandomInitialPlan.prepareInitialPlan``
(``src/qp/optimizer/RandomInitialPlan.java:49-67``), which stacks operators in
a FIXED order: scan → per-table selections → joins → DISTINCT → project →
GROUPBY.  We declare the same logical plan; join *order* and *algorithm* —
the entire job of the reference's randomized optimizer
(``src/qp/optimizer/RandomOptimizer.java``) — are left to Catalyst CBO + AQE.

Semantics decisions (SURVEY.md §7):

* D2 — aggregates and ORDERBY execute properly instead of aborting.
* D3 — GROUPBY without aggregates = distinct grouping keys; string literals
  coerce to the column's type at eval (``Select.java:140-141``); cross-table
  theta conditions execute as written (``<`` stays ``<``), which is what the
  oracle computes — the reference would silently run them as ``=``
  (``Tuple.java:36-43``), a bug we do not replicate.

Column naming: internally every column is mangled to ``<table>__<col>`` so
N-way joins keep duplicate-named key columns addressable (the dialect has no
aliases).  On output, a column is displayed as its bare name when unambiguous
across the query's tables, else ``<table>_<col>``; aggregates display as
``<func>_<col>`` (or ``<func>_<table>_<col>`` on ambiguity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spj_query_engine_spark.catalog import ALWAYS_BROADCAST
from spj_query_engine_spark.dialect.ast import Attr, Condition, SetQuery, SQLQuery
from spj_query_engine_spark.operators import core


class PlanError(ValueError):
    pass


def _mangle(attr: Attr) -> str:
    return f"{attr.table}__{attr.column}"


def _coerce_literal(value: str, dtype: T.DataType):
    """All dialect literals are quoted strings, converted per column type at
    eval time (reference ``Select.java:140-141,196-197``)."""
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return int(value)
    if isinstance(dtype, (T.FloatType, T.DoubleType, T.DecimalType)):
        return float(value)
    return value


class _PlanBuilder:
    def __init__(self, spark: SparkSession, tables: dict[str, DataFrame], query: SQLQuery):
        self.spark = spark
        self.query = query
        self.base: dict[str, DataFrame] = {}
        self.dtypes: dict[str, T.DataType] = {}
        for name in query.from_list:
            if name not in tables:
                raise PlanError(f"unknown table {name!r}")
            df = tables[name]
            # toDF = ONE py4j round trip for the whole-table mangle rename;
            # the per-column col().alias() select cost 2 hops per column ×
            # every table of every dialect query (r10 floor profile: the
            # builder's rename was the largest single build-phase item)
            renamed = df.toDF(
                *[_mangle(Attr(name, f.name)) for f in df.schema.fields]
            )
            self.base[name] = renamed
            for f in df.schema.fields:
                self.dtypes[_mangle(Attr(name, f.name))] = f.dataType

    def _col(self, attr: Attr) -> Column:
        name = _mangle(attr)
        if name not in self.dtypes:
            raise PlanError(f"unknown attribute {attr}")
        return F.col(name)

    def _condition_col(self, cond: Condition) -> Column:
        lhs = self._col(cond.lhs)
        if cond.is_attr_compare:
            return core.compare(lhs, cond.op, self._col(cond.rhs))
        dtype = self.dtypes[_mangle(cond.lhs)]
        return core.compare(lhs, cond.op, F.lit(_coerce_literal(cond.rhs, dtype)))

    # ---- operator stack (reference order) ----

    def build(self) -> DataFrame:
        q = self.query
        if q.joins:
            df = self._explicit_join_phase()
        else:
            df = self._join_phase(self._selection_phase())
        if q.is_distinct:
            # DISTINCT sits below the projection and dedups on the projected
            # columns (RandomInitialPlan.java:202-215).  Dedup on the
            # project-list subset here (keeping the full schema for the
            # phases above); the later projection selects exactly the dedup
            # keys, so the result equals the reference's distinct-then-project.
            dedup = [_mangle(s.attr) for s in q.select_list if not s.agg]
            df = df.dropDuplicates(dedup) if dedup else df.distinct()
        df = self._groupby_phase(df)
        df = self._orderby_phase(df)
        if q.limit is not None:  # extended grammar; Catalyst pushes the
            df = df.limit(q.limit)  # limit into the sort → distributed top-k
        return df

    def _explicit_join_phase(self) -> DataFrame:
        """Extended-grammar explicit joins: left-deep in declared order,
        LEFT joins preserved as written.  WHERE applies AFTER the joins —
        standard SQL semantics, which matters for LEFT joins where a
        pre-join filter on the right table would differ from a post-join
        one (Catalyst still pushes every filter that is semantically safe
        below the join it can cross)."""
        q = self.query
        df = self.base[q.from_list[0]]
        for jc in q.joins:
            right = self.base[jc.table]
            if jc.table in ALWAYS_BROADCAST:
                right = F.broadcast(right)
            df = df.join(right, self._condition_col(jc.cond), jc.kind)
        for cond in q.conditions:
            df = df.filter(self._condition_col(cond))
        return df

    def _selection_phase(self) -> dict[str, DataFrame]:
        """Selections attach directly above each table's scan
        (RandomInitialPlan.java:114-133) — with Catalyst they continue into
        the parquet scan as pushed filters."""
        out = dict(self.base)
        for cond in self.query.selection_conditions:
            table = cond.lhs.table
            out[table] = out[table].filter(self._condition_col(cond))
        return out

    def _join_phase(self, tables: dict[str, DataFrame]) -> DataFrame:
        """Assemble the join graph in condition order (the reference builds a
        left-deep tree per condition, RandomInitialPlan.java:138-175; we build
        the same graph and let CBO/AQE reorder).  Cross products for
        condition-less extra tables mirror the reference (a missing join
        condition yields a cross pair there too)."""
        q = self.query
        group_of = {name: i for i, name in enumerate(q.from_list)}
        group_df: dict[int, DataFrame] = {}
        for i, name in enumerate(q.from_list):
            df = tables[name]
            if name in ALWAYS_BROADCAST:
                df = F.broadcast(df)
            group_df[i] = df

        def merge(a: int, b: int, on: Column | None) -> int:
            left, right = group_df[a], group_df[b]
            joined = left.join(right, on, "inner") if on is not None else left.crossJoin(right)
            group_df[a] = joined
            del group_df[b]
            for t, g in group_of.items():
                if g == b:
                    group_of[t] = a
            return a

        for cond in q.join_conditions:
            ga, gb = group_of[cond.lhs.table], group_of[cond.rhs.table]
            cond_col = self._condition_col(cond)
            if ga == gb:
                # Both sides already co-joined: residual join predicate.
                group_df[ga] = group_df[ga].filter(cond_col)
            else:
                merge(min(ga, gb), max(ga, gb), cond_col)

        # Cross-join any remaining disconnected groups, in FROM order.
        remaining = sorted(group_df)
        result_group = remaining[0]
        for g in remaining[1:]:
            result_group = merge(result_group, g, None)
        return group_df[result_group]

    def _projection_cols(self, df: DataFrame) -> list[Column]:
        """Plain-projection columns with display aliases; empty for SELECT *
        (then the caller keeps the full join-order schema, duplicate keys
        included — Schema.joinWith does no dedup, Schema.java:81-90)."""
        q = self.query
        if q.is_star:
            return []
        if q.agg_items:
            return []  # handled by the groupby/aggregate phase
        return [self._col(s.attr).alias(self.display_name(s.attr)) for s in q.select_list]

    def _window_phase(self, df: DataFrame) -> DataFrame:
        """Extended-grammar window items: every ``AGG(attr) OVER (...)``
        compiles to an analytic window column alongside the plain projected
        attributes — one Spark Window per distinct spec, no grouping
        collapse.  Running SUM/AVG on floating columns ride DECIMAL inside
        the frame (order-independent within the RANGE peer group) and cast
        back to double on output, the engine-wide exactness convention."""
        from pyspark.sql import Window

        q = self.query
        if q.groupby or q.having:
            raise PlanError("window functions cannot combine with GROUPBY/HAVING")
        if any(s.agg and s.over is None for s in q.select_list):
            raise PlanError("cannot mix plain aggregates with window aggregates")
        cols: list[Column] = []
        for item in q.select_list:
            if item.over is None:
                cols.append(self._col(item.attr).alias(self.display_name(item.attr)))
                continue
            w = (
                Window.partitionBy(*[self._col(a) for a in item.over.partition])
                if item.over.partition
                else Window.partitionBy()
            )
            if item.over.order:
                w = w.orderBy(*[self._col(a) for a in item.over.order])
            src = self._col(item.attr)
            dtype = self.dtypes[_mangle(item.attr)]
            fn = item.agg.lower()
            floaty = isinstance(dtype, (T.FloatType, T.DoubleType))
            if fn in ("sum", "avg") and floaty:
                src = src.cast("decimal(18,2)")
            col = getattr(F, fn)(src).over(w)
            if fn in ("sum", "avg") and floaty:
                col = col.cast("double")
            cols.append(col.alias(self.agg_display_name(item.agg, item.attr)))
        return df.select(*cols)

    def _groupby_phase(self, df: DataFrame) -> DataFrame:
        q = self.query
        if any(s.over for s in q.select_list):
            return self._window_phase(df)
        aggs = q.agg_items
        having_aggs = [h for h in q.having if h.agg]
        if q.having and not q.groupby:
            raise PlanError("HAVING requires GROUPBY")
        if not q.groupby and not aggs:
            cols = self._projection_cols(df)
            if cols:
                return df.select(*cols)
            return df.select(
                *[F.col(c).alias(self._display_from_mangled(c)) for c in df.columns]
            )
        if q.groupby and not aggs and not having_aggs:
            # GROUPBY with no aggregates = distinct grouping keys; all other
            # select-list columns are DROPPED (GroupBy.java:101-113 + schema
            # cut at RandomInitialPlan.java:188-199) — query_groupby.sql
            # returns only the distinct qty values.
            keys = [_mangle(a) for a in q.groupby]
            out = core.groupby_distinct(df, keys)
            out = self._having_filter(out)  # bare-key conditions only here
            return out.select(*[F.col(_mangle(a)).alias(self.display_name(a)) for a in q.groupby])
        # Aggregates (D2). Non-aggregated select attrs must be grouping keys —
        # but only when the SELECT list itself has aggregates: a GROUPBY
        # query whose only aggregates live in HAVING keeps the reference's
        # distinct-keys projection (non-key select columns DROP, they don't
        # error), exactly as it would without the HAVING.
        keys = [_mangle(a) for a in q.groupby]
        if aggs:
            for item in q.select_list:
                if not item.agg and _mangle(item.attr) not in keys:
                    raise PlanError(
                        f"non-aggregated select column {item.attr} is not in GROUPBY"
                    )
        agg_specs = [
            (item.agg, _mangle(item.attr), self.agg_display_name(item.agg, item.attr))
            for item in aggs
        ]
        # HAVING aggregates not in the select list still need computing —
        # they ride the same single aggregation, then drop at the final
        # projection (extended grammar only; strict queries have no having).
        seen = {spec[2] for spec in agg_specs}
        for h in having_aggs:
            name = self.agg_display_name(h.agg, h.attr)
            if name not in seen:
                agg_specs.append((h.agg, _mangle(h.attr), name))
                seen.add(name)
        out = core.aggregate(df, keys, agg_specs)
        out = self._having_filter(out)
        if not aggs:
            # only HAVING carried aggregates: project the distinct-keys
            # result (reference GROUPBY semantics — non-key columns drop)
            return out.select(
                *[F.col(_mangle(a)).alias(self.display_name(a)) for a in q.groupby]
            )
        final_cols: list[Column] = []
        for item in q.select_list:
            if item.agg:
                final_cols.append(F.col(self.agg_display_name(item.agg, item.attr)))
            else:
                final_cols.append(self._col(item.attr).alias(self.display_name(item.attr)))
        if not final_cols:  # SELECT * with GROUPBY → the grouping keys
            final_cols = [F.col(_mangle(a)).alias(self.display_name(a)) for a in q.groupby]
        return out.select(*final_cols)

    def _having_filter(self, df: DataFrame) -> DataFrame:
        """Apply extended-grammar HAVING conditions on the aggregated frame
        (column set: mangled group keys + display-named aggregates)."""
        for h in self.query.having:
            name = self.agg_display_name(h.agg, h.attr) if h.agg else _mangle(h.attr)
            if name not in df.columns:
                raise PlanError(f"HAVING references unknown column {name}")
            dtype = df.schema[name].dataType
            df = df.filter(
                core.compare(F.col(name), h.op, F.lit(_coerce_literal(h.rhs, dtype)))
            )
        return df

    def _orderby_phase(self, df: DataFrame) -> DataFrame:
        q = self.query
        if not q.orderby:
            return df
        cols = []
        for i, attr in enumerate(q.orderby):
            agg = q.orderby_agg[i] if i < len(q.orderby_agg) else None
            if agg:
                # extended grammar: ORDERBY AGG(attr) — the aggregate must be
                # in the select list (it is what the sort key refers to)
                name = self.agg_display_name(agg, attr)
                if name not in df.columns:
                    raise PlanError(
                        f"ORDERBY {agg}({attr}) must also appear in the select list"
                    )
                cols.append(name)
                continue
            name = self.display_name(attr)
            cols.append(name if name in df.columns else _mangle(attr))
        ascending: bool | list[bool] = True
        if q.orderby_desc and any(q.orderby_desc):
            ascending = [not d for d in q.orderby_desc]
        return core.order_by(df, cols, ascending=ascending)

    # ---- display naming ----

    def _ambiguous(self, column: str) -> bool:
        return sum(1 for m in self.dtypes if m.endswith(f"__{column}")) > 1

    def display_name(self, attr: Attr) -> str:
        return f"{attr.table}_{attr.column}" if self._ambiguous(attr.column) else attr.column

    def agg_display_name(self, func: str, attr: Attr) -> str:
        base = self.display_name(attr)
        return f"{func.lower()}_{base}"

    def _display_from_mangled(self, mangled: str) -> str:
        table, column = mangled.split("__", 1)
        return self.display_name(Attr(table, column))


def build_plan(
    spark: SparkSession, tables: dict[str, DataFrame], query: SQLQuery | SetQuery
) -> DataFrame:
    """Compile a parsed dialect query over a catalog of DataFrames.
    ``SetQuery`` nodes (extended grammar) compile each side recursively and
    combine with the schema-checked set operators."""
    if isinstance(query, SetQuery):
        left = build_plan(spark, tables, query.left)
        right = build_plan(spark, tables, query.right)
        if query.op == "UNION":
            return core.union(left, right)
        if query.op == "INTERSECT":
            return core.intersect(left, right)
        return core.except_(left, right)
    return _PlanBuilder(spark, tables, query).build()
