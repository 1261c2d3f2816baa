"""Plan & cost introspection — the ``printFinalPlan`` analog.

The reference prints its chosen operator tree and the optimizer's estimated
page-I/O cost before executing, then asks for confirmation
(``src/QueryMain.java:157-175`` and ``Debug.PPrint``,
``src/qp/operators/Debug.java:80-118`` in ``/root/reference/``).  Its cost
numbers come from ``PlanCost`` reading ``.stat`` files.

Here the optimizer is Catalyst; the equivalent introspection is:

* the optimized logical + physical plan (``explain``),
* Catalyst's own cost estimates (sizeInBytes / rowCount from statistics —
  the same numbers ``ANALYZE TABLE`` feeds CBO, playing the ``.stat`` role),
* which join strategies were picked (broadcast vs shuffled — the analog of
  the reference's NLJ/BNLJ/HashJoin choice, ``RandomOptimizer.java:220-234``),
* whole-stage-codegen coverage and pushed filters — the two properties that
  decide 100 TB viability and that `.explain` is the only honest witness of.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

#: Physical join node names Catalyst can emit, mapped to the closest
#: reference algorithm (SURVEY.md §2.1 rows 6-8).
_JOIN_NODES = {
    "BroadcastHashJoin": "hash join, build side replicated (no reference analog — free upgrade)",
    "ShuffledHashJoin": "Grace hash join (HashJoin.java)",
    "SortMergeJoin": "sort-merge (named but unimplemented in reference, Join.java:18)",
    "BroadcastNestedLoopJoin": "nested loops (NestedJoin.java / BlockNestedJoin.java)",
    "CartesianProduct": "nested loops, both sides large",
}


@dataclass
class PlanReport:
    physical: str
    joins: list[str] = field(default_factory=list)
    pushed_filters: list[str] = field(default_factory=list)
    codegen_stages: int = 0
    estimated_rows: str | None = None
    estimated_size: str | None = None

    def render(self) -> str:
        lines = ["== plan report =="]
        if self.estimated_rows or self.estimated_size:
            lines.append(
                f"catalyst estimate: rows={self.estimated_rows or '?'} "
                f"size={self.estimated_size or '?'}"
            )
        lines.append(f"whole-stage codegen stages: {self.codegen_stages}")
        for j in self.joins:
            lines.append(f"join: {j}")
        for f in self.pushed_filters:
            lines.append(f"pushed: {f}")
        lines.append(self.physical.rstrip())
        return "\n".join(lines)


def _explain_str(df: DataFrame, mode: str) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def plan_report(df: DataFrame) -> PlanReport:
    """Inspect a composed (unexecuted) DataFrame the way the reference shows
    its final plan before running it."""
    physical = _explain_str(df, "formatted")
    simple = _explain_str(df, "simple")
    joins = []
    for node, analog in _JOIN_NODES.items():
        for _ in range(simple.count(node)):
            joins.append(f"{node} — {analog}")
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", physical)
    pushed = [p for p in pushed if p.strip()]
    codegen = len(set(re.findall(r"codegen id : (\d+)", physical)))
    if codegen == 0 and "AdaptiveSparkPlan" in physical:
        # under AQE the pre-execution plan carries no codegen ids (stages
        # compile at runtime); re-plan a semantically identical frame with
        # AQE off just for the static codegen-coverage count
        spark = df.sparkSession
        prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
        try:
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            static = _explain_str(df.select("*"), "formatted")
            codegen = len(set(re.findall(r"codegen id : (\d+)", static)))
        except Exception:
            pass
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", prev)
    est_rows = est_size = None
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        est_size = str(stats.sizeInBytes())
        row_count = stats.rowCount()
        est_rows = str(row_count.get()) if not row_count.isEmpty() else None
    except Exception:
        pass
    return PlanReport(
        physical=physical,
        joins=joins,
        pushed_filters=pushed,
        codegen_stages=codegen,
        estimated_rows=est_rows,
        estimated_size=est_size,
    )


def explain_report(df: DataFrame) -> str:
    """One-call text report (plan + costs + join strategies)."""
    return plan_report(df).render()
