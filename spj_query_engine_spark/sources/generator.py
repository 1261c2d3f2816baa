"""Distributed deterministic table generator — the reference's ``RandomDB``.

The reference generates test databases single-threaded, seeded from the
wall clock (``src/RandomDB.java:14,117-145`` in ``/root/reference/``): PK
columns draw distinct values without replacement, FK columns draw values the
parent actually emitted, NK ints draw uniformly from ``[0, range)``.

This generator keeps those semantics but is **seeded, distributed and
shuffle-free** — every column of every row is a pure function of
``(row_index, table, column, seed)`` over ``spark.range(n)``:

* **PK**: a collision-free affine permutation ``(a·i + b) mod range`` with
  ``gcd(a, range) = 1`` — distinct by construction, no global sort, no
  "draw without replacement" state.  At 100 TB scale this matters: the
  reference's in-memory dedup set cannot exist on a cluster.
* **FK**: draws a parent row index uniformly and applies the *parent's* PK
  permutation — referential integrity without joining (or even reading) the
  parent table.
* **NK**: ``xxhash64`` of (table, column, seed, i) reduced mod ``range``
  (ints), scaled to ``[0, range)`` (reals), or rendered as an md5-derived
  fixed-length string.

Everything stays in whole-stage codegen; generating a trillion rows is
``spark.range(10**12)`` plus projections.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from spj_query_engine_spark.sources.schema import ColumnSpec, TableSpec


def _perm_params(table: str, col: str, seed: int, modulus: int) -> tuple[int, int]:
    """Deterministic (a, b) for the affine permutation ``(a·i + b) % modulus``
    with ``gcd(a, modulus) = 1`` (a bijection on [0, modulus))."""
    import hashlib

    # hashlib, not builtin hash(): the latter is salted per process and would
    # make "deterministic" generation differ between driver restarts
    h = int(hashlib.md5(f"{table}.{col}.{seed}".encode()).hexdigest()[:8], 16) & 0x7FFFFFFF
    a = (h * 2_654_435_761 + 1) % modulus
    a = max(a, 1)
    while math.gcd(a, modulus) != 1:
        a += 1
    b = (h * 40_503 + seed) % modulus
    return a, b


def _hash64(table: str, col: str, seed: int, i: Column) -> Column:
    return F.xxhash64(F.lit(f"{table}.{col}.{seed}"), i)


def _pk_column(spec: TableSpec, c: ColumnSpec, seed: int, i: Column) -> Column:
    a, b = _perm_params(spec.name, c.name, seed, c.range)
    return F.pmod(F.lit(a) * i + F.lit(b), F.lit(c.range))


def generate_table(
    spark: SparkSession,
    spec: TableSpec,
    n_rows: int,
    seed: int = 0,
    fk_parents: dict | None = None,
    parallelism: int | None = None,
) -> DataFrame:
    """Generate ``n_rows`` rows for ``spec`` as a DataFrame.

    ``fk_parents`` maps an FK column name to
    ``(parent_spec, parent_col, parent_rows, parent_seed)``; the FK then only
    takes values the parent's PK generator emits for those parameters.  An FK
    with no mapping degrades to NK-uniform (what the ``.det`` file alone can
    express — it does not record the referenced table).
    """
    fk_parents = fk_parents or {}
    for c in spec.columns:
        if c.key == "PK" and c.ctype == "INTEGER" and c.range < n_rows:
            raise ValueError(
                f"{spec.name}.{c.name}: PK range {c.range} < {n_rows} rows"
            )
    base = spark.range(0, n_rows, numPartitions=parallelism)
    i = F.col("id")
    cols = []
    for c in spec.columns:
        if c.key == "PK" and c.ctype == "INTEGER":
            val = _pk_column(spec, c, seed, i)
        elif c.key == "FK" and c.name in fk_parents:
            parent_spec, parent_col, parent_rows, parent_seed = fk_parents[c.name]
            pc = parent_spec.column(parent_col)
            j = F.pmod(_hash64(spec.name, c.name, seed, i), F.lit(parent_rows))
            val = _pk_column(parent_spec, pc, parent_seed, j)
        elif c.ctype == "INTEGER":
            val = F.pmod(_hash64(spec.name, c.name, seed, i), F.lit(c.range))
        elif c.ctype == "REAL":
            frac = F.pmod(_hash64(spec.name, c.name, seed, i), F.lit(1_000_000))
            val = (frac.cast("double") / F.lit(1_000_000.0)) * F.lit(float(c.range))
        elif c.ctype == "STRING":
            reps = (c.range + 31) // 32
            hexes = [
                F.md5(F.concat(F.lit(f"{spec.name}.{c.name}.{seed}.{r}."), i.cast("string")))
                for r in range(reps)
            ]
            val = F.substring(F.concat(*hexes), 1, c.range)
        else:  # pragma: no cover - parse_det rejects unknown types
            raise ValueError(f"unsupported column spec: {c}")
        if c.ctype == "INTEGER":
            val = val.cast("int")
        cols.append(val.alias(c.name))
    return base.select(*cols)


def compute_stats(df: DataFrame) -> dict:
    """Row count + exact per-column NDV — the ``<T>.stat`` twin
    (``src/RandomDB.java:147-170``).  One pass, codegen'd aggregates; feed
    the same numbers to Catalyst with ``ANALYZE TABLE`` (catalog module)."""
    aggs = [F.count(F.lit(1)).alias("__rows__")] + [
        F.countDistinct(F.col(c)).alias(c) for c in df.columns
    ]
    row = df.agg(*aggs).collect()[0].asDict()
    rows = row.pop("__rows__")
    return {"rows": rows, "ndv": row}


def stat_text(stats: dict, columns: list[str]) -> str:
    """Render stats in the reference's ``.stat`` layout: line 1 = row count,
    line 2 = per-column NDV in schema order."""
    return f"{stats['rows']}\n" + " ".join(str(stats["ndv"][c]) for c in columns) + "\n"
