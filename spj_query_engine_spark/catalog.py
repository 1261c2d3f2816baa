"""Table registration & statistics — the reference's catalog, Spark-first.

The reference keeps its catalog as per-table files: ``<T>.md`` (serialized
Schema, loaded at ``src/qp/optimizer/RandomInitialPlan.java:81-94``) and
``<T>.stat`` (row count + per-column NDV, loaded at
``src/qp/optimizer/PlanCost.java:225-269``).  Here a "database" is a directory
of parquet files; schemas come from parquet footers and statistics from
``ANALYZE TABLE`` feeding Catalyst CBO — the exact same role ``.stat`` plays
for the reference's cost model.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: The driver's TPC-H-ish testdata tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at ANY scale factor — even at
#: 100 TB, region/nation are fixed-size lookup tables.
ALWAYS_BROADCAST = frozenset({"region", "nation"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _nano_ts_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark's reader rejects
    them unless ``spark.sql.legacy.parquet.nanosAsLong`` is on, in which case
    they surface as LongType nanos.  Footer-only read; no data I/O."""
    try:
        import pyarrow.dataset as ds
        import pyarrow as pa

        schema = ds.dataset(path, format="parquet").schema
        return [
            f.name
            for f in schema
            if isinstance(f.type, pa.TimestampType) and f.type.unit == "ns"
        ]
    except Exception:
        return []


#: table-metadata cache: (abspath, mtime) -> (inferred Spark schema, nano
#: columns).  Every load_table call used to pay a driver-side schema
#: inference (footer read + merge job) plus a pyarrow footer scan; both are
#: pure functions of the files, which a real catalog caches — Spark itself
#: caches FileIndex per DataFrame but re-infers across reads.  mtime keying
#: invalidates on rewrite (overwrite mode replaces the dir's entries).
_META_CACHE: dict = {}


def _footer_row_count(path: str) -> int | None:
    """Exact row count from the parquet footer(s) — pure metadata, no data
    I/O; the same number DuckDB's ``count(*)`` and a Spark count job
    compute, read without running a job."""
    try:
        import pyarrow.dataset as ds

        return sum(
            frag.metadata.num_rows
            for frag in ds.dataset(path, format="parquet").get_fragments()
        )
    except Exception:
        return None


def _table_meta(spark: SparkSession, path: str):
    try:
        mtime = os.path.getmtime(path)
    except OSError:
        mtime = -1.0
    key = (os.path.abspath(path), mtime)
    hit = _META_CACHE.get(key)
    if hit is None:
        hit = (
            spark.read.parquet(path).schema,
            _nano_ts_columns(path),
            _footer_row_count(path),
        )
        _META_CACHE[key] = hit
    return hit


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan operator: the reference's full-table ``Scan``
    (``src/qp/operators/Scan.java:43-86``) is a parquet DataFrame source —
    column pruning and predicate pushdown then happen at the scan, which the
    reference never does (its projection sits only at the plan root).

    The built frame is cached PER SESSION (an attribute on the session
    object, so it dies with the session and can never leak across
    sessions), keyed (path, mtime) like the metadata cache.  A DataFrame
    is an immutable LAZY plan — reusing the object skips the ~6 py4j round
    trips of reader construction + timestamp canonicalization per call
    (~0.05 s × every table load of every query, r10 floor profile) while
    every execution still scans the parquet from scratch; this caches no
    result, and an overwrite of the files invalidates via mtime."""
    path = table_path(sf_dir, name)
    try:
        mtime = os.path.getmtime(path)
    except OSError:
        mtime = -1.0
    cache_key = (os.path.abspath(path), mtime)
    cache = getattr(spark, "_spj_table_cache", None)
    if cache is None:
        cache = {}
        try:
            spark._spj_table_cache = cache
        except Exception:
            cache = None
    if cache is not None:
        hit = cache.get(cache_key)
        if hit is not None:
            return hit
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    schema, nano_cols, n_rows = _table_meta(spark, path)
    df = spark.read.schema(schema).parquet(path)
    dtypes = dict(df.dtypes)
    for col in nano_cols:
        # nanos → micros → TimestampType; DuckDB applies the same truncation
        # (its timestamps are microsecond), keeping oracle comparison exact.
        # Integer `div`, NOT `/`: epoch-nanos exceed 2^53, so double division
        # silently rounds by up to 1 µs.  Guard on the LOADED dtype: pyarrow
        # also reports Spark-written INT96 timestamps as `ns`, but Spark
        # reads those as TimestampType already — only long nanos convert.
        if dtypes.get(col) == "bigint":
            df = df.withColumn(col, F.expr(f"timestamp_micros(`{col}` div 1000)"))
    df = _normalize_timestamps(df)
    if n_rows is not None:
        # footer-exact row count for operators that size structures from the
        # corpus (resolve_quantizer_cells): saves a count() JOB per query —
        # metadata, not a cached result, invalidated with the schema cache
        df._spj_rowcount = n_rows
    if cache is not None:
        cache[cache_key] = df
    return df


def _normalize_timestamps(df: DataFrame) -> DataFrame:
    """Canonicalize every timestamp column to TimestampType.

    Parquet written without ``isAdjustedToUTC`` surfaces as TIMESTAMP_NTZ
    under Spark 4's NTZ inference; event-time watermarks and several
    chronon functions require TimestampType.  With the session pinned to
    UTC (session.py) the cast is value-preserving and matches DuckDB's
    UTC-naive reading of the same file, so oracle hashes are unaffected.
    The engine accepts all three on-disk representations the testdata has
    shipped with: TIMESTAMP(NANOS)-as-long, micros-NTZ, and micros-UTC.
    """
    for col, dt in df.dtypes:
        if dt == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None
) -> dict[str, DataFrame]:
    out = {}
    for name in names or TABLES:
        if os.path.exists(table_path(sf_dir, name)):
            out[name] = load_table(spark, sf_dir, name)
    return out


def register_tables(
    spark: SparkSession,
    sf_dir: str,
    names: tuple[str, ...] | None = None,
    analyze: bool = False,
) -> dict[str, DataFrame]:
    """Register each parquet table as a temp view (and optionally ANALYZE).

    ``analyze=True`` computes row counts + per-column NDV so Catalyst CBO can
    cost join orders the way the reference's ``PlanCost`` does from ``.stat``
    files.  Temp views cannot carry catalog statistics, so analyzed
    registration creates EXTERNAL catalog tables over the same parquet (no
    data copy) and analyzes those; tables whose parquet needs the nano-
    timestamp conversion fall back to an unanalyzed temp view (external
    tables bypass the conversion).
    """
    dfs = load_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        path = table_path(sf_dir, name)
        if analyze and not _nano_ts_columns(path):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            spark.sql(f"CREATE TABLE {name} USING parquet LOCATION '{path}'")
            spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR ALL COLUMNS")
            # External tables read the footer type directly — re-apply the
            # NTZ canonicalization the load_table path gives temp views.
            dfs[name] = _normalize_timestamps(spark.table(name))
        else:
            df.createOrReplaceTempView(name)
    return dfs
