"""Sources & sinks: .det schema DSL, deterministic distributed generator,
tab-text/CSV readers, and the reference-format result sink.

Covers the reference's data-preparation path (SURVEY.md §3.2):
RandomDB (src/RandomDB.java) -> ConvertTxtToTbl (src/ConvertTxtToTbl.java)
-> Scan, and the QueryMain result format (src/QueryMain.java:230-244).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spj_query_engine_spark.dialect import parse
from spj_query_engine_spark.plans import build_plan
from spj_query_engine_spark.sources import (
    collect_result,
    compute_stats,
    generate_table,
    parse_det,
    read_csv,
    read_tab_text,
    result_lines,
    spec_to_struct,
    write_result_text,
)
from spj_query_engine_spark.sources.generator import stat_text

from tests.conftest import assert_same_result

# Transcribed from FIXTURES.md (reference CUSTOMER.det / CART.det shapes).
CUSTOMER_DET = """
5
100
cid INTEGER 200 PK 4
gender INTEGER 2 NK 4
firstname STRING 10 NK 20
lastname STRING 10 NK 20
address STRING 26 NK 52
"""

CART_DET = """
4
92
cartid INTEGER 200 PK 4
cid INTEGER 200 FK 4
status STRING 8 NK 16
remarks STRING 38 NK 76
"""


@pytest.fixture(scope="module")
def customer_spec():
    return parse_det("CUSTOMER", CUSTOMER_DET)


@pytest.fixture(scope="module")
def cart_spec():
    return parse_det("CART", CART_DET)


def test_parse_det(customer_spec):
    assert [c.name for c in customer_spec.columns] == [
        "cid", "gender", "firstname", "lastname", "address",
    ]
    assert customer_spec.tuple_size == 100
    assert customer_spec.column("cid").key == "PK"
    assert customer_spec.column("gender").range == 2
    struct = spec_to_struct(customer_spec)
    assert struct["cid"].dataType == T.IntegerType()
    assert struct["firstname"].dataType == T.StringType()
    assert not struct["cid"].nullable


def test_parse_det_rejects_garbage():
    with pytest.raises(ValueError):
        parse_det("X", "1\n4\na BLOB 4 NK 4")
    with pytest.raises(ValueError):
        parse_det("X", "1\n4\na INTEGER 4 XX 4")


def test_generator_pk_distinct_and_deterministic(spark, customer_spec):
    df = generate_table(spark, customer_spec, 200, seed=7)
    rows = df.collect()
    assert len(rows) == 200
    cids = [r["cid"] for r in rows]
    assert len(set(cids)) == 200  # PK distinct (draw without replacement)
    assert all(0 <= c < 200 for c in cids)
    assert all(r["gender"] in (0, 1) for r in rows)
    assert all(len(r["firstname"]) == 10 for r in rows)
    assert all(len(r["address"]) == 26 for r in rows)
    again = generate_table(spark, customer_spec, 200, seed=7).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    other = generate_table(spark, customer_spec, 200, seed=8).collect()
    assert sorted(map(tuple, rows)) != sorted(map(tuple, other))


def test_generator_fk_referential_integrity(spark, customer_spec, cart_spec):
    cart = generate_table(
        spark, cart_spec, 200, seed=11,
        fk_parents={"cid": (customer_spec, "cid", 200, 7)},
    )
    customer = generate_table(spark, customer_spec, 200, seed=7)
    orphans = cart.join(customer, "cid", "left_anti").count()
    assert orphans == 0


def test_generator_pk_range_too_small(spark, customer_spec):
    with pytest.raises(ValueError, match="PK range"):
        generate_table(spark, customer_spec, 500, seed=1)


def test_generator_real_type(spark):
    spec = parse_det("M", "2\n8\nmid INTEGER 100 PK 4\nscore REAL 5 NK 4")
    df = generate_table(spark, spec, 50, seed=3)
    assert dict(df.dtypes)["score"] == "double"
    vals = [r["score"] for r in df.collect()]
    assert all(0.0 <= v < 5.0 for v in vals)
    assert len(set(vals)) > 10  # actually varies


def test_stats_match_duckdb(spark, customer_spec, tmp_path):
    """compute_stats row-count/NDV agree with an independent DuckDB count on
    the same parquet — the .stat twin is trustworthy input for CBO."""
    df = generate_table(spark, customer_spec, 200, seed=7)
    path = str(tmp_path / "customer.parquet")
    df.write.mode("overwrite").parquet(path)
    stats = compute_stats(spark.read.parquet(path))
    con = duckdb.connect()
    rows, ndv_cid, ndv_gender = con.execute(
        f"SELECT count(*), count(DISTINCT cid), count(DISTINCT gender) "
        f"FROM read_parquet('{path}/*.parquet')"
    ).fetchone()
    assert stats["rows"] == rows == 200
    assert stats["ndv"]["cid"] == ndv_cid == 200
    assert stats["ndv"]["gender"] == ndv_gender == 2
    text = stat_text(stats, [c.name for c in customer_spec.columns])
    assert text.splitlines()[0] == "200"
    assert text.splitlines()[1].split()[0] == "200"


def test_tab_text_roundtrip(spark, customer_spec, tmp_path):
    """generator -> .txt (tab-separated, the RandomDB output format) ->
    read_tab_text -> identical table (the ConvertTxtToTbl path)."""
    df = generate_table(spark, customer_spec, 100, seed=5)
    txt_dir = str(tmp_path / "customer_txt")
    result_lines(df).coalesce(1).write.mode("overwrite").text(txt_dir)
    back = read_tab_text(spark, txt_dir, customer_spec)
    assert [f.dataType for f in back.schema.fields] == [
        f.dataType for f in spec_to_struct(customer_spec).fields
    ]
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_read_csv_with_spec(spark, customer_spec, tmp_path):
    df = generate_table(spark, customer_spec, 50, seed=5)
    path = str(tmp_path / "customer_csv")
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
    back = read_csv(spark, path, schema=customer_spec)
    # header row parses as nulls under the int schema in PERMISSIVE mode
    back = back.filter(F.col("cid").isNotNull())
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_sink_format(spark, tmp_path):
    """Tab-separated, -NULL- for nulls (QueryMain.java:230-244), header
    sidecar; distributed write then a driver-side render."""
    df = spark.createDataFrame(
        [(1, "a", 2.5), (2, None, None)], ["id", "name", "score"]
    )
    out = str(tmp_path / "result")
    write_result_text(df, out, single_file=True)
    with open(f"{out}/_header", encoding="utf-8") as fh:
        assert fh.read().strip() == "id\tname\tscore"
    import glob

    [part] = glob.glob(f"{out}/part-*.txt")
    lines = sorted(open(part, encoding="utf-8").read().splitlines())
    assert lines == ["1\ta\t2.5", "2\t-NULL-\t-NULL-"]
    rendered = collect_result(df.orderBy("id"))
    assert rendered.splitlines()[0] == "id\tname\tscore"
    assert "2\t-NULL-\t-NULL-" in rendered


def test_generated_fixture_through_dialect(spark, customer_spec, cart_spec, tmp_path):
    """Full data-prep parity loop: .det specs -> generator -> parquet ->
    dialect query (query3.sql shape) -> DuckDB oracle on the same parquet."""
    customer = generate_table(spark, customer_spec, 200, seed=7)
    cart = generate_table(
        spark, cart_spec, 200, seed=11,
        fk_parents={"cid": (customer_spec, "cid", 200, 7)},
    )
    paths = {}
    for name, df in [("CUSTOMER", customer), ("CART", cart)]:
        paths[name] = str(tmp_path / f"{name.lower()}.parquet")
        df.write.mode("overwrite").parquet(paths[name])
    tables = {name: spark.read.parquet(p) for name, p in paths.items()}
    result = build_plan(
        spark,
        tables,
        parse(
            "SELECT CUSTOMER.cid, CUSTOMER.firstname, CART.cartid "
            "FROM CUSTOMER,CART WHERE CUSTOMER.cid=CART.cid"
        ),
    )
    con = duckdb.connect()
    for name, p in paths.items():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}/*.parquet')"
        )
    assert_same_result(
        result,
        con,
        "SELECT CUSTOMER.cid AS CUSTOMER_cid, firstname, cartid "
        "FROM CUSTOMER JOIN CART ON CUSTOMER.cid = CART.cid",
    )


def test_csv_parquet_sinks_roundtrip(spark, tmp_path):
    from spj_query_engine_spark.sources.sink import (
        write_result_csv,
        write_result_parquet,
    )

    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "name"])
    pq = str(tmp_path / "pq")
    write_result_parquet(df, pq)
    assert sorted(map(tuple, spark.read.parquet(pq).collect())) == [(1, "a"), (2, "b")]
    cv = str(tmp_path / "cv")
    write_result_csv(df, cv)
    back = spark.read.option("header", True).option("inferSchema", True).csv(cv)
    assert sorted(map(tuple, back.collect())) == [(1, "a"), (2, "b")]


def test_orc_roundtrip_matches_parquet_path(spark, tmp_path):
    """ORC write → read returns the identical frame, and pushdown reaches
    the ORC scan (PushedFilters in the FileScan orc node)."""
    from spj_query_engine_spark.catalog import load_tables
    from spj_query_engine_spark.sources.readers import read_orc, write_orc

    from tests.conftest import SF_DIR

    nation = load_tables(spark, SF_DIR, ("nation",))["nation"]
    path = str(tmp_path / "nation_orc")
    write_orc(nation, path)
    back = read_orc(spark, path)
    assert back.schema == nation.schema
    assert sorted(r["n_nationkey"] for r in back.collect()) == sorted(
        r["n_nationkey"] for r in nation.collect()
    )
    from pyspark.sql import functions as F

    filtered = read_orc(spark, path).filter(F.col("n_nationkey") < 5)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "orc" in plan.lower()
    assert "PushedFilters: [" in plan and "LessThan(n_nationkey,5)" in plan


def test_python_sink_survives_foreign_active_session(spark):
    """Regression (r09): user-defined (Python) data source lookup resolves
    through the JVM thread-local ACTIVE session's DataSourceManager, not the
    DataFrame's own session — with the active session pointing at a clone
    (or unset, as on a fresh py4j connection thread), ``jsonlsink`` raised
    [DATA_SOURCE_NOT_FOUND] in full-suite runs even though it was registered
    moments earlier.  register_jsonlsink must pin the active session so the
    save succeeds regardless of what the thread-local held before."""
    import pandas as pd

    from spj_query_engine_spark.session import clone_session
    from spj_query_engine_spark.sources.pydatasource import sink_roundtrip_rollup

    sub = clone_session(spark)
    # poison the thread-local exactly the way the failing runs observed it
    spark._jvm.org.apache.spark.sql.classic.SparkSession.setActiveSession(
        sub._jsparkSession
    )
    pdf = pd.DataFrame({"doc_id": [1, 2, 3], "n_chars": [5, 6, 7]})
    docs = spark.createDataFrame(pdf)
    got = {r["shard"]: r for r in sink_roundtrip_rollup(spark, docs).collect()}
    assert {s: got[s]["n_docs"] for s in got} == {1: 1, 2: 1, 3: 1}


def test_python_sink_roundtrip(spark):
    """u08: rows pushed through the custom Python DataSourceWriter and read
    back must reproduce the source exactly (per-shard counts, char totals
    and id checksums), independent of task layout."""
    import pandas as pd

    from spj_query_engine_spark.sources.pydatasource import sink_roundtrip_rollup

    pdf = pd.DataFrame(
        {"doc_id": list(range(20)), "n_chars": [10 * i for i in range(20)]}
    )
    docs = spark.createDataFrame(pdf)
    got = {r["shard"]: r for r in sink_roundtrip_rollup(spark, docs).collect()}
    assert set(got) == set(range(8))
    for s, r in got.items():
        ids = [i for i in range(20) if i % 8 == s]
        assert r["n_docs"] == len(ids)
        assert r["id_sum"] == sum(ids)
        assert r["total_chars"] == sum(10 * i for i in ids)


def test_python_sink_append_accumulates(spark):
    """mode('append') twice into the same directory must ADD part files
    (job-unique names), never overwrite the first job's.  A planted FOREIGN
    *.tmp (another job's token) must be invisible to a glob-filtered
    read-back and must NOT be deleted by this job's commit: with
    append-into-a-shared-directory the advertised pattern, a foreign tmp is
    indistinguishable from a CONCURRENT job's in-flight write, and sweeping
    it would crash that job's os.replace — commit() sweeps only its own
    token's temps."""
    import os
    import shutil
    import tempfile

    import pandas as pd
    from pyspark.sql import functions as F

    from spj_query_engine_spark.sources.pydatasource import register_jsonlsink

    register_jsonlsink(spark)
    out = tempfile.mkdtemp(prefix="spj_u08_append_")
    try:
        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1, 2, 3], "n_chars": [10, 20, 30]})
        ).repartition(2)
        docs.write.format("jsonlsink").option("path", out).mode("append").save()
        first = sorted(f for f in os.listdir(out) if f.endswith(".jsonl"))
        # a stale tmp from a hypothetical retried attempt inside a
        # successful job: readers must never count it
        with open(os.path.join(out, "part-00000-dead.jsonl.beef.tmp"), "w") as f:
            f.write('{"doc_id": 999, "n_chars": 999}\n')
        docs.write.format("jsonlsink").option("path", out).mode("append").save()
        second = sorted(f for f in os.listdir(out) if f.endswith(".jsonl"))
        assert set(first) < set(second), "second append overwrote the first job"
        tmps = [f for f in os.listdir(out) if f.endswith(".tmp")]
        assert tmps == ["part-00000-dead.jsonl.beef.tmp"], (
            "commit() must leave a foreign job's tmp alone (it may be an "
            f"in-flight concurrent write) and sweep only its own: {tmps}"
        )
        # the second job's own temps were swept (every .tmp left is foreign)
        own = [f for f in tmps if f not in ("part-00000-dead.jsonl.beef.tmp",)]
        assert not own, f"own-job temps survived commit: {own}"
        back = (
            spark.read.schema("doc_id long, n_chars long")
            .option("pathGlobFilter", "*.jsonl")
            .json(out)
        )
        assert back.count() == 6
        assert back.agg(F.sum("doc_id")).first()[0] == 12  # no 999 leaked in
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_python_sink_overwrite_replaces(spark):
    """mode('overwrite') must actually REPLACE: with job-unique part names,
    an overwrite that only adds files would silently behave as append and a
    read-back would double-count.  Prior jobs' final parts are removed
    driver-side in commit() (only after every task succeeded), so a failed
    overwrite can never have destroyed the old data first."""
    import os
    import shutil
    import tempfile

    import pandas as pd
    from pyspark.sql import functions as F

    from spj_query_engine_spark.sources.pydatasource import register_jsonlsink

    register_jsonlsink(spark)
    out = tempfile.mkdtemp(prefix="spj_u08_ovw_")
    try:
        old = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1, 2, 3], "n_chars": [10, 20, 30]})
        ).repartition(2)
        old.write.format("jsonlsink").option("path", out).mode("append").save()
        new = spark.createDataFrame(
            pd.DataFrame({"doc_id": [7, 8], "n_chars": [70, 80]})
        ).repartition(1)
        new.write.format("jsonlsink").option("path", out).mode("overwrite").save()
        back = (
            spark.read.schema("doc_id long, n_chars long")
            .option("pathGlobFilter", "*.jsonl")
            .json(out)
        )
        assert back.count() == 2, "overwrite behaved as append"
        assert back.agg(F.sum("doc_id")).first()[0] == 15
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_jsonlsink_two_concurrent_jobs_one_directory(spark):
    """The VERDICT-flagged scenario as a live race, not a simulation: two
    jobs writing INTO THE SAME directory at the same time (threads; Spark
    schedules both jobs concurrently on the shared local executor).  With
    job-token-scoped names and sweeps, neither job may delete or clobber
    the other's output: the read-back must hold exactly the union of both
    row sets, and no temp files may survive."""
    import os
    import tempfile
    import threading

    import pandas as pd
    from pyspark.sql import functions as F

    from spj_query_engine_spark.sources.pydatasource import register_jsonlsink

    register_jsonlsink(spark)
    out = tempfile.mkdtemp(prefix="spj_u08_race_")
    errors = []

    def job(base: int) -> None:
        try:
            df = spark.createDataFrame(
                pd.DataFrame(
                    {"doc_id": range(base, base + 50), "n_chars": [1] * 50}
                )
            ).repartition(8)
            df.write.format("jsonlsink").option("path", out).mode(
                "append"
            ).save()
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    try:
        threads = [
            threading.Thread(target=job, args=(0,)),
            threading.Thread(target=job, args=(1000,)),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, f"concurrent write failed: {errors[0]}"
        assert not [f for f in os.listdir(out) if f.endswith(".tmp")]
        back = (
            spark.read.schema("doc_id long, n_chars long")
            .option("pathGlobFilter", "*.jsonl")
            .json(out)
        )
        assert back.count() == 100, "a job deleted the other's rows"
        assert back.select(F.countDistinct("doc_id")).first()[0] == 100
        assert back.agg(F.sum("doc_id")).first()[0] == sum(range(50)) + sum(
            range(1000, 1050)
        )
    finally:
        import shutil

        shutil.rmtree(out, ignore_errors=True)


def test_jsonlsink_overwrite_replaces_only_finals_never_inflight_tmp(spark):
    """mode('overwrite') into a shared directory: prior jobs' FINAL part
    files are replaced (that is the contract), but a concurrent job's
    in-flight temp file — not yet committed — must survive the overwrite's
    deletion pass, and the overwrite's own rows must be exactly what reads
    back."""
    import os
    import tempfile

    import pandas as pd

    from spj_query_engine_spark.sources.pydatasource import register_jsonlsink

    register_jsonlsink(spark)
    out = tempfile.mkdtemp(prefix="spj_u08_ow_")
    try:
        old = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1, 2], "n_chars": [5, 5]})
        ).repartition(1)
        old.write.format("jsonlsink").option("path", out).mode("append").save()
        foreign_tmp = os.path.join(out, "part-00000-feed.jsonl.cafe.tmp")
        with open(foreign_tmp, "w") as f:
            f.write('{"doc_id": 7, "n_chars": 7}\n')
        new = spark.createDataFrame(
            pd.DataFrame({"doc_id": [10, 11, 12], "n_chars": [9, 9, 9]})
        ).repartition(1)
        new.write.format("jsonlsink").option("path", out).mode(
            "overwrite"
        ).save()
        assert os.path.exists(foreign_tmp), (
            "overwrite deleted a concurrent job's in-flight temp"
        )
        back = (
            spark.read.schema("doc_id long, n_chars long")
            .option("pathGlobFilter", "*.jsonl")
            .json(out)
        )
        rows = sorted(r.doc_id for r in back.collect())
        assert rows == [10, 11, 12], f"overwrite row set wrong: {rows}"
    finally:
        import shutil

        shutil.rmtree(out, ignore_errors=True)
