"""Plan/cost introspection (plans.report) — the printFinalPlan analog."""

from __future__ import annotations

from pyspark.sql import functions as F

from spj_query_engine_spark.plans.report import explain_report, plan_report


def test_report_join_pushdown_codegen(spark, ecommerce):
    df = (
        ecommerce["CUSTOMER"]
        .filter(F.col("gender") == 1)
        .join(ecommerce["CART"], "cid")
        .groupBy("status")
        .count()
    )
    rep = plan_report(df)
    assert any("Join" in j for j in rep.joins)
    assert rep.codegen_stages >= 1
    assert rep.estimated_size is not None
    text = rep.render()
    assert "== plan report ==" in text
    assert "Physical Plan" in text


def test_report_on_parquet_scan_shows_pushed_filters(spark, tmp_path):
    path = str(tmp_path / "t.parquet")
    spark.range(1000).withColumn("v", F.col("id") * 2).write.parquet(path)
    df = spark.read.parquet(path).filter(F.col("id") > 10).select("id")
    rep = plan_report(df)
    assert any("id" in p for p in rep.pushed_filters)
    assert "pushed:" in explain_report(df)


def test_analyzed_tables_feed_cbo_rowcounts(spark, tmp_path):
    """The .stat parity claim (SURVEY.md §4/D4): after register_tables with
    analyze=True, Catalyst carries exact row counts into plan estimates."""
    from spj_query_engine_spark.catalog import register_tables

    from tests.conftest import SF_DIR

    register_tables(spark, SF_DIR, names=("region", "nation"), analyze=True)
    try:
        df = spark.sql(
            "SELECT n.n_name FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey"
        )
        rep = plan_report(spark.table("nation"))
        # exact row count only exists when ANALYZE ran (CBO stats present)
        assert rep.estimated_rows is not None
        assert int(rep.estimated_rows) == spark.table("nation").count()
        assert plan_report(df).estimated_size is not None
    finally:
        for t in ("region", "nation"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
