"""K7 sitemap writer, K8 Excel re-pivot grids, K2 JDBC upsert planning."""

import pytest

from migdar_data_pipelines_spark.sinks.jdbc import plan_upsert
from migdar_data_pipelines_spark.sinks.web import (
    chart_rows_to_tables,
    write_sitemap,
    write_sitemap_index,
)


def test_write_sitemap(spark, tmp_path):
    df = spark.createDataFrame(
        [("https://x.org/a?b=1&c=2", "2026-01-01"), ("https://x.org/b", "2026-01-02")],
        "loc string, lastmod string",
    )
    out = str(tmp_path / "sitemap.xml")
    n = write_sitemap(df, out)
    body = open(out).read()
    assert n == 2
    assert '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">' in body
    # XML escaping of & in the loc (sitemap.py:8-26 emits raw <loc> entries)
    assert "<loc>https://x.org/a?b=1&amp;c=2</loc>" in body
    assert "<lastmod>2026-01-02</lastmod>" in body


def test_sitemap_cap(spark, tmp_path):
    df = spark.range(50_001).selectExpr("concat('https://x.org/', id) AS loc")
    with pytest.raises(ValueError, match="50k"):
        write_sitemap(df, str(tmp_path / "big.xml"), lastmod_col=None)


def test_sitemap_index(tmp_path):
    out = str(tmp_path / "index.xml")
    write_sitemap_index(
        ["https://x.org/sitemap1.xml", "https://x.org/sitemap2.xml"], out, "2026-01-01"
    )
    body = open(out).read()
    assert body.count("<sitemap>") == 2
    assert "<sitemapindex" in body


def test_chart_grid_repivot():
    # K8 (dataset_assets.py:27-44): one column per series, one row per x
    rows = [
        {
            "doc_id": "dataset/abc",
            "chart_title": "t",
            "units": "%",
            "source_url": "http://s",
            "series": [
                {"series_title": "men", "dataset": [{"x": "2010", "y": 1.0}, {"x": "2011", "y": 2.0}]},
                {"series_title": "women", "dataset": [{"x": "2011", "y": 3.0}]},
            ],
        }
    ]
    grids = chart_rows_to_tables(rows)
    grid = grids["dataset/abc"]
    assert grid[0] == ["title", "t"]
    assert grid[3] == ["x", "men", "women"]
    assert grid[4] == ["2010", 1.0, None]  # women has no 2010 point
    assert grid[5] == ["2011", 2.0, 3.0]


def test_upsert_plan_postgres(spark):
    df = spark.createDataFrame([("a", 1, "x")], "migdar_id string, n int, v string")
    plan = plan_upsert(df, "pubs", ["migdar_id"], dialect="postgresql")
    assert plan.staging_table == "pubs__stage"
    assert "ON CONFLICT (migdar_id) DO UPDATE SET n = EXCLUDED.n, v = EXCLUDED.v" in plan.merge_sql
    assert plan.merge_sql.startswith("INSERT INTO pubs ")


def test_upsert_plan_ansi_merge(spark):
    df = spark.createDataFrame([("a", 1)], "k string, n int")
    plan = plan_upsert(df, "t", ["k"], dialect="ansi")
    assert "MERGE INTO t t USING t__stage s ON t.k = s.k" in plan.merge_sql
    assert "WHEN MATCHED THEN UPDATE SET t.n = s.n" in plan.merge_sql
    assert "WHEN NOT MATCHED THEN INSERT (k, n) VALUES (s.k, s.n)" in plan.merge_sql
