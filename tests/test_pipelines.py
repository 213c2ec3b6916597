"""End-to-end run of the seven reference pipelines on FIXTURES.md-shaped
inline fixtures, through the PipelineGraph with parquet stage handoff."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from migdar_data_pipelines_spark.pipelines import (
    PipelineContext,
    build_reference_graph,
)


@pytest.fixture(scope="module")
def fixtures(spark):
    translations = spark.createDataFrame(
        [
            ("בריאות", "בריאות", "Health", "الصحة"),
            ("תעסוקה", "תעסוקה", "Employment", "العمل"),
            ("Health", "בריאות", "Health", "الصحة"),
        ],
        "key string, hebrew string, english string, arabic string",
    )
    orgs = spark.createDataFrame(
        [
            # duplicate entity_id -> dedup suffix; schemeless website; URL in objective
            ("580001", "ארגון א", "Org A", "עמותה", "Helping www", "בריאות, תעסוקה", "org-a.org.il"),
            ("580001", "ארגון ב", "Org B", "עמותה", "see http://b.org", "בריאות", "http://b.org"),
            ("580002", "ארגון ג", "Org C", "חברה", None, "Health", None),
        ],
        "entity_id string, org_name string, org_name__en string, org_kind string, "
        "objective string, life_areas string, org_website string",
    )
    zotero_schema = (
        "key string, title string, date string, institution string, "
        "publication string, publicationTitle string, abstractNote string, "
        "language string, tags array<struct<tag:string>>, "
        "creators array<struct<creatorType:string,firstName:string,lastName:string,name:string>>, "
        "reportType string, itemKind string, url string, volume string"
    )
    zotero_items = spark.createDataFrame(
        [
            Row(
                key="Z1",
                title="Women in tech",
                date='תשס"ט 2009.',
                institution=None,
                publication="Journal X",
                publicationTitle=None,
                abstractNote="See http://z.example/a",
                language="eng",
                tags=[Row(tag="Domain_Health"), Row(tag="Source_Gov"), Row(tag="stats")],
                creators=[
                    Row(creatorType="author", firstName="Ada", lastName="L", name=None),
                    Row(creatorType="editor", firstName="E", lastName="D", name=None),
                    Row(creatorType="author", firstName=None, lastName=None, name="ACME Inst"),
                ],
                reportType=None,
                itemKind="report",
                url="z.example/a",
                volume=None,
            ),
            Row(
                key="Z2",
                title="",  # dropped: title required
                date="2015",
                institution="I",
                publication=None,
                publicationTitle=None,
                abstractNote=None,
                language="heb",
                tags=[],
                creators=[],
                reportType="brief",
                itemKind=None,
                url=None,
                volume=None,
            ),
        ],
        zotero_schema,
    )
    search_import = spark.createDataFrame(
        [
            ("M1", "מחקר על שוויון", 'תשע"ה. 2015', "הוצאה", "כהן, א", "ראו www.x.org.il", "x.org.il", "בריאות", "book", "gov", "שוויון", "heb eng"),
            ("", "no key - dropped", "2001", None, None, None, None, None, None, None, None, None),
            ("None", "none key - dropped", "2002", None, None, None, None, None, None, None, None, None),
            ("M2", "דו\"ח שנתי", "בשנת 1999", "None", None, None, None, "תעסוקה", None, None, None, "heb"),
        ],
        "migdar_id string, title string, pubyear string, publisher string, author string, "
        "notes string, url string, `Life Domains` string, `Item Type` string, "
        "`Resource Type` string, tags string, language_code string",
    )
    datasets_wide = spark.createDataFrame(
        [
            ("שכר נשים", "גברים", "קו", "אחוזים", "http://cbs.gov.il", "52.1", "54,000", None),
            (None, "נשים", "קו", "אחוזים", "http://cbs.gov.il", "48.9%", "51,000", "49.5"),
            ("תעסוקה", "כולם", "עמודות", "מספר", None, None, "1,234", "5678"),
        ],
        "chart_title string, series_title string, chart_type string, units string, "
        "source_url string, `2010` string, `2011` string, `2012` string",
    )
    return {
        "translations": translations,
        "orgs": orgs,
        "zotero_items": zotero_items,
        "search_import": search_import,
        "datasets_wide": datasets_wide,
    }


@pytest.fixture(scope="module")
def run_report(spark, fixtures, tmp_path_factory):
    data_dir = str(tmp_path_factory.mktemp("pipeline_stages"))
    ctx = PipelineContext(
        spark=spark,
        data_dir=data_dir,
        sources=fixtures,
        params={"base_url": "https://example.org"},
        now="2026-01-01T00:00:00Z",
    )
    graph = build_reference_graph()
    report = graph.run(ctx)
    return ctx, report


def test_all_pipelines_ran(run_report):
    _, report = run_report
    assert set(report) == {
        "organisations",
        "datasets",
        "dataset_assets",
        "zotero_fetch",
        "publications",
        "sitemap",
        "broken_links",
    }
    for name, stats in report.items():
        assert "resources" in stats, name


def test_topo_order_dependencies_first():
    graph = build_reference_graph()
    order = graph.topo_order()
    assert order.index("zotero_fetch") < order.index("publications")
    assert order.index("datasets") < order.index("dataset_assets")
    assert order.index("publications") < order.index("sitemap")


def test_organisations_semantics(run_report):
    ctx, _ = run_report
    orgs = ctx.stage("organisations", "orgs")
    rows = {r["doc_id"]: r for r in orgs.collect()}
    # dedup suffix: second 580001 became 580001.1 (organisations.py:44-52)
    assert "org/580001" in rows and "org/580001.1" in rows
    # URL repair (i18n.py:169-183)
    assert rows["org/580001"]["org_website"] == "http://org-a.org.il"
    # split_and_translate produced the 4 array fields
    assert rows["org/580001"]["life_areas__en"] == ["Health", "Employment"]
    assert rows["org/580002"]["life_areas"] == ["בריאות"]  # en key -> hebrew


def test_publications_semantics(run_report):
    ctx, _ = run_report
    pubs = ctx.stage("publications", "publications")
    rows = {r["migdar_id"]: r for r in pubs.collect()}
    # blank/'None' keys dropped (publications.py:93); zotero union adds Z1
    assert set(rows) == {"M1", "M2", "Z1"}
    assert rows["M1"]["year"] == 2015
    assert rows["Z1"]["year"] == 2009
    # 'None' publisher normalized to NULL (publications.py:66-72)
    assert rows["M2"]["publisher"] is None
    # zotero aliasing: publisher from publication, authors assembled
    assert rows["Z1"]["publisher"] == "Journal X"
    assert rows["Z1"]["authors"] == "Ada L, ACME Inst"
    # anchor rewrite in notes (common.py:17-23)
    assert '<a href="http://z.example/a"' in rows["Z1"]["notes"]
    assert rows["M1"]["doc_id"] == "publications/M1"


def test_datasets_semantics(run_report):
    ctx, _ = run_report
    charts = ctx.stage("datasets", "datasets")
    rows = {r["chart_title"]: r for r in charts.collect()}
    # forward fill: the null chart_title row joined 'שכר נשים' (datasets.py:303-309)
    assert set(rows) == {"שכר נשים", "תעסוקה"}
    wages = rows["שכר נשים"]
    assert wages["num_datasets"] == 2
    assert wages["chart_type"] == "line"
    series = {s["series_title"]: s["dataset"] for s in wages["series"]}
    men = {p["x"]: p["y"] for p in series["גברים"]}
    women = {p["x"]: p["y"] for p in series["נשים"]}
    # % stripped, ',' group chars stripped (datasets.py:130-147,345)
    assert men == {"2010": 52.1, "2011": 54000.0}
    assert women == {"2010": 48.9, "2011": 51000.0, "2012": 49.5}
    assert wages["doc_id"].startswith("dataset/")


def test_sitemap_and_assets(run_report):
    ctx, _ = run_report
    urls = ctx.stage("sitemap", "sitemap_urls")
    locs = [r["loc"] for r in urls.collect()]
    assert all(u.startswith("https://example.org/") for u in locs)
    # one per distinct doc: 3 pubs + 3 orgs + 2 charts
    assert len(locs) == len(set(locs)) == 8
    index = ctx.stage("dataset_assets", "asset_index")
    assert index.count() == 2  # one grid per chart doc


def test_broken_links_url_dedup(run_report):
    ctx, _ = run_report
    links = ctx.stage("broken_links", "all_links")
    urls = [r["url"] for r in links.collect()]
    # first-seen dedup across docs: http://b.org appears in 2 org fields once
    assert len(urls) == len(set(urls))
    assert "http://b.org" in urls
    # anchor-tag href URLs extracted from notes too
    assert "http://z.example/a" in urls


def test_skip_materialized_resume(run_report):
    ctx, _ = run_report
    graph = build_reference_graph()
    report2 = graph.run(ctx, skip_materialized=True)
    assert all(stats.get("skipped") for stats in report2.values())


def test_broken_links_with_checker(spark, fixtures, tmp_path):
    # nested so cloudpickle ships it by value (executors can't import tests/)
    def _fake_check(row):
        if row["url"] == "http://b.org":
            return {"status": 404, "error": "HTTP 404"}
        return {"status": 200, "error": None}

    ctx = PipelineContext(
        spark=spark,
        data_dir=str(tmp_path),
        sources=fixtures,
        params={"check_url": _fake_check, "link_check_parallelism": 2},
        now="2026-01-01T00:00:00Z",
    )
    graph = build_reference_graph()
    graph.run(ctx, targets=["broken_links"])
    broken = ctx.stage("broken_links", "broken_links")
    rows = {r["url"]: r["error"] for r in broken.collect()}
    assert rows == {"http://b.org": "HTTP 404"}
