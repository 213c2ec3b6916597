"""Web-artifact sinks: K7 XML sitemap writer, K8 Excel re-pivot writer,
K9 screenshot post-processor stub.

Reference semantics:
- K7 (datapackage_pipelines_migdar/flows/sitemap.py:8-26,73-79): one
  ``<urlset>`` XML file per resource — a ``<url><loc>..</loc><lastmod>..
  </lastmod></url>`` entry per row — plus a handwritten ``<sitemapindex>``
  over the per-resource files.
- K8 (datapackage_pipelines_migdar/flows/dataset_assets.py:21-48): per chart
  row, fill an XLSX template: metadata cells, one column per series, one row
  per x value.
- K9 (dataset_assets.py:51-66 + flows/node/screenshot.js): shell out per doc
  to screenshot chart pages — out of engine scope, kept as a driver-side
  post-processing hook.

Scale notes: sitemaps are bounded by the protocol itself (50k URLs per file),
so the per-resource URL lists are driver-small by construction; we still
build the XML body distributed (one string row per URL via ``selectExpr``)
and only assemble the final file on the driver. The Excel writer is
inherently row-wise over collected chart docs (hundreds), driver-side like
the reference.
"""

from __future__ import annotations

import html
import os
from collections.abc import Callable, Iterable
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - optional dependency
    import openpyxl  # noqa: F401

    HAVE_OPENPYXL = True
except Exception:  # pragma: no cover
    HAVE_OPENPYXL = False

SITEMAP_XMLNS = "http://www.sitemaps.org/schemas/sitemap/0.9"


def sitemap_entries(
    df: DataFrame, loc_col: str = "loc", lastmod_col: str | None = "lastmod"
) -> DataFrame:
    """Distributed body build: one ``<url>...`` XML string row per input row
    (XML-escaped). Stays in whole-stage codegen; the driver only concatenates
    headers and (protocol-bounded, <=50k) body lines."""
    loc = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col(loc_col), "&", "&amp;"), "<", "&lt;"
        ),
        ">",
        "&gt;",
    )
    entry = F.concat(F.lit("  <url><loc>"), loc, F.lit("</loc>"))
    if lastmod_col is not None and lastmod_col in df.columns:
        entry = F.concat(
            entry, F.lit("<lastmod>"), F.col(lastmod_col).cast("string"), F.lit("</lastmod>")
        )
    entry = F.concat(entry, F.lit("</url>"))
    return df.select(entry.alias("xml"))


def write_sitemap(
    df: DataFrame,
    path: str,
    loc_col: str = "loc",
    lastmod_col: str | None = "lastmod",
) -> int:
    """K7: write one ``<urlset>`` file. Returns the URL count (the sitemap
    protocol caps a file at 50k URLs — caller shards above that)."""
    rows = [r["xml"] for r in sitemap_entries(df, loc_col, lastmod_col).collect()]
    if len(rows) > 50_000:
        raise ValueError(
            f"sitemap file would hold {len(rows)} URLs (protocol cap 50k); "
            "shard the input and use write_sitemap_index"
        )
    body = "\n".join(
        [
            '<?xml version="1.0" encoding="UTF-8"?>',
            f'<urlset xmlns="{SITEMAP_XMLNS}">',
            *rows,
            "</urlset>",
        ]
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        f.write(body + "\n")
    return len(rows)


def write_sitemap_index(
    sitemap_urls: Iterable[str], path: str, lastmod: str | None = None
) -> None:
    """K7 index (sitemap.py:73-79): handwritten ``<sitemapindex>`` over the
    per-resource sitemap files."""
    entries = []
    for u in sitemap_urls:
        e = f"  <sitemap><loc>{html.escape(u)}</loc>"
        if lastmod:
            e += f"<lastmod>{lastmod}</lastmod>"
        entries.append(e + "</sitemap>")
    body = "\n".join(
        [
            '<?xml version="1.0" encoding="UTF-8"?>',
            f'<sitemapindex xmlns="{SITEMAP_XMLNS}">',
            *entries,
            "</sitemapindex>",
        ]
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        f.write(body + "\n")


def chart_rows_to_tables(rows: Iterable[dict[str, Any]]) -> dict[str, list[list[Any]]]:
    """K8 re-pivot as pure data (testable without openpyxl): per chart doc —
    ``{doc_id: grid}`` where the grid is metadata rows, then a header row
    (x-label + one column per series), then one row per x value
    (dataset_assets.py:27-44). ``series`` is the nested
    array-of-{series_title, dataset:[{x,y}]} built by the datasets flow."""
    out: dict[str, list[list[Any]]] = {}
    for row in rows:
        series = row.get("series") or []
        xs: list[str] = []
        for s in series:
            for pt in s.get("dataset") or []:
                if pt["x"] not in xs:
                    xs.append(pt["x"])
        grid: list[list[Any]] = [
            ["title", row.get("chart_title")],
            ["units", row.get("units")],
            ["source", row.get("source_url")],
        ]
        grid.append(["x", *[s.get("series_title") for s in series]])
        for x in xs:
            line: list[Any] = [x]
            for s in series:
                y = None
                for pt in s.get("dataset") or []:
                    if pt["x"] == x:
                        y = pt["y"]
                        break
                line.append(y)
            grid.append(line)
        out[row["doc_id"]] = grid
    return out


def write_excel_assets(
    df: DataFrame, out_dir: str, template_path: str | None = None
) -> dict[str, str]:
    """K8: one XLSX per chart doc. Spark side collects the (small, hundreds)
    chart docs; the workbook fill is driver-side like the reference. Gated on
    openpyxl."""
    if not HAVE_OPENPYXL:  # pragma: no cover
        raise NotImplementedError(
            "openpyxl not installed; write_excel_assets needs it "
            "(chart_rows_to_tables is the testable re-pivot logic)"
        )
    import openpyxl as _xl  # pragma: no cover

    grids = chart_rows_to_tables(r.asDict(True) for r in df.collect())
    os.makedirs(out_dir, exist_ok=True)
    written = {}
    for doc_id, grid in grids.items():  # pragma: no cover
        wb = (
            _xl.load_workbook(template_path) if template_path else _xl.Workbook()
        )
        ws = wb.active
        for i, line in enumerate(grid, start=1):
            for j, v in enumerate(line, start=1):
                ws.cell(row=i, column=j, value=v)
        fn = os.path.join(out_dir, f"{doc_id.replace('/', '_')}.xlsx")
        wb.save(fn)
        written[doc_id] = fn
    return written


def screenshot_docs(
    df: DataFrame,
    out_dir: str,
    runner: Callable[[str, str], None] | None = None,
    variants: tuple[str, ...] = ("main", "social"),
) -> list[str]:
    """K9 stub (dataset_assets.py:51-66): per doc_id, invoke a screenshot
    runner per variant. The real renderer (puppeteer) is out of engine scope;
    ``runner`` is injectable for tests, and the default raises."""
    ids = [r[0] for r in df.select("doc_id").collect()]
    if runner is None:
        raise NotImplementedError(
            "screenshot rendering needs a headless browser; inject runner(doc_id, out_path)"
        )
    done = []
    for doc_id in ids:
        for v in variants:
            out = os.path.join(out_dir, f"{doc_id.replace('/', '_')}.{v}.png")
            runner(doc_id, out)
            done.append(out)
    return done


__all__ = [
    "sitemap_entries",
    "write_sitemap",
    "write_sitemap_index",
    "chart_rows_to_tables",
    "write_excel_assets",
    "screenshot_docs",
    "HAVE_OPENPYXL",
]
