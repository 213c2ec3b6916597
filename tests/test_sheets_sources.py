"""S9 transpose scan + S5 multi-sheet reader logic."""

import pytest

from migdar_data_pipelines_spark.sources.sheets import (
    frames_from_sheets,
    sheets_to_rows,
    transpose_grid,
)


def test_transpose_grid(spark):
    # datasets.py:86-104 — first column holds field names; data columns
    # become rows.
    df = spark.createDataFrame(
        [
            ("chart_title", "שכר", "תעסוקה"),
            ("units", "%", "מספר"),
            ("2010", "52.1", "1,234"),
        ],
        "field string, colA string, colB string",
    )
    out = transpose_grid(df, "field")
    rows = {r["__source_col"]: r for r in out.collect()}
    assert set(rows) == {"colA", "colB"}
    assert rows["colA"]["chart_title"] == "שכר"
    assert rows["colA"]["units"] == "%"
    assert rows["colB"]["2010"] == "1,234"


def test_sheets_header_reuse_and_key_filter():
    sheets = {
        "Sheet1": [
            ["migdar_id", "title"],
            ["M1", "a"],
            ["", "dropped - no key"],
            ["M2", "b"],
        ],
        "Sheet2 (deleted)": [["migdar_id", "title"], ["MX", "skipped"]],
        "Sheet3": [  # no header row: reuses Sheet1's (gdrive loader :30-41)
            ["M3", "c"],
            [None, "dropped"],
        ],
    }
    header, rows = sheets_to_rows(sheets, "migdar_id")
    assert header == ["migdar_id", "title", "__sheet"]
    assert [(r["migdar_id"], r["__sheet"]) for r in rows] == [
        ("M1", "Sheet1"),
        ("M2", "Sheet1"),
        ("M3", "Sheet3"),
    ]


def test_sheets_synthetic_ids():
    # S10 (obsolete/join_publications.py:26-36): key synthesized per row
    sheets = {"s1": [["migdar_id", "v"], ["", "x"], [None, "y"]]}
    _, rows = sheets_to_rows(sheets, "migdar_id", id_template="{sheet}-{rownum}")
    assert [r["migdar_id"] for r in rows] == ["s1-0", "s1-1"]


def test_sheets_missing_header_raises():
    with pytest.raises(ValueError, match="lacks"):
        sheets_to_rows({"only": [["a", "b"], ["1", "2"]]}, "migdar_id")


def test_frames_from_sheets(spark):
    sheets = {"s": [["migdar_id", "n"], ["M1", 5], ["M2", None]]}
    df = frames_from_sheets(spark, sheets, "migdar_id")
    assert df.columns == ["migdar_id", "n", "__sheet"]
    got = {r["migdar_id"]: r["n"] for r in df.collect()}
    assert got == {"M1": "5", "M2": None}  # all-string load (INFER_STRINGS)
