"""C5-C17: scalar text/derivation operators, all pure column expressions.

Every one of these was arbitrary Python in the reference; here they are
JVM-side expressions inside whole-stage codegen — no Python in the hot path.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

YEAR_RE = r"[12][0-9]{3}"


def extract_year(col: Column | str, as_int: bool = True) -> Column:
    """C5: first [12]\\d{3} in a dirty string (flows/publications.py:51-63
    pulls 2009 out of 'תשס"ט 2009.'). Null when absent."""
    c = F.col(col) if isinstance(col, str) else col
    got = F.regexp_extract(c, YEAR_RE, 0)
    got = F.when(got == "", None).otherwise(got)
    return got.cast("int") if as_int else got


def fix_url(col: Column | str) -> Column:
    """C6: prefix scheme-less URLs with http:// (flows/i18n.py:169-183,
    applied at datasets.py:337, publications.py:120, organisations.py:59)."""
    c = F.col(col) if isinstance(col, str) else col
    needs = (~c.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")) & c.rlike(r"^[a-zA-Z0-9]")
    return F.when(c.isNotNull() & needs, F.concat(F.lit("http://"), c)).otherwise(c)


URL_IN_TEXT_RE = r"(https?://[^\s]+)"


def rewrite_links_as_anchors(col: Column | str) -> Column:
    """C7: replace raw URLs in free text with <a> tags
    (flows/common.py:17-23, used publications.py:132, organisations.py:91-93)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, URL_IN_TEXT_RE, '<a href="$1" target="_blank">$1</a>')


def normalize_none_strings(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """C8: literal 'None' strings -> NULL across columns
    (flows/publications.py:66-72)."""
    targets = cols or [c for c, t in df.dtypes if t == "string"]
    return df.withColumns(
        {c: F.when(F.col(c) == "None", None).otherwise(F.col(c)) for c in targets}
    )


def clip_field(col: Column | str, max_len: int = 200) -> Column:
    """C9: truncate over-long keys (flows/publications.py:75-80 clips
    migdar_id to 200 chars)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, 1, max_len)


def recode_map(
    col: Column | str, mapping: dict[Any, Any], default: Any = None, strict: bool = False
) -> Column:
    """C11: dict-lookup recode (flows/datasets.py:276-300 maps Hebrew chart
    labels -> line/stacked/...; flows/judges.py:26-43 tribunal codes).
    ``strict`` mirrors the reference's KeyError-on-unknown hard fail: unknowns
    become the sentinel '__UNKNOWN__' which validate_in_set can assert empty.
    """
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for k, v in mapping.items():
        cond = c == F.lit(k)
        expr = F.when(cond, F.lit(v)) if expr is None else expr.when(cond, F.lit(v))
    fallback = F.lit("__UNKNOWN__") if strict else F.lit(default)
    return expr.otherwise(fallback) if expr is not None else fallback


def expand_year_ranges(col: Column | str) -> Column:
    """C12: '2010-2012,2014' -> [2010, 2011, 2012, 2014]
    (flows/datasets.py:115-127). Pure expressions: split -> per-token
    sequence(lo, hi) -> flatten -> distinct -> sort."""
    c = F.col(col) if isinstance(col, str) else col
    tokens = F.split(c, r"\s*,\s*")
    per_token = F.transform(
        tokens,
        lambda t: F.sequence(
            F.regexp_extract(t, r"^\s*([0-9]{4})", 1).cast("int"),
            F.coalesce(
                F.when(F.regexp_extract(t, r"-\s*([0-9]{4})", 1) == "", None).otherwise(
                    F.regexp_extract(t, r"-\s*([0-9]{4})", 1)
                ).cast("int"),
                F.regexp_extract(t, r"^\s*([0-9]{4})", 1).cast("int"),
            ),
        ),
    )
    return F.array_sort(F.array_distinct(F.flatten(per_token)))


def year_date_range(year_col: Column | str) -> tuple[Column, Column, Column]:
    """C13: year -> (__date_range_from, __date_range_to, [YYYY-MM x12])
    (obsolete/prepare_data_for_es.py:209-218)."""
    y = (F.col(year_col) if isinstance(year_col, str) else year_col).cast("int")
    frm = F.to_date(F.concat(y.cast("string"), F.lit("-01-01")))
    to = F.to_date(F.concat(y.cast("string"), F.lit("-12-31")))
    months = F.transform(
        F.sequence(F.lit(1), F.lit(12)),
        lambda m: F.concat(y.cast("string"), F.lit("-"), F.lpad(m.cast("string"), 2, "0")),
    )
    return frm, to, months


def md5_doc_id(prefix: str, col: Column | str, length: int = 16) -> Column:
    """C17: doc_id = prefix + md5(value)[:length]
    (flows/datasets.py:430-436 builds 'dataset/' + md5(title)[:16])."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(F.lit(prefix), F.substring(F.md5(c.cast("string")), 1, length))


def content_hash(cols: list[str], sep: str = "|") -> Column:
    """C17/D2: md5 over concatenated fields — the CDC row hash
    (obsolete/prepare_data_for_es.py:80-87). Nulls encoded distinctly so
    (null, 'a') != ('a', null)."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in cols]
    return F.md5(F.concat_ws(sep, *parts))


def clean_string(col: Column | str) -> Column:
    """C16: strip, NBSP->space, lower (flows/i18n.py:26-32)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(F.regexp_replace(c, " ", " ")))


def split_to_array(col: Column | str, delimiter: str = ",") -> Column:
    """R4: delimiter split with per-element trim, empties dropped
    (obsolete/dump_publications_to_es.py:13-34; i18n.py:93-98)."""
    c = F.col(col) if isinstance(col, str) else col
    arr = F.transform(F.split(c, re.escape(delimiter)), lambda x: F.trim(x))
    return F.filter(arr, lambda x: (x != "") & x.isNotNull())
