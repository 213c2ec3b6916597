"""Property-based checks (hypothesis): operator semantics vs plain-Python
models. Each example ships a BATCH of generated inputs through one Spark job
so the suite stays fast."""

import re

from hypothesis import given, settings, strategies as st

from migdar_data_pipelines_spark.operators.textops import (
    clip_field,
    expand_year_ranges,
    extract_year,
    fix_url,
    split_to_array,
)

from pyspark.sql import functions as F

_SETTINGS = dict(max_examples=8, deadline=None)


def _run(spark, values, col_expr):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r["out"] for r in df.select(col_expr.alias("out")).collect()]


# ------------------------------------------------------------------ C12
year_token = st.builds(
    lambda a, b: f"{a}-{b}" if b is not None else str(a),
    st.integers(1900, 2099),
    st.one_of(st.none(), st.integers(1900, 2099)),
)
range_strs = st.lists(year_token, min_size=1, max_size=4).map(",".join)


def _model_expand(s: str) -> list[int]:
    out = set()
    for tok in re.split(r"\s*,\s*", s):
        m0 = re.match(r"^\s*([0-9]{4})", tok)
        m1 = re.search(r"-\s*([0-9]{4})", tok)
        lo = int(m0.group(1))
        hi = int(m1.group(1)) if m1 else lo
        out.update(range(lo, hi + 1))
    return sorted(out)


@settings(**_SETTINGS)
@given(st.lists(range_strs, min_size=1, max_size=30))
def test_expand_year_ranges_matches_model(spark, batch):
    # descending ranges (hi < lo) raise in Spark's sequence; filter to valid
    valid = []
    for s in batch:
        ok = True
        for tok in re.split(r"\s*,\s*", s):
            m0 = re.match(r"^\s*([0-9]{4})", tok)
            m1 = re.search(r"-\s*([0-9]{4})", tok)
            if m1 and int(m1.group(1)) < int(m0.group(1)):
                ok = False
        if ok:
            valid.append(s)
    if not valid:
        return
    got = _run(spark, valid, expand_year_ranges("v"))
    assert got == [_model_expand(s) for s in valid]


# ------------------------------------------------------------------ C5
noise = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="0123456789"),
    max_size=20,
)
dirty_year = st.builds(
    lambda pre, y, post: f"{pre}{y}{post}",
    noise,
    st.one_of(st.integers(1000, 2999), st.just("")),
    noise,
)


def _model_year(s):
    m = re.search(r"[12][0-9]{3}", s)
    return int(m.group(0)) if m else None


@settings(**_SETTINGS)
@given(st.lists(dirty_year, min_size=1, max_size=40))
def test_extract_year_matches_model(spark, batch):
    got = _run(spark, batch, extract_year("v"))
    assert got == [_model_year(s) for s in batch]


# ------------------------------------------------------------------ R4
@settings(**_SETTINGS)
@given(
    st.lists(
        st.lists(st.text(alphabet="ab c", max_size=6), max_size=5).map(",".join),
        min_size=1,
        max_size=30,
    )
)
def test_split_to_array_matches_model(spark, batch):
    got = _run(spark, batch, split_to_array("v", ","))
    expected = [
        [t.strip() for t in s.split(",") if t.strip() != ""] for s in batch
    ]
    assert got == expected


# ------------------------------------------------------------------ C9 / C6
@settings(**_SETTINGS)
@given(st.lists(st.text(min_size=0, max_size=300), min_size=1, max_size=30))
def test_clip_field_bounds(spark, batch):
    got = _run(spark, batch, clip_field("v", 200))
    assert all(g is None or len(g) <= 200 for g in got)
    assert got == [s[:200] for s in batch]


@settings(**_SETTINGS)
@given(
    # leading char alphanumeric: fix_url (like i18n.py:169-183) only repairs
    # values that *look* like bare domains, not ".org"-style fragments
    st.lists(
        st.from_regex(r"[a-z0-9][a-z0-9.]{0,19}(\.org|\.com)", fullmatch=True),
        min_size=1,
        max_size=30,
    )
)
def test_fix_url_always_schemed(spark, batch):
    got = _run(spark, batch, fix_url("v"))
    assert all(g.startswith("http://") for g in got)
    # idempotent: applying twice changes nothing
    again = _run(spark, got, fix_url("v"))
    assert again == got


# ------------------------------------------------------- PPJoin losslessness
doc_words = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]),
    min_size=1,
    max_size=12,
).map(" ".join)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(doc_words, min_size=2, max_size=14),
    st.sampled_from([0.6, 0.75, 0.8, 0.9, 1.0]),
)
def test_ppjoin_matches_exact_join_path(spark, texts, threshold):
    """Prefix + length + positional filtering must lose NOTHING across random
    corpora and thresholds: ngram_jaccard_pairs_ppjoin row-identical to the
    inverted-index path run blocking-free at the same threshold. A tiny
    8-word vocabulary maximizes shared grams — the adversarial regime where a
    buggy filter would actually drop qualifying pairs."""
    from migdar_data_pipelines_spark.llm.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_ppjoin,
    )

    df = spark.createDataFrame(list(enumerate(texts)), "id long, text string")
    exact = ngram_jaccard_pairs(
        df, "text", "id", n=2, block_col=F.lit(0), threshold=threshold
    )
    pp = ngram_jaccard_pairs_ppjoin(df, "text", "id", n=2, threshold=threshold)
    assert sorted(map(tuple, exact.collect())) == sorted(map(tuple, pp.collect()))


# ------------------------------------------------------- asof / range joins
asof_case = st.tuples(
    # left rows: (key, ts)
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=1, max_size=25
    ),
    # right rows: (key, ts, value) — unique (key, ts) enforced below
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100), st.integers(-5, 5)),
        min_size=0,
        max_size=25,
        unique_by=lambda r: (r[0], r[1]),
    ),
)


@settings(**_SETTINGS)
@given(asof_case)
def test_asof_join_matches_pandas_merge_asof(spark, case):
    """Differential oracle: pandas.merge_asof implements the same backward
    at-or-before semantics independently; asof_join must agree on arbitrary
    key/timestamp layouts, including ties, empty right sides, and keys with
    no matches."""
    import pandas as pd

    from migdar_data_pipelines_spark.operators.asof import asof_join

    left_rows, right_rows = case
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)], "id long, k long, ts long"
    )
    right = spark.createDataFrame([], "k long, rts long, v long") if not right_rows else (
        spark.createDataFrame(right_rows, "k long, rts long, v long")
    )
    got = {
        r["id"]: r["v"]
        for r in asof_join(
            left.withColumn("ts", F.col("ts").cast("timestamp")),
            right.withColumn("rts", F.col("rts").cast("timestamp")),
            on="k",
            left_ts="ts",
            right_ts="rts",
            fields={"v": "v"},
        ).collect()
    }

    lp = pd.DataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)], columns=["id", "k", "ts"]
    ).sort_values("ts", kind="stable")
    rp = pd.DataFrame(right_rows or [], columns=["k", "ts", "v"]).sort_values(
        "ts", kind="stable"
    )
    if rp.empty:
        expected = {i: None for i, _ in enumerate(left_rows)}
    else:
        m = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
        expected = {
            int(r.id): (None if pd.isna(r.v) else int(r.v)) for r in m.itertuples()
        }
    assert got == expected


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(0, 200), min_size=1, max_size=30),
    st.lists(
        st.tuples(st.integers(0, 200), st.integers(0, 60)),
        min_size=1,
        max_size=10,
    ),
    st.integers(1, 80),
)
def test_range_join_matches_naive(spark, points, iv, width):
    """Bucketed range join == naive BETWEEN join for arbitrary points,
    intervals (any length vs bucket width), and bucket widths."""
    from migdar_data_pipelines_spark.operators.rangejoin import range_join_bucketed

    p = spark.createDataFrame(
        [(i, x) for i, x in enumerate(points)], "pid long, x long"
    )
    ivs = spark.createDataFrame(
        [(j, s, s + ln) for j, (s, ln) in enumerate(iv)], "iid long, s long, e long"
    )
    got = {
        (r.pid, r.iid)
        for r in range_join_bucketed(p, ivs, "x", "s", "e", width).collect()
    }
    naive = {
        (i, j)
        for i, x in enumerate(points)
        for j, (s, ln) in enumerate(iv)
        if s <= x <= s + ln
    }
    assert got == naive


# ------------------------------------------------------------------ CMS
@settings(**_SETTINGS)
@given(
    st.lists(st.sampled_from([f"k{i}" for i in range(12)]), min_size=1, max_size=60)
)
def test_cms_estimate_is_always_an_upper_bound(spark, keys):
    """Count-min estimates can only over-count (hash collisions merge cells,
    never split them): est(key) >= true count for every key, and the total
    over all cells of one hash row equals the input size exactly."""
    from collections import Counter

    from migdar_data_pipelines_spark.operators.sketches import (
        CMS_DEPTH,
        cms_estimate,
        cms_sketch,
    )

    df = spark.createDataFrame([(k,) for k in keys], "u string")
    sk = cms_sketch(df, "u")
    cells = sk.collect()
    assert sum(c.cnt for c in cells) == len(keys) * CMS_DEPTH
    truth = Counter(keys)
    est = {
        r.key: r.est
        for r in cms_estimate(df.select("u").distinct(), "u", sk).collect()
    }
    assert set(est) == set(truth)
    for k, true_n in truth.items():
        assert est[k] >= true_n


# ------------------------------------------------------------------ linkage
@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcdefgh ", min_size=1, max_size=12),
            st.text(alphabet="abcdefgh ", min_size=1, max_size=12),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_levenshtein_matches_duckdb(spark, pairs):
    """The linkage verify step assumes Spark's levenshtein IS DuckDB's:
    identical plain edit distance on arbitrary strings (the cross-engine
    contract record_linkage_parts relies on)."""
    import duckdb

    df = spark.createDataFrame(pairs, "a string, b string")
    got = [
        r["d"] for r in df.select(F.levenshtein("a", "b").alias("d")).collect()
    ]
    con = duckdb.connect()
    want = [
        con.sql("SELECT levenshtein(?, ?)", params=[a, b]).fetchone()[0]
        for a, b in pairs
    ]
    assert got == want


# ------------------------------------------------------------------ KMV
@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.integers(0, 10**6), min_size=1, max_size=400),
    st.integers(2, 11),
)
def test_kmv_sketch_partition_invariant_and_python_equal(spark, vals, nparts):
    """The KMV sketch is a pure function of the VALUE SET: any partitioning
    of any multiset with the same distinct values yields the identical
    sketch, equal to the plain-Python k-min of the folds."""
    import hashlib

    from migdar_data_pipelines_spark.operators.sketches import (
        KMV_HEX_DIGITS,
        KMV_K,
        kmv_sketch,
    )

    want = sorted(
        {
            int(hashlib.md5(str(v).encode()).hexdigest()[:KMV_HEX_DIGITS], 16)
            for v in vals
        }
    )[:KMV_K]
    df = spark.createDataFrame(
        [(v,) for v in vals + vals], "u long"  # duplicated multiset
    ).repartition(nparts)
    got = [r["h"] for r in kmv_sketch(df, "u").orderBy("rk").collect()]
    assert got == want


# ---------------------------------------------------------------- kmeans
@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(-0.5, 0.5, allow_nan=False, width=32), min_size=3, max_size=3
        ),
        min_size=4,
        max_size=40,
    ),
    st.integers(2, 17),
)
def test_kmeans_partition_invariant(spark, vecs, nparts):
    """Lloyd k-means on integer micro-units is a pure function of the
    (id, vector) set — repartitioning must not change a single assignment,
    centroid, or distance (the float-free-trace property the oracle gate
    relies on)."""
    from migdar_data_pipelines_spark.llm.clustering import kmeans_fit

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    a = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    b = spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(
        nparts
    )
    out_a, cent_a = kmeans_fit(a, "vec_id", "embedding", k=3, n_iters=2)
    out_b, cent_b = kmeans_fit(b, "vec_id", "embedding", k=3, n_iters=2)
    assert cent_a == cent_b
    ra = {r["id"]: (r["cluster"], r["dist_q"]) for r in out_a.collect()}
    rb = {r["id"]: (r["cluster"], r["dist_q"]) for r in out_b.collect()}
    assert ra == rb


# ------------------------------------------------------------------- PSI
@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.sampled_from("abcdef"), min_size=1, max_size=60),
    st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=60),
)
def test_psi_terms_are_nonnegative(spark, a_keys, b_keys):
    """Every PSI term is (p_a - p_b) * ln(p_a / p_b): the factors always
    share a sign, so each per-bucket term — and the __total__ — must be
    >= 0 for ANY pair of distributions (a property the add-one smoothing
    must not break)."""
    from migdar_data_pipelines_spark.operators.profile import psi_drift

    da = spark.createDataFrame([(k,) for k in a_keys], "lang string")
    db = spark.createDataFrame([(k,) for k in b_keys], "lang string")
    rows = psi_drift(da, db, ["lang"]).collect()
    assert rows, "one row per union bucket plus the total"
    for r in rows:
        assert r["psi_term"] >= 0.0, (r["lang"], r["psi_term"])
