"""Round-12 operators: KS drift, chi-square independence, Benford audit,
linear interpolation, triangle census, streaming top-k — hand-computed
fixtures plus plan-shape assertions (the 100 TB properties: pruned scans,
broadcast-or-shuffled id-pair joins, no cartesian products outside the
deliberately-exact oracle kernels)."""

import math

import pytest
from pyspark.sql import functions as F

from migdar_data_pipelines_spark.operators.graph import triangle_count
from migdar_data_pipelines_spark.operators.profile import (
    benford_report,
    chi_square_independence,
    ks_two_sample_by,
)
from migdar_data_pipelines_spark.operators.windows import interpolate_linear
from migdar_data_pipelines_spark.plans import query_fns


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


# ---------------------------------------------------------------- KS drift


def test_ks_two_sample_hand_case(spark):
    # A = {1,2,3}, B = {2,3,4}: ECDF sup gap is 1/3 (at x=1, 2, or 3)
    rows = [("g", 1, False), ("g", 2, False), ("g", 3, False),
            ("g", 2, True), ("g", 3, True), ("g", 4, True)]
    df = spark.createDataFrame(rows, "g string, x int, s boolean")
    out = ks_two_sample_by(df, "g", "x", "s").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_a"], r["n_b"]) == (3, 3)
    assert r["ks_d"] == pytest.approx(1.0 / 3.0, abs=1e-6)


def test_ks_two_sample_identical_samples_zero(spark):
    rows = [("g", v, s) for v in (1, 2, 5, 9) for s in (False, True)]
    df = spark.createDataFrame(rows, "g string, x int, s boolean")
    assert ks_two_sample_by(df, "g", "x", "s").collect()[0]["ks_d"] == 0.0


def test_ks_two_sample_empty_side_null(spark):
    rows = [("g", 1, False), ("g", 2, False)]
    df = spark.createDataFrame(rows, "g string, x int, s boolean")
    r = ks_two_sample_by(df, "g", "x", "s").collect()[0]
    assert r["n_b"] == 0 and r["ks_d"] is None


def test_ks_disjoint_samples_is_one(spark):
    rows = [("g", 1, False), ("g", 2, False), ("g", 10, True), ("g", 11, True)]
    df = spark.createDataFrame(rows, "g string, x int, s boolean")
    assert ks_two_sample_by(df, "g", "x", "s").collect()[0]["ks_d"] == 1.0


# ------------------------------------------------- chi-square independence


def test_chi_square_independent_table_is_zero(spark):
    rows = (
        [("a", "x")] * 10 + [("a", "y")] * 10
        + [("b", "x")] * 10 + [("b", "y")] * 10
    )
    df = spark.createDataFrame(rows, "u string, v string")
    r = chi_square_independence(df, "u", "v").collect()[0]
    assert r["n"] == 40 and r["dof"] == 1
    assert r["chi2"] == 0.0 and r["cramers_v"] == 0.0


def test_chi_square_perfect_association(spark):
    rows = [("a", "x")] * 10 + [("b", "y")] * 10
    df = spark.createDataFrame(rows, "u string, v string")
    r = chi_square_independence(df, "u", "v").collect()[0]
    # 2x2 diagonal: chi2 = n, Cramér's V = 1
    assert r["chi2"] == pytest.approx(20.0, abs=1e-6)
    assert r["cramers_v"] == pytest.approx(1.0, abs=1e-6)


def test_chi_square_zero_cell_algebra(spark):
    # (b, y) is an EMPTY cell: the closed form must still produce the
    # full-grid statistic. Hand value: 3.75.
    rows = [("a", "x")] * 5 + [("a", "y")] * 5 + [("b", "x")] * 5
    df = spark.createDataFrame(rows, "u string, v string")
    r = chi_square_independence(df, "u", "v").collect()[0]
    assert r["n"] == 15 and (r["n_x"], r["n_y"]) == (2, 2)
    assert r["chi2"] == pytest.approx(3.75, abs=1e-6)


# -------------------------------------------------------------- Benford


def test_benford_digit_extraction_and_exclusions(spark):
    rows = [(1.00,), (2.50,), (19.99,), (0.05,), (-3.0,), (None,), (0.0,)]
    df = spark.createDataFrame(rows, "amt double")
    out = {r["digit"]: r for r in benford_report(df, "amt").collect()}
    assert sorted(out) == list(range(1, 10))  # always 9 rows
    assert out[1]["n_d"] == 2 and out[2]["n_d"] == 1 and out[5]["n_d"] == 1
    assert out[3]["n_d"] == 0  # absent digit present with zero count
    assert out[1]["obs_p"] == pytest.approx(0.5, abs=1e-6)
    assert out[1]["exp_p"] == pytest.approx(math.log10(2.0), abs=1e-6)


# ------------------------------------------------------ linear interpolation


def test_interpolate_linear_interior_gap(spark):
    rows = [(1, 0, 10.0), (2, 2, None), (3, 4, 30.0)]
    df = spark.createDataFrame(rows, "id int, x int, v double")
    out = interpolate_linear(df, "v", "x", ["id"], order_by=["x"])
    # single key? partition is id — make all one key
    df = spark.createDataFrame([(1, r[1], r[2]) for r in rows],
                               "k int, x int, v double")
    out = {r["x"]: r["v"] for r in
           interpolate_linear(df, "v", "x", ["k"], order_by=["x"]).collect()}
    assert out[0] == 10.0 and out[4] == 30.0
    assert out[2] == pytest.approx(20.0, abs=1e-9)


def test_interpolate_linear_time_weighted_not_row_weighted(spark):
    # gap sits at 1/4 of the x-span, not halfway by row position
    rows = [(1, 0, 0.0), (1, 1, None), (1, 4, 8.0)]
    df = spark.createDataFrame(rows, "k int, x int, v double")
    out = {r["x"]: r["v"] for r in
           interpolate_linear(df, "v", "x", ["k"], order_by=["x"]).collect()}
    assert out[1] == pytest.approx(2.0, abs=1e-9)


def test_interpolate_linear_edges_stay_null(spark):
    rows = [(1, 0, None), (1, 1, 5.0), (1, 2, None)]
    df = spark.createDataFrame(rows, "k int, x int, v double")
    out = {r["x"]: r["v"] for r in
           interpolate_linear(df, "v", "x", ["k"], order_by=["x"]).collect()}
    assert out[0] is None and out[2] is None and out[1] == 5.0


def test_interpolate_linear_duplicate_x_holds_previous(spark):
    rows = [(1, 1, 0, 5.0), (1, 1, 1, None), (1, 1, 2, 7.0)]
    df = spark.createDataFrame(rows, "k int, x int, tie int, v double")
    out = {r["tie"]: r["v"] for r in
           interpolate_linear(df, "v", "x", ["k"],
                              order_by=["x", "tie"]).collect()}
    assert out[1] == 5.0  # den = 0 bracket: limit from the left


def test_interpolate_linear_single_sort(spark):
    # both IGNORE NULLS frames must share ONE exchange+sort
    rows = [(1, 0, 10.0), (1, 2, None), (1, 4, 30.0)]
    df = spark.createDataFrame(rows, "k int, x int, v double")
    plan = _formatted_plan(
        interpolate_linear(df, "v", "x", ["k"], order_by=["x"])
    )
    # formatted plans list each node twice (tree + detail): count node
    # headers of the form "(N) Exchange"
    n_exchanges = sum(
        1
        for line in plan.splitlines()
        if line.startswith("(") and line.split(") ", 1)[-1].startswith("Exchange")
    )
    assert n_exchanges == 1, plan


# ---------------------------------------------------------- triangle census


def test_triangle_count_hand_graph(spark):
    # triangle 1-2-3, pendant 3-4, a reversed duplicate edge, a self loop
    rows = [(1, 2), (2, 3), (1, 3), (3, 4), (3, 2), (5, 5)]
    edges = spark.createDataFrame(rows, "src bigint, dst bigint")
    r = triangle_count(edges).collect()[0]
    assert r["n_nodes"] == 4 and r["n_edges"] == 4
    assert r["n_wedges"] == 5  # degs 2,2,3,1 -> 1+1+3+0
    assert r["n_triangles"] == 1
    assert r["transitivity"] == pytest.approx(0.6, abs=1e-6)


def test_triangle_count_triangle_free(spark):
    rows = [(1, 2), (2, 3), (3, 4)]  # a path
    edges = spark.createDataFrame(rows, "src bigint, dst bigint")
    r = triangle_count(edges).collect()[0]
    assert r["n_triangles"] == 0 and r["transitivity"] == 0.0


def test_triangle_count_complete_k4(spark):
    rows = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = spark.createDataFrame(rows, "src bigint, dst bigint")
    r = triangle_count(edges).collect()[0]
    assert r["n_triangles"] == 4 and r["transitivity"] == 1.0


def test_triangle_count_no_cartesian(spark):
    rows = [(1, 2), (2, 3), (1, 3)]
    edges = spark.createDataFrame(rows, "src bigint, dst bigint")
    plan = _formatted_plan(triangle_count(edges))
    assert "CartesianProduct" not in plan


# ------------------------------------------------------------- plan shapes


def test_ks_drift_plan_pruned_single_scan(spark, sf_dir):
    plan = _formatted_plan(query_fns()["ks_drift_events"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "value" in read and "event_type" in read and "ts" in read
    assert "props" not in read and "user_id" not in read
    # the per-group totals reach the cumulative frame by broadcast
    assert "BroadcastHashJoin" in plan


def test_chi_square_plan_no_grid(spark, sf_dir):
    plan = _formatted_plan(query_fns()["chi_square_orders"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_orderstatus" in read and "o_orderpriority" in read
    assert "o_totalprice" not in read and "o_comment" not in read


def test_benford_plan_pruned(spark, sf_dir):
    plan = _formatted_plan(query_fns()["benford_orders_totalprice"](spark, sf_dir))
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_totalprice" in read and "o_orderdate" not in read


# ----------------------------------------------------------------- CUSUM


def test_cusum_matches_recurrence(spark):
    import random

    from migdar_data_pipelines_spark.operators.profile import cusum_by

    rng = random.Random(7)
    rows = [("g", i, rng.randint(0, 100)) for i in range(200)]
    # reference: the literal Page recurrence
    s = 0
    max_s, alarms, first_alarm = 0, 0, None
    for _, i, x in rows:
        s = max(0, s + (x - 40 - 5))
        max_s = max(max_s, s)
        if s > 300:
            alarms += 1
            if first_alarm is None:
                first_alarm = i
    df = spark.createDataFrame(rows, "g string, i int, x long")
    r = cusum_by(
        df, "g", ["i"], "x", target=40, slack_k=5, threshold_h=300, id_col="i"
    ).collect()[0]
    assert r["n"] == 200
    assert r["max_cusum"] == max_s
    assert r["n_alarms"] == alarms
    assert r["first_alarm_id"] == first_alarm


def test_cusum_flat_series_zero(spark):
    from migdar_data_pipelines_spark.operators.profile import cusum_by

    rows = [("g", i, 10) for i in range(50)]
    df = spark.createDataFrame(rows, "g string, i int, x long")
    r = cusum_by(df, "g", ["i"], "x", target=10, slack_k=0,
                 threshold_h=1, id_col="i").collect()[0]
    assert r["max_cusum"] == 0 and r["n_alarms"] == 0
    assert r["first_alarm_id"] is None


def test_cusum_single_sort(spark):
    from migdar_data_pipelines_spark.operators.profile import cusum_by

    rows = [("g", i, 10) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, i int, x long")
    plan = _formatted_plan(
        cusum_by(df, "g", ["i"], "x", target=10, threshold_h=1)
    )
    n_exchanges = sum(
        1
        for line in plan.splitlines()
        if line.startswith("(") and line.split(") ", 1)[-1].startswith("Exchange")
    )
    # one exchange for the window partition + one for the final groupBy
    assert n_exchanges <= 2, plan


# ------------------------------------------------------------ co-purchase


def test_copurchase_hand_case(spark):
    from migdar_data_pipelines_spark.operators.frequent import copurchase_pairs

    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "b"),
        (4, "c"),
        (4, "c"),  # duplicate line collapses
    ]
    df = spark.createDataFrame(rows, "bk int, it string")
    out = {
        (r["item_a"], r["item_b"]): r
        for r in copurchase_pairs(
            df, "bk", "it", min_item_support=2, min_pair_support=2,
            max_basket_size=None,
        ).collect()
    }
    assert set(out) == {("a", "b")}
    r = out[("a", "b")]
    assert r["n_ab"] == 3 and r["n_a"] == 3 and r["n_b"] == 3
    # lift = n * n_ab / (n_a*n_b) = 4*3/9
    assert r["lift"] == pytest.approx(4 * 3 / 9, abs=1e-6)
    assert r["jaccard"] == pytest.approx(3 / 3, abs=1e-6)


def test_copurchase_apriori_prune_preserves_output(spark):
    from migdar_data_pipelines_spark.operators.frequent import copurchase_pairs

    rows = [(b, it) for b in range(6) for it in ("x", "y")] + [(0, "rare")]
    df = spark.createDataFrame(rows, "bk int, it string")
    full = copurchase_pairs(df, "bk", "it", min_item_support=1,
                            min_pair_support=3, max_basket_size=None)
    pruned = copurchase_pairs(df, "bk", "it", min_item_support=3,
                              min_pair_support=3, max_basket_size=None)
    a = {(r["item_a"], r["item_b"], r["n_ab"]) for r in full.collect()}
    b = {(r["item_a"], r["item_b"], r["n_ab"]) for r in pruned.collect()}
    # downward closure: pruning items below the PAIR floor can't change
    # which pairs survive
    assert a == b and ("x", "y", 6) in a


def test_copurchase_basket_ceiling_excludes(spark):
    from migdar_data_pipelines_spark.operators.frequent import copurchase_pairs

    # one bot cart with 50 items, two real baskets with a shared pair
    rows = [(99, f"i{k}") for k in range(50)]
    rows += [(1, "p"), (1, "q"), (2, "p"), (2, "q")]
    df = spark.createDataFrame(rows, "bk int, it string")
    out = copurchase_pairs(df, "bk", "it", min_item_support=2,
                           min_pair_support=2, max_basket_size=10).collect()
    assert {(r["item_a"], r["item_b"]) for r in out} == {("p", "q")}
