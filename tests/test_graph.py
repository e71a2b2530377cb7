"""Fixed-point PageRank: hand-computed ranks, ordering sanity, and
rerun determinism (the properties behind q114's exact-integer oracle)."""

from pyspark.sql import functions as F

from etl_marketeye_airflow_spark.operators.graph import (
    PR_SCALE,
    pagerank_fixed_point,
)


def test_pagerank_hand_computed_two_iters(spark):
    """A→B, A→C, B→C, 2 iterations, damping 17/20, scale 10^6:
    r1 = (A 150000, B 575000, C 1425000);
    r2 = (A 150000, B 213750, C 702500) — worked by hand with the
    exact truncating-division recurrence."""
    e = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "src long, dst long"
    )
    got = {
        r.node: r.rank_fx
        for r in pagerank_fixed_point(e, iters=2, eager=True).collect()
    }
    assert got == {1: 150_000, 2: 213_750, 3: 702_500}


def test_pagerank_star_center_dominates_and_deterministic(spark):
    """Every leaf points at the hub: the hub outranks all leaves after
    any iteration count; two runs agree bit-for-bit (integer algebra,
    no partial-agg-order sensitivity)."""
    e = spark.createDataFrame(
        [(i, 0) for i in range(1, 21)], "src long, dst long"
    )
    a = {r.node: r.rank_fx for r in pagerank_fixed_point(e, iters=3).collect()}
    b = {r.node: r.rank_fx for r in pagerank_fixed_point(e, iters=3).collect()}
    assert a == b
    assert all(a[0] > a[i] for i in range(1, 21))
    assert all(a[i] == 150_000 for i in range(1, 21))  # leaves get base only


def test_pagerank_zero_iters_is_uniform_init(spark):
    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    got = {r.node: r.rank_fx for r in pagerank_fixed_point(e, iters=0).collect()}
    assert got == {1: PR_SCALE, 2: PR_SCALE}
