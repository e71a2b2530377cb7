"""Tests: one-pass column profiling + SCD2 history merge + bucketed join."""

import pytest
from pyspark.sql import functions as F

from etl_marketeye_airflow_spark.operators.profile import profile_columns, scd2_merge


def test_profile_columns(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 5.0), (3, "a", 6.0), (4, None, None)],
        "id long, cat string, val double",
    )
    prof = {r.column_name: r for r in profile_columns(df).collect()}
    assert prof["id"].n_rows == 4 and prof["id"].n_distinct == 4
    assert prof["cat"].n_non_null == 3 and prof["cat"].n_distinct == 2
    assert prof["val"].null_fraction == pytest.approx(0.5)
    # float columns render as conv-14 dyadic fixed point (engine-stable;
    # plain double→string diverges on notation thresholds — r8 fuzz)
    assert prof["val"].min_value == f"fx20:{5 * 1048576}"
    assert prof["val"].max_value == f"fx20:{6 * 1048576}"


def test_profile_single_plan(spark):
    """The whole profile is ONE aggregate — no per-column scan loop."""
    df = spark.createDataFrame([(1, "a")], "id long, cat string")
    plan = profile_columns(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") + plan.count("LocalTableScan") <= 2


def test_scd2_merge(spark):
    hist = spark.createDataFrame(
        [
            ("p1", 100.0, "2026-01-01", "2026-01-02"),  # already closed
            ("p1", 120.0, "2026-01-02", None),          # active, will change
            ("p2", 50.0, "2026-01-01", None),           # active, unchanged
            ("p3", 70.0, "2026-01-01", None),           # active, disappears
        ],
        "product_id string, price double, valid_from string, valid_to string",
    )
    incoming = spark.createDataFrame(
        [("p1", 130.0), ("p2", 50.0), ("p4", 99.0)], "product_id string, price double"
    )
    out = scd2_merge(hist, incoming, "product_id", ["price"], "2026-01-03")
    rows = {(r.product_id, r.price, r.valid_from, r.valid_to) for r in out.collect()}
    assert rows == {
        ("p1", 100.0, "2026-01-01", "2026-01-02"),  # untouched closed history
        ("p1", 120.0, "2026-01-02", "2026-01-03"),  # closed by change
        ("p1", 130.0, "2026-01-03", None),          # new version
        ("p2", 50.0, "2026-01-01", None),           # unchanged stays open
        ("p3", 70.0, "2026-01-01", "2026-01-03"),   # closed by disappearance
        ("p4", 99.0, "2026-01-03", None),           # brand-new key
    }


def test_bucketed_join_no_shuffle(spark):
    """bucketBy'd tables co-locate a sort-merge join: neither side gets
    an Exchange (only the tiny final agg shuffles) — the at-scale
    repeated-join pattern.  merge hint forces SMJ (tiny tables would
    otherwise broadcast, which proves nothing about bucketing)."""
    import shutil

    # session catalogs don't survive across pytest runs but warehouse
    # dirs do — clear both to keep the test rerunnable
    for t in ("li_b", "ord_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_b")
    orders.write.bucketBy(8, "o_orderkey").saveAsTable("ord_b")
    j = (
        spark.table("li_b")
        .hint("merge")
        .join(spark.table("ord_b"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .count()
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert plan.count("Bucketed: true") == 2
    assert plan.count("Exchange") == 1  # only the final agg exchange
    assert j.count() > 0  # and it actually runs
    for t in ("li_b", "ord_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_scd2_remerge_own_output(spark):
    """Merging SCD2 output against the SAME incoming frame (the daily
    batch shape) must not hit ambiguous-self-join resolution, and a
    no-change re-merge must be a no-op on the active rows."""
    hist = spark.createDataFrame(
        [("p1", 10.0, "d1", None)], "k string, price double, valid_from string, valid_to string"
    )
    inc = spark.createDataFrame([("p1", 12.0)], "k string, price double")
    h2 = scd2_merge(hist, inc, "k", ["price"], "d2")
    h3 = scd2_merge(h2, inc, "k", ["price"], "d3")
    assert sorted((r.price, r.valid_from, r.valid_to) for r in h3.collect()) == [
        (10.0, "d1", "d2"),
        (12.0, "d2", None),  # unchanged vs incoming → stays open, no d3 version
    ]


# --- regression tests (2nd review round) ------------------------------------

def test_profile_numeric_minmax_not_lexicographic(spark):
    df = spark.createDataFrame([(2,), (10,)], "n int")
    r = profile_columns(df).collect()[0]
    assert r.min_value == "2" and r.max_value == "10"  # not '10' < '2'


def test_profile_weird_column_names(spark):
    df = spark.createDataFrame([(1, 2.0)], ["order date", "price (mad)'s"])
    names = {r.column_name for r in profile_columns(df).collect()}
    assert names == {"order date", "price (mad)'s"}


def test_scd2_duplicate_incoming_raises(spark):
    hist = spark.createDataFrame(
        [("p1", 10.0, "d1", None)], "k string, price double, valid_from string, valid_to string"
    )
    inc = spark.createDataFrame([("p1", 12.0), ("p1", 13.0)], "k string, price double")
    with pytest.raises(ValueError, match="multiple rows"):
        scd2_merge(hist, inc, "k", ["price"], "d2")


def test_skew_singleton_group_null_std(spark):
    from etl_marketeye_airflow_spark.operators.skew import salted_group_stats

    df = spark.createDataFrame([("solo", 5.0)], "k string, v double")
    r = salted_group_stats(df, "k", "v").collect()[0]
    assert r.total_count == 1 and r.value_std is None and r.value_mean == 5.0


def test_asof_null_right_time_never_matches(spark):
    from etl_marketeye_airflow_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(1, 100, "L")], "k long, t long, lbl string")
    right = spark.createDataFrame(
        [(1, None, 9.0)], "k long, t long, v double"  # null-time right row
    )
    row = asof_join(left, right, "k", "t", ["t", "v"]).collect()[0]
    assert row.asof_t is None and row.asof_v is None


# --- approximate-aggregate extension (SURVEY §2.4): error-bound pins ------
# Sketches can't be oracle-hash-gated (not cross-engine stable); the honest
# gate is a statistical bound against the exact computation on real testdata.

def _lineitem_offers(spark):
    from etl_marketeye_airflow_spark.sources.tables import load_table

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem")
    from pyspark.sql import functions as F

    return li.select(
        F.col("l_partkey").alias("product_id"),
        (F.col("l_suppkey") % 7).cast("string").alias("source"),
        F.col("l_extendedprice").cast("double").alias("price"),
    )


def test_approx_market_stats_error_bounds(spark):
    from pyspark.sql import functions as F

    from etl_marketeye_airflow_spark.operators.stats import approx_market_stats

    offers = _lineitem_offers(spark)
    priced = offers.filter(F.col("price") > 0)
    exact = priced.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("product_id").alias("d_prod"),
        F.countDistinct("source").alias("d_src"),
        F.countDistinct("price").alias("d_price"),
    ).collect()[0]
    got = approx_market_stats(offers, rsd=0.05).collect()[0]

    assert got.n_offers == exact.n  # plain count stays exact
    # HLL++ relative-error bound: 4 sigma of the configured rsd
    for a, e in (
        (got.approx_products, exact.d_prod),
        (got.approx_sources, exact.d_src),
        (got.approx_price_points, exact.d_price),
    ):
        assert abs(a - e) <= max(4 * 0.05 * e, 2), (a, e)

    # percentile_approx rank-error contract: each returned value is a real
    # data value whose rank is within n/accuracy (+ties) of the target
    import numpy as np

    vals = np.sort(np.array([r.price for r in priced.select("price").collect()]))
    n = len(vals)
    eps = 1.0 / 10000
    for p, v in zip((0.25, 0.5, 0.75, 0.95), got.price_quantiles):
        lo = np.searchsorted(vals, v, side="left") / n   # rank below v
        hi = np.searchsorted(vals, v, side="right") / n  # rank through ties
        assert lo - eps <= p <= hi + eps, (p, v, lo, hi)
        assert v in vals  # GK returns REAL data values, never interpolations


def test_approx_numeric_quantiles_bounds_and_shape(spark):
    import numpy as np

    from etl_marketeye_airflow_spark.operators.profile import approx_numeric_quantiles
    from etl_marketeye_airflow_spark.sources.tables import load_table

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    rows = {r.column_name: r for r in approx_numeric_quantiles(li, cols).collect()}
    assert set(rows) == set(cols)

    data = li.select(*cols).toPandas()
    eps = 1.0 / 10000
    for c in cols:
        vals = np.sort(data[c].to_numpy(dtype=float))
        n = len(vals)
        r = rows[c]
        assert list(r.probabilities) == [0.25, 0.5, 0.75, 0.95]
        for p, v in zip(r.probabilities, r.quantiles):
            lo = np.searchsorted(vals, v, side="left") / n
            hi = np.searchsorted(vals, v, side="right") / n
            assert lo - eps <= p <= hi + eps, (c, p, v, lo, hi)


def test_replicated_salt_join_equals_plain_join(spark):
    """Inner and left salted joins reproduce the plain join's exact
    multiset on a skewed big side (one hot key with duplicates, one
    unmatched key), for n_salts both below and above the row count."""
    from etl_marketeye_airflow_spark.operators.skew import (
        replicated_salt_join,
    )

    big = spark.createDataFrame(
        [(1, "a")] * 7 + [(2, "b"), (3, "c")], "k long, payload string"
    )
    small = spark.createDataFrame(
        [(1, "x"), (2, "y"), (9, "z")], "k long, dim string"
    )
    for n_salts in (2, 16):
        for how in ("inner", "left"):
            want = sorted(
                map(tuple, big.join(small, "k", how).collect())
            )
            got = sorted(
                map(
                    tuple,
                    replicated_salt_join(
                        big, small, "k", n_salts=n_salts, how=how
                    ).collect(),
                )
            )
            assert got == want, (n_salts, how)


def test_replicated_salt_join_guards(spark):
    from etl_marketeye_airflow_spark.operators.skew import (
        replicated_salt_join,
    )

    df = spark.createDataFrame([(1, "a")], "k long, v string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        replicated_salt_join(df, df, "k", how="full")
    with _pytest.raises(ValueError):
        replicated_salt_join(df, df, "k", n_salts=0)


def test_fd_profile_hand_computed(spark):
    """k->v holds on key 'a' (1 variant), breaks on 'b' (2 variants),
    all-NULL group 'c' conforms (0 variants); composite lhs holds.
    conformance = 1e6*(3-1)//3 = 666666."""
    from etl_marketeye_airflow_spark.operators.profile import fd_profile

    df = spark.createDataFrame(
        [
            ("a", 1, 10),
            ("a", 1, 11),
            ("b", 2, 20),
            ("b", 3, 21),
            ("c", None, 30),
        ],
        "k string, v int, w int",
    )
    rows = {r.lhs: r for r in fd_profile(df, [(["k"], "v"),
                                              (["k", "w"], "v")]).collect()}
    r1 = rows["k"]
    assert (r1.rhs, r1.n_groups, r1.violating_groups,
            r1.max_rhs_variants, r1.conformance_ppm) == ("v", 3, 1, 2, 666666)
    r2 = rows["k,w"]
    assert (r2.n_groups, r2.violating_groups, r2.conformance_ppm) == (
        5, 0, 1000000
    )


def test_fd_profile_guards(spark):
    from etl_marketeye_airflow_spark.operators.profile import fd_profile
    import pytest as _pytest

    df = spark.createDataFrame([(1, 2)], "a int, b int")
    with _pytest.raises(ValueError):
        fd_profile(df, [])
    with _pytest.raises(ValueError):
        fd_profile(df, [(["a", "b"], "b")])


def _flog2_fx_py(n):
    b = n.bit_length() - 1
    return b * 1048576 + ((n - (1 << b)) * 1048576) // (1 << b)


def test_psi_drift_identical_snapshots_zero(spark):
    """Same multiset on both sides -> x == y in every bucket -> every
    term_fx is exactly 0."""
    from etl_marketeye_airflow_spark.operators.profile import psi_drift

    df = spark.createDataFrame([(i % 4,) for i in range(40)], "bucket int")
    rows = psi_drift(df, df, "bucket").collect()
    assert len(rows) == 4
    assert all(int(r.term_fx) == 0 and r.term == 0.0 for r in rows)


def test_psi_drift_matches_python_reference_and_nonnegative(spark):
    """Skewed drift incl. a bucket absent from one side: every term
    matches the pure-python fixed-point reference and is >= 0 (flog2
    monotonicity makes sign(L) agree with sign(x - y))."""
    from etl_marketeye_airflow_spark.operators.profile import psi_drift

    a_counts = {0: 50, 1: 30, 2: 20}
    b_counts = {0: 10, 1: 30, 3: 60}
    mk = lambda cnts: spark.createDataFrame(
        [(b,) for b, n in cnts.items() for _ in range(n)], "bucket int"
    )
    got = {r.bucket: (int(r.term_fx), r.n_a, r.n_b)
           for r in psi_drift(mk(a_counts), mk(b_counts), "bucket").collect()}
    buckets = sorted(set(a_counts) | set(b_counts))
    N1 = sum(a_counts.get(k, 0) + 1 for k in buckets)
    M1 = sum(b_counts.get(k, 0) + 1 for k in buckets)
    for k in buckets:
        na1 = a_counts.get(k, 0) + 1
        mb1 = b_counts.get(k, 0) + 1
        x, y = na1 * M1, mb1 * N1
        want = (x - y) * (_flog2_fx_py(x) - _flog2_fx_py(y))
        assert got[k] == (want, a_counts.get(k, 0), b_counts.get(k, 0)), k
        assert want >= 0


def test_ind_profile_hand_computed(spark):
    """Child {1:2 rows, 2:1, 9:3, NULL:1} vs parent {1,2,5}: orphan
    value 9 (3 rows); NULLs are neither members nor orphans.
    containment = 1e6*(3-1)//3 = 666666.  A fully-contained child and
    an empty child (vacuous 1e6) round out the branches."""
    from etl_marketeye_airflow_spark.operators.profile import ind_profile

    child = spark.createDataFrame(
        [(1,), (1,), (2,), (9,), (9,), (9,), (None,)], "v int"
    )
    parent = spark.createDataFrame([(1,), (2,), (5,)], "v int")
    empty = child.filter("v > 100")
    rows = {r.ind: r for r in ind_profile(
        [
            (child, "v", parent, "v", "c<p"),
            (parent, "v", parent, "v", "p<p"),
            (empty, "v", parent, "v", "e<p"),
        ]
    ).collect()}
    r = rows["c<p"]
    assert (r.n_child_rows, r.n_child_distinct, r.n_orphan_distinct,
            r.n_orphan_rows, r.containment_ppm) == (6, 3, 1, 3, 666666)
    assert rows["p<p"].containment_ppm == 1_000_000
    e = rows["e<p"]
    assert (e.n_child_rows, e.n_child_distinct,
            e.containment_ppm) == (0, 0, 1_000_000)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        ind_profile([])


def test_k_anonymity_audit_hand_computed(spark):
    """Class (A,1): 2 rows < k -> k_anonymity; class (A,2): 5 rows all
    sensitive 'x' -> l_diversity; class (B,1): 5 rows, 2 sensitive
    values -> safe (absent); NULL quasi forms its own (small) class;
    NULL sensitive ignored by the distinct count."""
    from etl_marketeye_airflow_spark.operators.profile import (
        k_anonymity_audit,
    )

    rows = [("A", 1, "x"), ("A", 1, "y")]
    rows += [("A", 2, "x")] * 5
    rows += [("B", 1, "x"), ("B", 1, "x"), ("B", 1, "y"),
             ("B", 1, "y"), ("B", 1, "y")]
    rows += [(None, 9, "z")]
    df = spark.createDataFrame(rows, "q1 string, q2 int, s string")
    got = {(r.q1, r.q2): (r.n_rows, r.n_sensitive_distinct, r.violation)
           for r in k_anonymity_audit(df, ["q1", "q2"], "s", k=5).collect()}
    assert got == {
        ("A", 1): (2, 2, "k_anonymity"),
        ("A", 2): (5, 1, "l_diversity"),
        (None, 9): (1, 1, "k_anonymity"),
    }
    import pytest as _pytest

    with _pytest.raises(ValueError):
        k_anonymity_audit(df, [], "s")


def test_snapshot_diff_hand_computed(spark):
    """I/D/U classification with null-safe compares: value->NULL and
    NULL->value are updates naming the column; unchanged keys
    (including NULL-valued ones) emit nothing; multi-column changes
    list both names in compare order."""
    from etl_marketeye_airflow_spark.operators.profile import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b"), (3, None, "c"), (4, 40, None),
         (5, 50, "e")],
        "k int, x int, y string",
    )
    new = spark.createDataFrame(
        [(1, 10, "a"), (2, 21, "B"), (3, 30, "c"), (4, 40, None),
         (6, 60, "f")],
        "k int, x int, y string",
    )
    got = {r.k: (r.status, list(r.changed_cols))
           for r in snapshot_diff(old, new, ["k"], ["x", "y"]).collect()}
    assert got == {
        2: ("U", ["x", "y"]),
        3: ("U", ["x"]),
        5: ("D", []),
        6: ("I", []),
    }
    import pytest as _pytest

    with _pytest.raises(ValueError):
        snapshot_diff(old, new, [], ["x"])


def test_benford_audit_hand_computed(spark):
    """A perfectly Benford-ish tiny frame: digits derived from the
    decimal rendering; zero/negative/NULL excluded; obs/exp/dev ppm
    replayed by hand; a uniform-digit frame shows large deviations."""
    from etl_marketeye_airflow_spark.operators.profile import (
        BENFORD_PPM,
        benford_audit,
    )

    vals = [1, 19, 150, 2, 25, 3, 0, -7, None]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r.digit: (r.n, r.obs_ppm, r.exp_ppm, r.dev_ppm)
           for r in benford_audit(df, "v").collect()}
    # positive values: 1,19,150 (digit 1), 2,25 (digit 2), 3 (digit 3)
    assert got[1] == (3, 500000, 301029, 198971)
    assert got[2] == (2, 333333, 176091, 157242)
    assert got[3] == (1, 166666, 124938, 41728)
    assert sum(n for n, *_ in got.values()) == 6
    assert [BENFORD_PPM[d - 1] for d in sorted(got)] == [
        got[d][2] for d in sorted(got)
    ]


def test_table_digest_properties(spark):
    """Row-order and partitioning never change the digest; one changed
    row does; NULL and the string 'NULL' digest differently (sentinel);
    empty input digests (0, 0); guard on empty cols."""
    from etl_marketeye_airflow_spark.operators.profile import table_digest

    rows = [(1, "a"), (2, "b"), (3, None)]
    df = spark.createDataFrame(rows, "k long, s string")
    base = table_digest(df, ["k", "s"]).collect()[0]
    shuffled = table_digest(
        spark.createDataFrame(rows[::-1], "k long, s string").repartition(7),
        ["k", "s"],
    ).collect()[0]
    assert (base.n_rows, base.digest) == (shuffled.n_rows, shuffled.digest)
    changed = table_digest(
        spark.createDataFrame([(1, "a"), (2, "B"), (3, None)],
                              "k long, s string"),
        ["k", "s"],
    ).collect()[0]
    assert changed.digest != base.digest
    lit_null = table_digest(
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "NULL")],
                              "k long, s string"),
        ["k", "s"],
    ).collect()[0]
    assert lit_null.digest != base.digest
    empty = table_digest(df.filter("k > 99"), ["k", "s"]).collect()[0]
    assert (empty.n_rows, int(empty.digest)) == (0, 0)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        table_digest(df, [])


def test_key_skew_report_hand_computed(spark):
    """Uniform keys give gini 0; a one-key-owns-all-but-K-1 frame
    approaches (K-1)/K; the Gini replays a python reference on a mixed
    frame, and count-tie order cannot change the sum."""
    from etl_marketeye_airflow_spark.operators.skew import key_skew_report

    def gini_ref(counts):
        xs = sorted(counts)
        K, S = len(xs), sum(xs)
        six = sum(i * x for i, x in enumerate(xs, 1))
        return 2 * six - (K + 1) * S, K * S

    uniform = spark.createDataFrame(
        [(k,) for k in range(4) for _ in range(5)], "k long"
    )
    r = key_skew_report(uniform, "k").collect()[0]
    assert (r.n_keys, r.n_rows, r.max_cnt, int(r.gini_num)) == (4, 20, 5, 0)
    assert r.gini == 0.0

    skewed_counts = [1, 1, 1, 97]
    skewed = spark.createDataFrame(
        [(k,) for k, c in enumerate(skewed_counts) for _ in range(c)],
        "k long",
    )
    r2 = key_skew_report(skewed, "k").collect()[0]
    num, den = gini_ref(skewed_counts)
    assert (int(r2.gini_num), int(r2.gini_den)) == (num, den)
    assert r2.top1_share_ppm == 970000
    assert r2.gini == num / den > 0.7


def test_entropy_report_known_distributions(spark):
    """Uniform 2^k keys hit exactly k bits (flog2 exact at powers of
    two); a single key gives 0; a 2:1:1 mix matches the python
    fixed-point replay within the documented 0.086-bit flog2 bound."""
    import math

    from etl_marketeye_airflow_spark.operators.profile import entropy_report

    uniform = spark.createDataFrame(
        [(k,) for k in range(8) for _ in range(4)], "k long"
    )
    r = entropy_report(uniform, "k").collect()[0]
    assert (r.n_keys, r.n_rows) == (8, 32)
    assert r.entropy_bits == 3.0  # powers of two: flog2 exact

    single = spark.createDataFrame([(1,)] * 10, "k long")
    r1 = entropy_report(single, "k").collect()[0]
    assert int(r1.h_fx) == 0 and r1.entropy_bits == 0.0

    mix = spark.createDataFrame(
        [(1,)] * 2 + [(2,)] + [(3,)], "k long"
    )
    r2 = entropy_report(mix, "k").collect()[0]
    true_h = -(0.5 * math.log2(0.5) + 2 * 0.25 * math.log2(0.25))
    assert abs(r2.entropy_bits - true_h) <= 0.086
