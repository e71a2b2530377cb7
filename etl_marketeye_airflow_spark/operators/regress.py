"""Grouped closed-form linear modeling — per-group OLS trend fit and
Pearson correlation from exact-integer sufficient statistics.

Reference scope: the reference's analytics stop at per-group mean/std
(`dags/marketeye_etl_dag.py` group market stats feeding the anomaly
detector); this module extends the same "sufficient statistics per
group" shape one order up, to first-order model fitting — the per-key
trend / correlation features a large-scale pipeline derives everywhere
(user spend drift, feature drift monitors, per-segment price/quantity
coupling).

Determinism contract (CLAUDE.md conv 1/11): callers pass INTEGER-valued
long columns (quantize upstream: epoch days, cents, floor'd units — use
``floor()`` on both engines, never a bare double→int cast, which rounds
on DuckDB but truncates on Spark).  All sufficient statistics are then
exact: n/Sx/Sy as BIGINT (bounded by rows·value, documented per call
site), the second-order Sxx/Sxy/Syy as decimal(38,0) sums of
decimal(19,0)-operand products (products exact under Spark's decimal
rules, sums order-free).  The normal-equation numerators/denominators
are decimal(38,0) combinations of those sums — (19,0)×(38,0) stays
(38,0) and is exact while the VALUE fits 38 digits, which holds with
huge headroom at the 100 TB posture (n ≈ 1e5 rows/key, |x| ≤ 2e4 days,
|y| ≤ 5e7 cents → n·Sxy ≈ 1e22 ≪ 1e38).  The ONLY doubles are final
per-row casts and one division (or a sqrt·sqrt product of identical
operands) — both engines see the identical IEEE op sequence, so the
doubles are bit-identical too (JVM and libm sqrt are both correctly
rounded per IEEE 754).

Scale shape: ONE map-side-combined groupBy over the fact table, then
pure per-row expressions on the (small) group frame.  No windows, no
second pass over the data; the decimal sums are order-free, so partial
aggregates merge exactly (the incremental-maintenance property q116
proves for first moments extends to these second moments unchanged).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

D19 = "decimal(19,0)"
D38 = "decimal(38,0)"


def _d19(c: Column) -> Column:
    return c.cast(D19)


def _suffstats(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    min_n: int,
    with_syy: bool,
) -> DataFrame:
    """Exact per-group sufficient statistics (n, sx, sy, sxx, sxy[,
    syy]) for integer-valued long columns ``x_col``/``y_col``."""
    x, y = F.col(x_col), F.col(y_col)
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).cast("long").alias("sx"),
        F.sum(y).cast("long").alias("sy"),
        F.sum((_d19(x) * _d19(x)).cast(D38)).cast(D38).alias("sxx"),
        F.sum((_d19(x) * _d19(y)).cast(D38)).cast(D38).alias("sxy"),
    ]
    if with_syy:
        aggs.append(F.sum((_d19(y) * _d19(y)).cast(D38)).cast(D38).alias("syy"))
    return (
        df.groupBy(*group_cols).agg(*aggs).filter(F.col("n") >= F.lit(min_n))
    )


def grouped_ols(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    min_n: int = 3,
) -> DataFrame:
    """Per-group ordinary-least-squares line fit y ≈ slope·x + intercept.

    Returns one row per group with ≥ ``min_n`` points:
    (group…, n, slope_num, slope_den, slope, intercept) where
    slope_num = n·Sxy − Sx·Sy and slope_den = n·Sxx − Sx² are the EXACT
    decimal(38,0) normal-equation terms (the oracle-checked payload;
    slope = slope_num/slope_den), and slope/intercept are display
    doubles from one division of identical operands.  Groups with zero
    x-variance (slope_den = 0 — every point at the same x) yield NULL
    slope/intercept but keep their exact row.
    """
    a = _suffstats(df, group_cols, x_col, y_col, min_n, with_syy=False)
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy = F.col("sxx"), F.col("sxy")
    slope_num = (_d19(n) * sxy - _d19(sx) * _d19(sy)).cast(D38)
    slope_den = (_d19(n) * sxx - _d19(sx) * _d19(sx)).cast(D38)
    icept_num = (_d19(sy) * sxx - _d19(sx) * sxy).cast(D38)
    staged = a.withColumn("slope_num", slope_num).withColumn(
        "slope_den", slope_den
    ).withColumn("_icept_num", icept_num)
    nz = F.col("slope_den") != F.lit(0).cast(D38)
    return staged.select(
        *group_cols,
        "n",
        "slope_num",
        "slope_den",
        F.when(
            nz,
            F.col("slope_num").cast("double")
            / F.col("slope_den").cast("double"),
        ).alias("slope"),
        F.when(
            nz,
            F.col("_icept_num").cast("double")
            / F.col("slope_den").cast("double"),
        ).alias("intercept"),
    )


def grouped_pearson(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    min_n: int = 2,
) -> DataFrame:
    """Per-group Pearson correlation of two integer-valued columns.

    Returns (group…, n, corr_num, var_x_n, var_y_n, corr): corr_num =
    n·Sxy − Sx·Sy, var_x_n = n·Sxx − Sx², var_y_n = n·Syy − Sy² — exact
    decimal(38,0) — and corr = corr_num / (√var_x_n · √var_y_n) as the
    one display double (NULL when either variance term is 0: a constant
    column has no defined correlation).  Bit-stable cross-engine: sqrt
    is correctly rounded on both JVMs and libm, and the operand order
    is fixed (sqrt(x)·sqrt(y), then divide).
    """
    a = _suffstats(df, group_cols, x_col, y_col, min_n, with_syy=True)
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    staged = (
        a.withColumn("corr_num", (_d19(n) * sxy - _d19(sx) * _d19(sy)).cast(D38))
        .withColumn("var_x_n", (_d19(n) * sxx - _d19(sx) * _d19(sx)).cast(D38))
        .withColumn("var_y_n", (_d19(n) * syy - _d19(sy) * _d19(sy)).cast(D38))
    )
    pos = (F.col("var_x_n") > F.lit(0).cast(D38)) & (
        F.col("var_y_n") > F.lit(0).cast(D38)
    )
    corr = F.col("corr_num").cast("double") / (
        F.sqrt(F.col("var_x_n").cast("double"))
        * F.sqrt(F.col("var_y_n").cast("double"))
    )
    return staged.select(
        *group_cols,
        "n",
        "corr_num",
        "var_x_n",
        "var_y_n",
        F.when(pos, corr).alias("corr"),
    )


def mann_whitney_u(
    df: DataFrame,
    group_cols: list[str],
    side_col: str,
    value_col: str,
    min_each: int = 3,
) -> DataFrame:
    """Grouped Mann-Whitney U — the nonparametric two-sample test (does
    segment A's distribution sit above segment B's?) that A/B review
    reaches for when means are outlier-hostage (q143's motivation,
    test-shaped).  ``side_col`` must be boolean (true = side A);
    ``value_col`` an integer long (cents).

    Exact DOUBLED-midrank algebra (ties get the average rank — a .5 —
    so every statistic is carried ×2 and stays BIGINT, the q143
    doubled-median trick): per (group, value) tie-block the ranks
    occupy [lo, hi] ⇒ midrank2 = lo + hi; rank_sum2_A = Σ cnt_A·
    midrank2; U2_A = rank_sum2_A − n_A·(n_A+1).  The common-language
    effect size U/(n_A·n_B) is the truncating ppm
    (500000·U2) div (n_A·n_B) plus one display double.  U2 ∈
    [0, 2·n_A·n_B] exactly on both engines.

    Scale shape: one (group, value) map-side-combined count agg, ONE
    per-group sort window over the collapsed tie-block frame (distinct
    values, not rows), and a per-group final agg — never a window over
    raw rows.
    """
    g = [F.col(c) for c in group_cols]
    blocks = df.groupBy(*group_cols, F.col(value_col).alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum(
            F.when(F.col(side_col), F.lit(1)).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("cnt_a"),
    )
    w = (
        Window.partitionBy(*g)
        .orderBy(F.col("v").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = blocks.withColumn(
        "_hi", F.sum("cnt").over(w).cast("long")
    ).withColumn("_lo", (F.col("_hi") - F.col("cnt") + 1).cast("long"))
    agg = ranked.groupBy(*group_cols).agg(
        F.sum("cnt_a").cast("long").alias("n_a"),
        (F.sum("cnt") - F.sum("cnt_a")).cast("long").alias("n_b"),
        F.sum(F.col("cnt_a") * (F.col("_lo") + F.col("_hi")))
        .cast("long")
        .alias("_r2a"),
    )
    u2a = (F.col("_r2a") - F.col("n_a") * (F.col("n_a") + 1)).cast("long")
    out = (
        agg.filter(
            (F.col("n_a") >= F.lit(min_each))
            & (F.col("n_b") >= F.lit(min_each))
        )
        .withColumn("u2_a", u2a)
        .withColumn(
            "cles_ppm",
            F.expr("(500000 * u2_a) div (n_a * n_b)").cast("long"),
        )
    )
    return out.select(
        *group_cols,
        "n_a",
        "n_b",
        "u2_a",
        "cles_ppm",
        (
            F.col("u2_a").cast("double")
            / (F.lit(2.0) * F.col("n_a").cast("double")
               * F.col("n_b").cast("double"))
        ).alias("cles"),
    )


def kolmogorov_smirnov(
    df: DataFrame,
    group_cols: list[str],
    side_col: str,
    value_col: str,
    min_each: int = 3,
) -> DataFrame:
    """Grouped two-sample Kolmogorov–Smirnov statistic: the maximum
    ECDF gap D = max_v |F_A(v) − F_B(v)| — Mann-Whitney's complement
    (U detects location shift; D detects ANY distribution difference:
    variance, shape, bimodality).  Same input contract as
    ``mann_whitney_u``.

    Exact rational algebra: with cumulative counts cA(v), cB(v) over
    the ordered distinct values, D = max |cA·n_B − cB·n_A| / (n_A·n_B)
    — the numerator max is an exact BIGINT over tie blocks (ECDFs only
    jump at data points, so scanning distinct values is lossless), and
    only ONE display division per group happens at the end.  ks_ppm =
    10^6·num div (n_A·n_B), truncating.

    Scale shape: (group, value) map-side count agg, one per-group
    cumulative window over DISTINCT values, one per-group max — the
    q169 cost model exactly.
    """
    g = [F.col(c) for c in group_cols]
    blocks = df.groupBy(*group_cols, F.col(value_col).alias("v")).agg(
        F.sum(
            F.when(F.col(side_col), F.lit(1)).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("ca"),
        F.sum(
            F.when(F.col(side_col), F.lit(0)).otherwise(F.lit(1))
        )
        .cast("long")
        .alias("cb"),
    )
    w = (
        Window.partitionBy(*g)
        .orderBy(F.col("v").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(*g)
    staged = (
        blocks.withColumn("cum_a", F.sum("ca").over(w).cast("long"))
        .withColumn("cum_b", F.sum("cb").over(w).cast("long"))
        .withColumn("n_a", F.sum("ca").over(wall).cast("long"))
        .withColumn("n_b", F.sum("cb").over(wall).cast("long"))
        .withColumn(
            "_gap",
            F.abs(
                F.col("cum_a") * F.col("n_b")
                - F.col("cum_b") * F.col("n_a")
            ).cast("long"),
        )
    )
    out = (
        staged.groupBy(*group_cols)
        .agg(
            F.max("n_a").cast("long").alias("n_a"),
            F.max("n_b").cast("long").alias("n_b"),
            F.max("_gap").cast("long").alias("ks_num"),
        )
        .filter(
            (F.col("n_a") >= F.lit(min_each))
            & (F.col("n_b") >= F.lit(min_each))
        )
    )
    return out.select(
        *group_cols,
        "n_a",
        "n_b",
        "ks_num",
        F.expr("(1000000 * ks_num) div (n_a * n_b)")
        .cast("long")
        .alias("ks_ppm"),
        (
            F.col("ks_num").cast("double")
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
        ).alias("ks_d"),
    )


def grouped_covariance(
    df: DataFrame,
    group_cols: list[str],
    value_cols: list[str],
    min_n: int = 2,
) -> DataFrame:
    """Per-group covariance/correlation MATRIX over k integer-valued
    long columns in ONE aggregation pass — the multi-feature drift
    monitor (which feature pairs decoupled after the new drop?) that
    generalizes ``grouped_pearson`` from one pair to all k·(k+1)/2.

    Same determinism contract as ``grouped_ols``: integer inputs,
    BIGINT first moments, decimal(38,0) second-moment sums of
    decimal(19,0) products, and per-pair exact terms

        cov_num(a,b) = n·S_ab − S_a·S_b          (n·cov, decimal exact)
        var_n(a)     = n·S_aa − S_a²

    with ONE display double per pair, corr = cov_num/(√var_a·√var_b)
    — the q141 operand order, bit-identical cross-engine (oracles
    convert the >2^53 decimals via VARCHAR, conv 16).  Diagonal pairs
    (a,a) are included (cov_num = var_n, corr ≈ 1 up to one rounding —
    same value on both engines).

    Output: one row per (group, var_a ≤ var_b) pair with columns
    (group…, var_a, var_b, n, cov_num, var_a_n, var_b_n, corr);
    var names order lexicographically within a pair.

    Scale shape: ONE map-side-combined groupBy computing all k first
    moments + k·(k+1)/2 product sums, then a per-row inline explode of
    the (small) group frame into pair rows — no joins, no windows, no
    second pass over the data.
    """
    if len(value_cols) < 2:
        raise ValueError("need at least two value columns")
    cols = sorted(value_cols)
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for c in cols:
        aggs.append(F.sum(F.col(c)).cast("long").alias(f"_s_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i:]:
            aggs.append(
                F.sum((_d19(F.col(a)) * _d19(F.col(b))).cast(D38))
                .cast(D38)
                .alias(f"_p_{a}_{b}")
            )
    g = df.groupBy(*group_cols).agg(*aggs).filter(
        F.col("n") >= F.lit(min_n)
    )
    n = F.col("n")
    pair_structs = []
    for i, a in enumerate(cols):
        for b in cols[i:]:
            cov_num = (
                _d19(n) * F.col(f"_p_{a}_{b}") - _d19(F.col(f"_s_{a}")) * _d19(F.col(f"_s_{b}"))
            ).cast(D38)
            pair_structs.append(
                F.struct(
                    F.lit(a).alias("var_a"),
                    F.lit(b).alias("var_b"),
                    cov_num.alias("cov_num"),
                )
            )
    staged = g.withColumn("_pairs", F.array(*pair_structs))
    # variance terms stay addressable per group row for the corr join-
    # free lookup: map var name -> var_n
    var_map = F.create_map(
        *[
            x
            for c in cols
            for x in (
                F.lit(c),
                (
                    _d19(n) * F.col(f"_p_{c}_{c}")
                    - _d19(F.col(f"_s_{c}")) * _d19(F.col(f"_s_{c}"))
                ).cast(D38),
            )
        ]
    )
    staged = staged.withColumn("_vars", var_map).select(
        *group_cols, "n", F.explode("_pairs").alias("_p"), "_vars"
    )
    va = F.col("_vars")[F.col("_p.var_a")]
    vb = F.col("_vars")[F.col("_p.var_b")]
    pos = (va > F.lit(0).cast(D38)) & (vb > F.lit(0).cast(D38))
    corr = F.col("_p.cov_num").cast("double") / (
        F.sqrt(va.cast("double")) * F.sqrt(vb.cast("double"))
    )
    return staged.select(
        *group_cols,
        F.col("_p.var_a").alias("var_a"),
        F.col("_p.var_b").alias("var_b"),
        "n",
        F.col("_p.cov_num").alias("cov_num"),
        va.alias("var_a_n"),
        vb.alias("var_b_n"),
        F.when(pos, corr).alias("corr"),
    )
