"""Dataset profiling: per-column quality stats in ONE pass.

A training-data pipeline's first question about a new 100 TB drop:
null rates, cardinalities, ranges.  One aggregate computes every
column's profile simultaneously (a per-column loop of count queries
would scan N× — the anti-pattern).  Exact counts for correctness-gate
parity; approx_count_distinct offered for the at-scale variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, columns: list[str] | None = None, approx: bool = False) -> DataFrame:
    """One row per profiled column: rows, nulls, distincts, min/max as strings.

    ``approx=True`` swaps exact distinct counts for HLL sketches
    (approx_count_distinct) — the 100 TB mode, where exact distinct on
    every column is a shuffle per column.

    FLOAT/DOUBLE columns render min/max as ``fx20:<floor(v·2^20)>`` —
    the conv-14 dyadic fixed point.  A plain double→string cast is NOT
    engine-stable (Spark/Java switches to scientific notation at 1e7,
    DuckDB later — the r8 fuzz magnitude probe), and decimal-rounding
    renderings hit the conv-6d tie divergence on short-expansion
    doubles (1/128 ties at 6 dp).  floor(v·2^20) is exact on every
    engine and preserves ordering.
    """
    cols = columns or df.columns
    distinct = F.approx_count_distinct if approx else F.countDistinct
    dtypes = dict(df.dtypes)

    def _render(c: F.Column, dt: str) -> F.Column:
        if dt in ("float", "double"):
            return F.concat(
                F.lit("fx20:"),
                F.floor(c.cast("double") * F.lit(1048576.0))
                .cast("long")
                .cast("string"),
            )
        return c.cast("string")

    # internal positional aliases: arbitrary column names (spaces, quotes)
    # must not reach selectExpr; min/max aggregate on the NATIVE type and
    # cast after — casting first would make numeric ranges lexicographic
    # ('10' < '2').
    aggs = []
    for i, c in enumerate(cols):
        col = F.col(c)
        dt = dtypes.get(c, "")
        aggs.extend(
            [
                F.count(F.lit(1)).alias(f"_p{i}_rows"),
                F.count(col).alias(f"_p{i}_non_null"),
                distinct(col).alias(f"_p{i}_distinct"),
                _render(F.min(col), dt).alias(f"_p{i}_min"),
                _render(F.max(col), dt).alias(f"_p{i}_max"),
            ]
        )
    wide = df.agg(*aggs)
    stacked = wide.selectExpr(
        f"stack({len(cols)}, "
        + ", ".join(
            f"'{c.replace(chr(39), chr(39) * 2)}', _p{i}_rows, _p{i}_non_null, "
            f"_p{i}_distinct, _p{i}_min, _p{i}_max"
            for i, c in enumerate(cols)
        )
        + ") AS (column_name, n_rows, n_non_null, n_distinct, min_value, max_value)"
    )
    return stacked.withColumn(
        "null_fraction",
        (F.col("n_rows") - F.col("n_non_null")).cast("double") / F.col("n_rows").cast("double"),
    )


def approx_numeric_quantiles(
    df: DataFrame,
    columns: list[str],
    probabilities: list[float] = (0.25, 0.5, 0.75, 0.95),
    accuracy: int = 10000,
) -> DataFrame:
    """APPROXIMATE quantile profile — one row per column, one pass total
    (SURVEY §2.4 engine extension; sketch-gated by error-bound pytest,
    never oracle-backed).

    ``percentile_approx`` (Greenwald-Khanna variant sketch) has rank
    error ≤ 1/accuracy: each returned value is a REAL data value whose
    rank is within n/accuracy of the requested quantile — the honest
    contract at 100 TB, where an exact per-column percentile is a full
    sort per column.  All columns aggregate in ONE job (a per-column
    loop would scan N×, the profile_columns anti-pattern)."""
    probs = [float(p) for p in probabilities]
    parr = F.array(*[F.lit(p) for p in probs])
    aggs = [
        F.percentile_approx(c, probs, accuracy).alias(f"_q{i}")
        for i, c in enumerate(columns)
    ]
    wide = df.agg(*aggs)
    stacked = wide.selectExpr(
        f"stack({len(columns)}, "
        + ", ".join(
            f"'{c.replace(chr(39), chr(39) * 2)}', _q{i}" for i, c in enumerate(columns)
        )
        + ") AS (column_name, quantiles)"
    )
    return stacked.select(
        "column_name", parr.alias("probabilities"), "quantiles"
    )


def scd2_merge(
    current: DataFrame,
    incoming: DataFrame,
    key_col: str,
    compare_cols: list[str],
    batch_ts: str,
) -> DataFrame:
    """SCD-type-2 history merge without Delta (guide: 'emulate with
    anti-join + union'): close changed/absent rows, append new versions.

    ``current`` schema: key + compare cols + (valid_from string,
    valid_to string-null).  Returns the full new history (caller
    overwrites the history table — the reference's last-write-wins model).
    """
    # Multiple incoming versions of one key would fan the active row out
    # and leave several simultaneously-open history rows — fail fast like
    # a real MERGE does on multiple source matches (one small eager job).
    dup = (
        incoming.groupBy(key_col).count().filter(F.col("count") > 1).limit(1).collect()
    )
    if dup:
        raise ValueError(
            f"scd2_merge: incoming has multiple rows for key "
            f"{dup[0][0]!r} — dedup the batch to one version per key first"
        )

    active = current.filter(F.col("valid_to").isNull())
    closed = current.filter(F.col("valid_to").isNotNull())

    # Incoming columns are prefix-renamed up front: the output's fresh
    # rows share lineage with `incoming`, so merging that output against
    # the same incoming frame again (the daily-batch shape) would
    # otherwise hit Spark's ambiguous-self-join resolution.
    inc = incoming.select(
        F.col(key_col).alias("_inc_key"),
        *[F.col(c).alias(f"_inc_{c}") for c in compare_cols],
    )

    # a row closes when any compare col differs or the key disappeared
    diff = F.col("_inc_key").isNull()
    for c in compare_cols:
        diff = diff | ~F.col(c).eqNullSafe(F.col(f"_inc_{c}"))
    changed_or_gone = (
        active.join(inc, active[key_col] == F.col("_inc_key"), "left")
        .filter(diff)
        .select(*[active[c] for c in active.columns])
    )
    now_closed = changed_or_gone.withColumn("valid_to", F.lit(batch_ts))

    unchanged = active.join(
        now_closed.select(F.col(key_col).alias("_ck")),
        active[key_col] == F.col("_ck"),
        "left_anti",
    )

    fresh = (
        inc.join(
            unchanged.select(F.col(key_col).alias("_uk")),
            F.col("_inc_key") == F.col("_uk"),
            "left_anti",
        )
        .select(
            F.col("_inc_key").alias(key_col),
            *[F.col(f"_inc_{c}").alias(c) for c in compare_cols],
        )
        .withColumn("valid_from", F.lit(batch_ts))
        .withColumn("valid_to", F.lit(None).cast("string"))
        .select(*[F.col(c) for c in [key_col, *compare_cols, "valid_from", "valid_to"]])
    )
    return closed.unionByName(now_closed).unionByName(unchanged).unionByName(fresh)


def fd_profile(
    df: DataFrame, candidates: list[tuple[list[str], str]]
) -> DataFrame:
    """Functional-dependency conformance profiling: for each candidate
    rule lhs → rhs, how close the data comes to "every lhs group has
    exactly one rhs value" — the schema-rule miner behind key
    discovery, denormalization checks, and drift alarms on a fresh
    data drop (a rule that held at 999993 ppm yesterday and 870000
    today is an ingestion bug, found without a single hand-written
    constraint).

    Returns ONE row per candidate: (lhs, rhs, n_groups,
    violating_groups, max_rhs_variants, conformance_ppm) where
    conformance_ppm = 10^6·(n_groups − violating) div n_groups — a
    truncating-integer ratio (CLAUDE.md conv 1), 10^6 iff the FD holds
    exactly.  NULL rhs values are ignored by the distinct count (both
    engines' COUNT(DISTINCT) semantics); all-NULL groups count as
    conforming (0 variants ≤ 1).

    Scale shape: one map-side-combined groupBy per candidate over the
    fact table, each reduced to a 1-row summary before the union —
    k candidates = k scans of the SAME cached/columnar source with
    full column pruning (each scan reads only lhs+rhs), never a
    cross-candidate shuffle.  Candidate count is config-bounded, not
    data-bounded.
    """
    if not candidates:
        raise ValueError("need at least one candidate FD")
    parts = []
    for lhs, rhs in candidates:
        if rhs in lhs:
            raise ValueError(f"rhs {rhs!r} may not appear in lhs {lhs!r}")
        per_group = df.groupBy(*[F.col(c) for c in lhs]).agg(
            F.countDistinct(F.col(rhs)).cast("long").alias("_variants")
        )
        summary = per_group.agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum(
                F.when(F.col("_variants") > 1, F.lit(1)).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("violating_groups"),
            F.max("_variants").cast("long").alias("max_rhs_variants"),
        )
        parts.append(
            summary.select(
                F.lit(",".join(lhs)).alias("lhs"),
                F.lit(rhs).alias("rhs"),
                "n_groups",
                "violating_groups",
                "max_rhs_variants",
                F.expr(
                    "(1000000 * (n_groups - violating_groups)) div n_groups"
                )
                .cast("long")
                .alias("conformance_ppm"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def psi_drift(
    df_a: DataFrame, df_b: DataFrame, bucket_col: str
) -> DataFrame:
    """Population Stability Index between two snapshots of the same
    feature, pre-bucketed: per bucket i, term_i = (p_i − q_i)·
    log2(p_i/q_i) ≥ 0, and Σ term_i is the PSI drift score every
    production ML monitor alarms on (rule of thumb: > 0.2 bits ⇒
    investigate the drop).

    Determinism doctrine (CLAUDE.md conv 6d): log2 is the fixed-point
    dyadic form (corpus.with_flog2_fx — integer-only, bit-identical on
    both engines), never libm.  With add-one smoothing n' = n+1 over
    the UNION of observed buckets (zero-count buckets stay defined),
    totals N' = Σn', M' = Σm':

        x = n'·M',  y = m'·N'           (p/q = x/y)
        L_fx = flog2_fx(x) − flog2_fx(y)
        term_fx = (x − y)·L_fx          -- decimal(38,0), exact
        term = term_fx / (N'·M'·2^20)   -- one display division

    flog2_fx is monotone nondecreasing, so sign(L_fx) agrees with
    sign(x − y) and every term_fx ≥ 0 like the true PSI.  Exactness
    bound (documented, pytest-pinned): x, y < 2^42 — i.e. snapshot
    row-counts up to ~2 M per side; past that, pre-aggregate counts at
    a coarser unit upstream (the statistic is scale-free in p, q).

    Returns one row per bucket: (bucket, n_a, n_b, term_fx, term);
    Σ term over rows is the PSI (do the sum on the exact term_fx side
    when bit-stability matters).

    Scale shape: each snapshot collapses to per-bucket counts with
    map-side combine (shuffle = bucket cardinality, not rows); the
    full-outer join and the 1-row totals broadcast are bucket-sized.
    """
    from .corpus import with_flog2_fx

    a = df_a.groupBy(F.col(bucket_col).alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_a")
    )
    b = df_b.groupBy(F.col(bucket_col).alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_b")
    )
    j = (
        a.join(b, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("n_a", F.lit(0)).cast("long").alias("n_a"),
            F.coalesce("n_b", F.lit(0)).cast("long").alias("n_b"),
        )
        .withColumn("na1", (F.col("n_a") + 1).cast("long"))
        .withColumn("mb1", (F.col("n_b") + 1).cast("long"))
    )
    totals = j.agg(
        F.sum("na1").cast("long").alias("N1"),
        F.sum("mb1").cast("long").alias("M1"),
    )
    staged = (
        j.crossJoin(F.broadcast(totals))
        .withColumn("x", (F.col("na1") * F.col("M1")).cast("long"))
        .withColumn("y", (F.col("mb1") * F.col("N1")).cast("long"))
    )
    staged = with_flog2_fx(staged, "x", "fx_x")
    staged = with_flog2_fx(staged, "y", "fx_y")
    staged = staged.withColumn(
        "L_fx", (F.col("fx_x") - F.col("fx_y")).cast("long")
    ).withColumn(
        "term_fx",
        (
            (F.col("x").cast("decimal(19,0)") - F.col("y").cast("decimal(19,0)"))
            * F.col("L_fx").cast("decimal(19,0)")
        ).cast("decimal(38,0)"),
    )
    return staged.select(
        "bucket",
        "n_a",
        "n_b",
        "term_fx",
        (
            F.col("term_fx").cast("double")
            / (
                F.col("N1").cast("double")
                * F.col("M1").cast("double")
                * F.lit(1048576.0)
            )
        ).alias("term"),
    )


def ind_profile(
    pairs: list[tuple[DataFrame, str, DataFrame, str, str]],
) -> DataFrame:
    """Inclusion-dependency (foreign-key) conformance: for each
    candidate rule child.col ⊆ parent.col, how much of the child's
    value set actually resolves — fd_profile's cross-table sibling and
    the other half of schema-rule mining (orphan detection, broken
    ingestion joins, referential drift on a fresh drop).

    ``pairs``: (child_df, child_col, parent_df, parent_col, label).
    Returns ONE row per candidate: (ind, n_child_rows, n_child_distinct,
    n_orphan_distinct, n_orphan_rows, containment_ppm) where orphans
    are DISTINCT non-null child values absent from the parent and
    containment_ppm = 10^6·(distinct − orphan_distinct) div distinct
    (10^6 iff the IND holds; NULL child values are neither orphans nor
    members, matching SQL FK semantics).

    Scale shape per candidate: child collapses to (value, count) with
    map-side combine (shuffle = child's DISTINCT cardinality, not
    rows); parent side is a DISTINCT projection feeding a left join on
    the value whose null-side marks orphans, so the total AND orphan
    summaries come from ONE 1-row aggregate over one pass (r12: the
    r11 shape evaluated the child groupBy subtree twice — once for the
    totals, once under the anti-join — doubling the child scan and its
    shuffle per candidate).  Both join inputs arrive hash-partitioned
    on the value by their own aggregates, so the join itself adds no
    exchange.  Never a row-level child ⋈ parent join.
    """
    if not pairs:
        raise ValueError("need at least one candidate IND")
    parts = []
    for child, ccol, parent, pcol, label in pairs:
        cvals = (
            child.select(F.col(ccol).alias("v"))
            .filter(F.col("v").isNotNull())
            .groupBy("v")
            .agg(F.count(F.lit(1)).cast("long").alias("_rows"))
        )
        pvals = (
            parent.select(F.col(pcol).alias("v"))
            .filter(F.col("v").isNotNull())
            .distinct()
            .withColumn("_hit", F.lit(1))
        )
        orphan = F.col("_hit").isNull()
        summary = cvals.join(pvals, "v", "left").agg(
            F.coalesce(F.sum("_rows"), F.lit(0))
            .cast("long")
            .alias("n_child_rows"),
            F.count(F.lit(1)).cast("long").alias("n_child_distinct"),
            F.coalesce(
                F.sum(F.when(orphan, F.lit(1)).otherwise(F.lit(0))), F.lit(0)
            )
            .cast("long")
            .alias("n_orphan_distinct"),
            F.coalesce(
                F.sum(F.when(orphan, F.col("_rows")).otherwise(F.lit(0))),
                F.lit(0),
            )
            .cast("long")
            .alias("n_orphan_rows"),
        )
        parts.append(
            summary.select(
                F.lit(label).alias("ind"),
                "n_child_rows",
                "n_child_distinct",
                "n_orphan_distinct",
                "n_orphan_rows",
                # empty child: vacuously contained (and Spark div 0 is
                # NULL while DuckDB // 0 errors — don't reach either)
                F.when(
                    F.col("n_child_distinct") > 0,
                    F.expr(
                        "(1000000 * (n_child_distinct - n_orphan_distinct))"
                        " div n_child_distinct"
                    ),
                )
                .otherwise(F.lit(1_000_000))
                .cast("long")
                .alias("containment_ppm"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
) -> DataFrame:
    """Privacy audit before a data release (the check a training-data
    pipeline runs before shipping user-derived tables): every
    quasi-identifier combination occurring fewer than ``k`` times is a
    re-identification risk (k-anonymity, Sweeney 2002), and groups
    whose sensitive attribute is (near-)constant leak it even at size
    ≥ k (l-diversity, Machanavajjhala et al. 2007 — reported here as the
    distinct-sensitive count).

    Returns the VIOLATING equivalence classes only: (quasi…, n_rows,
    n_sensitive_distinct, violation) where violation ∈
    {'k_anonymity', 'l_diversity'} — k-violations are classes with
    n_rows < k; l-violations are classes with n_rows ≥ k but exactly
    one sensitive value.  NULL quasi values form their own class
    (groupBy semantics, identical both engines); NULL sensitive values
    are ignored by the distinct count.

    Scale shape: ONE map-side-combined groupBy over (quasi…); output
    is violations only, so the result is small wherever the data is
    actually safe.
    """
    if not quasi_cols:
        raise ValueError("need at least one quasi-identifier column")
    g = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct(F.col(sensitive_col))
        .cast("long")
        .alias("n_sensitive_distinct"),
    )
    return g.withColumn(
        "violation",
        F.when(F.col("n_rows") < F.lit(k), F.lit("k_anonymity")).when(
            F.col("n_sensitive_distinct") == 1, F.lit("l_diversity")
        ),
    ).filter(F.col("violation").isNotNull())


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Row-level diff between two snapshots of the same table: one row
    per CHANGED key with status I (inserted), D (deleted), or U
    (updated — any compare column differs null-safely) plus the list
    of changed columns — the change-data review a pipeline runs
    between daily drops (what did the upstream actually change?),
    and the batch complement of the CDC family (q96/q117 apply
    changelogs; this RECOVERS one from two states).

    Unchanged keys produce no row, so output is change-sized.
    ``changed_cols`` is ordered by the caller's compare_cols order —
    deterministic; empty for I/D.

    Scale shape: ONE full-outer hash join on the key, per-row
    expressions after; no windows, no second pass.
    """
    if not key_cols:
        raise ValueError("need at least one key column")
    o = old.select(
        *[F.col(c).alias(f"_o_{c}") for c in key_cols + compare_cols]
    )
    n = new.select(
        *[F.col(c).alias(f"_n_{c}") for c in key_cols + compare_cols]
    )
    cond = None
    for c in key_cols:
        t = F.col(f"_o_{c}") == F.col(f"_n_{c}")
        cond = t if cond is None else cond & t
    j = o.join(n, cond, "full_outer")
    in_old = F.col(f"_o_{key_cols[0]}").isNotNull()
    in_new = F.col(f"_n_{key_cols[0]}").isNotNull()
    changed = [
        F.when(
            ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")), F.lit(c)
        )
        for c in compare_cols
    ]
    changed_cols = F.filter(
        F.array(*changed), lambda x: x.isNotNull()
    )
    status = (
        F.when(~in_old, F.lit("I"))
        .when(~in_new, F.lit("D"))
        .when(F.size(changed_cols) > 0, F.lit("U"))
    )
    keys = [
        F.coalesce(F.col(f"_n_{c}"), F.col(f"_o_{c}")).alias(c)
        for c in key_cols
    ]
    return (
        j.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(
            *keys,
            "status",
            F.when(F.col("status") == "U", changed_cols)
            .otherwise(F.array().cast("array<string>"))
            .alias("changed_cols"),
        )
    )


# Benford first-digit probabilities log10(1+1/d), floor-ppm — INTEGER
# LITERALS shared verbatim with the oracle SQL (the POISSON1_T_FX40
# pattern), so conformance deviations are cross-engine exact.
BENFORD_PPM = [
    301029, 176091, 124938, 96910, 79181, 66946, 57991, 51152, 45757,
]


def benford_audit(df: DataFrame, value_col: str) -> DataFrame:
    """Benford's-law conformance of a positive integer measure — the
    classic fabricated-numbers / broken-feed tripwire (organic
    multi-scale quantities follow P(d)=log10(1+1/d); injected or
    truncated data doesn't): per leading digit, the observed count,
    observed ppm, expected ppm (shared integer literals), and
    |observed − expected| ppm.

    Pure integer algebra: digit = first char of the decimal rendering
    (identical on both engines for BIGINT), obs_ppm = 10^6·n div N.
    Zero/negative/NULL values are excluded (Benford is defined on
    positive magnitudes).

    Scale shape: one map-side-combined 9-group aggregate + a 1-row
    total broadcast.
    """
    v = F.col(value_col)
    digits = (
        df.filter(v > 0)
        .select(F.substring(v.cast("string"), 1, 1).cast("int").alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = digits.agg(F.sum("n").cast("long").alias("n_total"))
    exp_map = F.create_map(
        *[
            x
            for d, ppm in enumerate(BENFORD_PPM, 1)
            for x in (F.lit(d), F.lit(ppm))
        ]
    )
    return (
        digits.crossJoin(F.broadcast(tot))
        .withColumn("obs_ppm", F.expr("(1000000 * n) div n_total").cast("long"))
        .withColumn("exp_ppm", exp_map[F.col("digit")].cast("long"))
        .withColumn(
            "dev_ppm", F.abs(F.col("obs_ppm") - F.col("exp_ppm")).cast("long")
        )
        .select("digit", "n", "obs_ppm", "exp_ppm", "dev_ppm")
    )


def table_digest(df: DataFrame, cols: list[str]) -> DataFrame:
    """Order-insensitive content fingerprint of a table projection —
    the cheap did-two-pipelines-produce-the-same-table check (engine
    migrations, IVM-vs-recompute audits, replica reconciliation):
    every row hashes to a 60-bit md5 integer over its canonical
    rendering, and the EXACT decimal(38,0) sum of row hashes (+ the
    row count) is the digest — multiset-equal tables digest equal on
    ANY engine, partitioning, or row order; a single changed row
    moves it.

    Contract: ``cols`` must be integer or string columns (float
    decimal renderings differ across engines — quantize first, conv
    1); NULL renders as an explicit sentinel; fields join on the
    non-printing unit separator chr(31) (documented collision caveat:
    values containing chr(31) could alias — use data without control
    characters, the normal case).

    Scale shape: a pure map + ONE all-column-pruned aggregate; no
    shuffle beyond the 1-row combine.
    """
    if not cols:
        raise ValueError("need at least one column")
    sep = F.lit(chr(31))
    parts = []
    for i, c in enumerate(cols):
        if i:
            parts.append(sep)
        parts.append(F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL")))
    row_hash = F.conv(
        F.substring(F.md5(F.concat(*parts)), 1, 15), 16, 10
    ).cast("long")
    return df.select(row_hash.alias("_h")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.coalesce(
            F.sum(F.col("_h").cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        )
        .cast("decimal(38,0)")
        .alias("digest"),
    )


def entropy_report(df: DataFrame, key_col: str) -> DataFrame:
    """Shannon entropy of a key's distribution — the information-
    theoretic twin of the Gini skew report (skew.key_skew_report):
    H = Σ (n_i/N)·log2(N/n_i) bits, the load-balance / diversity /
    cardinality-quality number (uniform K keys → log2 K; one hot key
    → 0).

    Determinism (conv 6d): log2 is the fixed-point dyadic form —
    h_fx = Σ n_i·(flog2_fx(N) − flog2_fx(n_i)) is an EXACT integer
    (decimal(38,0) sum per conv 11; each term ≤ 0.086 bits from true
    log2, the documented flog2 bound), and entropy_bits =
    h_fx / (N·2^20) is the one display division of identical operands.

    Returns ONE row: (n_keys, n_rows, h_fx, entropy_bits).

    Scale shape: one map-side key-count agg + a 1-row total broadcast
    + per-key expressions; no window at all.
    """
    from .corpus import with_flog2_fx

    cnts = df.groupBy(F.col(key_col).alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    cnts = with_flog2_fx(cnts, "cnt", "f_cnt")
    tot = with_flog2_fx(
        cnts.agg(F.sum("cnt").cast("long").alias("n_rows")),
        "n_rows",
        "f_n",
    )
    staged = cnts.crossJoin(F.broadcast(tot)).withColumn(
        "_term",
        (
            F.col("cnt").cast("decimal(19,0)")
            * (F.col("f_n") - F.col("f_cnt")).cast("decimal(19,0)")
        ).cast("decimal(38,0)"),
    )
    return staged.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("n_rows").cast("long").alias("n_rows"),
        F.sum("_term").cast("decimal(38,0)").alias("h_fx"),
    ).select(
        "n_keys",
        "n_rows",
        "h_fx",
        (
            F.col("h_fx").cast("double")
            / (F.col("n_rows").cast("double") * F.lit(1048576.0))
        ).alias("entropy_bits"),
    )
