"""Dataset-assembly sampling operators for training-data pipelines.

A 100 TB corpus is never trained on verbatim: it is SPLIT (train/val/
test), DOWNSAMPLED per domain, FILTERED to a quality band, and PACKED
into length buckets.  Each of these is a one-pass DataFrame op whose
randomness is a deterministic content hash — reproducible across runs,
machines, and engines (the DuckDB oracles recompute the same md5-derived
values), and crucially ORDER-FREE: no global sort, no RNG state, no
driver-side sampling step.

Scale notes per op:
- hash_split: pure map — bucket = md5(key) mod 100.  Zero shuffle; the
  split column can partition a write (partitionBy("split")).
- stratified_cap: one window per group (hash-ordered row_number).  The
  shuffle is by group key; skewed groups cost what their size is, and
  the cap bounds the OUTPUT, letting AQE coalesce the tail.  For
  pathological single-key skew, pre-aggregate with the salted two-phase
  pattern in skew.py.
- quantile_band: two-pass — exact percentile agg (one scalar row),
  broadcast back as a filter.  At scale swap percentile for
  approx_percentile and the band bounds stay a broadcast scalar.
- length_buckets: one hash-agg on the bucket id + a cumulative window
  over the (tiny) bucket table — the window runs on n_buckets rows, not
  corpus rows.

Reference scope: the MarketEye reference has no sampling stage (its
corpus is one day of scraped offers, dags/marketeye_etl_dag.py ingest
tasks); these extend the engine for LLM-data-pipeline use.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import words


def hash_bucket(key: Column, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets): first 8 md5 hex chars of
    the key's string form, parsed as an integer, mod n_buckets.

    md5 (not xxhash64) so any engine can recompute it — the oracle
    parses the same hex in SQL.  32 bits of hash for a 2-digit bucket:
    bias from the modulo is < 2^-25, immaterial for split purposes.
    """
    h32 = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")
    return h32 % n_buckets


def hash_split(
    df: DataFrame,
    key_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Assign train/val/test by content-hash bucket — the standard
    deterministic split: membership depends only on the key, so reruns,
    backfills, and incremental appends never migrate a row across
    splits."""
    bucket = hash_bucket(F.col(key_col))
    return df.withColumn("bucket", bucket).withColumn(
        "split",
        F.when(F.col("bucket") < train_pct, "train")
        .when(F.col("bucket") < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def stratified_cap(
    df: DataFrame,
    group_col: str,
    key_col: str,
    cap: int,
) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen by deterministic hash
    order (md5 of the key, key as tiebreak) — downsampling over-
    represented domains without an RNG."""
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= cap)
    )


def temperature_mix(
    df: DataFrame,
    group_col: str,
    key_col: str,
    weight_col: str,
    alpha: float = 0.5,
    scale: float = 2.0,
) -> DataFrame:
    """Temperature-weighted source mixing — the multi-source sampling
    step of LLM dataset assembly: low-resource sources are UP-weighted
    relative to their raw share by flattening the source-size
    distribution with exponent ``alpha`` (alpha=1 keeps natural
    proportions; alpha→0 approaches uniform-over-sources).

    Each row of group s is accepted iff its 40-bit md5 coin falls under
    ``min(1, scale · W_s^alpha / n_s)`` where W_s = total weight (e.g.
    token/char mass) and n_s = rows of the group — i.e. expected picks
    per source ∝ W_s^alpha, capped at keeping everything.

    Determinism (convention #1): no cross-group float accumulation
    anywhere — W_s and n_s are exact integers; the per-group rate is a
    FIXED IEEE op sequence (sqrt — correctly rounded by the standard —
    one multiply, one divide), and the acceptance test compares integer
    ``coin < floor(rate · 2^40)``.  alpha=0.5 (the common choice) uses
    sqrt; other alphas go through pow(), which is NOT guaranteed
    correctly rounded and may flip last-ulp rows across engines — pin
    only sqrt-alpha configurations with an oracle.

    Scale shape: one hash-agg over group_col (map-side combined), the
    tiny per-group factor table broadcast back, then a pure map filter.
    Zero windows, zero sorts.
    """
    if alpha == 0.5:
        flat = F.sqrt(F.col("_w").cast("double"))
    else:
        flat = F.pow(F.col("_w").cast("double"), F.lit(float(alpha)))
    factors = (
        df.groupBy(group_col)
        .agg(F.sum(weight_col).alias("_w"), F.count(F.lit(1)).alias("_n"))
        .select(
            group_col,
            F.floor(
                F.least(
                    F.lit(1.0), F.lit(float(scale)) * flat / F.col("_n").cast("double")
                )
                * F.lit(float(1 << 40))
            ).alias("_thresh"),
        )
    )
    coin = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 10), 16, 10
    ).cast("long")
    return (
        df.join(F.broadcast(factors), group_col)
        .withColumn("_coin", coin)
        .filter(F.col("_coin") < F.col("_thresh"))
        .drop("_thresh", "_coin")
    )


def quantile_band(
    df: DataFrame,
    metric_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Keep rows whose metric lies within the corpus [lo, hi] quantile
    band — the outlier trim every quality pipeline runs (too-short and
    too-long documents out).  Exact percentiles over integers are
    engine-identical; the two bound scalars broadcast to the filter."""
    bounds = df.agg(
        F.percentile(metric_col, F.lit(lo)).alias("_lo"),
        F.percentile(metric_col, F.lit(hi)).alias("_hi"),
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .filter(
            (F.col(metric_col) >= F.col("_lo")) & (F.col(metric_col) <= F.col("_hi"))
        )
        .drop("_lo", "_hi")
    )


def length_buckets(
    df: DataFrame,
    metric_col: str,
    bucket_width: int = 64,
) -> DataFrame:
    """Sequence-length bucketing plan: group rows into fixed-width
    length buckets and report per-bucket count/volume plus the running
    cumulative volume in bucket order — the packing table a trainer uses
    to budget tokens per batch shape.

    Rows with a NULL length metric are excluded (conv 22): an
    unmeasured doc can't be packed, and a NULL bucket row would sort
    NULLS FIRST in Spark's cum-window vs NULLS LAST in an oracle's."""
    df = df.filter(F.col(metric_col).isNotNull())
    bucketed = df.withColumn(
        "bucket", F.expr(f"{metric_col} div {bucket_width}").cast("long")
    )
    agg = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(metric_col).alias("bucket_volume"),
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return agg.withColumn("cum_volume", F.sum("bucket_volume").over(w))


def shard_assign(
    df: DataFrame,
    key_col: str,
    n_shards: int = 32,
    seed: str = "shuffle-v1",
) -> DataFrame:
    """Deterministic training-order shuffle: every row gets a (shard,
    position) from a seeded content hash — the standard web-scale
    recipe (shard by hash, order within shard by hash) that yields a
    reproducible pseudo-random global order WITHOUT a global sort.
    Changing ``seed`` reshuffles; re-running never does.

    Scale shape: shard assignment is a pure map; the row_number window
    partitions by shard, so each sort is 1/n_shards of the data and
    shards sort in parallel — no corpus-global window anywhere.  At
    100 TB pick n_shards ≈ target file count and this is exactly a
    repartition(n)+sortWithinPartitions write plan.
    """
    k = F.md5(F.concat(F.lit(seed + ":"), F.col(key_col).cast("string")))
    h = F.conv(F.substring(k, 1, 15), 16, 10).cast("long")  # 60 bits
    w = Window.partitionBy("shard").orderBy("sort_key", key_col)
    return (
        df.withColumn("sort_key", k)
        .withColumn("shard", h % n_shards)
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("sort_key")
    )


def sequence_packing(
    docs: DataFrame,
    text_col: str = "text",
    window: int = 256,
    n_shards: int = 8,
    seed: str = "shuffle-v1",
) -> DataFrame:
    """GPT-style concat-and-split sequence packing: documents are laid
    end-to-end in the deterministic shard-shuffle order (shard_assign)
    and the concatenated token stream is cut every ``window`` tokens.
    Emits the pack MANIFEST — one row per (document × pack it touches):

        (shard, pack_id, doc_id, pos, slice_start, slice_len)

    where slice_start/slice_len select the doc's tokens that land in
    that pack.  A doc longer than ``window`` spans several packs; a
    pack usually holds several docs — exactly the layout an LM trainer
    consumes (sum of slice_len per full pack = window).

    Fully integer-deterministic: the order is the seeded-md5 shuffle,
    offsets are per-shard prefix sums, and the pack split is div/mod
    algebra — any engine reproduces it bit-for-bit.

    Scale shape: ONE window per shard (running sum over the shard's
    docs, 1/n_shards of the data each, all shards in parallel — no
    corpus-global window); the per-pack explode is a map-side
    ``sequence()`` bounded by ⌈doc_len/window⌉+1 rows per doc.  At
    100 TB: n_shards ≈ output file count; a ``partitionBy(shard)``
    write makes each pack file a contiguous slice of one shard.
    """
    sized = shard_assign(docs, "doc_id", n_shards, seed).withColumn(
        "_n",
        F.size(F.filter(words(F.col(text_col)), lambda t: t != "")).cast(
            "long"
        ),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = (
        sized.filter(F.col("_n") > 0)
        .withColumn("_start", F.coalesce(F.sum("_n").over(w), F.lit(0)).cast("long"))
        .withColumn("_p0", F.expr(f"_start div {window}"))
        .withColumn("_p1", F.expr(f"(_start + _n - 1) div {window}"))
    )
    return (
        placed.select(
            "shard",
            "doc_id",
            "pos",
            "_n",
            "_start",
            F.explode(F.sequence(F.col("_p0"), F.col("_p1"))).alias("pack_id"),
        )
        .withColumn(
            "slice_start",
            F.greatest(F.lit(0).cast("long"), F.col("pack_id") * window - F.col("_start")),
        )
        .withColumn(
            "slice_len",
            F.least(
                (F.col("pack_id") + 1) * window, F.col("_start") + F.col("_n")
            )
            - F.greatest(F.col("pack_id") * window, F.col("_start")),
        )
        .select("shard", "pack_id", "doc_id", "pos", "slice_start", "slice_len")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int = 100,
    key_col: str = "doc_id",
    seed: str = "wsample-v1",
    group_col: str | None = None,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, Efraimidis–Spirakis
    A-ES (public: Inf. Proc. Letters 97(5), 2006): each row draws a
    deterministic uniform u from a seeded content hash and is ranked by
    u^(1/w) — taking the top ``k`` yields a weight-proportional sample,
    exactly one distributed top-k, no sequential pass.

    Integer-exact ranking (convention 6d): maximizing u^(1/w) ⟺
    maximizing ln(u)/w ⟺ MINIMIZING (40·2^20 − flog2_fx(u_40bit)) ·
    2^20 div w — all operands positive (a negative division would hit
    the Spark-truncates vs DuckDB-floors divergence), all integers
    (40-bit draws keep flog2_fx inside its exact-below-2^42 domain),
    so the selected set is bit-identical on any engine.  Ties break on
    the key column.

    Scale shape: the sample key is a pure map; top-k compiles to
    TakeOrderedAndProject (per-partition top-k + driver merge — never a
    global sort).  Changing ``seed`` redraws; re-running never does.

    ``group_col``: k-per-GROUP sampling instead (balanced per-stratum
    draws — the corpus-mixing shape); the cut becomes a rank window
    partitioned by the group, sorting each group's rows once — the
    standard top-k-per-group shape (q15/heavy_hitters), never global.
    """
    from .corpus import FLOG2_SCALE, with_flog2_fx

    # 40-bit uniform draw (10 md5 hex chars): flog2_fx is integer-exact
    # only below 2^42, and 40 bits of key resolution is far beyond what
    # sampling needs
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed + ":"), F.col(key_col).cast("string"))),
            1,
            10,
        ),
        16,
        10,
    ).cast("long") + F.lit(1)  # [1, 2^40] — flog2 needs >= 1
    base = (
        df.withColumn("_u", u)
        .withColumn("_w", F.col(weight_col).cast("long"))
        .filter(F.col("_w") > 0)
    )
    base = with_flog2_fx(base, "_u", "_flu")
    keyed = base.withColumn(
        "skey",
        F.expr(f"((40 * {FLOG2_SCALE} - _flu) * {FLOG2_SCALE}) div _w"),
    )
    if group_col is not None:
        from pyspark.sql.window import Window

        w = Window.partitionBy(group_col).orderBy(
            F.asc("skey"), F.asc(key_col)
        )
        return (
            keyed.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .select(
                group_col, key_col, F.col("_w").alias("weight"), "skey"
            )
        )
    return (
        keyed.select(key_col, F.col("_w").alias("weight"), "skey")
        .orderBy(F.asc("skey"), F.asc(key_col))
        .limit(k)
    )


# Poisson(1) CDF at 40-bit fixed point: T[k] = floor(P(X<=k)·2^40),
# k = 0..7 (tail clamped at weight 8 — P(X>8) ≈ 1.1e-7, the documented
# truncation).  INTEGER LITERALS shared verbatim with the oracle SQL,
# so the weights are cross-engine exact by construction.
POISSON1_T_FX40 = [
    404487723187,
    808975446375,
    1011219307969,
    1078633928500,
    1095487583633,
    1098858314660,
    1099420103164,
    1099500358665,
]


def bootstrap_replicates(
    df: DataFrame,
    id_col: str,
    value_col: str,
    n_replicates: int = 32,
    group_cols: list[str] | None = None,
    salt: str = "boot-v1",
) -> DataFrame:
    """Online Poisson bootstrap (Owen & Eckles 2012; Chamandy et al.,
    Google 2012): every row gets, for each replicate r, a DETERMINISTIC
    Poisson(1) weight from its 40-bit md5 coin — the one-pass way to
    put uncertainty bars on any aggregate at 100 TB, where resampling
    passes are unaffordable.  The spread of the replicate estimates IS
    the sampling distribution of the statistic.

    Weight = #{k : coin ≥ T_k} over the POISSON1_T_FX40 thresholds —
    pure integer comparisons against shared literals (the q115/q138
    md5-coin discipline), so every replicate is bit-identical on any
    engine, machine, or partitioning.  ``value_col`` must be integer
    cents (conv 1); sums stay exact BIGINT.

    Returns one row per (group…, rep): (group…, rep, n_eff = Σw,
    sum_w_value = Σ w·value) plus the display mean — the caller takes
    std over replicates for the error bar.

    Scale shape: the explode is n_replicates× the row count but feeds
    straight into a map-side-combined groupBy — shuffle volume is
    |groups|·n_replicates rows, NOT the exploded stream; no windows,
    no second pass.
    """
    if n_replicates < 1:
        raise ValueError("n_replicates must be >= 1")
    gcols = list(group_cols or [])
    rep = F.explode(
        F.sequence(F.lit(0), F.lit(n_replicates - 1))
    ).alias("rep")
    base = df.select(
        *gcols,
        F.col(id_col).cast("string").alias("_id"),
        F.col(value_col).cast("long").alias("_v"),
    ).select("*", rep)
    coin = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(salt + ":"),
                    F.col("_id"),
                    F.lit(":"),
                    F.col("rep").cast("string"),
                )
            ),
            1,
            10,
        ),
        16,
        10,
    ).cast("long")
    w = None
    for t in POISSON1_T_FX40:
        term = (coin >= F.lit(t)).cast("long")
        w = term if w is None else w + term
    staged = base.withColumn("_w", w)
    out = staged.groupBy(*gcols, "rep").agg(
        F.sum("_w").cast("long").alias("n_eff"),
        F.sum(F.col("_w") * F.col("_v")).cast("long").alias("sum_w_value"),
    )
    return out.select(
        *gcols,
        F.col("rep").cast("long").alias("rep"),
        "n_eff",
        "sum_w_value",
        F.when(
            F.col("n_eff") > 0,
            F.col("sum_w_value").cast("double")
            / F.col("n_eff").cast("double"),
        ).alias("mean_value"),
    )


def proportional_allocation(
    df: DataFrame, stratum_col: str, total_k: int
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of a global sample
    budget across strata: k_i proportional to stratum size, EXACT
    integers, Σk_i = total_k always — the allocation step quota
    sampling needs before any per-stratum draw (q52 caps per stratum
    independently; this divides ONE global budget).

    base_i = (K·n_i) div N; the L = K − Σ base_i leftover seats go to
    the largest remainders r_i = K·n_i − base_i·N (ties to the smaller
    stratum key — fully deterministic).  All BIGINT (K·n_i bounded by
    budget·rows; document at call site).

    Returns (stratum, n, k).  Scale shape: one count agg, a 1-row
    total broadcast, one rank window over the STRATA frame.
    """
    if total_k < 0:
        raise ValueError("total_k must be >= 0")
    cnts = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = cnts.agg(F.sum("n").cast("long").alias("n_tot"))
    staged = (
        cnts.crossJoin(F.broadcast(tot))
        .withColumn("base", F.expr(f"({total_k} * n) div n_tot").cast("long"))
        .withColumn(
            "rem", (F.lit(total_k) * F.col("n") - F.col("base") * F.col("n_tot")).cast("long")
        )
    )
    leftover = staged.agg(
        (F.lit(total_k) - F.sum("base")).cast("long").alias("L")
    )
    w = Window.orderBy(F.col("rem").desc(), F.col("stratum").asc())
    ranked = staged.crossJoin(F.broadcast(leftover)).withColumn(
        "_r", F.row_number().over(w).cast("long")
    )
    return ranked.select(
        "stratum",
        "n",
        (
            F.col("base")
            + F.when(F.col("_r") <= F.col("L"), F.lit(1)).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("k"),
    )


def rendezvous_assign(
    df: DataFrame, key_col: str, n_shards: int, seed: str = "hrw-v1"
) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment — the
    consistent-hashing alternative to ``shard_assign``'s mod-N: when
    the shard count changes N → N+1, only ~1/(N+1) of keys move
    (mod-N moves nearly all of them) — the property that makes
    rebalancing a 100 TB keyed store affordable (pytest-pinned).

    shard(key) = argmax over s of the md5 coin of f"{seed}:{key}:{s}"
    (60-bit integer).  Coins within one key are distinct md5 outputs;
    a 60-bit collision would make the argmax engine-arbitrary, but at
    P ≈ n_shards²·2⁻⁶¹ per key it does not occur at any realistic
    cardinality (and the gate's fixed corpus is verified tie-free by
    the pytest).  Deterministic: the oracle replays the same argmax.

    Scale shape: pure map — explode keys × n_shards, max_by per key
    with map-side combine; no window, no shuffle beyond the per-key
    combine.  n_shards is config-bounded.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    s = F.explode(F.sequence(F.lit(0), F.lit(n_shards - 1))).alias("s")
    base = df.select(F.col(key_col).cast("string").alias("k")).select(
        "k", s
    )
    coin = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(seed + ":"),
                    F.col("k"),
                    F.lit(":"),
                    F.col("s").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    packed = base.withColumn("_c", coin)
    return packed.groupBy("k").agg(
        F.max_by(F.col("s"), F.col("_c")).cast("long").alias("shard")
    )
