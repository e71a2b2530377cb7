"""q191-q205: assembly, splits, cross-source contamination

Registry band module (r11 split of the 12.6k-line queries.py).  Shared
helpers, the @query decorator, and the oracle-parity conventions live in
``_registry_base`` (same package level, so function sources — and hence
sweep digests — are byte-identical to the pre-split file).  Importing
this module registers its queries into the shared QUERIES/ORACLES dicts.
"""

from __future__ import annotations

from . import _registry_base as _B

# bind every base helper (incl. underscore names) into this module's
# globals so the verbatim-moved query sources resolve unchanged
globals().update({k: v for k, v in vars(_B).items() if not k.startswith("__")})

@query(
    "q191_grouped_covariance_matrix",
    # identical exact algebra to q140/q141 generalized to all pairs;
    # one display double per pair with the q141 operand order and
    # conv-16 VARCHAR casts (cov_num ~ n·S_ab reaches ~1e21 here);
    # exact payload columns ship as digit strings (conv 19)
    oracle=_sql_str_out(_q191_oracle(), ("cov_num", "var_a_n", "var_b_n")),
)
def q191_grouped_covariance_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-returnflag covariance/correlation MATRIX of (quantity,
    price-cents, discount-basis-points) — the multi-feature drift
    monitor (which feature pairs decoupled after the new data drop?)
    extending q140/q141's exact-suffstat discipline from one pair to
    all k·(k+1)/2 in ONE aggregation pass (operators/regress.py:
    grouped_covariance).

    Scale shape: one map-side-combined groupBy computing all first
    moments and product sums; pair rows come from a per-row inline
    array explode of the (tiny) group frame — no joins, no windows,
    no second pass."""
    from .operators.regress import grouped_covariance

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.floor(F.col("l_quantity")).cast("long").alias("qty"),
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.floor(F.col("l_discount") * 10000).cast("long").alias("disc_bp"),
    )
    return _str_decimals(
        grouped_covariance(
            li, ["l_returnflag"], ["qty", "cents", "disc_bp"], min_n=2
        )
    )


@query(
    "q192_twap",
    # identical lead window over the per-user (ts_us, event_id) total
    # order; segment products exact as decimal(19,0)·(19,0) → (38,0)
    # sums (cents·µs ~ 1e18 wraps int64 — conv 11); display double via
    # conv-16 VARCHAR on the >2^53 numerator; twap_num ships as digit
    # string (conv 19)
    oracle=_sql_str_out("""
    WITH c AS (
      SELECT user_id, epoch_us(ts) AS ts_us, event_id,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    s AS (
      SELECT user_id, cents, ts_us,
             lead(ts_us) OVER (PARTITION BY user_id
                               ORDER BY ts_us, event_id) AS nxt
      FROM c
    ),
    a AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_points,
             CAST(max(ts_us) - min(ts_us) AS BIGINT) AS span_us,
             CAST(sum(CASE WHEN nxt IS NOT NULL
                           THEN CAST(cents AS DECIMAL(19,0))
                                * CAST(nxt - ts_us AS DECIMAL(19,0))
                      END) AS DECIMAL(38,0)) AS twap_num
      FROM s GROUP BY user_id HAVING count(*) >= 2
    )
    SELECT user_id, n_points, span_us, twap_num,
           CASE WHEN span_us > 0
                THEN CAST(CAST(twap_num AS VARCHAR) AS DOUBLE)
                     / CAST(span_us AS DOUBLE) / 100.0
           END AS twap
    FROM a
    """, ("twap_num",)),
)
def q192_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user TIME-weighted average purchase value (TWAP): the
    last-observation step function integrated over the observation
    span — the standard financial/sensor average that row-means get
    wrong when observations cluster (q139's EMA weighs by COUNT
    recency; this weighs by HOLDING TIME).  Σ cents·Δt is exact
    decimal (cents·µs wraps int64 — conv 11); one display division
    chain per user, identical operand order both engines.

    Scale shape: one per-key lead window (key-partitioned, never
    global), one map-side-combined groupBy; span and n come from the
    same agg."""
    from .sources.tables import load_events

    ev = load_events(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    c = ev.select(
        "user_id",
        "ts_us",
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_us").asc(), F.col("event_id").asc()
    )
    s = c.withColumn("nxt", F.lead("ts_us").over(w))
    seg = F.when(
        F.col("nxt").isNotNull(),
        F.col("cents").cast("decimal(19,0)")
        * (F.col("nxt") - F.col("ts_us")).cast("decimal(19,0)"),
    )
    a = (
        s.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            (F.max("ts_us") - F.min("ts_us")).cast("long").alias("span_us"),
            F.sum(seg).cast("decimal(38,0)").alias("twap_num"),
        )
        .filter(F.col("n_points") >= 2)
    )
    return _str_decimals(
        a.select(
            "user_id",
            "n_points",
            "span_us",
            "twap_num",
            F.when(
                F.col("span_us") > 0,
                F.col("twap_num").cast("double")
                / F.col("span_us").cast("double")
                / F.lit(100.0),
            ).alias("twap"),
        )
    )


@query(
    "q193_funnel_conversion",
    # identical first-reach rule per step: first 'view', first 'click'
    # STRICTLY after it, first 'purchase' strictly after that — exact
    # integer µs mins, truncating-ppm conversion rates
    oracle="""
    WITH v AS (
      SELECT user_id, min(epoch_us(ts)) AS t1
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
                         AND epoch_us(e.ts) > v.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
                         AND epoch_us(e.ts) > c.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS n_click,
           CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchase,
           CAST((1000000 * (SELECT count(*) FROM c))
                // (SELECT count(*) FROM v) AS BIGINT) AS click_ppm,
           CAST((1000000 * (SELECT count(*) FROM p))
                // (SELECT count(*) FROM c) AS BIGINT) AS purchase_ppm
    """,
)
def q193_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion (view → click → purchase): a user
    reaches step k at the FIRST event of that type strictly after
    their step-(k−1) reach time — the product-analytics primitive
    q172's free trigrams and q160's attribution don't express (the
    funnel requires the specific ordered subsequence, not adjacency).
    Exact integer µs everywhere; rates as truncating ppm.

    Scale shape: one filtered map-side min-agg per step + one key
    equi-join per transition (each frame is user-cardinality-sized);
    no windows, 1-row output."""
    from .sources.tables import load_events

    ev = load_events(spark, sf_dir).select("user_id", "ts_us", "event_type")

    def first_after(step: str, prev: DataFrame, tcol: str, out: str):
        j = ev.filter(F.col("event_type") == step).join(
            prev, "user_id"
        ).filter(F.col("ts_us") > F.col(tcol))
        return j.groupBy("user_id").agg(
            F.min("ts_us").cast("long").alias(out)
        )

    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").cast("long").alias("t1"))
    )
    c = first_after("click", v, "t1", "t2")
    p = first_after("purchase", c, "t2", "t3")
    counts = (
        v.agg(F.count(F.lit(1)).cast("long").alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).cast("long").alias("n_click")))
        .crossJoin(
            p.agg(F.count(F.lit(1)).cast("long").alias("n_purchase"))
        )
    )
    return counts.select(
        "n_view",
        "n_click",
        "n_purchase",
        F.expr("(1000000 * n_click) div n_view")
        .cast("long")
        .alias("click_ppm"),
        F.expr("(1000000 * n_purchase) div n_click")
        .cast("long")
        .alias("purchase_ppm"),
    )


@query(
    "q194_edit_distance_join",
    # the oracle is the EXACT banded all-pairs answer with zero prefix
    # mechanics (q99's convention): EDJoin's count-filter theorem
    # (Xiao et al., VLDB 2008) makes the Spark side's rare-gram prefix
    # candidate generation LOSSLESS — ed(a,b) ≤ k destroys ≤ k·q
    # distinct q-grams, so |G(a)∩G(b)| ≥ max|G| − k·q and the (k·q+1)
    # rarest grams of each side must intersect; levenshtein() is the
    # same integer DP on both engines
    oracle="""
    WITH n AS (
      SELECT c_custkey AS k, c_name AS s FROM customer
      WHERE c_custkey % 37 = 0 AND length(c_name) >= 12
    )
    SELECT a.k AS id_a, b.k AS id_b,
           CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
    FROM n a JOIN n b
      ON a.k < b.k AND abs(length(a.s) - length(b.s)) <= 2
    WHERE levenshtein(a.s, b.s) <= 2
    """,
)
def q194_edit_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact edit-distance self-join (ed ≤ 2 over customer names,
    universe c_custkey % 37 = 0) — the entity-resolution primitive for
    typo'd keys, via EDJoin's lossless prefix filter rather than
    all-pairs.  The modulus bounds the universe: zero-padded
    SEQUENTIAL ids are pathologically self-similar (≈ every id has
    dozens of ≤2-digit-substitution neighbors), so the TRUE ANSWER
    grows ~quadratically in the universe — no candidate scheme can
    beat its own output (the r7 sf1 probe timed the % 7 variant out
    at 78× for 10× data).  On natural keyspaces the output is sparse
    and the prefix filter is the whole story; on dense keyspaces,
    partition the universe (as here) or dedupe exact first:

    1. char 3-gram SETS per name (an edit destroys ≤ q distinct
       grams, so k edits destroy ≤ k·q — the count-filter theorem);
    2. each name indexes min(k·q+1, |G|) = up to 7 of its RAREST
       grams under the global (frequency, gram) order.  Losslessness
       case split (ADVICE r7 — array_distinct can shrink |G| below
       k·q for repetitive names, so the invariant is NOT "|G| > k·q"):
       when max(|G_a|,|G_b|) > k·q the prefix principle applies with
       t = max − k·q ≥ 1 (the smaller side's slice is its FULL set,
       ≥ its required |G| − t + 1 ≥ 1 prefix); when BOTH |G| ≤ k·q
       both slices are full sets, and the join still finds the pair
       because ed ≤ k with length ≥ 12 forces a shared distinct gram:
       ≥ len−q+1 = 10 > k·q = 6 gram OCCURRENCES per name, each edit
       kills ≤ q of them, so an untouched occurrence survives into
       both strings.  Degenerate repetitive-name recall is pytest-
       pinned (test_properties: edjoin_degenerate).
    3. candidates get the lossless length band |len_a−len_b| ≤ k,
       then ONE exact levenshtein verify per candidate.

    Rare-first prefixes make the bucket join skew-resistant exactly
    like q99 (the ubiquitous 'Customer#0' grams never join).

    Scale shape: gram posting agg + frequency join (gram-keyed,
    map-side combined), per-name bounded array_sort (no global
    window), prefix self-equi-join on gram, distinct, verify join —
    the q99 cost model with character grams."""
    K, Q = 2, 3
    base = (
        _t(spark, sf_dir, "customer")
        .filter(
            (F.col("c_custkey") % 37 == 0) & (F.length("c_name") >= 12)
        )
        .select(
            F.col("c_custkey").alias("k"),
            F.col("c_name").alias("s"),
            F.length("c_name").alias("slen"),
        )
        .persist()
    )
    grams = base.select(
        "k",
        "slen",
        F.explode(
            F.array_distinct(
                F.expr(f"transform(sequence(1, length(s) - {Q - 1}),"
                       f" i -> substring(s, i, {Q}))")
            )
        ).alias("gram"),
    )
    freq = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("cnt"))
    prefix = (
        grams.join(freq, "gram")
        .groupBy("k", "slen")
        .agg(F.collect_list(F.struct("cnt", "gram")).alias("cg"))
        .select(
            "k",
            "slen",
            F.explode(
                F.expr(f"slice(array_sort(cg), 1, {K * Q + 1})")
            ).alias("_p"),
        )
        .select("k", "slen", F.col("_p.gram").alias("gram"))
    )
    cand = (
        prefix.select(
            F.col("k").alias("id_a"), F.col("slen").alias("len_a"), "gram"
        )
        .join(
            prefix.select(
                F.col("k").alias("id_b"),
                F.col("slen").alias("len_b"),
                "gram",
            ),
            "gram",
        )
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("len_a") - F.col("len_b")) <= K)
        )
        .select("id_a", "id_b")
        .distinct()
    )
    na = base.select(F.col("k").alias("_ia"), F.col("s").alias("s_a"))
    nb = base.select(F.col("k").alias("_ib"), F.col("s").alias("s_b"))
    out = (
        cand.join(na, F.col("id_a") == F.col("_ia"))
        .join(nb, F.col("id_b") == F.col("_ib"))
        .withColumn(
            "dist", F.levenshtein(F.col("s_a"), F.col("s_b")).cast("long")
        )
        .filter(F.col("dist") <= K)
        .select("id_a", "id_b", "dist")
        .localCheckpoint()
    )
    base.unpersist()
    return out


@query(
    "q195_incremental_near_dup",
    # the oracle is the EXACT new×old answer (inverted-index form,
    # conv 7) with zero prefix mechanics — the prefix-filter theorem
    # (q99) is side-agnostic, so the incremental candidate join is
    # lossless by construction at any data
    oracle=f"""
    WITH sh AS MATERIALIZED (SELECT doc_id, {_SQL_GRAMS} AS grams FROM {_SQL_DOCS_WS}),
    n AS (SELECT doc_id, len(grams) AS n FROM sh),
    post AS (SELECT doc_id, unnest(grams) AS gram FROM sh),
    inter AS (
      SELECT a.doc_id AS id_new, b.doc_id AS id_old, count(*) AS i
      FROM post a JOIN post b ON a.gram = b.gram
      WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_new, id_old,
           CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) AS jaccard
    FROM inter
    JOIN n na ON na.doc_id = id_new
    JOIN n nb ON nb.doc_id = id_old
    WHERE CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) >= 0.35
    """,
)
def q195_incremental_near_dup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """INCREMENTAL near-dup screening — the daily-drop shape q22/q99
    batch over the whole corpus: a NEW batch (simulated: doc_id % 5
    = 0) is checked against the INDEXED old corpus only (new×old
    pairs, exact 3-gram Jaccard ≥ 0.35), never old×old (already
    deduped) and not new×new (q99's job on the batch).

    Same lossless prefix filter as q99, with the incremental twist:
    gram frequencies come from the OLD corpus index (the stable
    artifact a production index ships with; grams unseen in it rank
    rarest at cnt 0).  Losslessness needs only A consistent total
    order on grams — which (cnt, gram) over any fixed corpus is — so
    recall stays 100% by construction, not by tuning.

    Scale shape: the new batch's posting/prefix frames scale with the
    BATCH, not the corpus; the candidate join hits the corpus prefix
    index on gram (rare-first prefixes keep buckets skew-free); one
    exact verify per candidate."""
    from .operators.dedup import word_shingles

    # r13: same under-split-scan guard as the q99 engine — a single-
    # row-group documents file serializes the shingle fill on one core
    # (no-op below 32 MB/partition and at any real scale)
    sh = (
        _spread_heavy_scan(_t(spark, sf_dir, "documents"), sf_dir, "documents")
        .select("doc_id", word_shingles(F.col("text"), 3).alias("grams"))
        .persist()
    )
    is_new = F.col("doc_id") % 5 == 0
    post = sh.select("doc_id", F.explode("grams").alias("gram"))
    # index-side frequencies: OLD corpus only (the shipped artifact).
    # Persisted: BOTH prefixes() branches join it, and the plan showed
    # no ReusedExchange — without the cache the vocab groupBy (and its
    # upstream explode) executes once per branch (VERDICT r7 item 7;
    # vocab-sized, tiny).
    freq = (
        post.filter(~is_new)
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist()
    )

    def prefixes(p: DataFrame) -> DataFrame:
        return (
            p.join(freq, "gram", "left")
            .withColumn("cnt", F.coalesce("cnt", F.lit(0)))
            .groupBy("doc_id")
            .agg(F.collect_list(F.struct("cnt", "gram")).alias("cg"))
            .select(
                "doc_id",
                F.expr(
                    "slice(array_sort(cg), 1, "
                    "size(cg) - ((7 * size(cg) + 19) div 20) + 1)"
                ).alias("pfx"),
            )
            .select("doc_id", F.explode("pfx.gram").alias("gram"))
        )

    pfx_new = prefixes(post.filter(is_new)).select(
        F.col("doc_id").alias("id_new"), "gram"
    )
    pfx_old = prefixes(post.filter(~is_new)).select(
        F.col("doc_id").alias("id_old"), "gram"
    )
    cand = (
        pfx_new.join(pfx_old, "gram").select("id_new", "id_old").distinct()
    )
    ga = sh.select(F.col("doc_id").alias("_in"), F.col("grams").alias("g_n"))
    gb = sh.select(F.col("doc_id").alias("_io"), F.col("grams").alias("g_o"))
    inter = F.size(F.array_intersect("g_n", "g_o"))
    union = F.size("g_n") + F.size("g_o") - inter
    out = (
        cand.join(ga, F.col("id_new") == F.col("_in"))
        .join(gb, F.col("id_old") == F.col("_io"))
        .filter(
            F.lit(20) * F.least(F.size("g_n"), F.size("g_o"))
            >= F.lit(7) * F.greatest(F.size("g_n"), F.size("g_o"))
        )
        .withColumn("jaccard", inter.cast("double") / union.cast("double"))
        .filter(F.col("jaccard") >= 0.35)
        .select("id_new", "id_old", "jaccard")
        .localCheckpoint()
    )
    sh.unpersist()
    freq.unpersist()
    return out


@query(
    "q196_join_size_from_histograms",
    # the oracle COUNTS THE ACTUAL JOIN — an independent computation of
    # the same number (the identity |A ⋈_k A| = Σ_k cnt(k)² is what the
    # query claims; the oracle materializes nothing either, count(*)
    # streams)
    oracle="""
    WITH j AS (
      SELECT 1 FROM events a JOIN events b ON a.user_id = b.user_id
    ),
    c AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(cnt) AS BIGINT) AS n_rows,
           CAST(max(cnt) AS BIGINT) AS max_cnt,
           (SELECT CAST(count(*) AS BIGINT) FROM j) AS join_rows
    FROM c
    """,
)
def q196_join_size_from_histograms(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT self-join cardinality from the key histogram — |A ⋈_k A|
    = Σ_k cnt(k)², computed from one count-agg WITHOUT executing the
    join (the q187/q176 planning family's missing number: what a
    shuffle on this key will actually produce; decides broadcast vs
    salting vs rethinking the key before burning the cluster on it).
    The oracle independently COUNTS the real join, so the gate proves
    the identity, not a replay.

    Σ cnt² as decimal(38,0) (a hot key wraps int64 at cnt ≥ ~3e9 —
    conv 11) but emitted as BIGINT here (pinned in-range: join_rows
    is itself a count the engine must represent).

    Scale shape: ONE map-side-combined count agg + a 1-row reduce —
    the join itself never runs on the Spark side."""
    from .sources.tables import load_events

    c = (
        load_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return c.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("cnt").cast("long").alias("n_rows"),
        F.max("cnt").cast("long").alias("max_cnt"),
        F.sum(
            (
                F.col("cnt").cast("decimal(19,0)")
                * F.col("cnt").cast("decimal(19,0)")
            ).cast("decimal(38,0)")
        )
        .cast("long")
        .alias("join_rows"),
    )


@query(
    "q197_rolling_active_users",
    # identical contribution-explode rule: each (user, active-day)
    # pair contributes to days d..d+6; exact DISTINCT per day; the
    # grid is restricted to observed days on both sides
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id,
             epoch_us(ts) // 86400000000 AS day
      FROM events
    ),
    days AS (SELECT DISTINCT day FROM ud),
    contrib AS (
      SELECT d.day AS day, u.user_id
      FROM ud u JOIN days d
        ON d.day BETWEEN u.day AND u.day + 6
    )
    SELECT day AS epoch_day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS wau
    FROM contrib GROUP BY day
    """,
)
def q197_rolling_active_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Rolling 7-day active users (WAU) per observed day — the
    engagement denominator every product dashboard needs, computed
    EXACTLY: sliding-window COUNT DISTINCT, which no window function
    expresses (distinct doesn't decompose over frames).  Shape: the
    (user, day) frame dedupes first (events collapse to ≤ 1 row per
    user-day), each pair then contributes to the ≤ 7 window days it
    falls in (bounded fan-out — the q174 sliding-window rule applied
    to users), and a per-day distinct agg finishes.

    Integer epoch days from µs division — no date/TZ functions on
    the value path (conv: q186).

    Scale shape: map-side (user, day) dedupe (shuffle ≤ users×days),
    a broadcast of the observed-day grid, ≤ 7× bounded explode, one
    (day, user) distinct agg — never a join of raw events against
    raw events."""
    from .sources.tables import load_events

    ud = (
        load_events(spark, sf_dir)
        .select(
            "user_id",
            F.expr("ts_us div 86400000000").cast("long").alias("day"),
        )
        .distinct()
    )
    days = ud.select("day").distinct()
    contrib = ud.join(
        F.broadcast(days.select(F.col("day").alias("grid_day"))),
        (F.col("grid_day") >= F.col("day"))
        & (F.col("grid_day") <= F.col("day") + 6),
    )
    return contrib.groupBy(F.col("grid_day").alias("epoch_day")).agg(
        F.count_distinct("user_id").cast("long").alias("wau")
    )


@query(
    "q198_weighted_sssp",
    # identical Bellman-Ford sweep algebra, exact BIGINT mins; round-
    # exact semantics (min path weight over ≤ R edges) so extra or
    # missing convergence never matters
    oracle=_sql_sssp(3),
)
def q198_weighted_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source WEIGHTED shortest paths over the co-purchase graph
    (edge cost 1 + (u+v) % 7 — a deterministic stand-in for a real
    friction weight; seeds ≡ 0 mod 50), 3 Bellman-Ford sweeps — the
    weighted complement of q151's hop-count BFS, completing the graph
    family's traversal corner with COSTS (cheapest substitution route,
    least-friction influence).

    Scale shape: per round one edge⋈distance join + a map-side-
    combined min groupBy, localCheckpoint'd — the q151 cost model
    with a weight column."""
    from .operators.graph import sssp_rounds

    e = _copurchase_edges(spark, sf_dir).withColumn(
        "w", (1 + (F.col("u") + F.col("v")) % 7).cast("long")
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
    )
    sources = nodes.filter(F.col("node") % 50 == 0)
    return sssp_rounds(
        e, sources, rounds=3, src_col="u", dst_col="v", weight_col="w"
    )


@query(
    "q199_conversion_latency_quartiles",
    # identical first-reach chain as q193, then exact LOWER order
    # statistics on the latency multiset: smallest value whose scaled
    # cumulative count reaches the rank target (4·cum ≥ n / 2·cum ≥ n
    # / 4·cum ≥ 3n) — pure integer rules, no interpolation.
    # coalesce(min(n),0): Spark's global agg over an EMPTY frame emits
    # F.lit(n)=0 while min(n) over an empty CTE is NULL — pin the
    # degenerate zero-conversions case to 0 on both sides (ADVICE r7)
    oracle="""
    WITH v AS (
      SELECT user_id, min(epoch_us(ts)) AS t1
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
                         AND epoch_us(e.ts) > v.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
                         AND epoch_us(e.ts) > c.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ),
    lat AS (
      SELECT CAST(p.t3 - v.t1 AS BIGINT) AS lat_us
      FROM p JOIN v ON p.user_id = v.user_id
    ),
    d AS (
      SELECT lat_us, CAST(count(*) AS BIGINT) AS cnt FROM lat GROUP BY 1
    ),
    r AS (
      SELECT lat_us,
             CAST(sum(cnt) OVER (ORDER BY lat_us
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum,
             CAST(sum(cnt) OVER () AS BIGINT) AS n
      FROM d
    )
    SELECT CAST(coalesce(min(n), 0) AS BIGINT) AS n_converted,
           CAST(min(lat_us) AS BIGINT) AS min_us,
           CAST(min(CASE WHEN 4 * cum >= n THEN lat_us END) AS BIGINT)
             AS p25_us,
           CAST(min(CASE WHEN 2 * cum >= n THEN lat_us END) AS BIGINT)
             AS med_us,
           CAST(min(CASE WHEN 4 * cum >= 3 * n THEN lat_us END) AS BIGINT)
             AS p75_us,
           CAST(max(lat_us) AS BIGINT) AS max_us
    FROM r
    """,
)
def q199_conversion_latency_quartiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """HOW FAST the q193 funnel converts: exact lower quartiles of
    view→purchase latency over converting users (min/p25/median/p75/
    max, integer µs, no interpolation) — counts say whether the
    funnel works, latency says whether it is usable.

    Scale shape: the q193 first-reach chain, then the latency
    multiset collapses to (value, count) rows and the global
    cumulative ranks come from the TWO-PASS range-partitioned prefix
    sum (operators/ranking.py — distinct latencies scale with users,
    so never a global ordered window); one 1-row reduce ends it."""
    from .operators.ranking import global_rank_cumsum
    from .sources.tables import load_events

    ev = load_events(spark, sf_dir).select("user_id", "ts_us", "event_type")

    def first_after(step: str, prev: DataFrame, tcol: str, out: str):
        j = ev.filter(F.col("event_type") == step).join(
            prev, "user_id"
        ).filter(F.col("ts_us") > F.col(tcol))
        return j.groupBy("user_id").agg(
            F.min("ts_us").cast("long").alias(out)
        )

    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").cast("long").alias("t1"))
    )
    c = first_after("click", v, "t1", "t2")
    p = first_after("purchase", c, "t2", "t3")
    lat = p.join(v, "user_id").select(
        (F.col("t3") - F.col("t1")).cast("long").alias("lat_us")
    )
    d = lat.groupBy("lat_us").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    r, _, n = global_rank_cumsum(
        d, [F.col("lat_us").asc()], rank_col="_rn", sum_col="cnt",
        cum_col="cum",
    )
    return r.agg(
        F.lit(n).cast("long").alias("n_converted"),
        F.min("lat_us").cast("long").alias("min_us"),
        F.min(
            F.when(4 * F.col("cum") >= F.lit(n), F.col("lat_us"))
        ).cast("long").alias("p25_us"),
        F.min(
            F.when(2 * F.col("cum") >= F.lit(n), F.col("lat_us"))
        ).cast("long").alias("med_us"),
        F.min(
            F.when(4 * F.col("cum") >= F.lit(3 * n), F.col("lat_us"))
        ).cast("long").alias("p75_us"),
        F.max("lat_us").cast("long").alias("max_us"),
    )


@query(
    "q200_leakage_safe_split",
    # identical pair set (exact inverted-index Jaccard), identical
    # min-reachable-id closure, identical md5-coin bucketing of the
    # ROOT — members of one near-dup cluster co-assign by construction
    oracle="WITH RECURSIVE"
    + _SQL_CLOSURE_035.format(grams=_SQL_GRAMS)
    + """
    SELECT doc_id, root,
           CASE CAST(('0x' || substring(md5('split-v1:'
                       || CAST(root AS VARCHAR)), 1, 15)) AS BIGINT) % 10
                WHEN 0 THEN 'test'
                WHEN 1 THEN 'valid'
                ELSE 'train' END AS split
    FROM lab
    """,
)
def q200_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-SAFE train/valid/test split: documents are assigned by
    hashing their near-dup CLUSTER root (exact ≥0.35 Jaccard components
    from the q99 PPJoin engine), never their own id — so near-duplicate
    texts can never straddle the train/test boundary (the held-out
    contamination mode dedup papers warn about: a test doc whose
    near-twin was trained on).  10% test / 10% valid by a deterministic
    60-bit md5 coin on the root.

    Scale shape: PPJoin candidate generation (rare-first prefixes,
    bucketed), O(log d) component rounds, then a pure per-row hash —
    no windows, no collects beyond the component loop's bounded
    convergence checks."""
    lab = _labeled_docs(spark, sf_dir)
    coin = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("split-v1:"), F.col("root").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return lab.select(
        "doc_id",
        "root",
        F.when(coin % 10 == 0, F.lit("test"))
        .when(coin % 10 == 1, F.lit("valid"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


@query(
    "q201_token_budget_fill",
    # identical priority order (60-bit md5 coin, doc_id tiebreak),
    # identical non-empty-token counts, identical INCLUSIVE prefix-sum
    # gate cum <= B — the oracle replays with a plain window, the
    # engine uses the two-pass range-partitioned prefix sum.
    # NULL-text docs excluded on both sides (conv 22): a missing doc
    # contributes no tokens, and a NULL n_tokens would poison the
    # running sum differently per engine.
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(list_filter({_SQL_TOKENIZE}, x -> x <> ''))
               AS BIGINT) AS n_tokens,
             CAST(('0x' || substring(md5('fill-v1:'
                     || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
               AS coin
      FROM documents WHERE text IS NOT NULL
    ),
    r AS (
      SELECT doc_id, n_tokens,
             CAST(row_number() OVER (ORDER BY coin, doc_id) AS BIGINT)
               AS pos,
             CAST(sum(n_tokens) OVER (ORDER BY coin, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum_tokens
      FROM t
    )
    SELECT doc_id, n_tokens, pos, cum_tokens
    FROM r WHERE cum_tokens <= 20000
    """,
)
def q201_token_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic TOKEN-budget sampling: fill a fixed 20k-token
    budget by drawing documents in seeded md5 priority order and
    keeping every doc whose INCLUSIVE running token count still fits —
    the reproducible "give me exactly ~N tokens of this corpus" draw a
    mixture pipeline runs per source (q177 apportions a DOC budget;
    training budgets are token-denominated).

    Scale shape: per-doc token counts map-side, then ONE two-pass
    range-partitioned global prefix sum over (coin, doc_id)
    (operators/ranking.py — never an unpartitioned ordered window),
    then a per-row gate."""
    from .operators.dedup import words
    from .operators.ranking import global_rank_cumsum

    # conv 22: NULL-text docs excluded (no tokens to contribute; a NULL
    # count would poison the prefix sum engine-asymmetrically)
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    t = docs.select(
        "doc_id",
        F.size(F.filter(words(F.col("text")), lambda x: x != F.lit("")))
        .cast("long")
        .alias("n_tokens"),
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("fill-v1:"), F.col("doc_id").cast("string")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("_coin"),
    )
    ranked, _, _ = global_rank_cumsum(
        t,
        [F.col("_coin").asc(), F.col("doc_id").asc()],
        rank_col="pos",
        sum_col="n_tokens",
        cum_col="cum_tokens",
    )
    return ranked.filter(F.col("cum_tokens") <= 20000).select(
        "doc_id", "n_tokens", "pos", "cum_tokens"
    )


@query(
    "q202_cluster_representatives",
    # identical components; keep-best = arg_max over ONE packed integer
    # key n_chars·10^10 − doc_id (conv 12: max n_chars, ties to the
    # SMALLEST doc id — doc ids bounded far below 10^10 here).  The pack
    # is WIDE on both sides (decimal(38,0) / HUGEINT, conv 11/12): in
    # int64 it wraps silently on Spark once n_chars ≳ 9.2e8 while DuckDB
    # raises — the conv-11 silent-wrap class (r8 ADVICE).  HUGEINT stays
    # INSIDE the arg_max comparison; outputs are BIGINT (conv 19).
    oracle="WITH RECURSIVE"
    + _SQL_CLOSURE_035.format(grams=_SQL_GRAMS)
    + """
    SELECT root,
           CAST(arg_max(doc_id, CAST(n_chars AS HUGEINT) * 10000000000
                                - doc_id) AS BIGINT) AS kept_doc,
           CAST(arg_max(n_chars, CAST(n_chars AS HUGEINT) * 10000000000
                                 - doc_id) AS BIGINT) AS n_chars_kept,
           CAST(count(*) AS BIGINT) AS n_members
    FROM (SELECT l.doc_id, l.root, d.n_chars
          FROM lab l JOIN documents d ON d.doc_id = l.doc_id)
    GROUP BY root
    """,
)
def q202_cluster_representatives(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Near-dup cluster CANONICALIZATION: one representative per
    cluster — the longest member (max n_chars), ties to the smallest
    doc id — the keep-best policy that replaces naive keep-first when
    near-dup groups mix truncated and full versions of a text.
    Singletons represent themselves (n_members = 1).

    Scale shape: the q200 component labeling plus ONE map-side-combined
    groupBy(root) with a packed-integer max_by — no windows."""
    lab = _labeled_docs(spark, sf_dir)
    # decimal(38,0) pack (conv 11): an int64 pack wraps SILENTLY under
    # non-ANSI Spark once n_chars ≳ 9.2e8 (wrong representative) while
    # DuckDB raises; decimal keeps the key exact to ~1e28 n_chars and
    # stays an INTERMEDIATE type only (conv 19 — outputs below are long).
    pack = (
        F.col("n_chars").cast("decimal(38,0)") * F.lit(10_000_000_000)
        - F.col("doc_id")
    )
    return lab.groupBy("root").agg(
        F.max_by(F.col("doc_id"), pack).cast("long").alias("kept_doc"),
        F.max_by(F.col("n_chars"), pack).cast("long").alias("n_chars_kept"),
        F.count(F.lit(1)).cast("long").alias("n_members"),
    )


@query(
    "q203_source_overlap_matrix",
    # identical per-source KMV sketches (same 60-bit md5 hash, same
    # seed), identical theta = min rule (n < k -> full hash space
    # 2^60), exact integer cut/intersection counts over h <= theta,
    # one ratio division of identical operands
    oracle=f"""
    WITH tok AS (
      SELECT source,
             CAST(('0x' || substring(md5('kmv-v1:' || token), 1, 15))
               AS BIGINT) AS h
      FROM (SELECT source, unnest({_SQL_TOKENIZE}) AS token
            FROM documents)
      WHERE token <> ''
    ),
    dist AS (SELECT DISTINCT source, h FROM tok),
    sk AS (
      SELECT source, h FROM (
        SELECT source, h,
               row_number() OVER (PARTITION BY source ORDER BY h) AS rn
        FROM dist
      ) WHERE rn <= 256
    ),
    th AS (
      SELECT source,
             CASE WHEN count(*) < 256
                  THEN CAST(1152921504606846976 AS BIGINT)
                  ELSE CAST(max(h) AS BIGINT) END AS theta
      FROM sk GROUP BY source
    ),
    p AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(least(a.theta, b.theta) AS BIGINT) AS theta_cut
      FROM th a JOIN th b ON a.source < b.source
    ),
    ca AS (
      SELECT p.source_a, p.source_b, CAST(count(*) AS BIGINT) AS n_cut_a
      FROM p JOIN sk s ON s.source = p.source_a AND s.h <= p.theta_cut
      GROUP BY 1, 2
    ),
    cb AS (
      SELECT p.source_a, p.source_b, CAST(count(*) AS BIGINT) AS n_cut_b
      FROM p JOIN sk s ON s.source = p.source_b AND s.h <= p.theta_cut
      GROUP BY 1, 2
    ),
    iv AS (
      SELECT p.source_a, p.source_b,
             CAST(count(*) AS BIGINT) AS inter_seen
      FROM p
      JOIN sk x ON x.source = p.source_a AND x.h <= p.theta_cut
      JOIN sk y ON y.source = p.source_b AND y.h = x.h
      GROUP BY 1, 2
    )
    SELECT p.source_a, p.source_b, p.theta_cut,
           CAST(coalesce(ca.n_cut_a, 0) AS BIGINT) AS n_cut_a,
           CAST(coalesce(cb.n_cut_b, 0) AS BIGINT) AS n_cut_b,
           CAST(coalesce(iv.inter_seen, 0) AS BIGINT) AS inter_seen,
           CAST(coalesce(ca.n_cut_a, 0) + coalesce(cb.n_cut_b, 0)
                - coalesce(iv.inter_seen, 0) AS BIGINT) AS union_seen,
           CASE WHEN coalesce(ca.n_cut_a, 0) + coalesce(cb.n_cut_b, 0)
                     - coalesce(iv.inter_seen, 0) = 0 THEN 0.0
                ELSE CAST(coalesce(iv.inter_seen, 0) AS DOUBLE)
                     / CAST(coalesce(ca.n_cut_a, 0)
                            + coalesce(cb.n_cut_b, 0)
                            - coalesce(iv.inter_seen, 0) AS DOUBLE)
           END AS jaccard_est
    FROM p
    LEFT JOIN ca USING (source_a, source_b)
    LEFT JOIN cb USING (source_a, source_b)
    LEFT JOIN iv USING (source_a, source_b)
    """,
)
def q203_source_overlap_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ALL-PAIRS cross-source vocabulary overlap from per-source KMV
    sketches (k=256) — the contamination / redundancy matrix between
    corpus slices (which sources feed each other?), at sketch cost:
    q125 compares TWO fixed corpora; this sketches every source in one
    pass and compares all pairs.  Theta-cut counts are exact integers;
    jaccard is the ratio estimator (theta cancels).

    Estimator variance (r8 verdict item 5): the ratio estimator's
    relative std-err is ~1/sqrt(k) of the union cut — k=16 gave ±25%
    bands, k=256 gives ~±6%; correctness is unaffected either way
    (every output is an exact integer over the pinned h <= theta
    region plus one division of identical operands), and cost is nil
    because no frame after the sketch build exceeds k·|sources| rows.

    Scale shape: one (source, hash)-distinct agg + a WindowGroupLimit
    per-group top-k; everything downstream is k·|sources|-row frames
    and a |sources|²-bounded pair join — corpus size never appears
    after the sketch build."""
    from .operators.corpus import kmv_overlap_matrix, kmv_sketch_grouped

    sk = kmv_sketch_grouped(
        _t(spark, sf_dir, "documents"), group_col="source", k=256
    )
    return kmv_overlap_matrix(sk, group_col="source", k=256)


@query(
    "q204_source_duplication_report",
    # identical content digest (md5 of the shared normalize rule) and
    # truncating-ppm rate — pure integers after the digest
    oracle="""
    WITH d AS (
      SELECT source,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
               AS content_hash
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT content_hash) AS BIGINT) AS n_distinct,
           CAST((1000000 * (count(*) - count(DISTINCT content_hash)))
                // count(*) AS BIGINT) AS dup_ppm
    FROM d GROUP BY source
    """,
)
def q204_source_duplication_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source EXACT duplication rate (docs vs distinct normalized
    contents, truncating ppm) — the per-slice data-sheet number that
    decides which source needs the full near-dup pass first; the
    grouped rollup of q20's exact-dedup digests.

    Scale shape: one groupBy(source) with a distinct-count over
    32-byte digests — the text never shuffles."""
    from .operators.dedup import normalize_text

    d = _t(spark, sf_dir, "documents").select(
        "source", F.md5(normalize_text(F.col("text"))).alias("content_hash")
    )
    return d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("content_hash").cast("long").alias("n_distinct"),
    ).select(
        "source",
        "n_docs",
        "n_distinct",
        F.expr("(1000000 * (n_docs - n_distinct)) div n_docs")
        .cast("long")
        .alias("dup_ppm"),
    )


@query(
    "q205_cross_source_contamination",
    # Exact inverted-index Jaccard closure (conv 7, the q22 oracle) +
    # source joins; valid because LSH recall is complete at this
    # operating point (pinned by test_minhash_lsh_recall_vs_exact), so
    # Spark's verified pair set IS the exact >= 0.3 pair set.  Pure
    # integer outputs: counts + truncating-ppm rates (conv 15: the ppm
    # div is exact integer arithmetic, no float ranking).
    oracle="""
    WITH sh AS MATERIALIZED (
      SELECT doc_id,
             list_distinct(
               list_transform(
                 range(1, greatest(len(__ws) - 2, 1) + 1),
                 i -> array_to_string(list_slice(__ws, i, i + 2), ' ')
               )
             ) AS grams
      FROM (SELECT *, string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')
            AS __ws FROM documents)
    ),
    ex AS (SELECT doc_id, unnest(grams) AS g FROM sh),
    sizes AS (SELECT doc_id, len(grams) AS n FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pr AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = inter.id_a
      JOIN sizes sb ON sb.doc_id = inter.id_b
      WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.3
    ),
    sp AS (
      SELECT least(da.source, db.source) AS source_a,
             greatest(da.source, db.source) AS source_b,
             CASE WHEN da.source < db.source THEN p.id_a ELSE p.id_b END AS d_a,
             CASE WHEN da.source < db.source THEN p.id_b ELSE p.id_a END AS d_b
      FROM pr p
      JOIN documents da ON da.doc_id = p.id_a
      JOIN documents db ON db.doc_id = p.id_b
      WHERE da.source <> db.source
    ),
    ag AS (
      SELECT source_a, source_b, count(*) AS np,
             count(DISTINCT d_a) AS na, count(DISTINCT d_b) AS nb
      FROM sp GROUP BY 1, 2
    ),
    tot AS (SELECT source, count(*) AS t FROM documents GROUP BY source)
    SELECT ag.source_a, ag.source_b,
           CAST(np AS BIGINT) AS n_pairs,
           CAST(na AS BIGINT) AS n_docs_a,
           CAST(nb AS BIGINT) AS n_docs_b,
           CAST((1000000 * na) // ta.t AS BIGINT) AS contam_a_ppm,
           CAST((1000000 * nb) // tb.t AS BIGINT) AS contam_b_ppm
    FROM ag
    JOIN tot ta ON ta.source = ag.source_a
    JOIN tot tb ON tb.source = ag.source_b
    """,
)
def q205_cross_source_contamination(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DOC-LEVEL cross-source contamination matrix (r8 verdict item 7):
    q203 measures vocabulary overlap via KMV sketches; the training-data
    question is "how many of source A's DOCUMENTS near-dup into source
    B" — this composes the proven MinHash+LSH band join (q22's verified
    pair set, J >= 0.3) grouped by unordered source pair, with per-side
    distinct-doc counts and truncating-ppm contamination rates against
    each source's total document count.

    Scale shape: candidate generation is the bucketed band join (never
    all-pairs); the pair set joins documents twice on doc_id for the
    source labels; everything after is a |sources|²-bounded aggregate.
    Totals come from one grouped count, broadcast into the final join."""
    from .operators.dedup import minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, num_hashes=64, bands=16, threshold=0.3
    ).select("id_a", "id_b")
    src = docs.select("doc_id", "source")
    labeled = (
        pairs.join(
            src.select(
                F.col("doc_id").alias("id_a"), F.col("source").alias("_sa")
            ),
            "id_a",
        )
        .join(
            src.select(
                F.col("doc_id").alias("id_b"), F.col("source").alias("_sb")
            ),
            "id_b",
        )
        .filter(F.col("_sa") != F.col("_sb"))
        .select(
            F.least("_sa", "_sb").alias("source_a"),
            F.greatest("_sa", "_sb").alias("source_b"),
            F.when(F.col("_sa") < F.col("_sb"), F.col("id_a"))
            .otherwise(F.col("id_b"))
            .alias("_da"),
            F.when(F.col("_sa") < F.col("_sb"), F.col("id_b"))
            .otherwise(F.col("id_a"))
            .alias("_db"),
        )
    )
    agg = labeled.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.countDistinct("_da").cast("long").alias("n_docs_a"),
        F.countDistinct("_db").cast("long").alias("n_docs_b"),
    )
    tot = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("_t")
    )
    return (
        agg.join(
            F.broadcast(
                tot.select(
                    F.col("source").alias("source_a"), F.col("_t").alias("_ta")
                )
            ),
            "source_a",
        )
        .join(
            F.broadcast(
                tot.select(
                    F.col("source").alias("source_b"), F.col("_t").alias("_tb")
                )
            ),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "n_pairs",
            "n_docs_a",
            "n_docs_b",
            F.expr("(1000000 * n_docs_a) div _ta")
            .cast("long")
            .alias("contam_a_ppm"),
            F.expr("(1000000 * n_docs_b) div _tb")
            .cast("long")
            .alias("contam_b_ppm"),
        )
    )


@query(
    "q206_phash_near_dup",
    # the byte-raster WHT pHash is exact integer end-to-end (block
    # sums div counts, ±1 Hadamard signs, >0 bits packed into bits
    # 62..0 of a non-negative BIGINT), so DuckDB rebuilds every
    # signature from the same utf-8 bytes; the pair set is the exact
    # hamming<=6 definition (Spark's 4-chunk one-flip multi-probe
    # blocking is recall-COMPLETE to 7 by pigeonhole), so the oracle
    # may use its own complete pair enumeration — all-pairs over the
    # tiny signature table (n^2 cheap integer xors), per conv 7.
    # Multi-referenced CTEs are MATERIALIZED (conv 23b).
    oracle="""
    WITH src AS MATERIALIZED (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS n
      FROM documents WHERE text IS NOT NULL AND text <> ''
    ),
    bytes AS (
      SELECT doc_id, n, u.i,
             CAST(('0x' || substr(hx, CAST(2*u.i+1 AS BIGINT), 2))
               AS BIGINT) AS b,
             (u.i * 64) // n AS blk
      FROM src, unnest(range(0, n)) AS u(i)
    ),
    cells0 AS MATERIALIZED (
      SELECT doc_id, blk, CAST(sum(b) // count(*) AS BIGINT) AS cell
      FROM bytes GROUP BY doc_id, blk
    ),
    grid AS MATERIALIZED (
      SELECT s.doc_id, g.p, COALESCE(c.cell, 0) AS cell
      FROM src s CROSS JOIN unnest(range(0, 64)) AS g(p)
      LEFT JOIN cells0 c ON c.doc_id = s.doc_id AND c.blk = g.p
    ),
    coeffs AS (
      SELECT g.doc_id, f.i,
             CAST(sum(CASE WHEN bit_count(CAST(f.i & g.p AS BIGINT)) % 2 = 0
                           THEN g.cell ELSE -g.cell END) AS BIGINT) AS s
      FROM grid g CROSS JOIN unnest(range(1, 64)) AS f(i)
      GROUP BY g.doc_id, f.i
    ),
    sigs AS MATERIALIZED (
      SELECT doc_id,
             CAST(sum(CASE WHEN s > 0
                      THEN (CAST(1 AS BIGINT) << CAST(63 - i AS BIGINT))
                      ELSE 0 END) AS BIGINT) AS sig
      FROM coeffs GROUP BY doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
    FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sig, b.sig)) <= 6
    """,
)
def q206_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Visual near-duplicate pairs by perceptual hash over the media
    binary column (documents through attach_binary_content — the fake
    byte-raster decode tier): 64-cell block-average pooling → integer
    Walsh-Hadamard sign bits → 4-chunk one-flip multi-probe hamming
    blocking → exact bit_count verify at distance <= 6.  The multimodal
    block's near-dup member (decode/resize/features/frames existed;
    re-encoded-copy detection did not) — recompression-style jitter
    moves this hash 0-6 bits while unrelated rasters sit ~32
    (tests/test_phash.py pins recall on planted jittered images).

    Scale shape: signatures are a zero-shuffle Arrow map (16 bytes/row,
    persisted once); blocking is an equi-join on a 2^16 keyspace per
    chunk with a constant 17x probe fan-out — candidate volume stays
    ~linear in the corpus, never all-pairs; verify is one integer
    xor+popcount per candidate."""
    from .operators.multimodal import attach_binary_content
    from .operators.phash import phash_pairs

    media = attach_binary_content(_t(spark, sf_dir, "documents"))
    return phash_pairs(media, max_distance=6)
