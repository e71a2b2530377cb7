"""q94-q113: temporal ops, CDC, funnels, similarity joins, selection pipeline

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

# ---------------------------------------------------------------------------
# Time-series / CDC / funnel block (q94–q97): the event-analytics operators
# a production pipeline needs that the registry didn't yet cover — rolling
# interval windows, grid resampling with gap-fill, changelog compaction,
# ordered funnel attribution.  All integer/exact-decimal arithmetic; event
# time is exact integer microseconds via sources/tables.py:load_events
# (convention #4).
# ---------------------------------------------------------------------------


@query(
    "q94_rolling_interval_window",
    oracle="""
    SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           count(*) OVER w AS n_1h,
           CAST(sum(CAST(value AS DECIMAL(19,4))) OVER w AS DOUBLE) AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def q94_rolling_interval_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 1-hour interval window per user (RANGE frame over event
    time): for every event, the count and exact-decimal sum of that
    user's events in the trailing hour.

    This is the RANGE-BETWEEN-INTERVAL shape (q42 covers the ROWS
    cumulative frame): the frame is defined by a time distance, not a
    row count, so ties at the same microsecond include all peers —
    identical semantics both engines.  Time distance is exact integer
    microseconds (ts_us).  Scale: one shuffle on user_id, per-user
    ascending sort feeds the sliding frame in one pass; no global
    window anywhere."""
    ev = load_events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts_us",
        F.count("*").over(w).alias("n_1h"),
        F.sum(F.col("value").cast("decimal(19,4)")).over(w).cast("double").alias("sum_1h"),
    )


@query(
    "q95_resample_gapfill_locf",
    # 6-hour buckets by integer floor-division of exact µs; LOCF picks
    # an existing exact value (decimal-summed, one double cast) — no
    # float arithmetic anywhere in the fill.
    oracle="""
    WITH hourly AS (
      SELECT user_id, epoch_us(ts) // 21600000000 AS bucket,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(19,4))) AS DOUBLE) AS v
      FROM events GROUP BY user_id, bucket
    ),
    b AS (SELECT user_id, min(bucket) AS mn, max(bucket) AS mx
          FROM hourly GROUP BY user_id),
    grid AS (SELECT user_id, unnest(generate_series(mn, mx)) AS bucket FROM b),
    j AS (SELECT g.user_id, g.bucket, h.n, h.v
          FROM grid g LEFT JOIN hourly h USING (user_id, bucket))
    SELECT user_id, bucket,
           COALESCE(n, 0) AS n_events,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf
    FROM j
    """,
)
def q95_resample_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-grid resampling with gap-fill: bucket each user's events
    into 6-hour intervals, materialize the FULL per-user grid between
    their first and last bucket (empty buckets included), and forward-
    fill the last observed value (LOCF — last observation carried
    forward).

    The missing-timestamp half of ETL that joins/windows alone don't
    give you.  Plan: one agg to buckets, a per-user (min, max) agg,
    sequence()+explode to generate the grid WITHOUT a cross join (grid
    size is data-dependent per user, never |users|×|global span|), a
    co-partitioned left join back, and a per-user ROWS window for the
    fill — shuffles only on user_id, reused across all four stages by
    AQE.  Empty buckets report n_events = 0 and the carried value."""
    ev = load_events(spark, sf_dir)
    hourly = (
        ev.withColumn("bucket", F.expr("ts_us div 21600000000"))
        .groupBy("user_id", "bucket")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(19,4)")).cast("double").alias("v"),
        )
    )
    grid = (
        hourly.groupBy("user_id")
        .agg(F.min("bucket").alias("mn"), F.max("bucket").alias("mx"))
        .select(
            "user_id",
            F.explode(F.sequence(F.col("mn"), F.col("mx"))).alias("bucket"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["user_id", "bucket"], "left")
        .select(
            "user_id",
            "bucket",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
            F.last("v", ignorenulls=True).over(w).alias("value_locf"),
        )
    )


@query(
    "q96_cdc_changelog_compaction",
    # the changelog is derived deterministically from orders (seq 0
    # insert for every key; seq 1 update for even keys, +10.00 exact
    # decimal; seq 2 delete for keys %7=0), so both engines compact
    # the identical op stream.
    oracle="""
    WITH log AS (
      SELECT o_orderkey AS key, 0 AS seq, 'I' AS op,
             CAST(o_totalprice AS DECIMAL(12,4)) AS price FROM orders
      UNION ALL
      SELECT o_orderkey, 1, 'U',
             CAST(o_totalprice AS DECIMAL(12,4)) + CAST(10 AS DECIMAL(6,2))
      FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT o_orderkey, 2, 'D', NULL
      FROM orders WHERE o_orderkey % 7 = 0
    ),
    latest AS (
      SELECT key, op, price,
             row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
      FROM log
    )
    SELECT key, op AS last_op, CAST(price AS DOUBLE) AS price
    FROM latest WHERE rn = 1 AND op <> 'D'
    ORDER BY key
    """,
)
def q96_cdc_changelog_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog compaction: given an (key, seq, op, value) change
    stream, keep each key's highest-seq operation and drop keys whose
    last op is a delete — the merge step of every incremental-ingest
    pipeline (Debezium→warehouse, Hudi/Iceberg merge-on-read).

    The compaction is ONE hash aggregate: max_by(struct(op, price),
    seq) — no window, no sort, map-side partial combine (the oracle
    keeps the textbook row_number form; seq is unique per key so both
    pick the same row).  At 100 TB the changelog shuffles once on key;
    a per-key sort-based window would shuffle the same data but spill
    sort runs — max_by folds in the combiner instead."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key"),
        F.col("o_totalprice").cast("decimal(12,4)").alias("p0"),
    )
    log = (
        o.select("key", F.lit(0).alias("seq"), F.lit("I").alias("op"),
                 F.col("p0").alias("price"))
        .unionByName(
            o.filter(F.col("key") % 2 == 0).select(
                "key", F.lit(1).alias("seq"), F.lit("U").alias("op"),
                (F.col("p0") + F.lit(10).cast("decimal(6,2)")).alias("price"),
            )
        )
        .unionByName(
            o.filter(F.col("key") % 7 == 0).select(
                "key", F.lit(2).alias("seq"), F.lit("D").alias("op"),
                F.lit(None).cast("decimal(13,4)").alias("price"),
            )
        )
    )
    return (
        log.groupBy("key")
        .agg(F.max_by(F.struct("op", "price"), "seq").alias("last"))
        .filter(F.col("last.op") != "D")
        .select(
            "key",
            F.col("last.op").alias("last_op"),
            F.col("last.price").cast("double").alias("price"),
        )
        # presentation-only trailing orderBy dropped (r12, guide §2.4)
    )


@query(
    "q97_event_funnel",
    # pure integer µs comparisons; each stage's min() is exact, so the
    # staged decorrelation and the correlated SQL pick identical rows.
    oracle="""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    s1 AS (SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
           WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2
           FROM events e JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'click'
             AND epoch_us(e.ts) > s1.t1
             AND epoch_us(e.ts) <= s1.t1 + 86400000000
           GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t3
           FROM events e JOIN s2 ON e.user_id = s2.user_id
           WHERE e.event_type = 'purchase'
             AND epoch_us(e.ts) > s2.t2
             AND epoch_us(e.ts) <= s2.t2 + 86400000000
           GROUP BY e.user_id)
    SELECT CASE WHEN s3.user_id IS NOT NULL THEN 3
                WHEN s2.user_id IS NOT NULL THEN 2
                WHEN s1.user_id IS NOT NULL THEN 1
                ELSE 0 END AS funnel_depth,
           count(*) AS n_users
    FROM u
    LEFT JOIN s1 ON u.user_id = s1.user_id
    LEFT JOIN s2 ON u.user_id = s2.user_id
    LEFT JOIN s3 ON u.user_id = s3.user_id
    GROUP BY funnel_depth
    ORDER BY funnel_depth
    """,
)
def q97_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event funnel: view → click → purchase, each step within
    24 hours of the previous, earliest-qualifying-event semantics;
    output = user count per completed funnel depth (0–3).

    The staged decorrelation: step k's candidate set joins step k-1's
    min-timestamp per user, then takes its own min — three small
    per-user aggregates instead of a per-user sort or any session
    state.  Every intermediate is keyed on user_id, so AQE reuses one
    partitioning across all joins; timestamps compare as exact integer
    µs.  The final depth rollup is 4 rows."""
    ev = load_events(spark, sf_dir).select("user_id", "event_type", "ts_us")
    u = ev.select("user_id").distinct()
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1.withColumnRenamed("user_id", "_u1"), F.col("user_id") == F.col("_u1"))
        .filter(
            (F.col("ts_us") > F.col("t1"))
            & (F.col("ts_us") <= F.col("t1") + F.lit(86_400_000_000))
        )
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2.withColumnRenamed("user_id", "_u2"), F.col("user_id") == F.col("_u2"))
        .filter(
            (F.col("ts_us") > F.col("t2"))
            & (F.col("ts_us") <= F.col("t2") + F.lit(86_400_000_000))
        )
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t3"))
    )
    depth = (
        u.join(s1.select(F.col("user_id").alias("u1")), F.col("user_id") == F.col("u1"), "left")
        .join(s2.select(F.col("user_id").alias("u2"), "t2"), F.col("user_id") == F.col("u2"), "left")
        .join(s3.select(F.col("user_id").alias("u3"), "t3"), F.col("user_id") == F.col("u3"), "left")
        .select(
            F.when(F.col("u3").isNotNull(), 3)
            .when(F.col("u2").isNotNull(), 2)
            .when(F.col("u1").isNotNull(), 1)
            .otherwise(0)
            .alias("funnel_depth")
        )
    )
    return (
        depth.groupBy("funnel_depth")
        .agg(F.count("*").alias("n_users"))
        .orderBy("funnel_depth")
    )


# ---------------------------------------------------------------------------
# Dedup blocking completion (q98–q99): the two classic set-similarity
# strategies the family still lacked — sorted-neighborhood (Hernández–
# Stolfo merge/purge) and prefix-filtered similarity join (PPJoin-style).
# With exact/minhash-LSH/simhash/banded-edit-distance/embedding-LSH this
# closes out the standard blocking taxonomy.
# ---------------------------------------------------------------------------

# _SQL_GRAMS / _SQL_DOCS_WS (the shared shingle fragments, staged-token
# form) are defined next to q21, their proving query.


@query(
    "q98_sorted_neighborhood_pairs",
    # the oracle replicates the SNM window CONTRACT exactly (same block
    # key, same total sort order, same rank-distance w) — SNM's output
    # is defined by its window, so the replica is the semantics, not a
    # recall approximation.
    oracle=f"""
    WITH d AS (
      SELECT doc_id, lang,
             lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm,
             {_SQL_GRAMS} AS grams
      FROM {_SQL_DOCS_WS}
    ),
    r AS (
      SELECT doc_id, grams,
             lang || '|' || substr(norm, 1, 12) AS blk,
             row_number() OVER (
               PARTITION BY lang || '|' || substr(norm, 1, 12)
               ORDER BY norm, doc_id) AS rnk
      FROM d
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
             / CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS DOUBLE)
             AS jaccard
    FROM r a JOIN r b
      ON a.blk = b.blk AND b.rnk BETWEEN a.rnk + 1 AND a.rnk + 5
    WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
            / CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS DOUBLE)
            >= 0.35
    """,
)
def q98_sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood near-dup pairs (merge/purge blocking): sort
    records inside a block on a normalized key, compare each record
    only to its w=5 successors, verify candidates with exact 3-gram
    Jaccard ≥ 0.35.

    The block key is (lang, first-12-normalized-chars) so the per-block
    window is BOUNDED — a classic single-key SNM sorts the whole
    dataset and needs a global row_number, which is exactly the
    global-window shape convention #2 forbids; blocked SNM keeps the
    same compare-adjacent contract with a partitionable sort.  Pairs
    whose sort keys diverge in the first 12 chars are out of contract
    by design (that sort-key sensitivity is SNM's documented
    limitation; the LSH family covers order-insensitive recall).
    Rank-distance pairing is a j=1..w explode + equi-join on
    (block, rank) — never a range self-join."""
    from .operators.dedup import normalize_text, word_shingles

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        normalize_text(F.col("text")).alias("norm"),
        word_shingles(F.col("text"), 3).alias("grams"),
    ).withColumn("blk", F.concat_ws("|", F.col("lang"), F.substring("norm", 1, 12)))
    w = Window.partitionBy("blk").orderBy("norm", "doc_id")
    r = d.select("doc_id", "grams", "blk", F.row_number().over(w).alias("rnk"))
    left = r.select(
        F.col("doc_id").alias("id_a"),
        F.col("grams").alias("grams_a"),
        "blk",
        F.explode(F.array(*[F.col("rnk") + j for j in range(1, 6)])).alias("_probe"),
    )
    right = r.select(
        F.col("doc_id").alias("id_b"),
        F.col("grams").alias("grams_b"),
        F.col("blk").alias("_rblk"),
        F.col("rnk").alias("_rrnk"),
    )
    jac = F.size(F.array_intersect("grams_a", "grams_b")).cast("double") / F.size(
        F.array_union("grams_a", "grams_b")
    ).cast("double")
    return (
        left.join(
            right,
            (F.col("blk") == F.col("_rblk")) & (F.col("_probe") == F.col("_rrnk")),
        )
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= 0.35)
        .select("id_a", "id_b", "jaccard")
    )


@query(
    "q99_prefix_filter_similarity_join",
    # the oracle is the EXACT all-pairs answer (inverted-index form,
    # convention #7) with zero prefix mechanics: the prefix-filtering
    # theorem guarantees the Spark side's pruning is lossless at any
    # data (if J(A,B) ≥ t, the first |A|−⌈t|A|⌉+1 tokens of A and B
    # under one global frequency order must intersect), so the gate
    # checks recall = 100% by construction.
    oracle=f"""
    WITH sh AS MATERIALIZED (SELECT doc_id, {_SQL_GRAMS} AS grams FROM {_SQL_DOCS_WS}),
    n AS (SELECT doc_id, len(grams) AS n FROM sh),
    post AS (SELECT doc_id, unnest(grams) AS gram FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM post a JOIN post b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) AS jaccard
    FROM inter
    JOIN n na ON na.doc_id = id_a
    JOIN n nb ON nb.doc_id = id_b
    WHERE CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) >= 0.35
    """,
)
def q99_prefix_filter_similarity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered exact similarity join (PPJoin-style): exact
    3-gram Jaccard ≥ 0.35 pairs over the WHOLE corpus, without LSH and
    without an all-pairs comparison.

    Mechanics: order every shingle by global (frequency, shingle)
    ascending; each doc keeps only its first n − ⌈t·n⌉ + 1 shingles
    (its "prefix" — the rarest ones); two docs are candidates iff
    their prefixes share a shingle; candidates verify with the exact
    Jaccard.  Rare-first prefixes make the candidate buckets
    inherently skew-resistant (the most frequent shingles never join),
    and the per-doc sort is a bounded array_sort — no global window,
    unlike a rank()-based implementation.  Verification joins the full
    shingle arrays back on the (few) candidates.  The union size uses
    |A|+|B|−|A∩B| so Spark and DuckDB compute the identical integer
    before the one double division."""
    return _ppjoin_pairs(spark, sf_dir)


@query(
    "q100_unigram_surprisal",
    # integer-exact fixed-point log2 (see _sql_flog2_fx) — the ONLY
    # float ops are one exact 2^-20 scaling and one correctly-rounded
    # division per doc, identical operands both engines
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_SQL_TOKENIZE}) AS token FROM documents
    ),
    t2 AS (SELECT doc_id, token FROM tok WHERE token <> ''),
    v AS (SELECT token, count(*) AS cnt FROM t2 GROUP BY token),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS N FROM v),
    pt AS (
      SELECT doc_id,
             {_sql_flog2_fx('N')} - {_sql_flog2_fx('cnt')} AS s_fx
      FROM t2 JOIN v USING (token) CROSS JOIN tot
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(s_fx) AS BIGINT) AS surprisal_fx,
           (CAST(sum(s_fx) AS DOUBLE) / 1048576.0) / CAST(count(*) AS DOUBLE)
             AS mean_surprisal_bits,
           CASE WHEN (CAST(sum(s_fx) AS DOUBLE) / 1048576.0)
                     / CAST(count(*) AS DOUBLE) < 4.90 THEN 'predictable'
                WHEN (CAST(sum(s_fx) AS DOUBLE) / 1048576.0)
                     / CAST(count(*) AS DOUBLE) < 5.00 THEN 'typical'
                ELSE 'surprising' END AS lm_bucket
    FROM pt GROUP BY doc_id
    """,
)
def q100_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style unigram-LM quality scoring: per-doc mean surprisal in
    bits under the corpus's own unigram distribution — the cheap LM
    filter between q78's mean-frequency and a real KenLM.  log2 is the
    fixed-point dyadic bit-hack (operators/corpus.py module note), so
    the score is integer-exact and cross-engine bit-stable where libm
    log provably is not.  Scale: vocab-collapse + broadcast-back join,
    same shape as q78 (reference analytics parity:
    dags/marketeye_etl_dag.py brand-frequency tasks, generalized)."""
    from .operators.corpus import unigram_surprisal

    return unigram_surprisal(_t(spark, sf_dir, "documents"), eager=True)


@query(
    "q101_shard_shuffle",
    oracle="""
    WITH h AS (
      SELECT doc_id,
             md5('shuffle-v1:' || CAST(doc_id AS VARCHAR)) AS k
      FROM documents
    ),
    s AS (
      SELECT doc_id, k,
             CAST(('0x' || substring(k, 1, 15)) AS BIGINT) % 32 AS shard
      FROM h
    )
    SELECT doc_id, shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY k, doc_id)
                AS BIGINT) AS pos
    FROM s
    """,
)
def q101_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order shuffle: seeded md5 assigns every
    doc a (shard, position) — reproducible pseudo-random global order
    with NO global sort (the row_number window partitions by shard;
    shards sort in parallel).  The standard epoch-shuffle recipe for a
    100 TB corpus: n_shards ≈ output file count, one sorted file per
    shard."""
    from .operators.sampling import shard_assign

    d = _t(spark, sf_dir, "documents").select("doc_id")
    return shard_assign(d, "doc_id", n_shards=32).select("doc_id", "shard", "pos")


@query(
    "q102_incremental_ingest",
    # NOT EXISTS (not NOT IN) mirrors left_anti null semantics
    oracle="""
    WITH b AS (
      SELECT doc_id,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
               AS content_hash
      FROM documents WHERE doc_id % 5 = 0
    ),
    adm AS (
      SELECT content_hash, min(doc_id) AS doc_id FROM b GROUP BY content_hash
    ),
    seen AS (
      SELECT DISTINCT
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
               AS content_hash
      FROM documents WHERE doc_id % 5 <> 0
    )
    SELECT doc_id, content_hash FROM adm
    WHERE NOT EXISTS (
      SELECT 1 FROM seen WHERE seen.content_hash = adm.content_hash
    )
    """,
)
def q102_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus growth: admit a new batch (docs with
    doc_id % 5 = 0 stand in for today's crawl) against the existing
    deduplicated corpus (the other 80%) — intra-batch exact dedup, then
    digest anti-join against history.  The operator that lets exact
    dedup run per-increment instead of re-sweeping 100 TB of history
    (reference scope: the daily-tick ingest in
    dags/marketeye_etl_dag.py, which re-reads the world each run)."""
    from .operators.dedup import incremental_ingest

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    return incremental_ingest(corpus, batch)


@query(
    "q103_tfidf_topk",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_SQL_TOKENIZE}) AS token FROM documents
    ),
    t2 AS (SELECT doc_id, token FROM tok WHERE token <> ''),
    tf AS (
      SELECT doc_id, token, count(*) AS tf FROM t2 GROUP BY doc_id, token
    ),
    dfq AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
    dq AS (SELECT CAST(count(*) AS BIGINT) AS D FROM documents),
    s AS (
      SELECT doc_id, token, CAST(tf AS BIGINT) AS tf,
             CAST(tf AS BIGINT)
               * ({_sql_flog2_fx('D')} - {_sql_flog2_fx('df')}) AS score_fx
      FROM tf JOIN dfq USING (token) CROSS JOIN dq
    )
    SELECT doc_id, token, tf, score_fx, CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY score_fx DESC, token ASC) AS rank
      FROM s
    )
    WHERE rank <= 3
    """,
)
def q103_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-3 TF-IDF terms per document, integer-exact end to end
    (fixed-point idf — ranking never touches a float, so the top-k set
    is bit-deterministic cross-engine).  Keyword extraction /
    boilerplate-signature mining over the documents table; the per-doc
    window is per-doc-vocab sized, never global."""
    from .operators.corpus import tfidf_topk

    return tfidf_topk(_t(spark, sf_dir, "documents"), k=3, eager=True)


@query(
    "q104_bloom_decontamination",
    # the bloom is a lossless prefilter (no false negatives), so the
    # oracle is the PLAIN exact decontamination SQL — the gate proves
    # the pruned pipeline returns the identical answer
    oracle="""
    WITH w AS (
      SELECT doc_id, source,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS ws
      FROM documents
    ),
    g AS (
      SELECT doc_id, source,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(ws) - 4, 1) + 1),
               i -> array_to_string(list_slice(ws, i, i + 4), ' ')))) AS gram
      FROM w
    ),
    bench AS (SELECT DISTINCT gram FROM g WHERE source = 'src2')
    SELECT g.doc_id, count(*) AS n_shared_grams
    FROM g JOIN bench USING (gram)
    WHERE g.source <> 'src2'
    GROUP BY g.doc_id
    """,
)
def q104_bloom_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination at the scale where the benchmark gram set cannot
    broadcast: a 2^20-bit Bloom bitmap (built distributed, OR-merged
    driver-side, re-shipped in the filter kernel's closure) drops clean
    grams MAP-SIDE; only survivors reach the exact verify join.  Bloom
    membership has no false negatives, so the output — and the oracle —
    is exactly q55's inverted-index answer (src2 as the eval set here).
    The measured prune rate is pinned in tests/test_corpus_scoring.py."""
    from .operators.dedup import bloom_decontaminate

    d = _t(spark, sf_dir, "documents")
    return bloom_decontaminate(
        d.filter(F.col("source") != "src2"),
        d.filter(F.col("source") == "src2"),
        shingle_k=5,
        eager=True,
    )


@query(
    "q105_zorder_layout",
    # pure integer bit algebra on both sides — zkey/file_id exact
    oracle=f"""
    WITH q AS (
      SELECT event_id,
             user_id % 1024 AS zx,
             (epoch_us(ts) // 3600000000) % 1024 AS zy
      FROM events
    ),
    k AS (SELECT event_id, zx, zy, {_sql_zorder('zx', 'zy', 10)} AS zkey FROM q)
    SELECT event_id, zx, zy, zkey, zkey >> 14 AS file_id FROM k
    """,
)
def q105_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (user bucket, hour bucket):
    the layout plan for a both-dimensions-skippable events table —
    sort by zkey inside file_id ranges and a range predicate on EITHER
    user or time touches O(√files) row groups.  Pure map (one codegen'd
    bit expression, zero shuffle here); the write adds the single range
    shuffle.  Event time via load_events' exact integer ts_us
    (convention #4)."""
    from .operators.layout import zorder_layout

    e = load_events(spark, sf_dir)
    out = zorder_layout(
        e,
        F.col("user_id") % 1024,
        (F.expr("ts_us div 3600000000")) % 1024,
        bits=10,
        n_files=64,
    )
    return out.select("event_id", "zx", "zy", "zkey", "file_id")


@query("q106_bm25_topk", oracle=_sql_bm25(_BM25_TERMS))
def q106_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 ranked retrieval (k1=1.2, b=0.75, Lucene non-negative
    idf): top-20 documents for a fixed bag-of-words query — the sparse
    scorer for corpus search / RAG-style data selection.  Every
    sub-score is an exact integer rational with a fixed-point-log2 idf
    (CLAUDE.md convention 6d) and the per-doc sum is a fixed-order
    COALESCE chain, so the final doubles are bit-identical on both
    engines.  Scale: only query-term postings shuffle (map-side filter
    → inverted-index probe); top-k is TakeOrderedAndProject."""
    from .operators.corpus import bm25_topk

    return bm25_topk(
        _t(spark, sf_dir, "documents"), list(_BM25_TERMS), k=20, eager=True
    )


@query(
    "q107_dsir_importance",
    # buckets via the engine-portable md5 hash; add-1 smoothed
    # log-ratio in fixed-point dyadic log2 — integer-exact until the
    # one mean-bits division (identical operands both engines)
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, unnest({_SQL_TOKENIZE}) AS token FROM documents
    ),
    t2 AS (
      SELECT doc_id, source = 'src1' AS tgt,
             CAST(('0x' || substring(md5(token), 1, 15)) AS BIGINT) % 4096
               AS bkt
      FROM tok WHERE token <> ''
    ),
    b AS (
      SELECT bkt, CAST(count(*) AS BIGINT) AS cnt_r,
             CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS cnt_t
      FROM t2 GROUP BY bkt
    ),
    tot AS (
      SELECT CAST(sum(cnt_r) + 4096 AS BIGINT) AS nr,
             CAST(sum(cnt_t) + 4096 AS BIGINT) AS nt
      FROM b
    ),
    w AS (
      SELECT bkt,
             ({_sql_flog2_fx('(cnt_t + 1)')} - {_sql_flog2_fx('(cnt_r + 1)')})
             + ({_sql_flog2_fx('nr')} - {_sql_flog2_fx('nt')}) AS ratio_fx
      FROM b CROSS JOIN tot
    ),
    per_doc AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(ratio_fx) AS BIGINT) AS score_fx
      FROM t2 JOIN w USING (bkt) GROUP BY doc_id
    ),
    st AS (
      SELECT CAST(sum(score_fx) AS HUGEINT) AS ssum,
             CAST(count(*) AS HUGEINT) AS d
      FROM per_doc
    )
    SELECT doc_id, n_tokens, score_fx,
           (CAST(score_fx AS DOUBLE) / 1048576.0)
             / CAST(n_tokens AS DOUBLE) AS mean_bits,
           CAST(score_fx AS HUGEINT) * d > ssum AS selected
    FROM per_doc CROSS JOIN st
    """,
)
def q107_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance resampling weights (hashed unigram
    features, add-1 smoothing): per-doc log2 target/raw likelihood
    ratio with src1 as the target domain — the cheap distribution
    steerer for crawl-scale data selection.  The resampling cut
    (`selected`) is score-above-corpus-mean, compared as exact
    integers (score·D > Σscore).  Integer-exact via the portable md5
    bucket hash + fixed-point log2 (convention 6d); scale shape is
    vocab-collapse (≤4096-bucket table) + broadcast-back, the same as
    q100."""
    from .operators.corpus import dsir_importance

    return dsir_importance(
        _t(spark, sf_dir, "documents"),
        F.col("source") == "src1",
        n_buckets=4096,
        eager=True,
    )


@query(
    "q108_semdedup",
    # q36's deterministic-sample quantizer replay (assignment argmin of
    # ‖c‖²−2·x·c, ties by cell — margins pinned in pytest: ≥2e-5 vs
    # ~1e-12 kernel noise) + exact fold cosine at τ=0.45 (min |cos−τ|
    # ≥ 4e-4 within cells at all 3 SFs, pinned)
    oracle=f"""
    WITH cents AS (
      -- NULL embeddings excluded (conv 22, mirrors ivf_assign's entry
      -- filter): a missing vector can neither seed nor join a cell
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell_idx, embedding AS c
      FROM embeddings WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT 16
    ),
    d AS (
      SELECT e.vec_id, e.embedding, c.cell_idx,
             list_reduce(list_transform(c.c,
                                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                         (x, y) -> x + y)
             - 2.0 * list_reduce(list_transform(list_zip(e.embedding, c.c),
                                                z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)),
                                 (x, y) -> x + y) AS d2
      FROM embeddings e CROSS JOIN cents c
      WHERE e.embedding IS NOT NULL
    ),
    assigned AS (
      SELECT vec_id, embedding, cell_idx FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell_idx) AS rn
        FROM d
      ) WHERE rn = 1
    ),
    p AS (
      SELECT y.vec_id AS ib
      FROM assigned x JOIN assigned y
        ON x.cell_idx = y.cell_idx AND x.vec_id < y.vec_id
      WHERE {_SQL_COS.format(a="x.embedding", b="y.embedding")} >= 0.45
    ),
    drp AS (SELECT DISTINCT ib FROM p)
    SELECT a.vec_id, CAST(a.cell_idx AS BIGINT) AS cell_idx,
           (drp.ib IS NULL) AS kept
    FROM assigned a LEFT JOIN drp ON a.vec_id = drp.ib
    """,
)
def q108_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic deduplication: cluster embeddings (q36's
    deterministic 16-cell quantizer), compare pairs only WITHIN a cell,
    drop any vector whose same-cell smaller-id neighbor has cosine ≥
    0.45 — the cluster-then-prune recipe that replaces all-pairs cosine
    at corpus scale (cells auto-size with n via n_centroids=None; the
    fixed-cell config here is the oracle-replayable pin)."""
    from .operators.similarity import semdedup

    return semdedup(
        _t(spark, sf_dir, "embeddings"), tau=0.45, n_centroids=16, eager=True
    )


@query(
    "q109_sequence_packing",
    # pure integer algebra end-to-end: seeded-md5 order (q101's
    # recipe), per-shard prefix sums, div/mod pack split
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             len(list_filter({_SQL_TOKENIZE}, t -> t <> '')) AS n,
             md5('shuffle-v1:' || CAST(doc_id AS VARCHAR)) AS k
      FROM documents
    ),
    s AS (
      SELECT doc_id, n, k,
             CAST(('0x' || substring(k, 1, 15)) AS BIGINT) % 8 AS shard
      FROM h
    ),
    p AS (
      SELECT doc_id, n, shard,
             CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY k, doc_id)
                  AS BIGINT) AS pos
      FROM s
    ),
    placed AS (
      SELECT doc_id, shard, pos, n,
             CAST(COALESCE(SUM(n) OVER (PARTITION BY shard ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS BIGINT) AS strt
      FROM p WHERE n > 0
    )
    SELECT shard, CAST(pack_id AS BIGINT) AS pack_id, doc_id, pos,
           GREATEST(CAST(0 AS BIGINT), pack_id * 256 - strt) AS slice_start,
           LEAST((pack_id + 1) * 256, strt + n)
             - GREATEST(pack_id * 256, strt) AS slice_len
    FROM (
      SELECT *, unnest(range(strt // 256, (strt + n - 1) // 256 + 1))
               AS pack_id
      FROM placed
    )
    """,
)
def q109_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-and-split sequence packing: docs laid end to end
    in the deterministic shard-shuffle order, cut every 256 tokens —
    emits the (doc × pack) manifest an LM trainer consumes (docs span
    packs, packs hold several docs).  Integer-deterministic throughout;
    one per-shard prefix-sum window, map-side explode, no global
    anything."""
    from .operators.sampling import sequence_packing

    return sequence_packing(
        _t(spark, sf_dir, "documents"), window=256, n_shards=8
    )


@query(
    "q110_selection_pipeline",
    # the three r4 stage oracles (q107 DSIR / q108 SemDeDup / q109
    # packing) chained verbatim — selection filters compose, the
    # packing CTEs run over the selected subset
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, unnest({_SQL_TOKENIZE}) AS token FROM documents
    ),
    t2 AS (
      SELECT doc_id, source = 'src1' AS tgt,
             CAST(('0x' || substring(md5(token), 1, 15)) AS BIGINT) % 4096
               AS bkt
      FROM tok WHERE token <> ''
    ),
    b AS (
      SELECT bkt, CAST(count(*) AS BIGINT) AS cnt_r,
             CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS cnt_t
      FROM t2 GROUP BY bkt
    ),
    tot AS (
      SELECT CAST(sum(cnt_r) + 4096 AS BIGINT) AS nr,
             CAST(sum(cnt_t) + 4096 AS BIGINT) AS nt
      FROM b
    ),
    w AS (
      SELECT bkt,
             ({_sql_flog2_fx('(cnt_t + 1)')} - {_sql_flog2_fx('(cnt_r + 1)')})
             + ({_sql_flog2_fx('nr')} - {_sql_flog2_fx('nt')}) AS ratio_fx
      FROM b CROSS JOIN tot
    ),
    dsc AS (
      SELECT doc_id, CAST(sum(ratio_fx) AS BIGINT) AS score_fx
      FROM t2 JOIN w USING (bkt) GROUP BY doc_id
    ),
    dst AS (
      SELECT CAST(sum(score_fx) AS HUGEINT) AS ssum,
             CAST(count(*) AS HUGEINT) AS d
      FROM dsc
    ),
    dsir AS (
      SELECT doc_id FROM dsc CROSS JOIN dst
      WHERE CAST(score_fx AS HUGEINT) * d > ssum
    ),
    cents AS (
      -- NULL embeddings excluded (conv 22, mirrors ivf_assign)
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell_idx, embedding AS c
      FROM embeddings WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT 16
    ),
    d AS (
      SELECT e.vec_id, e.embedding, c.cell_idx,
             list_reduce(list_transform(c.c,
                                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                         (x, y) -> x + y)
             - 2.0 * list_reduce(list_transform(list_zip(e.embedding, c.c),
                                                z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)),
                                 (x, y) -> x + y) AS d2
      FROM embeddings e CROSS JOIN cents c
      WHERE e.embedding IS NOT NULL
    ),
    assigned AS (
      SELECT vec_id, embedding, cell_idx FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell_idx) AS rn
        FROM d
      ) WHERE rn = 1
    ),
    drp AS (
      SELECT DISTINCT y.vec_id AS ib
      FROM assigned x JOIN assigned y
        ON x.cell_idx = y.cell_idx AND x.vec_id < y.vec_id
      WHERE {_SQL_COS.format(a="x.embedding", b="y.embedding")} >= 0.45
    ),
    sel AS (
      SELECT doc_id, text FROM documents
      JOIN dsir USING (doc_id)
      JOIN assigned ON doc_id = assigned.vec_id
      WHERE NOT EXISTS (SELECT 1 FROM drp WHERE drp.ib = doc_id)
    ),
    h AS (
      SELECT doc_id,
             len(list_filter({_SQL_TOKENIZE}, t -> t <> '')) AS n,
             md5('shuffle-v1:' || CAST(doc_id AS VARCHAR)) AS k
      FROM sel
    ),
    s AS (
      SELECT doc_id, n, k,
             CAST(('0x' || substring(k, 1, 15)) AS BIGINT) % 4 AS shard
      FROM h
    ),
    p AS (
      SELECT doc_id, n, shard,
             CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY k, doc_id)
                  AS BIGINT) AS pos
      FROM s
    ),
    placed AS (
      SELECT doc_id, shard, pos, n,
             CAST(COALESCE(SUM(n) OVER (PARTITION BY shard ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS BIGINT) AS strt
      FROM p WHERE n > 0
    )
    SELECT shard, CAST(pack_id AS BIGINT) AS pack_id, doc_id, pos,
           GREATEST(CAST(0 AS BIGINT), pack_id * 256 - strt) AS slice_start,
           LEAST((pack_id + 1) * 256, strt + n)
             - GREATEST(pack_id * 256, strt) AS slice_len
    FROM (
      SELECT *, unnest(range(strt // 256, (strt + n - 1) // 256 + 1))
               AS pack_id
      FROM placed
    )
    """,
)
def q110_selection_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-4 training-data SELECTION pipeline end to end:
    DSIR-select target-like docs (importance score > 0, src1 target) →
    drop semantic near-dups among their embeddings (SemDeDup kept set,
    joined on doc_id = vec_id for the embedded subset) → lay the
    survivors into LM pack manifests (concat-and-split, 256-token
    windows, 4 shards).  Every stage is the oracle-proven q107/q108/
    q109 operator; the composition stays integer/bit-exact throughout.
    Scale: stages keep their individual shapes (bucket-table broadcast,
    within-cell pairs, per-shard windows) — nothing in the composition
    adds a corpus-global structure."""
    from .operators.corpus import dsir_importance
    from .operators.sampling import sequence_packing
    from .operators.similarity import semdedup

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    imp = dsir_importance(docs, F.col("source") == "src1", n_buckets=4096)
    kept = semdedup(emb, tau=0.45, n_centroids=16, eager=True).filter(
        F.col("kept")
    )
    sel = (
        docs.join(imp.filter(F.col("selected")).select("doc_id"), "doc_id")
        .join(
            kept.select(F.col("vec_id").alias("doc_id")),
            "doc_id",
        )
        .select("doc_id", "text")
    )
    return sequence_packing(sel, window=256, n_shards=4)


@query(
    "q111_contamination_spans",
    # positional 5-grams via list_slice over the shared tokenizer;
    # islands key = pos − row_number per doc — all integers
    oracle=f"""
    WITH cw AS (
      SELECT doc_id, {_SQL_TOKENIZE} AS ws FROM documents
      WHERE source <> 'src1'
    ),
    bw AS (
      SELECT {_SQL_TOKENIZE} AS ws FROM documents WHERE source = 'src1'
    ),
    bg AS (
      SELECT DISTINCT array_to_string(list_slice(ws, i, i + 4), ' ') AS g
      FROM bw, unnest(range(1, greatest(len(ws) - 4, 1) + 1)) AS u(i)
    ),
    pos AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos,
             array_to_string(list_slice(ws, i, i + 4), ' ') AS g
      FROM cw, unnest(range(1, greatest(len(ws) - 4, 1) + 1)) AS u(i)
      WHERE len(ws) - i + 1 >= 5
    ),
    hit AS (SELECT doc_id, pos FROM pos WHERE g IN (SELECT g FROM bg)),
    isl AS (
      SELECT doc_id, pos,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
               AS grp
      FROM hit
    )
    SELECT doc_id,
           CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(pos) AS BIGINT) AS span_end,
           CAST(count(*) AS BIGINT) AS n_grams
    FROM isl GROUP BY doc_id, grp
    """,
)
def q111_contamination_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level decontamination: the maximal contiguous runs of
    contaminated 5-gram positions per corpus doc (benchmark = src1) —
    what a redaction pass consumes (cut the leaked span, keep the doc),
    where q55 only counts leaked grams per doc.  Positional grams via
    per-doc lead() windows (no HOF-over-positions trap, convention 6b),
    hashed inverted-index semi-join, then one more per-doc window for
    the gaps-and-islands merge — the islands window reuses the gram
    window's (doc) partitioning."""
    from .operators.dedup import contamination_spans

    d = _t(spark, sf_dir, "documents")
    return contamination_spans(
        d.filter(F.col("source") != "src1"),
        d.filter(F.col("source") == "src1"),
        shingle_k=5,
    )


@query(
    "q112_multimodal_resize",
    # q30's sha-derived fake-decode dims + the SAME integer aspect-fit
    # cross-multiply + a sha-of-(sha:dims) audit key — all replayable
    oracle="""
    WITH dec AS (
      SELECT doc_id AS media_id,
             sha256(coalesce(text, '')) AS sha,
             CAST(64 + CAST('0x' || substr(sha256(coalesce(text, '')), 1, 2)
                  AS BIGINT) % 192 AS BIGINT) AS w,
             CAST(64 + CAST('0x' || substr(sha256(coalesce(text, '')), 3, 2)
                  AS BIGINT) % 192 AS BIGINT) AS h
      FROM documents
    ),
    r AS (
      SELECT media_id, sha, w, h,
             CASE WHEN w <= 128 AND h <= 128 THEN w
                  WHEN w * 128 >= h * 128 THEN 128
                  ELSE GREATEST(1, (w * 128) // h) END AS out_w,
             CASE WHEN w <= 128 AND h <= 128 THEN h
                  WHEN w * 128 >= h * 128 THEN GREATEST(1, (h * 128) // w)
                  ELSE 128 END AS out_h
      FROM dec
    )
    SELECT media_id,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(out_w AS INT) AS out_w, CAST(out_h AS INT) AS out_h,
           sha256(sha || ':' || CAST(out_w AS VARCHAR) || 'x'
                  || CAST(out_h AS VARCHAR)) AS resized_sha
    FROM r
    """,
)
def q112_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal resize plan: decode (marked-fake, sha-derived dims) →
    aspect-preserving fit-within-128² via pure integer Column algebra
    (zero Python in the dimension path; resize_content is the
    Arrow-batched pixel path, pytest-exercised).  Completes the
    decode / feature-extract / frame-sample / RESIZE multimodal
    surface."""
    from .operators.multimodal import (
        attach_binary_content,
        decode_media,
        resize_dims,
    )

    media = attach_binary_content(_t(spark, sf_dir, "documents"), kind="image")
    out = resize_dims(decode_media(media), max_w=128, max_h=128)
    return out.select(
        "media_id", "width", "height", "out_w", "out_h", "resized_sha"
    )


@query(
    "q113_boilerplate_strip",
    # positional bigrams via list_slice; exact integer threshold
    # df·1000 > D·80; NOT EXISTS mirrors left_anti; string_agg ORDER BY pos
    # mirrors the array_sort rebuild
    oracle=f"""
    WITH ws AS (SELECT doc_id, {_SQL_TOKENIZE} AS w FROM documents),
    tok AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos, w[i] AS t
      FROM ws, unnest(range(1, len(w) + 1)) AS u(i)
      WHERE w[i] <> ''
    ),
    g AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos,
             array_to_string(list_slice(w, i, i + 1), ' ') AS gr
      FROM ws, unnest(range(1, greatest(len(w) - 1, 1) + 1)) AS u(i)
      WHERE len(w) - i + 1 >= 2
    ),
    dfq AS (
      SELECT gr, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      FROM g GROUP BY gr
    ),
    dq AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS D FROM tok),
    bl AS (SELECT gr FROM dfq CROSS JOIN dq WHERE df * 1000 > D * 80),
    rm AS (
      SELECT DISTINCT doc_id, pos + d AS pos
      FROM g JOIN bl USING (gr), unnest([0, 1]) AS o(d)
    ),
    kept AS (
      SELECT tok.doc_id, tok.pos, tok.t FROM tok
      WHERE NOT EXISTS (
        SELECT 1 FROM rm
        WHERE rm.doc_id = tok.doc_id AND rm.pos = tok.pos
      )
    ),
    reb AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS nk,
             string_agg(t, ' ' ORDER BY pos) AS cleaned_text
      FROM kept GROUP BY doc_id
    ),
    tot AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens
      FROM tok GROUP BY doc_id
    )
    SELECT tot.doc_id, n_tokens,
           n_tokens - COALESCE(nk, 0) AS n_removed,
           COALESCE(cleaned_text, '') AS cleaned_text
    FROM tot LEFT JOIN reb USING (doc_id)
    """,
)
def q113_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus boilerplate stripping: bigrams present in >8% of
    documents are corpus chrome; every token they cover is removed from
    every doc and the text reassembled (fully-stripped docs come back
    empty, n_removed accounts exactly).  Integer-exact threshold, no
    float anywhere; per-doc lead() windows for positional grams, a
    broadcast blacklist (small by definition), anti-join removal,
    bounded per-doc reassembly sort."""
    from .operators.corpus import strip_frequent_grams

    return strip_frequent_grams(
        _t(spark, sf_dir, "documents"), k=2, max_doc_permille=80
    )
