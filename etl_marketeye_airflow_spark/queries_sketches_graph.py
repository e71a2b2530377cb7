"""q114-q141: sketches, graph, streaming state, grouped regression

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

@query("q114_pagerank", oracle=_sql_pagerank(3))
def q114_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank (3 iterations, damping 17/20) over the
    customer→supplier purchase multigraph (orders⋈lineitem; node ids
    disambiguated as 2·custkey / 2·suppkey+1) — ranks suppliers by
    purchase in-links.  EXACT integer arithmetic end to end (float
    PageRank is partial-agg-order sensitive; truncating integer
    division is not), so ranks are bit-identical on any engine/core
    count; the one float is the final display division.  Each
    iteration: one key-partitioned join + map-side-combined groupBy,
    localCheckpoint'd so the plan stays one-iteration deep.  r12: the
    weighted-collapse variant (distinct (src,dst)+count through
    pagerank_fixed_point's weight_col — bit-identical algebra) was
    MEASURED and rejected for THIS graph: the purchase multigraph's
    multiplicity is 1.02 at sf10 (58.7M distinct pairs / 60M rows), so
    collapsing pays a full extra |E| shuffle for a 2% frame cut —
    same-window A/B parity-to-worse (probes/r12_collapse_ab.json).
    weight_col stays the right tool for genuinely multi-edged graphs."""
    from .operators.graph import pagerank_fixed_point

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = o.join(l, o["o_orderkey"] == l["l_orderkey"]).select(
        (F.col("o_custkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    return pagerank_fixed_point(edges, iters=3, eager=True)


@query(
    "q115_weighted_sample",
    # same seeded 60-bit hash, same fixed-point log2, same all-positive
    # truncating division — the selected set is bit-identical
    oracle=f"""
    WITH h AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
             CAST(('0x' || substring(
               md5('wsample-v1:' || CAST(doc_id AS VARCHAR)), 1, 10))
               AS BIGINT) + 1 AS u
      FROM documents WHERE n_chars > 0
    ),
    s AS (
      SELECT doc_id, weight,
             ((40 * 1048576 - {_sql_flog2_fx('u')}) * 1048576) // weight
               AS skey
      FROM h
    )
    SELECT doc_id, weight, skey FROM s
    ORDER BY skey ASC, doc_id ASC LIMIT 100
    """,
)
def q115_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    top-100 docs by the u^(1/w) priority key with w = n_chars — longer
    docs proportionally likelier, no RNG state, one distributed top-k
    (TakeOrderedAndProject).  The key is integer-exact fixed-point
    (minimize positive (40·2^20 − flog2(u))·2^20 div w — negative
    division would hit the truncate-vs-floor engine divergence, so the
    algebra keeps every operand positive)."""
    from .operators.sampling import weighted_sample

    return weighted_sample(
        _t(spark, sf_dir, "documents"), "n_chars", k=100
    )


@query(
    "q116_incremental_stats_merge",
    # algebraic-agg maintenance is EXACT for decimal sums — the oracle
    # is simply the direct one-pass GROUP BY over the whole table
    oracle=f"""
    SELECT l_returnflag,
           count(*)                               AS n_rows,
           {_SQL_SUM.format(c='l_quantity')}      AS sum_qty,
           min(l_quantity)                        AS min_qty,
           max(l_quantity)                        AS max_qty,
           {_sql_mean('l_quantity')}              AS avg_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q116_incremental_stats_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental stats maintenance: per-flag quantity stats computed
    as MERGE of two independently-aggregated partitions ("stored" stats
    for orders with l_orderkey % 5 != 0 plus today's batch) — the
    algebraic-aggregate pattern that lets a 100 TB daily pipeline
    update its rollups from batch-sized partials instead of rescanning
    history.  EXACT because the sums stay DECIMAL until after the merge
    (convention #1: order-free), counts/min/max are trivially
    mergeable, and the mean derives from the merged sum — the oracle is
    the direct one-pass aggregate and the gate proves merge ≡ direct
    bit-for-bit."""
    li = _t(spark, sf_dir, "lineitem")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            F.sum(F.col("l_quantity").cast(_DEC)).alias("_s"),
            F.min("l_quantity").alias("_mn"),
            F.max("l_quantity").alias("_mx"),
        )

    hist = partial(li.filter(F.col("l_orderkey") % 5 != 0))
    batch = partial(li.filter(F.col("l_orderkey") % 5 == 0))
    merged = (
        hist.unionByName(batch)
        .groupBy("l_returnflag")
        .agg(
            F.sum("_n").cast("long").alias("n_rows"),
            F.sum("_s").alias("_s2"),
            F.min("_mn").alias("min_qty"),
            F.max("_mx").alias("max_qty"),
        )
    )
    return merged.select(
        "l_returnflag",
        "n_rows",
        F.col("_s2").cast("double").alias("sum_qty"),
        "min_qty",
        "max_qty",
        (F.col("_s2").cast("double") / F.col("n_rows").cast("double")).alias(
            "avg_qty"
        ),
    )


@query(
    "q117_streaming_cdc_apply",
    # q96's changelog recipe re-keyed per CUSTOMER (seq = 4·orderkey+
    # stage keeps per-key sequence unique and totally ordered): the
    # drained upsert state must equal the batch compaction — each
    # customer's latest order change, deletes dropped.  Customer-keyed
    # so streaming state (one python call per key per batch) is bounded
    # by entity cardinality, not event volume — the realistic serving-
    # table shape.
    oracle="""
    WITH log AS (
      SELECT o_custkey AS key, o_orderkey * 4 AS seq, 'I' AS op,
             CAST(o_totalprice AS DECIMAL(12,4)) AS price FROM orders
      UNION ALL
      SELECT o_custkey, o_orderkey * 4 + 1, 'U',
             CAST(o_totalprice AS DECIMAL(12,4)) + CAST(10 AS DECIMAL(6,2))
      FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT o_custkey, o_orderkey * 4 + 2, 'D', NULL
      FROM orders WHERE o_orderkey % 7 = 0
    ),
    latest AS (
      SELECT key, op, price,
             row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
      FROM log
    )
    SELECT key, op AS last_op, CAST(price AS DOUBLE) AS price
    FROM latest WHERE rn = 1 AND op <> 'D'
    """,
)
def q117_streaming_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC apply: q96's changelog recipe, customer-keyed,
    fed as a STREAM through a keyed applyInPandasWithState upsert
    (state = highest-seq change per key — entity-cardinality bounded,
    so per-key python-call overhead never scales with event volume),
    drained AvailableNow —
    the Debezium→serving-table pattern run on the streaming engine.
    The drained state hash-matches the batch compaction oracle; exact
    decimal arithmetic happens JVM-side in the stream projection with
    one correctly-rounded double cast before the Arrow boundary."""
    import uuid

    from .streaming.stateful import cdc_upsert, compact_cdc_sink

    stream = (
        spark.readStream.schema(
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate timestamp,"
            " o_orderpriority string"
        )
        .option("pathGlobFilter", "orders.parquet")
        .parquet(sf_dir)
    )
    p0 = F.col("o_totalprice").cast("decimal(12,4)")
    log = (
        stream.select(
            F.col("o_custkey").alias("key"),
            (F.col("o_orderkey") * 4).alias("seq"),
            F.lit("I").alias("op"),
            p0.cast("double").alias("price"),
        )
        .unionByName(
            stream.filter(F.col("o_orderkey") % 2 == 0).select(
                F.col("o_custkey").alias("key"),
                (F.col("o_orderkey") * 4 + 1).alias("seq"),
                F.lit("U").alias("op"),
                (p0 + F.lit(10).cast("decimal(6,2)")).cast("double").alias("price"),
            )
        )
        .unionByName(
            stream.filter(F.col("o_orderkey") % 7 == 0).select(
                F.col("o_custkey").alias("key"),
                (F.col("o_orderkey") * 4 + 2).alias("seq"),
                F.lit("D").alias("op"),
                F.lit(None).cast("double").alias("price"),
            )
        )
    )
    name = f"q117_out_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    # State-partition count trades per-trigger state-store setup (8 is
    # right for small inputs) against per-key Python-call parallelism —
    # at sf10 the drain makes ~1.5 M per-key calls, and 8 tasks was the
    # sf10 probe's bottleneck (351.9 s, worst in the r9 subset).  Scale
    # with the input: small file → 8, big file → every core.  Partition
    # count never affects results (state is key-partitioned either way).
    import os as _os

    try:
        _sz = _os.path.getsize(_os.path.join(sf_dir, "orders.parquet"))
    except OSError:
        _sz = 0
    _parts = (
        "8"
        if _sz < (64 << 20)
        else str(spark.sparkContext.defaultParallelism)
    )
    spark.conf.set("spark.sql.shuffle.partitions", _parts)
    try:
        q = (
            cdc_upsert(log)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        drain_available_now(q)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    # Update-mode memory sink appends one row per CHANGED key PER
    # MICRO-BATCH — the raw read equals the final state only for a
    # single-batch drain.  Compact per key on the emitted seq BEFORE the
    # delete filter so the read is correct for any batch split.
    return compact_cdc_sink(spark.table(name))


@query(
    "q118_substring_dup_spans",
    # positional 10-grams via list_slice over the shared tokenizer;
    # duplicated ⇔ the gram string occurs at ≥2 (doc,pos) anywhere
    # (Spark groups the xxhash64 of the same string — same partition);
    # islands key = pos − row_number per doc — all integers
    oracle=f"""
    WITH cw AS (SELECT doc_id, {_SQL_TOKENIZE} AS ws FROM documents),
    pos AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos,
             array_to_string(list_slice(ws, i, i + 9), ' ') AS g
      FROM cw, unnest(range(1, greatest(len(ws) - 9, 1) + 1)) AS u(i)
      WHERE len(ws) - i + 1 >= 10
    ),
    dup AS (SELECT g FROM pos GROUP BY g HAVING count(*) >= 2),
    hit AS (SELECT doc_id, pos FROM pos WHERE g IN (SELECT g FROM dup)),
    isl AS (
      SELECT doc_id, pos,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
               AS grp
      FROM hit
    )
    SELECT doc_id,
           CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(pos) + 9 AS BIGINT) AS span_end,
           CAST(max(pos) + 9 - min(pos) + 1 AS BIGINT) AS span_len,
           CAST(count(*) AS BIGINT) AS n_grams
    FROM isl GROUP BY doc_id, grp
    """,
)
def q118_substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplicate DETECTION — the k-gram formulation of
    suffix-array dedup (Lee et al. 2021, arXiv 2107.06499): maximal
    token spans every 10-window of which occurs ≥2 times anywhere in
    the corpus (cross-doc or within-doc).  The k-gram form finds the
    identical removal set a suffix array would for threshold k while
    staying one vocabulary-sized hash agg + two per-doc windows — no
    global sorted structure.  Closes the last dedup-family gap
    (VERDICT r5 'What's missing' #2, upgraded from the suggested
    pytest-only to fully oracle-backed)."""
    from .operators.dedup import substring_dup_spans

    return substring_dup_spans(_t(spark, sf_dir, "documents"), min_len=10)


@query(
    "q119_substring_dedup",
    # removal twin: occurrence rank per gram (doc,pos order) — rank ≥ 2
    # ⇒ that 10-token window is stripped; coverage via a per-doc RANGE
    # window (9 PRECEDING); reassembly = ordered string_agg of kept
    # tokens.  COALESCE('') matches Spark's concat_ws on empty arrays.
    oracle=f"""
    WITH cw AS (SELECT doc_id, {_SQL_TOKENIZE} AS ws FROM documents),
    tok AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos, ws[i] AS tok
      FROM cw, unnest(range(1, len(ws) + 1)) AS u(i)
      WHERE ws[i] <> ''
    ),
    pos AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos,
             array_to_string(list_slice(ws, i, i + 9), ' ') AS g
      FROM cw, unnest(range(1, greatest(len(ws) - 9, 1) + 1)) AS u(i)
      WHERE len(ws) - i + 1 >= 10
    ),
    ranked AS (
      SELECT doc_id, pos,
             ROW_NUMBER() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn
      FROM pos
    ),
    rem AS (SELECT doc_id, pos FROM ranked WHERE rn >= 2),
    cov AS (
      SELECT t.doc_id, t.pos, t.tok,
             MAX(CASE WHEN r.pos IS NOT NULL THEN 1 ELSE 0 END) OVER (
               PARTITION BY t.doc_id ORDER BY t.pos
               RANGE BETWEEN 9 PRECEDING AND CURRENT ROW
             ) AS c
      FROM tok t LEFT JOIN rem r ON t.doc_id = r.doc_id AND t.pos = r.pos
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(c) AS BIGINT) AS n_removed,
           COALESCE(
             string_agg(CASE WHEN c = 0 THEN tok END, ' ' ORDER BY pos),
             '') AS cleaned_text
    FROM cov GROUP BY doc_id
    """,
)
def q119_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level dedup REMOVAL (Lee et al. 2021 ExactSubstr):
    every duplicated 10-token window is stripped from all occurrences
    except the globally-first (min (doc, pos) per gram — an integer
    argmin, so the kept set is fully deterministic and the oracle's
    per-gram row_number reproduces it exactly).  Survivors reassemble
    in position order; every tokenizable doc appears — empty or
    whitespace-only docs emit no row, mirrored by the oracle's
    ``tok <> ''`` filter (fully-duplicated docs
    come back empty).  Scale: one gram-hash agg + per-doc rangeBetween
    coverage window — doc-length bounded, no global structure."""
    from .operators.dedup import substring_dedup

    return substring_dedup(
        _t(spark, sf_dir, "documents"), min_len=10, eager=True
    )


@query(
    "q120_countmin_sketch",
    # The CMS counter table is a DETERMINISTIC exact object (the
    # approximation lives in how estimates READ it): portable md5 cell
    # hash → DuckDB rebuilds the identical depth×width table
    oracle=_CMS_SQL_CELLS.format(tokenize=_SQL_TOKENIZE)
    + "SELECT row, col, cnt FROM sketch",
)
def q120_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch counter table (depth=4, width=1024) over the
    corpus token stream — the bounded-memory, cell-wise-MERGEABLE
    frequency summary for vocabularies that don't fit (union across
    streams/days = add tables).  The sketch TABLE is exact and
    deterministic — engine-portable md5 cell hashing makes it fully
    oracle-replicable even though point ESTIMATES read from it are
    approximate (upgraded from pytest-only, r6).  Scale: one hash agg
    into ≤ depth·width ≈ 4k groups regardless of corpus size —
    map-side combine does nearly all the work."""
    from .operators.corpus import countmin_token_counts

    return countmin_token_counts(
        _t(spark, sf_dir, "documents"), width=1024, depth=4
    )


@query(
    "q121_countmin_estimate",
    # min over each probe token's depth cells, left-joined so a cell
    # the sketch never emitted reads 0 (absent token ⇒ estimate 0,
    # not min of nonzero collisions) — replayed cell-for-cell
    oracle=_CMS_SQL_CELLS.format(tokenize=_SQL_TOKENIZE)
    + f""",
    probes AS (
      SELECT token, CAST(i AS INT) AS row,
             CAST(concat('0x', substr(md5(
               'cms-v1:' || CAST(i AS VARCHAR) || ':' || token), 1, 15))
               AS BIGINT) % 1024 AS col
      FROM (SELECT unnest(ARRAY{list(_CMS_PROBE_TOKENS)}) AS token),
           unnest(range(0, 4)) AS u(i)
    )
    SELECT p.token AS token,
           CAST(min(coalesce(s.cnt, 0)) AS BIGINT) AS est
    FROM probes p LEFT JOIN sketch s USING (row, col)
    GROUP BY p.token
    """,
)
def q121_countmin_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min point estimates for a fixed probe set (common words,
    rare words, one absent token): min over the depth cells each token
    hashes to, with never-emitted cells reading 0 so an absent token
    estimates 0.  Overestimates by ≤ ε·N (ε ≈ e/width) with prob
    ≥ 1 − 2^-depth, never underestimates (pytest pins the bound); the
    estimate VALUES are nonetheless deterministic given the corpus, so
    the oracle replays them cell-for-cell.  Scale: probe table is
    |tokens|·depth rows — broadcast side of one join against the ≤4k
    sketch."""
    from .operators.corpus import countmin_estimate, countmin_token_counts

    sketch = countmin_token_counts(
        _t(spark, sf_dir, "documents"), width=1024, depth=4
    )
    return countmin_estimate(
        sketch, list(_CMS_PROBE_TOKENS), width=1024, depth=4
    )


@query(
    "q122_hll_registers",
    # the register table depends only on the distinct-token SET (max is
    # idempotent over duplicates) and the portable md5 cell hash —
    # DuckDB rebuilds it cell-for-cell
    oracle=_HLL_SQL_REGS.format(tokenize=_SQL_TOKENIZE)
    + "SELECT bucket, reg FROM regs",
)
def q122_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog register table (p=10, 1024 buckets) over the corpus
    token stream — the bounded-memory, MERGEABLE distinct-count summary
    (union of corpora = cell-wise max of register tables; pytest pins
    merge ≡ whole-corpus).  The table is exact and deterministic: the
    approximation lives only in what the ESTIMATE (q123) claims about
    true cardinality.  Scale: one hash agg into ≤1024 groups regardless
    of corpus size — map-side partial max does nearly all the work."""
    from .operators.corpus import hll_registers

    return hll_registers(_t(spark, sf_dir, "documents"), p=10)


@query(
    "q123_hll_estimate",
    # raw HLL: integer register sum at scale 2^51 (≤ 2^61, BIGINT-safe),
    # ONE long→double cast + ONE division of identical literals; linear-
    # counting branch: exact driver-computed m·ln(m/V) table indexed by
    # the integer V — identical doubles both engines, no libm either side
    oracle=_HLL_SQL_REGS.format(tokenize=_SQL_TOKENIZE)
    + f""",
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_filled,
             CAST(coalesce(sum(CAST(1 AS BIGINT) << (51 - reg)), 0)
                  AS BIGINT) AS s_filled
      FROM regs
    ),
    st AS (
      SELECT 1024 - n_filled AS empty_buckets,
             s_filled + (1024 - n_filled) * (CAST(1 AS BIGINT) << 51) AS s_fx
      FROM agg
    ),
    st2 AS (
      SELECT empty_buckets,
             CAST('{_HLL_ALPHA_NUM_P10!r}' AS DOUBLE)
               / CAST(s_fx AS DOUBLE) AS raw_est,
             greatest(empty_buckets, CAST(1 AS BIGINT)) AS v1
      FROM st
    )
    SELECT 1024 AS n_buckets,
           CAST(empty_buckets AS BIGINT) AS empty_buckets,
           CASE WHEN empty_buckets > 0 AND raw_est <= 2560.0
                THEN 'linear_counting' ELSE 'hll_raw' END AS method,
           CASE WHEN empty_buckets > 0 AND raw_est <= 2560.0
                THEN ({_hll_lc_sql_p10()})[CAST(v1 AS INT)]
                ELSE raw_est END AS estimate
    FROM st2
    """,
)
def q123_hll_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL cardinality estimate from the q122 registers: one row
    (n_buckets, empty_buckets, method, estimate).  Standard error ≈
    1.04/√1024 ≈ 3.3% (pytest pins the bound vs the exact distinct
    count); the VALUE is nonetheless a deterministic bit-stable
    function of the registers, so the oracle replays it exactly —
    including which correction branch fires.  Scale: the estimate reads
    a ≤1024-row table; the expensive part is q122's one agg."""
    from .operators.corpus import hll_estimate, hll_registers

    regs = hll_registers(_t(spark, sf_dir, "documents"), p=10)
    return hll_estimate(regs, p=10)


@query(
    "q124_kmv_sketch",
    # depends only on the distinct-token set (duplicates collapse before
    # the top-k) and the portable md5 hash — fully replayable
    oracle="SELECT CAST(rank AS INT) AS rank, h FROM ("
    + _KMV_SQL_SKETCH.format(tokenize=_SQL_TOKENIZE, where="", k=16)
    + ")",
)
def q124_kmv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch (k=16): the 16 smallest distinct token hashes of the
    corpus — the bounded-memory summary that supports distinct-count
    AND set-operation estimates (q125).  Scale: one vocab-sized distinct
    agg + distributed top-k (per-partition TakeOrdered, k-row merge);
    no global sort; result is k rows regardless of corpus size."""
    from .operators.corpus import kmv_sketch

    return kmv_sketch(_t(spark, sf_dir, "documents"), k=16)


@query(
    "q125_kmv_set_ops",
    # θ = min of the two inclusion bounds (2^60 when a sketch holds its
    # whole set, else max h); both sketches cut to h ≤ θ where each is a
    # complete sample; counts are exact integers over the cut, estimates
    # = count·2^60/θ (long→double casts + divisions of identical
    # operands); jaccard = inter/union of the cut sets (θ cancels)
    oracle=f"""
    WITH a AS ({_KMV_SQL_SKETCH.format(tokenize=_SQL_TOKENIZE,
                                       where="WHERE doc_id % 2 = 0", k=16)}),
    b AS ({_KMV_SQL_SKETCH.format(tokenize=_SQL_TOKENIZE,
                                  where="WHERE doc_id % 2 <> 0", k=16)}),
    ta AS (SELECT CASE WHEN count(*) < 16
                       THEN CAST(1152921504606846976 AS BIGINT)
                       ELSE max(h) END AS th FROM a),
    tb AS (SELECT CASE WHEN count(*) < 16
                       THEN CAST(1152921504606846976 AS BIGINT)
                       ELSE max(h) END AS th FROM b),
    th AS (SELECT least(ta.th, tb.th) AS theta FROM ta, tb),
    ac AS (SELECT h FROM a, th WHERE h <= theta),
    bc AS (SELECT h FROM b, th WHERE h <= theta),
    i AS (SELECT CAST(count(*) AS BIGINT) AS inter_seen
          FROM ac WHERE h IN (SELECT h FROM bc)),
    u AS (SELECT CAST(count(DISTINCT h) AS BIGINT) AS union_seen
          FROM (SELECT h FROM ac UNION ALL SELECT h FROM bc))
    SELECT theta AS theta_cut, inter_seen, union_seen,
           CAST(union_seen AS DOUBLE) * (1152921504606846976.0
             / CAST(theta AS DOUBLE)) AS union_est,
           CAST(inter_seen AS DOUBLE) * (1152921504606846976.0
             / CAST(theta AS DOUBLE)) AS intersect_est,
           CASE WHEN union_seen = 0 THEN 0.0
                ELSE CAST(inter_seen AS DOUBLE) / CAST(union_seen AS DOUBLE)
           END AS jaccard_est
    FROM th, i, u
    """,
)
def q125_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set operations between the even- and odd-doc_id
    halves of the corpus: union / intersection / Jaccard estimates from
    two k=16 KMV sketches — the cheap cross-corpus overlap measure
    (contamination triage before the exact span-level pass, q104/q111).
    Scale: each sketch is one vocab-sized agg on its half; everything
    downstream operates on ≤16-row frames."""
    from .operators.corpus import kmv_set_ops, kmv_sketch

    docs = _t(spark, sf_dir, "documents")
    a = kmv_sketch(docs.filter(F.col("doc_id") % 2 == 0), k=16)
    b = kmv_sketch(docs.filter(F.col("doc_id") % 2 != 0), k=16)
    return kmv_set_ops(a, b, k=16)


@query(
    "q126_quantile_sketch",
    # bucket index = identical bit arithmetic (bin-length bitlen, shift,
    # truncating div on positives); lo/hi/cnt are exact aggregates —
    # DuckDB rebuilds the table row-for-row
    oracle=_DYADIC_SQL_SKETCH
    + "SELECT bucket_idx, lo, hi, cnt FROM sk",
)
def q126_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dyadic quantile-sketch table (sub_bits=5 → ≤3.2% relative bucket
    width) over document lengths — the bounded-memory, cell-wise-
    MERGEABLE quantile summary (union across shards/days = sum cnt,
    min lo, max hi; pytest pins merge ≡ whole-corpus).  The table is
    exact and deterministic; the approximation lives only in what the
    ESTIMATES (q127) claim about true order statistics.  Scale: one
    hash agg into ≤ (64−s)·2^s ≈ 2k groups regardless of row count —
    map-side partial sum/min/max does nearly all the work."""
    from .operators.corpus import dyadic_histogram

    docs = _t(spark, sf_dir, "documents").select("n_chars")
    return dyadic_histogram(docs, "n_chars", sub_bits=5)


@query(
    "q127_quantile_estimate",
    # rank r = ceil(q·N) as (N·num + den − 1) div den; first bucket with
    # cumulative count ≥ r provably CONTAINS the true rank-r value; the
    # midpoint estimate is all-integer — replayed exactly
    oracle=_DYADIC_SQL_SKETCH
    + """,
    n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM sk),
    cum AS (
      SELECT bucket_idx, lo, hi,
             CAST(sum(cnt) OVER (ORDER BY bucket_idx) AS BIGINT) AS cum
      FROM sk
    ),
    q AS (SELECT * FROM (VALUES ('p25', 1, 4), ('p50', 1, 2),
                                ('p90', 9, 10), ('p99', 99, 100))
          t(q_label, num, den)),
    t AS (
      SELECT q_label,
             CAST((n.n * num + den - 1) // den AS BIGINT) AS target_rank
      FROM q, n
    ),
    hit AS (
      SELECT t.q_label, t.target_rank,
             min(c.bucket_idx) AS bucket_idx
      FROM t JOIN cum c ON c.cum >= t.target_rank
      GROUP BY t.q_label, t.target_rank
    )
    SELECT h.q_label AS q_label, h.target_rank AS target_rank,
           h.bucket_idx AS bucket_idx, c.lo AS lo, c.hi AS hi,
           CAST((c.lo + c.hi) // 2 AS BIGINT) AS est
    FROM hit h JOIN cum c USING (bucket_idx)
    """,
)
def q127_quantile_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimates (p25/p50/p90/p99 of document length) from the
    q126 sketch: rank r = ceil(q·N), first bucket whose cumulative count
    reaches r.  That bucket provably contains the true rank-r value, so
    lo ≤ q_true ≤ hi and est = (lo+hi) div 2 is off by ≤ 2^−5 relative
    (pytest pins the bracket + bound vs exact order statistics); the
    VALUES are deterministic integer functions of the sketch, so the
    oracle replays them exactly.  Scale: the walk reads the ≤2k-row
    sketch; its window orders that tiny table's single bucket axis —
    never a data-sized global window; the expensive part is q126's one
    agg."""
    from .operators.corpus import dyadic_histogram, dyadic_quantile_estimate

    docs = _t(spark, sf_dir, "documents").select("n_chars")
    sk = dyadic_histogram(docs, "n_chars", sub_bits=5)
    return dyadic_quantile_estimate(sk)



@query(
    "q128_triangle_counts",
    # per-node triangle counts are orientation-independent, so the oracle
    # enumerates canonically by partkey (a<b<c) while Spark enumerates by
    # degree rank — same triangle set, same counts.  Edges: parts
    # co-ordered with l_quantity > 40 on both sides, distinct u<v.
    oracle="""
    WITH q AS (
      SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity > 40
    ),
    e AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM q a JOIN q b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    nodes AS (
      SELECT DISTINCT node FROM (
        SELECT u AS node FROM e UNION ALL SELECT v FROM e
      )
    ),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1 JOIN e e2 ON e1.v = e2.u
                JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    corners AS (
      SELECT node, CAST(count(*) AS BIGINT) AS t FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY node
    )
    SELECT n.node AS node, CAST(coalesce(c.t, 0) AS BIGINT) AS tri_cnt
    FROM nodes n LEFT JOIN corners c USING (node)
    """,
)
def q128_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-node triangle counts over the part co-purchase graph
    (parts co-ordered with l_quantity > 40 on both lineitems; distinct
    canonical edges) — degree-ordered orientation so every triangle
    materializes once at its lowest-(deg,id) corner and the wedge
    self-join is bounded by Σ outdeg² = O(m^1.5) on ANY graph (the
    hub-skew killer; a naive adjacency join is Σ deg² and explodes on
    hot parts).  Edge build is a per-order self-join — order size is
    bounded, so it stays linear in lineitem.  Scale: two node-keyed
    hash joins + one explode-3 groupBy; no window, no global sort."""
    from .operators.graph import triangle_counts

    return triangle_counts(_copurchase_edges(spark, sf_dir), "u", "v")


@query(
    "q129_cohort_retention",
    # integer day index = epoch_us div 86400e6 (exact integer both
    # engines — the ts_us contract); cohort = each user's first active
    # day; retention per-mille = truncating integer division
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id,
             epoch_us(ts) // 86400000000 AS day
      FROM events
    ),
    c AS (
      SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY user_id
    ),
    a AS (
      SELECT c.cohort_day, ud.day - c.cohort_day AS day_offset,
             CAST(count(*) AS BIGINT) AS active_users
      FROM ud JOIN c USING (user_id)
      GROUP BY 1, 2
    ),
    s AS (
      SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_size
      FROM c GROUP BY 1
    )
    SELECT CAST(a.cohort_day AS BIGINT) AS cohort_day,
           CAST(a.day_offset AS BIGINT) AS day_offset,
           s.cohort_size AS cohort_size,
           a.active_users AS active_users,
           CAST((1000 * a.active_users) // s.cohort_size AS BIGINT)
             AS retention_pm
    FROM a JOIN s USING (cohort_day)
    """,
)
def q129_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix over the event stream: users grouped by
    first-active day, then for every (cohort_day, day_offset) the
    distinct active users and the retention per-mille (exact truncating
    integer — float ratios are engine-rounding bait).  The product-
    analytics staple the reference's daily batch never had.  Scale:
    distinct (user, day) reduction first (collapses the raw stream),
    then a user-keyed min + rejoin that REUSES the user partitioning,
    then a groupBy on the small (cohort × offset) grid; cohort sizes are
    a ≤#days-row broadcast.  No windows, no global sorts."""
    from .sources.tables import load_events

    ev = load_events(spark, sf_dir)
    ud = (
        ev.select(
            "user_id", F.expr("ts_us div 86400000000").alias("day")
        )
        .distinct()
    )
    cohort = ud.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    act = (
        ud.join(cohort, "user_id")
        .groupBy(
            "cohort_day",
            (F.col("day") - F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("active_users"))
    )
    sizes = cohort.groupBy("cohort_day").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    return act.join(F.broadcast(sizes), "cohort_day").select(
        F.col("cohort_day").cast("long"),
        F.col("day_offset").cast("long"),
        "cohort_size",
        "active_users",
        F.expr("(1000 * active_users) div cohort_size")
        .cast("long")
        .alias("retention_pm"),
    )


@query(
    "q130_pmi_bigrams",
    # pmi_fx = fx(c_ab) + 2·fx(N) − fx(B) − fx(c_a) − fx(c_b): the
    # fixed-point dyadic log2 decomposition IS the score definition
    # (identical integer arithmetic both engines); top-50 under the
    # total order (pmi_fx DESC, bigram ASC) is a deterministic cut
    oracle=f"""
    WITH ws0 AS (SELECT {_SQL_TOKENIZE} AS w0 FROM documents),
    ws AS (SELECT list_filter(w0, t -> t <> '') AS w FROM ws0),
    uni AS (
      SELECT t, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(w) AS t FROM ws) GROUP BY t
    ),
    bg AS (
      SELECT w[i] AS t1, w[i + 1] AS t2
      FROM ws, unnest(range(1, len(w))) AS u(i)
    ),
    bc AS (
      SELECT t1, t2, CAST(count(*) AS BIGINT) AS c_ab
      FROM bg GROUP BY t1, t2
    ),
    nt AS (SELECT CAST(sum(c) AS BIGINT) AS n_tokens FROM uni),
    bt AS (SELECT CAST(sum(c_ab) AS BIGINT) AS n_bigrams FROM bc),
    j AS (
      SELECT bc.t1, bc.t2, bc.c_ab, ua.c AS c_a, ub.c AS c_b,
             nt.n_tokens, bt.n_bigrams
      FROM bc JOIN uni ua ON bc.t1 = ua.t
              JOIN uni ub ON bc.t2 = ub.t, nt, bt
      WHERE bc.c_ab >= 5
    ),
    s AS (
      SELECT t1 || ' ' || t2 AS bigram, c_ab, c_a, c_b,
             CAST({_sql_flog2_fx('c_ab')}
                  + 2 * {_sql_flog2_fx('n_tokens')}
                  - {_sql_flog2_fx('n_bigrams')}
                  - {_sql_flog2_fx('c_a')}
                  - {_sql_flog2_fx('c_b')} AS BIGINT) AS pmi_fx
      FROM j
    )
    SELECT bigram, c_ab, c_a, c_b, pmi_fx,
           CAST(pmi_fx AS DOUBLE) / 1048576.0 AS pmi
    FROM s ORDER BY pmi_fx DESC, bigram ASC LIMIT 50
    """,
)
def q130_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI-ranked bigram collocations (word2phrase-style phrase mining)
    over the corpus: top-50 bigrams with count ≥ 5 by fixed-point
    dyadic-log2 PMI — the multiword-unit discovery pass before
    tokenizer training.  Scale: one unigram agg + one bigram agg (both
    map-side combined), token-keyed joins of the count-filtered bigram
    table, 1-row N/B broadcasts, distributed top-k.  See
    operators/corpus.py:pmi_bigrams for the bit-stability contract."""
    from .operators.corpus import pmi_bigrams

    return pmi_bigrams(
        _t(spark, sf_dir, "documents"), min_count=5, topk=50
    )


@query(
    "q131_skyline_pareto",
    # dominance is pure comparison on raw column values (no arithmetic)
    # — the NOT EXISTS scan verifies the distributed prefix-min answer
    # row-for-row, ties on both criteria included
    oracle="""
    WITH p AS (
      SELECT p_partkey, p_retailprice, p_size FROM part
      WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
    )
    SELECT a.p_partkey AS p_partkey,
           a.p_retailprice AS p_retailprice,
           a.p_size AS p_size
    FROM p a WHERE NOT EXISTS (
      SELECT 1 FROM p b
      WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
        AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
    )
    """,
)
def q131_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto front of parts: cheapest-for-their-size (minimize
    p_retailprice, maximize p_size) — the classic tradeoff operator
    (Börzsönyi et al. ICDE 2001).  The textbook plan is a global sort +
    running min (single-partition window — the scale-killer); this runs
    the two-pass distributed prefix-min instead: per-x reduction, range
    partition on x, per-partition minima to the driver (numPartitions
    rows, config-bounded), broadcast offsets + bounded local windows.
    See operators/skyline.py."""
    from .operators.skyline import skyline_2d

    p = _t(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    return skyline_2d(
        p, F.col("p_retailprice"), -F.col("p_size")
    )


@query(
    "q132_rrf_hybrid_fusion",
    # both input rankings are bit-stable (bm25: integer rationals +
    # fixed-order COALESCE chain; cosine: identical left-fold dot) and
    # totally ordered (score desc, id asc), so ranks replay exactly;
    # RRF contribution = 2^20 div (60 + rank) — truncating integer div
    oracle=f"""
    WITH bm AS (
      SELECT doc_id, score FROM ({_sql_bm25(_BM25_TERMS)})
    ),
    ra AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC)
                  AS BIGINT) AS rank_bm25
      FROM bm
    ),
    qv AS (SELECT embedding AS qv FROM embeddings
           WHERE vec_id = 0 AND {_sql_nonzero('embedding')}),
    cs AS (
      SELECT e.vec_id,
             {_SQL_COS.format(a="e.embedding", b="q.qv")} AS c
      FROM embeddings e, qv q
      WHERE {_sql_nonzero('e.embedding')}
      ORDER BY c DESC, vec_id LIMIT 20
    ),
    rb AS (
      SELECT vec_id AS doc_id,
             CAST(row_number() OVER (ORDER BY c DESC, vec_id ASC)
                  AS BIGINT) AS rank_cos
      FROM cs
    ),
    j AS (
      SELECT COALESCE(ra.doc_id, rb.doc_id) AS doc_id,
             ra.rank_bm25, rb.rank_cos
      FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
    )
    SELECT doc_id, rank_bm25, rank_cos,
           CAST(COALESCE(1048576 // (60 + rank_bm25), 0)
                + COALESCE(1048576 // (60 + rank_cos), 0)
                AS BIGINT) AS rrf_fx,
           CAST(COALESCE(1048576 // (60 + rank_bm25), 0)
                + COALESCE(1048576 // (60 + rank_cos), 0)
                AS DOUBLE) / 1048576.0 AS rrf
    FROM j
    """,
)
def q132_rrf_hybrid_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of sparse and dense retrieval (Cormack et
    al. SIGIR 2009; the standard hybrid-search combiner): BM25 top-20
    (q106's scorer) ⊕ exact-cosine top-20 vs the vec_id=0 query
    (q24's scorer), fused by Σ 2^20 div (60 + rank) — integer
    fixed-point, so the fused scores are bit-stable where float
    1/(60+r) sums would be association-order bait.  Missing-from-one-
    list docs contribute 0 from that list.  Scale: both inputs are
    distributed top-k's; everything downstream (rank windows, full
    outer join, fusion) runs on ≤20-row frames — the windows order a
    bounded frame, never data.  Output: the fused union list."""
    from pyspark.sql import Window as W

    from .operators.corpus import bm25_topk
    from .operators.similarity import cosine, nonzero_vec

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")

    a = bm25_topk(docs, list(_BM25_TERMS), k=20, eager=True)
    ra = a.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.desc("score"), F.asc("doc_id")))
        .cast("long")
        .alias("rank_bm25"),
    )
    qv = _query_vec(emb)  # NULL/missing-safe shared fetch (guard doc there)
    if any(float(x) != 0.0 for x in qv):
        q = F.array(*[F.lit(float(x)) for x in qv])
        cs = (
            emb.filter(nonzero_vec(F.col("embedding")))
            .select("vec_id", cosine(F.col("embedding"), q).alias("_c"))
            .orderBy(F.desc("_c"), "vec_id")
            .limit(20)
            .localCheckpoint(eager=True)  # freeze the top-k before ranking
        )
    else:  # zero/missing query → fusion degrades to bm25-only
        cs = emb.filter(F.lit(False)).select(
            "vec_id", F.lit(None).cast("double").alias("_c")
        )
    rb = cs.select(
        F.col("vec_id").alias("doc_id"),
        F.row_number()
        .over(W.orderBy(F.desc("_c"), F.asc("vec_id")))
        .cast("long")
        .alias("rank_cos"),
    )
    j = ra.join(rb, "doc_id", "full_outer")
    fx = F.coalesce(
        F.expr("1048576 div (60 + rank_bm25)"), F.lit(0).cast("long")
    ) + F.coalesce(
        F.expr("1048576 div (60 + rank_cos)"), F.lit(0).cast("long")
    )
    return j.select(
        "doc_id",
        "rank_bm25",
        "rank_cos",
        fx.cast("long").alias("rrf_fx"),
        (fx.cast("double") / F.lit(1048576.0)).alias("rrf"),
    )


@query(
    "q133_stream_static_join",
    # stateless append-mode stream-static inner join: every stream row
    # is enriched and emitted EXACTLY ONCE regardless of micro-batch
    # layout (convention-9 exempt class — no per-batch snapshots, no
    # state), so the drained sink equals the batch join
    oracle="""
    SELECT e.event_id AS event_id, e.user_id AS user_id,
           epoch_us(e.ts) AS ts_us, e.value AS value,
           c.c_mktsegment AS c_mktsegment
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.event_type = 'purchase'
    """,
)
def q133_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join — the remaining Structured
    Streaming join shape next to stream-stream (q63): the purchase
    stream inner-joined per micro-batch to the static customer
    dimension (broadcast — the dim rescans per batch, so keeping it
    broadcast-shaped is the 100 TB posture), appended to a memory sink
    under Trigger.AvailableNow.  Stateless: no watermark, no state
    store; each stream row emits exactly once, so a raw sink read is
    correct for ANY batch count (unlike update-mode aggregations —
    convention 9).  The oracle is the batch join."""
    import uuid

    from .sources.tables import load_events_stream
    from .streaming.ingest import drain_available_now

    stream = load_events_stream(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = stream.join(
        F.broadcast(cust), stream["user_id"] == cust["c_custkey"]
    ).select("event_id", "user_id", "ts_us", "value", "c_mktsegment")
    name = f"q133_out_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain_available_now(q)
    return spark.table(name)


@query(
    "q134_market_basket_pairs",
    # support counts are exact integers; lift is ONE double expression
    # over exact integer operands with identical op order both engines;
    # top-25 under (c_ab DESC, pa, pb) is a deterministic cut
    oracle="""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    ic AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS c
      FROM items GROUP BY 1
    ),
    freq AS (SELECT l_partkey, c FROM ic WHERE c >= 3),
    fitems AS (
      SELECT i.l_orderkey, i.l_partkey
      FROM items i JOIN freq f USING (l_partkey)
    ),
    n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
          FROM items),
    pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb,
             CAST(count(*) AS BIGINT) AS c_ab
      FROM fitems a JOIN fitems b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT p.pa, p.pb, p.c_ab, fa.c AS c_a, fb.c AS c_b, n.n_orders
      FROM pairs p JOIN freq fa ON p.pa = fa.l_partkey
                   JOIN freq fb ON p.pb = fb.l_partkey, n
      WHERE p.c_ab >= 3
    )
    SELECT pa, pb, c_ab, c_a, c_b, n_orders,
           (CAST(n_orders AS DOUBLE) * CAST(c_ab AS DOUBLE))
           / (CAST(c_a AS DOUBLE) * CAST(c_b AS DOUBLE)) AS lift
    FROM scored
    ORDER BY c_ab DESC, pa ASC, pb ASC LIMIT 25
    """,
)
def q134_market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket frequent-pair mining with apriori pruning (Agrawal
    & Srikant VLDB'94): top-25 co-ordered part pairs with support ≥ 3,
    scored by lift = N·c_ab/(c_a·c_b).  The apriori step is the scale
    argument: items are filtered to frequent ones BEFORE the per-order
    pair join (every frequent pair has frequent members — lossless),
    so the quadratic-per-order pair build runs only over survivors and
    per-order item count bounds it linearly in lineitem.  Lift is one
    double expression over exact integer operands (identical op order
    both engines).  Scale: distinct reduction → item-count agg →
    semi-join prune → bounded per-order self-join → pair agg →
    distributed top-k.  No windows, no global sorts."""
    items = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    ic = items.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    freq = ic.filter(F.col("c") >= 3)
    fitems = items.join(freq.select("l_partkey"), "l_partkey")
    n = items.agg(
        F.countDistinct("l_orderkey").cast("long").alias("n_orders")
    )
    a = fitems.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("pa")
    )
    b = fitems.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("pb")
    )
    pairs = (
        a.join(b, "_ok")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
        .filter(F.col("c_ab") >= 3)
    )
    fa = freq.select(F.col("l_partkey").alias("pa"), F.col("c").alias("c_a"))
    fb = freq.select(F.col("l_partkey").alias("pb"), F.col("c").alias("c_b"))
    scored = (
        pairs.join(fa, "pa")
        .join(fb, "pb")
        .crossJoin(F.broadcast(n))
    )
    return (
        scored.select(
            "pa", "pb", "c_ab", "c_a", "c_b", "n_orders",
            (
                (F.col("n_orders").cast("double") * F.col("c_ab").cast("double"))
                / (F.col("c_a").cast("double") * F.col("c_b").cast("double"))
            ).alias("lift"),
        )
        .orderBy(F.desc("c_ab"), F.asc("pa"), F.asc("pb"))
        .limit(25)
    )


@query(
    "q135_grouped_quantiles",
    # same bucket algebra as q126/q127 (one SQL generator), partitioned
    # by lang: per-group ranks, cumulative walk, and midpoints are all
    # integers — replayed exactly
    oracle=_sql_dyadic_sketch(["lang"])
    + """,
    n AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS n FROM sk GROUP BY lang),
    cum AS (
      SELECT lang, bucket_idx, lo, hi,
             CAST(sum(cnt) OVER (PARTITION BY lang ORDER BY bucket_idx)
                  AS BIGINT) AS cum
      FROM sk
    ),
    q AS (SELECT * FROM (VALUES ('p25', 1, 4), ('p50', 1, 2),
                                ('p90', 9, 10), ('p99', 99, 100))
          t(q_label, num, den)),
    t AS (
      SELECT n.lang, q_label,
             CAST((n.n * num + den - 1) // den AS BIGINT) AS target_rank
      FROM q, n
    ),
    hit AS (
      SELECT t.lang, t.q_label, t.target_rank,
             min(c.bucket_idx) AS bucket_idx
      FROM t JOIN cum c
        ON c.lang = t.lang AND c.cum >= t.target_rank
      GROUP BY 1, 2, 3
    )
    SELECT h.lang AS lang, h.q_label AS q_label,
           h.target_rank AS target_rank, h.bucket_idx AS bucket_idx,
           c.lo AS lo, c.hi AS hi,
           CAST((c.lo + c.hi) // 2 AS BIGINT) AS est
    FROM hit h JOIN cum c
      ON c.lang = h.lang AND c.bucket_idx = h.bucket_idx
    """,
)
def q135_grouped_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document-length quantiles from ONE grouped dyadic
    sketch (p25/p50/p90/p99 per lang) — the grouped form of q126/q127:
    the single hash agg gains a group key (≤2k buckets × #groups), the
    quantile walk partitions by group, and grouped targets join the
    cumulative table on the group key (keyed hash join — never a
    broadcast of data-sized state).  Same bracket guarantee per group.
    The per-group percentile dashboard every corpus-curation pipeline
    wants, at sketch cost."""
    from .operators.corpus import dyadic_histogram, dyadic_quantile_estimate

    docs = _t(spark, sf_dir, "documents").select("lang", "n_chars")
    sk = dyadic_histogram(
        docs, "n_chars", sub_bits=5, group_cols=["lang"]
    )
    return dyadic_quantile_estimate(sk, group_cols=["lang"])


@query(
    "q136_streaming_quantile_sketch",
    # drained streaming sketch ≡ the batch sketch: the update-mode sink
    # is compacted per bucket with cell-wise monotone aggregates
    # (min lo / max hi / max cnt — convention 9) before comparison
    oracle=_DYADIC_SQL_SKETCH + "SELECT bucket_idx, lo, hi, cnt FROM sk",
)
def q136_streaming_quantile_sketch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The dyadic quantile sketch AS A STREAM: documents arrive as a
    file stream, bucket indices are the same bit arithmetic (one shared
    operator with q126), and the sketch accumulates as an update-mode
    stateful aggregation — state is the ≤2k-bucket table itself, so
    state size is bounded by the sketch, not the stream.  The sink read
    is compacted per bucket with cell-wise MONOTONE aggregates (min lo,
    max hi, max cnt — convention 9: update mode emits one row per
    changed bucket per micro-batch; pinned by a 2-batch pytest), after
    which the drained result equals the batch sketch exactly — that
    equality is the oracle.  This is the mergeable-sketch contract in
    streaming form: per-day batch sketches and a live stream sketch
    compose interchangeably."""
    import uuid

    from .operators.corpus import dyadic_histogram
    from .sources.tables import load_documents_stream
    from .streaming.ingest import drain_available_now
    from .streaming.stateful import compact_sketch_sink

    stream = load_documents_stream(spark, sf_dir)
    # the operator body is pure groupBy/agg — it compiles unchanged on a
    # streaming DataFrame, so the stream sketch IS q126's operator
    sketch = dyadic_histogram(
        stream.select("n_chars"), "n_chars", sub_bits=5
    )
    name = f"q136_out_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            sketch.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        drain_available_now(q)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return compact_sketch_sink(spark.table(name))


@query(
    "q137_clustering_coefficient",
    # same canonical triangle enumeration as q128 plus the exact degree;
    # lcc_ppm is truncating-integer parts-per-million, lcc one double
    # division of identical operands
    oracle="""
    WITH q AS (
      SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity > 40
    ),
    e AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM q a JOIN q b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
        SELECT u AS node FROM e UNION ALL SELECT v FROM e
      ) GROUP BY node
    ),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1 JOIN e e2 ON e1.v = e2.u
                JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    corners AS (
      SELECT node, CAST(count(*) AS BIGINT) AS t FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY node
    ),
    j AS (
      SELECT d.node, d.deg, CAST(coalesce(c.t, 0) AS BIGINT) AS tri_cnt
      FROM deg d LEFT JOIN corners c USING (node)
    )
    SELECT node, deg, tri_cnt,
           CAST(CASE WHEN deg >= 2
                THEN (2 * 1000000 * tri_cnt) // (deg * (deg - 1))
                ELSE 0 END AS BIGINT) AS lcc_ppm,
           CASE WHEN deg >= 2
                THEN (2.0 * CAST(tri_cnt AS DOUBLE))
                     / CAST(deg * (deg - 1) AS DOUBLE)
                ELSE 0.0 END AS lcc
    FROM j
    """,
)
def q137_clustering_coefficient(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact local clustering coefficient over the q128 co-purchase
    graph: 2·tri/(deg·(deg−1)) per part — how clique-like each part's
    co-purchase neighborhood is.  Exact truncating-integer ppm plus one
    display double of identical operands; triangle_counts' scale shape
    plus one projection."""
    from .operators.graph import clustering_coefficient

    return clustering_coefficient(
        _copurchase_edges(spark, sf_dir), "u", "v"
    )


@query(
    "q138_stratified_weighted_sample",
    # identical seeded 60→40-bit draw, identical fixed-point skey
    # (q115's algebra), cut by a per-source rank window — replayed with
    # the same PARTITION BY row_number
    oracle=f"""
    WITH h AS (
      SELECT source, doc_id, CAST(n_chars AS BIGINT) AS weight,
             CAST(('0x' || substring(
               md5('wsample-v1:' || CAST(doc_id AS VARCHAR)), 1, 10))
               AS BIGINT) + 1 AS u
      FROM documents WHERE n_chars > 0
    ),
    s AS (
      SELECT source, doc_id, weight,
             ((40 * 1048576 - {_sql_flog2_fx('u')}) * 1048576) // weight
               AS skey
      FROM h
    ),
    r AS (
      SELECT source, doc_id, weight, skey,
             row_number() OVER (PARTITION BY source
                                ORDER BY skey ASC, doc_id ASC) AS rn
      FROM s
    )
    SELECT source, doc_id, weight, skey FROM r WHERE rn <= 20
    """,
)
def q138_stratified_weighted_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Balanced per-stratum weighted sampling: 20 docs PER SOURCE by
    the A-ES priority key (q115's bit-identical integer algebra) —
    the corpus-mixing draw that keeps every stratum represented
    regardless of stratum size skew.  Scale: the draw is a pure map;
    the cut is a rank window partitioned by source — each stratum
    sorts once, never a global sort (the q15 top-k-per-group shape)."""
    from .operators.sampling import weighted_sample

    return weighted_sample(
        _t(spark, sf_dir, "documents"),
        "n_chars",
        k=20,
        group_col="source",
    )


@query(
    "q139_ema_fold",
    # identical ordered left fold both engines: list_sort of (ts_us,
    # event_id, cents) structs, first element as init, then
    # v' = (7v + c·2^20) >> 3 — all-positive integer ops (the >> form
    # avoids the Spark-truncates vs DuckDB-floors negative-div trap);
    # cents = floor(value·100) (floor is IEEE-exact; a bare double→int
    # cast ROUNDS on DuckDB but truncates on Spark)
    oracle="""
    WITH c AS (
      SELECT user_id, epoch_us(ts) AS ts_us, event_id,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    l AS (
      SELECT user_id,
             list_sort(list({'ts_us': ts_us, 'event_id': event_id,
                             'cents': cents})) AS lst
      FROM c GROUP BY user_id
    ),
    f AS (
      SELECT user_id, CAST(len(lst) AS BIGINT) AS n_events,
             CAST(list_reduce(
               list_transform(lst, x -> x.cents * 1048576),
               (acc, x) -> (7 * acc + x) >> 3
             ) AS BIGINT) AS ema_fx
      FROM l
    )
    SELECT user_id, n_events, ema_fx,
           CAST(ema_fx AS DOUBLE) / 104857600.0 AS ema
    FROM f
    """,
)
def q139_ema_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential moving average of purchase value per user — the
    ordered per-key RECURRENCE no window function expresses (each state
    depends on the previous state, not on a frame aggregate), run as an
    event-time-ordered fold: v' = (7·v + cents·2^20) div 8
    (α = 1/8, fixed point 2^20).  The all-positive shift form sidesteps
    the negative-division engine divergence, and both engines execute
    the IDENTICAL fold order ((ts_us, event_id) is a total order), so
    ema_fx is bit-identical.

    Scale shape (r11, replacing the collect_list fold): shuffle on
    user, partition-local sort (spills gracefully), and an
    Arrow-batched STREAMING fold with O(1) state per key
    (operators/recurrence.py:ema_fixed_point) — no per-key array ever
    materializes, so per-user event count no longer bounds executor
    memory (the r10 verdict's last known-limit on this query)."""
    from .operators.recurrence import ema_fixed_point
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
    folded = ema_fixed_point(
        c, "user_id", ["ts_us", "event_id"], "cents",
        mult=7, shift=3, fx_bits=20,
    )
    return folded.select(
        "user_id",
        "n_events",
        "ema_fx",
        (F.col("ema_fx").cast("double") / F.lit(104857600.0)).alias("ema"),
    )


@query(
    "q140_grouped_ols_trend",
    # identical exact integer inputs (epoch-day x via epoch_us div,
    # cent y via floor — never a bare double→int cast) and identical
    # decimal(38,0) normal-equation algebra; the two display doubles
    # are one division each of identical operands.  The >2^53 decimal
    # operands convert via VARCHAR (conv 16): DuckDB's direct
    # decimal→double DOUBLE-ROUNDS (hugeint halves) and differs from
    # Spark's correctly-rounded BigDecimal.doubleValue in the last bit
    # (2 of 1494 rows, r6 driver red); strtod on the exact digit
    # string is correctly rounded, matching Spark bit-for-bit.
    # The exact num/den PAYLOAD columns ship as digit strings (conv 19).
    oracle=_sql_str_out("""
    WITH o AS (
      SELECT o_custkey,
             CAST(date_diff('day', DATE '1970-01-01',
                            CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS y
      FROM orders
    ),
    a AS (
      SELECT o_custkey,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
                  AS DECIMAL(38,0)) AS sxx,
             CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
                  AS DECIMAL(38,0)) AS sxy
      FROM o GROUP BY o_custkey HAVING count(*) >= 3
    ),
    d AS (
      SELECT o_custkey, n,
             CAST(CAST(n AS DECIMAL(19,0)) * sxy
                  - CAST(sx AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0))
                  AS DECIMAL(38,0)) AS slope_num,
             CAST(CAST(n AS DECIMAL(19,0)) * sxx
                  - CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0))
                  AS DECIMAL(38,0)) AS slope_den,
             CAST(CAST(sy AS DECIMAL(19,0)) * sxx
                  - CAST(sx AS DECIMAL(19,0)) * sxy
                  AS DECIMAL(38,0)) AS icept_num
      FROM a
    )
    SELECT o_custkey, n, slope_num, slope_den,
           CASE WHEN slope_den <> 0
                THEN CAST(CAST(slope_num AS VARCHAR) AS DOUBLE)
                     / CAST(CAST(slope_den AS VARCHAR) AS DOUBLE)
           END AS slope,
           CASE WHEN slope_den <> 0
                THEN CAST(CAST(icept_num AS VARCHAR) AS DOUBLE)
                     / CAST(CAST(slope_den AS VARCHAR) AS DOUBLE)
           END AS intercept
    FROM d
    """, ("slope_num", "slope_den")),
)
def q140_grouped_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer spend-trend OLS fit: cents of o_totalprice regressed
    on the epoch-day of the order — the per-key drift feature (is this
    customer spending more or less over time?) a churn/LTV pipeline
    computes for every key.  Exact decimal(38,0) normal equations from
    integer (epoch-day, cent) inputs; the closed-form-per-group shape
    the reference's group stats use, one order up (operators/regress.py
    — vs reference dags/marketeye_etl_dag.py per-group mean/std).

    Scale: ONE map-side-combined groupBy over orders, per-row algebra on
    the group frame after — no windows, no second pass; decimal sums
    merge exactly across partials."""
    from .operators.regress import grouped_ols

    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        # o_orderdate is parquet TIMESTAMP_NTZ: NTZ→DATE drops the time
        # part with NO session-TZ involvement (a plain driver session in
        # any TZ reads the same integer day — conv 5)
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        )
        .cast("long")
        .alias("x"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("y"),
    )
    return _str_decimals(grouped_ols(o, ["o_custkey"], "x", "y", min_n=3))


@query(
    "q141_grouped_pearson",
    # same suff-stat algebra; corr = num / (sqrt(vx)·sqrt(vy)) with the
    # identical operand order — sqrt is correctly rounded on both
    # engines.  >2^53 decimal→double via VARCHAR roundtrip (conv 16 —
    # DuckDB's direct cast double-rounds; see q140); exact payload
    # columns ship as digit strings (conv 19)
    oracle=_sql_str_out("""
    WITH o AS (
      SELECT l_suppkey,
             CAST(floor(l_quantity) AS BIGINT) AS x,
             CAST(floor(l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem
    ),
    a AS (
      SELECT l_suppkey,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
                  AS DECIMAL(38,0)) AS sxx,
             CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
                  AS DECIMAL(38,0)) AS sxy,
             CAST(sum(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
                  AS DECIMAL(38,0)) AS syy
      FROM o GROUP BY l_suppkey HAVING count(*) >= 2
    ),
    d AS (
      SELECT l_suppkey, n,
             CAST(CAST(n AS DECIMAL(19,0)) * sxy
                  - CAST(sx AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0))
                  AS DECIMAL(38,0)) AS corr_num,
             CAST(CAST(n AS DECIMAL(19,0)) * sxx
                  - CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0))
                  AS DECIMAL(38,0)) AS var_x_n,
             CAST(CAST(n AS DECIMAL(19,0)) * syy
                  - CAST(sy AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0))
                  AS DECIMAL(38,0)) AS var_y_n
      FROM a
    )
    SELECT l_suppkey, n, corr_num, var_x_n, var_y_n,
           CASE WHEN var_x_n > 0 AND var_y_n > 0
                THEN CAST(CAST(corr_num AS VARCHAR) AS DOUBLE)
                     / (sqrt(CAST(CAST(var_x_n AS VARCHAR) AS DOUBLE))
                        * sqrt(CAST(CAST(var_y_n AS VARCHAR) AS DOUBLE)))
           END AS corr
    FROM d
    """, ("corr_num", "var_x_n", "var_y_n")),
)
def q141_grouped_pearson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier Pearson correlation between line quantity and
    extended price (integer units × cents) — the per-segment coupling /
    drift-monitor statistic, from the same exact sufficient statistics
    as q140.  NULL where either column is constant within the group.

    Scale: identical shape to q140 — one grouped pass, exact mergeable
    decimal sums, per-row closed form."""
    from .operators.regress import grouped_pearson

    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.floor(F.col("l_quantity")).cast("long").alias("x"),
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    return _str_decimals(
        grouped_pearson(li, ["l_suppkey"], "x", "y", min_n=2)
    )
