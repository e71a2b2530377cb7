"""Corpus-level text aggregations: heavy hitters and vocabulary coverage.

Unlike operators/text.py (per-row Column algebra), these aggregate over
the whole corpus.  Scale shape for both: the token stream collapses in
a (group, token) hash aggregation FIRST — partial map-side combine
bounds the shuffle at the distinct-token count per partition — and every
window/rank afterwards runs over the aggregated VOCABULARY table
(10^5-ish rows), never over corpus rows.  That ordering is the whole
trick: at 100 TB the exploded token stream is ~10^13 rows, the vocab
table fits on one executor.

Reference scope: the MarketEye reference computes brand frequency
tables (dags/marketeye_etl_dag.py analytics tasks) — same shape, per
scraped offer corpus; these generalize it to token statistics for
training-data curation (vocab building, boilerplate spotting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import spread, words


def token_counts(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str | None = None,
) -> DataFrame:
    """(group?, token, cnt) hash-aggregated token frequencies.  The
    explode is map-side; the single shuffle carries partial counts."""
    keys = ([F.col(group_col)] if group_col else []) + [
        F.explode(words(F.col(text_col))).alias("token")
    ]
    ex = spread(docs).select(*keys).filter(F.col("token") != "")
    group_keys = ([group_col] if group_col else []) + ["token"]
    return ex.groupBy(*group_keys).agg(F.count(F.lit(1)).alias("cnt"))


def heavy_hitters(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    k: int = 10,
) -> DataFrame:
    """Exact per-group top-k tokens by frequency (rank ties broken by
    token asc — fully deterministic).  The row_number window partitions
    by group over the aggregated vocab table, so its sort is per-group
    vocab-sized."""
    counts = token_counts(docs, text_col, group_col)
    w = Window.partitionBy(group_col).orderBy(F.desc("cnt"), F.asc("token"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(group_col, "token", "cnt", "rank")
    )


def vocab_coverage(
    docs: DataFrame,
    text_col: str = "text",
    coverage: float = 0.5,
    num_partitions: int | None = None,
    eager: bool = True,
) -> DataFrame:
    """Minimal frequency-ordered vocabulary covering ``coverage`` of the
    corpus token mass: tokens ordered by (cnt desc, token asc), kept
    while the mass BEFORE them is under the target.

    The threshold test is exact-integer (cnt accumulates as BIGINT and
    the comparison multiplies through by the coverage denominator), so
    engines agree bit-for-bit with no float accumulation.

    Two-pass distributed prefix sum — no global single-partition window
    (a web-scale vocab is 10^8+ distinct tokens; one sorted partition
    would be the scale-killer):

    1. ``repartitionByRange`` on the sort key (cnt desc, token asc) —
       the range sampler splits the Zipf tail of count-1 tokens across
       partitions (ties break on token), so no partition exceeds
       ~vocab/N rows.  The partitioned table is PERSISTED and
       materialized once: partition ids must be frozen before fan-out,
       because each re-execution of a range exchange re-samples its
       boundaries (`spark_partition_id` over two exchange instances is
       not consistent).
    2. per-partition totals (≤N rows) collect to the driver — a
       BOUNDED collect, numPartitions rows regardless of data volume —
       where the prefix offsets and grand total are a trivial loop.
       global cum/rank = broadcast-joined offset + per-partition-window
       local cum/row_number.

    Eager by design (two-pass algorithms are multi-job): the small
    result is materialized via ``localCheckpoint`` and the partitioned
    base is unpersisted before returning — no cache entry outlives the
    call.  ``eager=False`` returns the lazy plan (for plan inspection /
    tests) and leaves the persisted base to the caller to release.
    """
    spark = docs.sparkSession
    num = int(round(coverage * 1000))  # coverage as an exact rational
    counts = token_counts(docs, text_col, None)
    n_parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    with_pid = (
        counts.repartitionByRange(n_parts, F.col("cnt").desc(), F.col("token").asc())
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    per_pid = [
        (r["_pid"], r["_psum"], r["_pn"])
        for r in with_pid.groupBy("_pid")
        .agg(F.sum("cnt").alias("_psum"), F.count(F.lit(1)).alias("_pn"))
        .collect()  # ≤ n_parts rows — bounded by config, not data
    ]
    per_pid.sort()
    offsets, cnt_off, rank_off = [], 0, 0
    for pid, psum, pn in per_pid:
        offsets.append((pid, cnt_off, rank_off))
        cnt_off += psum
        rank_off += pn
    total = cnt_off
    offsets_df = spark.createDataFrame(
        offsets, "_pid int, _cnt_off long, _rank_off long"
    )

    wl = Window.partitionBy("_pid").orderBy(F.desc("cnt"), F.asc("token"))
    ranked = (
        with_pid.withColumn(
            "_lcum",
            F.sum("cnt").over(
                wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn("_lrn", F.row_number().over(wl))
        .join(F.broadcast(offsets_df), "_pid")
        .withColumn("cum", F.col("_cnt_off") + F.col("_lcum"))
        .withColumn("rank", (F.col("_rank_off") + F.col("_lrn")).cast("int"))
    )
    # keep token iff mass before it < coverage * total  ⇔
    # 1000*(cum - cnt) < num*total   (all BIGINT, exact)
    out = ranked.filter(
        (F.col("cum") - F.col("cnt")) * F.lit(1000) < F.lit(total) * F.lit(num)
    ).select("token", "cnt", "rank", "cum")
    if not eager:
        return out
    out = out.localCheckpoint(eager=True)
    with_pid.unpersist()
    return out


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Split each document into fixed-size overlapping token windows —
    the context-window chunking step between "clean corpus" and
    "training sequences".  Chunk k covers tokens [k*stride+1,
    k*stride+chunk_size]; the last chunk may run short but every token
    is covered, and a doc shorter than chunk_size yields exactly one
    chunk.

    Scale shape: a per-row map + explode (output rows ≈ n_tokens/stride
    per doc) — zero shuffle; the token array is STAGED once per row so
    the per-chunk slice/join never re-tokenizes.  All integer index
    arithmetic → byte-identical chunks in any engine.
    """
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    if stride > chunk_size:
        # a gapped configuration silently violates the coverage invariant
        # (tokens between chunk ends and the next stride start vanish)
        raise ValueError(
            f"stride ({stride}) must be <= chunk_size ({chunk_size}): "
            "every token must land in at least one chunk"
        )
    w = F.col("_w")
    n = F.size(w)
    # ceil(max(n - chunk_size, 0) / stride) — FLOOR of a correctly-
    # rounded IEEE division of exact ints < 2^53 is exact; floor (not a
    # bare long cast) keeps the intent explicit
    kmax = F.floor(
        (F.greatest(n - chunk_size, F.lit(0)) + (stride - 1)) / stride
    ).cast("long")
    chunk = lambda k: F.slice(w, k * stride + 1, chunk_size)  # noqa: E731
    return (
        spread(docs)
        .select(F.col(id_col), words(F.col(text_col)).alias("_w"))
        .select(
            id_col,
            F.explode(
                F.transform(
                    F.sequence(F.lit(0).cast("long"), kmax),
                    # n_chunk_tokens is pure integer arithmetic — a
                    # second chunk(k) slice per element would double the
                    # array work in the hot explode
                    lambda k: F.struct(
                        k.alias("chunk_id"),
                        F.concat_ws(" ", chunk(k)).alias("chunk_text"),
                        F.least(F.lit(chunk_size), n - k * stride)
                        .cast("int")
                        .alias("n_chunk_tokens"),
                    ),
                )
            ).alias("_c"),
        )
        .select(
            id_col,
            F.col("_c.chunk_id").alias("chunk_id"),
            F.col("_c.chunk_text").alias("chunk_text"),
            F.col("_c.n_chunk_tokens").alias("n_chunk_tokens"),
        )
    )


# ── Fixed-point dyadic log2 ──────────────────────────────────────────
#
# Unigram-LM scoring needs log2, but libm log is NOT cross-engine
# bit-stable (Java Math.log vs glibc log2 differ in the last ulp, and
# per-doc double sums are order-dependent on top of that — the reason
# q78 ships mean-frequency instead).  The classic bit-hack approximation
#   flog2(n) = b + (n − 2^b) / 2^b,   b = ⌊log2 n⌋
# is linear interpolation between powers of two (max error 0.086 bits —
# immaterial for quality bucketing) and, held in 2^20 fixed point, is
# computable with INTEGER arithmetic only: exact, order-independent,
# engine-independent.  b comes from the binary-digit count of n
# (conv(n,10,2) here, bin(n) in DuckDB), never from libm.

FLOG2_SCALE = 1 << 20


def with_flog2_fx(df: DataFrame, src: str, dst: str) -> DataFrame:
    """Add ``dst`` = flog2_fx(``src``) for a positive (≥1) integer column.

    Fixed point at 2^20: flog2_fx(n) = b·2^20 + ((n − 2^b)·2^20 div 2^b).
    Integer-exact for n < 2^42 (the product stays under 2^63).  Staged
    with withColumn per plan-convention #2; helper columns are dropped.
    """
    b = (F.length(F.conv(F.col(src).cast("string"), 10, 2)) - 1).cast("int")
    return (
        df.withColumn("_flog2_b", b)
        .withColumn("_flog2_p", F.expr("shiftleft(CAST(1 AS BIGINT), _flog2_b)"))
        .withColumn(
            dst,
            F.col("_flog2_b").cast("long") * F.lit(FLOG2_SCALE)
            + F.expr(
                f"(({src} - _flog2_p) * {FLOG2_SCALE}) div _flog2_p"
            ).cast("long"),
        )
        .drop("_flog2_b", "_flog2_p")
    )


def unigram_surprisal(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """CCNet-style unigram language-model scoring: per-document mean
    surprisal −(1/n)·Σ log2(cnt_t / N) in bits, under the corpus's own
    unigram distribution.  Low bits ⇒ stopword soup / boilerplate
    (every token common), high bits ⇒ rare or noisy text — the standard
    cheap LM-quality filter when a real KenLM is overkill or unavailable.

    Determinism: log2 is the fixed-point dyadic form (module note) —
    per-token surprisal_fx = flog2_fx(N) − flog2_fx(cnt) is an exact
    integer, per-doc sums are exact, and the ONLY float ops are one
    exact power-of-two scaling plus one correctly-rounded division per
    doc — bit-identical on any IEEE-754 engine.

    Scale shape: same as q78/token_counts — the token stream collapses
    into the vocab once (map-side combine), joins back on token (AQE
    broadcasts the vocab while it fits, hash-shuffle past that), and the
    per-doc re-aggregation is key-partitioned.  N rides along as a
    1-row broadcast cross join, never a collect.
    """
    tok = (
        spread(docs)
        .select("doc_id", F.explode(words(F.col(text_col))).alias("token"))
        .filter(F.col("token") != "")
    )
    vocab = with_flog2_fx(
        token_counts(docs, text_col, None), "cnt", "flog2_cnt"
    )
    total = with_flog2_fx(
        vocab.agg(F.sum("cnt").cast("long").alias("_N")), "_N", "flog2_N"
    ).select("flog2_N")
    per_tok = tok.join(vocab.select("token", "flog2_cnt"), "token").crossJoin(
        F.broadcast(total)
    )
    mean_bits = (
        F.sum(F.col("flog2_N") - F.col("flog2_cnt")).cast("double")
        / F.lit(float(FLOG2_SCALE))
    ) / F.count(F.lit(1)).cast("double")
    return per_tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.col("flog2_N") - F.col("flog2_cnt")).alias("surprisal_fx"),
        mean_bits.alias("mean_surprisal_bits"),
        F.when(mean_bits < 4.90, "predictable")
        .when(mean_bits < 5.00, "typical")
        .otherwise("surprising")
        .alias("lm_bucket"),
    )


def tfidf_topk(docs: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    """Exact top-k TF-IDF terms per document, integer-exact end to end:
    score_fx = tf · (flog2_fx(D) − flog2_fx(df)) — term frequency times
    fixed-point idf — so ranking and the oracle hash never touch a
    float.  Ties break (score desc, token asc): fully deterministic.

    Scale shape: tf is a (doc, token) hash agg over the exploded stream
    (map-side combined); df collapses tf by token into the vocab-sized
    df table which joins back broadcast-while-it-fits; the top-k window
    partitions by doc_id — per-doc vocabulary sized, never global.
    D (corpus doc count) is a 1-row broadcast cross join.
    """
    tf = (
        spread(docs)
        .select("doc_id", F.explode(words(F.col(text_col))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_tbl = with_flog2_fx(
        tf.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("df")),
        "df",
        "flog2_df",
    )
    d_tot = with_flog2_fx(
        docs.agg(F.count(F.lit(1)).cast("long").alias("_D")), "_D", "flog2_D"
    ).select("flog2_D")
    scored = (
        tf.join(df_tbl.select("token", "flog2_df"), "token")
        .crossJoin(F.broadcast(d_tot))
        .withColumn(
            "score_fx",
            F.col("tf") * (F.col("flog2_D") - F.col("flog2_df")),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_fx"), F.asc("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "token", "tf", "score_fx", "rank")
    )
