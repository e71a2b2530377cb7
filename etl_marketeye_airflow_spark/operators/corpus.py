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
