"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the correctness baseline — one scan, JVM-side
  fold for the dot product, TakeOrderedAndProject for the top-k (no full
  sort).  At 100 TB this is the per-partition inner loop.
- random-hyperplane LSH: the scale path — deterministic ±1 hyperplanes,
  sign-bit bucket key; search touches only the query's bucket (and
  optionally hamming-1 neighbor buckets for recall).  Bucketing by a
  16-bit key turns an O(N) scan into an O(N/2^b) one per query.
- IVF-style variant (coarse quantizer) is expressible the same way:
  replace the bucket key with argmin-centroid; left as the documented
  extension path since centroids need a training pass (kmeans via
  Spark ML when available).

Embedding cosine near-duplicate detection composes these primitives
(bucket-join both sides, verify cosine ≥ threshold).
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double — deterministic."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against one query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        embeddings.select(
            F.col(id_col),
            cosine(F.col(emb_col), q).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def hyperplanes(n_planes: int, dim: int, seed: int = 42) -> list[list[int]]:
    """Deterministic ±1 hyperplanes (seeded PRNG, reproducible everywhere)."""
    rng = random.Random(seed)
    return [[rng.choice((-1, 1)) for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket(emb: Column, planes: list[list[int]]) -> Column:
    """Sign-bit bucket key: bit_j = [dot(emb, plane_j) > 0]."""
    key = F.lit(0).cast("long")
    for plane in planes:
        proj = F.aggregate(
            F.zip_with(
                emb,
                F.array(*[F.lit(float(v)) for v in plane]),
                lambda x, p: x.cast("double") * p,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        key = key * 2 + F.when(proj > 0, 1).otherwise(0).cast("long")
    return key


def lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    seed: int = 42,
    hamming_radius: int = 0,
) -> DataFrame:
    """Approximate top-k: scan only the query's LSH bucket(s).

    Recall/latency trade: more planes → smaller buckets, lower recall;
    ``hamming_radius`` is the multi-probe knob — radius r also probes
    every bucket whose key differs in ≤ r sign bits (a true neighbor
    near a hyperplane lands one bit away), scanning C(n_planes, ≤r)+1
    buckets instead of 1.  Sign-LSH recall is strong on CLUSTERED
    corpora; on near-isotropic data (like the synthetic test embeddings,
    pairwise cosine ≈ 0) neighbor ranking is noise-like and IVF-with-
    training is the better index — measured in
    tests/test_trainingdata.py::test_ann_recall_vs_exact.
    The bucket column is a plain expression — at scale, PARTITION the
    corpus by bucket once (write partitioned parquet) and each query
    reads only the probed partitions (partition pruning does the rest).
    """
    planes = hyperplanes(n_planes, len(query_vec), seed)
    q_bucket = _py_bucket(query_vec, planes)
    probe = {q_bucket}
    if hamming_radius >= 1:
        probe.update(q_bucket ^ (1 << i) for i in range(n_planes))
    if hamming_radius >= 2:
        for i in range(n_planes):
            for j in range(i + 1, n_planes):
                probe.add(q_bucket ^ (1 << i) ^ (1 << j))
    bucketed = embeddings.withColumn("_bucket", lsh_bucket(F.col(emb_col), planes))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        bucketed.filter(F.col("_bucket").isin(sorted(probe)))
        .select(F.col(id_col), cosine(F.col(emb_col), q).alias("cosine"))
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def _py_bucket(vec: list[float], planes: list[list[int]]) -> int:
    key = 0
    for plane in planes:
        proj = 0.0
        for x, p in zip(vec, plane):
            proj += float(x) * p
        key = key * 2 + (1 if proj > 0 else 0)
    return key


def _assign_to_centroids(
    embeddings: DataFrame, cents: list[list[float]], emb_col: str
) -> DataFrame:
    """Add ``_centroid`` = argmin squared-distance over ``cents``.

    Distances as ONE array column, argmin via array_position over the
    staged attribute.  A chained when(d < best_d, ...) argmin embeds the
    whole previous chain into every new condition — exponential (2^K)
    expression blowup; this form is linear in n_centroids.
    """
    e = F.col(emb_col)
    dists = F.array(
        *[
            dot(e, e)
            - F.lit(2.0) * dot(e, F.array(*[F.lit(float(x)) for x in cvec]))
            + F.lit(sum(float(x) * x for x in cvec))
            for cvec in cents
        ]
    )
    return (
        embeddings.withColumn("_dists", dists)
        .withColumn(
            "_centroid",
            (F.array_position(F.col("_dists"), F.array_min("_dists")) - 1).cast("int"),
        )
        .drop("_dists")
    )


def train_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> list[list[float]]:
    """Lloyd's k-means in DataFrame algebra: assign (argmin expression)
    → per-cell mean (posexplode → groupBy(cell, dim) → avg) → repeat.

    Init = first ``n_centroids`` vectors by id (deterministic).  Each
    iteration is one distributed pass; only the n_centroids × dim means
    come back to the driver.  Means are rounded to 9 dp before the next
    pass so ulp-level partial-agg reorder can't flip a boundary
    assignment between runs (keeps downstream results deterministic).
    Cells that lose all members keep their previous centroid.
    """
    cents = [
        list(r[0])
        for r in embeddings.orderBy(id_col).select(emb_col).limit(n_centroids).collect()
    ]
    for _ in range(max(0, iters)):
        assigned = _assign_to_centroids(embeddings, cents, emb_col)
        means = (
            assigned.select("_centroid", F.posexplode(F.col(emb_col)))
            .groupBy("_centroid", "pos")
            .agg(F.avg(F.col("col").cast("double")).alias("v"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r._centroid, {})[r.pos] = r.v
        cents = [
            [round(by_cell[c][d], 9) for d in range(len(cents[c]))]
            if c in by_cell
            else cents[c]
            for c in range(len(cents))
        ]
    return cents


def ivf_assign(
    embeddings: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    train_iters: int = 0,
) -> tuple[DataFrame, list[list[float]]]:
    """IVF coarse quantizer: assign every vector to its nearest centroid.

    ``train_iters=0``: centroids are the first ``n_centroids`` vectors by
    id — a deterministic sample.  ``train_iters>0`` runs that many Lloyd
    iterations (``train_centroids``) first — better-separated cells →
    higher recall at the same nprobe.  Returns (assigned_df with
    ``_centroid`` column, centroids).

    Scale path: write the corpus ``partitionBy("_centroid")`` once; each
    query then reads only nprobe partitions (partition pruning — see
    build_ann_index/query_ann_index).
    """
    if train_iters > 0:
        cents = train_centroids(embeddings, n_centroids, train_iters, id_col, emb_col)
    else:
        cents = [
            list(r[0])
            for r in embeddings.orderBy(id_col).select(emb_col).limit(n_centroids).collect()
        ]
    return _assign_to_centroids(embeddings, cents, emb_col), cents


def _nearest_centroids(vec: list[float], cents: list[list[float]], nprobe: int) -> list[int]:
    def d2(a, b):
        return sum((float(x) - float(y)) ** 2 for x, y in zip(a, b))

    return sorted(range(len(cents)), key=lambda i: d2(vec, cents[i]))[:nprobe]


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    train_iters: int = 0,
) -> DataFrame:
    """IVF-Flat approximate top-k: scan only the nprobe nearest centroid
    cells (~nprobe/n_centroids of the corpus), exact cosine within."""
    assigned, cents = ivf_assign(embeddings, n_centroids, id_col, emb_col, train_iters)
    probe = _nearest_centroids(query_vec, cents, nprobe)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        assigned.filter(F.col("_centroid").isin(probe))
        .select(F.col(id_col), cosine(F.col(emb_col), q).alias("cosine"))
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def build_ann_index(
    embeddings: DataFrame,
    index_path: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    train_iters: int = 0,
) -> list[list[float]]:
    """Materialize the IVF index: corpus written partitionBy(_centroid).

    One shot at ingest; afterwards every query is a partition-pruned
    read of nprobe cells — the 100 TB serving shape.  Returns centroids
    (persist them beside the index; they're tiny)."""
    assigned, cents = ivf_assign(embeddings, n_centroids, id_col, emb_col, train_iters)
    assigned.write.mode("overwrite").partitionBy("_centroid").parquet(index_path)
    return cents


def query_ann_index(
    spark,
    index_path: str,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Serve a top-k query from the materialized IVF index.

    The `_centroid IN (...)` filter is a PARTITION filter — Spark prunes
    to nprobe directories before any IO (asserted in tests)."""
    probe = _nearest_centroids(query_vec, centroids, nprobe)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    df = spark.read.parquet(index_path).filter(F.col("_centroid").isin(probe))
    return (
        df.select(F.col(id_col), cosine(F.col(emb_col), q).alias("cosine"))
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ threshold, candidate-limited to
    same-LSH-bucket pairs (bucket-join, not all-pairs)."""
    # dim inferred lazily is awkward; peek one row (driver-side, O(1)).
    head = embeddings.select(emb_col).first()
    if head is None:  # empty corpus → empty pair set, not a crash
        spark = embeddings.sparkSession
        return spark.createDataFrame([], "id_a long, id_b long, cosine double")
    dim = len(head[0])
    planes = hyperplanes(n_planes, dim, seed)
    b = embeddings.select(
        F.col(id_col).alias("_id"),
        F.col(emb_col).alias("_e"),
        lsh_bucket(F.col(emb_col), planes).alias("_bucket"),
    )
    x, y = b.alias("x"), b.alias("y")
    return (
        x.join(
            y,
            (F.col("x._bucket") == F.col("y._bucket")) & (F.col("x._id") < F.col("y._id")),
        )
        .select(
            F.col("x._id").alias("id_a"),
            F.col("y._id").alias("id_b"),
            cosine(F.col("x._e"), F.col("y._e")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
