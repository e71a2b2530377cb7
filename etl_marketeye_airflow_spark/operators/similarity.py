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

import numpy as _np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _blas_pin_fn():
    """Return a SELF-CONTAINED worker-side function that pins the
    process's OpenBLAS pool to one thread (idempotent via an env
    sentinel).  Why: the blocked-Gram kernels below run a numpy matmul
    inside up to 32 concurrent Python workers; OpenBLAS's default pool
    is all cores (measured 32 here), so an unpinned scan oversubscribes
    32×32 threads (r9 ADVICE).  Per-worker the matmul is already the
    parallel unit — one BLAS thread each is the right shape.

    Closure hygiene (operators/multimodal.py note): the returned
    function is NESTED, so cloudpickle serializes it by value and
    kernels may capture it without importing this package on workers;
    it touches only stdlib + numpy.  Missing lib/symbol degrades to a
    no-op (correctness unaffected either way).
    """

    def pin():
        import ctypes
        import glob
        import os

        if os.environ.get("_MEYE_BLAS_PINNED"):
            return
        os.environ["_MEYE_BLAS_PINNED"] = "1"
        try:
            import numpy as np

            libs = glob.glob(
                os.path.join(
                    os.path.dirname(os.path.dirname(np.__file__)),
                    "numpy.libs",
                    "libopenblas*.so*",
                )
            )
            for lib in libs:
                handle = ctypes.CDLL(lib)
                for sym in ("openblas_set_num_threads64_", "openblas_set_num_threads"):
                    if hasattr(handle, sym):
                        getattr(handle, sym)(1)
                        break
        except Exception:  # noqa: BLE001 — perf knob only, never fail a kernel
            pass

    return pin


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


def nonzero_vec(a: Column) -> Column:
    """True iff the vector has any nonzero component, i.e. a direction.

    Cosine is UNDEFINED (0/0) for zero vectors, and real corpora contain
    them (failed/null encodes); under ANSI Spark the norm division is a
    hard DIVIDE_BY_ZERO error while DuckDB silently yields NULL — found
    by the tools/fuzz_gate.py zero-vector probe (r8).  Every cosine
    consumer excludes zero vectors with THIS predicate, and the oracles
    mirror it as ``len(list_filter(e, x -> x <> 0)) > 0``.  Exact: an
    element-wise != 0 short-circuit, no FP accumulation (conv 2: never
    filter on a heavy derived column like the norm fold)."""
    return F.exists(a, lambda x: x != F.lit(0.0))


def _empty_topk(embeddings: DataFrame, id_col: str) -> DataFrame:
    """Empty (id, cosine) frame — the defined result of querying with a
    zero-norm vector (no direction → no neighbors)."""
    return embeddings.filter(F.lit(False)).select(
        F.col(id_col), F.lit(None).cast("double").alias("cosine")
    )


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against one query vector.  Zero-norm corpus
    vectors are excluded (cosine undefined); a zero query returns the
    empty frame."""
    if not any(float(x) != 0.0 for x in query_vec):
        return _empty_topk(embeddings, id_col)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        embeddings.filter(nonzero_vec(F.col(emb_col)))
        .select(
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
    """Sign-bit bucket key: bit_j = [dot(emb, plane_j) > 0], plane 0 at
    the MSB.

    Arrow-batched numpy kernel: ±1-plane products are rounding-free, and
    the per-row pairwise ``.sum(axis=1)`` rounds identically to the
    driver-side ``_py_bucket`` (same numpy reduction over the same
    contiguous length — deliberately NOT a BLAS matmul, whose blocking
    could round borderline projections differently per call site).  The
    interpreted per-plane higher-order folds this replaces were the
    dominant fixed cost of every LSH query (n_planes × dim literal
    arrays, evaluated per element per row).
    """
    planes_arr = _np.asarray(planes, dtype=_np.float64)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def bucket_kernel(embs):
        import numpy as np
        import pandas as pd

        if len(embs) == 0:
            return pd.Series([], dtype="int64")
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in embs.to_numpy()])
        # keep in lockstep with _py_bucket / _bucket_keys_np
        key = np.zeros(mat.shape[0], dtype=np.int64)
        for p in planes_arr:
            key = (key << 1) | ((mat * p).sum(axis=1) > 0).astype(np.int64)
        return pd.Series(key)

    return bucket_kernel(emb)


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
    from itertools import combinations

    if hamming_radius < 0:
        raise ValueError(f"hamming_radius must be >= 0, got {hamming_radius}")
    if not any(float(x) != 0.0 for x in query_vec):
        return _empty_topk(embeddings, id_col)
    planes = hyperplanes(n_planes, len(query_vec), seed)
    q_bucket = _py_bucket(query_vec, planes)
    # full probe set for ANY radius: all C(n_planes, r') bit-flip masks,
    # r' = 0..radius (driver-side over n_planes bits — tiny)
    probe = {
        q_bucket ^ sum(1 << i for i in bits)
        for r in range(min(hamming_radius, n_planes) + 1)
        for bits in combinations(range(n_planes), r)
    }
    bucketed = embeddings.withColumn("_bucket", lsh_bucket(F.col(emb_col), planes))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        bucketed.filter(F.col("_bucket").isin(sorted(probe)))
        .filter(nonzero_vec(F.col(emb_col)))
        .select(F.col(id_col), cosine(F.col(emb_col), q).alias("cosine"))
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def _bucket_keys_np(mat: "_np.ndarray", planes_arr: "_np.ndarray") -> "_np.ndarray":
    """Driver-side twin of the ``lsh_bucket`` kernel body — identical
    numpy ops so signs round identically (lockstep comment there)."""
    key = _np.zeros(mat.shape[0], dtype=_np.int64)
    for p in planes_arr:
        key = (key << 1) | ((mat * p).sum(axis=1) > 0).astype(_np.int64)
    return key


def _py_bucket(vec: list[float], planes: list[list[int]]) -> int:
    mat = _np.asarray([vec], dtype=_np.float64)
    return int(_bucket_keys_np(mat, _np.asarray(planes, dtype=_np.float64))[0])


def _assign_to_centroids(
    embeddings: DataFrame, cents: list[list[float]], emb_col: str
) -> DataFrame:
    """Add ``_centroid`` = argmin squared-distance over ``cents``.

    Implemented as an Arrow-batched Pandas UDF doing ONE numpy matmul
    per batch — this is a genuinely dense-numeric kernel, exactly the
    case where a vectorized UDF beats Column algebra: the expression
    form needs n_centroids interpreted higher-order ``aggregate`` folds
    per row (measured ~4× slower per training pass at 128 dims × 16
    cells).  Ties break to the lowest cell id (np.argmin first-match,
    matching array_position semantics).  Closure hygiene: captures only
    a plain list + numpy/pandas (see operators/multimodal.py note).

    (Historical trap, still true for Column-form argmins elsewhere: a
    chained when(d < best_d, ...) argmin embeds the whole previous chain
    into every new condition — exponential expression blowup.)
    """
    from pyspark.sql.functions import pandas_udf

    plain_cents = [[float(x) for x in c] for c in cents]
    _pin_blas = _blas_pin_fn()

    @pandas_udf("int")
    def nearest(batch):
        import numpy as np
        import pandas as pd

        _pin_blas()
        if len(batch) == 0:
            return pd.Series([], dtype="int32")
        M = np.asarray(plain_cents, dtype=np.float64)          # (k, d)
        c_sq = (M * M).sum(axis=1)                             # ‖c‖²
        X = np.stack([np.asarray(v, dtype=np.float64) for v in batch])
        # argmin ‖x−c‖² = argmin ‖c‖² − 2·x·c  (‖x‖² constant per row)
        d2 = c_sq[None, :] - 2.0 * (X @ M.T)
        return pd.Series(d2.argmin(axis=1).astype("int32"))

    return embeddings.withColumn("_centroid", nearest(F.col(emb_col)))


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

    NULL embeddings are excluded at entry (conv 22): a missing vector
    can neither seed a centroid (``list(None)`` raised engine-
    asymmetrically under the NULL-fuzz perturbation) nor be assigned.
    """
    train = (
        embeddings.filter(F.col(emb_col).isNotNull())
        .select(id_col, emb_col)
        .persist()
    )
    try:
        cents = [
            list(r[0])
            for r in train.orderBy(id_col).select(emb_col).limit(n_centroids).collect()
        ]
        for _ in range(max(0, iters)):
            assigned = _assign_to_centroids(train, cents, emb_col)
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
    finally:
        train.unpersist()
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

    NULL embeddings are excluded at entry (conv 22) — no cell exists
    for a missing vector; zero vectors still assign fine (squared
    distance is total) and are only dropped at cosine-scoring stages.
    """
    embeddings = embeddings.filter(F.col(emb_col).isNotNull())
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
    cells (~nprobe/n_centroids of the corpus), exact cosine within.
    Zero-norm vectors assign/probe fine (squared distance is total) but
    are excluded at the SCORING stage (cosine undefined); a zero query
    returns the empty frame."""
    if not any(float(x) != 0.0 for x in query_vec):
        return _empty_topk(embeddings, id_col)
    assigned, cents = ivf_assign(embeddings, n_centroids, id_col, emb_col, train_iters)
    probe = _nearest_centroids(query_vec, cents, nprobe)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        assigned.filter(F.col("_centroid").isin(probe))
        .filter(nonzero_vec(F.col(emb_col)))
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
    df = spark.read.parquet(index_path)
    if not any(float(x) != 0.0 for x in query_vec):
        return _empty_topk(df, id_col)
    probe = _nearest_centroids(query_vec, centroids, nprobe)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.filter(F.col("_centroid").isin(probe))
        .filter(nonzero_vec(F.col(emb_col)))
        .select(F.col(id_col), cosine(F.col(emb_col), q).alias("cosine"))
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_planes: int | None = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    seed: int = 42,
    n_tables: int = 1,
    max_bucket: int | None = None,
    target_bucket_rows: int = 256,
    eager: bool = False,
) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ threshold, candidate-limited to
    same-LSH-bucket pairs (bucket-join, not all-pairs).

    ``n_tables`` is the recall knob: L independent hash tables (distinct
    plane seeds) each propose same-bucket candidates; a pair whose
    per-table collision probability is p = (1−θ/π)^n_planes survives
    with 1−(1−p)^L.  Precision is always exact (cosine verify).  Cost
    scales linearly in L — bucket columns are one projection, and the
    self-join runs per (table, bucket) key, still never all-pairs.

    SCALE knobs (the 10× probe caught a 67× blowup on a fixed 3-plane
    config — buckets hold n/2^planes rows, so a plane count tuned for
    recall on a small corpus goes quadratic as n grows):

    - ``n_planes=None`` auto-sizes to keep the EXPECTED bucket near
      ``target_bucket_rows``: p = max(4, ceil(log2(n/target))).  True
      near-dups (cosine ≥0.9, θ ≤ 26°) survive many planes, so deeper
      bucketing costs little recall at real operating points; a
      wide-angle threshold on isotropic data (q26's oracle regime) is
      inherently ~all-pairs and NO bucketing can save it — pin such
      configs explicitly and only at bounded corpus sizes.
    - ``max_bucket`` drops pathological buckets (dead-center hubs,
      degenerate vectors) before the self-join — a documented recall
      trade, same discipline as minhash_lsh_pairs.
    - ``eager=True`` materializes the pair set at call time
      (``localCheckpoint``) and unpersists the input projection before
      returning — same lifecycle as ``minhash_lsh_pairs``.  The default
      stays LAZY (plan semantics unchanged for composing callers); pass
      eager for fan-out call sites so the input lineage — consumed by
      first()/count() during auto-sizing plus the bucket and verify
      branches — executes once, not 3-4×.
    """
    # One projection reused by every branch (auto-size probe, bucket
    # build, cosine verify) — persisted when we'd otherwise re-execute
    # the upstream lineage per branch.  Zero-norm vectors are excluded
    # up front: they have no direction, so cosine-near-dup is undefined
    # for them (and the unit-normalize below would DIVIDE_BY_ZERO under
    # ANSI — the fuzz_gate zero-vector probe, r8); the oracles agree for
    # free since NULL-cosine pairs never pass a >= threshold.
    # The bucket-scan kernel and its output schema assume integral ids
    # (np.int64 arrays, "id_a long"); a string/decimal id would fail
    # deep inside the Arrow kernel with an opaque error — fail fast
    # here instead (r9 ADVICE).
    id_type = embeddings.schema[id_col].dataType.typeName()
    if id_type not in ("byte", "short", "integer", "long"):
        raise TypeError(
            f"embedding_near_dup_pairs requires an integral id column; "
            f"{id_col!r} is {id_type}"
        )
    base = embeddings.filter(nonzero_vec(F.col(emb_col))).select(
        F.col(id_col).alias("_id"), F.col(emb_col).alias("_e")
    )
    do_persist = eager or n_planes is None
    if do_persist:
        base = base.persist()
    # dim inferred lazily is awkward; peek one row (driver-side, O(1)).
    head = base.select("_e").first()
    if head is None:  # empty corpus → empty pair set, not a crash
        if do_persist:
            base.unpersist()
        spark = embeddings.sparkSession
        return spark.createDataFrame([], "id_a long, id_b long, cosine double")
    dim = len(head[0])
    if n_planes is None:
        import math

        n = base.count()
        n_planes = max(4, math.ceil(math.log2(max(n, 1) / target_bucket_rows + 1)))
    all_planes = _np.asarray(
        [hyperplanes(n_planes, dim, seed + t) for t in range(max(1, n_tables))],
        dtype=_np.float64,
    )  # (L, n_planes, dim)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def multi_bucket_kernel(embs):
        import numpy as np
        import pandas as pd

        if len(embs) == 0:
            return pd.Series([], dtype="object")
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in embs.to_numpy()])
        keys = np.zeros((mat.shape[0], all_planes.shape[0]), dtype=np.int64)
        for t in range(all_planes.shape[0]):
            # lockstep with lsh_bucket's kernel / _bucket_keys_np
            key = np.zeros(mat.shape[0], dtype=np.int64)
            for p in all_planes[t]:
                key = (key << 1) | ((mat * p).sum(axis=1) > 0).astype(np.int64)
            keys[:, t] = key
        return pd.Series(list(keys))

    # All L tables' keys come from ONE Arrow pass over the vectors (one
    # kernel returning array<long>), then posexplode to (table, bucket).
    buckets = base.select(
        F.col("_id"),
        F.posexplode(multi_bucket_kernel(F.col("_e"))).alias("_t", "_bucket"),
    )
    if max_bucket is not None:
        from pyspark.sql.window import Window

        bn = F.count(F.lit(1)).over(Window.partitionBy("_t", "_bucket"))
        buckets = buckets.withColumn("_bn", bn).filter(F.col("_bn") <= max_bucket).drop("_bn")
    unit = base.withColumn("_nrm", norm(F.col("_e"))).select(
        F.col("_id"),
        F.transform(F.col("_e"), lambda v: v.cast("double") / F.col("_nrm")).alias("_u"),
    )

    # Candidate generation + threshold decision happen INSIDE each
    # (table, bucket) group: one Arrow group per bucket runs a blocked
    # numpy Gram over the bucket's unit vectors (the semdedup cell-scan
    # pattern) and emits only the id pairs that clear the threshold.
    # The earlier form — bucket self-join to (id_a, id_b), dropDuplicates,
    # then joining unit vectors onto every candidate — shuffled the
    # candidate stream THREE times with the vector payload replicated
    # per candidate; at the auto-sized operating point candidates grow
    # ~linearly in n (L·n·target_bucket/2 ≈ 3·10^8 at 400k vectors), so
    # that verify shuffle was ~300 GB at sf10 (measured: q72 >900 s).
    # Here the vector payload crosses the shuffle/Arrow boundary once
    # per (table, row) — L·n rows, ~1.6 GB at the same point — and the
    # Gram flops are numpy's problem, not the shuffle's.  Both axes of
    # the Gram are sliced so a pathological mega-bucket never
    # materializes an unbounded matrix (conv: kernels slice per-row
    # work); ids sort ascending so index order IS id order and i<j
    # dedup is an upper-triangle mask.
    thr_scan = float(threshold) - 1e-9  # kernel-noise slack; exact filter below
    _pin_blas = _blas_pin_fn()

    def _bucket_scan(pdf):
        import numpy as np
        import pandas as pd

        _pin_blas()
        pdf = pdf.sort_values("_id", kind="mergesort").reset_index(drop=True)
        ids = pdf["_id"].to_numpy()
        n_rows = len(pdf)
        if n_rows < 2:
            return pd.DataFrame({"id_a": np.array([], dtype=np.int64),
                                 "id_b": np.array([], dtype=np.int64)})
        U = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["_u"]])
        out_a, out_b = [], []
        block = 1024
        for s0 in range(0, n_rows, block):
            e0 = min(s0 + block, n_rows)
            for c0 in range(s0, n_rows, block):
                c1 = min(c0 + block, n_rows)
                C = U[s0:e0] @ U[c0:c1].T
                mask = (C >= thr_scan) & (
                    np.arange(c0, c1)[None, :] > np.arange(s0, e0)[:, None]
                )
                ii, jj = np.nonzero(mask)
                if len(ii):
                    out_a.append(ids[s0 + ii])
                    out_b.append(ids[c0 + jj])
        if not out_a:
            return pd.DataFrame({"id_a": np.array([], dtype=np.int64),
                                 "id_b": np.array([], dtype=np.int64)})
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b)})

    cand = (
        buckets.join(unit, "_id")
        .groupBy("_t", "_bucket")
        .applyInPandas(_bucket_scan, schema="id_a long, id_b long")
        .dropDuplicates(["id_a", "id_b"])
    )

    # Final cosine recompute = one numpy batch dot per SURVIVING pair
    # (Arrow-batched pandas UDF) — the survivor set is ~true-pair-sized,
    # so joining unit vectors onto it is cheap, and the emitted VALUE
    # comes from the same einsum as always: bucket-scan matmul noise
    # (~1e-16, BLAS shape-dependent summation order) never reaches the
    # output, and the threshold decision is re-applied exactly here.
    # q24 keeps the Column fold — its oracle parity depends on the
    # exact left-fold op order; here the threshold sits in a dead zone
    # so ulp-order differences are inert.
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def pair_dot(ua, ub):
        import numpy as np
        import pandas as pd

        if len(ua) == 0:
            return pd.Series([], dtype="float64")
        A = np.stack([np.asarray(v, dtype=np.float64) for v in ua])
        B = np.stack([np.asarray(v, dtype=np.float64) for v in ub])
        return pd.Series(np.einsum("ij,ij->i", A, B))

    out = (
        cand.join(unit.withColumnRenamed("_id", "id_a").withColumnRenamed("_u", "u_a"), "id_a")
        .join(unit.withColumnRenamed("_id", "id_b").withColumnRenamed("_u", "u_b"), "id_b")
        .select("id_a", "id_b", pair_dot(F.col("u_a"), F.col("u_b")).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
    if not eager:
        # auto-size probe was served from cache; release the blocks now —
        # the returned plan recomputes the projection once at action time.
        if do_persist:
            base.unpersist()
        return out
    out = out.localCheckpoint(eager=True)
    if do_persist:
        base.unpersist()
    return out


def semdedup(
    embeddings: DataFrame,
    tau: float = 0.45,
    n_centroids: int | None = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    train_iters: int = 0,
    target_cell_rows: int = 256,
    eager: bool = False,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, public arXiv 2303.09540): semantic
    deduplication by clustering embeddings and comparing pairs ONLY
    within a cluster — the scalable alternative to all-pairs cosine for
    pruning semantically redundant training data.

    Rule: a vector is dropped iff some SAME-CELL vector with a smaller
    id has cosine ≥ ``tau`` with it (the greedy keep-first-by-id
    representative choice, deterministic).  Returns every input row as
    (id, cell_idx, kept).

    Determinism / oracle story: the ``train_iters=0`` quantizer is the
    deterministic first-``n_centroids``-by-id sample (q36's recipe), so
    assignment is SQL-replayable (argmin of ‖c‖²−2·x·c, ties by cell
    index — margins pinned in tests); pair cosines come from a numpy
    Gram kernel whose ~1e-12 deviation from the oracle's sequential
    SQL fold is margin-protected (min |cos−τ| pinned ≥4e-4 in tests —
    only the ≥τ DECISION reaches the output, never the value).

    Scale shape: cost is O(Σ cell²·dim).  ``n_centroids=None``
    auto-sizes ⌈n / target_cell_rows⌉ cells so per-cell work stays
    bounded as the corpus grows (the paper runs 50k clusters on
    LAION-440M for the same reason); the self-join shuffles on the cell
    id, and ``train_iters>0`` buys better-separated cells at the same
    cost.  The oracled registry config pins 16 cells on the fixed test
    corpus.

    NULL embeddings are excluded at entry (conv 22): a missing vector
    has no cell and no cosine — it appears in NEITHER the kept nor the
    dropped output rows (oracles mirror with an IS NOT NULL filter).
    """
    base = embeddings.filter(F.col(emb_col).isNotNull()).select(
        id_col, emb_col
    )
    if n_centroids is None:
        n = base.count()
        n_centroids = max(1, -(-n // target_cell_rows))
    assigned, _cents = ivf_assign(
        base, n_centroids, id_col, emb_col, train_iters
    )
    # Within-cell pair scan as ONE Arrow group per cell (convention 6:
    # dense numeric kernels go Arrow) — the pair-join + interpreted
    # fold form costs O(pairs·dim) lambda evaluations (measured 234 s
    # at 20 k vectors / 16 cells); a per-cell blocked Gram matmul does
    # the same work in one numpy call per block.  The kernel SLICES the
    # row axis so a mega-cell never materializes an unbounded matrix,
    # and sorts the cell by id so "dropped" is a strictly-lower-
    # triangular any() — the greedy keep-smallest-id rule exactly.
    # Threshold decisions are margin-protected vs the oracle's SQL fold
    # (numpy-vs-fold noise ~1e-12; min |cos−τ| pinned ≥4e-4 in tests).
    tau_f = float(tau)
    id_c, emb_c = id_col, emb_col
    _pin_blas = _blas_pin_fn()

    def _cell_drop(pdf):
        import numpy as np
        import pandas as pd

        _pin_blas()
        pdf = pdf.sort_values(id_c, kind="mergesort").reset_index(drop=True)
        X = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[emb_c]])
        n = len(pdf)
        nrm = np.linalg.norm(X, axis=1)
        nrm[nrm == 0.0] = 1.0
        Xn = X / nrm[:, None]
        kept = np.ones(n, dtype=bool)
        block = 1024
        # both axes sliced: peak temp = block² doubles regardless of
        # cell size; the dropped flag accumulates an associative OR
        for s0 in range(0, n, block):
            e0 = min(s0 + block, n)
            js = np.arange(s0, e0)
            hit = np.zeros(e0 - s0, dtype=bool)
            for c0 in range(0, e0, block):
                c1 = min(c0 + block, e0)
                C = Xn[s0:e0] @ Xn[c0:c1].T
                valid = np.arange(c0, c1)[None, :] < js[:, None]
                hit |= ((C >= tau_f) & valid).any(axis=1)
            kept[s0:e0] = ~hit
        return pd.DataFrame(
            {
                "vid": pdf[id_c].to_numpy(),
                "cell_idx": pdf["_centroid"].to_numpy().astype("int64"),
                "kept": kept,
            }
        )

    out = (
        assigned.groupBy("_centroid")
        .applyInPandas(_cell_drop, schema="vid long, cell_idx long, kept boolean")
        .withColumnRenamed("vid", id_col)
        .select(id_col, "cell_idx", "kept")
    )
    if eager:
        out = out.localCheckpoint()
    return out


def quantize_int8(
    emb: DataFrame, id_col: str = "vec_id", emb_col: str = "embedding"
) -> DataFrame:
    """Per-dimension scalar quantization of an embedding column to
    8-bit codes — the standard 4× memory/IO reduction that makes a
    100 TB ANN index fit its serving tier (FAISS SQ8 equivalent):

        code_d = min(floor((v_d − min_d)·255 / (max_d − min_d)), 255)

    with per-dimension [min_d, max_d] trained on the corpus itself
    (one tiny stats frame, broadcast back).  Constant dimensions code
    to 0.  Reconstruction v̂ = min_d + (code+0.5)·step has error ≤
    step/2 per dim (pytest-pinned).

    Determinism: float inputs widen to double exactly; the quantize
    expression is ONE fixed IEEE operand order both engines, then
    floor — bit-identical codes everywhere (conv 1's "identical op
    order" rule applied to a float formula; no accumulation anywhere).

    Scale shape: posexplode → per-DIM min/max (shuffle = n_dims rows)
    → broadcast stats join → per-id re-assembly groupBy; two key
    shuffles total, both map-side combined; codes pack back into one
    array column (array_sort on (dim, code) structs — exact integer
    sort keys).
    """
    ex = emb.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col(emb_col)).alias("dim0", "vf"),
    ).select(
        "id",
        (F.col("dim0") + 1).cast("long").alias("dim"),
        F.col("vf").cast("double").alias("v"),
    )
    stats = ex.groupBy("dim").agg(
        F.min("v").alias("mn"), F.max("v").alias("mx")
    )
    code = F.when(
        F.col("mx") > F.col("mn"),
        F.least(
            F.floor(
                (F.col("v") - F.col("mn"))
                * F.lit(255.0)
                / (F.col("mx") - F.col("mn"))
            ).cast("long"),
            F.lit(255).cast("long"),
        ),
    ).otherwise(F.lit(0).cast("long"))
    c = ex.join(F.broadcast(stats), "dim").withColumn("code", code)
    return (
        c.groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dims"),
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("dim", "code"))
                ),
                lambda s: s["code"],
            ).alias("codes"),
        )
        .select(F.col("id").alias(id_col), "n_dims", "codes")
    )
