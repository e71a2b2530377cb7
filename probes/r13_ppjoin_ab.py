"""r13 pair-engine A/B (conv 24): SAME session, order A B B A, memsum
before each run, min-of-2 per variant.

A = _ppjoin_pairs as shipped (r12 HEAD).
B = + (1) conditional repartition of the shingle base when the scan
      cannot feed the cores (single-row-group parquet caps the scan at
      1 task; the per-doc zip_with shingle build is CPU-bound, guide
      §2.6/§6 — a no-op whenever the scan already has >= cores splits),
    + (2) AQE coalesce min-partition floor 64k scoped to the eager
      region (the verify stage's work is expression-heavy per row —
      array_sort/posexplode/join-probe/array_intersect — so the 1 MiB
      byte floor under-parallelizes it 5-way at sf0.1; the floor never
      binds once shuffle bytes/core exceed 64k, i.e. at any real scale).

Usage: python probes/r13_ppjoin_ab.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
from pyspark.sql import DataFrame, functions as F

from etl_marketeye_airflow_spark._registry_base import _ppjoin_pairs, _t
from etl_marketeye_airflow_spark.operators.ranking import release_local_checkpoint
from etl_marketeye_airflow_spark.session import get_spark


def memsum() -> float:
    t0 = time.time()
    float(np.sum(np.ones(25_000_000)))
    return round(time.time() - t0, 3)


def _ppjoin_pairs_b(spark, sf_dir: str) -> DataFrame:
    """Variant B — same algebra, spread base + finer coalesce floor."""
    from etl_marketeye_airflow_spark.operators.dedup import word_shingles

    MINP = "spark.sql.adaptive.coalescePartitions.minPartitionSize"
    prev = spark.conf.get(MINP, None)
    spark.conf.set(MINP, "64k")
    try:
        docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
        par = spark.sparkContext.defaultParallelism
        if docs.rdd.getNumPartitions() < par:
            docs = docs.repartition(par)
        sh = (
            docs.select("doc_id", word_shingles(F.col("text"), 3).alias("grams"))
            .persist()
        )
        post = sh.select("doc_id", F.explode("grams").alias("gram"))
        freq = post.groupBy("gram").agg(F.count("*").alias("cnt"))
        prefix = (
            post.join(freq, "gram")
            .groupBy("doc_id")
            .agg(F.collect_list(F.struct("cnt", "gram")).alias("cg"))
            .select(
                "doc_id",
                F.size("cg").alias("n_grams"),
                F.expr(
                    "slice(array_sort(cg), 1, "
                    "size(cg) - ((7 * size(cg) + 19) div 20) + 1)"
                ).alias("pfx"),
            )
            .select(
                "doc_id",
                "n_grams",
                F.posexplode("pfx.gram").alias("_p0", "gram"),
            )
            .select(
                "doc_id",
                "n_grams",
                (F.col("_p0") + 1).alias("pos"),
                "gram",
            )
        )
        pos_bound = F.lit(1) + F.least(
            F.col("p_a") - 1, F.col("p_b") - 1
        ) + F.least(
            F.col("n_a") - F.col("p_a"), F.col("n_b") - F.col("p_b")
        )
        cand = (
            prefix.select(
                F.col("doc_id").alias("id_a"),
                F.col("n_grams").alias("n_a"),
                F.col("pos").alias("p_a"),
                "gram",
            )
            .join(
                prefix.select(
                    F.col("doc_id").alias("id_b"),
                    F.col("n_grams").alias("n_b"),
                    F.col("pos").alias("p_b"),
                    "gram",
                ),
                "gram",
            )
            .filter(
                (F.col("id_a") < F.col("id_b"))
                & (
                    F.lit(20) * F.least("n_a", "n_b")
                    >= F.lit(7) * F.greatest("n_a", "n_b")
                )
                & (
                    F.lit(27) * pos_bound
                    >= F.lit(7) * (F.col("n_a") + F.col("n_b"))
                )
            )
            .select("id_a", "id_b")
            .distinct()
        )
        ga = sh.select(F.col("doc_id").alias("_ia"), F.col("grams").alias("grams_a"))
        gb = sh.select(F.col("doc_id").alias("_ib"), F.col("grams").alias("grams_b"))
        inter = F.size(F.array_intersect("grams_a", "grams_b"))
        union = F.size("grams_a") + F.size("grams_b") - inter
        out = (
            cand.join(ga, F.col("id_a") == F.col("_ia"))
            .join(gb, F.col("id_b") == F.col("_ib"))
            .filter(
                F.lit(20) * F.least(F.size("grams_a"), F.size("grams_b"))
                >= F.lit(7) * F.greatest(F.size("grams_a"), F.size("grams_b"))
            )
            .withColumn("jaccard", inter.cast("double") / union.cast("double"))
            .filter(F.col("jaccard") >= 0.35)
            .select("id_a", "id_b", "jaccard")
            .localCheckpoint()
        )
        sh.unpersist()
        return out
    finally:
        if prev is None:
            spark.conf.unset(MINP)
        else:
            spark.conf.set(MINP, prev)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark("ppjoin-ab", shuffle_partitions=None)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    variants = {"A": _ppjoin_pairs, "B": _ppjoin_pairs_b}
    runs: list[dict] = []

    def one(tag: str) -> None:
        spark.catalog.clearCache()
        m = memsum()
        t0 = time.time()
        out = variants[tag](spark, sf_dir)
        n = out.count()
        dt = round(time.time() - t0, 3)
        h = out.select(
            F.sum(F.xxhash64(F.struct("id_a", "id_b", "jaccard")).cast("decimal(38,0)"))
        ).collect()[0][0]
        release_local_checkpoint(out)
        runs.append({"variant": tag, "sec": dt, "memsum": m, "n_pairs": n,
                     "hash": str(h)})
        print(runs[-1], flush=True)

    for tag in ["A", "B", "B", "A"]:
        one(tag)

    result = {
        "sf_dir": sf_dir,
        "order": "A B B A",
        "runs": runs,
        "min": {
            v: min(r["sec"] for r in runs if r["variant"] == v)
            for v in ("A", "B")
        },
        "hash_equal": len({r["hash"] for r in runs}) == 1,
    }
    print(json.dumps(result), flush=True)
    if out_path:
        with open(out_path, "a") as f:
            f.write(json.dumps(result) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
