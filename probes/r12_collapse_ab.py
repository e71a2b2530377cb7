"""A/B probe (r12): multigraph edges vs collapsed (src,dst)+weight for
q114 PageRank / q153 HITS at sf10, back-to-back in ONE session so host
drift cancels (order A B B A per operator).  Motivation: the r11
verdict predicted the collapse shrinks the per-round frames "by the
average purchase multiplicity" — measured multiplicity of the
orders x lineitem purchase graph at sf10 is 1.02 (58.7M distinct pairs
over 60M rows), so the prediction needs a same-window measurement, not
a cross-round normalized comparison.

Usage: python probes/r12_collapse_ab.py [sf_dir]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
from pyspark.sql import functions as F

from etl_marketeye_airflow_spark.operators.graph import (
    hits_fixed_point,
    pagerank_fixed_point,
)
from etl_marketeye_airflow_spark.session import get_spark


def memsum() -> float:
    t0 = time.time()
    float(np.sum(np.ones(25_000_000)))
    return round(time.time() - t0, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/probes/sf10"
    spark = get_spark("collapse-ab", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )

    def edges_multi():
        return orders.join(li, orders["o_orderkey"] == li["l_orderkey"]).select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )

    def edges_w():
        return edges_multi().groupBy("src", "dst").agg(
            F.count(F.lit(1)).cast("long").alias("w")
        )

    variants = {
        "pr_multi": lambda: pagerank_fixed_point(edges_multi(), iters=3),
        "pr_collapsed": lambda: pagerank_fixed_point(
            edges_w(), iters=3, weight_col="w"
        ),
        "hits_multi": lambda: hits_fixed_point(edges_multi(), iters=3),
        "hits_collapsed": lambda: hits_fixed_point(
            edges_w(), iters=3, weight_col="w"
        ),
    }
    # warm up the JVM + parquet footers, uncharged
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    orders.count()
    li.count()

    order = [
        "pr_multi", "pr_collapsed", "hits_multi", "hits_collapsed",
        "hits_collapsed", "hits_multi", "pr_collapsed", "pr_multi",
    ]
    times: dict[str, list[float]] = {k: [] for k in variants}
    for tag in order:
        spark.catalog.clearCache()
        for _rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            _rdd.unpersist(False)
        m0 = memsum()
        t0 = time.time()
        n = variants[tag]().count()
        dt = round(time.time() - t0, 1)
        times[tag].append(dt)
        print(f"{tag}: {dt}s rows={n} memsum_before={m0}", flush=True)
    print("min-of-2:", {k: min(v) for k, v in times.items()}, flush=True)


if __name__ == "__main__":
    main()
