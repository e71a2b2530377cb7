"""r13 VERDICT item 4: q188 quartile-boundary restructure A/B.

A = shipped q188 (three chained two-pass global ranks, each range-
    shuffling + checkpointing + locally sorting the FULL customer frame).
B = boundary variant: per metric, range-shuffle + checkpoint ONLY
    (value, key), per-partition counts locate the 3 quartile boundary
    rows (rank rb_k = ceil(k*n/4)+1 — the exact first rank of quartile
    k+1 under q = ((rn-1)*4) div n + 1), sort ONLY the boundary
    partitions to extract them, then assign quartiles by lexicographic
    comparison against the collected boundary literals — zero shuffle
    of the customer frame in the assignment pass, no full-frame sorts.

Equivalence: (value, key) is a unique total order, so rn >= rb_k  <=>
(value, key) >= (value_b, key_b) row-wise; q = 1 + #{k in 1..3:
rn >= rb_k} = ((rn-1)*4) div n + 1 by definition of floor division.
Unreachable boundaries (rb_k > n, only when n < 4) contribute 0.

Same-session A B B A, memsum before each, min-of-2; census hash
compared for equality on every run.

Usage: python probes/r13_q188_ab.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from etl_marketeye_airflow_spark import queries as registry
from etl_marketeye_airflow_spark._registry_base import _t
from etl_marketeye_airflow_spark.operators.ranking import (
    release_local_checkpoint,
)
from etl_marketeye_airflow_spark.session import get_spark


def memsum() -> float:
    t0 = time.time()
    float(np.sum(np.ones(25_000_000)))
    return round(time.time() - t0, 3)


def _boundaries(df: DataFrame, value_col: str, key_col: str, parts: int = 4):
    """The parts-1 exact order-statistic rows (value, key) at ranks
    ceil(k*n/parts)+1 under the (value, key) asc total order, via one
    range exchange of just the two columns + per-partition counts +
    a local sort of ONLY the partitions holding a boundary.  Returns
    (n, [ (value, key) or None per k ])."""
    spark = df.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    keyed = (
        df.select(value_col, key_col)
        .repartitionByRange(n_parts, F.col(value_col).asc(), F.col(key_col).asc())
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    per_pid = sorted(
        (r["_pid"], r["_pn"])
        for r in keyed.groupBy("_pid")
        .agg(F.count(F.lit(1)).cast("long").alias("_pn"))
        .collect()
    )
    n = sum(pn for _, pn in per_pid)
    targets = {}  # pid -> [(k, local_rank)]
    for k in range(1, parts):
        rb = -(-(k * n) // parts) + 1  # ceil(k*n/parts) + 1
        if rb > n:
            continue  # unreachable boundary (n < parts)
        off = 0
        for pid, pn in per_pid:
            if rb <= off + pn:
                targets.setdefault(pid, []).append((k, rb - off))
                break
            off += pn
    rows = []
    if targets:
        pids = list(targets)
        w = Window.partitionBy("_pid").orderBy(
            F.col(value_col).asc(), F.col(key_col).asc()
        )
        hits = (
            keyed.filter(F.col("_pid").isin(pids))
            .withColumn("_lrn", F.row_number().over(w))
            .filter(
                F.struct("_pid", "_lrn").isin(
                    [
                        F.struct(F.lit(pid), F.lit(lrn))
                        for pid, lrns in targets.items()
                        for _, lrn in lrns
                    ]
                )
            )
            .collect()
        )
        lookup = {(r["_pid"], r["_lrn"]): (r[value_col], r[key_col]) for r in hits}
        rows = [None] * (parts - 1)
        for pid, lrns in targets.items():
            for k, lrn in lrns:
                rows[k - 1] = lookup[(pid, lrn)]
    else:
        rows = [None] * (parts - 1)
    release_local_checkpoint(keyed)
    return n, rows


def q188_boundary_variant(spark, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = (
        o.groupBy("o_custkey")
        .agg(
            F.max(
                F.datediff(
                    F.col("o_orderdate").cast("date"),
                    F.lit("1970-01-01").cast("date"),
                )
            )
            .cast("long")
            .alias("last_day"),
            F.count(F.lit(1)).cast("long").alias("freq"),
            F.floor(
                F.lit(100) * F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            )
            .cast("long")
            .alias("monet"),
        )
        .persist()
    )
    try:
        cols = {}
        for value_col, out in (
            ("last_day", "r_q"),
            ("freq", "f_q"),
            ("monet", "m_q"),
        ):
            _, bnds = _boundaries(c, value_col, "o_custkey")
            q = F.lit(1)
            for b in bnds:
                if b is None:
                    continue
                vb, kb = b
                ge = (F.col(value_col) > F.lit(vb)) | (
                    (F.col(value_col) == F.lit(vb))
                    & (F.col("o_custkey") >= F.lit(kb))
                )
                q = q + ge.cast("int")
            cols[out] = q.cast("int").alias(out)
        r = c.select("o_custkey", cols["r_q"], cols["f_q"], cols["m_q"])
        out = r.groupBy("r_q", "f_q", "m_q").agg(
            F.count(F.lit(1)).cast("long").alias("n_customers")
        )
        # materialize before unpersisting the base
        out = out.localCheckpoint(eager=True)
        return out
    finally:
        c.unpersist()


def census_hash(df: DataFrame):
    return df.select(
        F.sum(
            F.xxhash64(F.struct("r_q", "f_q", "m_q", "n_customers")).cast(
                "decimal(38,0)"
            )
        )
    ).collect()[0][0]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark("q188-ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def run_a():
        return registry.QUERIES["q188_rfm_segments"](spark, sf_dir)

    def run_b():
        return q188_boundary_variant(spark, sf_dir)

    variants = {"A": run_a, "B": run_b}
    res = []
    for tag in ["A", "B", "B", "A"]:
        spark.catalog.clearCache()
        m = memsum()
        t0 = time.time()
        df = variants[tag]()
        h = census_hash(df)
        dt = round(time.time() - t0, 3)
        res.append({"v": tag, "sec": dt, "memsum": m, "hash": str(h)})
        print(res[-1], flush=True)
    mins = {v: min(r["sec"] for r in res if r["v"] == v) for v in "AB"}
    summary = {
        "order": "A B B A",
        "runs": res,
        "mins": mins,
        "hash_equal": len({r["hash"] for r in res}) == 1,
    }
    print(json.dumps(summary), flush=True)
    if out_path:
        with open(out_path, "a") as f:
            f.write(json.dumps(summary) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
