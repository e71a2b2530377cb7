"""r13 VERDICT item 6: decide strip_frequent_grams' gram-frame persist.

The operator evaluates ``grams`` (scan → posexplode → per-doc lead()
window) TWICE — once under the document-frequency branch, once under
the removal join.  Each evaluation pays the token-stream exchange +
per-doc sort behind the window.  Candidate fix: persist the gram frame
(StorageLevel.MEMORY_AND_DISK — §5 spill policy: corpus-scale cache
evicts to disk instead of OOM) so the window machinery runs once.

A = shipped strip_frequent_grams (two evaluations).
P = identical algebra with grams.persist(MEMORY_AND_DISK), eager fill,
    unpersist after the output materializes.

Same-session A P P A on the normal sf0.1 data AND on the skew seed
(53k-char mega-doc, hot keys) — the mega-doc is where window
re-evaluation hurts most.  min-of-2, memsum before each, output hash
compared.

Usage: python probes/r13_strip_persist_ab.py <sf_dir> [out.json]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
from pyspark.sql import DataFrame, functions as F

from etl_marketeye_airflow_spark._registry_base import _t
from etl_marketeye_airflow_spark.operators.corpus import strip_frequent_grams
from etl_marketeye_airflow_spark.session import get_spark


def memsum() -> float:
    t0 = time.time()
    float(np.sum(np.ones(25_000_000)))
    return round(time.time() - t0, 3)


def main() -> None:
    sf_dir = sys.argv[1]
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark("strip-ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    docs = lambda: _t(spark, sf_dir, "documents")  # noqa: E731

    def force(df: DataFrame):
        cols = [F.col(f.name) for f in df.schema.fields]
        return df.select(F.xxhash64(F.struct(*cols)).alias("_h")).agg(
            F.sum(F.col("_h").cast("decimal(38,0)"))
        ).collect()[0][0]

    def run_a():
        return force(strip_frequent_grams(docs()))

    def run_p():
        # the SHIPPED function with the opt-in persist — zero algebra
        # drift between variants by construction
        return force(strip_frequent_grams(docs(), persist_grams=True))

    res = []
    variants = {"A": run_a, "P": run_p}
    for tag in ["A", "P", "P", "A"]:
        spark.catalog.clearCache()
        m = memsum()
        t0 = time.time()
        h = variants[tag]()
        dt = round(time.time() - t0, 3)
        res.append({"v": tag, "sec": dt, "memsum": m, "hash": str(h)})
        print(res[-1], flush=True)
    mins = {v: min(r["sec"] for r in res if r["v"] == v) for v in "AP"}
    summary = {
        "sf_dir": sf_dir,
        "order": "A P P A",
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
