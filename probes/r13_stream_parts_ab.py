"""r13 VERDICT item 7 (bounded attempt): the streaming band's fixed
costs are micro-batch + state-store machinery.  Triggers are already
one AvailableNow batch, so the only untried lever is the STATE
PARTITION COUNT: q117/q63/q31-band queries that pinned it to 8 (or
size-adaptive) in earlier rounds dodge 32 state-store instances + 32
delta files per stateful op; q31/q133/q154 still inherit the ambient
spark.sql.shuffle.partitions (= cores in the bench session).

A = ambient 32 state partitions (bench session today).
P = ambient 8 (what a size-adaptive pin would choose for these inputs).

Same-session A P P A per query (the conf is read at stream start; each
run uses a fresh memory-sink checkpoint).  min-of-2, memsum sampled,
result hash compared.  If P wins materially, the q117-style
size-adaptive pin lands in the unpinned queries; either way the item
closes with this measurement.

Usage: python probes/r13_stream_parts_ab.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
from pyspark.sql import functions as F

from etl_marketeye_airflow_spark import queries as registry
from etl_marketeye_airflow_spark.session import get_spark


def memsum() -> float:
    t0 = time.time()
    float(np.sum(np.ones(25_000_000)))
    return round(time.time() - t0, 3)


QUERIES = [
    "q31_streaming_window",
    "q133_stream_static_join",
    "q154_streaming_session_windows",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark("stream-parts-ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    prev = spark.conf.get("spark.sql.shuffle.partitions")

    def force(df):
        cols = [F.col(f.name) for f in df.schema.fields]
        return df.select(F.xxhash64(F.struct(*cols)).alias("_h")).agg(
            F.sum(F.col("_h").cast("decimal(38,0)"))
        ).collect()[0][0]

    out = {}
    for name in QUERIES:
        fn = registry.QUERIES[name]
        runs = []
        for tag, parts in (("A", prev), ("P", "8"), ("P", "8"), ("A", prev)):
            spark.catalog.clearCache()
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            m = memsum()
            t0 = time.time()
            try:
                h = force(fn(spark, sf_dir))
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", prev)
            runs.append(
                {"v": tag, "sec": round(time.time() - t0, 3), "memsum": m,
                 "hash": str(h)}
            )
            print(name, runs[-1], flush=True)
        out[name] = {
            "runs": runs,
            "mins": {v: min(r["sec"] for r in runs if r["v"] == v) for v in "AP"},
            "hash_equal": len({r["hash"] for r in runs}) == 1,
        }
    summary = {"sf_dir": sf_dir, "order": "A P P A", "ambient": prev,
               "results": out}
    print(json.dumps(summary), flush=True)
    if out_path:
        with open(out_path, "a") as f:
            f.write(json.dumps(summary) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
