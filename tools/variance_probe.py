"""Targeted variance probe for the two ANN pair-generation queries.

Round-4's scale probe saw q26 range 26-45 s and q72 27-34 s ACROSS
clean sf1 probe runs while every other query reproduced within the
bench's ±20% noise floor (VERDICT r5 next-round item 8).  This pins
the spread: N consecutive timed executions of each query in ONE fresh
session (every individual time reported, not min-of-3), so run-to-run
variance separates cleanly from suite-context effects (cache/GC state
accumulated by the 117 queries that run before them in bench.py).

Usage: python tools/variance_probe.py [sf_dir] [n_runs]
Prints one JSON line: {"sf_dir": ..., "runs": {"q26...": [s, ...], ...}}
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

QUERIES = ("q26_embedding_near_dup", "q72_near_dup_scalable")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/probes/sf1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    from pyspark.sql import functions as F

    from etl_marketeye_airflow_spark import queries as registry
    from etl_marketeye_airflow_spark.session import get_spark

    spark = get_spark("variance-probe")
    # same uncharged warm-ups as bench.py (JVM, arrow workers)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    out: dict[str, list[float]] = {}
    for name in QUERIES:
        fn = registry.QUERIES[name]
        times = []
        for _ in range(n):
            spark.catalog.clearCache()
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.select(F.xxhash64(F.struct(*df.columns)).alias("_h")).agg(
                F.sum(F.col("_h").cast("decimal(38,0)"))
            ).collect()
            times.append(round(time.time() - t0, 2))
        out[name] = times
    print(json.dumps({"sf_dir": sf_dir, "runs": out}))


if __name__ == "__main__":
    main()
