"""Benchmark harness: runs every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Per-query time = wall clock of plan build + execution to completion
(count() action — full materialization without driver-side row transfer
dominating).  A JVM warm-up query runs first so fixed session spin-up
isn't charged to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from etl_marketeye_airflow_spark import queries as registry
from etl_marketeye_airflow_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark("bench", cpus=cpus, shuffle_partitions=cpus)

    # warm up JVM / codegen path and table metadata (parquet footer reads
    # are session-level one-time costs, not per-query work), uncharged
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from etl_marketeye_airflow_spark.sources.tables import TABLES

    for t in TABLES:
        if t == "events":
            continue  # nano-timestamp table: queries set nanosAsLong themselves
        spark.read.parquet(f"{sf_dir}/{t}.parquet").schema

    timings: dict[str, float] = {}
    for name, fn in registry.queries().items():
        t0 = time.time()
        fn(spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "registry_suite_seconds",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
