"""One-shot profile of q117_streaming_cdc_apply (VERDICT r7 item 6):
is its ~4.5 s the micro-batch FIXED overhead (acceptable — state tests
pay a per-trigger tax) or per-batch state explosion (not)?

Reads the StreamingQueryProgress objects the drain leaves behind:
batch count, per-batch wall, rows/batch, and the state-store metrics
(total state rows, memory) — the state rows must stay ~= the entity
cardinality (customer count), NOT grow with event volume.

Usage: python probes/q117_profile.py [sf_dir]
"""

import json
import sys
import time
import uuid

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from etl_marketeye_airflow_spark.session import get_spark  # noqa: E402
from etl_marketeye_airflow_spark.streaming.stateful import (  # noqa: E402
    cdc_upsert,
)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark("q117-profile")

stream = (
    spark.readStream.schema(
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string"
    )
    .option("pathGlobFilter", "orders.parquet")
    .parquet(sf_dir)
)
p0 = F.col("o_totalprice").cast("decimal(12,4)")
log = (
    stream.select(
        F.col("o_custkey").alias("key"),
        (F.col("o_orderkey") * 4).alias("seq"),
        F.lit("I").alias("op"),
        p0.cast("double").alias("price"),
    )
    .unionByName(
        stream.filter(F.col("o_orderkey") % 2 == 0).select(
            F.col("o_custkey").alias("key"),
            (F.col("o_orderkey") * 4 + 1).alias("seq"),
            F.lit("U").alias("op"),
            (p0 + F.lit(10).cast("decimal(6,2)")).cast("double").alias("price"),
        )
    )
    .unionByName(
        stream.filter(F.col("o_orderkey") % 7 == 0).select(
            F.col("o_custkey").alias("key"),
            (F.col("o_orderkey") * 4 + 2).alias("seq"),
            F.lit("D").alias("op"),
            F.lit(None).cast("double").alias("price"),
        )
    )
)
spark.conf.set("spark.sql.shuffle.partitions", "8")
t0 = time.time()
q = (
    cdc_upsert(log)
    .writeStream.outputMode("update")
    .format("memory")
    .queryName(f"prof_{uuid.uuid4().hex[:8]}")
    .trigger(availableNow=True)
    .start()
)
q.awaitTermination()
wall = time.time() - t0

batches = []
for p in q.recentProgress:
    d = p if isinstance(p, dict) else json.loads(p.json)
    so = (d.get("stateOperators") or [{}])[0]
    batches.append(
        {
            "batchId": d.get("batchId"),
            "input_rows": d.get("numInputRows"),
            "batch_ms": (d.get("durationMs") or {}).get("triggerExecution"),
            "addBatch_ms": (d.get("durationMs") or {}).get("addBatch"),
            "state_rows": so.get("numRowsTotal"),
            "state_mem_bytes": so.get("memoryUsedBytes"),
        }
    )
print(json.dumps({"wall_s": round(wall, 2), "batches": batches}, indent=2))
