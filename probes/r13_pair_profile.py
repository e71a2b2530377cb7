"""r13 item 1: profile WHERE the pair-engine band's time goes, per core
count (q200 ran FASTER on 8 cores than 32 in the r12 driver scaling
block — PERF_r12 ratio 0.66).

Phase decomposition of q200_leakage_safe_split (the engine is shared by
q99/q200/q202/q80/q195):

  P1 ppjoin     — _ppjoin_pairs(): shingle persist, posting/prefix
                  build, candidate join+distinct, verify joins,
                  localCheckpoint (eager — the timer ends when the
                  checkpoint is materialized)
  P2 components — near_dup_clusters(): edge materialize + O(log d)
                  min-label/pointer-jump rounds, one count per round
  P3 final      — left join docs + md5 coin + the bench's
                  hash-every-column 1-row action

Each invocation runs ONE core count in a fresh subprocess session
(master is fixed per JVM); the driver script interleaves core counts
A B B A per conv 24 and samples memsum before each run.  Stage-level
metrics are scraped from the UI REST API (enabled for the probe only)
so the slow phase can be attributed to fetch/compute/GC.

Usage: python probes/r13_pair_profile.py <cpus> [<out.json>]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def memsum() -> float:
    import numpy as np

    t0 = time.time()
    float(np.sum(np.ones(25_000_000)))
    return round(time.time() - t0, 3)


def main() -> None:
    cpus = int(sys.argv[1])
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)

    mem_before = memsum()

    from pyspark.sql import functions as F

    from etl_marketeye_airflow_spark._registry_base import _ppjoin_pairs, _t
    from etl_marketeye_airflow_spark.operators.dedup import near_dup_clusters
    from etl_marketeye_airflow_spark.session import get_spark

    spark = get_spark(
        f"pair-profile-c{cpus}",
        cpus=cpus,
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.enabled": "true"},
    )
    sc = spark.sparkContext

    # same uncharged warm-up as bench.py (JVM codegen + parquet footers)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    phases: dict[str, float] = {}

    def timed(name: str, fn):
        sc.setJobDescription(f"phase:{name}")
        t0 = time.time()
        r = fn()
        phases[name] = round(time.time() - t0, 3)
        sc.setJobDescription(None)
        return r

    stats: dict = {}
    pairs = timed("P1_ppjoin", lambda: _ppjoin_pairs(spark, sf_dir))
    comp = timed(
        "P2_components",
        lambda: near_dup_clusters(pairs.select("id_a", "id_b"), stats=stats),
    )

    def final():
        docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
        lab = docs.join(comp, docs["doc_id"] == comp["id"], "left").select(
            "doc_id",
            F.coalesce(F.col("cluster"), F.col("doc_id")).cast("long").alias("root"),
        )
        coin = F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split-v1:"), F.col("root").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        out = lab.select(
            "doc_id",
            "root",
            F.when(coin % 10 == 0, F.lit("test"))
            .when(coin % 10 == 1, F.lit("valid"))
            .otherwise(F.lit("train"))
            .alias("split"),
        )
        out.select(F.xxhash64(F.struct("doc_id", "root", "split")).alias("_h")).agg(
            F.sum(F.col("_h").cast("decimal(38,0)"))
        ).collect()

    timed("P3_final", final)

    # stage-level attribution from the UI REST API
    stages = []
    try:
        import urllib.request

        ui = sc.uiWebUrl
        app_id = sc.applicationId
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages") as r:
            raw = json.load(r)
        for s in raw:
            if s.get("status") != "COMPLETE":
                continue
            stages.append(
                {
                    "id": s["stageId"],
                    "name": (s.get("name") or "")[:80],
                    "desc": (s.get("description") or "")[:40],
                    "tasks": s.get("numCompleteTasks"),
                    "exec_run_ms": s.get("executorRunTime"),
                    "exec_cpu_ms": (s.get("executorCpuTime") or 0) // 1_000_000,
                    "gc_ms": s.get("jvmGcTime"),
                    "shuffle_read_b": s.get("shuffleReadBytes"),
                    "shuffle_write_b": s.get("shuffleWriteBytes"),
                    "input_b": s.get("inputBytes"),
                }
            )
        stages.sort(key=lambda s: -(s["exec_run_ms"] or 0))
    except Exception as e:  # noqa: BLE001 — attribution is best-effort
        stages = [{"error": repr(e)}]

    result = {
        "cpus": cpus,
        "sf_dir": sf_dir,
        "memsum_before": mem_before,
        "memsum_after": memsum(),
        "phases": phases,
        "total": round(sum(phases.values()), 3),
        "cc_rounds": stats.get("rounds"),
        "n_pairs": pairs.count(),
        "top_stages": stages[:25],
    }
    line = json.dumps(result)
    print(line, flush=True)
    if out_path:
        with open(out_path, "a") as f:
            f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
