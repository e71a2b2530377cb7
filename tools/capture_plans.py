"""Capture .explain('formatted') for named registry queries into files.

Usage: python tools/capture_plans.py <outdir> <suffix> q41_... q113_...
Writes <outdir>/<query>_<suffix>.txt for each name (the r12 optimization
round's evidence files: plans/r12/<query>_before.txt / _after.txt).

Lazy queries only — eager/streaming queries execute at build; for those
the staged-plan evidence lives in PLANS.md (tools/plan_report.py).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_marketeye_airflow_spark import queries as registry
from etl_marketeye_airflow_spark.session import get_spark


def main() -> None:
    outdir = Path(sys.argv[1])
    suffix = sys.argv[2]
    names = sys.argv[3:]
    assert names, "need query names"
    unknown = set(names) - set(registry.QUERIES)
    assert not unknown, f"unknown: {sorted(unknown)}"
    outdir.mkdir(parents=True, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("capture_plans", cpus=8, shuffle_partitions=8)
    for name in names:
        df = registry.QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = outdir / f"{name}_{suffix}.txt"
        path.write_text(plan)
        n_ex = plan.count("Exchange")
        print(f"{path}  exchanges~{n_ex}", flush=True)


if __name__ == "__main__":
    main()
