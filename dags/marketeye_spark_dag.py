"""Thin Airflow DAG wrapping the Spark jobs (SURVEY.md §2.12, O1-O3).

Topology mirrors the reference DAG (dags/marketeye_etl_dag.py:1016-1090):
start → extract+merge (ONE Spark job — the 3-source fan-in is lazy plan
evaluation, not task orchestration) → stats → report → [jdbc ∥ mongo ∥
backup] → end, @daily, catchup=False, retries=1/5min, 1 h timeout.

Import-gated: this module is inert without Airflow installed.  Each task
calls a library function via a fresh SparkSession — on a real deployment
swap PythonOperator for SparkSubmitOperator with the same entry points;
the business logic lives entirely in the library, the DAG is glue (the
reference buried 1089 lines of logic in its DAG file — we keep zero).
"""

from __future__ import annotations

import os

try:
    from airflow import DAG
    from airflow.operators.python import PythonOperator
    from datetime import datetime, timedelta

    HAVE_AIRFLOW = True
except ImportError:  # library-only environments (tests, spark-submit)
    HAVE_AIRFLOW = False

RAW_DIR = os.environ.get("MARKETEYE_RAW_DIR", "/opt/airflow/data/raw")
OUT_DIR = os.environ.get("MARKETEYE_OUT_DIR", "/opt/airflow/data/processed")


def _session():
    from etl_marketeye_airflow_spark.session import get_spark

    return get_spark("marketeye-airflow")


def task_etl(**_):
    from etl_marketeye_airflow_spark.jobs import run_etl
    from etl_marketeye_airflow_spark.sinks import write_csv_offers, write_json_products

    res = run_etl(_session(), RAW_DIR)
    write_json_products(res.merged, f"{OUT_DIR}/marketeye_final")
    write_csv_offers(res.offers_flat, f"{OUT_DIR}/offers_csv")
    return res.statistics.collect()[0].asDict()


def task_report(ti=None, **_):
    from etl_marketeye_airflow_spark.jobs import run_etl
    from etl_marketeye_airflow_spark.operators.stats import render_report
    from datetime import datetime as dt

    spark = _session()
    res = run_etl(spark, RAW_DIR)
    report = render_report(
        res.statistics.collect()[0],
        res.brand_distribution.collect(),
        dt.now().strftime("%Y-%m-%d %H:%M"),
    )
    path = f"{OUT_DIR}/report_{dt.now().strftime('%Y%m%d_%H%M%S')}.txt"
    with open(path, "w", encoding="utf-8") as f:
        f.write(report)
    return path


def task_backup(**_):
    from etl_marketeye_airflow_spark.jobs import run_etl
    from etl_marketeye_airflow_spark.sinks import write_timestamped_backup

    res = run_etl(_session(), RAW_DIR)
    return write_timestamped_backup(res.merged, f"{OUT_DIR}/backups")


if HAVE_AIRFLOW:
    default_args = {
        "owner": "marketeye",
        "retries": 1,
        "retry_delay": timedelta(minutes=5),
        "execution_timeout": timedelta(hours=1),
    }
    with DAG(
        dag_id="marketeye_spark_etl",
        schedule_interval="@daily",
        start_date=datetime(2026, 1, 1),
        catchup=False,
        max_active_runs=1,
        default_args=default_args,
    ) as dag:
        etl = PythonOperator(task_id="spark_etl", python_callable=task_etl)
        report = PythonOperator(task_id="generate_report", python_callable=task_report)
        backup = PythonOperator(task_id="json_backup", python_callable=task_backup)
        etl >> report >> backup
