"""Sinks (S4-S8 in SURVEY.md §2.1).

Reference behaviors (cites into /root/reference/ETL-marketeye_airflow-main/):
- S4 JSON products: dags/marketeye_etl_dag.py:279-281, :726-728.  The
  reference pretty-prints one big file; the engine writes NDJSON parts
  (content parity is the target, not byte layout — a single driver-side
  file would not scale).
- S5 CSV flattened offers: plugins/marketeye_operators.py:329-365.
- S6 PostgreSQL products+offers with indexes: dags/marketeye_etl_dag.py:838-927.
  Expressed as a JDBC write; index DDL is driver-side post-write (Spark
  has no index concept).  Import/connection-gated so the pipeline tests
  run without a server.
- S7 MongoDB nested documents: dags/marketeye_etl_dag.py:929-980 — needs
  the mongo-spark connector jar; gated the same way.
- S8 timestamped JSON backup: dags/marketeye_etl_dag.py:982-1010.

Full-overwrite everywhere: the reference's daily model is "full
recompute, last write wins" (if_exists='replace' / delete_many({})).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_json_products(merged: DataFrame, path: str) -> None:
    """S4: nested master documents as NDJSON (overwrite)."""
    merged.write.mode("overwrite").json(path)


def write_csv_offers(offers_flat: DataFrame, path: str) -> None:
    """S5: flat one-row-per-offer CSV with header (overwrite)."""
    offers_flat.write.mode("overwrite").option("header", True).csv(path)


def write_timestamped_backup(merged: DataFrame, backup_dir: str, now: dt.datetime | None = None) -> str:
    """S8: timestamped backup copy; returns the written path."""
    stamp = (now or dt.datetime.now()).strftime("%Y%m%d_%H%M%S")
    path = f"{backup_dir.rstrip('/')}/marketeye_backup_{stamp}"
    merged.write.mode("overwrite").json(path)
    return path


# JDBC index DDL mirroring dags/marketeye_etl_dag.py:910-917.
_JDBC_INDEX_DDL = (
    "CREATE INDEX IF NOT EXISTS idx_products_product_id ON products (product_id)",
    "CREATE INDEX IF NOT EXISTS idx_products_brand ON products (brand)",
    "CREATE INDEX IF NOT EXISTS idx_offers_product_id ON offers (product_id)",
    "CREATE INDEX IF NOT EXISTS idx_offers_source ON offers (source)",
    "CREATE INDEX IF NOT EXISTS idx_offers_price ON offers (price)",
)


def relational_tables(merged: DataFrame, offers_flat: DataFrame) -> dict[str, DataFrame]:
    """S6 shape: products (specs serialized to JSON string, F16) + offers."""
    products = merged.select(
        "product_id",
        "brand",
        "model",
        "product_name",
        "category",
        F.to_json("specifications").alias("specifications"),
        F.col("metadata.created_at").alias("created_at"),
        F.col("metadata.last_updated").alias("last_updated"),
    )
    return {"products": products, "offers": offers_flat}


def jdbc_table_options(jdbc_url: str, table: str, properties: dict[str, str] | None = None) -> dict[str, str]:
    """The exact option map a JDBC table write sends (pure — contract-
    tested without a server in tests/test_sinks_streaming.py)."""
    opts = {"url": jdbc_url, "dbtable": table}
    opts.update(properties or {})
    return opts


def write_jdbc_relational(
    merged: DataFrame,
    offers_flat: DataFrame,
    jdbc_url: str,
    properties: dict[str, str] | None = None,
    create_indexes: bool = True,
    connection_factory=None,
) -> None:
    """S6: overwrite products+offers via JDBC, then index DDL driver-side.

    Raises a clear error when no JDBC driver/server is reachable — the
    caller (Airflow task) owns retries per the reference's retry policy.
    ``connection_factory`` (url, user, password) → DB-API-ish connection
    is injectable so the DDL contract is testable serverless.
    """
    props = dict(properties or {})
    for name, df in relational_tables(merged, offers_flat).items():
        writer = df.write.format("jdbc").mode("overwrite")
        for k, v in jdbc_table_options(jdbc_url, name, props).items():
            writer = writer.option(k, v)
        writer.save()
    if create_indexes:
        _run_jdbc_ddl(jdbc_url, props, _JDBC_INDEX_DDL, connection_factory)


def _default_connection_factory(jdbc_url: str, user: str, password: str):
    from py4j.java_gateway import java_import
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    jvm = spark._jvm
    java_import(jvm, "java.sql.DriverManager")
    return jvm.java.sql.DriverManager.getConnection(jdbc_url, user, password)


def _run_jdbc_ddl(
    jdbc_url: str,
    props: dict[str, str],
    statements: tuple[str, ...],
    connection_factory=None,
) -> None:
    factory = connection_factory or _default_connection_factory
    conn = factory(jdbc_url, props.get("user", ""), props.get("password", ""))
    try:
        stmt = conn.createStatement()
        for sql in statements:
            stmt.execute(sql)
    finally:
        conn.close()


def mongo_write_options(uri: str, database: str, collection: str) -> dict[str, str]:
    """The exact option map the Mongo write sends (pure — contract-tested
    without the connector jar)."""
    return {"connection.uri": uri, "database": database, "collection": collection}


def write_mongo_documents(merged: DataFrame, uri: str, database: str, collection: str) -> None:
    """S7: nested documents to MongoDB (overwrite = wipe-and-insert parity).

    Requires the mongo-spark connector on the classpath; raises Spark's
    DATA_SOURCE_NOT_FOUND otherwise (gate at the Airflow-task level).
    """
    writer = merged.write.format("mongodb").mode("overwrite")
    for k, v in mongo_write_options(uri, database, collection).items():
        writer = writer.option(k, v)
    writer.save()
