"""Rate-limited HTTP enrichment UDFs (S9 + the Ollama LLM column,
SURVEY.md §2.1 S9 / §2.11 step 5).

Reference behaviors:
- S9 GraphQL URL lookup (data/raw/Untitled.ipynb cell 2): per-ad HTTP
  POST, batch=10, 0.5 s/request rate limit, retry ×3 with 30 s backoff
  on 429, status column found/not_found/error.
- Ollama narrative analysis (§2.11): top-N anomalies POSTed one-by-one
  to localhost:11434 with 30 s timeout; ERRORS ARE CAPTURED AS THE
  COLUMN VALUE (every reference run shows the timeout string — that
  behavior is the contract).

Spark mapping: ``mapInPandas`` with per-partition rate limiting.  The
HTTP client is INJECTED (a picklable callable url→(ok, payload)), so
tests use fakes and no network is touched by default.  Closure hygiene:
the worker-side function captures only the client callable and plain
values (see operators/multimodal.py note).  Injected clients must pickle
BY VALUE — pass a closure/nested function; a module-level function from
a non-importable module (e.g. a test file) fails on the workers.

Scale notes: network calls are the bottleneck by design — parallelism =
partitions × in-partition serial rate.  Repartition to the number of
concurrent connections the remote service tolerates, NOT the cluster
size.  Results join back by key, so the expensive fetch runs exactly
once per distinct key (dropDuplicates before fetch, broadcast join
after when small).
"""

from __future__ import annotations

import json
import urllib.request
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def default_http_client(url: str, payload: str | None = None, timeout: float = 30.0):
    """(ok, body) via stdlib urllib — POST when payload given, else GET."""
    try:
        req = urllib.request.Request(
            url,
            data=payload.encode() if payload is not None else None,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return True, resp.read().decode("utf-8", "replace")
    except Exception as e:  # noqa: BLE001 — error text IS the result (reference behavior)
        return False, f"Erreur: {e}"


def enrich_keys(
    keys: DataFrame,
    url_template: str,
    client=default_http_client,
    rate_limit_per_sec: float = 2.0,
    max_retries: int = 3,
    retry_backoff_sec: float = 1.0,
    n_partitions: int = 4,
) -> DataFrame:
    """Fetch core: (_key) → (_key, enriched_payload, enrich_status), one
    HTTP call per key with per-partition rate limiting and retries.
    ``keys`` must expose a ``_key`` column (already deduplicated)."""
    # at least one attempt — max_retries=0 must mean "no retries", not
    # "no requests" (which would leave the result unbound)
    tmpl, rate, retries, backoff = (
        url_template,
        float(rate_limit_per_sec),
        max(1, int(max_retries)),
        float(retry_backoff_sec),
    )
    fetch = client

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import time as _t

        min_interval = 1.0 / rate if rate > 0 else 0.0
        last = [0.0]

        def call(key):
            url = tmpl.format(key=key)
            for attempt in range(retries):
                wait = min_interval - (_t.monotonic() - last[0])
                if wait > 0:
                    _t.sleep(wait)
                last[0] = _t.monotonic()
                ok, body = fetch(url)
                if ok:
                    return ("found", body) if body else ("not_found", None)
                if attempt + 1 < retries:
                    _t.sleep(backoff * (attempt + 1))
            return "error", body

        for pdf in batches:
            out = []
            for key in pdf["_key"]:
                status, body = call(key)
                out.append({"_key": key, "enriched_payload": body, "enrich_status": status})
            yield pd.DataFrame(out, columns=["_key", "enriched_payload", "enrich_status"])

    return keys.repartition(n_partitions).mapInPandas(
        run, schema="_key string, enriched_payload string, enrich_status string"
    )


def enrich_with_http(
    df: DataFrame,
    key_col: str,
    url_template: str,
    client=default_http_client,
    rate_limit_per_sec: float = 2.0,
    max_retries: int = 3,
    retry_backoff_sec: float = 1.0,
    n_partitions: int = 4,
    broadcast: bool = False,
) -> DataFrame:
    """S9: look up each distinct key over HTTP; left-join the enrichment
    back onto ``df`` as (enriched_payload, enrich_status).

    status: 'found' | 'not_found' (ok but empty) | 'error' — matching
    the reference's url_status values.

    The join back is NOT force-broadcast by default: the enrichment's
    cardinality = distinct keys, which at corpus scale can be far past
    driver memory — a hard F.broadcast() would OOM exactly when it
    matters.  AQE sees the runtime size and broadcasts small results on
    its own; pass ``broadcast=True`` only when the key set is known
    small (e.g. a bounded code list).
    """
    keys = df.select(F.col(key_col).alias("_key")).dropDuplicates()
    enriched = enrich_keys(
        keys,
        url_template,
        client=client,
        rate_limit_per_sec=rate_limit_per_sec,
        max_retries=max_retries,
        retry_backoff_sec=retry_backoff_sec,
        n_partitions=n_partitions,
    ).withColumnRenamed("_key", key_col)
    if broadcast:
        enriched = F.broadcast(enriched)
    return df.join(enriched, key_col, "left")


def enrich_with_http_resumable(
    df: DataFrame,
    key_col: str,
    url_template: str,
    checkpoint_dir: str,
    client=default_http_client,
    rate_limit_per_sec: float = 2.0,
    max_retries: int = 3,
    retry_backoff_sec: float = 1.0,
    n_partitions: int = 4,
    n_batch_groups: int = 10,
) -> DataFrame:
    """S9 with DURABLE progress: fetch results checkpoint to parquet per
    batch-group, and a restarted job fetches only what isn't there yet.

    Reference parity: the notebook enrichment saves progress every 10
    batches (data/raw/Untitled.ipynb cell 2) so a died run resumes
    instead of refetching — at corpus scale (days of rate-limited HTTP)
    restart-from-zero is fatal, so this is the production S9 shape.

    Mechanics: distinct keys are split into ``n_batch_groups`` stable
    hash groups; groups are fetched one Spark job at a time and APPENDED
    to ``checkpoint_dir`` (parquet commit is atomic per job — a group
    that dies mid-fetch leaves nothing behind and is retried whole on
    restart).  Already-checkpointed keys are dropped with a left-anti
    join before any HTTP happens.  Results join back from the
    checkpoint, so the returned DataFrame is also reproducible offline.
    """
    from pyspark.errors import AnalysisException

    spark = df.sparkSession

    def read_checkpoint():
        """None ⇔ the checkpoint doesn't exist yet.  ONLY missing-path
        counts as first-run: a corrupted or unreadable checkpoint must
        raise, not silently trigger a full refetch (days of rate-limited
        HTTP) that appends duplicates onto a bad directory."""
        try:
            return spark.read.parquet(checkpoint_dir)
        except AnalysisException as e:
            if "PATH_NOT_FOUND" in str(e) or "UNABLE_TO_INFER_SCHEMA" in str(e):
                return None
            raise

    done_df = read_checkpoint()
    keys = df.select(F.col(key_col).alias("_key")).dropDuplicates()
    todo = (
        keys
        if done_df is None
        else keys.join(done_df.select("_key").dropDuplicates(), "_key", "left_anti")
    )
    grouped = todo.withColumn(
        "_grp", F.pmod(F.xxhash64(F.col("_key")), F.lit(n_batch_groups))
    )
    for grp in range(n_batch_groups):
        batch = grouped.filter(F.col("_grp") == grp).drop("_grp")
        # cheap emptiness probe (keys only — no HTTP): skips the job
        # entirely for finished groups on restart
        if batch.isEmpty():
            continue
        fetched = enrich_keys(
            batch,
            url_template,
            client=client,
            rate_limit_per_sec=rate_limit_per_sec,
            max_retries=max_retries,
            retry_backoff_sec=retry_backoff_sec,
            n_partitions=n_partitions,
        )
        fetched.write.mode("append").parquet(checkpoint_dir)
    final = read_checkpoint()
    if final is None:
        # zero keys AND no prior checkpoint: nothing was ever written —
        # return the input with the enrichment columns present-but-null
        # instead of crashing on a missing path
        return (
            df.withColumn("enriched_payload", F.lit(None).cast("string"))
            .withColumn("enrich_status", F.lit(None).cast("string"))
        )
    enriched = final.dropDuplicates(["_key"]).withColumnRenamed("_key", key_col)
    return df.join(enriched, key_col, "left")


def ollama_analyze(
    top_anomalies: DataFrame,
    endpoint: str = "http://localhost:11434/api/generate",
    model: str = "llama3",
    timeout_sec: float = 30.0,
    client=default_http_client,
) -> DataFrame:
    """§2.11 LLM narrative column over the top-N anomalies.

    Error text lands in ``ollama_analysis`` (reference behavior: every
    run recorded the 30 s timeout string, and that output is the
    artifact we reproduce structurally).
    """
    ep, mdl, to = endpoint, model, float(timeout_sec)
    fetch = client

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            analyses = []
            for _, row in pdf.iterrows():
                prompt = (
                    f"Analyse cette anomalie de prix: {row['product_name']} "
                    f"({row['anomaly_type']}) prix {row['anomaly_price']} MAD "
                    f"vs moyenne {row['market_mean']:.0f} MAD."
                )
                payload = json.dumps({"model": mdl, "prompt": prompt, "stream": False})
                ok, body = fetch(ep, payload, to) if fetch is default_http_client else fetch(ep, payload)
                if ok:
                    try:
                        analyses.append(json.loads(body).get("response", body))
                    except (ValueError, AttributeError):
                        analyses.append(body)
                else:
                    analyses.append(body)
            yield pdf.assign(ollama_analysis=analyses)

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in top_anomalies.schema.fields)
    return top_anomalies.mapInPandas(run, schema=f"{schema}, ollama_analysis string")
