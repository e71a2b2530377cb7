"""Same-session A/B (conv 24) of the r12 rewrites vs their r11 shapes.

Three rewrites this round: q41 (applyInPandas -> window built-in),
q152/ind_profile (duplicate child subtree -> one left-join pass),
q113/strip_frequent_grams (anti-join/rebuild/totals trio -> one marked
pass).  The r11 bodies are embedded verbatim below (_v11 builders); the
r12 bodies come from the live registry.  Both variants run in ONE
session at sf0.1, order A B B A per query, memsum sampled before each
run, min-of-2 per variant — the conv-24 standard, not a cross-round
normalized comparison.

Usage: python probes/r12_qfix_ab.py   (writes r12_qfix_ab.json next to it)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_marketeye_airflow_spark import queries as registry
from etl_marketeye_airflow_spark.session import get_spark

# r13: env-overridable so the same harness serves the VERDICT item-5
# sf1 confirmation probe; the output file is suffixed per sf so the r12
# record is never clobbered.
import os

SF_DIR = os.environ.get("QFIX_SF_DIR", "/root/testdata/sf0.1")


# --------------------------- r11 variants ---------------------------


def q41_v11(spark, sf_dir):
    e = spark.read.schema(
        "event_id long, user_id long, event_type string, value double, props string"
    ).parquet(f"{sf_dir}/events.parquet")

    def normalize(pdf):
        lo, hi = pdf["value"].min(), pdf["value"].max()
        span = hi - lo
        pos = (pdf["value"] - lo) / span if span != 0 else 0.0
        return pdf.assign(value_pos=pos)[["event_id", "user_id", "value_pos"]]

    return e.select("event_id", "user_id", "value").groupBy("user_id").applyInPandas(
        normalize, schema="event_id long, user_id long, value_pos double"
    )


def ind_profile_v11(pairs):
    parts = []
    for child, ccol, parent, pcol, label in pairs:
        cvals = (
            child.select(F.col(ccol).alias("v"))
            .filter(F.col("v").isNotNull())
            .groupBy("v")
            .agg(F.count(F.lit(1)).cast("long").alias("_rows"))
        )
        pvals = (
            parent.select(F.col(pcol).alias("v"))
            .filter(F.col("v").isNotNull())
            .distinct()
        )
        orphans = cvals.join(pvals, "v", "left_anti")
        tot = cvals.agg(
            F.coalesce(F.sum("_rows"), F.lit(0)).cast("long").alias("n_child_rows"),
            F.count(F.lit(1)).cast("long").alias("n_child_distinct"),
        )
        orp = orphans.agg(
            F.count(F.lit(1)).cast("long").alias("n_orphan_distinct"),
            F.coalesce(F.sum("_rows"), F.lit(0)).cast("long").alias("n_orphan_rows"),
        )
        parts.append(
            tot.crossJoin(orp).select(
                F.lit(label).alias("ind"),
                "n_child_rows",
                "n_child_distinct",
                "n_orphan_distinct",
                "n_orphan_rows",
                F.when(
                    F.col("n_child_distinct") > 0,
                    F.expr(
                        "(1000000 * (n_child_distinct - n_orphan_distinct))"
                        " div n_child_distinct"
                    ),
                )
                .otherwise(F.lit(1_000_000))
                .cast("long")
                .alias("containment_ppm"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def q152_v11(spark, sf_dir):
    def _t(name):
        return spark.read.parquet(f"{sf_dir}/{name}.parquet")

    li, orders, cust, sup = (
        _t("lineitem"), _t("orders"), _t("customer"), _t("supplier"),
    )
    return ind_profile_v11(
        [
            (li, "l_orderkey", orders, "o_orderkey",
             "lineitem.l_orderkey<orders.o_orderkey"),
            (orders, "o_custkey", cust, "c_custkey",
             "orders.o_custkey<customer.c_custkey"),
            (cust, "c_custkey", orders, "o_custkey",
             "customer.c_custkey<orders.o_custkey"),
            (li, "l_suppkey", sup, "s_suppkey",
             "lineitem.l_suppkey<supplier.s_suppkey"),
        ]
    )


def strip_frequent_grams_v11(docs, text_col="text", k=2, max_doc_permille=80):
    from etl_marketeye_airflow_spark.operators.dedup import spread, words

    tok = (
        spread(docs)
        .select(
            "doc_id",
            F.posexplode(words(F.col(text_col))).alias("_p0", "_t"),
        )
        .filter(F.col("_t") != "")
        .withColumn("_pos", F.col("_p0") + 1)
        .select("doc_id", "_pos", "_t")
    )
    wo = Window.partitionBy("doc_id").orderBy("_pos")
    leads = [F.lead(F.col("_t"), i).over(wo) for i in range(1, k)]
    grams = (
        tok.withColumn("_g", F.concat_ws(" ", F.col("_t"), *leads))
        .filter(F.size(F.split(F.col("_g"), " ")) == k)
        .select("doc_id", "_pos", "_g")
    )
    df_tbl = (
        grams.select("doc_id", "_g")
        .distinct()
        .groupBy("_g")
        .agg(F.count(F.lit(1)).cast("long").alias("_df"))
    )
    d_tot = tok.agg(F.countDistinct("doc_id").cast("long").alias("_D"))
    blacklist = (
        df_tbl.crossJoin(F.broadcast(d_tot))
        .filter(F.col("_df") * 1000 > F.col("_D") * F.lit(int(max_doc_permille)))
        .select("_g")
    )
    removed = (
        grams.join(F.broadcast(blacklist), "_g")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("_pos"), F.col("_pos") + F.lit(k - 1))
            ).alias("_pos"),
        )
        .distinct()
    )
    kept = tok.join(removed, ["doc_id", "_pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("_n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_t"))),
                lambda x: x["_t"],
            ),
            " ",
        ).alias("cleaned_text"),
    )
    totals = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens")
    )
    return totals.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        (F.col("n_tokens") - F.coalesce(F.col("_n_kept"), F.lit(0))).alias(
            "n_removed"
        ),
        F.coalesce(F.col("cleaned_text"), F.lit("")).alias("cleaned_text"),
    )


def q113_v11(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return strip_frequent_grams_v11(docs, k=2, max_doc_permille=80)


# ----------------------------- harness ------------------------------


def memsum() -> float:
    t0 = time.time()
    float(np.sum(np.ones(25_000_000)))
    return round(time.time() - t0, 3)


def force(df: DataFrame) -> None:
    cols = [F.col(f.name) for f in df.schema.fields]
    df.select(F.xxhash64(F.struct(*cols)).alias("_h")).agg(
        F.sum(F.col("_h").cast("decimal(38,0)"))
    ).collect()


def main() -> None:
    spark = get_spark("r12_qfix_ab", shuffle_partitions=32)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    cases = {
        "q41": (q41_v11, registry.QUERIES["q41_grouped_pandas_normalize"]),
        "q152": (q152_v11, registry.QUERIES["q152_ind_profile"]),
        "q113": (q113_v11, registry.QUERIES["q113_boilerplate_strip"]),
    }
    out: dict[str, dict] = {}
    for name, (old, new) in cases.items():
        times: dict[str, list[float]] = {"v11": [], "v12": []}
        mems: list[float] = []
        for variant in ("v11", "v12", "v12", "v11"):  # A B B A
            spark.catalog.clearCache()
            mems.append(memsum())
            fn = old if variant == "v11" else new
            t0 = time.time()
            force(fn(spark, SF_DIR))
            times[variant].append(round(time.time() - t0, 3))
        out[name] = {
            "v11_s": times["v11"],
            "v12_s": times["v12"],
            "min_v11": min(times["v11"]),
            "min_v12": min(times["v12"]),
            "memsum_before_each": mems,
        }
        print(name, out[name], flush=True)
    payload = {
        "purpose": "r12 rewrites (q41 window form, q152 single-pass ind_profile, "
        "q113 marked-pass strip) vs embedded r11 bodies — same session, "
        "A B B A, min-of-2 (conv 24)",
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "sf_dir": SF_DIR,
        "results": out,
    }
    suffix = "" if SF_DIR.endswith("sf0.1") else (
        "_sf" + SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    )
    (Path(__file__).parent / f"r12_qfix_ab{suffix}.json").write_text(
        json.dumps(payload, indent=1)
    )
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
