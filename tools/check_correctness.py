"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet tables, then compares row count, column-name set,
and an order-insensitive canonical value multiset.  Keep this strict —
if it passes here, the driver's hash compare should pass too.

Usage:  python tools/check_correctness.py [--sf-dir /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import datetime as dt
import decimal
import math
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def canon_value(v):
    if v is None:
        return "␀"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            return "0"
        # bit-exact: the driver hashes raw values, so a cross-engine
        # last-ULP difference is a driver FAIL — `%.9g` masked exactly
        # that (q140's 2-of-1494 last-bit intercept diffs passed locally
        # while red on the driver, r6).  hex() is lossless.
        return v.hex()
    if isinstance(v, decimal.Decimal):
        # Tagged + exact: a Decimal must meet a Decimal on the other
        # side (same digits after scale-normalization), NEVER an int or
        # float.  The old `%.9g`-of-float collapse made DuckDB HUGEINT
        # sums / DECIMAL divisions locally indistinguishable from Spark
        # bigint/double results — exactly how the q87 mismatch stayed
        # invisible until the driver's stricter hash caught it (r4/r5).
        d = v.normalize()
        return "dec:" + format(d, "f")
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    return str(v)


def canon_rows(cols: list[str], rows) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon_value(r[i]) for i in order) for r in rows)


def canon_pd_value(v):
    """Canon over a PANDAS-materialized cell — the driver's comparison
    path (DuckDB ``.df()`` vs Spark ``toPandas()``).  This pass exists
    because pandas mangles types the cursor fetch keeps exact: DuckDB
    renders DECIMAL as float64 while Spark yields object-dtype
    ``decimal.Decimal`` — so any decimal output column hashes unequal on
    the driver at ANY magnitude (the r6/r7 q140-class reds, invisible to
    the exact pass).  Decimal stays TAGGED here (never collapsed to
    float) precisely so that divergence reproduces locally."""
    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return "␀"
    if isinstance(v, (bool, np.bool_)):
        return "true" if bool(v) else "false"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "nan"
        if f == 0:
            return "0"
        return f.hex()
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        return "dec:" + format(v.normalize(), "f")
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return "␀"
        # a DATE column reaches pandas as datetime.date objects from
        # Spark but as midnight datetime64 from DuckDB `.df()`; the
        # driver compares date outputs green (q05 r7), so midnight
        # tz-naive timestamps canon as the date.  The exact cursor
        # pass (which sees true dates on both sides) runs first, so
        # this cannot mask a date-value divergence.
        if v.tz is None and v == v.normalize():
            return v.date().isoformat()
        return v.isoformat(sep=" ")
    if isinstance(v, dt.datetime):
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return v.date().isoformat()
        return v.isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    try:
        if pd.isna(v):  # NaT and friends in object columns
            return "␀"
    except (TypeError, ValueError):
        pass
    return str(v)


def canon_pd_rows(pdf) -> list[tuple]:
    cols = sorted(pdf.columns)
    return sorted(
        tuple(canon_pd_value(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--plain",
        action="store_true",
        help="bare SparkSession (driver-style: no UTC/AQE/memory tuning) — "
        "catches accidental dependence on our tuned session confs",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entry

    if args.plain:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("check-correctness-plain")
            # driver default heap (1g) OOMs the ANN/dedup queries before
            # any real divergence can show; memory is env capacity, not a
            # semantic conf — everything else stays stock
            .config("spark.driver.memory", "8g")
            .getOrCreate()
        )
    else:
        from etl_marketeye_airflow_spark.session import get_spark

        spark = get_spark("check-correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = args.names or list(qs)
    failures = []
    t_start = time.time()
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf_dir)
            s_cols = sdf.columns
            s_rows = sdf.collect()
            # operators persist intra-query fan-out bases with no
            # unpersist path — clear between queries (same as bench.py)
            # so a 67-query session doesn't accumulate dead cache entries
            spark.catalog.clearCache()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark raised {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only check, {len(s_rows)} rows "
                  f"({time.time()-t0:.1f}s) [no oracle]")
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
            d_types = {
                r[0]: r[1]
                for r in con.execute(
                    f"DESCRIBE (\n{oracles[name]}\n)"
                ).fetchall()
            }
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb raised {type(e).__name__}: {e}")
            continue

        problems = []
        # Wide-type audit (q87 class): DuckDB HUGEINT fetches as a plain
        # Python int, so the value compare can't see it — but Spark has
        # no int128, so the driver's arrow-level hash WILL diverge.
        # Same for a DECIMAL on one side meeting a non-decimal on the
        # other (the canon now tags Decimal values, this names the
        # column).  Every such oracle needs an explicit CAST.
        s_types = dict(sdf.dtypes)
        # Registry-wide output-shape lint: the driver canonicalizes via
        # pandas sort_values, which CRASHES on list/dict cells
        # (TypeError: unhashable type 'list' — q158/q161, r6).  Our own
        # canon stringifies them, so without this lint a nested output
        # passes locally while unverifiable on the driver.  Stringify
        # (array_join / array_to_string) or explode before returning.
        for c, t in s_types.items():
            if t.startswith(("array<", "map<", "struct<")):
                problems.append(
                    f"spark col {c!r} is {t} — nested outputs crash the "
                    "driver's canonicalizer; stringify or explode"
                )
        for c, t in d_types.items():
            tu = t.upper()
            if tu.endswith("]") or tu.startswith(("MAP(", "STRUCT(")):
                problems.append(
                    f"oracle col {c!r} is {t} — nested outputs crash the "
                    "driver's canonicalizer; stringify or explode"
                )
        # Decimal is an INTERMEDIATE type, never an OUTPUT type (conv 19;
        # r7 verdict root cause): the driver's pandas canonicalization
        # renders DuckDB decimals as float64 but Spark decimals as
        # Decimal objects — ANY decimal output column is driver-red,
        # independent of magnitude.  Reject on EITHER side; ship exact
        # decimal payloads as digit strings instead.
        for c, t in s_types.items():
            if t.startswith("decimal"):
                problems.append(
                    f"spark col {c!r} is {t} — decimal outputs never "
                    "survive the driver's pandas canon; cast to string"
                )
        for c, t in d_types.items():
            tu = t.upper()
            if "HUGEINT" in tu:
                problems.append(f"oracle col {c!r} is {t} — CAST it "
                                "(Spark has no int128)")
            if tu.startswith("DECIMAL"):
                problems.append(
                    f"oracle col {c!r} is {t} — decimal outputs never "
                    "survive the driver's pandas canon; CAST AS VARCHAR"
                )
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"columns spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            cs, cd = canon_rows(s_cols, [tuple(r) for r in s_rows]), canon_rows(d_cols, d_rows)
            if cs != cd:
                diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
                problems.append(f"values differ, first diffs: {diffs}")
        if not problems:
            # driver-faithful pass: both result sets re-materialized
            # through pandas, the way the driver actually compares (r7
            # verdict item 2).  Catches dtype classes the exact cursor
            # fetch is blind to.
            try:
                pdf_s = sdf.toPandas()
                pdf_d = con.execute(oracles[name]).df()
                cps, cpd = canon_pd_rows(pdf_s), canon_pd_rows(pdf_d)
                if cps != cpd:
                    diffs = [
                        (a, b) for a, b in zip(cps, cpd) if a != b
                    ][:3]
                    problems.append(
                        "PANDAS-path values differ (driver-red even "
                        f"though exact pass agreed), first diffs: {diffs}"
                    )
            except Exception as e:  # noqa: BLE001
                problems.append(
                    f"PANDAS-path comparison raised {type(e).__name__}: "
                    f"{e} — the driver's canonicalizer would crash too"
                )
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"PASS {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s)")

    print(f"\n{len(names) - len(failures)}/{len(names)} passed "
          f"({time.time()-t_start:.0f}s wall)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
