"""Fuzzed-testdata gate sweep (VERDICT r7 item 3).

The driver REGENERATES the parquet testdata every round, so a query can
pass the gate on this round's data and diverge on the next round's —
the r6→r7 q140 class (which rows land on a decimal→double rounding
boundary is data luck).  This tool converts those classes into
locally-reproducible failures: it derives K seeded perturbations of the
sf0.01 tables and runs the FULL oracle gate against each.

Perturbations are chosen to stress exactly the divergence classes the
gate history has produced, while preserving every schema and value
domain (the gate compares Spark vs DuckDB on the SAME parquet, so
referential integrity is not required for correctness — but domains
are, so queries' filters still select):

- MAGNITUDE: measure columns (prices, event values) scale ×100 on a
  seeded ~4% slice — squared-sum unscaled values cross 2^53 at sf0.01
  (the conv-16 decimal→double class) while every value stays inside
  the documented DECIMAL(12,4) price-domain contract the revenue
  queries are entitled to assume (a ×10^6 probe run correctly
  OVERFLOWED those casts — that is the fuzzer breaking the input
  contract, not the engine breaking);
- TIES: a seeded slice of measures is snapped to exact half-cent /
  dyadic values — the HALF_UP vs HALF_EVEN class (conv 6d/14);
- SHAPE: a seeded ~10% of rows drop per table and row order shuffles —
  group sizes, empty-group edges, and partial-agg merge orders move;
- TIME: order/ship/event timestamps jitter by seeded ± days — date
  bucketing and window contents move;
- DEGENERATE TEXT: a seeded ~2% of document texts become highly
  repetitive — the |distinct grams| <= k·q dedup edge (q194 class);
- UNICODE TEXT (r12): a seeded ~2% of document texts turn multibyte —
  accented replacements plus CJK/emoji tokens appended with PLAIN
  spaces (exotic whitespace is outside the generator's documented
  single-space token contract) — the char-vs-octet semantics family:
  length vs octet_length, char-indexed substring, utf-8 byte hashing,
  binary string sort order, and every tokenizer path must agree
  cross-engine on non-ASCII input;
- NULLS (r8 verdict item 6): a seeded ~2% of nullable measure cells
  (c_acctbal, p_retailprice, o_totalprice, l_extendedprice, value),
  document texts (with n_chars recomputed → NULL), and embedding
  vectors go NULL — the Spark-vs-DuckDB NULL-semantics family
  (min_by/arg_max NULL keys, count(col) vs count(*), asc NULLS FIRST
  vs NULLS LAST defaults, sum over all-NULL groups).  Both engines see
  the SAME parquet, so any red is a real cross-engine divergence, not
  a data-quality complaint.

A separate SKEW seed (r9 verdict item 4; on by default, ``--no-skew``
to disable, ``--skew-only`` to iterate) plants pathological hot spots
instead of value perturbations — the 100 TB failure mode is a hot key
or mega-bucket, not a bad value:

- MEGA TEXT CLASS: a seeded ~10% of documents get ONE identical
  boilerplate text — one minhash/simhash/PPJoin bucket holding the
  whole class (all C(n,2) pairs real, jaccard exactly 1), one
  exact-dedup group, one degenerate |distinct grams| profile;
- MEGA DOCUMENT: one document becomes a ~53 k-char repeated phrase —
  stresses kernel row-slicing and the conv-6b O(n²)-HOF trap (a
  captured-tree n-gram build would take minutes on one row);
- MEGA EMBEDDING CLASS: a seeded ~10% of vectors become ONE fixed
  direction — an LSH bucket NO plane count can split (identical signs
  in every table) and one IVF/semdedup mega-cell, so the blocked-Gram
  slicing and max_bucket guards face their design case;
- HOT JOIN KEYS: ~20% of lineitems point at one part, ~20% of orders
  at one customer, ~20% of events at one user — shuffle-key skew in
  every major join/groupBy/window family, all values in-domain.

Skew thresholds are calibrated to the operators' documented input
contracts (mega classes stay under max_bucket=1000 at sf0.01; planted
geometry keeps every cosine far from decision thresholds) — a seed
that BREAKS a contract tests the fuzzer, not the engine (see the
×10^6 magnitude note above).

Keys and enum domains (event_type, flags, priorities) are preserved;
embedding dimensionality is preserved for non-NULL vectors.

Usage:
  python tools/fuzz_gate.py                 # 2 seeds, full registry
  python tools/fuzz_gate.py --seeds 3 --names q140_grouped_ols_trend
  python tools/fuzz_gate.py --keep          # keep generated dirs

Exit 0 iff every seed's gate run passes.
"""

from __future__ import annotations

import argparse
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.01"
HERE = Path(__file__).resolve().parent


def _gen(seed: int, out: Path) -> None:
    """Write a seeded perturbation of every sf0.01 table to ``out``."""
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO 8")

    def h(expr: str, mod: int) -> str:
        # seeded deterministic per-row coin in [0, mod)
        return f"(hash(CAST({expr} AS VARCHAR) || '#s{seed}') % {mod})"

    def nullify(col: str, key: str) -> str:
        # independent salt: the magnitude/tie coins share h(key, ·), so a
        # same-salt slot would correlate with them across mod choices
        return (
            f"CASE WHEN (hash(CAST({key} AS VARCHAR) || '#null#s{seed}')"
            f" % 50) = 0 THEN NULL ELSE {col} END"
        )

    def copy(table: str, select: str) -> None:
        con.execute(
            f"COPY ({select}) TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )

    def jitter_price(col: str, key: str) -> str:
        """Magnitude + tie stress for a positive measure column:
        ~4% of rows scale ×100 (squared-decimal sums cross 2^53 while
        values stay inside the DECIMAL(12,4) domain contract), ~4%
        snap to an exact half-cent (x.xx5 — the rounding-tie class),
        the rest keep the original value."""
        return (
            f"CASE WHEN {h(key, 25)} = 0 THEN {col} * 100.0 "
            f"WHEN {h(key, 25)} = 1 THEN floor({col}) + 0.005 "
            f"ELSE {col} END"
        )

    def keep(key: str) -> str:
        return f"{h(key, 10)} < 9"  # drop a seeded ~10%

    def day_jitter(col: str, key: str) -> str:
        return (
            f"{col} + INTERVAL 1 DAY * (CAST({h(key, 61)} AS INTEGER) - 30)"
        )

    src = lambda t: f"read_parquet('{SRC}/{t}.parquet')"  # noqa: E731

    # dimension tables pass through (domains ARE the data)
    for t in ("region", "nation"):
        copy(t, f"SELECT * FROM {src(t)}")

    copy(
        "customer",
        f"""SELECT c_custkey, c_name, c_nationkey,
              {nullify(
                  f"CASE WHEN {h('c_custkey', 25)} = 0 THEN c_acctbal * 100.0 "
                  "ELSE c_acctbal END", 'c_custkey')} AS c_acctbal,
              c_mktsegment
            FROM {src('customer')} WHERE {keep('c_custkey')}
            ORDER BY {h('c_custkey', 1000003)}""",
    )
    copy(
        "supplier",
        f"SELECT * FROM {src('supplier')} WHERE {keep('s_suppkey')}",
    )
    copy(
        "part",
        f"""SELECT p_partkey, p_name, p_brand, p_type, p_size,
              {nullify(jitter_price('p_retailprice', 'p_partkey'),
                       'p_partkey')} AS p_retailprice
            FROM {src('part')} WHERE {keep('p_partkey')}
            ORDER BY {h('p_partkey', 1000003)}""",
    )
    copy(
        "orders",
        f"""SELECT o_orderkey, o_custkey, o_orderstatus,
              {nullify(jitter_price('o_totalprice', 'o_orderkey'),
                       'o_orderkey')} AS o_totalprice,
              {day_jitter('o_orderdate', 'o_orderkey')} AS o_orderdate,
              o_orderpriority
            FROM {src('orders')} WHERE {keep('o_orderkey')}
            ORDER BY {h('o_orderkey', 1000003)}""",
    )
    copy(
        "lineitem",
        f"""SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
              l_quantity,
              {nullify(jitter_price('l_extendedprice',
                                    "l_orderkey || '-' || l_linenumber"),
                       "l_orderkey || '-' || l_linenumber")}
                AS l_extendedprice,
              l_discount, l_tax, l_returnflag, l_linestatus,
              {day_jitter('l_shipdate',
                          "l_orderkey || '-' || l_linenumber")}
                AS l_shipdate
            FROM {src('lineitem')}
            WHERE {keep("l_orderkey || '-' || l_linenumber")}
            ORDER BY {h("l_orderkey || '-' || l_linenumber", 1000003)}""",
    )
    copy(
        "events",
        f"""SELECT event_id,
              {day_jitter('ts', 'event_id')} AS ts,
              user_id, event_type,
              {nullify(
                  f"CASE WHEN {h('event_id', 25)} = 0 THEN value * 100.0 "
                  f"WHEN {h('event_id', 25)} = 1 THEN floor(value) + 0.005 "
                  "ELSE value END", 'event_id')} AS value,
              props
            FROM {src('events')} WHERE {keep('event_id')}
            ORDER BY {h('event_id', 1000003)}""",
    )
    copy(
        "documents",
        f"""SELECT doc_id, t AS text, lang, source,
              CAST(length(t) AS BIGINT) AS n_chars
            FROM (
              SELECT *,
                {nullify(
                    f"CASE WHEN {h('doc_id', 50)} = 0 "
                    "THEN repeat(substring(text, 1, 3), 12) "
                    f"WHEN {h('doc_id', 50)} = 1 "
                    "THEN 'héllo 日本語 ' || replace(text, 'e', 'é')"
                    " || ' 🎈emoji çédille' "
                    "ELSE text END", 'doc_id')} AS t
              FROM {src('documents')} WHERE {keep('doc_id')}
            )
            ORDER BY {h('doc_id', 1000003)}""",
    )
    copy(
        "embeddings",
        f"""SELECT vec_id,
              {nullify(
                  f"CASE WHEN {h('vec_id', 50)} = 0 "
                  "THEN list_transform(embedding, x -> CAST(0.0 AS FLOAT)) "
                  "ELSE embedding END", 'vec_id')} AS embedding,
              label
            FROM {src('embeddings')} WHERE {keep('vec_id')}
            ORDER BY {h('vec_id', 1000003)}""",
    )
    con.close()


def _gen_skew(seed: int, out: Path) -> None:
    """Write a seeded SKEW perturbation of every sf0.01 table to ``out``
    (hot keys + mega-buckets + one mega-document; see module docstring)."""
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 8")

    def h(expr: str, mod: int) -> str:
        return f"(hash(CAST({expr} AS VARCHAR) || '#skew#s{seed}') % {mod})"

    def copy(table: str, select: str) -> None:
        con.execute(
            f"COPY ({select}) TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )

    src = lambda t: f"read_parquet('{SRC}/{t}.parquet')"  # noqa: E731

    # hot-key targets: the (seed % 17)-th smallest ACTUAL key of each
    # dimension — existence-safe under non-contiguous ids (r10 ADVICE:
    # min(doc_id)+7 silently missed when ids have gaps), and
    # seed-dependent so rotating --first-seed probes a different hot
    # key / mega-document each time (r10 verdict task 8).
    def nth_key(table: str, col: str, n: int):
        row = con.execute(
            f"SELECT DISTINCT {col} FROM {src(table)} ORDER BY {col}"
            f" LIMIT 1 OFFSET {n}"
        ).fetchone()
        if row is None:  # table smaller than the offset — fall back
            row = con.execute(f"SELECT min({col}) FROM {src(table)}").fetchone()
        assert row is not None and row[0] is not None, (table, col, n)
        return row[0]

    off = seed % 17
    hot_part = nth_key("part", "p_partkey", off)
    hot_cust = nth_key("customer", "c_custkey", off)
    hot_user = nth_key("events", "user_id", off)
    mega_doc = nth_key("documents", "doc_id", 7 + off)

    # dimensions and row-identity tables pass through untouched — skew
    # lives on the FK/bucket side, so every hot key stays in-domain
    for t in ("region", "nation", "supplier", "part", "customer"):
        copy(t, f"SELECT * FROM {src(t)}")

    copy(
        "orders",
        f"""SELECT o_orderkey,
              CASE WHEN {h('o_orderkey', 5)} = 0 THEN {hot_cust}
                   ELSE o_custkey END AS o_custkey,
              o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM {src('orders')}""",
    )
    copy(
        "lineitem",
        f"""SELECT l_orderkey,
              CASE WHEN {h("l_orderkey || '-' || l_linenumber", 5)} = 0
                   THEN {hot_part} ELSE l_partkey END AS l_partkey,
              l_suppkey, l_linenumber, l_quantity, l_extendedprice,
              l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM {src('lineitem')}""",
    )
    copy(
        "events",
        f"""SELECT event_id, ts,
              CASE WHEN {h('event_id', 5)} = 0 THEN {hot_user}
                   ELSE user_id END AS user_id,
              event_type, value, props
            FROM {src('events')}""",
    )
    # ~10% of docs share ONE boilerplate text; one doc becomes a ~53 k
    # char repeated phrase.  n_chars recomputed from the final text.
    boiler = (
        "Subscribe to our newsletter for the latest updates and offers. "
        "This boilerplate footer appears on every page of the site. "
        "All rights reserved worldwide."
    )
    copy(
        "documents",
        f"""SELECT doc_id, t AS text, lang, source,
              CAST(length(t) AS BIGINT) AS n_chars
            FROM (
              SELECT doc_id,
                CASE WHEN doc_id = {mega_doc}
                     THEN repeat('the quick brown fox jumps over the lazy dog ', 1200)
                     WHEN {h('doc_id', 10)} = 0 THEN '{boiler}'
                     ELSE text END AS t,
                lang, source
              FROM {src('documents')}
            )""",
    )
    # ~10% of vectors collapse onto ONE fixed non-uniform direction
    # (cosine exactly 1 within the class; isotropic others stay ≤~0.6 —
    # every decision threshold keeps its documented margin)
    copy(
        "embeddings",
        f"""SELECT vec_id,
              CASE WHEN {h('vec_id', 10)} = 0
                   THEN list_transform(range(64),
                        i -> CAST(0.5 + 0.25 * ((i % 8) + 1) AS FLOAT))
                   ELSE embedding END AS embedding,
              label
            FROM {src('embeddings')}""",
    )
    con.close()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--first-seed", type=int, default=101)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument(
        "--plain",
        action="store_true",
        help="run the gate under a driver-style bare session too",
    )
    ap.add_argument(
        "--no-skew", action="store_true", help="skip the skew seed"
    )
    ap.add_argument(
        "--skew-only",
        action="store_true",
        help="run ONLY the skew seed (iteration aid)",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    runs: list[tuple[str, int]] = []
    if not args.skew_only:
        runs += [("value", args.first_seed + i) for i in range(args.seeds)]
    if not args.no_skew:
        runs.append(("skew", args.first_seed))
    if not runs:
        # e.g. --skew-only with --no-skew, or --seeds 0 with --no-skew —
        # either would print "FUZZ PASS" over zero runs, a vacuous green
        # (r10 ADVICE; message generalized r12)
        ap.error(
            "selected flags produce no runs "
            "(check --seeds/--skew-only/--no-skew)"
        )

    failures = []
    for kind, seed in runs:
        d = Path(tempfile.mkdtemp(prefix=f"fuzzgate-{kind}-s{seed}-"))
        print(f"== {kind} seed {seed}: generating {d}", flush=True)
        (_gen_skew if kind == "skew" else _gen)(seed, d)
        r = subprocess.run(
            [
                sys.executable,
                str(HERE / "check_correctness.py"),
                "--sf-dir",
                str(d),
                *(["--plain"] if args.plain else []),
                *args.names,
            ],
            cwd=str(HERE.parent),
        )
        if r.returncode != 0:
            failures.append(f"{kind}:{seed}")
        if not args.keep:
            shutil.rmtree(d, ignore_errors=True)
    if failures:
        print(f"FUZZ FAIL: seeds {failures}")
        return 1
    print(f"FUZZ PASS: {len(runs)} runs")
    return 0


if __name__ == "__main__":
    sys.exit(main())
