"""Empirical scale probe: time the registry at sf0.1 and at a generated
~sf1.0 (10×) dataset, and report per-query scaling ratios.

The 100×-scale claims in SCALE.md are plan-shape arguments; this adds a
measured 10× data point (VERDICT r2 item 4).  The sf1 dataset is derived
from the driver's sf0.1 parquet (we cannot write /root/testdata) by
10-way replication with KEY SHIFTS that preserve referential integrity
(orderkey/custkey/suppkey/partkey/doc_id/vec_id/user_id all shift
together by replica), written as ONE parquet file per table via DuckDB
so the streaming sources' ``pathGlobFilter`` still matches.

Replication is workload-shape-preserving, not literal: literal copies
would make every document 10-way near-duplicated (dedup pair output goes
quadratic in replicas — an artifact, not a scaling fact).  Instead:

- documents: replica i>0 suffixes every TOKEN with ``_i`` — zero shingle
  overlap across replicas, identical within-replica structure;
- embeddings: replica i cyclically rotates the vector by i dims — the
  within-replica neighborhood structure is preserved, cross-replica
  cosine decorrelates;
- events: user_id shifts → same per-user temporal density;
- region/nation stay fixed (dimension tables do not grow with SF in
  TPC-H either).

A SECOND measured decade (r8 verdict item 3): ``gen10`` replicates
probes/sf1 by 10 again into probes/sf10 (~60 M lineitem rows, ~2.5 GB
parquet) with the same key-shift scheme.  Two second-level differences,
both to keep the workload shape linear rather than artifact-quadratic:

- documents: second-level replica j>0 suffixes tokens with ``-a{j}``
  (distinct from the first level's ``_i``) — still zero cross-replica
  shingle overlap;
- embeddings: second-level replicas apply a per-replica seeded ±1
  SIGN-FLIP pattern (a diagonal orthogonal transform: within-replica
  cosines are exactly preserved, cross-replica decorrelates) instead of
  a second rotation — composing two rotations collides (rot i then
  rot j = rot i+j, and distinct (i, j) pairs with equal sums would make
  EXACT duplicate vectors under different vec_ids, inflating near-dup
  pair counts super-linearly as a pure artifact).

Usage:
  python tools/scale_probe.py gen      # build probes/sf1 (gitignored)
  python tools/scale_probe.py gen10    # build probes/sf10 from sf1
  SPARK_GRAFT_SF_DIR=$PWD/probes/sf1 python bench.py       # time at 10x
  python tools/scale_probe.py report BENCH_sf01.json BENCH_sf1.json

The generated datasets live under the repo (probes/sf1, probes/sf10,
gitignored) — the project env rule is "never write outside /root/repo".
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

SRC = "/root/testdata/sf0.1"
DST = str(Path(__file__).resolve().parent.parent / "probes" / "sf1")
REPLICAS = 10

# key columns to shift per table: {table: [cols]}
SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# key -> (owning table, owning column) for consistent shift amounts
KEY_SPACE = {
    "c_custkey": ("customer", "c_custkey"),
    "o_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "l_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def gen(src: str = SRC, dst: str = DST, level: int = 1) -> None:
    """10-way shape-preserving replication of ``src`` into ``dst``.
    ``level=1`` is the original sf0.1→sf1 scheme (token ``_i`` suffix,
    embedding rotation); ``level=2`` is the sf1→sf10 scheme (token
    ``-a{j}`` suffix, embedding sign-flip — see module docstring for
    why rotation must not compose)."""
    import duckdb

    con = duckdb.connect()
    Path(dst).mkdir(parents=True, exist_ok=True)

    spans: dict[tuple[str, str], int] = {}
    for tbl, col in set(KEY_SPACE.values()):
        (mx,) = con.sql(
            f"SELECT max({col}) + 1 FROM read_parquet('{src}/{tbl}.parquet')"
        ).fetchone()
        spans[(tbl, col)] = int(mx)

    for tbl in ("region", "nation"):
        con.sql(
            f"COPY (SELECT * FROM read_parquet('{src}/{tbl}.parquet')) "
            f"TO '{dst}/{tbl}.parquet' (FORMAT PARQUET)"
        )
        print(f"{tbl}: copied", flush=True)

    def doc_text(i: int) -> str:
        suffix = f"_{i}" if level == 1 else f"-a{i}"
        return (
            "array_to_string(list_transform(string_split(text, ' '),"
            f" t -> t || '{suffix}'), ' ')"
        )

    def cust_name(i: int) -> str:
        # Distinct 3-char replica suffixes (level 1: a-i, level 2: j-s)
        # keep every cross-replica name pair at edit distance >= 3 — an
        # UNsuffixed replica would duplicate each c_name string 10x per
        # decade and the ed<=2 self-join's (q194) true output would grow
        # QUADRATICALLY in replicas as a pure generator artifact (the
        # sf10 probe timed out on exactly this; the r8 sf1 "true-output
        # growth" attribution was partly this too).  Within-replica
        # similarity structure is untouched: one shared suffix can't
        # change pairwise distances inside a replica.
        off = 97 if level == 1 else 106  # 'a'.. / 'j'..
        return f"c_name || ' ' || repeat(chr({off} + {i}), 3)"

    def emb(i: int) -> str:
        if level == 1:
            return f"list_concat(embedding[{i + 1}:], embedding[1:{i}])"
        # seeded diagonal ±1: orthogonal, so within-replica cosines are
        # exactly preserved; distinct patterns per replica → no exact
        # cross-replica duplicates (unlike composed rotations)
        return (
            "list_transform(embedding, (x, d) -> CAST(x * (CASE WHEN "
            f"(hash(d || '-flip{i}') % 2) = 0 THEN 1.0 ELSE -1.0 END)"
            " AS FLOAT))"
        )

    for tbl, shift_cols in SHIFTS.items():
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{tbl}.parquet')"
            ).fetchall()
        ]
        branches = []
        for i in range(REPLICAS):
            sel = []
            for c in cols:
                if c in shift_cols:
                    t_o, c_o = KEY_SPACE[c]
                    sel.append(f"{c} + {i * spans[(t_o, c_o)]} AS {c}")
                elif tbl == "customer" and c == "c_name" and i > 0:
                    sel.append(f"{cust_name(i)} AS c_name")
                elif tbl == "documents" and c == "text" and i > 0:
                    sel.append(f"{doc_text(i)} AS text")
                elif tbl == "documents" and c == "n_chars" and i > 0:
                    sel.append(
                        f"CAST(len({doc_text(i)}) AS BIGINT) AS n_chars"
                    )
                elif tbl == "embeddings" and c == "embedding" and i > 0:
                    sel.append(f"{emb(i)} AS embedding")
                else:
                    sel.append(c)
            branches.append(
                f"SELECT {', '.join(sel)} FROM read_parquet('{src}/{tbl}.parquet')"
            )
        q = " UNION ALL ".join(branches)
        con.sql(f"COPY ({q}) TO '{dst}/{tbl}.parquet' (FORMAT PARQUET)")
        (n,) = con.sql(f"SELECT count(*) FROM read_parquet('{dst}/{tbl}.parquet')").fetchone()
        print(f"{tbl}: {n} rows", flush=True)


def report(base_path: str, scaled_path: str) -> None:
    base = json.loads(Path(base_path).read_text())
    scaled = json.loads(Path(scaled_path).read_text())
    rows = []
    for name, t0 in base["queries"].items():
        t1 = scaled["queries"].get(name)
        if t1 is None:
            continue
        rows.append((name, t0, t1, round(t1 / t0, 2) if t0 > 0 else float("inf")))
    rows.sort(key=lambda r: -r[3])
    print(f"{'query':42s} {'sf0.1':>8s} {'sf1':>8s} {'ratio':>6s}")
    for name, t0, t1, r in rows:
        print(f"{name:42s} {t0:8.2f} {t1:8.2f} {r:6.2f}")
    tot0 = sum(r[1] for r in rows)
    tot1 = sum(r[2] for r in rows)
    print(f"{'TOTAL':42s} {tot0:8.2f} {tot1:8.2f} {tot1 / tot0:6.2f}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "gen":
        gen()
    elif len(sys.argv) > 1 and sys.argv[1] == "gen10":
        sf10 = str(Path(__file__).resolve().parent.parent / "probes" / "sf10")
        gen(src=DST, dst=sf10, level=2)
    elif len(sys.argv) > 1 and sys.argv[1] == "report":
        report(sys.argv[2], sys.argv[3])
    else:
        print(__doc__)
