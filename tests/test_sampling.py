"""Unit tests for dataset-assembly sampling operators (sampling.py +
cross_corpus_contamination): determinism, caps, band edges, packing
invariants — the properties the oracle gate can't see (stability across
reruns and append-only growth)."""

import pytest
from pyspark.sql import functions as F

from etl_marketeye_airflow_spark.operators.sampling import (
    hash_split,
    length_buckets,
    quantile_band,
    stratified_cap,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_hash_split_deterministic_and_stable_under_append(spark, docs):
    """Split membership is a pure function of the key: recomputing on a
    SUBSET assigns every surviving doc the same split (no migration on
    append/delete — the property RNG-based splits lack)."""
    full = {r.doc_id: r.split for r in hash_split(docs, "doc_id").collect()}
    subset = docs.filter(F.col("doc_id") % 3 == 0)
    sub = {r.doc_id: r.split for r in hash_split(subset, "doc_id").collect()}
    assert sub == {k: v for k, v in full.items() if k % 3 == 0}
    # fractions land near 80/10/10 (md5 is uniform; corpus is small so
    # allow wide tolerance)
    n = len(full)
    train = sum(1 for v in full.values() if v == "train") / n
    assert 0.7 < train < 0.9


def test_stratified_cap_bounds_every_group(spark, docs):
    out = stratified_cap(docs, "lang", "doc_id", cap=5)
    per_group = out.groupBy("lang").count().collect()
    assert all(r["count"] <= 5 for r in per_group)
    # deterministic: same pick on rerun
    a = sorted(r.doc_id for r in out.select("doc_id").collect())
    b = sorted(
        r.doc_id
        for r in stratified_cap(docs, "lang", "doc_id", cap=5)
        .select("doc_id")
        .collect()
    )
    assert a == b


def test_quantile_band_drops_both_tails(spark, docs):
    kept = quantile_band(docs, "n_chars", 0.10, 0.90)
    lo, hi = kept.agg(F.min("n_chars"), F.max("n_chars")).first()
    full_lo, full_hi = docs.agg(F.min("n_chars"), F.max("n_chars")).first()
    assert full_lo < lo and hi < full_hi  # both tails actually trimmed
    assert 0 < kept.count() < docs.count()


def test_length_buckets_cumulative_invariants(spark, docs):
    rows = length_buckets(docs, "n_chars", 64).orderBy("bucket").collect()
    assert [r.bucket for r in rows] == sorted({r.bucket for r in rows})
    running = 0
    for r in rows:
        running += r.bucket_volume
        assert r.cum_volume == running  # exact integer cumulative
    assert running == docs.agg(F.sum("n_chars")).first()[0]


def test_contamination_finds_planted_cross_source_dups(spark, docs):
    """Only true overlaps fire: the synthetic corpus has a handful of
    planted duplicate docs across sources — random word soup must NOT
    produce spurious 5-gram hits corpus-wide."""
    from etl_marketeye_airflow_spark.operators.dedup import (
        cross_corpus_contamination,
    )

    src = docs.filter(F.col("source") == "src1")
    rest = docs.filter(F.col("source") != "src1")
    hits = cross_corpus_contamination(rest, src, shingle_k=5)
    n_hits = hits.count()
    assert n_hits < rest.count() * 0.1  # not everything
    assert (hits.agg(F.min("n_shared_grams")).first()[0] or 1) >= 1


def test_hash_split_drives_partitioned_write_with_pruning(spark, docs, tmp_path):
    """The split column partitions a write; reading one split back scans
    only that directory (PartitionFilters, zero data filters) — the
    zero-shuffle split-then-write path hash_split's docstring promises."""
    out = str(tmp_path / "by_split")
    hash_split(docs, "doc_id").write.partitionBy("split").parquet(out)
    val = spark.read.parquet(out).filter(F.col("split") == "val")
    plan = val._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(split" in plan
    assert "PushedFilters: []" in plan  # nothing left to push -- pruning did it
    expect = {r.doc_id for r in hash_split(docs, "doc_id")
              .filter(F.col("split") == "val").select("doc_id").collect()}
    assert {r.doc_id for r in val.select("doc_id").collect()} == expect


def test_temperature_mix_flattens_and_is_deterministic(spark):
    """alpha=0.5 mixing must (a) be a pure function of content — two
    runs identical; (b) up-weight the small source: its KEPT FRACTION
    exceeds the big source's (expected picks ∝ sqrt(mass), so rate ∝
    sqrt(W)/n falls with source size); (c) keep everything when scale
    pushes every rate past 1."""
    from etl_marketeye_airflow_spark.operators.sampling import temperature_mix

    rows = [(i, "big", 100) for i in range(400)] + [
        (1000 + i, "small", 100) for i in range(25)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")

    kept1 = {r.doc_id for r in temperature_mix(df, "source", "doc_id", "n_chars").collect()}
    kept2 = {r.doc_id for r in temperature_mix(df, "source", "doc_id", "n_chars").collect()}
    assert kept1 == kept2

    # with scale=0.5: big rate = 0.5*sqrt(40000)/400 = 0.25, small =
    # 0.5*sqrt(2500)/25 = 1.0 — the small source keeps a larger fraction
    kept_s = temperature_mix(df, "source", "doc_id", "n_chars", scale=0.5)
    got = {r[0]: r[1] for r in kept_s.groupBy("source").count().collect()}
    assert got.get("small", 0) / 25 > got.get("big", 0) / 400

    all_kept = temperature_mix(df, "source", "doc_id", "n_chars", scale=100.0)
    assert all_kept.count() == 425


def test_temperature_mix_source_isolation(spark):
    """Per-source factors mean one source's presence cannot change
    another's accept decisions: dropping source B entirely leaves
    source A's kept set identical (no cross-group normalization — the
    property that makes the op safe for incremental/per-partition
    dataset builds)."""
    from etl_marketeye_airflow_spark.operators.sampling import temperature_mix

    rows = [(i, "a", 50 + i % 7) for i in range(300)] + [
        (5000 + i, "b", 80) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    both = {
        r.doc_id
        for r in temperature_mix(df, "source", "doc_id", "n_chars", scale=0.4).collect()
        if r.source == "a"
    }
    only_a = {
        r.doc_id
        for r in temperature_mix(
            df.filter(F.col("source") == "a"), "source", "doc_id", "n_chars", scale=0.4
        ).collect()
    }
    assert both == only_a


def test_weighted_sample_grouped_matches_per_group_runs(spark):
    """group_col sampling == running the global sampler per stratum
    with k = stratum cut (same seed, same keys): the grouped window cut
    must select exactly the per-group top-k sets."""
    from etl_marketeye_airflow_spark.operators.sampling import weighted_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    grouped = weighted_sample(docs, "n_chars", k=5, group_col="source")
    got = {
        src: sorted(r.doc_id for r in rows)
        for src, rows in (
            (s, [r for r in grouped.collect() if r.source == s])
            for s in {r.source for r in grouped.collect()}
        )
    }
    for src in got:
        solo = weighted_sample(
            docs.filter(F.col("source") == src), "n_chars", k=5
        )
        assert got[src] == sorted(r.doc_id for r in solo.collect()), src
    # every stratum present with exactly min(5, stratum size) rows
    sizes = {
        r.source: r.n
        for r in docs.filter(F.col("n_chars") > 0)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    counts = {s: len(v) for s, v in got.items()}
    assert counts == {s: min(5, n) for s, n in sizes.items()}


# ------------------------------------------------- bootstrap_replicates


def test_bootstrap_weights_match_python_and_are_poisson_ish(spark):
    """Weights replayed in pure python from the same md5 coins match
    exactly; the pooled weight mean sits near 1 (Poisson(1)) and the
    unweighted original total is recoverable per replicate."""
    import hashlib

    from etl_marketeye_airflow_spark.operators.sampling import (
        POISSON1_T_FX40,
        bootstrap_replicates,
    )

    rows = [(i, 100 + i) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, v long")
    out = bootstrap_replicates(df, "id", "v", n_replicates=8).collect()
    assert len(out) == 8

    def w_py(i, r):
        h = hashlib.md5(f"boot-v1:{i}:{r}".encode()).hexdigest()
        coin = int(h[:10], 16)
        return sum(1 for t in POISSON1_T_FX40 if coin >= t)

    for row in out:
        want_n = sum(w_py(i, row.rep) for i, _ in rows)
        want_s = sum(w_py(i, row.rep) * v for i, v in rows)
        assert (row.n_eff, row.sum_w_value) == (want_n, want_s), row.rep
    pooled = sum(r.n_eff for r in out) / (8 * len(rows))
    assert 0.8 < pooled < 1.2


def test_bootstrap_grouped_and_determinism(spark):
    """Grouped replicates keep groups independent; rerun is
    bit-identical; n_replicates guard."""
    import pytest as _pytest

    from etl_marketeye_airflow_spark.operators.sampling import (
        bootstrap_replicates,
    )

    rows = [("a", i, 10) for i in range(50)] + [("b", 100 + i, 20)
                                                for i in range(50)]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    r1 = sorted(map(tuple, bootstrap_replicates(
        df, "id", "v", 4, ["g"]).collect()))
    r2 = sorted(map(tuple, bootstrap_replicates(
        df, "id", "v", 4, ["g"]).collect()))
    assert r1 == r2 and len(r1) == 8
    for row in r1:
        # every weighted mean equals the constant group value exactly
        if row[2] > 0:
            assert row[4] == (10.0 if row[0] == "a" else 20.0)
    with _pytest.raises(ValueError):
        bootstrap_replicates(df, "id", "v", 0)


# --------------------------------------------- proportional_allocation


def test_proportional_allocation_hamilton_properties(spark):
    """Σk == K exactly; quotas within 1 of the real-valued share
    (Hamilton's quota property); leftover ties go to the smaller
    stratum key; K=0 gives all zeros."""
    from etl_marketeye_airflow_spark.operators.sampling import (
        proportional_allocation,
    )

    sizes = {"a": 10, "b": 10, "c": 10, "d": 3}  # K=10: rem ties a/b/c
    rows = [(s,) for s, n in sizes.items() for _ in range(n)]
    df = spark.createDataFrame(rows, "src string")
    for K in (0, 7, 10, 33):
        got = {r.stratum: r.k
               for r in proportional_allocation(df, "src", K).collect()}
        assert sum(got.values()) == K, K
        N = sum(sizes.values())
        for s, n in sizes.items():
            exact = K * n / N
            assert exact - 1 < got[s] < exact + 1 or got[s] in (
                int(exact), int(exact) + 1
            ), (K, s)
    got10 = {r.stratum: r.k
             for r in proportional_allocation(df, "src", 10).collect()}
    # base = 3,3,3,0; remainders tie for a,b,c (1/33 short each) and d
    # gets the largest remainder (30/33): d takes the single leftover
    assert got10 == {"a": 3, "b": 3, "c": 3, "d": 1}


def test_rendezvous_minimal_movement_and_tie_free(spark):
    """The HRW property: adding a 9th shard moves ~1/9 of keys (mod-N
    would move ~8/9); assignments are deterministic across reruns;
    coins are tie-free per key on a real id range."""
    from etl_marketeye_airflow_spark.operators.sampling import (
        rendezvous_assign,
    )

    df = spark.createDataFrame([(i,) for i in range(900)], "doc_id long")
    a8 = {r.k: r.shard for r in rendezvous_assign(df, "doc_id", 8).collect()}
    a8b = {r.k: r.shard for r in rendezvous_assign(df, "doc_id", 8).collect()}
    assert a8 == a8b
    a9 = {r.k: r.shard for r in rendezvous_assign(df, "doc_id", 9).collect()}
    moved = sum(1 for k in a8 if a8[k] != a9[k])
    frac = moved / len(a8)
    assert 0.05 < frac < 0.2, frac  # ~1/9 ± noise
    # every key that moved, moved TO the new shard (HRW's exact form)
    assert all(a9[k] == 8 for k in a8 if a8[k] != a9[k])
    # balance: no shard under 8 shards is empty or >2x the mean
    from collections import Counter

    c = Counter(a8.values())
    assert set(c) == set(range(8)) and max(c.values()) < 2 * (900 / 8)
