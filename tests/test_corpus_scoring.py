"""Unit tests for the round-4 corpus-scoring / assembly operators:
fixed-point dyadic log2, unigram-LM surprisal, TF-IDF top-k, shard
shuffle, and incremental ingest — the properties the oracle gate can't
see (approximation bounds, rerun stability, append/admission
semantics)."""

import math

import pytest
from pyspark.sql import functions as F

from etl_marketeye_airflow_spark.operators.corpus import (
    FLOG2_SCALE,
    tfidf_topk,
    unigram_surprisal,
    with_flog2_fx,
)
from etl_marketeye_airflow_spark.operators.dedup import incremental_ingest
from etl_marketeye_airflow_spark.operators.sampling import shard_assign

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_flog2_fx_bounds_and_exact_powers(spark):
    """flog2_fx is exact at powers of two and within 0.086 bits of true
    log2 everywhere (the known max error of linear interpolation
    between powers of two)."""
    ns = [1, 2, 3, 5, 7, 8, 100, 1023, 1024, 1025, 999_999, 2**40 - 1]
    df = spark.createDataFrame([(n,) for n in ns], "n long")
    out = {r.n: r.fx for r in with_flog2_fx(df, "n", "fx").collect()}
    for n in ns:
        approx = out[n] / FLOG2_SCALE
        true = math.log2(n)
        assert abs(approx - true) <= 0.086 + 1e-6, (n, approx, true)
        if n & (n - 1) == 0:  # power of two → exact
            assert out[n] == int(true) * FLOG2_SCALE


def test_unigram_surprisal_hand_corpus(spark):
    """4-token corpus 'a a a b': N=4, p(a)=3/4, p(b)=1/4.
    flog2 is exact here (all counts/N hit powers of two except 3:
    flog2(3)=1.5).  doc1='a a a b' → per-token s = flog2(4)-flog2(cnt):
    a: 2-1.5=0.5 (×3), b: 2-0=2 → sum 3.5 bits, mean 0.875."""
    df = spark.createDataFrame(
        [(1, "a a a b")], "doc_id long, text string"
    )
    row = unigram_surprisal(df).collect()[0]
    assert row.n_tokens == 4
    assert row.surprisal_fx == int(3.5 * FLOG2_SCALE)
    assert abs(row.mean_surprisal_bits - 0.875) < 1e-12


def test_tfidf_topk_ranks_rare_terms(spark):
    """Term unique to one doc outranks a term present everywhere."""
    df = spark.createDataFrame(
        [
            (1, "common common zebra"),
            (2, "common filler filler"),
            (3, "common other words"),
        ],
        "doc_id long, text string",
    )
    top = tfidf_topk(df, k=1).collect()
    by_doc = {r.doc_id: r.token for r in top}
    assert by_doc[1] == "zebra"  # df=1 beats 'common' (df=3, idf=0)
    # 'common' appears in every doc → idf_fx = 0 → score 0, never top
    # unless nothing else exists
    assert all(r.token != "common" for r in top)


def test_tfidf_scores_integer_exact(spark, docs):
    """score_fx = tf * idf_fx recomputes exactly from components."""
    out = tfidf_topk(docs.limit(50), k=3)
    assert dict(out.dtypes)["score_fx"] == "bigint"
    assert out.filter(F.col("score_fx") < 0).count() == 0


def test_shard_assign_deterministic_and_dense(spark, docs):
    d = docs.select("doc_id")
    a = shard_assign(d, "doc_id", n_shards=8).collect()
    b = shard_assign(d, "doc_id", n_shards=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # positions are dense 1..len within every shard
    from collections import defaultdict

    shards = defaultdict(list)
    for r in a:
        shards[r.shard].append(r.pos)
    assert set(shards) <= set(range(8))
    for poss in shards.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # a different seed produces a different order
    c = shard_assign(d, "doc_id", n_shards=8, seed="other").collect()
    assert {(r.doc_id, r.shard, r.pos) for r in c} != {
        (r.doc_id, r.shard, r.pos) for r in a
    }


def test_incremental_ingest_admission_semantics(spark):
    """Intra-batch dups collapse to min id; anything already in the
    corpus (by normalized content) is refused; whitespace/case
    variants count as the same content."""
    corpus = spark.createDataFrame(
        [(1, "existing doc"), (2, "another one")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "brand new"),
            (11, "brand new"),          # intra-batch dup → keeper 10
            (12, "  Existing   DOC "),  # normalized dup of corpus 1
            (13, "fresh content"),
        ],
        "doc_id long, text string",
    )
    admitted = {r.doc_id for r in incremental_ingest(corpus, batch).collect()}
    assert admitted == {10, 13}


def test_incremental_ingest_idempotent(spark, docs):
    """Re-ingesting an already-admitted batch admits nothing."""
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    first = incremental_ingest(corpus, batch)
    grown = corpus.select("doc_id", "text").unionByName(
        batch.join(first.select("doc_id"), "doc_id", "left_semi").select(
            "doc_id", "text"
        )
    )
    again = incremental_ingest(grown, batch)
    assert again.count() == 0


def test_bloom_decontaminate_equals_exact(spark, docs):
    """The bloom prefilter is lossless: output is row-identical to the
    exact inverted-index operator (no false negatives by construction;
    false positives die in the verify join)."""
    from etl_marketeye_airflow_spark.operators.dedup import (
        bloom_decontaminate,
        cross_corpus_contamination,
    )

    corpus = docs.filter(F.col("source") != "src1")
    bench = docs.filter(F.col("source") == "src1")
    exact = {
        (r.doc_id, r.n_shared_grams)
        for r in cross_corpus_contamination(corpus, bench, shingle_k=5).collect()
    }
    bloomed = {
        (r.doc_id, r.n_shared_grams)
        for r in bloom_decontaminate(corpus, bench, shingle_k=5, eager=True).collect()
    }
    assert bloomed == exact and len(exact) > 0


def test_bloom_prunes_when_disjoint(spark):
    """A corpus sharing nothing with the benchmark produces zero
    candidates — the bloom filter does real map-side work (the whole
    point: the clean stream never shuffles)."""
    from etl_marketeye_airflow_spark.operators.dedup import bloom_decontaminate

    corpus = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta " + f"tok{i}") for i in range(50)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(1000, "one two three four five six seven eight")],
        "doc_id long, text string",
    )
    out = bloom_decontaminate(corpus, bench, shingle_k=5, eager=True)
    assert out.count() == 0


def test_zorder_key_bijective(spark):
    """De-interleaving the Morton key recovers both coordinates exactly
    (bijectivity on [0,2^bits)² — the property that makes zkey ranges
    decomposable into per-dimension ranges for data skipping)."""
    from etl_marketeye_airflow_spark.operators.layout import zorder_key2

    pts = [(x, y) for x in (0, 1, 5, 511, 1023) for y in (0, 2, 7, 512, 1023)]
    df = spark.createDataFrame(pts, "x long, y long")
    rows = df.withColumn(
        "zkey", zorder_key2(F.col("x"), F.col("y"), bits=10)
    ).collect()
    for r in rows:
        x = sum(((r.zkey >> (2 * i)) & 1) << i for i in range(10))
        y = sum(((r.zkey >> (2 * i + 1)) & 1) << i for i in range(10))
        assert (x, y) == (r.x, r.y)


def test_zorder_locality_bounds_files_touched(spark):
    """A narrow range predicate on ONE dimension touches a strict
    subset of the 64 target files — the data-skipping payoff a
    single-column sort only gives to its own column."""
    from etl_marketeye_airflow_spark.operators.layout import zorder_layout

    df = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    out = zorder_layout(df, F.col("x"), F.col("y"), bits=6, n_files=64)
    total = out.select("file_id").distinct().count()
    narrow_x = out.filter(F.col("zx") < 8).select("file_id").distinct().count()
    narrow_y = out.filter(F.col("zy") < 8).select("file_id").distinct().count()
    assert narrow_x < total and narrow_y < total


def test_bm25_ranks_term_density(spark):
    """A document saturated with the query term outranks one that
    mentions it once among other tokens; documents without any query
    term are absent; n_hit counts matched distinct terms."""
    from etl_marketeye_airflow_spark.operators.corpus import bm25_topk

    rows = [
        (1, "cat cat cat cat"),
        (2, "cat dog bird fish mouse"),
        (3, "dog bird fish mouse deer"),
        (4, "cat dog cat bird"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_topk(df, ["cat", "dog"], k=10).collect()
    got = {r.doc_id: r for r in out}
    assert 3 in got and got[3].n_hit == 1  # dog only
    assert set(got) == {1, 2, 3, 4}
    # doc 4 hits both terms and twice the cat tf of doc 2 → higher score
    assert got[4].score > got[2].score
    assert got[4].n_hit == 2
    # pure-repetition doc 1: saturation keeps it finite and positive
    assert got[1].score > 0.0


def test_bm25_limit_and_determinism(spark):
    """Top-k is the k best by (score desc, doc_id asc) and the result
    is stable across reruns (no RNG, no order dependence)."""
    from etl_marketeye_airflow_spark.operators.corpus import bm25_topk

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = bm25_topk(docs, ["vector", "stream", "slow"], k=20).collect()
    b = bm25_topk(docs, ["vector", "stream", "slow"], k=20).collect()
    assert len(a) == 20
    assert [(r.doc_id, r.score) for r in a] == [(r.doc_id, r.score) for r in b]
    scores = [r.score for r in a]
    assert scores == sorted(scores, reverse=True)


def test_bm25_score_exact_past_int64(spark):
    """Corpus-scale operands (S = 10^13 tokens, tf = 10^5) push
    22·S·tf = 2.2e19 past 2^63 ≈ 9.2e18 — the old long-cast
    intermediates silently wrapped negative under non-ANSI Spark.
    The decimal(38,0) path must produce the exactly-rounded double
    (same bits as Python's correctly-rounded int→float arithmetic in
    the same operation order) — VERDICT r5 'What's wrong' #3."""
    from pyspark.sql import Row

    from etl_marketeye_airflow_spark.operators.corpus import (
        FLOG2_SCALE,
        _with_bm25_score_t,
    )

    S, tf, dl, D, idf_fx = 10**13, 10**5, 10**9, 10**7, 5_000_000
    num = 22 * S * tf
    den = 10 * S * tf + 3 * S + 9 * dl * D
    assert num > 2**63  # the hazard is real: long intermediates wrap
    row = spark.createDataFrame(
        [Row(tf=tf, S=S, dl=dl, D=D, idf_fx=idf_fx)],
        "tf long, S long, dl long, D long, idf_fx long",
    )
    got = _with_bm25_score_t(row).select("score_t").collect()[0][0]
    want = (float(idf_fx) * float(num)) / (float(den) * float(FLOG2_SCALE))
    assert got == want  # bit-exact, not approx
    assert got > 0


def test_dsir_importance_separates_domains(spark):
    """Docs written in the target domain's vocabulary score positive
    (target-like), docs in the disjoint raw-only vocabulary score
    negative, and score_fx is an exact integer (rerun-stable)."""
    from etl_marketeye_airflow_spark.operators.corpus import dsir_importance

    rows = [(i, "alpha beta alpha beta alpha", "tgt") for i in range(5)] + [
        (10 + i, "gamma delta gamma delta gamma", "raw") for i in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    # n_buckets=4096: the four tokens land in distinct buckets (md5
    # buckets 1531/2539/2939/2449) — at 64 buckets alpha and gamma
    # collide and the collision (correctly) blurs the domains
    out = dsir_importance(df, F.col("source") == "tgt", n_buckets=4096)
    got = {r.doc_id: r for r in out.collect()}
    assert all(got[i].selected and got[i].score_fx > 0 for i in range(5))
    assert all(
        (not got[10 + i].selected) and got[10 + i].score_fx < 0
        for i in range(5)
    )
    again = {r.doc_id: r.score_fx for r in out.collect()}
    assert again == {k: v.score_fx for k, v in got.items()}


def test_sequence_packing_tiles_exactly(spark, docs):
    """Packing invariants the oracle can't see as such: (a) each doc's
    slices tile it exactly (slice_len sums to its token count,
    contiguously); (b) every non-final pack holds exactly `window`
    tokens; (c) within a pack, docs occupy disjoint contiguous spans."""
    from etl_marketeye_airflow_spark.operators.sampling import sequence_packing

    W = 64
    out = sequence_packing(docs, window=W, n_shards=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc, rows in by_doc.items():
        rows.sort(key=lambda r: r.pack_id)
        assert rows[0].slice_start == 0
        for a, b in zip(rows, rows[1:]):
            assert b.pack_id == a.pack_id + 1  # consecutive packs
            assert b.slice_start == a.slice_start + a.slice_len
        assert all(r.slice_len > 0 for r in rows)
    pack_tokens = {}
    for r in out:
        pack_tokens[(r.shard, r.pack_id)] = (
            pack_tokens.get((r.shard, r.pack_id), 0) + r.slice_len
        )
    last = {s: max(p for t, p in pack_tokens if t == s) for s, _ in pack_tokens}
    for (s, p), tot in pack_tokens.items():
        assert tot == W or p == last[s]


def test_contamination_spans_exact_islands(spark):
    """Planted leak: corpus doc copies a 7-token benchmark run at token
    positions 4-10 plus a disjoint 5-token run at 14-18 → contaminated
    5-gram start positions are exactly 4..6 and 14, i.e. spans
    (4, 6, 3) and (14, 14, 1).  Clean docs emit nothing."""
    from etl_marketeye_airflow_spark.operators.dedup import contamination_spans

    bench = spark.createDataFrame(
        [(100, "b1 b2 b3 b4 b5 b6 b7 x1 x2 c1 c2 c3 c4 c5")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # tokens:   1  2  3  4  5  6  7  8  9  10 11 12 13 14 15 16 17 18
            (1, "a1 a2 a3 b1 b2 b3 b4 b5 b6 b7 z1 z2 z3 c1 c2 c3 c4 c5"),
            (2, "clean doc with nothing shared at all here today friend"),
        ],
        "doc_id long, text string",
    )
    out = sorted(
        (r.doc_id, r.span_start, r.span_end, r.n_grams)
        for r in contamination_spans(corpus, bench, shingle_k=5).collect()
    )
    assert out == [(1, 4, 6, 3), (1, 14, 14, 1)]


def test_boilerplate_strip_planted_chrome(spark):
    """A nav-bar bigram planted in 9/10 docs gets stripped from all of
    them (both covered tokens), unique content stays, the one clean doc
    is untouched, and the rebuilt text preserves original token order."""
    from etl_marketeye_airflow_spark.operators.corpus import (
        strip_frequent_grams,
    )

    rows = [(i, f"home menu unique{i} words{i} extra{i}") for i in range(9)]
    rows.append((9, "totally fresh content here now"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # 'home menu' df=9/10=90% > 50% threshold → blacklisted
    out = {
        r.doc_id: r
        for r in strip_frequent_grams(df, k=2, max_doc_permille=500).collect()
    }
    for i in range(9):
        assert out[i].n_tokens == 5 and out[i].n_removed == 2
        assert out[i].cleaned_text == f"unique{i} words{i} extra{i}"
    assert out[9].n_removed == 0
    assert out[9].cleaned_text == "totally fresh content here now"


def test_boilerplate_strip_overlapping_and_full_strip(spark):
    """Overlapping blacklisted bigrams remove the union of covered
    positions (no double count), and a doc that is ALL boilerplate
    comes back empty rather than disappearing."""
    from etl_marketeye_airflow_spark.operators.corpus import (
        strip_frequent_grams,
    )

    rows = [(i, f"a b c tail{i}") for i in range(8)] + [(8, "a b c"), (9, "a b c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # bigrams 'a b' and 'b c' both df=10/10 → tokens 1-3 stripped
    out = {
        r.doc_id: r
        for r in strip_frequent_grams(df, k=2, max_doc_permille=500).collect()
    }
    assert len(out) == 10
    for i in range(8):
        assert (out[i].n_removed, out[i].cleaned_text) == (3, f"tail{i}")
    for i in (8, 9):
        assert (out[i].n_tokens, out[i].n_removed, out[i].cleaned_text) == (3, 3, "")


def test_weighted_sample_proportionality_and_determinism(spark):
    """A-ES property: items with 10x the weight appear ~10x as often in
    the sample (checked loosely across seeds); same seed → identical
    sample; zero/negative weights are excluded."""
    from etl_marketeye_airflow_spark.operators.sampling import weighted_sample

    rows = [(i, 1000 if i < 100 else 100) for i in range(1100)] + [
        (2000, 0),
        (2001, -5),
    ]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    heavy_frac = []
    for seed in ("s1", "s2", "s3"):
        got = weighted_sample(df, "n", k=200, seed=seed).collect()
        assert len(got) == 200
        assert all(r.doc_id < 2000 for r in got)  # nonpositive never sampled
        heavy_frac.append(sum(1 for r in got if r.doc_id < 100) / 200)
    # heavy items are 100/1100 of rows but 100k/200k of the mass → a
    # weight-proportional sampler picks them ~50%; an unweighted one ~9%
    assert sum(heavy_frac) / 3 > 0.30
    a = [r.doc_id for r in weighted_sample(df, "n", k=50, seed="s1").collect()]
    b = [r.doc_id for r in weighted_sample(df, "n", k=50, seed="s1").collect()]
    assert a == b


def test_countmin_bounds_and_mergeability(spark, docs):
    """CMS contract: never underestimates, overestimates by ≤ ε·N on
    the real corpus tokens (ε = e/width, failure prob (1/2)^depth —
    checked with slack on the fixed corpus); absent tokens estimate 0;
    and sketches MERGE cell-wise: sketch(A) + sketch(B) gives the same
    estimates as sketch(A∪B)."""
    import math

    from etl_marketeye_airflow_spark.operators.corpus import (
        countmin_estimate,
        countmin_token_counts,
        token_counts,
    )

    W, D = 1024, 4
    sk = countmin_token_counts(docs, width=W, depth=D)
    truth = {r.token: r.cnt for r in token_counts(docs).collect()}
    n_total = sum(truth.values())
    probe = sorted(truth)[:20] + ["zzz_not_in_corpus"]
    est = {r.token: r.est for r in countmin_estimate(sk, probe, W, D).collect()}
    assert est["zzz_not_in_corpus"] == 0
    eps_bound = math.e / W * n_total
    for t in probe[:-1]:
        assert est[t] >= truth[t]  # never under
        assert est[t] <= truth[t] + eps_bound * 4  # generous slack
    # mergeability: cell-wise sum of two half-corpus sketches == full
    a = countmin_token_counts(docs.filter(F.col("doc_id") % 2 == 0), width=W, depth=D)
    b = countmin_token_counts(docs.filter(F.col("doc_id") % 2 != 0), width=W, depth=D)
    merged = (
        a.unionByName(b)
        .groupBy("row", "col")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    est_m = {
        r.token: r.est for r in countmin_estimate(merged, probe, W, D).collect()
    }
    assert est_m == est


def test_zorder_box_query_prunes_partitions(spark, tmp_path):
    """End-to-end layout payoff: write a z-ordered table partitioned by
    file_id, translate a 2-D box predicate to its exact file set, and
    (a) the pruned read returns EXACTLY the rows the full-scan filter
    returns, (b) the file set is a strict subset (real skipping),
    (c) the executed plan prunes at the PARTITION level (scan reads
    only the listed file_id partitions)."""
    from etl_marketeye_airflow_spark.operators.layout import (
        zorder_files_for_box,
        zorder_layout,
    )

    bits, n_files = 6, 64
    df = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    laid = zorder_layout(df, F.col("x"), F.col("y"), bits=bits, n_files=n_files)
    path = str(tmp_path / "ztable")
    laid.write.partitionBy("file_id").mode("overwrite").parquet(path)

    box = ((5, 12), (40, 55))
    files = zorder_files_for_box(box[0], box[1], bits=bits, n_files=n_files)
    assert 0 < len(files) < n_files  # real pruning, not all files

    t = spark.read.parquet(path)
    want = sorted(
        (r.zx, r.zy)
        for r in t.filter(
            F.col("zx").between(*box[0]) & F.col("zy").between(*box[1])
        ).collect()
    )
    pruned = t.filter(F.col("file_id").isin(files)).filter(
        F.col("zx").between(*box[0]) & F.col("zy").between(*box[1])
    )
    got = sorted((r.zx, r.zy) for r in pruned.collect())
    assert got == want and len(got) > 0
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan  # pruning happens before IO


def test_cdc_upsert_state_survives_batches(spark, tmp_path):
    """Two change files drained one-per-micro-batch: batch-2 changes
    override batch-1 state (the upsert carries across batches), and
    untouched keys keep their batch-1 values in the final emission."""
    from pyspark.sql import Row

    from etl_marketeye_airflow_spark.streaming.stateful import cdc_upsert

    d = tmp_path / "cdc"
    d.mkdir()
    spark.createDataFrame(
        [Row(key=1, seq=0, op="I", price=10.0),
         Row(key=2, seq=0, op="I", price=20.0)]
    ).coalesce(1).write.parquet(str(d / "b1.parquet"))
    spark.createDataFrame(
        [Row(key=1, seq=1, op="U", price=11.0),
         Row(key=3, seq=0, op="I", price=30.0)]
    ).coalesce(1).write.parquet(str(d / "b2.parquet"))

    stream = (
        spark.readStream.schema("key long, seq long, op string, price double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*.parquet")
    )
    q = (
        cdc_upsert(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("cdc_2batch")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("cdc_2batch").collect()
    latest = {}
    for r in rows:  # last emission per key = highest seq seen
        if r.key not in latest or r.seq > latest[r.key].seq:
            latest[r.key] = r
    assert (latest[1].op, latest[1].price, latest[1].seq) == ("U", 11.0, 1)
    assert (latest[2].op, latest[2].price) == ("I", 20.0)
    assert (latest[3].op, latest[3].price) == ("I", 30.0)


def test_cdc_sink_compaction_multi_batch(spark, tmp_path):
    """The update-mode sink emits one row per changed key PER
    micro-batch.  With deletes landing in a LATER batch than the
    insert, a naive ``filter(op != 'D')`` over the raw sink resurrects
    the deleted key (its batch-1 'I' row survives) and duplicates
    updated keys.  ``compact_cdc_sink`` must return exactly the live
    latest state — VERDICT r5 'What's wrong' #1."""
    from pyspark.sql import Row

    from etl_marketeye_airflow_spark.streaming.stateful import (
        cdc_upsert,
        compact_cdc_sink,
    )

    d = tmp_path / "cdc_del"
    d.mkdir()
    spark.createDataFrame(
        [Row(key=1, seq=0, op="I", price=10.0),
         Row(key=2, seq=0, op="I", price=20.0),
         Row(key=3, seq=0, op="I", price=30.0)]
    ).coalesce(1).write.parquet(str(d / "b1.parquet"))
    spark.createDataFrame(
        [Row(key=1, seq=1, op="U", price=11.0),
         Row(key=2, seq=1, op="D", price=None)]
    ).coalesce(1).write.parquet(str(d / "b2.parquet"))

    stream = (
        spark.readStream.schema("key long, seq long, op string, price double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*.parquet")
    )
    q = (
        cdc_upsert(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("cdc_del_2batch")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    raw = spark.table("cdc_del_2batch")
    # Precondition: the hazard is real — raw sink holds duplicate keys
    # and key 2's batch-1 insert row survives the naive delete filter.
    naive = raw.filter(raw.op != "D").select("key").collect()
    assert sorted(r.key for r in naive) == [1, 1, 2, 3]
    got = {r.key: r for r in compact_cdc_sink(raw).collect()}
    assert set(got) == {1, 3}  # key 2 deleted, no duplicates
    assert (got[1].last_op, got[1].price) == ("U", 11.0)
    assert (got[3].last_op, got[3].price) == ("I", 30.0)


def test_read_evolving_parquet_unifies_versions(spark, tmp_path):
    """Files from three schema versions (v1: id+a; v2 adds b; v3 widens
    a to double and adds c) read back as one frame with the canonical
    schema: missing columns null, types cast, order fixed."""
    from pyspark.sql import Row

    from etl_marketeye_airflow_spark.sources.tables import (
        read_evolving_parquet,
    )

    d = str(tmp_path / "tbl")
    spark.createDataFrame([Row(id=1, a=10)]).write.mode("append").parquet(d)
    spark.createDataFrame([Row(id=2, a=20, b="x")]).write.mode("append").parquet(d)
    spark.createDataFrame(
        [Row(id=3, a=30.5, c=7)]
    ).write.mode("append").parquet(d)

    out = read_evolving_parquet(
        spark, d, "id long, a double, b string, c long"
    )
    assert [f.name for f in out.schema.fields] == ["id", "a", "b", "c"]
    assert dict(out.dtypes) == {
        "id": "bigint", "a": "double", "b": "string", "c": "bigint"
    }
    rows = {r.id: r for r in out.collect()}
    assert (rows[1].a, rows[1].b, rows[1].c) == (10.0, None, None)
    assert (rows[2].a, rows[2].b, rows[2].c) == (20.0, "x", None)
    assert (rows[3].a, rows[3].b, rows[3].c) == (30.5, None, 7)


def _hll_est(spark, docs_df, p=10):
    from etl_marketeye_airflow_spark.operators.corpus import (
        hll_estimate,
        hll_registers,
    )

    row = hll_estimate(hll_registers(docs_df, p=p), p=p).collect()[0]
    return row


def test_hll_accuracy_both_branches(spark, docs):
    """HLL contract: the estimate lands within ~4 standard errors
    (1.04/sqrt(m) ≈ 3.3% at p=10) of the true distinct count, in BOTH
    regimes — small cardinality (linear-counting branch) and
    cardinality >> m (raw-HLL branch) — and on the real corpus."""
    from etl_marketeye_airflow_spark.operators.corpus import token_counts

    # raw branch: 40k distinct tokens over 400 docs fills every bucket
    big = spark.createDataFrame(
        [(d, " ".join(f"tok{d}_{i}" for i in range(100))) for d in range(400)],
        "doc_id long, text string",
    )
    r = _hll_est(spark, big)
    assert r.method == "hll_raw" and r.empty_buckets == 0
    assert abs(r.estimate - 40_000) / 40_000 < 0.13, r

    # linear-counting branch: 150 distinct tokens, heavily repeated
    small = spark.createDataFrame(
        [(d, " ".join(f"w{i % 150}" for i in range(300))) for d in range(20)],
        "doc_id long, text string",
    )
    r = _hll_est(spark, small)
    assert r.method == "linear_counting" and r.empty_buckets > 0
    assert abs(r.estimate - 150) / 150 < 0.13, r

    # real corpus: whatever branch fires, the bound must hold
    truth = token_counts(docs).count()
    r = _hll_est(spark, docs)
    assert abs(r.estimate - truth) / truth < 0.13, (r, truth)


def test_hll_merge_and_duplicate_invariance(spark, docs):
    """Register tables are a pure function of the distinct-token SET:
    duplicating every document changes nothing, and the cell-wise-max
    merge of two half-corpus sketches equals the whole-corpus sketch
    exactly (registers AND estimate)."""
    from etl_marketeye_airflow_spark.operators.corpus import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    full = hll_registers(docs)
    doubled = hll_registers(docs.unionByName(docs))
    assert sorted(map(tuple, full.collect())) == sorted(
        map(tuple, doubled.collect())
    )
    a = hll_registers(docs.filter(F.col("doc_id") % 2 == 0))
    b = hll_registers(docs.filter(F.col("doc_id") % 2 != 0))
    merged = hll_merge(a, b)
    assert sorted(map(tuple, full.collect())) == sorted(
        map(tuple, merged.collect())
    )
    assert (
        hll_estimate(merged).collect() == hll_estimate(full).collect()
    )


def test_kmv_estimate_both_branches(spark, docs):
    """KMV contract: n < k → the sketch IS the distinct set (exact
    branch); full sketch → (k−1)·H/θ lands within ~4 standard errors
    (1/sqrt(k−2) ≈ 6.3% at k=256) of the true distinct count."""
    from etl_marketeye_airflow_spark.operators.corpus import (
        kmv_estimate,
        kmv_sketch,
        token_counts,
    )

    truth = token_counts(docs).count()
    r = kmv_estimate(kmv_sketch(docs, k=4096), k=4096).collect()[0]
    assert r.method == "exact_under_k" and r.n_stored == truth
    assert r.estimate == float(truth)

    big = spark.createDataFrame(
        [(d, " ".join(f"tok{d}_{i}" for i in range(100))) for d in range(400)],
        "doc_id long, text string",
    )
    r = kmv_estimate(kmv_sketch(big, k=256), k=256).collect()[0]
    assert r.method == "kmv" and r.n_stored == 256
    assert abs(r.estimate - 40_000) / 40_000 < 0.25, r


def test_kmv_merge_and_duplicate_invariance(spark, docs):
    """The sketch depends only on the distinct-token SET (duplicating
    every doc changes nothing) and half-corpus sketches merge into
    exactly the whole-corpus sketch."""
    from etl_marketeye_airflow_spark.operators.corpus import (
        kmv_merge,
        kmv_sketch,
    )

    full = kmv_sketch(docs, k=16)
    doubled = kmv_sketch(docs.unionByName(docs), k=16)
    assert full.collect() == doubled.collect()
    a = kmv_sketch(docs.filter(F.col("doc_id") % 2 == 0), k=16)
    b = kmv_sketch(docs.filter(F.col("doc_id") % 2 != 0), k=16)
    assert kmv_merge(a, b, k=16).collect() == full.collect()


def test_kmv_set_ops_identical_and_disjoint(spark):
    """Set-op estimates hit the degenerate corners exactly: a corpus
    against itself (jaccard 1, intersect == union) and two token-
    disjoint corpora (inter_seen 0, jaccard 0); with both vocabularies
    under k the union estimate is the exact union cardinality."""
    from etl_marketeye_airflow_spark.operators.corpus import (
        kmv_set_ops,
        kmv_sketch,
    )

    xs = spark.createDataFrame(
        [(d, " ".join(f"x{i}" for i in range(50))) for d in range(4)],
        "doc_id long, text string",
    )
    ys = spark.createDataFrame(
        [(d, " ".join(f"y{i}" for i in range(50))) for d in range(4)],
        "doc_id long, text string",
    )
    sx = kmv_sketch(xs, k=256)
    r = kmv_set_ops(sx, kmv_sketch(xs, k=256), k=256).collect()[0]
    assert r.jaccard_est == 1.0 and r.inter_seen == r.union_seen == 50
    assert r.intersect_est == r.union_est == 50.0  # exact: theta = H
    # the lazy plan computes the identical row
    lazy = kmv_set_ops(sx, kmv_sketch(xs, k=256), k=256, eager=False)
    assert lazy.collect()[0] == r

    r = kmv_set_ops(sx, kmv_sketch(ys, k=256), k=256).collect()[0]
    assert r.inter_seen == 0 and r.jaccard_est == 0.0
    assert r.union_est == 100.0


def test_kmv_set_ops_overlap_accuracy(spark):
    """Planted 50% vocabulary overlap: jaccard ≈ 1/3, intersection ≈
    4000 — full-sketch (k=256) estimates land within ~4σ bounds."""
    from etl_marketeye_airflow_spark.operators.corpus import (
        kmv_set_ops,
        kmv_sketch,
    )

    a = spark.createDataFrame(
        [(d, " ".join(f"s{d}_{i}" for i in range(50))
          + " " + " ".join(f"c{d}_{i}" for i in range(50)))
         for d in range(80)],
        "doc_id long, text string",
    )
    b = spark.createDataFrame(
        [(d, " ".join(f"t{d}_{i}" for i in range(50))
          + " " + " ".join(f"c{d}_{i}" for i in range(50)))
         for d in range(80)],
        "doc_id long, text string",
    )
    r = kmv_set_ops(kmv_sketch(a, k=256), kmv_sketch(b, k=256), k=256).collect()[0]
    assert abs(r.jaccard_est - 1 / 3) / (1 / 3) < 0.35, r
    assert abs(r.intersect_est - 4000) / 4000 < 0.4, r
    assert abs(r.union_est - 12000) / 12000 < 0.25, r


def test_dyadic_bucket_monotone_exact_region_and_width(spark):
    """Dyadic bucket contract: the index is monotone in the value,
    values below 2^(s+1) get their OWN bucket (exact region, incl. 0),
    and above it every bucket's span obeys the <= 2^-s relative-width
    bound that the quantile error guarantee rests on."""
    from etl_marketeye_airflow_spark.operators.corpus import (
        with_dyadic_bucket,
    )

    vals = list(range(0, 300)) + [
        2**k + d for k in range(8, 40, 3) for d in (0, 1, 12345 % (2**k))
    ]
    df = spark.createDataFrame([(v,) for v in sorted(set(vals))], "v long")
    rows = (
        with_dyadic_bucket(df, "v", "idx", sub_bits=5)
        .orderBy("v")
        .collect()
    )
    idxs = [r.idx for r in rows]
    assert idxs == sorted(idxs)  # monotone
    for r in rows:
        if r.v < 64:
            assert r.idx == r.v  # exact region, including 0
    # relative width: group by idx, check (max-min)/min <= 2^-5 + slack
    by_idx = {}
    dense = spark.createDataFrame([(v,) for v in range(1, 5000)], "v long")
    for r in with_dyadic_bucket(dense, "v", "idx", sub_bits=5).collect():
        lo, hi = by_idx.get(r.idx, (r.v, r.v))
        by_idx[r.idx] = (min(lo, r.v), max(hi, r.v))
    for lo, hi in by_idx.values():
        assert (hi - lo) / lo <= 2**-5


def test_dyadic_quantiles_bracket_bound_and_merge(spark, docs):
    """Quantile-estimate contract on a skewed synthetic distribution AND
    the real corpus: the reported bucket brackets the true order
    statistic (lo <= q_true <= hi), the midpoint is within 2^-5
    relative, and the (sum, min, max) merge of two half sketches equals
    the whole-corpus sketch exactly."""
    from etl_marketeye_airflow_spark.operators.corpus import (
        dyadic_hist_merge,
        dyadic_histogram,
        dyadic_quantile_estimate,
    )

    # log-normal-ish skew: i^2 spans 1 .. 1e6 over 1000 rows
    vals = [(i * i,) for i in range(1, 1001)]
    df = spark.createDataFrame(vals, "v long")
    sk = dyadic_histogram(df, "v", sub_bits=5)
    est = {r.q_label: r for r in dyadic_quantile_estimate(sk).collect()}
    ordered = sorted(v for (v,) in vals)
    for label, r in est.items():
        true = ordered[r.target_rank - 1]
        assert r.lo <= true <= r.hi, (label, r, true)
        assert abs(r.est - true) / true <= 2**-5, (label, r, true)

    # real corpus lengths + merge == full
    lens = docs.select("n_chars")
    full = dyadic_histogram(lens, "n_chars")
    a = dyadic_histogram(
        docs.filter(F.col("doc_id") % 2 == 0).select("n_chars"), "n_chars"
    )
    b = dyadic_histogram(
        docs.filter(F.col("doc_id") % 2 != 0).select("n_chars"), "n_chars"
    )
    merged = dyadic_hist_merge(a, b)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )
    ordered = sorted(r.n_chars for r in lens.collect())
    for r in dyadic_quantile_estimate(full).collect():
        true = ordered[r.target_rank - 1]
        assert r.lo <= true <= r.hi
        assert abs(r.est - true) / max(true, 1) <= 2**-5


def test_pmi_bigrams_planted_collocation_and_bound(spark):
    """A planted always-together pair ranks above independent fillers,
    and the fixed-point score is within the documented 0.43 bits of
    true PMI for every emitted bigram."""
    from etl_marketeye_airflow_spark.operators.corpus import pmi_bigrams

    # "san francisco" always together; fillers drawn independently
    rows = []
    fill = ["alpha", "beta", "gamma", "delta"]
    for d in range(40):
        toks = []
        for i in range(10):
            if i % 5 == 2:
                toks += ["san", "francisco"]
            else:
                toks.append(fill[(d * 7 + i) % 4])
        rows.append((d, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = pmi_bigrams(docs, min_count=5, topk=10).collect()
    assert out[0].bigram == "san francisco"
    # exact recomputation: fetch N and B from the corpus itself
    toks = [t for _, text in rows for t in text.split()]
    N = len(toks)
    B = sum(len(text.split()) - 1 for _, text in rows)
    for r in out:
        true_pmi = math.log2(r.c_ab * N * N / (B * r.c_a * r.c_b))
        assert abs(r.pmi - true_pmi) <= 0.43 + 1e-9, (r, true_pmi)


def test_dyadic_grouped_sketch_and_quantiles(spark, docs):
    """Grouped sketch contract: per-group sketches equal per-group
    ungrouped sketches, the grouped merge composes, and every group's
    estimates keep the bracket + 2^-5 bound vs that group's exact
    order statistics."""
    from etl_marketeye_airflow_spark.operators.corpus import (
        dyadic_hist_merge,
        dyadic_histogram,
        dyadic_quantile_estimate,
    )

    lens = docs.select("lang", "n_chars")
    g = dyadic_histogram(lens, "n_chars", group_cols=["lang"])
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    for lang in langs:
        solo = dyadic_histogram(
            docs.filter(F.col("lang") == lang).select("n_chars"), "n_chars"
        )
        grp = g.filter(F.col("lang") == lang).drop("lang")
        assert sorted(map(tuple, grp.collect())) == sorted(
            map(tuple, solo.collect())
        )
    a = dyadic_histogram(
        lens.filter(F.col("n_chars") % 2 == 0), "n_chars",
        group_cols=["lang"],
    )
    b = dyadic_histogram(
        lens.filter(F.col("n_chars") % 2 != 0), "n_chars",
        group_cols=["lang"],
    )
    merged = dyadic_hist_merge(a, b, group_cols=["lang"])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, g.collect())
    )
    by_lang = {}
    for r in lens.collect():
        by_lang.setdefault(r.lang, []).append(r.n_chars)
    for vals in by_lang.values():
        vals.sort()
    for r in dyadic_quantile_estimate(g, group_cols=["lang"]).collect():
        true = by_lang[r.lang][r.target_rank - 1]
        assert r.lo <= true <= r.hi, (r, true)
        assert abs(r.est - true) / max(true, 1) <= 2**-5


def test_ema_fold_matches_python_recurrence(spark):
    """q139's fold == the hand recurrence v' = (7v + c*2^20) >> 3 over
    events sorted by (ts, id), including an out-of-order arrival and a
    single-event user; ema decodes to fx / (100*2^20)."""
    from etl_marketeye_airflow_spark.queries import QUERIES

    out = {
        r.user_id: r
        for r in QUERIES["q139_ema_fold"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    from etl_marketeye_airflow_spark.sources.tables import load_events

    rows = (
        load_events(spark, "/root/testdata/sf0.001")  # convention 4
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "ts_us", "event_id", "value")
        .collect()
    )
    per_user = {}
    for r in rows:
        per_user.setdefault(r.user_id, []).append(
            (r.ts_us, r.event_id, int(math.floor(r.value * 100)))
        )
    for uid, evs in per_user.items():
        evs.sort()
        v = evs[0][2] * 1048576
        for _, _, c in evs[1:]:
            v = (7 * v + c * 1048576) >> 3
        assert out[uid].ema_fx == v, uid
        assert out[uid].n_events == len(evs)
        assert out[uid].ema == v / 104857600.0


# -------------------------------------------------- tfidf_cosine_pairs


def test_tfidf_cosine_pairs_weighting_and_threshold(spark):
    """Docs sharing only a RARE term pair up; docs sharing only
    ubiquitous terms (df > max_df cut... here df > 3) produce no pair;
    the division-free threshold matches the float cosine; ids ordered
    a < b; eager and lazy agree."""
    from etl_marketeye_airflow_spark.operators.corpus import (
        tfidf_cosine_pairs,
    )

    docs = spark.createDataFrame(
        [
            (1, "zebra quark common common"),
            (2, "zebra quark common stuff"),
            (3, "common stuff other words"),
            (4, "unrelated totally different thing"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_cosine_pairs(docs, max_df=3, min_cos_num=1, min_cos_den=2)
    rows = out.collect()
    pairs = {(r.id_a, r.id_b) for r in rows}
    assert (1, 2) in pairs
    assert all(r.id_a < r.id_b for r in rows)
    for r in rows:
        import math

        c = r.dot / (math.sqrt(r.norm_a) * math.sqrt(r.norm_b))
        assert c >= 0.5 - 1e-12 and abs(c - r.cosine) < 1e-12
    lazy = sorted(map(tuple, rows))
    eager = sorted(map(tuple, tfidf_cosine_pairs(
        docs, max_df=3, min_cos_num=1, min_cos_den=2, eager=True
    ).collect()))
    assert lazy == eager


def test_tfidf_cosine_pairs_bounds_headroom(spark):
    """The documented integer-bound argument: reduced idf ≤ 42·2^6 =
    2688 ⇒ with tf ≤ 10^3-token docs every weight, norm, and dot stays
    far under 2^53 (exact long→double) — asserted on a worst-case-ish
    frame of long repetitive docs."""
    from etl_marketeye_airflow_spark.operators.corpus import (
        tfidf_cosine_pairs,
    )

    big = " ".join(["rareword"] * 1000)
    # a third doc keeps df(rareword)=2 < D=3 (idf of an everywhere-term
    # is 0 — weight 0 — so an all-docs corpus would yield no pair)
    docs = spark.createDataFrame(
        [(1, big), (2, big), (3, "other words entirely")],
        "doc_id long, text string",
    )
    r = tfidf_cosine_pairs(docs, max_df=5).collect()
    assert len(r) == 1
    assert r[0].dot < 2**53 and r[0].norm_a < 2**53
    assert r[0].cosine == 1.0


def test_distinctive_tokens_chi2_planted_keyness(spark):
    """A token exclusive to one source ranks first for it; tokens
    uniform across sources score 0 (det = 0, filtered as
    non-positive); counts replayed by hand on the 2x2."""
    from etl_marketeye_airflow_spark.operators.corpus import (
        distinctive_tokens_chi2,
    )

    rows = []
    for i in range(20):
        src = "a" if i < 10 else "b"
        marker = "aardvark" if src == "a" else "bobcat"
        rows.append((i, src, f"{marker} common filler text"))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = distinctive_tokens_chi2(docs, k=2, min_df=2).collect()
    top = {r.source: r.token for r in out if r.rank == 1}
    assert top == {"a": "aardvark", "b": "bobcat"}
    r1 = next(r for r in out if r.source == "a" and r.rank == 1)
    # a=10 (all of source a), b=0; det = 10*10 - 0 = 100; N=20
    assert (r1.a, r1.b) == (10, 0)
    assert int(r1.chi2_num) == 20 * 100 * 100
    assert int(r1.chi2_den) == 10 * 10 * 10 * 10
    assert r1.chi2 == 20.0
    # uniform tokens never appear (det <= 0 filtered)
    assert all(r.token not in ("common", "filler", "text") for r in out)


def test_kmv_grouped_matches_per_group_sketch(spark):
    """kmv_sketch_grouped(source) must equal kmv_sketch() run on each
    source's slice (same hash/seed/k) — the grouped form is an
    optimization, never a semantic change."""
    from etl_marketeye_airflow_spark.operators.corpus import (
        kmv_sketch,
        kmv_sketch_grouped,
    )

    rows = [
        (1, "alpha beta gamma delta", "s1"),
        (2, "beta gamma epsilon", "s1"),
        (3, "zeta eta theta", "s2"),
        (4, "theta iota kappa lambda mu", "s2"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    grouped = {
        (r.source, r.rank): r.h
        for r in kmv_sketch_grouped(docs, "source", k=3).collect()
    }
    for src in ("s1", "s2"):
        per = {
            (src, r.rank): r.h
            for r in kmv_sketch(
                docs.filter(docs.source == src), k=3
            ).collect()
        }
        assert {kk: v for kk, v in grouped.items() if kk[0] == src} == per


def test_kmv_overlap_matrix_identical_and_disjoint(spark):
    """Two sources with the SAME text estimate jaccard 1.0; fully
    disjoint vocabularies estimate 0.0; counts are exact under the
    theta cut."""
    from etl_marketeye_airflow_spark.operators.corpus import (
        kmv_overlap_matrix,
        kmv_sketch_grouped,
    )

    rows = [
        (1, "alpha beta gamma", "a"),
        (2, "alpha beta gamma", "b"),
        (3, "zeta eta theta", "c"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    sk = kmv_sketch_grouped(docs, "source", k=8)
    m = {
        (r.source_a, r.source_b): r
        for r in kmv_overlap_matrix(sk, "source", k=8).collect()
    }
    assert m[("a", "b")].jaccard_est == 1.0
    assert m[("a", "b")].inter_seen == 3 and m[("a", "b")].union_seen == 3
    assert m[("a", "c")].jaccard_est == 0.0
    assert m[("b", "c")].inter_seen == 0
