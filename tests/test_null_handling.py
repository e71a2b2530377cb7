"""Convention-22 pins: NULL inputs (missing text / embeddings /
measurements) are EXCLUDED at the operator entry, never silently
folded into signatures, sketches, cells, or order statistics.

These are the operator-level halves of the r9 NULL-fuzz fixes
(tools/fuzz_gate.py injects ~2% NULLs and runs the full oracle gate;
here we pin the semantics on tiny frames so a regression fails in
seconds, not in a 5-minute sweep).
"""

from pyspark.sql import functions as F


def test_simhash_excludes_null_text(spark):
    from etl_marketeye_airflow_spark.operators.dedup import (
        portable_token_hash,
        simhash_pairs,
        simhash_signatures,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, None), (3, None), (4, None)],
        "doc_id long, text string",
    )
    sigs = simhash_signatures(docs, token_hash=portable_token_hash, bits=60)
    assert [r["_id"] for r in sigs.collect()] == [1]
    # without the exclusion every NULL-text doc got the same empty-vote
    # signature and they all paired at hamming 0 (the q23 fuzz red)
    pairs = simhash_pairs(
        docs, max_distance=3, bits=60, token_hash=portable_token_hash
    )
    assert pairs.count() == 0


def test_length_buckets_excludes_null_metric(spark):
    from etl_marketeye_airflow_spark.operators.sampling import length_buckets

    d = spark.createDataFrame(
        [(1, 10), (2, None), (3, 70)], "doc_id long, n_chars long"
    )
    rows = {r["bucket"]: r for r in length_buckets(d, "n_chars", 64).collect()}
    assert set(rows) == {0, 1}
    assert rows[0]["n_docs"] == 1 and rows[1]["cum_volume"] == 80


def test_dyadic_histogram_excludes_null_values(spark):
    from etl_marketeye_airflow_spark.operators.corpus import dyadic_histogram

    d = spark.createDataFrame([(5,), (None,), (5,)], "n long")
    rows = dyadic_histogram(d, "n", sub_bits=5).collect()
    assert len(rows) == 1 and rows[0]["cnt"] == 2


def test_chunk_documents_excludes_null_text(spark):
    from etl_marketeye_airflow_spark.operators.corpus import chunk_documents

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, None)], "doc_id long, text string"
    )
    out = chunk_documents(docs, chunk_size=2, stride=2).collect()
    assert {r["doc_id"] for r in out} == {1}


def test_ivf_and_semdedup_exclude_null_embeddings(spark):
    from etl_marketeye_airflow_spark.operators.similarity import (
        ivf_assign,
        semdedup,
    )

    rows = [
        (0, [1.0, 0.0]),
        (1, None),  # list(None) crashed centroid init pre-fix (q36 red)
        (2, [0.0, 1.0]),
        (3, [1.0, 0.1]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    assigned, cents = ivf_assign(emb, n_centroids=2)
    ids = {r["vec_id"] for r in assigned.collect()}
    assert ids == {0, 2, 3}
    assert len(cents) == 2
    sd = semdedup(emb, tau=0.99, n_centroids=2, eager=True)
    assert {r["vec_id"] for r in sd.collect()} == {0, 2, 3}


def test_global_rank_null_order_key_is_callers_problem_but_sums_hold(spark):
    """global_rank_cumsum itself stays total-order-agnostic; this pins
    that a NULL in the SUM column doesn't corrupt ranks/totals (the
    coalesce in the prefix fold) — the ordering-key NULL discipline
    lives at the query layer (conv 22a, q45)."""
    from etl_marketeye_airflow_spark.operators.ranking import (
        global_rank_cumsum,
    )

    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 5)], "k long, v long"
    )
    out, n, s = global_rank_cumsum(
        df, [F.col("k").asc()], sum_col="v", num_partitions=2
    )
    assert n == 3 and s == 15
    assert [r["rn"] for r in out.orderBy("k").collect()] == [1, 2, 3]
