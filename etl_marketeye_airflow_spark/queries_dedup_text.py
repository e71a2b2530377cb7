"""q20-q30: exact/minhash/simhash/embedding dedup, text metrics, multimodal decode

Registry band module (r11 split of the 12.6k-line queries.py).  Shared
helpers, the @query decorator, and the oracle-parity conventions live in
``_registry_base`` (same package level, so function sources — and hence
sweep digests — are byte-identical to the pre-split file).  Importing
this module registers its queries into the shared QUERIES/ORACLES dicts.
"""

from __future__ import annotations

from . import _registry_base as _B

# bind every base helper (incl. underscore names) into this module's
# globals so the verbatim-moved query sources resolve unchanged
globals().update({k: v for k, v in vars(_B).items() if not k.startswith("__")})

# ---------------------------------------------------------------------------
# Training-data pipeline operators (BASELINE.json north star): dedup,
# similarity search, text analysis, multimodal — over documents/embeddings.
# ---------------------------------------------------------------------------


@query(
    "q20_exact_dedup",
    oracle="""
    SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS content_hash,
           min(doc_id)  AS keeper_id,
           count(*)     AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def q20_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups: digest-groupBy, keeper = min id.  Shuffles the
    32-byte digest, never the text."""
    from .operators.dedup import exact_dedup_groups

    return exact_dedup_groups(_t(spark, sf_dir, "documents"))


@query(
    "q21_ngram_jaccard_pairs",
    oracle=f"""
    WITH sh AS MATERIALIZED (
      SELECT doc_id, {_SQL_GRAMS} AS grams
      FROM {_SQL_DOCS_WS} WHERE doc_id < 120
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
             / CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS DOUBLE) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
            / CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS DOUBLE) >= 0.01
    """,
)
def q21_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard similarity pairs (brute-force on a bounded
    slice — the exact-verification primitive the LSH pipeline reuses).
    Integer set sizes → one double division → bit-deterministic."""
    from .operators.dedup import word_shingles

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    sh = docs.select(F.col("doc_id"), word_shingles(F.col("text"), 3).alias("grams"))
    a, b = sh.alias("a"), sh.alias("b")
    jac = (
        F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams"))).cast("double")
        / F.size(F.array_union(F.col("a.grams"), F.col("b.grams"))).cast("double")
    )
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.01)
    )


@query(
    "q22_minhash_lsh_dedup",
    # The banding/minhash machinery itself is not SQL-expressible, but its
    # VERIFIED OUTPUT is: the Jaccard filter runs on exact shingle-hash
    # sets, so surviving pairs must equal brute-force exact-Jaccard pairs
    # whenever banding recall is complete — which it is on this corpus
    # (all true pairs J >= 0.9, capture ~1-4e-8; pair sets verified
    # identical, jaccard doubles bit-identical: int-size ratio in both
    # engines).  The oracle recomputes pairs the slow exact way via an
    # inverted index.  Recall completeness pinned by
    # tests/test_trainingdata.py::test_minhash_lsh_recall_vs_exact.
    oracle="""
    WITH sh AS MATERIALIZED (
      SELECT doc_id,
             list_distinct(
               list_transform(
                 range(1, greatest(len(__ws) - 2, 1) + 1),
                 i -> array_to_string(list_slice(__ws, i, i + 2), ' ')
               )
             ) AS grams
      FROM (SELECT *, string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')
            AS __ws FROM documents)
    ),
    ex AS (SELECT doc_id, unnest(grams) AS g FROM sh),
    sizes AS (SELECT doc_id, len(grams) AS n FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = inter.id_a
    JOIN sizes sb ON sb.doc_id = inter.id_b
    WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.3
    """,
)
def q22_minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64)+LSH(16 bands) near-dup pairs, Jaccard-verified ≥ 0.3.
    Candidate generation is a bucket-join on band hashes — never all-pairs."""
    from .operators.dedup import minhash_lsh_pairs

    # r12 (guide §2.4): the trailing orderBy was presentation-only — the
    # driver hash is order-insensitive — and range-partitioned the whole
    # pair set per action; dropped.
    return minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), num_hashes=64, bands=16, threshold=0.3
    )


@query(
    "q23_simhash_dedup",
    # Fully SQL-reproducible: tokens hash to md5-derived 60-bit ints on
    # both sides, votes/sign-packing are exact integer ops, d≤3 banding
    # recall is COMPLETE (pigeonhole theorem) so Spark's bucket-join pair
    # set equals the oracle's all-pairs scan.  The oracle brute-forces
    # all pairs (fine at sf0.01); Spark's banding IS the scale path.
    oracle="""
    WITH t AS (
      SELECT doc_id,
             unnest(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS w
      FROM documents
    ),
    h AS (
      SELECT doc_id, CAST(concat('0x', substr(md5(w), 1, 15)) AS BIGINT) AS th FROM t
    ),
    v AS (
      SELECT doc_id, r.range AS bit,
             sum(CASE WHEN (th >> r.range) & 1 = 1 THEN 1 ELSE -1 END) AS vote
      FROM h CROSS JOIN range(60) r
      GROUP BY doc_id, r.range
    ),
    s AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN vote > 0
                           THEN 1::BIGINT << (59 - CAST(bit AS INT))
                           ELSE 0::BIGINT END) AS BIGINT) AS sig
      FROM v GROUP BY doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sig, b.sig)) <= 3
    """,
)
def q23_simhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs within hamming distance 3 via 4-chunk
    pigeonhole banding (recall-complete at d≤3), using the engine-
    portable 60-bit md5 token hash so the signature pipeline — not just
    the row count — is oracle-verified.  The xxhash64/64-bit scale
    default and the partial-recall d>3 regime are pinned by pytest
    (`test_trainingdata.py`)."""
    from .operators.dedup import portable_token_hash, simhash_pairs

    pairs = simhash_pairs(
        _t(spark, sf_dir, "documents"),
        max_distance=3,
        bits=60,
        token_hash=portable_token_hash,
    )
    # presentation-only trailing orderBy dropped (r12, guide §2.4)
    return pairs.select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    )


@query(
    "q24_cosine_topk",
    # zero-norm vectors (no direction → cosine undefined) are excluded
    # on BOTH sides, query vector included — the fuzz_gate zero-vector
    # probe (r8); predicate mirrors operators/similarity.nonzero_vec
    oracle="""
    WITH q AS (
      SELECT embedding AS qv FROM embeddings
      WHERE vec_id = 0 AND len(list_filter(embedding, x -> x <> 0)) > 0
    ),
    scored AS (
      SELECT vec_id,
             list_reduce(list_transform(list_zip(embedding, qv),
                                        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
                         (a, b) -> a + b)
             / (sqrt(list_reduce(list_transform(list_zip(embedding, embedding),
                                                p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
                                 (a, b) -> a + b))
                * sqrt(list_reduce(list_transform(list_zip(qv, qv),
                                                  p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
                                   (a, b) -> a + b))) AS c
      FROM embeddings, q
      WHERE len(list_filter(embedding, x -> x <> 0)) > 0
    )
    SELECT vec_id, round(c, 6) AS cosine FROM scored
    ORDER BY c DESC, vec_id LIMIT 20
    """,
)
def q24_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-20 vs the vec_id=0 query vector — the exact
    ANN baseline.  Rounded to 6 dp: engines agree to ~1 ulp (DuckDB
    reduces pairwise), and no boundary values exist at that precision.
    Zero-norm corpus vectors are excluded and a missing/zero query
    yields the empty frame (operators/similarity.brute_force_topk)."""
    from .operators.similarity import brute_force_topk

    emb = _t(spark, sf_dir, "embeddings")
    qv = _query_vec(emb)  # NULL/missing-safe shared fetch (guard doc there)
    return brute_force_topk(emb, qv, k=20).select(
        "vec_id", F.round(F.col("cosine"), 6).alias("cosine")
    )


@query(
    "q25_ann_lsh_topk",
    # The approximate ALGORITHM is itself SQL-reproducible: the ±1 planes
    # are deterministic literals (seed 42), bucket bits are signs of
    # plane projections (min |projection| ≈ 1e-3 on this corpus — far
    # above fold-order ulp noise, pinned in test_trainingdata), and the
    # hamming≤1 multi-probe is bit_count(xor(key, qkey)) <= 1.  Rank-10
    # boundary margin ≈ 5e-3 and 6-dp rounding margins ≈ 6e-8 are pinned
    # too, so the top-10 set and rounded cosines match bit-for-bit.
    oracle=f"""
    WITH keys AS (
      SELECT e.vec_id, any_value(e.embedding) AS embedding,
             sum(CASE WHEN list_reduce(
                            list_transform(list_zip(e.embedding, pl.p),
                                           z -> CAST(z[1] AS DOUBLE) * z[2]),
                            (x, y) -> x + y) > 0
                      THEN 1::BIGINT << (7 - pl.p_idx) ELSE 0 END) AS key
      FROM embeddings e CROSS JOIN {_planes_sql(8)} AS pl(p_idx, p)
      GROUP BY e.vec_id
    ),
    qk AS (SELECT key AS qkey, embedding AS qv FROM keys
           WHERE vec_id = 0 AND {_sql_nonzero('embedding')}),
    scored AS (
      SELECT k.vec_id, {_SQL_COS.format(a="k.embedding", b="qk.qv")} AS c
      FROM keys k, qk
      WHERE bit_count(xor(k.key, qk.qkey)) <= 1
        AND {_sql_nonzero('k.embedding')}
    )
    SELECT vec_id, round(c, 6) AS cosine FROM scored
    ORDER BY c DESC, vec_id LIMIT 10
    """,
)
def q25_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucketed ANN top-10 for the vec_id=0 query — the
    scale path: multi-probes the query bucket + its 8 hamming-1
    neighbors (9/2^8 ≈ 3.5% of the corpus).  The oracle replays the
    same deterministic planes/probe in SQL (sign + rank margins pinned
    in test_trainingdata); recall floor vs the q24 exact baseline is
    asserted there too (sign-LSH is the right index for clustered
    corpora; the synthetic isotropic embeddings are its worst case —
    IVF/q36 is the strong index there)."""
    from .operators.similarity import lsh_topk

    emb = _t(spark, sf_dir, "embeddings")
    qv = _query_vec(emb)  # NULL/missing-safe shared fetch (guard doc there)
    out = lsh_topk(emb, qv, k=10, n_planes=8, hamming_radius=1)
    return out.select("vec_id", F.round(F.col("cosine"), 6).alias("cosine"))


@query(
    "q26_embedding_near_dup",
    # Re-pinned (round 4) at a SCALE-SAFE operating point: the old pin
    # (cosine ≥ 0.45 on near-isotropic vectors, 3 fixed planes) was an
    # inherent ~all-pairs/8 collision regime — 67× cost at 10× data,
    # root-caused in SCALE.md; it survives only as a pytest-only
    # negative example (test_trainingdata).  The corpus now plants
    # CLUSTERS: every 10th vector gets 3 deterministic elementwise
    # perturbations (ids +1M/+2M/+3M), giving 4-member groups whose
    # intra-cluster cosines sit at ≈0.994-0.99998 while everything else
    # stays ≤ 0.61 — the tight-angle regime where auto-sized planes
    # lose nothing.  Threshold margin ≥ 4.4e-2 and 6-dp rounding
    # margins ≥ 2e-10 (≈10^5 × engine ulp noise), recall completeness
    # at (auto planes, 8 tables, seed 42) verified at sf0.001/0.01/0.1
    # — all pinned in test_trainingdata.  The ORACLE recomputes the
    # same corpus and brute-forces all-pairs exact cosine; Spark's
    # banded bucket-join is the scale path.
    oracle=f"""
    WITH c AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
      UNION ALL
      SELECT vec_id + t.t * 1000000,
             list_transform(range(1, len(embedding) + 1),
               i -> CAST(embedding[i] AS DOUBLE)
                    + CAST(0.002 AS DOUBLE) * t.t
                      * CAST(((vec_id * 31 + (i - 1) + 13 * t.t) % 7) - 3 AS DOUBLE))
      FROM embeddings CROSS JOIN (VALUES (1), (2), (3)) AS t(t)
      WHERE vec_id % 10 = 0
    ),
    cc AS (
      -- mirror Spark's nonzero_vec on the UNIONED corpus (conv 21/22):
      -- NULL or all-zero members have no direction and are excluded
      -- BEFORE any cosine list_reduce can see a NULL/empty zip
      SELECT * FROM c WHERE {_sql_nonzero('e')}
    ),
    p AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             {_SQL_COS.format(a="a.e", b="b.e")} AS c2
      FROM cc a JOIN cc b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, round(c2, 6) AS cosine FROM p WHERE c2 >= 0.95
    """,
)
def q26_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate CLUSTER detection at the scale-safe
    operating point: tight-angle groups (cosine ≥ 0.95) found with
    ``n_planes=None`` auto-sizing and 8 independent tables — the
    multi-member sibling of q72's twin-pair pin (clusters stress
    transitive bucket collisions; q72 stresses 1:1 twins).  Every 10th
    vector is planted with 3 deterministic perturbations (recomputed
    identically in the oracle); the exact pair set is the 6 pairs per
    4-member cluster.  Candidates remain a (table, bucket) equi-join —
    never all-pairs; precision exact by cosine verify; recall complete
    at this angle (asserted vs numpy brute force at 3 SFs in pytest AND
    by the oracle hash).  eager=True: the auto-size count() probe and
    both fan-out branches read one persisted projection, released
    before return."""
    from .operators.similarity import embedding_near_dup_pairs

    base = _t(spark, sf_dir, "embeddings")
    orig = base.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("embedding"),
    )
    tens = base.filter(F.col("vec_id") % 10 == 0)

    def _perturb(t: int):
        # closure factory: a `_t=t` default arg would add a 3rd lambda
        # parameter, which Spark rejects (transform passes exactly 2)
        return lambda x, i: x.cast("double") + F.lit(0.002 * t) * (
            ((F.col("vec_id") * 31 + i + 13 * t) % 7) - 3
        ).cast("double")

    twins = []
    for t in (1, 2, 3):
        # perturb FIRST (original vec_id in scope), shift the id in a
        # second select — a sibling `... AS vec_id` alias would rebind
        # the lambda's vec_id ref (lateral column aliases, conv #6c)
        twins.append(
            tens.select(
                "vec_id",
                F.transform(F.col("embedding"), _perturb(t)).alias("embedding"),
            ).select((F.col("vec_id") + F.lit(t * 1000000)).alias("vec_id"), "embedding")
        )
    corpus = orig
    for tw in twins:
        corpus = corpus.unionByName(tw)
    pairs = embedding_near_dup_pairs(
        corpus, threshold=0.95, n_planes=None, n_tables=8, eager=True
    )
    # presentation-only trailing orderBy dropped (r12, guide §2.4)
    return pairs.select(
        "id_a", "id_b", F.round(F.col("cosine"), 6).alias("cosine")
    )


@query(
    "q27_text_metrics",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
      FROM documents
    )
    SELECT doc_id,
           len(toks)                                                    AS n_tokens_ws,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_tokens_bpe,
           CAST(len(list_filter(toks, x -> x IN ('the','and','of','to','a','in','is','it','for','with'))) AS DOUBLE)
             / CAST(len(toks) AS DOUBLE)                                AS stopword_ratio,
           0.4 * least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
             + 0.3 * least(CAST(len(list_filter(toks, x -> x IN ('the','and','of','to','a','in','is','it','for','with'))) AS DOUBLE)
                             / CAST(len(toks) AS DOUBLE) * 3.0, 1.0)
             + 0.3 * (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                        / CAST(length(text) AS DOUBLE))                 AS quality_score
    FROM t
    """,
)
def q27_text_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish regex), stopword ratio, and
    the composite quality score — per-doc scan-speed expressions."""
    from .operators import text as tx

    docs = _t(spark, sf_dir, "documents")
    c = F.col("text")
    return docs.select(
        "doc_id",
        tx.whitespace_token_count(c).alias("n_tokens_ws"),
        tx.regex_token_count(c).alias("n_tokens_bpe"),
        tx.stopword_ratio(c).alias("stopword_ratio"),
        tx.quality_score(c).alias("quality_score"),
    )


@query(
    "q28_language_id",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
      FROM documents
    ),
    h AS (
      SELECT doc_id, lang,
        len(list_filter(toks, x -> x IN ('the','and','of','to','a','in','is','it','for','with')))   AS h_en,
        len(list_filter(toks, x -> x IN ('le','la','les','de','des','et','un','une','est','pour'))) AS h_fr,
        len(list_filter(toks, x -> x IN ('el','la','los','de','y','un','una','es','en','para')))    AS h_es,
        len(list_filter(toks, x -> x IN ('der','die','das','und','ein','eine','ist','mit','für','von'))) AS h_de
      FROM t
    )
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN h_en >= h_fr AND h_en >= h_es AND h_en >= h_de AND h_en > 0 THEN 'en'
                WHEN h_fr >= h_es AND h_fr >= h_de AND h_fr > 0 THEN 'fr'
                WHEN h_es >= h_de AND h_es > 0 THEN 'es'
                WHEN h_de > 0 THEN 'de'
                ELSE 'und' END AS predicted_lang
    FROM h
    """,
)
def q28_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic vs the labeled lang column.
    Hit counts staged as one struct column (computed once per row), the
    argmax CASE runs over the staged attributes — convention #2."""
    from .operators.dedup import spread
    from .operators.text import language_from_hits, language_hits

    docs = spread(_t(spark, sf_dir, "documents"))
    return (
        docs.withColumn("_h", language_hits(F.col("text")))
        .select(
            "doc_id",
            F.col("lang").alias("labeled_lang"),
            language_from_hits(F.col("_h")).alias("predicted_lang"),
        )
    )


@query(
    "q29_doc_fingerprint",
    # NULL-text docs are excluded on both sides (conv 22): a missing
    # document has no fingerprint — Spark's fold yields NULL while
    # DuckDB's list_concat([0], NULL) degrades to a 0 fingerprint.
    oracle="""
    SELECT doc_id,
           list_reduce(
             list_concat([CAST(0 AS BIGINT)],
               list_transform(
                 string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '),
                 w -> CAST(concat('0x', substr(md5(w), 1, 8)) AS BIGINT) % 1000000007)),
             (a, b) -> (a * 31 + b) % 1000000007) AS fingerprint
    FROM documents
    WHERE text IS NOT NULL
    """,
)
def q29_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling-hash document fingerprint (md5-derived
    word ints, polynomial fold mod p — engine-portable, overflow-free)."""
    from .operators.dedup import spread
    from .operators.text import doc_fingerprint

    # spread: the per-word interpreted fold is the cost here — a single
    # parquet file must not serialize it onto one core (no-op at scale)
    docs = spread(
        _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    )
    return docs.select("doc_id", doc_fingerprint(F.col("text")).alias("fingerprint"))


@query(
    "q30_multimodal_decode",
    # The stub decode is DETERMINISTIC (dims derive from the sha256 of
    # the content bytes), so the whole pipeline is SQL-checkable: DuckDB
    # recomputes n_bytes/sha/width/height from the same utf-8 bytes.
    # ('0x'||hex)::BIGINT mirrors the digest-byte extraction exactly.
    oracle="""
    SELECT doc_id AS media_id,
           'image' AS kind,
           CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS n_bytes,
           sha256(coalesce(text, '')) AS sha256,
           CAST(64 + CAST('0x' || substr(sha256(coalesce(text, '')), 1, 2) AS BIGINT) % 192 AS INT) AS width,
           CAST(64 + CAST('0x' || substr(sha256(coalesce(text, '')), 3, 2) AS BIGINT) % 192 AS INT) AS height,
           3 AS n_channels,
           'fake' AS decoder,
           16 AS feature_dim
    FROM documents
    """,
)
def q30_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: binary content column → Arrow-
    batched decode (stubbed, marked 'fake') → byte-histogram features.
    Exercises mapInPandas schema/batch contracts on real binary data."""
    from .operators.multimodal import attach_binary_content, decode_media, extract_features

    media = attach_binary_content(_t(spark, sf_dir, "documents"), kind="image")
    decoded = decode_media(media)
    feats = extract_features(media).select("media_id", "feature_dim")
    # presentation-only trailing orderBy dropped (r12, guide §2.4): it
    # globally range-partitioned every decoded payload row per action
    return decoded.join(feats, "media_id")
