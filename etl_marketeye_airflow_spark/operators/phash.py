"""Perceptual-hash near-duplicate detection for image media columns.

Visual near-dup (re-encoded / recompressed copies of the same image) is
the multimodal twin of q23's SimHash text near-dup: a 64-bit perceptual
signature per image, hamming-bucket blocking (never all-pairs), exact
bit_count verify.  Engine extension — the MarketEye reference has no
media code (reference scope: etl.py's text-only pipeline); this
completes the multimodal block (operators/multimodal.py: decode /
resize / features / frame-sampling) with the near-dup member the r11
review called out as missing.

Hash design — WHY NOT FLOAT DCT: classic pHash resizes to 32×32, takes
a float DCT-II, and thresholds the low-frequency coefficients on their
median.  A float DCT is not cross-engine bit-stable (conv 6d: libm is
engine-specific; a Σ of doubles is order-sensitive), so this variant
keeps the *spectral sign-bits* idea but replaces the transform with the
integer Walsh–Hadamard transform (WHT — the ±1 orthogonal transform;
"the poor man's DCT", same low-frequency energy-compaction role in
e.g. H.264's integer transform):

    raster → 64 block-average cells (exact: sum div count)
           → 64-point WHT, H[i][j] = (−1)^popcount(i AND j)  (all ±1)
           → bit_i = (coefficient_i > 0),  i = 1..63 (DC dropped)
           → packed MSB-first into bits 62..0 of a non-negative long.

Every step is exact integer arithmetic with associative sums, so the
signature is bit-identical on any engine, partitioning, or core count —
and a DuckDB oracle rebuilds it from the same bytes (see the q206
oracle).  Robustness matches the DCT original where it matters:
re-encode jitter (±3 on every raster byte) moves the hash 0–6 bits
while unrelated images sit at ~32 (measured in tests/test_phash.py).

Decode is two-tier like operators/multimodal.py:decode_media: the
default FAKE path treats the content bytes themselves as the grayscale
raster (deterministic, library-free, oracle-recomputable — text bytes
through attach_binary_content exercise the full pipeline); with
``require_real_decoder=True`` PIL decodes real pixels (grayscale,
row-major) into the SAME kernel, and unrecognized content raises
NotImplementedError — never a silent fake.

Closure hygiene per the multimodal module note: kernels reference only
stdlib/numpy/pandas + captured locals.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

PHASH_CELLS = 64  # raster pooled to this many cells; 63 signature bits


def phash_signatures(
    media: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    require_real_decoder: bool = False,
) -> DataFrame:
    """(id, phash) for every media row with non-empty content — rows
    with NULL or zero-byte content are EXCLUDED at entry (conv 22c, the
    zero-norm-vector discipline: empty rasters would all hash equal and
    pair with each other at hamming 0).

    Scale shape: a pure per-row Arrow-batched MAP — no shuffle; the
    kernel's per-row state is one 64-cell vector regardless of content
    size (np.bincount accumulates the block sums in one pass; exact
    while content < 2^45 bytes since sums ≤ n·255 < 2^53).
    """
    require = bool(require_real_decoder)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        # H[i][j] = (-1)^popcount(i&j): the 64-point Walsh-Hadamard
        # sign matrix, built once per worker from integer ops only
        idx = np.arange(PHASH_CELLS, dtype=np.int64)
        ands = idx[:, None] & idx[None, :]
        pc = np.zeros_like(ands)
        v = ands.copy()
        while v.any():
            pc += v & 1
            v >>= 1
        H = np.where(pc % 2 == 0, 1, -1).astype(np.int64)
        weights = np.int64(1) << (
            np.int64(63) - np.arange(1, PHASH_CELLS, dtype=np.int64)
        )

        def raster(buf: bytes) -> "np.ndarray":
            if not require:
                return np.frombuffer(buf, dtype=np.uint8)
            try:
                import io

                from PIL import Image  # probed at runtime (container may lack it)

                im = Image.open(io.BytesIO(buf)).convert("L")
                return np.asarray(im, dtype=np.uint8).reshape(-1)
            except ImportError:
                raise NotImplementedError(
                    "real pHash decode needs PIL (a header parse cannot "
                    "produce pixels); use require_real_decoder=False for "
                    "the marked byte-raster path"
                )
            except NotImplementedError:
                raise
            except Exception:
                raise NotImplementedError("PIL could not decode content")

        def sig(buf: bytes) -> int:
            px = raster(buf).astype(np.int64)
            n = px.size
            if n == 0:
                # unreachable behind the entry filter on the fake path;
                # a real decode of a 0-pixel image fails loud instead
                raise NotImplementedError("empty raster has no pHash")
            blocks = (np.arange(n, dtype=np.int64) * PHASH_CELLS) // n
            sums = np.bincount(
                blocks, weights=px, minlength=PHASH_CELLS
            ).astype(np.int64)
            counts = np.bincount(blocks, minlength=PHASH_CELLS)
            cells = np.zeros(PHASH_CELLS, dtype=np.int64)
            nz = counts > 0
            cells[nz] = sums[nz] // counts[nz]
            coeffs = H @ cells
            return int(((coeffs[1:] > 0) * weights).sum())

        for pdf in batches:
            bufs = [bytes(c) for c in pdf[content_col].values]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].values,
                    "phash": [sig(b) for b in bufs],
                }
            )

    nonempty = media.filter(
        F.col(content_col).isNotNull() & (F.length(F.col(content_col)) > 0)
    ).select(F.col(id_col).alias(id_col), F.col(content_col).alias(content_col))
    return nonempty.mapInPandas(run, schema="media_id long, phash long")


def phash_pairs(
    media: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    max_distance: int = 6,
    require_real_decoder: bool = False,
    eager: bool = True,
) -> DataFrame:
    """All pairs within hamming ``max_distance`` of each other's pHash
    — (id_a, id_b, hamming), id_a < id_b, COMPLETE recall for
    ``max_distance`` ≤ 7 (a pigeonhole theorem, not a probability), so
    the exact pair set is SQL-reproducible end-to-end.

    Blocking (the q25 multi-probe idea on q23's chunk frame): the 63
    signature bits split into 4 chunks (16/16/16/15).  Two signatures
    within hamming 7 must share a chunk within hamming ≤ 1 (4·2 > 7),
    so candidates = join of each signature's PROBE keys (the chunk
    value and its ≤16 one-bit flips, ≤68 keys/row) against every
    signature's 4 ANCHOR keys — covers both the equal-chunk and the
    one-flip case in a single equi-join, never an all-pairs scan.
    Verify is exact bit_count(xor).  For ``max_distance`` ≤ 3 the
    probes degenerate to anchors only (plain q23 pigeonhole — 4
    keys/row): 4 untouched-chunk slack already guarantees an EQUAL
    chunk.

    Scale shape: signatures are a zero-shuffle map persisted once (16
    bytes/row); blocking is one equi-join on a ≤2^16 keyspace per
    chunk — bucket sizes are |corpus|/2^16-ish, candidate volume stays
    linear-ish in the corpus (the probe factor is a constant 17).
    ``eager=True`` materializes the pair set and unpersists the
    signature base before returning (fan-out rule, same as
    simhash_pairs).
    """
    if not 0 <= max_distance <= 7:
        raise ValueError(
            "max_distance must be in [0, 7] (4-chunk one-flip probes "
            f"guarantee recall only to 7), got {max_distance}"
        )
    widths = [16, 16, 16, 15]  # LSB-first chunk widths over bits 0..62
    offs = [0, 16, 32, 48]
    base = phash_signatures(
        media, id_col, content_col, require_real_decoder
    ).persist(StorageLevel.MEMORY_AND_DISK)

    def chunk(j: int):
        return F.shiftrightunsigned(F.col("phash"), offs[j]).bitwiseAND(
            F.lit((1 << widths[j]) - 1)
        )

    anchors = base.select(
        "media_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("j"), chunk(j).alias("key"))
                    for j in range(4)
                ]
            )
        ).alias("c"),
    ).select(
        "media_id", "phash", F.col("c.j").alias("j"), F.col("c.key").alias("key")
    )
    if max_distance <= 3:
        probes = anchors
    else:
        probes = base.select(
            "media_id",
            "phash",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("j"),
                            chunk(j).bitwiseXOR(F.lit(flip)).alias("key"),
                        )
                        for j in range(4)
                        for flip in [0] + [1 << t for t in range(widths[j])]
                    ]
                )
            ).alias("c"),
        ).select(
            "media_id",
            "phash",
            F.col("c.j").alias("j"),
            F.col("c.key").alias("key"),
        )
    a, b = probes.alias("a"), anchors.alias("b")
    dist = F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash")))
    out = (
        a.join(
            b,
            (F.col("a.j") == F.col("b.j"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            dist.cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_distance)
        .dropDuplicates(["id_a", "id_b"])
    )
    if eager:
        out = out.localCheckpoint()
        base.unpersist()
    return out
