"""Perceptual-hash near-dup (operators/phash.py): kernel parity vs a
sequential reference, planted-jitter recall, blocking completeness vs
brute force, loud real-decoder failure, NULL/empty exclusion."""

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_marketeye_airflow_spark.operators.phash import (
    PHASH_CELLS,
    phash_pairs,
    phash_signatures,
)


def _ref_phash(buf: bytes) -> int:
    """Sequential reference: block-average cells -> 64-pt WHT -> sign
    bits of coefficients 1..63 packed MSB-first into bits 62..0."""
    idx = np.arange(PHASH_CELLS, dtype=np.int64)
    ands = idx[:, None] & idx[None, :]
    pc = np.zeros_like(ands)
    v = ands.copy()
    while v.any():
        pc += v & 1
        v >>= 1
    H = np.where(pc % 2 == 0, 1, -1).astype(np.int64)
    px = np.frombuffer(buf, dtype=np.uint8).astype(np.int64)
    n = px.size
    blocks = (np.arange(n, dtype=np.int64) * PHASH_CELLS) // n
    sums = np.bincount(blocks, weights=px, minlength=PHASH_CELLS).astype(
        np.int64
    )
    counts = np.bincount(blocks, minlength=PHASH_CELLS)
    cells = np.zeros(PHASH_CELLS, dtype=np.int64)
    nz = counts > 0
    cells[nz] = sums[nz] // counts[nz]
    coeffs = H @ cells
    w = np.int64(1) << (63 - np.arange(1, PHASH_CELLS, dtype=np.int64))
    return int(((coeffs[1:] > 0) * w).sum())


def _media_df(spark, rows):
    return spark.createDataFrame(
        [(i, bytearray(b) if b is not None else None) for i, b in rows],
        "media_id long, content binary",
    )


def test_phash_signatures_match_reference_and_exclude_empty(spark):
    rng = np.random.RandomState(3)
    rows = [
        (1, bytes(rng.randint(0, 256, 500).astype(np.uint8))),
        (2, b"x" * 40),  # shorter than 64 cells: empty blocks zero-fill
        (3, bytes(rng.randint(0, 256, 5000).astype(np.uint8))),
        (4, None),  # excluded
        (5, b""),  # excluded
    ]
    got = {
        r.media_id: r.phash
        for r in phash_signatures(_media_df(spark, rows)).collect()
    }
    assert set(got) == {1, 2, 3}
    for i, b in rows[:3]:
        assert got[i] == _ref_phash(b), i
        assert 0 <= got[i] < 1 << 63  # bit 63 never set (sign-safe)


def test_phash_pairs_recall_on_planted_jitter(spark):
    """Re-encode jitter (±3 per byte) must keep every planted copy
    within hamming 6 of its original and the pair must be FOUND; the
    unrelated decoys must not pair with the planted family."""
    rng = np.random.RandomState(11)
    rows, planted = [], []
    for k in range(10):
        # smooth "image": gradient + texture noise, the realistic case
        base = (np.sin(np.linspace(0, 9 + k, 3000)) * 100 + 120) + rng.rand(
            3000
        ) * 30
        img = base.astype(np.uint8)
        noisy = np.clip(
            img.astype(np.int64) + rng.randint(-3, 4, size=img.size), 0, 255
        ).astype(np.uint8)
        a_id, b_id = 2 * k, 2 * k + 1
        rows += [(a_id, bytes(img)), (b_id, bytes(noisy))]
        planted.append((a_id, b_id))
    for k in range(10):  # unrelated decoys
        rows.append((100 + k, bytes(rng.randint(0, 256, 3000).astype(np.uint8))))
    out = phash_pairs(_media_df(spark, rows), max_distance=6).collect()
    got = {(r.id_a, r.id_b) for r in out}
    for p in planted:
        assert p in got, p
    for r in out:
        assert r.hamming <= 6
        # decoys never join the planted family
        assert not (r.id_a < 100) or r.id_b < 100, (r.id_a, r.id_b)


@pytest.mark.parametrize("d", [0, 3, 6])
def test_phash_pairs_complete_vs_bruteforce(spark, d):
    """The multi-probe blocking must return EXACTLY the hamming<=d
    definition (pigeonhole completeness to 7) — compare against the
    brute-force pair set over reference signatures, including planted
    exact dups (hamming 0) and 1-2-flip neighbors."""
    rng = random.Random(5)
    nprng = np.random.RandomState(5)
    rows = []
    for i in range(30):
        rows.append((i, bytes(nprng.randint(0, 256, 800).astype(np.uint8))))
    # exact dup + tiny jitter copies to populate small distances
    rows.append((100, rows[0][1]))
    j = np.frombuffer(rows[1][1], dtype=np.uint8).astype(np.int64)
    j[rng.randrange(800)] += 1
    rows.append((101, bytes(np.clip(j, 0, 255).astype(np.uint8))))
    sigs = {i: _ref_phash(b) for i, b in rows}
    want = set()
    for a in sigs:
        for b in sigs:
            if a < b and bin(sigs[a] ^ sigs[b]).count("1") <= d:
                want.add((a, b))
    got = {
        (r.id_a, r.id_b)
        for r in phash_pairs(_media_df(spark, rows), max_distance=d).collect()
    }
    assert got == want


def test_phash_pairs_rejects_unsupported_distance(spark):
    df = _media_df(spark, [(1, b"abc")])
    with pytest.raises(ValueError, match=r"max_distance must be in \[0, 7\]"):
        phash_pairs(df, max_distance=8)


def test_phash_real_decoder_raises_loud(spark):
    """require_real_decoder=True with no PIL / non-image bytes must
    raise NotImplementedError — never silently fall back to the fake
    byte-raster path."""
    df = _media_df(spark, [(1, b"definitely not an image")])
    with pytest.raises(Exception, match="NotImplementedError|real pHash|PIL"):
        phash_signatures(df, require_real_decoder=True).collect()
