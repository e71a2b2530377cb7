"""Physical-layout keys: Z-order (Morton) clustering for
multi-dimensional data skipping.

A 100 TB table sorted by ONE column skips row groups only for
predicates on that column; interleaving the bits of two (quantized)
dimensions into a Morton key and sorting by it gives BOTH dimensions
locality — a range predicate on either column touches O(√files)
instead of all of them (the technique behind Delta/Iceberg OPTIMIZE
ZORDER).  The key is plain integer bit algebra — one JVM expression,
deterministic on any engine, so layouts are reproducible and
oracle-checkable.

Reference scope: the MarketEye reference writes unsorted JSON/CSV
(dags/marketeye_etl_dag.py sink tasks); this extends the engine's sink
story (sinks/bucketed.py) with clustered layouts for scan-heavy
workloads.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key2(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton key interleaving the low ``bits`` bits of two NON-NEGATIVE
    integer columns: a's bit i lands at position 2i, b's at 2i+1.
    2·bits ≤ 62 keeps the key a positive long.

    Static Python loop over bit positions (shift amounts must be
    literals — same pattern as dedup.simhash): still a single codegen'd
    JVM expression, no UDF.  Callers quantize real dimensions into the
    [0, 2^bits) range first (modulo bucket, time bucket, …).
    """
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    key = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1))
        key = key.bitwiseOR(F.shiftleft(abit, 2 * i)).bitwiseOR(
            F.shiftleft(bbit, 2 * i + 1)
        )
    return key


def zorder_layout(
    df: DataFrame,
    x: Column,
    y: Column,
    bits: int = 10,
    n_files: int = 64,
) -> DataFrame:
    """Assign every row a Morton key over two quantized dimensions and a
    target file id (the key's top bits) — the plan you feed
    ``repartitionByRange("file_id").sortWithinPartitions("zkey")`` to
    get a both-dimensions-skippable layout.  Pure map, zero shuffle
    here; the write supplies the single range shuffle.
    """
    import math

    file_bits = max(1, int(math.ceil(math.log2(n_files))))
    zkey = zorder_key2(x, y, bits)
    return df.withColumn("zx", x.cast("long")).withColumn(
        "zy", y.cast("long")
    ).withColumn("zkey", zkey).withColumn(
        "file_id", F.shiftright(F.col("zkey"), 2 * bits - file_bits)
    )


def zorder_files_for_box(
    x_range: tuple[int, int],
    y_range: tuple[int, int],
    bits: int = 10,
    n_files: int = 64,
) -> list[int]:
    """The read side of the layout: exact set of file ids whose
    quadtree cell intersects the query box ``[x0,x1] × [y0,y1]``
    (quantized coordinates).  Because a file id is the TOP bits of the
    Morton key, each file is an axis-aligned quadtree cell — its x and
    y extents are contiguous ranges recovered by de-interleaving the
    id — so intersection is four integer comparisons per file.

    Driver-side pure function over ``n_files`` candidates (the file
    COUNT, not the data, bounds the loop); feed the result to
    ``.filter(F.col("file_id").isin(files))`` on a
    ``partitionBy("file_id")`` layout and Spark prunes partitions
    before any IO — O(√files) of them touched for a one-dimensional
    range, verified in tests.
    """
    import math

    x0, x1 = x_range
    y0, y1 = y_range
    file_bits = max(1, int(math.ceil(math.log2(n_files))))
    out = []
    for fid in range(1 << file_bits):
        # fid holds zkey bits [2*bits-file_bits .. 2*bits-1]
        hx = hy = 0
        cx = cy = 0
        for j in range(file_bits):  # from the id's high bit down
            p = 2 * bits - 1 - j  # absolute zkey bit position
            bit = (fid >> (file_bits - 1 - j)) & 1
            if p % 2 == 0:  # even positions carry x bits
                hx = (hx << 1) | bit
                cx += 1
            else:
                hy = (hy << 1) | bit
                cy += 1
        fx0, fx1 = hx << (bits - cx), ((hx + 1) << (bits - cx)) - 1
        fy0, fy1 = hy << (bits - cy), ((hy + 1) << (bits - cy)) - 1
        if fx0 <= x1 and x0 <= fx1 and fy0 <= y1 and y0 <= fy1:
            out.append(fid)
    return out
