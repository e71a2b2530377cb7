"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, processed with Arrow-batched Pandas UDFs.

The Spark-side architecture is REAL and tested: schema, partition-safe
``mapInPandas`` iterators, fixed output schemas, batch-shape handling.
Media decoding is two-tier (see ``decode_media``):

- default: a clearly-marked deterministic fake derives metadata from
  the content hash (``decoder: 'fake'``) — pipelines and oracles are
  testable end-to-end with no imaging libs and no install-dependent
  output;
- ``require_real_decoder=True``: real decode only — PIL when
  importable, else a stdlib PNG/GIF header parse; unrecognized
  content raises NotImplementedError rather than silently faking.

At scale: media rows are large — keep ``spark.sql.files.maxPartitionBytes``
small enough that a batch of decoded frames fits in executor memory, and
repartition by media_id before frame explosion so one file's frames stay
on one task.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

DECODED_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "width int, height int, n_channels int, decoder string"
)

FEATURE_DIM = 16
FEATURE_SCHEMA = f"media_id long, feature array<float>, feature_dim int"

FRAME_SCHEMA = "media_id long, frame_idx int, ts_ms int, frame_sha string"


# NOTE on closure hygiene: every mapInPandas function below is a nested
# def that references ONLY stdlib / pandas / numpy and locally captured
# values.  cloudpickle ships nested functions by value, so Python workers
# never need to import this package — crucial when the driver process
# runs from a different working directory (no PYTHONPATH propagation in
# local mode).  Do not refactor shared logic into module-level helpers
# that the closures call.


def attach_binary_content(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Adapter for testing: treat document text bytes as opaque media
    content with typed metadata — exercises the binary column path."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def decode_media(media: DataFrame, require_real_decoder: bool = False) -> DataFrame:
    """Per-partition Arrow-batched decode → metadata columns.

    Two paths, chosen by ``require_real_decoder``:

    - ``False`` (default): the marked-fake deterministic path —
      dimensions derive from the content hash and ``decoder`` says
      'fake' so downstream can never mistake it for a real decode.
      This stays fake EVEN IF a real decoder is importable: registry
      oracles (q30/q66) recompute the sha derivation in SQL and must
      not depend on what happens to be installed.
    - ``True``: REAL decode only.  PIL if importable (``decoder:
      'pil'``); else a stdlib header parse for PNG/GIF — actual
      width/height/channels read from the file's IHDR / logical screen
      descriptor (``decoder: 'png-header'``/``'gif-header'``).
      Unrecognized content raises NotImplementedError (never silently
      fakes).  Exercised in pytest against a planted PNG.
    """
    require = bool(require_real_decoder)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        def real_decode(buf: bytes):
            try:
                import io

                from PIL import Image  # probed at runtime; container may lack it

                im = Image.open(io.BytesIO(buf))
                w, h = im.size
                return int(w), int(h), len(im.getbands()), "pil"
            except ImportError:
                pass
            except Exception:
                raise NotImplementedError("PIL could not decode content")
            import struct

            if buf[:8] == b"\x89PNG\r\n\x1a\n" and len(buf) >= 26:
                w, h = struct.unpack(">II", buf[16:24])
                color_type = buf[25]
                ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type, 3)
                return int(w), int(h), ch, "png-header"
            if buf[:6] in (b"GIF87a", b"GIF89a") and len(buf) >= 10:
                w, h = struct.unpack("<HH", buf[6:10])
                return int(w), int(h), 3, "gif-header"
            raise NotImplementedError(
                "no real decoder for content (PIL absent, not PNG/GIF); "
                "run with require_real_decoder=False for the marked-fake path"
            )

        def decode(buf: bytes):
            if require:
                return real_decode(buf)
            h = _hl.sha256(buf or b"").digest()
            return 64 + h[0] % 192, 64 + h[1] % 192, 3, "fake"

        for pdf in batches:
            # column-wise loops over .values, not iterrows(): iterrows
            # materializes a Series per row (~5× slower at corpus batch
            # sizes) — the decode itself is the only per-row work
            bufs = [
                bytes(c) if c is not None else b"" for c in pdf["content"].values
            ]
            decoded = [decode(b) for b in bufs]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "n_bytes": [len(b) for b in bufs],
                    "sha256": [_hl.sha256(b).hexdigest() for b in bufs],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_channels": [d[2] for d in decoded],
                    "decoder": [d[3] for d in decoded],
                }
            )

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


def extract_features(media: DataFrame) -> DataFrame:
    """Byte-histogram feature vector (FEATURE_DIM bins, L1-normalized).

    Deterministic and real (not a stub): a legitimate cheap content
    signature, and the exact plumbing a learned-embedding UDF would use.
    """

    dim = FEATURE_DIM  # captured by value — closures must not touch module globals

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for c in pdf["content"].values:
                buf = np.frombuffer(bytes(c or b""), dtype=np.uint8)
                if buf.size:
                    hist = np.bincount(buf >> 4, minlength=dim).astype("float32")
                    hist /= hist.sum()
                else:
                    hist = np.zeros(dim, dtype="float32")
                feats.append(hist.tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "feature": feats,
                    "feature_dim": dim,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000, limit_per_media: int = 32) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame.

    Frame extraction itself is stubbed (sha of content + index stands in
    for the decoded frame); the row-explosion shape, cap, and ordering
    are the real contract a decoder UDF must satisfy.
    """

    step, cap = int(every_ms), int(limit_per_media)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                if row["kind"] != "video":
                    continue
                duration = int(row["meta"]["duration_ms"] or 0)
                buf = bytes(row["content"] or b"")
                n = min(max(duration // step, 1), cap)
                for i in range(n):
                    rows.append(
                        {
                            "media_id": row["media_id"],
                            "frame_idx": i,
                            "ts_ms": i * step,
                            "frame_sha": _hl.sha256(buf + i.to_bytes(4, "big")).hexdigest()[:16],
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "ts_ms", "frame_sha"])

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def resize_dims(
    decoded: DataFrame, max_w: int = 128, max_h: int = 128
) -> DataFrame:
    """Aspect-preserving fit-within-(max_w × max_h) resize PLAN over
    decode_media output — never upscales.  The dimension math is pure
    integer Column algebra (w·max_h vs h·max_w cross-multiply picks the
    binding axis; the scaled side is an integer div), so the plan is
    JVM-codegen'd, zero Python, and SQL-replayable bit-for-bit; the
    deterministic ``resized_sha`` derives from (content sha, out dims)
    the same way the fake decoder derives dims — an audit key for the
    fake path, replaced by real bytes when resize_content runs.

    Scale: a pure map over the decoded-metadata stream — no shuffle, no
    UDF; 100 TB of media metadata resizes at scan speed.
    """
    w, h = F.col("width").cast("long"), F.col("height").cast("long")
    fits = (w <= max_w) & (h <= max_h)
    width_bound = (w * F.lit(max_h)) >= (h * F.lit(max_w))
    out_w = (
        F.when(fits, w)
        .when(width_bound, F.lit(max_w).cast("long"))
        .otherwise(F.greatest(F.lit(1).cast("long"), F.expr(f"(width * {max_h}) div height")))
    )
    out_h = (
        F.when(fits, h)
        .when(width_bound, F.greatest(F.lit(1).cast("long"), F.expr(f"(height * {max_w}) div width")))
        .otherwise(F.lit(max_h).cast("long"))
    )
    return (
        decoded.withColumn("out_w", out_w.cast("int"))
        .withColumn("out_h", out_h.cast("int"))
        .withColumn(
            "resized_sha",
            F.sha2(
                F.concat(
                    F.col("sha256"),
                    F.lit(":"),
                    F.col("out_w").cast("string"),
                    F.lit("x"),
                    F.col("out_h").cast("string"),
                ),
                256,
            ),
        )
    )


def resize_content(
    media: DataFrame,
    max_w: int = 128,
    max_h: int = 128,
    require_real_resizer: bool = False,
) -> DataFrame:
    """Arrow-batched CONTENT resize: (media_id, out_w, out_h, content).

    ``require_real_resizer=False`` (default): marked-fake deterministic
    path — output bytes are sha-derived (b'FAKERESIZE:' + content sha +
    dims), so the plumbing (binary in, binary out, batch shapes) is
    exercised and reproducible with no image library.
    ``True``: PIL thumbnail resize (real pixels); raises
    NotImplementedError when PIL is absent — a header parse can read
    dimensions but cannot resample pixels, and we never silently fake.
    Closure is self-contained (stdlib + captured ints) per the module
    note."""
    require = bool(require_real_resizer)
    mw, mh = int(max_w), int(max_h)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        def fake(buf: bytes) -> tuple[int, int, bytes]:
            d = _hl.sha256(buf or b"").digest()
            w, h = 64 + d[0] % 192, 64 + d[1] % 192
            if w <= mw and h <= mh:
                ow, oh = w, h
            elif w * mh >= h * mw:
                ow, oh = mw, max(1, h * mw // w)
            else:
                ow, oh = max(1, w * mh // h), mh
            out = b"FAKERESIZE:" + d + ow.to_bytes(2, "big") + oh.to_bytes(2, "big")
            return ow, oh, out

        def real(buf: bytes) -> tuple[int, int, bytes]:
            try:
                import io

                from PIL import Image
            except ImportError:
                raise NotImplementedError(
                    "real resize needs PIL (header parsers cannot "
                    "resample pixels); use require_real_resizer=False "
                    "for the marked-fake path"
                )
            im = Image.open(io.BytesIO(buf))
            im.thumbnail((mw, mh))
            bio = io.BytesIO()
            im.save(bio, format=im.format or "PNG")
            return int(im.size[0]), int(im.size[1]), bio.getvalue()

        fn = real if require else fake
        for pdf in batches:
            bufs = [
                bytes(c) if c is not None else b"" for c in pdf["content"].values
            ]
            done = [fn(b) for b in bufs]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "out_w": [d[0] for d in done],
                    "out_h": [d[1] for d in done],
                    "content": [d[2] for d in done],
                }
            )

    return media.mapInPandas(
        run, schema="media_id long, out_w int, out_h int, content binary"
    )
