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
