"""Multimodal columns: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: the payload is an opaque
`binary` column (or a pointer into object storage) riding next to typed
metadata; decode/feature-extraction runs as Arrow-batched pandas
functions via `mapInPandas` — the ONLY place Python touches the data,
batched, columnar, and partition-parallel. Everything around it
(schema, partitioning, filters on metadata) stays JVM-side.

The decode step itself is STUBBED here (`decode_image` raises —
PIL/ffmpeg are not in this container); `extract_features` is the same
plumbing with a deterministic md5-derived fake decode so the batch
shape, schema and partitioning are real and testable — and exactly
reproducible by the SQL oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
    ]
)


def attach_payload(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Build a media table from the documents fixture: the utf-8 bytes
    of the text stand in for an image payload. Real pipelines read the
    bytes from object storage; the downstream plumbing is identical."""
    from graphsense_blocksci_spark.operators.textops import spread

    return spread(docs).select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(F.encode(F.col(text_col), "utf-8")).cast("long").alias("n_bytes"),
    )


def decode_image(media: DataFrame) -> DataFrame:
    """REAL image decode — requires PIL/libvips, absent in this
    container. The partitioning/batching contract is `extract_features`;
    swap the row_fn there for a real decoder when the libs exist."""
    raise NotImplementedError(
        "image decode requires PIL/libvips (not in this container); "
        "use extract_features() for the identical mapInPandas plumbing "
        "with a deterministic fake decoder"
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    `mapInPandas` streams column batches through Python: each batch is
    a pandas DataFrame, output is an iterator of frames matching
    FEATURES_SCHEMA. The fake decode derives (width, height, channels)
    from the payload's md5 — deterministic, so the DuckDB oracle can
    verify the full pipeline end-to-end.
    """

    def _batches(it: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in it:
            digests = [
                hashlib.md5(bytes(p)).hexdigest() if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(bytes(p)) if p is not None else None for p in pdf["payload"]],
                    "width": [int(d[0:4], 16) % 1024 if d else None for d in digests],
                    "height": [int(d[4:8], 16) % 1024 if d else None for d in digests],
                    "channels": [3 if d else None for d in digests],
                }
            )

    return media.mapInPandas(_batches, schema=FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' plumbing: one row per sampled offset of each
    payload (a video decoder would emit one row per sampled frame).
    Offsets are a JVM-side sequence — only the (stubbed) per-frame
    decode would be Python. Output: (media_id, frame_no, offset)."""
    return media.select(
        "media_id",
        F.posexplode(
            F.sequence(
                F.lit(0),
                F.greatest(
                    (F.col("n_bytes") - 1) / every_n_bytes, F.lit(0)
                ).cast("int"),
            )
        ).alias("frame_no", "_step"),
    ).select(
        "media_id",
        F.col("frame_no").cast("int").alias("frame_no"),
        (F.col("_step") * every_n_bytes).cast("long").alias("offset"),
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("target_w", T.IntegerType(), True),
        T.StructField("target_h", T.IntegerType(), True),
        T.StructField("thumb_n_bytes", T.LongType(), True),
        T.StructField("thumb_md5", T.StringType(), True),
    ]
)


def resize_image(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """'Resize' plumbing — the thumbnail pass of an image pipeline.

    A real implementation decodes the payload and interpolates pixels
    (PIL/libvips, absent here); the STUB derives the thumbnail
    deterministically — md5(payload || "WxH") expanded to the
    W*H*3-byte RGB budget — so the batch shape, the binary-in/
    binary-out Arrow transfer, and the output schema are all real and
    the DuckDB oracle can verify the digest path end-to-end. Metadata
    (target size, byte budget) stays JVM-side; only the per-payload
    byte work crosses into Python, batched.
    """
    budget = width * height * 3
    suffix = f"{width}x{height}".encode()

    def _batches(it: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in it:
            digests = [
                hashlib.md5(bytes(p) + suffix).hexdigest()
                if p is not None
                else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "target_w": width,
                    "target_h": height,
                    "thumb_n_bytes": [budget if d else None for d in digests],
                    "thumb_md5": digests,
                }
            )

    return media.mapInPandas(_batches, schema=RESIZE_SCHEMA)
