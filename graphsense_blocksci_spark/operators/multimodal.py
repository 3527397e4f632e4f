"""Multimodal columns: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: the payload is an opaque
`binary` column (or a pointer into object storage) riding next to typed
metadata; decode/feature-extraction runs as Arrow-batched pandas
functions via `mapInPandas` — the ONLY place Python touches the data,
batched, columnar, and partition-parallel. Everything around it
(schema, partitioning, filters on metadata) stays JVM-side.

Decode is REAL for uncompressed NetPBM (P5/P6): a numpy-only header
parser + raster reshape (`decode_image`, `resize_netpbm`), with exact
integer pixel statistics and bit-deterministic nearest-neighbor
resize. Compressed formats (JPEG/PNG) route through PIL behind an
import guard — absent in this container, in which case those payloads
degrade to decode_ok=false instead of failing the stage.
`extract_features`/`resize_image` keep the md5-derived deterministic
stand-ins whose outputs the SQL oracle reproduces end-to-end.
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


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("n_pixels", T.LongType(), True),
        T.StructField("px_sum", T.LongType(), True),
        T.StructField("px_mean", T.DoubleType(), True),
    ]
)


def _parse_netpbm(buf: bytes):
    """Binary NetPBM (P5 gray / P6 RGB) → (w, h, channels, ndarray).
    Pure numpy — no imaging library. Returns None for anything else
    (truncated raster, wrong magic, 2-byte maxval)."""
    import numpy as np

    if len(buf) < 2 or buf[:2] not in (b"P5", b"P6"):
        return None
    channels = 3 if buf[:2] == b"P6" else 1
    pos, fields = 2, []
    while len(fields) < 3 and pos < len(buf):
        c = buf[pos : pos + 1]
        if c.isspace():
            pos += 1
        elif c == b"#":  # comment runs to end of line
            nl = buf.find(b"\n", pos)
            if nl < 0:
                return None
            pos = nl + 1
        else:
            end = pos
            while end < len(buf) and not buf[end : end + 1].isspace():
                end += 1
            if not buf[pos:end].isdigit():
                return None
            fields.append(int(buf[pos:end]))
            pos = end
    if len(fields) < 3 or pos >= len(buf):
        return None
    w, h, maxval = fields
    if w <= 0 or h <= 0 or not 0 < maxval < 256:
        return None
    pos += 1  # exactly ONE whitespace byte separates maxval from raster
    n = w * h * channels
    raster = buf[pos : pos + n]
    if len(raster) < n:
        return None
    arr = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, channels)
    return w, h, channels, arr


def decode_image(media: DataFrame) -> DataFrame:
    """REAL image decode over binary payloads, Arrow-batched.

    Uncompressed NetPBM (P5/P6) decodes natively via the numpy parser
    above — header parse, raster reshape, integer pixel statistics
    (px_sum is an exact integer; px_mean is one final division, so the
    output is deterministic and engine-portable). Compressed formats
    (JPEG/PNG/...) fall back to PIL behind an import guard — absent in
    this container, in which case such payloads (and unparseable
    bytes) return decode_ok=false rather than failing the batch: at
    100 TB a poison payload must never kill the stage.
    """

    def _batches(it: Iterator) -> Iterator:
        import pandas as pd

        try:
            from PIL import Image  # optional: compressed formats
            import io
            import numpy as np

            def _pil(buf: bytes):
                try:
                    img = Image.open(io.BytesIO(buf))
                    arr = np.asarray(img)
                    if arr.ndim == 2:
                        arr = arr[:, :, None]
                    return img.width, img.height, arr.shape[2], arr
                except Exception:  # noqa: BLE001 — poison payload
                    return None

        except ImportError:
            _pil = None

        for pdf in it:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                parsed = None
                if p is not None:
                    buf = bytes(p)
                    parsed = _parse_netpbm(buf)
                    if parsed is None and _pil is not None:
                        parsed = _pil(buf)
                if parsed is None:
                    rows.append(
                        {
                            "media_id": mid,
                            "decode_ok": False,
                            "width": None,
                            "height": None,
                            "channels": None,
                            "n_pixels": None,
                            "px_sum": None,
                            "px_mean": None,
                        }
                    )
                    continue
                w, h, c, arr = parsed
                s = int(arr.sum(dtype="int64"))
                n = w * h * c
                rows.append(
                    {
                        "media_id": mid,
                        "decode_ok": True,
                        "width": w,
                        "height": h,
                        "channels": c,
                        "n_pixels": n,
                        "px_sum": s,
                        "px_mean": s / n,
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(_batches, schema=DECODE_SCHEMA)


def resize_netpbm(
    media: DataFrame, width: int = 8, height: int = 8
) -> DataFrame:
    """REAL nearest-neighbor resize for NetPBM payloads — integer
    index selection (floor(i * H / h)), no interpolation arithmetic,
    so the resized raster is bit-deterministic. Output carries the
    resized raster's md5 + exact integer pixel sum; non-decodable
    payloads yield decode_ok=false (same poison-payload contract as
    `decode_image`). Compressed formats would resize via the PIL
    branch of `decode_image`'s guard when the library exists."""

    def _batches(it: Iterator) -> Iterator:
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                parsed = _parse_netpbm(bytes(p)) if p is not None else None
                if parsed is None:
                    rows.append(
                        {
                            "media_id": mid,
                            "decode_ok": False,
                            "target_w": width,
                            "target_h": height,
                            "px_sum": None,
                            "thumb_md5": None,
                        }
                    )
                    continue
                w, h, c, arr = parsed
                yi = (np.arange(height) * h) // height
                xi = (np.arange(width) * w) // width
                thumb = arr[yi][:, xi]
                rows.append(
                    {
                        "media_id": mid,
                        "decode_ok": True,
                        "target_w": width,
                        "target_h": height,
                        "px_sum": int(thumb.sum(dtype="int64")),
                        "thumb_md5": hashlib.md5(thumb.tobytes()).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows)

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("decode_ok", T.BooleanType(), False),
            T.StructField("target_w", T.IntegerType(), False),
            T.StructField("target_h", T.IntegerType(), False),
            T.StructField("px_sum", T.LongType(), True),
            T.StructField("thumb_md5", T.StringType(), True),
        ]
    )
    return media.mapInPandas(_batches, schema=schema)


DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("dhash", T.LongType(), True),
    ]
)


def image_dhash(
    media: DataFrame, hash_w: int = 8, hash_h: int = 8
) -> DataFrame:
    """Perceptual difference-hash (dHash) over NetPBM payloads — the
    image-side analog of the text near-dup fingerprints: decode, sum
    channels to an integer gray raster, nearest-neighbor resize to
    (hash_w+1) × hash_h (the same floor(i*src/dst) index mapping as
    `resize_netpbm`, bit-deterministic, no interpolation floats), then
    one bit per cell: gray[r,c] > gray[r,c+1], packed row-major into a
    64-bit integer. Identical-looking images (crops/rescales of the
    same source) collide on dhash, so exact dedup of perceptual
    duplicates is a plain hash groupBy downstream — no pairwise
    comparison. Poison payloads degrade to decode_ok=false.

    Gray = channel SUM (not mean): exact integer, order-preserving for
    equal-channel-count corpora, and division-free so the SQL oracle
    reproduces every bit.
    """

    def _batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                parsed = _parse_netpbm(bytes(p)) if p is not None else None
                if parsed is None:
                    rows.append(
                        {"media_id": mid, "decode_ok": False, "dhash": None}
                    )
                    continue
                w, h, _c, arr = parsed
                gray = arr.astype("int64").sum(axis=2)
                yi = (np.arange(hash_h) * h) // hash_h
                xi = (np.arange(hash_w + 1) * w) // (hash_w + 1)
                g = gray[yi][:, xi]
                bits = (g[:, :-1] > g[:, 1:]).astype("int64")
                weights = 1 << (
                    np.arange(hash_h * hash_w, dtype="int64").reshape(
                        hash_h, hash_w
                    )
                )
                rows.append(
                    {
                        "media_id": mid,
                        "decode_ok": True,
                        "dhash": int((bits * weights).sum()),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(_batches, schema=DHASH_SCHEMA)


AUDIO_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("sq_sum", T.LongType(), False),
        T.StructField("n_crossings", T.LongType(), False),
    ]
)


def audio_frame_features(media: DataFrame, frame_size: int = 30) -> DataFrame:
    """Frame-wise audio features over PCM16 WAV payloads: one output
    row per FULL frame of ``frame_size`` samples with the frame's
    exact integer energy (sum of squared samples — RMS without the
    final float sqrt, so the value is engine-portable) and its
    zero-crossing count (adjacent sign changes WITHIN the frame, sign
    as `sample < 0`). The trailing partial frame is dropped — standard
    STFT framing. Multi-channel payloads interleave; the fixture path
    is mono. Undecodable payloads emit no rows (the decode_ok=false
    row-per-payload contract lives on `decode_audio`; a feature
    extractor's non-rows are its degrade path).

    This is the vectorized-frame pattern: reshape → per-axis
    reductions in numpy per Arrow batch, rows out. A video
    frame-featurizer has the same shape with `frame_sample` offsets.
    """

    def _batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            mids, fidx, sq, zc = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                parsed = _parse_wav(bytes(p)) if p is not None else None
                if parsed is None:
                    continue
                _rate, _ch, samples = parsed
                nf = len(samples) // frame_size
                if nf == 0:
                    continue
                s = samples[: nf * frame_size].astype("int64").reshape(
                    nf, frame_size
                )
                neg = s < 0
                mids.extend([mid] * nf)
                fidx.extend(range(nf))
                sq.extend((s * s).sum(axis=1).tolist())
                zc.extend((neg[:, 1:] != neg[:, :-1]).sum(axis=1).tolist())
            # explicit dtypes: an all-empty batch would otherwise yield
            # object columns that Arrow can't map to the long schema
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "frame_idx": fidx,
                    "sq_sum": sq,
                    "n_crossings": zc,
                }
            ).astype("int64")

    return media.mapInPandas(_batches, schema=AUDIO_FRAMES_SCHEMA)


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


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("abs_sum", T.LongType(), True),
        T.StructField("peak", T.IntegerType(), True),
    ]
)


def _parse_wav(buf: bytes):
    """RIFF/WAVE PCM16 → (sample_rate, channels, int16 ndarray).
    Pure numpy + chunk walk — no audio library. Returns None for
    anything that is not a well-formed little-endian PCM16 WAV
    (wrong magic, truncated chunk, non-PCM format, odd data size)."""
    import struct

    import numpy as np

    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        body = buf[pos + 8 : pos + 8 + size]
        if len(body) < size:
            return None
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None or len(fmt) < 16:
        return None
    audio_fmt, channels, rate, _br, _ba, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if audio_fmt != 1 or bits != 16 or channels < 1 or rate <= 0:
        return None
    if len(data) % 2 != 0:
        return None
    return rate, channels, np.frombuffer(data, dtype="<i2")


def decode_audio(media: DataFrame) -> DataFrame:
    """REAL audio decode over binary payloads, Arrow-batched.

    Little-endian PCM16 RIFF/WAVE decodes natively via the numpy
    chunk-walker above; statistics are exact integers (abs_sum is an
    int64 sum of |sample|, peak the max |sample|), so the output is
    deterministic and engine-portable. Unparseable / non-PCM payloads
    return decode_ok=false instead of failing the batch — at 100 TB a
    poison payload must never kill the stage. Same plumbing contract
    as decode_image: metadata stays JVM-side, only payload bytes cross
    into Python, Arrow-batched per partition.
    """

    def _batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                parsed = _parse_wav(bytes(p)) if p is not None else None
                if parsed is None:
                    rows.append(
                        {
                            "media_id": mid,
                            "decode_ok": False,
                            "sample_rate": None,
                            "n_channels": None,
                            "n_samples": None,
                            "abs_sum": None,
                            "peak": None,
                        }
                    )
                    continue
                rate, channels, samples = parsed
                rows.append(
                    {
                        "media_id": mid,
                        "decode_ok": True,
                        "sample_rate": rate,
                        "n_channels": channels,
                        "n_samples": len(samples),
                        "abs_sum": int(
                            np.abs(samples.astype("int64")).sum()
                        ),
                        "peak": int(np.abs(samples.astype("int64")).max())
                        if len(samples)
                        else 0,
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(_batches, schema=AUDIO_SCHEMA)
