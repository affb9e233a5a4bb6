"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata (BASELINE.json north star).

The Spark-side machinery here is real and tested — schemas, Arrow-batched
``mapInPandas``/``pandas_udf`` signatures, partitioning, frame explosion —
while the codec step is a DETERMINISTIC FAKE: this container has no
image/audio libraries, so blobs carry a tiny self-describing header
(``SYNM`` magic + width/height/channels) that the "decoder" parses. Where
a real library would be required, the import is try-gated and the fake is
clearly marked; swapping in PIL/ffmpeg changes only ``_decode_blob``.

Scale posture: every operator is a narrow per-partition transform (no
shuffle); batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``, so executor memory is
header+blob bound regardless of table size. Embeddings feed straight
into operators/similarity.py.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_MAGIC = b"SYNM"
_HEADER_FMT = ">4sHHB"  # magic, width, height, channels
_HEADER_SIZE = struct.calcsize(_HEADER_FMT)

IMAGE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("data", BinaryType(), True),
        StructField("format", StringType(), True),
    ]
)

DECODED_SCHEMA = StructType(
    IMAGE_SCHEMA.fields
    + [
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)


def make_blob(width: int, height: int, channels: int = 3, seed: int = 0) -> bytes:
    """Synthetic self-describing media blob (deterministic in seed)."""
    header = struct.pack(_HEADER_FMT, _MAGIC, width, height, channels)
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    body = rng.bytes(width * height * channels)
    return header + body


def synthetic_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """n synthetic media rows; dimensions vary deterministically."""
    rows = [
        (i, make_blob(16 + (i % 4) * 8, 16 + (i % 3) * 8, 3, seed + i), "synm")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, IMAGE_SCHEMA)


def _decode_blob(data: bytes) -> tuple[int, int, int]:
    """DETERMINISTIC FAKE decode: parse the SYNM header. A real build
    would do ``PIL.Image.open(io.BytesIO(data)).size`` here."""
    try:
        import PIL.Image  # noqa: F401  (absent in this container)
        # real path intentionally unreachable without the library
    except ImportError:
        pass
    if data is None or len(data) < _HEADER_SIZE or data[:4] != _MAGIC:
        return (-1, -1, -1)
    _, w, h, c = struct.unpack(_HEADER_FMT, data[:_HEADER_SIZE])
    return (int(w), int(h), int(c))


def decode_media(df: DataFrame) -> DataFrame:
    """Decode/inspect blobs → typed metadata columns, via mapInPandas
    (Arrow batches; one pass per partition, no shuffle)."""

    # NOTE: the closure is fully self-contained (stdlib-only, no module
    # globals) so cloudpickle ships it by value — Python workers need no
    # importable copy of this package, whatever the driver's cwd.
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _st

        def dec(b):
            if b is None:
                return (-1, -1, -1)
            b = bytes(b)
            if len(b) < 9 or b[:4] != b"SYNM":
                return (-1, -1, -1)
            _, w, h, c = _st.unpack(">4sHHB", b[:9])
            return (int(w), int(h), int(c))

        for pdf in batches:
            meta = pdf["data"].map(dec)
            pdf = pdf.copy()
            pdf["width"] = [m[0] for m in meta]
            pdf["height"] = [m[1] for m in meta]
            pdf["channels"] = [m[2] for m in meta]
            pdf["n_bytes"] = pdf["data"].map(lambda b: len(b) if b is not None else 0)
            yield pdf

    return df.mapInPandas(fn, DECODED_SCHEMA)


PROBED_SCHEMA = StructType(
    IMAGE_SCHEMA.fields
    + [
        StructField("format_detected", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)


def probe_media(df: DataFrame) -> DataFrame:
    """Sniff real container formats and read dimensions from the header
    bytes alone — NO imaging library, pure byte parsing, so unlike the
    fake codec this path is fully real: PNG (IHDR big-endian dims), GIF
    (87a/89a little-endian dims), JPEG (walk the marker stream to the
    first SOF frame header), plus the SYNM synthetic container. Unknown
    or truncated blobs probe as (None, None, None) rather than erroring —
    a corpus audit must survive garbage bytes.

    Same scale posture as decode_media: narrow mapInPandas, one pass per
    partition, memory bounded by the Arrow batch size. This is the
    metadata-extraction step a multimodal pipeline runs BEFORE deciding
    what to decode (filter by format/size first, decode the survivors).
    """

    # self-contained closure: executors import nothing from this package
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _st

        SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
               0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}

        def dim(v):
            # the output columns are int32; a garbage header claiming a
            # dimension outside (0, 2^31-1] must probe as null, not
            # overflow the Arrow cast
            return int(v) if 0 < v <= 0x7FFFFFFF else None

        def probe(b):
            if b is None:
                return (None, None, None)
            b = bytes(b)
            if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n":
                w = int.from_bytes(b[16:20], "big")
                h = int.from_bytes(b[20:24], "big")
                return ("png", dim(w), dim(h))
            if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
                w = int.from_bytes(b[6:8], "little")
                h = int.from_bytes(b[8:10], "little")
                return ("gif", dim(w), dim(h))
            if len(b) >= 4 and b[:2] == b"\xff\xd8":
                i = 2
                while i < len(b):
                    if b[i] != 0xFF:
                        break
                    # legal padding: any run of 0xFF fill bytes may
                    # precede the marker code (ITU T.81 B.1.1.2)
                    j = i + 1
                    while j < len(b) and b[j] == 0xFF:
                        j += 1
                    if j >= len(b):
                        break
                    code = b[j]
                    if code in (0xD9, 0xDA):
                        # EOI / SOS reached without an SOF frame header:
                        # neither has a parseable header region beyond
                        # this point (SOS is followed by entropy data)
                        break
                    if code == 0xD8 or 0xD0 <= code <= 0xD7 or code == 0x01:
                        i = j + 1  # standalone marker, no length field
                        continue
                    if j + 3 > len(b):
                        break  # truncated before the length field
                    seg_len = int.from_bytes(b[j + 1:j + 3], "big")
                    if code in SOF:
                        # precision(1) + h(2) + w(2) after the length
                        if j + 8 <= len(b):
                            h = int.from_bytes(b[j + 4:j + 6], "big")
                            w = int.from_bytes(b[j + 6:j + 8], "big")
                            return ("jpeg", dim(w), dim(h))
                        return ("jpeg", None, None)
                    if seg_len < 2:
                        break
                    i = j + 1 + seg_len
                return ("jpeg", None, None)  # JPEG magic but no SOF found
            if len(b) >= 9 and b[:4] == b"SYNM":
                _, w, h, _c = _st.unpack(">4sHHB", b[:9])
                return ("synm", dim(w), dim(h))
            return (None, None, None)

        for pdf in batches:
            meta = pdf["data"].map(probe)
            pdf = pdf.copy()
            pdf["format_detected"] = [m[0] for m in meta]
            pdf["width"] = [m[1] for m in meta]
            pdf["height"] = [m[2] for m in meta]
            yield pdf

    return df.mapInPandas(fn, PROBED_SCHEMA)


def resize_media(df: DataFrame, width: int, height: int) -> DataFrame:
    """'Resize' blobs to (width, height): the fake regenerates the body
    deterministically from the original content hash, preserving the
    real operator's shape — binary in, binary out, new header."""

    header = struct.pack(_HEADER_FMT, _MAGIC, width, height, 3)
    nbytes = width * height * 3

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        import numpy as _np

        def resize(b):
            if b is None:
                return None
            seed = int.from_bytes(_hl.sha256(bytes(b)).digest()[:4], "big")
            rng = _np.random.RandomState(seed & 0x7FFFFFFF)
            return header + rng.bytes(nbytes)

        for pdf in batches:
            pdf = pdf.copy()
            pdf["data"] = pdf["data"].map(resize)
            yield pdf

    return df.mapInPandas(fn, df.schema)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_no", IntegerType(), False),
        StructField("frame", BinaryType(), True),
    ]
)


def sample_frames(df: DataFrame, frame_bytes: int = 256, every_n: int = 2) -> DataFrame:
    """Frame sampling for video-shaped blobs: split the body into
    fixed-size frames, keep every n-th — a row-exploding mapInPandas
    (the real version would call the container demuxer per frame)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            out_ids, out_nos, out_frames = [], [], []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                if data is None:
                    continue
                body = bytes(data)[9:]  # skip the 9-byte SYNM header
                for fno in range(0, max(len(body) // frame_bytes, 1), every_n):
                    out_ids.append(mid)
                    out_nos.append(fno)
                    out_frames.append(body[fno * frame_bytes : (fno + 1) * frame_bytes])
            yield _pd.DataFrame(
                {"media_id": out_ids, "frame_no": out_nos, "frame": out_frames}
            )

    return df.mapInPandas(fn, FRAME_SCHEMA)


def embed_media(df: DataFrame, dim: int = 64) -> DataFrame:
    """Content → embedding (array<float>): deterministic pseudo-features
    from the content hash (a real build would run a vision encoder).
    Output feeds operators/similarity.py unchanged."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("embedding", ArrayType(FloatType()), True),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            embs = []
            for b in pdf["data"]:
                if b is None:
                    embs.append(None)
                    continue
                seed = int.from_bytes(_hl.sha256(bytes(b)).digest()[:4], "big")
                rng = _np.random.RandomState(seed & 0x7FFFFFFF)
                v = rng.randn(dim).astype(_np.float32)
                v /= _np.linalg.norm(v)
                embs.append(v.tolist())
            yield _pd.DataFrame({"media_id": pdf["media_id"], "embedding": embs})

    return df.mapInPandas(fn, out_schema)


AHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("ahash", LongType(), True),
    ]
)


def ahash_media(df: DataFrame, grid: int = 8) -> DataFrame:
    """64-bit average hash (aHash) per media row — REAL perceptual-hash
    arithmetic over whatever pixels the decoder yields (here the
    deterministic SYNM fake; a real build swaps the body parse for
    ``PIL.Image.open``): grayscale by channel mean, block-mean downscale
    to ``grid``×``grid``, threshold each cell at the global mean, pack
    ``grid``² bits row-major into a signed 64-bit value. Near-identical
    images differ in few bits, so hamming distance orders duplicates.
    mapInPandas, Arrow batches, no shuffle; the closure is
    self-contained (numpy only) so executors need no package import.
    """
    if grid * grid > 64:
        raise ValueError("grid^2 must fit in 64 bits")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _st

        import numpy as _np
        import pandas as _pd

        def one(b):
            if b is None:
                return None
            b = bytes(b)
            if len(b) < 9 or b[:4] != b"SYNM":
                return None
            _, w, h, c = _st.unpack(">4sHHB", b[:9])
            body = _np.frombuffer(b[9:], dtype=_np.uint8)
            # images smaller than the grid (or without channels) have
            # empty block cells -> NaN means -> all-False bits: every
            # such image would hash to 0 and spuriously pair with every
            # other small image (round-5 review finding). Refuse them.
            if body.size < w * h * c or w < grid or h < grid or c == 0:
                return None
            px = body[: w * h * c].reshape(h, w, c).astype(_np.float64)
            gray = px.mean(axis=2)
            # block-mean downscale to grid x grid (cells may be uneven
            # when h/w don't divide evenly — split indices handle it)
            rows = _np.array_split(_np.arange(h), grid)
            cols = _np.array_split(_np.arange(w), grid)
            cells = _np.array(
                [[gray[_np.ix_(r, cc)].mean() for cc in cols] for r in rows]
            )
            bits = (cells > cells.mean()).astype(_np.uint64).ravel()
            v = _np.uint64(0)
            for i, bit in enumerate(bits):
                v |= _np.uint64(bit) << _np.uint64(i)
            return int(_np.int64(v))  # two's-complement into LongType

        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "ahash": pdf["data"].map(one).astype("object"),
                }
            )

    return df.mapInPandas(fn, AHASH_SCHEMA)


def image_near_duplicates(df: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Image near-duplicate pairs: aHash signatures + the SAME pigeonhole
    hamming join the text SimHash dedup uses (operators/dedup.
    hamming_pairs — 4 chunk equi-joins, never a crossJoin). Returns
    (id_a, id_b, hamming). The candidate-generation scale story is
    identical to SimHash: work scales with chunk-bucket occupancy."""
    from .dedup import hamming_pairs

    sig = ahash_media(df).filter(F.col("ahash").isNotNull())
    return hamming_pairs(sig, "media_id", "ahash", max_hamming)
