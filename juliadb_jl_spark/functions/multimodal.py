"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side machinery (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual media decode is stubbed — the
image/audio libraries are not in this container.  `decode_image` raises
NotImplementedError unless `fake=True`, in which case a deterministic fake
decoder (dimensions derived from the byte content) exercises the identical
plumbing end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("content", T.BinaryType(), True),
    T.StructField("mime", T.StringType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]), True),
])

_FEATURE_DIM = 8

_DECODED_FIELDS = ("media_id long, mime string, size_bytes long, "
                   "width int, height int, checksum string")


def attach_binary(df: DataFrame, src_col: str, media_id_col: str,
                  mime: str = "application/octet-stream") -> DataFrame:
    """Wrap an existing column as a binary media column (used by tests to
    synthesize media from text; real pipelines read binary parquet/files)."""
    return df.select(
        F.col(media_id_col).cast("long").alias("media_id"),
        F.col(src_col).cast("binary").alias("content"),
        F.lit(mime).alias("mime"))


def _fake_decode(content: bytes) -> tuple[int, int]:
    """Deterministic fake image dimensions from the content hash."""
    h = hashlib.md5(content or b"").digest()
    return 16 + h[0] % 240, 16 + h[1] % 240


def _pil():
    """Optional dependency probe — PIL is import-gated so image decode
    becomes real automatically wherever Pillow is installed (executors
    import it per-worker; this container does not ship it)."""
    try:
        from PIL import Image  # noqa: PLC0415
        return Image
    except ImportError:
        return None


def decode_media(df: DataFrame, fake: bool = False,
                 batch_size_hint: int = 64) -> DataFrame:
    """Decode binary media → (dims, checksum) via mapInPandas (Arrow
    batches).  Uses Pillow when importable (real width/height; undecodable
    bytes yield null dims); otherwise raises unless `fake=True`, whose
    deterministic fake drives the identical batch-shaped plumbing."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = _pil()
        for pdf in batches:
            if not fake and Image is None:
                raise NotImplementedError(
                    "media decode requires PIL/libav (unavailable); "
                    "use fake=True for the deterministic stub")
            if not fake:
                import io
                dims = []
                for b in pdf["content"]:
                    try:
                        with Image.open(io.BytesIO(bytes(b or b""))) as im:
                            dims.append(im.size)
                    except Exception:
                        dims.append((None, None))
            else:
                dims = [_fake_decode(bytes(b) if b is not None else b"")
                        for b in pdf["content"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "mime": pdf["mime"],
                "size_bytes": [len(bytes(b)) if b is not None else 0
                               for b in pdf["content"]],
                "width": [d[0] for d in dims],
                "height": [d[1] for d in dims],
                "checksum": [hashlib.md5(bytes(b) if b is not None else b"")
                             .hexdigest() for b in pdf["content"]],
            })

    return df.mapInPandas(_decode, _DECODED_FIELDS)


def extract_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Feature extraction stub: binary → fixed-dim float vector.  Real
    models are out of scope here; the fake derives a deterministic vector
    from the content hash, preserving the exact schema/batch contract a
    real encoder UDF would have."""

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "feature extraction requires a model runtime; "
                    "use fake=True for the deterministic stub")
            feats = []
            for b in pdf["content"]:
                h = hashlib.sha256(bytes(b) if b is not None else b"").digest()
                feats.append([h[i] / 255.0 for i in range(_FEATURE_DIM)])
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return df.mapInPandas(_feat, "media_id long, features array<double>")


def resize_images(df: DataFrame, width: int, height: int,
                  fake: bool = False) -> DataFrame:
    """Resize binary images to (width, height) via Arrow-batched
    mapInPandas — Pillow when importable (re-encoded PNG bytes; nulls for
    undecodable input); `fake=True` emits a deterministic byte payload of
    the right conceptual shape so the plumbing (schema, batching,
    partition preservation) is exercised without the decode lib."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = _pil()
        for pdf in batches:
            if not fake and Image is None:
                raise NotImplementedError(
                    "image resize requires PIL (unavailable); "
                    "use fake=True for the deterministic stub")
            out = []
            for b in pdf["content"]:
                raw = bytes(b) if b is not None else b""
                if fake:
                    # deterministic fake: content digest + target dims
                    out.append(hashlib.md5(raw).digest()
                               + width.to_bytes(4, "big")
                               + height.to_bytes(4, "big"))
                else:
                    import io
                    try:
                        with Image.open(io.BytesIO(raw)) as im:
                            buf = io.BytesIO()
                            im.resize((width, height)).save(buf, "PNG")
                            out.append(buf.getvalue())
                    except Exception:
                        out.append(None)
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "mime": pdf["mime"], "content": out})

    return df.mapInPandas(_resize, "media_id long, mime string, content binary")


def sample_frames(df: DataFrame, every_n: int = 10, max_frames: int = 16,
                  fake: bool = False) -> DataFrame:
    """Sample every `every_n`-th frame from binary video content →
    one row per (media_id, frame_idx, frame).  Real decode needs libav
    (not in this container); the fake derives a deterministic per-frame
    payload and frame count from the content hash, driving the identical
    one-to-many Arrow batch shape a real decoder UDF produces."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video frame sampling requires libav (unavailable); "
                    "use fake=True for the deterministic stub")
            ids, idxs, frames = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(b) if b is not None else b""
                h = hashlib.md5(raw).digest()
                n_frames = 1 + h[2] % (max_frames * every_n)
                taken = 0
                for fi in range(0, n_frames, every_n):
                    if taken >= max_frames:
                        break
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(h + fi.to_bytes(4, "big"))
                    taken += 1
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs,
                                "frame": frames})

    return df.mapInPandas(_sample, "media_id long, frame_idx int, frame binary")


def media_metadata(df: DataFrame) -> DataFrame:
    """Pure-native metadata pass (no decode): byte size + md5 — pushdown-
    friendly, runs at full scan speed."""
    return df.select(
        "media_id", "mime",
        F.octet_length("content").alias("size_bytes"),
        F.md5(F.col("content")).alias("checksum"))
