"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side design is the real deliverable here — schemas, batch
shapes, partitioning — because the decode libraries (PIL/ffmpeg/librosa)
are NOT in this container. Decoding is therefore stubbed: if PIL is
importable it is used; otherwise a clearly-marked deterministic fake
derives dimensions/features from the bytes, so every pipeline stage
around the decode (schema evolution, batching, explode of frames) is
fully testable and the swap-in point for real codecs is one function.

At 100 TB: binary payloads ride in parquet alongside metadata; filters
on metadata prune before any byte is decoded; ``mapInPandas`` streams
Arrow batches so a partition never materializes as Python objects row
by row.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - not installed in this environment
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def attach_fake_blobs(df: DataFrame, text_col: str, mime: str = "image/fake") -> DataFrame:
    """Test/fixture helper: derive a deterministic binary payload +
    metadata struct from a text column (stands in for real media bytes).
    """
    content = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("content", content).withColumn(
        "media_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(content).cast("bigint").alias("size_bytes"),
        ),
    )


def _fake_dims(data: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for image header parsing. STUB — replace
    with PIL/imageio in a container that has them."""
    h = hashlib.sha256(data).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192, 3


def decode_images(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Append (width, height, channels) decoded from the binary column.

    Real path uses PIL when available; otherwise the deterministic fake
    (the Spark plumbing — schema, Arrow batching — is identical either
    way). Raises NotImplementedError for real decoding only when a
    caller explicitly demands it via ``require_real_decode``.
    """
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", width int, height int, channels int"

    def batches(it: Iterator) -> Iterator:
        import io

        for pdf in it:
            dims = []
            for data in pdf[content_col]:
                b = bytes(data) if data is not None else b""
                if _HAVE_PIL and b[:4] in (b"\x89PNG", b"\xff\xd8\xff\xe0"):
                    with Image.open(io.BytesIO(b)) as im:  # pragma: no cover
                        dims.append((im.width, im.height, len(im.getbands())))
                else:
                    dims.append(_fake_dims(b))
            pdf["width"] = [d[0] for d in dims]
            pdf["height"] = [d[1] for d in dims]
            pdf["channels"] = [d[2] for d in dims]
            yield pdf

    return df.mapInPandas(batches, schema=out_schema)


def require_real_decode() -> None:
    """Guard for callers that need true pixel decoding."""
    if not _HAVE_PIL:
        raise NotImplementedError(
            "real image decoding needs PIL/imageio, which this container "
            "lacks; decode_images falls back to a deterministic stub"
        )


def extract_features(
    df: DataFrame, content_col: str = "content", dim: int = 16
) -> DataFrame:
    """Append a dim-float feature vector per blob (deterministic
    byte-hash features — STUB for a real vision/audio encoder; the
    Arrow-batch UDF shape is what a real encoder would use).
    """
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", features array<float>"

    def batches(it: Iterator) -> Iterator:
        for pdf in it:
            feats = []
            for data in pdf[content_col]:
                b = bytes(data) if data is not None else b""
                h = hashlib.sha256(b).digest()
                feats.append(
                    [((h[i % 32] / 255.0) * 2.0 - 1.0) for i in range(dim)]
                )
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(batches, schema=out_schema)


def resize_images(
    df: DataFrame,
    content_col: str = "content",
    target_w: int = 64,
    target_h: int = 64,
) -> DataFrame:
    """Resize plumbing: replace the payload with its resized rendition
    and pin (width, height) to the target. STUB — the "resized" payload
    is the sha256 digest of (bytes ‖ "WxH"), a deterministic stand-in
    with the same schema/batch shape a PIL ``Image.resize`` would have;
    swap the inner loop for a real codec in a container that has one.
    """
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", resized binary, width int, height int"

    tag = f"{target_w}x{target_h}".encode()

    def batches(it: Iterator) -> Iterator:
        for pdf in it:
            resized = []
            for data in pdf[content_col]:
                b = bytes(data) if data is not None else b""
                if _HAVE_PIL and b[:4] == b"\x89PNG":  # pragma: no cover
                    pass  # real path: Image.open(...).resize(...).tobytes()
                resized.append(hashlib.sha256(b + tag).digest())
            pdf["resized"] = resized
            pdf["width"] = target_w
            pdf["height"] = target_h
            yield pdf

    return df.mapInPandas(batches, schema=out_schema)


def decode_audio(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Append (sample_rate, n_channels, duration_seconds) "decoded" from
    an audio binary column. STUB header parse (sha256-derived, marked)
    — real path is soundfile/librosa; the Arrow ``mapInPandas`` batch
    shape, schema, and metadata-first pruning are the actual design.
    Duration = size_bytes / (rate · 2 bytes · channels), i.e. 16-bit PCM.
    """
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", sample_rate int, n_channels int, duration_seconds double"

    rates = (16000, 22050, 44100, 48000)

    def batches(it: Iterator) -> Iterator:
        for pdf in it:
            rate, chans, dur = [], [], []
            for data in pdf[content_col]:
                b = bytes(data) if data is not None else b""
                h = hashlib.sha256(b).digest()
                r = rates[h[0] % 4]
                c = 1 + h[1] % 2
                rate.append(r)
                chans.append(c)
                # single IEEE division of exact ints — bit-identical in
                # any engine computing size/(rate*2*ch), so no rounding
                dur.append(len(b) / (r * 2 * c))
            pdf["sample_rate"] = rate
            pdf["n_channels"] = chans
            pdf["duration_seconds"] = dur
            yield pdf

    return df.mapInPandas(batches, schema=out_schema)


def sample_frames(
    df: DataFrame,
    content_col: str = "content",
    frame_bytes: int = 16,
    every_n: int = 2,
) -> DataFrame:
    """Explode a binary payload into every-Nth fixed-size "frame"
    (video-frame-sampling plumbing; a real decoder would emit decoded
    frames instead of byte slices). Pure built-ins — no Python at all.
    """
    n_frames = F.floor(F.length(F.col(content_col)) / F.lit(frame_bytes)).cast("int")
    idx = F.filter(
        F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
        lambda i: i % every_n == 0,
    )
    return (
        df.withColumn("_frame_idx", F.explode(idx))
        .withColumn(
            "frame",
            F.expr(f"substring({content_col}, _frame_idx * {frame_bytes} + 1, {frame_bytes})"),
        )
        .withColumnRenamed("_frame_idx", "frame_index")
    )
