"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Design: media payloads are opaque ``binary`` columns + a typed metadata
struct; all heavy work (decode, resize, feature extraction, frame
sampling) runs in Arrow-batched ``mapInPandas`` stages so the 100 TB path
is: parquet scan (binary column pruned unless needed) -> partition-local
Python batches -> columnar output.  No driver-side materialization ever.

The actual codec calls are STUBBED (this container ships no image/audio
libraries): ``decode_image`` raises NotImplementedError unless
``fake=True``, which substitutes a deterministic byte-hash-seeded decode
so the full Spark plumbing — schemas, batching, partitioning, UDF
signatures — is real and testable.  Swapping in PIL/ffmpeg later changes
only the inner function body.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, width int, height int, mean_r double, mean_g double, "
    "mean_b double, std_all double"
)


def _fake_decode(payload: bytes, width: int, height: int):
    """Deterministic stand-in for an image codec: bytes -> HxWx3 uint8.

    Seeded from the payload digest so results are stable across runs and
    executors — the pipeline around it behaves exactly as with a real
    decoder (same shapes, same dtypes, same batch flow).
    """
    import hashlib

    import numpy as np

    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def decode_image(payload: bytes, width: int, height: int, fake: bool = False):
    """Decode one image payload.  Real codec NOT available in this
    environment — callers opt into the deterministic fake explicitly."""
    if fake:
        return _fake_decode(payload, width, height)
    raise NotImplementedError(
        "image codec not available in this environment; pass fake=True for "
        "the deterministic stand-in (see module docstring)"
    )


def image_features(df: DataFrame, fake: bool = True, batch_hint: int = 64) -> DataFrame:
    """Per-image channel statistics via mapInPandas.

    One Arrow batch of (media_id, payload, meta) rows in, one batch of
    feature rows out; the binary column never leaves the executor.
    """

    def compute(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                meta = row["meta"]
                w, h = int(meta["width"]), int(meta["height"])
                img = decode_image(bytes(row["payload"]), w, h, fake=fake)
                arr = img.astype(np.float64)
                out.append(
                    {
                        "media_id": row["media_id"],
                        "width": w,
                        "height": h,
                        "mean_r": float(arr[:, :, 0].mean()),
                        "mean_g": float(arr[:, :, 1].mean()),
                        "mean_b": float(arr[:, :, 2].mean()),
                        "std_all": float(arr.std()),
                    }
                )
            yield pd.DataFrame(out)

    return df.select("media_id", "payload", "meta").mapInPandas(compute, FEATURE_SCHEMA)


def resize_images(df: DataFrame, out_w: int, out_h: int, fake: bool = True) -> DataFrame:
    """Decode -> nearest-neighbor resize -> re-encode (raw bytes out).

    Output schema mirrors the input media schema so resize stages compose.
    """
    schema = "media_id long, payload binary, meta struct<format:string, width:int, height:int, n_bytes:bigint>"

    def compute(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                meta = row["meta"]
                w, h = int(meta["width"]), int(meta["height"])
                img = decode_image(bytes(row["payload"]), w, h, fake=fake)
                yi = (np.arange(out_h) * h // out_h).astype(int)
                xi = (np.arange(out_w) * w // out_w).astype(int)
                resized = img[yi][:, xi]
                raw = resized.tobytes()
                out.append(
                    {
                        "media_id": row["media_id"],
                        "payload": raw,
                        "meta": {
                            "format": "raw_rgb",
                            "width": out_w,
                            "height": out_h,
                            "n_bytes": len(raw),
                        },
                    }
                )
            yield pd.DataFrame(out)

    return df.select("media_id", "payload", "meta").mapInPandas(compute, schema)


def sample_video_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling stub: video codecs unavailable here.

    The Spark-side contract is defined (one video row -> many frame rows,
    an explode-shaped mapInPandas); the codec body is the missing piece.
    """
    raise NotImplementedError(
        "video codec not available in this environment; the stage contract "
        "is (media_id, payload, meta) -> (media_id, frame_idx, payload, meta)"
    )


def synthesize_media_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a deterministic media table from the documents corpus: payload
    = utf-8 bytes of the text, dims derived from its length.  Lets every
    multimodal stage run on driver-provided data only."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("fake").alias("format"),
            (F.length(text_col) % 16 + 8).cast("int").alias("width"),
            (F.length(text_col) % 8 + 8).cast("int").alias("height"),
            F.length(F.encode(F.col(text_col), "utf-8")).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )
