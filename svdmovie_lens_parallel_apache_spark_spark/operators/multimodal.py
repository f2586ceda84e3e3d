"""Multimodal column plumbing: opaque binary media + typed metadata +
Arrow-batched feature extraction.

North-star addition (BASELINE.json). Pattern for 100 TB pipelines:
- media lives as an opaque ``binary`` column (or object-store URI) next to
  typed metadata (format/width/height), NOT parsed by the engine;
- decode / resize / feature-extract run as ``mapInPandas`` — Arrow batches
  in, Arrow batches out, one Python worker per partition, no per-row
  Python overhead; partition sizing bounds peak memory (rows_per_batch ×
  media_size);
- the actual codec call sits behind one function: real decoders (PIL /
  torchaudio / ffmpeg) are not in this container, so ``decode_media``
  raises ``NotImplementedError`` unless ``fake=True``, which substitutes a
  deterministic md5-keyed stand-in. The Spark-side plumbing — schema,
  batching, UDF signature — is identical either way and is what's tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_format", T.StringType()),
        T.StructField("byte_len", T.IntegerType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("frame_count", T.IntegerType()),
    ]
)


def attach_fake_media(docs: DataFrame, copies: int = 4) -> DataFrame:
    """Synthesize a deterministic binary media column from the text digest
    (md5 bytes repeated) + typed metadata — the shape a real ingest would
    produce from (uri, bytes, probe-metadata)."""
    digest = F.unhex(F.md5(F.col("text")))  # 16 deterministic bytes
    blob = F.concat(*([digest] * copies))
    return docs.select(
        "doc_id",
        blob.alias("media_bytes"),
        F.struct(
            F.lit("fake/rgb16").alias("media_format"),
            F.lit(4).alias("width"),
            F.lit(copies).alias("height"),
        ).alias("media_meta"),
    )


def decode_media(data: bytes, fake: bool = False) -> dict:
    """The codec boundary. Real decoding needs PIL/ffmpeg — NOT in this
    container; the distributed plumbing around this call is the product."""
    if not fake:
        raise NotImplementedError(
            "real media decode requires PIL/ffmpeg (not installed); "
            "call with fake=True for the deterministic stand-in"
        )
    n = len(data)
    return {
        "byte_len": n,
        "first_byte": data[0] if n else -1,
        "mean_byte": (sum(data) / n) if n else 0.0,
        "frame_count": n // 16,  # one "frame" per 16-byte chunk
    }


def extract_media_features(media: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas``: each Arrow batch becomes a pandas DataFrame; the
    decoder runs once per row INSIDE the batch loop (vectorised transfer,
    scalar decode — the decode itself is the irreducible Python/C call).
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_media(b, fake=True) for b in pdf["media_bytes"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out.insert(1, "media_format", [m["media_format"] for m in pdf["media_meta"]])
            yield out[[f.name for f in FEATURE_SCHEMA.fields]]

    return media.mapInPandas(_extract, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_k: int = 2, frame_bytes: int = 16) -> DataFrame:
    """Frame sampling as pure column expressions (no Python): split the
    blob into frame_bytes chunks, keep every k-th. Demonstrates that even
    'multimodal' ops stay JVM-side when they're byte-slicing, reserving
    pandas UDFs for actual codecs."""
    n_frames = F.floor(F.length(F.col("media_bytes")) / frame_bytes).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
    kept = F.filter(idx, lambda i: i % every_k == 0)
    frames = F.transform(
        kept,
        lambda i: F.col("media_bytes").substr(
            (i * frame_bytes + 1).cast("int"), F.lit(frame_bytes)
        ),
    )
    return media.select(
        "doc_id",
        F.size(frames).alias("n_sampled_frames"),
        frames.alias("frames"),
    )
