"""Multimodal columns (SURVEY.md §2.E): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
Pandas UDFs.

Design: payloads ride through the engine as ``BinaryType`` and are
NEVER deserialized by relational operators — joins/filters/groupBys
touch only the metadata columns, so a 100 TB blob corpus shuffles
metadata, not pixels. Decode/feature-extraction runs in
``mapInPandas`` (one Arrow batch of blobs per invocation) right
before the consumer that needs pixels.

The container has no image/audio codecs, so the decode step is a
clearly-marked STUB: :func:`decode_stub` raises NotImplementedError
unless ``deterministic_fake=True``, in which case it derives stable
pseudo-features from the bytes (md5-seeded) so the Spark-side
plumbing — schema, batching, partitioning — is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from ..registry import query

#: metadata+payload schema for a multimodal asset table.
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("length", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("length", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feat_norm", T.DoubleType()),
    ]
)


def read_assets(spark, directory: str, glob: str = "*") -> DataFrame:
    """Binary-file source → asset DataFrame (payload stays opaque)."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(directory)
    )
    return df.select(
        F.regexp_replace("path", "^file:", "").alias("path"),
        F.regexp_extract("path", r"\.([a-zA-Z0-9]+)$", 1).alias("media_type"),
        F.col("length"),
        F.col("content"),
    )


def decode_stub(blob: bytes, deterministic_fake: bool = False):
    """STUB for image/audio decode — no codecs in this container.

    A real deployment replaces this with PIL/libsndfile/ffmpeg. The
    deterministic fake derives (width, height, feat_norm) from an
    md5 of the bytes so tests exercise real Arrow plumbing with
    stable expected values.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "media codecs unavailable; pass deterministic_fake=True for tests"
        )
    h = hashlib.md5(blob).digest()
    width = 64 + h[0]
    height = 64 + h[1]
    feat_norm = int.from_bytes(h[2:6], "big") / 2**32
    return width, height, feat_norm


def extract_features(assets: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    """Decode + featurize via mapInPandas (Arrow-batched).

    Batch shape: each invocation receives a pandas DataFrame of
    complete rows; payload bytes arrive as Python ``bytes``. Output
    drops the payload — features are small, so everything downstream
    is cheap again.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_stub(b, deterministic_fake) for b in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "length": pdf["length"],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "feat_norm": [f[2] for f in feats],
                }
            )

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


@query(
    "llm_multimodal_meta",
    oracle="""
    SELECT filename AS path,
           CAST(size AS BIGINT) AS length,
           md5(hex(content)) AS content_md5
    FROM read_blob('/root/testdata/sf0.01/*.parquet')
    """,
)
def llm_multimodal_meta(spark, sf_dir):
    """Binary passthrough proof: blobs traverse the engine unmodified
    (md5 of every payload hash-matches DuckDB reading the same files).
    DuckDB 1.0 lacks md5(BLOB), so both engines hash the hex text of
    the payload (hex output verified identical cross-engine). Driver
    verifies at sf0.01 — the oracle's hardcoded directory.
    """
    assets = read_assets(spark, sf_dir, glob="*.parquet")
    return assets.select(
        "path",
        "length",
        F.md5(F.hex("content").cast("binary")).alias("content_md5"),
    )


@query("llm_multimodal_feats")  # rows-only: stub decoder, no SQL analogue
def llm_multimodal_feats(spark, sf_dir):
    """Decode→featurize plumbing over real files with the
    deterministic fake decoder (schema/batching/partitioning real;
    pixel decode stubbed — see decode_stub)."""
    assets = read_assets(spark, sf_dir, glob="*.parquet")
    return extract_features(assets, deterministic_fake=True).select(
        "path", "length", "width", "height", F.round("feat_norm", 6).alias("feat_norm")
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("thumb", T.BinaryType()),
    ]
)


def resize_stub(blob: bytes, width: int, height: int,
                deterministic_fake: bool = False) -> bytes:
    """STUB for image resize — a real deployment calls PIL here.

    The deterministic fake emits a width*height//64-byte thumbnail
    cycled from the blob's md5, so output size scales with the target
    dimensions and bytes are stable for tests.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "media codecs unavailable; pass deterministic_fake=True for tests"
        )
    n = max(1, width * height // 64)
    seed = hashlib.md5(blob).digest()
    return (seed * (n // len(seed) + 1))[:n]


def resize_images(
    assets: DataFrame,
    width: int,
    height: int,
    deterministic_fake: bool = True,
) -> DataFrame:
    """Resize via mapInPandas: 1 row in → 1 row out, payload replaced
    by the (much smaller) thumbnail. The full-size blob dies inside
    the Python worker — only thumbnails return to the JVM, so the
    post-resize shuffle carries the reduced payload.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "width": width,
                    "height": height,
                    "thumb": [
                        resize_stub(b, width, height, deterministic_fake)
                        for b in pdf["content"]
                    ],
                }
            )

    return assets.mapInPandas(run, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("frame_id", T.IntegerType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def sample_frames(
    assets: DataFrame,
    every_n: int = 10,
    deterministic_fake: bool = True,
) -> DataFrame:
    """Frame sampling via mapInPandas: 1 video row in → N frame rows
    out (the pandas-UDF row-explosion shape ffmpeg decode would use).

    The fake derives frame count from blob length (1 frame per 4 KiB)
    and keeps every ``every_n``-th frame; frame payload is stubbed to
    its md5 fingerprint. Real decode would emit frame bytes here and
    immediately featurize them, never shuffling raw frames.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "media codecs unavailable; pass deterministic_fake=True for tests"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            paths, fids, md5s = [], [], []
            for path, blob in zip(pdf["path"], pdf["content"]):
                n_frames = max(1, len(blob) // 4096)
                # hash the blob ONCE; per-frame fingerprints chain off
                # the 16-byte digest. Re-hashing the full blob per frame
                # is O(frames × blob_bytes) — on multi-MB assets that
                # turned sampling into gigabytes of redundant hashing.
                digest = hashlib.md5(blob).digest()
                for fid in range(0, n_frames, every_n):
                    paths.append(path)
                    fids.append(fid)
                    md5s.append(
                        hashlib.md5(digest + fid.to_bytes(4, "big")).hexdigest()
                    )
            yield pd.DataFrame(
                {"path": paths, "frame_id": fids, "frame_md5": md5s}
            )

    return assets.mapInPandas(run, schema=FRAME_SCHEMA)


@query("llm_multimodal_resize")  # rows-only: stub codec, no SQL analogue
def llm_multimodal_resize(spark, sf_dir):
    """Resize plumbing: blob → fixed-dimension thumbnail, payload
    shrinks inside the Python worker."""
    assets = read_assets(spark, sf_dir, glob="*.parquet")
    return resize_images(assets, 32, 32).select(
        "path", "width", "height", F.md5(F.col("thumb")).alias("thumb_md5")
    )


@query("llm_multimodal_frames")  # rows-only: stub codec, no SQL analogue
def llm_multimodal_frames(spark, sf_dir):
    """Frame-sampling plumbing: one row per sampled frame per asset."""
    assets = read_assets(spark, sf_dir, glob="*.parquet")
    return sample_frames(assets, every_n=10)
